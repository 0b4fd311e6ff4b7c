"""Central (queries, oracle_sql) registry — the driver contract.

Merges each operator module's QUERIES/ORACLE dicts.  An op present in
QUERIES but absent from ORACLE is deliberately rows-only (sketches,
streaming state, ANN — semantics not expressible in portable SQL).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from build_pipeline_with_apache_beam_spark.operators import (
        arrays,
        behavioral,
        corpus,
        dedup,
        graph,
        multimodal,
        normalize,
        relational,
        scalars,
        scans,
        similarity,
        subqueries,
        text,
        tpch,
        tpch2,
    )
    from build_pipeline_with_apache_beam_spark.functions import udfs
    from build_pipeline_with_apache_beam_spark.plans import etl
    from build_pipeline_with_apache_beam_spark.sources import docstore, sinks, txtable
    from build_pipeline_with_apache_beam_spark.streaming import runner, stateful, windows

    return [scans, relational, tpch, tpch2, subqueries, arrays, corpus, behavioral, scalars,
            normalize, text, dedup, graph, similarity, multimodal, udfs, windows,
            stateful, sinks, docstore, runner, txtable, etl]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate op ids {overlap} in {mod.__name__}")
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLE)
        # Data/path-dependent oracles (parquet footer paths, sample-trained
        # codebook literals) are built at CALL time against
        # oracle.oracle_sf_dir(), not at import time — one static string
        # cannot be exact across scale factors.
        dyn = getattr(mod, "ORACLE_DYNAMIC", None)
        if dyn is not None:
            try:
                out.update(dyn())
            except FileNotFoundError as e:
                # A dynamic oracle's backing data is absent in this
                # environment (round-9 ADVICE): degrade those few entries
                # to rows-only — LOUDLY — instead of crashing every caller
                # who wanted the dict for an unrelated op.
                import sys
                print(f"[registry] skipping dynamic oracles from "
                      f"{mod.__name__}: {e}", file=sys.stderr)
    return out
