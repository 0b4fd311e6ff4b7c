"""Scale probe for the tiled exact-Jaccard pair family (round-2 verdict #3).

Exact all-pairs ground truth is quadratic in block size BY SEMANTICS — the
fix is not to make it subquadratic but to BOUND EVERY TASK: tiling splits a
hot block into ceil(B/cap)² tiles of ≤ cap² comparisons, so the stage
scales out instead of stalling on one reducer.  This probe records, for
each scale factor:

- wall seconds for dedup_ngram_jaccard (results already proven identical
  to the untiled join by tests/test_llm_ops.py and the DuckDB oracle);
- the tiling state: per-source block size B, n_sub = ceil(B/cap), and the
  max tile candidate product (≤ cap² when tiling is active);
- the expected pair-work ratio (Σ_src C(B,2) big / small) next to the
  measured wall ratio — wall growing like pair-work WITH max-task bounded
  is the designed behavior; wall growing like pair-work on ONE task is
  the failure the tiling removes.

Usage: python tools/probe_pair_tiling.py [small_sf] [big_sf] [out.json]
Defaults: sf1, sf3 from .scratch/sfscale, SCALE_r07_pairs.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from build_pipeline_with_apache_beam_spark.catalog import load_table  # noqa: E402
from build_pipeline_with_apache_beam_spark.operators import dedup  # noqa: E402
from build_pipeline_with_apache_beam_spark.session import get_spark  # noqa: E402


def probe(spark, sf_dir: str) -> dict:
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 4 == 0)
    sizes = [r["n"] for r in docs.groupBy("source")
             .agg(F.count("*").alias("n")).collect()]
    cap = dedup.JACCARD_MAX_BLOCK
    n_subs = [math.ceil(b / cap) for b in sizes]
    pair_work = sum(b * (b - 1) // 2 for b in sizes)
    # warm once (parquet footers, JIT), then measure
    dedup.dedup_ngram_jaccard(spark, sf_dir).write.format(
        "noop").mode("overwrite").save()
    t0 = time.time()
    dedup.dedup_ngram_jaccard(spark, sf_dir).write.format(
        "noop").mode("overwrite").save()
    wall = round(time.time() - t0, 2)
    return {
        "wall_sec": wall,
        "n_blocks": len(sizes),
        "max_block": max(sizes),
        "pair_work": pair_work,
        "cap": cap,
        "n_sub_max": max(n_subs),
        "tiling_active": max(n_subs) > 1,
        "max_tile_pairs_bound": min(max(sizes), cap) ** 2,
    }


def main() -> None:
    scale_root = os.path.join(REPO, ".scratch", "sfscale")
    small = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        scale_root, "sf1")
    big = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        scale_root, "sf3")
    out = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        REPO, "SCALE_r07_pairs.json")
    spark = get_spark("pair-tiling-probe")
    r_small = probe(spark, small)
    r_big = probe(spark, big)
    work_ratio = round(r_big["pair_work"] / r_small["pair_work"], 2)
    wall_ratio = round(r_big["wall_sec"] / max(r_small["wall_sec"], 0.01), 2)
    result = {
        "op": "dedup_ngram_jaccard (tiled; containment/rate-curve share the"
              " generator)",
        "small": {"sf_dir": small, **r_small},
        "big": {"sf_dir": big, **r_big},
        "pair_work_ratio": work_ratio,
        "wall_ratio": wall_ratio,
        "bounded": wall_ratio <= work_ratio * 1.5,
        "note": "exact all-pairs is quadratic by semantics; the design goal"
                " is wall tracking distributed pair-work with every task"
                " bounded at cap^2, never a single-reducer stall",
    }
    print(json.dumps(result, indent=1))
    with open(out, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
