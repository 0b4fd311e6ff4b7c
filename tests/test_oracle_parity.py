"""Differential tests: every oracle-paired operator vs DuckDB at sf0.001.

This mirrors the driver's CORRECTNESS gate (it runs at sf0.01); running the
same comparison at sf0.001 keeps the suite fast while catching semantic
drift.  Ops without an oracle entry are smoke-checked (plan executes).
"""

from __future__ import annotations

import pytest

from build_pipeline_with_apache_beam_spark import registry
from build_pipeline_with_apache_beam_spark.oracle import compare

QUERIES = registry.queries()
ORACLES = registry.oracle_sql()


def test_every_oracle_key_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle entries without a query: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_operator(name, spark, sf_dir, duck):
    sdf = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        ok, msg = compare(sdf, duck, ORACLES[name])
        assert ok, f"{name}: {msg}"
    else:
        # rows-only ops: must execute and produce a stable schema
        assert sdf.columns
        assert sdf.count() >= 0
