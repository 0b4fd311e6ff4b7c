"""Oracle output typing gate (round-2 verdict, What's wrong #1).

The driver's correctness hash is type-aware: DuckDB surfaces a bare
``SUM(int)`` as HUGEINT (int128), which Arrow exports as decimal128, so an
oracle whose OUTPUT column is HUGEINT hash-mismatches the Spark BIGINT even
when every value compares equal under Python ``==``.  Two guards:

1. DESCRIBE every registered oracle and assert no HUGEINT/UHUGEINT output
   column survives (each must be CAST to BIGINT at the SELECT list).
2. The local comparator itself must now FAIL on the pre-fix shape, so the
   local gate predicts the driver's verdict.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def oracles():
    from build_pipeline_with_apache_beam_spark import registry

    return registry.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    from build_pipeline_with_apache_beam_spark.oracle import duck_connect

    return duck_connect(sf_dir)


def test_no_hugeint_output_columns(oracles, con):
    bad = []
    for name, sql in sorted(oracles.items()):
        for col, typ, *_ in con.execute(f"DESCRIBE {sql}").fetchall():
            if "HUGEINT" in typ.upper():
                bad.append(f"{name}.{col}: {typ}")
    assert not bad, (
        "oracle output columns the driver hash will reject "
        "(wrap in CAST(... AS BIGINT)): " + "; ".join(bad))


def test_comparator_rejects_hugeint_vs_bigint(spark, con):
    """The exact failure the r2 driver saw: values equal, types not."""
    from build_pipeline_with_apache_beam_spark.oracle import compare

    sdf = spark.sql("SELECT CAST(3 AS BIGINT) AS n")
    ok, msg = compare(sdf, con, "SELECT SUM(x) AS n FROM (VALUES (1), (2)) t(x)")
    assert not ok and "type-family" in msg, (ok, msg)
    ok, msg = compare(
        sdf, con,
        "SELECT CAST(SUM(x) AS BIGINT) AS n FROM (VALUES (1), (2)) t(x)")
    assert ok, msg


def test_comparator_rejects_decimal_scale_drift(spark, con):
    from build_pipeline_with_apache_beam_spark.oracle import compare

    sdf = spark.sql("SELECT CAST(1.50 AS DECIMAL(18,2)) AS v")
    ok, msg = compare(sdf, con, "SELECT CAST(1.5 AS DECIMAL(18,3)) AS v")
    assert not ok and "type-family" in msg, (ok, msg)
    ok, msg = compare(sdf, con, "SELECT CAST(1.50 AS DECIMAL(12,2)) AS v")
    assert ok, msg  # precision differs, scale matches — same value repr
