"""Tests for the in-engine checksum comparator (oracle_checksum.py) —
the big-result fallback of the correctness gate (round-4 verdict #5).

The kernel must (a) agree with the exact row-dump compare wherever both
run, (b) detect value/row perturbations, (c) hash bit-identically across
the Spark-Arrow and DuckDB-Arrow paths for every type family the capped
ops emit (bigint/int, double, string, timestamp_ntz) plus nulls.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from build_pipeline_with_apache_beam_spark import registry
from build_pipeline_with_apache_beam_spark.oracle_checksum import (
    batch_rowhash,
    compare_checksum,
    spark_checksum,
)

QUERIES = registry.queries()
ORACLES = registry.oracle_sql()

# the ops the sf1 comparator caps for size (>2M rows); dedup_simhash
# gained an exact oracle in r10 (md5-chunk hash) but stays uncapped —
# its pair output is hamming-filtered well under the cap
CAPPED_OPS = ["join_range_bucketized", "reshape_unpivot", "scalar_math_ops",
              "scan_parquet_project", "udtf_explode_batch"]


@pytest.mark.parametrize("name", CAPPED_OPS)
def test_checksum_agrees_where_exact_compare_passes(name, spark, sf_dir,
                                                    duck):
    ok, msg = compare_checksum(QUERIES[name](spark, sf_dir), duck,
                               ORACLES[name])
    assert ok, f"{name}: {msg}"


def test_checksum_detects_tiny_value_mutation(spark, sf_dir, duck):
    from pyspark.sql import functions as F

    sdf = QUERIES["scan_parquet_project"](spark, sf_dir)
    mutated = sdf.withColumn(
        "l_extendedprice",
        F.col("l_extendedprice")
        + F.when(F.col("l_orderkey") == 1, 1e-9).otherwise(0.0))
    ok, msg = compare_checksum(mutated, duck,
                               ORACLES["scan_parquet_project"])
    assert not ok and "checksum" in msg


def test_checksum_detects_dropped_row(spark, sf_dir, duck):
    sdf = QUERIES["udtf_explode_batch"](spark, sf_dir)
    ok, msg = compare_checksum(sdf.limit(sdf.count() - 1), duck,
                               ORACLES["udtf_explode_batch"])
    assert not ok and "rowcount" in msg


def test_checksum_detects_swapped_rows_across_columns(spark, duck):
    """Order-insensitivity must not collapse to column-insensitivity:
    swapping two values BETWEEN columns of the same row must change the
    hash (the per-column position enters the accumulator)."""
    a = spark.sql("SELECT * FROM VALUES (1, 2), (3, 4) t(x, y)")
    duck.execute("CREATE OR REPLACE VIEW _swap AS "
                 "SELECT * FROM (VALUES (2, 1), (4, 3)) t(x, y)")
    ok, msg = compare_checksum(a, duck, "SELECT * FROM _swap")
    assert not ok and "checksum" in msg


def test_batch_rowhash_row_order_insensitive():
    fams = [("a", "int"), ("b", "float"), ("c", "str")]
    pdf = pd.DataFrame({"a": [1, 2, 3], "b": [0.1, float("nan"), -0.0],
                        "c": ["x", None, "z"]})
    n1, h1 = batch_rowhash(pdf, fams)
    n2, h2 = batch_rowhash(pdf.iloc[::-1].reset_index(drop=True), fams)
    assert (n1, h1) == (n2, h2)


def test_batch_rowhash_float_normalization():
    """-0.0 hashes like +0.0; every NaN bit pattern hashes alike; but a
    1-ulp value change changes the hash."""
    fams = [("b", "float")]
    base = batch_rowhash(pd.DataFrame({"b": [0.0]}), fams)
    assert batch_rowhash(pd.DataFrame({"b": [-0.0]}), fams) == base
    nan1 = np.frombuffer(np.uint64(0x7FF8000000000001).tobytes(),
                         dtype=np.float64)[0]
    assert (batch_rowhash(pd.DataFrame({"b": [float("nan")]}), fams)
            == batch_rowhash(pd.DataFrame({"b": [nan1]}), fams))
    bumped = np.nextafter(0.1, 1.0)
    assert (batch_rowhash(pd.DataFrame({"b": [0.1]}), fams)
            != batch_rowhash(pd.DataFrame({"b": [bumped]}), fams))


def test_batch_rowhash_null_vs_value_distinct():
    fams = [("a", "int")]
    assert (batch_rowhash(pd.DataFrame({"a": [None]}), fams)
            != batch_rowhash(pd.DataFrame({"a": [0]}), fams))


def test_spark_checksum_is_distributed_partials(spark, sf_dir):
    """The Spark side must reduce via mapInPandas partials — repartitioning
    the input must not change the checksum (sum mod 2^64 is associative)."""
    sdf = QUERIES["scan_parquet_project"](spark, sf_dir)
    assert spark_checksum(sdf) == spark_checksum(sdf.repartition(7))


def test_batch_rowhash_array_canonical_across_engines():
    """Spark batches hold ndarrays, DuckDB batches hold Python lists — the
    str-family kernel must hash them identically (advice r5), and must not
    let numpy's >1000-element '...' summarization collapse distinct long
    arrays to one hash."""
    fams = [("v", "str")]
    nd = pd.DataFrame({"v": [np.array([1, 2, 3], dtype=np.int64)]})
    py = pd.DataFrame({"v": [[1, 2, 3]]})
    assert batch_rowhash(nd, fams) == batch_rowhash(py, fams)

    long_a = np.arange(2000, dtype=np.int64)
    long_b = long_a.copy()
    long_b[1500] += 1  # differs only inside the '...'-elided middle
    assert (batch_rowhash(pd.DataFrame({"v": [long_a]}), fams)
            != batch_rowhash(pd.DataFrame({"v": [long_b]}), fams))

    # float arrays: numpy float64 scalars and Python floats render alike
    ndf = pd.DataFrame({"v": [np.array([0.1, 2.5])]})
    pyf = pd.DataFrame({"v": [[0.1, 2.5]]})
    assert batch_rowhash(ndf, fams) == batch_rowhash(pyf, fams)


def test_batch_rowhash_null_padded_bigint_guard():
    """Int columns that pandas null-padded to float64 are exact only below
    2^53 — the kernel must raise rather than hash a rounded value, and a
    masked nullable Int64 path must stay exact above 2^53."""
    fams = [("a", "int")]
    big = 2**60 + 1
    with pytest.raises(ValueError, match="2\\^53"):
        batch_rowhash(pd.DataFrame({"a": pd.Series([float(big), None])}),
                      fams)
    # nullable Int64 (masked) keeps full precision with nulls present
    n1, h1 = batch_rowhash(
        pd.DataFrame({"a": pd.array([big, None], dtype="Int64")}), fams)
    n2, h2 = batch_rowhash(
        pd.DataFrame({"a": pd.array([big + 1, None], dtype="Int64")}), fams)
    assert n1 == n2 == 2 and h1 != h2


def test_checksum_large_nullable_bigint_end_to_end(spark, duck):
    """Advice r6: both engine adapters must route nullable bigint through
    the exact masked-Int64 path, so values >= 2^53 alongside NULLs
    checksum-compare instead of tripping the fail-closed guard — and a
    1-off value still mismatches (exactness, not float rounding)."""
    big = 2**60 + 7
    sdf = spark.sql(
        f"SELECT * FROM VALUES (CAST({big} AS BIGINT), 1), "
        f"(CAST(NULL AS BIGINT), 2) t(v, k)")
    duck.execute(
        "CREATE OR REPLACE VIEW _bigv AS SELECT * FROM (VALUES "
        f"(CAST({big} AS BIGINT), 1), (NULL, 2)) t(v, k)")
    ok, msg = compare_checksum(sdf, duck, "SELECT * FROM _bigv")
    assert ok, msg
    duck.execute(
        "CREATE OR REPLACE VIEW _bigv AS SELECT * FROM (VALUES "
        f"(CAST({big + 1} AS BIGINT), 1), (NULL, 2)) t(v, k)")
    ok, msg = compare_checksum(sdf, duck, "SELECT * FROM _bigv")
    assert not ok and "checksum" in msg


def test_canon_render_container_float_normalization():
    """Advice r6: floats INSIDE arrays/structs get the same -0.0 -> +0.0
    and NaN-payload collapse the scalar float kernel applies."""
    fams = [("v", "str")]
    neg = batch_rowhash(pd.DataFrame({"v": [[-0.0, 1.5]]}), fams)
    pos = batch_rowhash(pd.DataFrame({"v": [[0.0, 1.5]]}), fams)
    assert neg == pos
    nan1 = np.frombuffer(np.uint64(0x7FF8000000000001).tobytes(),
                         dtype=np.float64)[0]
    a = batch_rowhash(pd.DataFrame({"v": [[float("nan")]]}), fams)
    b = batch_rowhash(pd.DataFrame({"v": [[nan1]]}), fams)
    assert a == b
    # distinct real values inside containers still hash apart
    assert (batch_rowhash(pd.DataFrame({"v": [[1.5]]}), fams)
            != batch_rowhash(pd.DataFrame({"v": [[1.5000000000000002]]}),
                             fams))

def test_spark_checksum_survives_nul_companion_name_collision(spark):
    """Advice r7: a source column literally named __nul_0__ must not be
    clobbered by the internal null-flag companions — the checksum of such a
    frame must equal the direct pandas-kernel hash of the same data."""
    sdf = spark.sql(
        "SELECT * FROM VALUES (1, 10), (2, CAST(NULL AS INT)), "
        "(CAST(NULL AS INT), 30) t(`__nul_0__`, x)")
    n, h = spark_checksum(sdf)
    pdf = pd.DataFrame({
        "__nul_0__": pd.array([1, 2, None], dtype="Int64"),
        "x": pd.array([10, None, 30], dtype="Int64"),
    })
    want = batch_rowhash(pdf, [("__nul_0__", "int"), ("x", "int")])
    assert (n, h) == want
