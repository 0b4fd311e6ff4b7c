"""Round-5 tests: pyarrow.fs seam for footer introspection, the capped
range-pair family, and probe-gate support ops."""

from __future__ import annotations

import pytest


def test_rowgroup_profile_works_on_explicit_file_uri(spark, sf_dir):
    """The op must produce identical output when the sf_dir arrives as an
    explicit ``file://`` URI — proving every open routes through the
    pyarrow.fs resolution instead of assuming a bare local path."""
    from build_pipeline_with_apache_beam_spark.operators.scans import (
        scan_parquet_rowgroup_profile,
    )

    plain = [tuple(r) for r in
             scan_parquet_rowgroup_profile(spark, sf_dir).collect()]
    via_uri = [tuple(r) for r in
               scan_parquet_rowgroup_profile(spark, "file://" + sf_dir)
               .collect()]
    assert plain == via_uri
    assert plain


def test_rowgroup_profile_listing_uses_fs_factory(spark, sf_dir,
                                                  monkeypatch):
    """Monkeypatching resolve_filesystem must be observed by the driver-side
    listing — the seam a real cluster swaps for an object-store FS."""
    from build_pipeline_with_apache_beam_spark.operators import scans

    calls = []
    real = scans.resolve_filesystem

    def counting(path):
        calls.append(path)
        return real(path)

    monkeypatch.setattr(scans, "resolve_filesystem", counting)
    df = scans.scan_parquet_rowgroup_profile(spark, sf_dir)
    assert calls, "listing did not route through resolve_filesystem"
    assert df.columns[0] == "file_name"


def test_resolve_filesystem_uri_vs_bare_path():
    from pyarrow import fs as pafs

    from build_pipeline_with_apache_beam_spark.operators.scans import (
        resolve_filesystem,
    )

    f1, p1 = resolve_filesystem("/tmp/x.parquet")
    assert isinstance(f1, pafs.LocalFileSystem) and p1 == "/tmp/x.parquet"
    f2, p2 = resolve_filesystem("file:///tmp/x.parquet")
    assert isinstance(f2, pafs.LocalFileSystem) and p2 == "/tmp/x.parquet"


def test_range_gap_histogram_reports_drop_mass_columns(spark, sf_dir):
    """The capped pair family must never truncate silently: the drop
    report columns are part of the schema and kept+dropped add up to the
    full left expansion landing in non-empty buckets."""
    from pyspark.sql import functions as F

    from build_pipeline_with_apache_beam_spark.catalog import load_table
    from build_pipeline_with_apache_beam_spark.operators.relational import (
        _RANGE_W_US,
        join_range_gap_histogram,
    )

    df = join_range_gap_histogram(spark, sf_dir)
    assert {"dropped_left_rows", "kept_left_rows"} <= set(df.columns)
    rows = df.collect()
    assert rows
    kept = rows[0]["kept_left_rows"]
    dropped = rows[0]["dropped_left_rows"]
    assert dropped >= 0 and kept > 0
    # independent accounting: left rows explode into <=2 buckets; only
    # those landing in a bucket with right-side rows are admission
    # candidates
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    a = (ev.select(us.alias("t1"))
         .withColumn("bkt", F.explode(F.array(
             F.expr(f"t1 div {_RANGE_W_US}"),
             F.expr(f"t1 div {_RANGE_W_US}") + 1))))
    b_bkts = (ev.select(F.expr(f"unix_micros(ts) div {_RANGE_W_US}")
                        .alias("bkt")).distinct())
    expected = a.join(b_bkts, "bkt").count()
    assert kept + dropped == expected


def test_phash_neardup_sweep_positive_path(spark, sf_dir):
    """The registry op itself (not just a unit-test pipeline) must surface
    the planted real-PNG near-dup pair at every sf: (-1, -2) found at
    0 < Hamming <= 6, the inverted control (-3) never paired."""
    from build_pipeline_with_apache_beam_spark.operators.multimodal import (
        multimodal_phash_neardup,
    )

    rows = multimodal_phash_neardup(spark, sf_dir).collect()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    assert (-2, -1) in pairs
    assert 0 < pairs[(-2, -1)] <= 6
    assert not any(-3 in p for p in pairs)


def test_range_gap_histogram_cap_engages_deterministically(spark, sf_dir):
    """Force a tiny budget by monkeypatching and check (a) drops happen,
    (b) the result is identical across two runs (admission is md5-ranked,
    not sample-based)."""
    import build_pipeline_with_apache_beam_spark.operators.relational as rel

    orig = rel._RANGE_PAIR_BUDGET
    try:
        rel._RANGE_PAIR_BUDGET = 1
        r1 = [tuple(r) for r in
              rel.join_range_gap_histogram(spark, sf_dir).collect()]
        r2 = [tuple(r) for r in
              rel.join_range_gap_histogram(spark, sf_dir).collect()]
    finally:
        rel._RANGE_PAIR_BUDGET = orig
    assert r1 == r2
    assert r1[0][3] > 0  # dropped_left_rows
    # budget=1 => at most 1 left row admitted per bucket, so pair work is
    # bounded by the number of buckets
    total_pairs = sum(r[1] for r in r1)
    assert total_pairs > 0
