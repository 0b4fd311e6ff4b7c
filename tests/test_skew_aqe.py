"""Adversarial skew rehearsal (round-11 verdict #5): a zipf-hot key must
be handled by AQE's runtime skew-join split, not by luck.

The engine's skew story has two tiers: broadcast the small side whenever
it fits (a broadcast join is skew-immune — no shuffle on the fact side's
key), and when the build side is too big to broadcast, AQE's
OptimizeSkewedJoin splits the oversized partition at runtime.  The
manual salted pair (``join_skew_salted``/``agg_salted_skew``) remains
for engines/configs without AQE.  This test forces the second tier:
broadcast disabled, skew thresholds scaled to the fixture, one user
holding ~40% of all events — the executed plan must carry the
``skew=true`` marker on the sort-merge join and the result must equal
the unskewed computation row-for-row.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from build_pipeline_with_apache_beam_spark.catalog import load_table

HOT_USER = 424242  # synthetic hot key, outside the fixture's user range


REPLICAS = 32  # inflate the sf0.001 fixture so shuffle partitions carry
#                enough bytes for the (already scaled-down) skew thresholds


def _skewed_events(spark, sf_dir, out_dir: str):
    """Events with ~40% of rows remapped to one zipf-hot user (determined
    by event_id % 5 < 2 — deterministic, no RNG), replicated REPLICAS×
    with distinct event_ids so the hot shuffle partition has real bytes."""
    if not os.path.exists(out_dir):
        ev = load_table(spark, sf_dir, "events")
        (ev.withColumn("rep", F.explode(
            F.sequence(F.lit(0), F.lit(REPLICAS - 1))))
         .withColumn("user_id",
                     F.when(F.col("event_id") % 5 < 2, F.lit(HOT_USER))
                     .otherwise(F.col("user_id")))
         .withColumn("event_id",
                     F.col("event_id") * REPLICAS + F.col("rep"))
         .drop("rep")
         # incompressible per-row payload: shuffle sizes are COMPRESSED
         # bytes, and a purely replicated fixture lz4-compresses so well
         # the hot partition dips under any byte threshold
         .withColumn("pad", F.sha2(F.conv(F.col("event_id"), 10, 16), 256))
         # ≥8 map tasks: AQE splits a skewed reducer partition at MAPPER
         # block boundaries, so a single-file fixture (one mapper) makes
         # the hot partition one unsplittable block and the rule reports
         # "number of skewed partitions: 0" — fixture-only repartition
         .repartition(8)
         .write.parquet(out_dir))
    return spark.read.parquet(out_dir)


@pytest.fixture()
def skew_conf(spark):
    """Scale AQE's skew knobs to fixture bytes and force the SMJ path;
    restore the session afterwards."""
    keep = {
        k: spark.conf.get(k)
        for k in ("spark.sql.autoBroadcastJoinThreshold",
                  "spark.sql.adaptive.skewJoin.enabled",
                  "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                  "spark.sql.adaptive.skewJoin."
                  "skewedPartitionThresholdInBytes",
                  "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "4KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
    yield
    for k, v in keep.items():
        spark.conf.set(k, v)


def test_aqe_splits_zipf_hot_join_partition(spark, sf_dir, tmp_path,
                                            skew_conf):
    ev = _skewed_events(spark, sf_dir, str(tmp_path / "skewed"))
    # dimension: per-user attributes, too big to broadcast (by config),
    # so the join must survive the hot key via AQE's runtime split.
    #
    # Two planning facts this test encodes (both verified empirically):
    # - the downstream agg keys on event_type, NOT user_id — a split of
    #   the skewed join partition is free only when nothing downstream
    #   requires the join key's hash distribution;
    # - the dim is MATERIALIZED first: OptimizeSkewedJoin only matches
    #   SMJ children of the bare Sort<-Shuffle shape, so an inline
    #   aggregate on the build side suppresses the split entirely.  At
    #   scale, skew-prone fact joins should consume staged/materialized
    #   dimensions (or broadcast them) — deriving the dim inline in the
    #   same query silently forfeits AQE's skew defense.
    dim_dir = str(tmp_path / "dim")
    (ev.groupBy("user_id")
     .agg(F.countDistinct("event_type").alias("n_types"))
     .write.parquet(dim_dir))
    dim = spark.read.parquet(dim_dir)
    joined = (ev.join(dim, "user_id")
              .groupBy("event_type")
              # max(pad) drags the incompressible payload through the
              # join shuffle (column pruning would otherwise drop it and
              # deflate the partition bytes the skew rule sees)
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum("n_types").alias("sum_types"),
                   F.max("pad").alias("max_pad")))
    rows = {r["event_type"]: r["n"] for r in joined.collect()}

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "SortMergeJoin" in plan, "broadcast must be disabled here"
    assert "skew=true" in plan, (
        "AQE did not mark the hot partition as skewed:\n" + plan[:4000])

    # correctness under the split: every event survives the join exactly
    # once (dim has exactly one row per user), split or no split
    expect = {r["event_type"]: r["n"] for r in
              ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    assert rows == expect


def test_sessionize_on_hot_key_stays_correct(spark, sf_dir, tmp_path,
                                             skew_conf):
    """Sessionization partitions BY USER for per-user event ordering — a
    hot user is necessarily one task (window semantics, not a planning
    miss).  The law here is correctness + boundedness: session counts on
    the skewed table equal an independent gaps-and-islands recount for
    the hot user."""
    from build_pipeline_with_apache_beam_spark.operators.behavioral import (
        SESSION_GAP_S,
    )

    ev = _skewed_events(spark, sf_dir, str(tmp_path / "skewed"))
    w_lag = F.lag("ts").over(
        W.partitionBy("user_id").orderBy("ts", "event_id"))
    gap = F.col("ts").cast("long") - w_lag.cast("long")
    starts = F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0)
    n_sessions = (ev.select("user_id", "ts", "event_id",
                            starts.alias("is_start"))
                  .groupBy("user_id")
                  .agg(F.sum("is_start").alias("n_sessions")))
    hot = n_sessions.where(F.col("user_id") == HOT_USER).collect()[0]

    # independent recount: sorted scan of just the hot user's timestamps
    ts = [r["ts"] for r in
          ev.where(F.col("user_id") == HOT_USER)
          .select("ts", "event_id").orderBy("ts", "event_id").collect()]
    recount = 1 + sum(
        1 for a, b in zip(ts, ts[1:])
        if (b - a).total_seconds() > SESSION_GAP_S)
    assert hot["n_sessions"] == recount
    assert hot["n_sessions"] >= 1
