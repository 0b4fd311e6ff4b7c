"""Generate a larger scale factor by replicating driver testdata.

The shipped testdata tops out at sf0.1 (~600k-row lineitem); the 100-TB
design claims need at least one order-of-magnitude step-up measured on
real data.  This produces sfN = R copies of a source sf with:

- **referential integrity preserved**: fact keys are remapped with a
  per-copy stride (customer/orders/lineitem strides agree), so every join
  an operator does at sf0.1 joins the same way at the new sf;
- **dimensions held fixed** (region/nation/supplier/part): broadcast
  sides stay broadcastable — the realistic star-schema shape at any sf;
- **content perturbation** where verbatim copies would distort semantics:
  documents get ~40% of tokens suffixed per copy (copies are new documents,
  not near-dups — a growing crawl grows mostly new pages), embeddings get a
  small per-copy bias (so ANN buckets spread instead of stacking identical
  vectors);
- **time-axis stretching**: each event copy shifts past the previous copy's
  span, so events-per-window DENSITY stays constant as volume grows — the
  production shape.  ``SCALE_UP_DENSE=1`` reproduces the old dense
  replication (denser windows + near-dup copies) for stress comparisons.

Usage: python tools/scale_up.py [src_sf_dir] [dst_dir] [R]
Defaults: /root/testdata/sf0.1 -> <repo>/.scratch/sfscale/sf1, R=10.
Deterministic — same inputs, same bytes.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from build_pipeline_with_apache_beam_spark.catalog import load_table  # noqa: E402
from build_pipeline_with_apache_beam_spark.session import get_spark  # noqa: E402

DIMS = ("region", "nation", "supplier", "part")


def _replicate(df: DataFrame, r: int) -> DataFrame:
    """Cross the table with copy ids 0..R-1 (copy 0 is the original)."""
    return df.crossJoin(F.broadcast(
        df.sparkSession.range(r).select(F.col("id").alias("_copy"))))


def _stride(df: DataFrame, key: str) -> int:
    return int(df.agg(F.max(key)).collect()[0][0]) + 1


def scale_up(src: str, dst: str, r: int) -> None:
    spark = get_spark("scale-up")
    os.makedirs(dst, exist_ok=True)

    for t in DIMS:
        load_table(spark, src, t).write.mode("overwrite").parquet(
            os.path.join(dst, f"{t}.parquet"))

    cust = load_table(spark, src, "customer")
    orders = load_table(spark, src, "orders")
    li = load_table(spark, src, "lineitem")
    c_stride, o_stride = _stride(cust, "c_custkey"), _stride(orders, "o_orderkey")

    (_replicate(cust, r).select(
        (F.col("c_custkey") + F.col("_copy") * c_stride).alias("c_custkey"),
        F.concat("c_name", F.lit(" r"), "_copy").alias("c_name"),
        "c_nationkey", "c_acctbal", "c_mktsegment")
     .repartition(max(4, r))
     .write.mode("overwrite").parquet(os.path.join(dst, "customer.parquet")))

    (_replicate(orders, r).select(
        (F.col("o_orderkey") + F.col("_copy") * o_stride).alias("o_orderkey"),
        (F.col("o_custkey") + F.col("_copy") * c_stride).alias("o_custkey"),
        "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
     .repartition(max(8, 2 * r))
     .write.mode("overwrite").parquet(os.path.join(dst, "orders.parquet")))

    (_replicate(li, r).select(
        (F.col("l_orderkey") + F.col("_copy") * o_stride).alias("l_orderkey"),
        "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate")
     .repartition(max(16, 4 * r))
     .write.mode("overwrite").parquet(os.path.join(dst, "lineitem.parquet")))

    ev = load_table(spark, src, "events")
    e_stride = _stride(ev, "event_id")
    # user_id deliberately NOT remapped: users get R-times deeper event
    # history, which is what actually stresses per-user windows/sessionization.
    # Each copy's TIME AXIS is shifted past the previous copy's span: a 10x
    # bigger production event log covers ~10x more wall time at the SAME
    # density — replicating timestamps in place instead would multiply the
    # events-per-window density and make every pairs-within-range op look
    # quadratic for reasons the production workload never exhibits.
    # (SCALE_UP_DENSE=1 reproduces the old dense-replication mode.)
    dense = os.environ.get("SCALE_UP_DENSE") == "1"
    span_row = ev.agg(
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
        .alias("span")).collect()[0]
    span_us = int(span_row["span"]) + 3_600_000_000  # +1h guard gap
    shift = (F.make_interval(secs=F.col("_copy")) if dense
             else F.make_interval(
                 secs=F.col("_copy").cast("double") * (span_us / 1e6)))
    (_replicate(ev, r).select(
        (F.col("event_id") + F.col("_copy") * e_stride).alias("event_id"),
        (F.col("ts") + shift).alias("ts"),
        "user_id", "event_type", "value", "props")
     .repartition(max(8, 2 * r))
     .write.mode("overwrite").parquet(os.path.join(dst, "events.parquet")))

    docs = load_table(spark, src, "documents")
    d_stride = _stride(docs, "doc_id")
    # Copies are DISTINCT documents, not near-dups: ~40% of tokens get a
    # copy-specific suffix (deterministic hash choice), pushing Jaccard vs
    # the original well under the 0.7 near-dup threshold.  A crawl that
    # grows 10x grows mostly NEW pages; replicating verbatim copies makes
    # every true-near-dup pair set grow quadratically in R and the dedup
    # family look superlinear for a reason production never exhibits.
    # (SCALE_UP_DENSE=1 keeps the old one-suffix-token near-dup copies.)
    perturbed = F.array_join(
        F.transform(
            F.split("text", " "),
            lambda t: F.when(
                (F.abs(F.xxhash64(t, F.col("_copy"))) % 10 < 4)
                & (F.col("_copy") > 0),
                F.concat(t, F.lit("_"), F.col("_copy"))).otherwise(t)),
        " ")
    text = F.when(F.col("_copy") == 0, F.col("text")).otherwise(
        F.concat(perturbed, F.lit(" rep"), "_copy")
        if not dense else F.concat("text", F.lit(" rep"), "_copy"))
    (_replicate(docs, r).select(
        (F.col("doc_id") + F.col("_copy") * d_stride).alias("doc_id"),
        text.alias("text"), "lang", "source",
        F.length(text).cast("long").alias("n_chars"))
     .repartition(max(8, 2 * r))
     .write.mode("overwrite").parquet(os.path.join(dst, "documents.parquet")))

    emb = load_table(spark, src, "embeddings")
    v_stride = _stride(emb, "vec_id")
    bias = F.col("_copy").cast("double") * 0.003
    (_replicate(emb, r).select(
        (F.col("vec_id") + F.col("_copy") * v_stride).alias("vec_id"),
        F.transform("embedding",
                    lambda x, i: (x + bias * F.cos(i.cast("double")))
                    .cast("float")).alias("embedding"),
        *[c for c in emb.columns if c not in ("vec_id", "embedding")])
     .repartition(max(4, r))
     .write.mode("overwrite").parquet(os.path.join(dst, "embeddings.parquet")))

    print(f"scaled {src} x{r} -> {dst}")
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        n = spark.read.parquet(os.path.join(dst, f"{t}.parquet")).count()
        print(f"  {t}: {n} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = (sys.argv[2] if len(sys.argv) > 2
           else os.path.join(REPO, ".scratch", "sfscale", "sf1"))
    r = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scale_up(src, dst, r)
