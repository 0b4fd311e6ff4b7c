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
  documents get a per-copy suffix token (so dedup does not see an exact
  10x duplicate explosion), embeddings get a small per-copy bias (so ANN
  buckets spread instead of stacking identical vectors).

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
    # history, which is what actually stresses per-user windows/sessionization
    (_replicate(ev, r).select(
        (F.col("event_id") + F.col("_copy") * e_stride).alias("event_id"),
        (F.col("ts") + F.make_interval(secs=F.col("_copy"))).alias("ts"),
        "user_id", "event_type", "value", "props")
     .repartition(max(8, 2 * r))
     .write.mode("overwrite").parquet(os.path.join(dst, "events.parquet")))

    docs = load_table(spark, src, "documents")
    d_stride = _stride(docs, "doc_id")
    text = F.when(F.col("_copy") == 0, F.col("text")).otherwise(
        F.concat("text", F.lit(" rep"), "_copy"))
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
