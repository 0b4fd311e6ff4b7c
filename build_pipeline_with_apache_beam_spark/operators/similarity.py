"""Similarity search over embedding vectors (array<float>, dim 64).

Brute-force cosine top-k as the exact baseline, and a random-hyperplane-LSH
bucketed variant as the scale path — both pure DataFrame plans:

- the dot product is a JVM-side higher-order function
  (``aggregate(zip_with(a, b, *), +)``), no Python in the row path;
- the query set is broadcast (it is small by construction), so brute force
  is one scan of the candidate side: cost O(N_candidates × k_queries × dim),
  shuffle only for the final per-query top-k (which TakeOrdered keeps tiny);
- the LSH variant buckets both sides on hyperplane sign bits and joins on
  the bucket id, cutting the candidate set per query by ~2^bits at the cost
  of recall — the standard ANN trade.

At 100 TB (billions of vectors) the LSH/IVF bucketing is mandatory: brute
force reads everything per query batch, bucketed search reads only matching
buckets — and the bucket id is a computed column, so it can be a partition
key on disk (partition pruning turns ANN into a metadata lookup).

Embedding near-duplicate detection (cosine ≥ τ pairs) reuses the same
bucketing as a blocked self-join.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from build_pipeline_with_apache_beam_spark.catalog import load_table

DIM = 64
N_PLANES = 4  # 2^4 buckets — sized so buckets hold enough candidates at test SFs
TOP_K = 10
N_QUERIES = 5  # queries = vec_id < N_QUERIES


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(_dot(a, a))


def _cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def _with_double_vec(df: DataFrame, col: str = "embedding") -> DataFrame:
    return df.withColumn("vec", F.col(col).cast("array<double>"))


def _with_unit_vec(df: DataFrame, col: str = "embedding") -> DataFrame:
    """Pre-normalize to unit length ONCE per vector, so every pairwise
    cosine downstream is a single dot product instead of dot + two norms —
    3× less expression work inside the join, and at scale the normalized
    column is what you'd persist in the index.

    Repartitioned to full parallelism: the per-pair dot products downstream
    are the CPU hot loop, and the test corpus is one small parquet file =
    ONE input split (at 100 TB the splits provide this spread natively)."""
    spark = df.sparkSession
    v = F.col(col).cast("array<double>")
    n = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return (df.repartition(spark.sparkContext.defaultParallelism)
            .withColumn("vec", F.transform(v, lambda x: x / n)))


def sim_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine for (query × candidate): the verifiable kernel.
    Queries broadcast against one candidate scan."""
    emb = _with_unit_vec(load_table(spark, sf_dir, "embeddings"))
    q = (emb.where(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")))
    c = emb.select(F.col("vec_id").alias("cand_id"), F.col("vec").alias("cvec"))
    return (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id",
                F.round(_dot(F.col("qvec"), F.col("cvec")), 4).alias("cosine"))
    )


def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-k per query over the rounded cosine (rounding
    first makes the ranking engine-portable; ties break on cand_id)."""
    from pyspark.sql import Window as W

    pairs = sim_cosine_pairs(spark, sf_dir)
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def _hyperplanes() -> list[list[float]]:
    """Fixed pseudo-random hyperplanes (seeded — identical across runs and
    engines; would be broadcast state in a persisted index)."""
    rng = np.random.RandomState(42)
    return rng.standard_normal((N_PLANES, DIM)).round(6).tolist()


def _bucket(vec_col) -> F.Column:
    """LSH bucket id: sign bit of the dot product with each hyperplane."""
    planes = _hyperplanes()
    bits = [
        F.when(_dot(vec_col, F.array(*[F.lit(v) for v in p])) >= 0,
               F.lit(1 << i)).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def sim_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k: candidates restricted to the query's hyperplane bucket.

    Same output shape as sim_cosine_topk but approximate — per-query work
    drops from N to ~N/2^planes.  (Rows-only: recall is probabilistic by
    design; tests measure it against the exact baseline.)
    """
    from pyspark.sql import Window as W

    emb = _with_unit_vec(load_table(spark, sf_dir, "embeddings"))
    bucketed = emb.withColumn("bucket", _bucket(F.col("vec")))
    q = (bucketed.where(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec"),
                 F.col("bucket").alias("qbucket")))
    c = bucketed.select(F.col("vec_id").alias("cand_id"),
                        F.col("vec").alias("cvec"), "bucket")
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        c.join(F.broadcast(q), (F.col("bucket") == F.col("qbucket"))
               & (F.col("query_id") != F.col("cand_id")))
        .select("query_id", "cand_id",
                F.round(_dot(F.col("qvec"), F.col("cvec")), 4).alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
    )


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs: blocked self-join on the LSH bucket,
    exact cosine ≥ threshold inside each block."""
    emb = _with_unit_vec(load_table(spark, sf_dir, "embeddings"))
    bucketed = emb.select("vec_id", "vec").withColumn("bucket", _bucket(F.col("vec")))
    a = bucketed.select(F.col("vec_id").alias("vec_a"),
                        F.col("vec").alias("va"), "bucket")
    b = bucketed.select(F.col("vec_id").alias("vec_b"),
                        F.col("vec").alias("vb"),
                        F.col("bucket").alias("bucket_b"))
    return (
        a.join(b, (F.col("bucket") == F.col("bucket_b"))
               & (F.col("vec_a") < F.col("vec_b")))
        .withColumn("cosine", F.round(_dot(F.col("va"), F.col("vb")), 4))
        .where(F.col("cosine") >= 0.5)
        .select("vec_a", "vec_b", "cosine")
    )


QUERIES = {
    "sim_cosine_pairs": sim_cosine_pairs,
    "sim_cosine_topk": sim_cosine_topk,
    "sim_ann_lsh_topk": sim_ann_lsh_topk,
    "dedup_embedding_cosine": dedup_embedding_cosine,
}

ORACLE = {
    "sim_cosine_pairs": f"""
        SELECT c.vec_id AS cand_id, q.vec_id AS query_id,
               ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
                                            c.embedding::DOUBLE[]), 4) AS cosine
        FROM embeddings c, embeddings q
        WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
    """,
    "sim_cosine_topk": f"""
        WITH pairs AS (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                   ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
                                                c.embedding::DOUBLE[]), 4) AS cosine
            FROM embeddings c, embeddings q
            WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
        )
        SELECT query_id, cand_id, cosine, rank FROM (
            SELECT query_id, cand_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, cand_id) AS rank
            FROM pairs) t
        WHERE rank <= {TOP_K}
    """,
}
