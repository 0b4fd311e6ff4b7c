"""Higher-order array functions: transform/filter/exists/forall/aggregate,
zip_with, and positional explode.

The reference flattens nested arrays to strings (normalization.py:96-103) —
it has no array algebra at all.  For the engine these are the vector/token
workhorses: every lambda here compiles to a Catalyst HigherOrderFunction
evaluated JVM-side inside codegen, so per-element work never crosses into
Python.  At 100 TB that is the difference between a scan-speed projection
and an Arrow round-trip per row (let alone a row-at-a-time UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from build_pipeline_with_apache_beam_spark.catalog import load_table


def array_hof_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform → filter → aggregate chain + exists/forall predicates on the
    embedding vectors, all in one JVM projection (no shuffle, no Python)."""
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size(F.filter(vec, lambda x: x > 0)).alias("n_pos"),
        F.round(F.aggregate(F.filter(vec, lambda x: x > 0), F.lit(0.0),
                            lambda acc, x: acc + x), 4).alias("sum_pos"),
        F.exists(vec, lambda x: x > 2.0).alias("any_gt2"),
        F.forall(vec, lambda x: x > -10.0).alias("all_gt_neg10"),
        F.round(F.aggregate(F.transform(vec, lambda x: x * x), F.lit(0.0),
                            lambda acc, x: acc + x), 4).alias("sq_norm"),
    )


def array_zip_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zip_with dot product of each vector's front and back half — the
    pairwise-combine primitive behind the similarity kernels, kept JVM-side
    via slice + zip_with + aggregate."""
    emb = load_table(spark, sf_dir, "embeddings")
    half = 32
    front = F.slice(F.col("embedding"), 1, half)
    back = F.slice(F.col("embedding"), half + 1, half)
    prods = F.zip_with(front, back,
                       lambda a, b: a.cast("double") * b.cast("double"))
    return emb.select(
        "vec_id",
        F.round(F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x), 4)
         .alias("half_dot"),
    )


def array_token_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set algebra on documents.text: distinct/sort/membership filter —
    the JVM-side set kernel under the n-gram Jaccard dedup ops."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    vocab = F.array_distinct(toks)
    stop = F.array([F.lit(w) for w in ("the", "a", "of", "and", "data")])
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(vocab).alias("n_distinct"),
        F.size(F.filter(vocab, lambda t: F.array_contains(stop, t)))
         .alias("n_stopwords"),
        F.element_at(F.array_sort(vocab), 1).alias("first_sorted_tok"),
    )


def array_posexplode_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode of the leading vector dims to (vec_id, pos, val)
    rows — the unpivot that feeds per-dimension statistics.  posexplode emits
    ordinal+value in one generator pass; at scale the output is bounded by
    limiting to the leading dims before the explode, not after."""
    emb = load_table(spark, sf_dir, "embeddings")
    lead = F.slice(F.col("embedding"), 1, 4)
    return (
        emb.select("vec_id", F.posexplode(lead).alias("pos0", "val"))
        .select("vec_id", (F.col("pos0") + 1).alias("pos"),
                F.round(F.col("val").cast("double"), 4).alias("val"))
    )


QUERIES = {
    "array_hof_pipeline": array_hof_pipeline,
    "array_zip_dot": array_zip_dot,
    "array_token_set_ops": array_token_set_ops,
    "array_posexplode_ordinal": array_posexplode_ordinal,
}

ORACLE = {
    "array_hof_pipeline": """
        SELECT vec_id,
               CAST(LEN(LIST_FILTER(embedding, x -> x > 0)) AS INT) AS n_pos,
               ROUND(COALESCE(LIST_SUM(LIST_TRANSFORM(
                   LIST_FILTER(embedding, x -> x > 0),
                   x -> CAST(x AS DOUBLE))), 0.0), 4) AS sum_pos,
               LEN(LIST_FILTER(embedding, x -> CAST(x AS DOUBLE) > 2.0)) > 0
                   AS any_gt2,
               LEN(LIST_FILTER(embedding,
                   x -> CAST(x AS DOUBLE) <= -10.0)) = 0 AS all_gt_neg10,
               ROUND(LIST_SUM(LIST_TRANSFORM(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sq_norm
        FROM embeddings
    """,
    "array_zip_dot": """
        SELECT vec_id,
               ROUND(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, 32),
                   i -> CAST(embedding[i] AS DOUBLE)
                        * CAST(embedding[i + 32] AS DOUBLE))), 4) AS half_dot
        FROM embeddings
    """,
    "array_token_set_ops": """
        SELECT doc_id,
               CAST(LEN(STR_SPLIT_REGEX(text, '\\s+')) AS INT) AS n_tokens,
               CAST(LEN(LIST_DISTINCT(STR_SPLIT_REGEX(text, '\\s+'))) AS INT)
                   AS n_distinct,
               CAST(LEN(LIST_FILTER(LIST_DISTINCT(STR_SPLIT_REGEX(text, '\\s+')),
                   t -> LIST_CONTAINS(['the', 'a', 'of', 'and', 'data'], t)))
                   AS INT) AS n_stopwords,
               LIST_SORT(LIST_DISTINCT(STR_SPLIT_REGEX(text, '\\s+')))[1]
                   AS first_sorted_tok
        FROM documents
    """,
    "array_posexplode_ordinal": """
        SELECT vec_id,
               CAST(pos AS INT) AS pos,
               ROUND(CAST(embedding[pos] AS DOUBLE), 4) AS val
        FROM embeddings, UNNEST(GENERATE_SERIES(1, 4)) AS t(pos)
    """,
}
