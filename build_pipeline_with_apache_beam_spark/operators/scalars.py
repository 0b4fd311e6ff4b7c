"""Scalar-function surface: string / date / math / JSON / array expressions.

The reference uses Python string formatting for filenames
(/root/reference/normalization.py:119-123), datetime arithmetic for window
planning (retrieval.py:189-196), and json.loads/dumps for (de)serialization
(retrieval.py:89-113).  Here every one of these is a built-in Catalyst
expression — JVM-side, inside whole-stage codegen, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from build_pipeline_with_apache_beam_spark.catalog import load_table


def scalar_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/substring/concat/length/trim (filename-building shapes, N3)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("c_mktsegment"), F.lit("#"),
                 F.col("c_custkey").cast("string")).alias("seg_tag"),
        F.length("c_name").alias("name_len"),
        F.trim(F.col("c_mktsegment")).alias("seg_trim"),
    )


def scalar_date_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc / year / hour / to_date — the reference's dt=/hr= bucketing
    (normalization.py:119-121) and day truncation (retrieval.py:214)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
        F.to_date("o_orderdate").alias("order_date"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("dt"),
        F.date_format("o_orderdate", "HH").alias("hr"),
    )


def scalar_math_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        # round at 4 (not 2): the 2+2-decimal product has exactly 4 decimals,
        # so rounding AT the data's precision never hits a half-boundary,
        # while rounding at 2 does (Spark HALF_UP vs DuckDB half-even).
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
         .alias("net_price"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.ceil("l_discount").cast("bigint").alias("disc_ceil"),
        F.floor("l_tax").cast("bigint").alias("tax_floor"),
    )


def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction on events.props (R4-R6 analog).

    One ``from_json`` parse feeding all projections — N ``get_json_object``
    calls would re-parse the document N times per row.
    """
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k STRING, missing STRING")
    return ev.withColumn("p", parsed).select(
        "event_id",
        F.col("p.k").alias("k_str"),
        F.col("p.k").cast("int").alias("k_int"),
        F.col("p.missing").alias("missing_key"),
    )


def scalar_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array expressions on embeddings.embedding (higher-order functions stay
    JVM-side — no Python UDF for a dot product)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_val"),
        F.round(
            F.aggregate("embedding", F.lit(0.0),
                        lambda acc, x: acc + x.cast("double") * x.cast("double")),
            4,
        ).alias("sq_norm"),
    )


def scalar_regex_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extract / count / match / replace — all JVM-side (java.util.regex
    inside whole-stage codegen; the patterns here stay in the RE2-compatible
    subset so the DuckDB oracle evaluates them identically)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", r"^([a-z]+)", 1).alias("first_tok"),
        F.regexp_count("text", F.lit("data")).alias("n_data"),
        F.when(F.col("text").rlike("spark"), 1).otherwise(0).alias("has_spark"),
        F.regexp_replace("text", "[aeiou]", "").alias("devoweled"),
    )


def scalar_conditional_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional scalar surface: CASE/WHEN chains, coalesce, nullif,
    greatest/least — pure projections, all inside whole-stage codegen."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debtor")
         .when(F.col("c_acctbal") < 5000, "standard")
         .otherwise("premium").alias("tier"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")),
                   F.lit("(default)")).alias("segment_or_default"),
        F.round(F.greatest(F.col("c_acctbal"), F.lit(0.0)), 4)
         .alias("nonneg_bal"),
        F.round(F.least(F.col("c_acctbal"), F.lit(9999.0)), 4)
         .alias("capped_bal"),
    )


def scalar_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via Spark 4's VARIANT type: ``parse_json``
    once into the binary variant encoding, then typed ``variant_get`` path
    extraction.  Versus string-path ``get_json_object`` (scalar_json_extract),
    the parse happens once per value rather than once per extraction — at
    100 TB the variant column is what you'd persist for repeated
    semi-structured access."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_int"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.variant_get(v, "$.missing", "string").alias("missing_key"),
    )


QUERIES = {
    "scalar_string_ops": scalar_string_ops,
    "scalar_date_ops": scalar_date_ops,
    "scalar_math_ops": scalar_math_ops,
    "scalar_json_extract": scalar_json_extract,
    "scalar_array_ops": scalar_array_ops,
    "scalar_regex_ops": scalar_regex_ops,
    "scalar_conditional_ops": scalar_conditional_ops,
    "scalar_variant_json": scalar_variant_json,
}

ORACLE = {
    "scalar_string_ops": """
        SELECT c_custkey,
               UPPER(c_name) AS name_upper,
               SUBSTRING(c_name, 1, 8) AS name_prefix,
               c_mktsegment || '#' || CAST(c_custkey AS VARCHAR) AS seg_tag,
               LENGTH(c_name) AS name_len,
               TRIM(c_mktsegment) AS seg_trim
        FROM customer
    """,
    "scalar_date_ops": """
        SELECT o_orderkey,
               CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
               CAST(YEAR(o_orderdate) AS INT) AS order_year,
               CAST(o_orderdate AS DATE) AS order_date,
               STRFTIME(o_orderdate, '%Y-%m-%d') AS dt,
               STRFTIME(o_orderdate, '%H') AS hr
        FROM orders
    """,
    "scalar_math_ops": """
        SELECT l_orderkey, l_linenumber,
               ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price,
               ABS(l_quantity - 25) AS qty_dev,
               CAST(CEIL(l_discount) AS BIGINT) AS disc_ceil,
               CAST(FLOOR(l_tax) AS BIGINT) AS tax_floor
        FROM lineitem
    """,
    "scalar_json_extract": """
        SELECT event_id,
               props->>'$.k' AS k_str,
               CAST(props->>'$.k' AS INT) AS k_int,
               props->>'$.missing' AS missing_key
        FROM events
    """,
    "scalar_array_ops": """
        SELECT vec_id,
               CAST(LEN(embedding) AS INT) AS dim,
               ROUND(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
               ROUND(LIST_SUM(LIST_TRANSFORM(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sq_norm
        FROM embeddings
    """,
    "scalar_regex_ops": """
        SELECT doc_id,
               regexp_extract(text, '^([a-z]+)', 1) AS first_tok,
               CAST(len(regexp_extract_all(text, 'data')) AS INT) AS n_data,
               CASE WHEN regexp_matches(text, 'spark') THEN 1 ELSE 0 END AS has_spark,
               regexp_replace(text, '[aeiou]', '', 'g') AS devoweled
        FROM documents
    """,
    "scalar_conditional_ops": """
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN 'debtor'
                    WHEN c_acctbal < 5000 THEN 'standard'
                    ELSE 'premium' END AS tier,
               COALESCE(NULLIF(c_mktsegment, 'BUILDING'),
                        '(default)') AS segment_or_default,
               ROUND(GREATEST(c_acctbal, 0.0), 4) AS nonneg_bal,
               ROUND(LEAST(c_acctbal, 9999.0), 4) AS capped_bal
        FROM customer
    """,
    "scalar_variant_json": """
        SELECT event_id,
               CAST(props->>'$.k' AS INT) AS k_int,
               props->>'$.k' AS k_str,
               props->>'$.missing' AS missing_key
        FROM events
    """,
}
