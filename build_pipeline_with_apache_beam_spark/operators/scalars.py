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
        # transcendental tier: sqrt/power are exactly-rounded IEEE ops, so
        # cross-engine equality holds without presentation rounding
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.pow(F.col("l_discount") + 1, 2).alias("disc_p1_sq"),
        F.signum(F.col("l_quantity") - 25).cast("int").alias("qty_sign"),
        F.pmod(F.col("l_orderkey"), F.lit(97)).cast("int").alias("key_mod97"),
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



def scalar_hash_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content hashing: md5 / sha2-256 / crc-free hex digests.

    These are the primitives the corpus-sampling and fingerprinting ops build
    on (text_fingerprint, sample_hash_bucket): engine-portable hex digests
    give reproducible assignments on any runner, unlike xxhash64 whose seed
    is Spark-specific.  All JVM-side codegen expressions.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("md5_hex"),
        F.sha2(F.col("text"), 256).alias("sha256_hex"),
        # first 4 hex chars as an int bucket 0..65535 — the portable
        # hash-bucket assignment used by the sampling ops
        F.conv(F.substring(F.md5(F.col("text")), 1, 4), 16, 10)
         .cast("int").alias("bucket_64k"),
    )


def scalar_datetime_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/timestamp arithmetic: add/diff/last_day/quarter/interval shift —
    the window-planning arithmetic of the reference driver loops
    (retrieval.py:189-196, normalization.py:137-143) as codegen expressions.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_add(F.to_date("o_orderdate"), 30).alias("plus_30d"),
        F.datediff(F.to_date(F.lit("2002-01-01")), F.to_date("o_orderdate"))
         .alias("days_to_2002"),
        F.last_day(F.to_date("o_orderdate")).alias("month_end"),
        F.quarter("o_orderdate").alias("qtr"),
        (F.dayofweek("o_orderdate")).alias("dow_sun1"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 MINUTE")).alias("plus_90m"),
    )


def scalar_map_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-literal lookup + struct build/field-access, flattened back to
    scalar columns.  The map is a broadcast-free dimension-in-an-expression:
    a 5-entry lookup lives in the codegen constant pool, the 100 TB analog
    of a tiny broadcast join.
    """
    ev = load_table(spark, sf_dir, "events")
    code_map = F.create_map(
        F.lit("click"), F.lit(1), F.lit("view"), F.lit(2),
        F.lit("purchase"), F.lit(3), F.lit("signup"), F.lit(4),
        F.lit("error"), F.lit(5))
    stru = F.struct(F.col("user_id").alias("u"), F.col("value").alias("v"))
    return ev.select(
        "event_id",
        F.element_at(code_map, F.col("event_type")).alias("type_code"),
        F.coalesce(F.element_at(code_map, F.lit("absent")), F.lit(0))
         .alias("missing_code"),
        stru.getField("u").alias("struct_user"),
        F.round(stru.getField("v"), 4).alias("struct_val"),
    )


def reshape_explode_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map explode: per-group metric maps built with map_from_entries, then
    fanned back out to (group, key, value) rows with explode — the
    wide-to-long reshape for map-typed columns (tags, feature bags,
    metric dictionaries).

    The map is built in the aggregate (collecting #metrics entries per
    group), so the shuffle carries maps, not rows; the explode is a
    generator in the same stage as the downstream projection.
    """
    ev = load_table(spark, sf_dir, "events")
    per_type = (
        ev.groupBy("event_type")
        .agg(F.round(F.sum("value"), 4).alias("total"),
             F.round(F.avg("value"), 4).alias("mean"),
             F.round(F.max("value"), 4).alias("peak"))
        .select("event_type", F.map_from_entries(F.array(
            F.struct(F.lit("total").alias("k"), F.col("total").alias("v")),
            F.struct(F.lit("mean").alias("k"), F.col("mean").alias("v")),
            F.struct(F.lit("peak").alias("k"), F.col("peak").alias("v")),
        )).alias("metrics"))
    )
    return (
        per_type.select("event_type",
                        F.explode("metrics").alias("metric", "value"))
        .orderBy("event_type", "metric")
    )


def scalar_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise surface: and/or/xor, shifts, popcount — the band-blocking
    arithmetic dedup_simhash builds on, exposed as a first-class op."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("user_id & 255").alias("band_and"),
        F.expr("user_id | 4096").alias("with_flag"),
        F.expr("user_id ^ event_id").alias("xor_mix"),
        F.shiftleft(F.col("user_id"), 3).alias("shl3"),
        F.shiftright(F.col("event_id"), 2).alias("shr2"),
        F.bit_count(F.col("user_id")).alias("popcount"),
    )


def scalar_format_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String assembly/disassembly: printf-style format, pad, concat_ws,
    split_part — the reference's filename construction
    (normalization.py:119-123) generalized."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.format_string("doc-%07d", F.col("doc_id")).alias("padded_id"),
        F.lpad(F.col("lang"), 5, "_").alias("lang_lpad"),
        F.rpad(F.col("source"), 8, ".").alias("src_rpad"),
        F.concat_ws("/", F.col("source"), F.col("lang"),
                    F.col("doc_id").cast("string")).alias("path"),
        F.split_part(F.col("source"), F.lit("src"), F.lit(-1)).alias("src_num"),
    )


def scalar_url_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing: host / path / query-param extraction via ``parse_url``.

    Synthesizes a canonical URL per document, then parses it back — the
    web-corpus normalization primitive (host-level dedup, domain mixing)
    for a crawl pipeline.  JVM-side; the oracle recomputes the components
    directly from the source columns.
    """
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.com/docs/"), F.col("doc_id").cast("string"),
                   F.lit("?lang="), F.col("lang"))
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


def scalar_try_cast_dirty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fault-tolerant casting over dirty inputs: try_cast returns NULL
    instead of failing the job — the engine-wide policy for bad records
    (the reference nulls unparseable rows, retrieval.py:94-95,112-113).

    The dirty column is synthesized deterministically (every 3rd value gets
    a non-numeric suffix) so the null-on-error behavior is observable; the
    casts themselves are codegen expressions in the scan projection.
    """
    ev = load_table(spark, sf_dir, "events")
    dirty = F.when(F.col("event_id") % 3 == 0,
                   F.concat(F.col("value").cast("string"), F.lit("x")))\
             .otherwise(F.col("value").cast("string"))
    return ev.select(
        "event_id",
        dirty.alias("raw"),
        dirty.try_cast("double").alias("as_double"),
        dirty.try_cast("double").isNotNull().alias("parse_ok"),
    )


def scalar_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 collations: group/compare case-insensitively by declaring a
    UTF8_LCASE collation on the column instead of wrapping every use in
    lower() — the collation travels with the type, so every comparison,
    join, and aggregate on the column honors it (and the optimizer can
    still push/prune, unlike an expression wrapper).

    The mixed-case key is synthesized deterministically (even doc_ids
    upper-cased) so the case-folding is observable; output stabilizes on
    lower(key) for engine-portable comparison.
    """
    docs = load_table(spark, sf_dir, "documents")
    mixed = F.when(F.col("doc_id") % 2 == 0, F.upper("source")) \
             .otherwise(F.col("source"))
    collated = F.collate(mixed, "UTF8_LCASE")
    return (
        docs.select(collated.alias("src_ci"))
        .groupBy("src_ci")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(F.lower(F.col("src_ci")).cast("string").alias("source_key"),
                "n_docs")
        .orderBy("source_key")
    )


def scalar_json_array_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed parsing of a JSON ARRAY string: from_json(ArrayType) turns the
    serialized list into a real array column, then array ops apply directly
    (no per-element string surgery).  The array string is synthesized from
    row values so the parse is observable and oracle-checkable."""
    ev = load_table(spark, sf_dir, "events")
    arr_str = F.concat(
        F.lit("["), F.col("event_id").cast("string"),
        F.lit(","), (F.col("event_id") % 7).cast("string"),
        F.lit(","), (F.col("event_id") % 13).cast("string"), F.lit("]"))
    parsed = F.from_json(arr_str, "array<bigint>")
    return ev.select(
        "event_id",
        arr_str.alias("raw_json"),
        F.size(parsed).alias("n_elems"),
        F.element_at(parsed, 2).alias("second_elem"),
        F.expr("aggregate(from_json(concat('[', cast(event_id as string), ',',"
               " cast(event_id % 7 as string), ',',"
               " cast(event_id % 13 as string), ']'), 'array<bigint>'),"
               " 0L, (a, x) -> a + x)").alias("elem_sum"),
    )



def scalar_json_keys_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema profiling: which keys appear in the events'
    JSON props and how often — the first query anyone runs against a
    landed JSON feed (schema drift shows up as new/vanishing keys).

    json_object_keys + explode + one count: key presence collapses
    map-side, so the shuffle carries the (tiny) key vocabulary; the JSON
    parse rides the scan projection.
    """
    ev = load_table(spark, sf_dir, "events")
    n_rows = ev.select(F.count(F.lit(1)).alias("n_rows"))
    keys = ev.select(F.explode(F.json_object_keys("props")).alias("key"))
    return (keys.groupBy("key").agg(F.count(F.lit(1)).alias("n_present"))
            .join(F.broadcast(n_rows))
            .select("key", "n_present",
                    F.round(F.col("n_present") / F.col("n_rows"), 4)
                    .alias("presence_rate"))
            .orderBy("key"))


QUERIES = {
    "scalar_json_keys_profile": scalar_json_keys_profile,
    "scalar_json_array_parse": scalar_json_array_parse,
    "reshape_explode_map": reshape_explode_map,
    "scalar_collation_group": scalar_collation_group,
    "scalar_try_cast_dirty": scalar_try_cast_dirty,
    "scalar_string_ops": scalar_string_ops,
    "scalar_date_ops": scalar_date_ops,
    "scalar_math_ops": scalar_math_ops,
    "scalar_json_extract": scalar_json_extract,
    "scalar_array_ops": scalar_array_ops,
    "scalar_regex_ops": scalar_regex_ops,
    "scalar_conditional_ops": scalar_conditional_ops,
    "scalar_variant_json": scalar_variant_json,
    "scalar_hash_ops": scalar_hash_ops,
    "scalar_datetime_arith": scalar_datetime_arith,
    "scalar_map_struct_ops": scalar_map_struct_ops,
    "scalar_bitwise_ops": scalar_bitwise_ops,
    "scalar_format_ops": scalar_format_ops,
    "scalar_url_ops": scalar_url_ops,
}

ORACLE = {
    "scalar_json_keys_profile": """
        WITH keys AS (
            SELECT UNNEST(json_keys(props)) AS key FROM events
        ), n AS (SELECT COUNT(1) AS n_rows FROM events)
        SELECT key, COUNT(1) AS n_present,
               ROUND(COUNT(1) * 1.0 / MAX(n_rows), 4) AS presence_rate
        FROM keys, n
        GROUP BY key
        ORDER BY key
    """,
    "scalar_json_array_parse": """
        SELECT event_id,
               '[' || event_id || ',' || (event_id % 7) || ','
                   || (event_id % 13) || ']' AS raw_json,
               CAST(3 AS INT) AS n_elems,
               event_id % 7 AS second_elem,
               event_id + (event_id % 7) + (event_id % 13) AS elem_sum
        FROM events
    """,
    "reshape_explode_map": """
        WITH agg AS (
            SELECT event_type,
                   ROUND(SUM(value), 4) AS total,
                   ROUND(AVG(value), 4) AS mean,
                   ROUND(MAX(value), 4) AS peak
            FROM events GROUP BY event_type
        )
        SELECT event_type, u.metric, u.value
        FROM agg, UNNEST([
            {'metric': 'mean', 'value': mean},
            {'metric': 'peak', 'value': peak},
            {'metric': 'total', 'value': total}
        ]) AS t(u)
        ORDER BY event_type, u.metric
    """,
    "scalar_collation_group": """
        SELECT LOWER(CASE WHEN doc_id % 2 = 0 THEN UPPER(source)
                          ELSE source END) AS source_key,
               COUNT(1) AS n_docs
        FROM documents
        GROUP BY source_key
        ORDER BY source_key
    """,
    "scalar_try_cast_dirty": """
        WITH d AS (
            SELECT event_id,
                   CASE WHEN event_id % 3 = 0
                        THEN CAST(value AS VARCHAR) || 'x'
                        ELSE CAST(value AS VARCHAR) END AS raw
            FROM events
        )
        SELECT event_id, raw,
               TRY_CAST(raw AS DOUBLE) AS as_double,
               TRY_CAST(raw AS DOUBLE) IS NOT NULL AS parse_ok
        FROM d
    """,
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
               CAST(FLOOR(l_tax) AS BIGINT) AS tax_floor,
               SQRT(l_quantity) AS qty_sqrt,
               POWER(l_discount + 1, 2) AS disc_p1_sq,
               CAST(SIGN(l_quantity - 25) AS INT) AS qty_sign,
               CAST(l_orderkey % 97 AS INT) AS key_mod97
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
    "scalar_hash_ops": """
        SELECT doc_id,
               MD5(text) AS md5_hex,
               SHA256(text) AS sha256_hex,
               CAST((STRPOS('0123456789abcdef', SUBSTRING(MD5(text), 1, 1)) - 1) * 4096
                  + (STRPOS('0123456789abcdef', SUBSTRING(MD5(text), 2, 1)) - 1) * 256
                  + (STRPOS('0123456789abcdef', SUBSTRING(MD5(text), 3, 1)) - 1) * 16
                  + (STRPOS('0123456789abcdef', SUBSTRING(MD5(text), 4, 1)) - 1)
                  AS INT) AS bucket_64k
        FROM documents
    """,
    "scalar_datetime_arith": """
        SELECT o_orderkey,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus_30d,
               CAST(DATEDIFF('day', CAST(o_orderdate AS DATE),
                             DATE '2002-01-01') AS INT) AS days_to_2002,
               LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
               CAST(QUARTER(o_orderdate) AS INT) AS qtr,
               CAST(DAYOFWEEK(o_orderdate) + 1 AS INT) AS dow_sun1,
               o_orderdate + INTERVAL 90 MINUTE AS plus_90m
        FROM orders
    """,
    "scalar_map_struct_ops": """
        SELECT event_id,
               CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
                    WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4
                    WHEN 'error' THEN 5 END AS type_code,
               0 AS missing_code,
               user_id AS struct_user,
               ROUND(value, 4) AS struct_val
        FROM events
    """,
    "scalar_bitwise_ops": """
        SELECT event_id,
               user_id & 255 AS band_and,
               user_id | 4096 AS with_flag,
               XOR(user_id, event_id) AS xor_mix,
               user_id << 3 AS shl3,
               event_id >> 2 AS shr2,
               CAST(BIT_COUNT(user_id) AS INT) AS popcount
        FROM events
    """,
    "scalar_format_ops": """
        SELECT doc_id,
               PRINTF('doc-%07d', doc_id) AS padded_id,
               LPAD(lang, 5, '_') AS lang_lpad,
               RPAD(source, 8, '.') AS src_rpad,
               CONCAT_WS('/', source, lang, CAST(doc_id AS VARCHAR)) AS path,
               REPLACE(source, 'src', '') AS src_num
        FROM documents
    """,
    "scalar_url_ops": """
        SELECT doc_id,
               source || '.example.com' AS host,
               '/docs/' || CAST(doc_id AS VARCHAR) AS path,
               lang AS lang_param
        FROM documents
    """,
}
