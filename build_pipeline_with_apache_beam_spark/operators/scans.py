"""Sources, projection, and filter operators.

Derived from the reference's scans: the MongoDB time-range scan with the
predicate pushed into the source (/root/reference/retrieval.py:62-86), the
GCS time-filtered file listing (normalization.py:53-79), and the 13-key
projection whitelist (normalization.py:91-95).

Spark-first: all of these are a parquet/json scan plus declarative
``select``/``where`` — Catalyst pushes the filter and the column pruning into
the file source (visible as PushedFilters / ReadSchema in ``.explain``), which
is the distributed version of the reference's server-side Mongo predicate.
At 100 TB the scan cost is dominated by bytes read, so projection pruning and
min/max row-group skipping on the pushed predicate are the two levers that
matter; both are free once the plan is declarative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from build_pipeline_with_apache_beam_spark.catalog import load_table

# The engine-side analog of the reference's fixed extraction day
# (retrieval.py:214-215): a closed timestamp range on event time.
TIME_RANGE = ("2024-01-01 02:00:00", "2024-01-01 08:00:00")


def scan_parquet_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection-pruned parquet scan (R1/N1; ReadSchema shows 3 columns)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_shipdate")
    )


def filter_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range predicate pushed to the scan (retrieval.py:69-72 analog)."""
    lo, hi = TIME_RANGE
    return (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts").between(F.lit(lo).cast("timestamp"),
                                   F.lit(hi).cast("timestamp")))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


def filter_predicate_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound AND/OR predicate (the $and shape at retrieval.py:67-74)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(
            (F.col("event_type").isin("click", "purchase"))
            & (F.col("value") > 50.0)
            & (F.col("user_id") % 2 == 0)
        )
        .select("event_id", "user_id", "event_type", "value")
    )


def project_whitelist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-whitelist projection (N2's 13-key whitelist, normalization.py:91-95)."""
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "event_type")
    )


def scan_json_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse a JSON text column with an explicit schema (N2, normalization.py:89).

    The reference parses each line with ``json.loads`` in Python; here
    ``from_json`` runs JVM-side inside codegen.  PERMISSIVE semantics: bad
    JSON → null struct, matching validate_json's tolerate-and-null
    (retrieval.py:97-113).
    """
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("parsed", F.from_json("props", "k INT"))
    return (
        parsed.select(
            "event_id",
            F.col("parsed.k").alias("prop_k"),
        )
    )


def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV as a source format: write the customer table as headered CSV
    (distributed), read it back with an EXPLICIT schema, filter + project.

    Schema-on-read with a declared schema, not inferSchema — inference is a
    whole extra pass over the data, which at 100 TB doubles the scan.  CSV
    supports no predicate pushdown or column pruning at the byte level
    (row-oriented text), which is exactly why the lake layer converts to
    parquet on ingest; this op exists to cover the format, not to bless it.
    """
    import os

    from build_pipeline_with_apache_beam_spark.sources.sinks import SCRATCH

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(SCRATCH, f"csv_customer_{sf_tag}")
    if not os.path.exists(path):
        (load_table(spark, sf_dir, "customer")
         .write.mode("overwrite").option("header", True).csv(path))
    schema = ("c_custkey BIGINT, c_name STRING, c_nationkey INT, "
              "c_acctbal DOUBLE, c_mktsegment STRING")
    return (spark.read.schema(schema).option("header", True).csv(path)
            .where(F.col("c_acctbal") > 1000.0)
            .select("c_custkey", "c_name",
                    F.round("c_acctbal", 4).alias("c_acctbal"),
                    "c_mktsegment"))


QUERIES = {
    "scan_parquet_project": scan_parquet_project,
    "filter_time_range": filter_time_range,
    "filter_predicate_compound": filter_predicate_compound,
    "project_whitelist": project_whitelist,
    "scan_json_lines": scan_json_lines,
    "scan_csv_roundtrip": scan_csv_roundtrip,
}

ORACLE = {
    "scan_parquet_project": """
        SELECT l_orderkey, l_extendedprice, l_shipdate FROM lineitem
    """,
    "filter_time_range": f"""
        SELECT event_id, ts, user_id, event_type, value
        FROM events
        WHERE ts BETWEEN TIMESTAMP '{TIME_RANGE[0]}' AND TIMESTAMP '{TIME_RANGE[1]}'
    """,
    "filter_predicate_compound": """
        SELECT event_id, user_id, event_type, value
        FROM events
        WHERE event_type IN ('click', 'purchase')
          AND value > 50.0
          AND user_id % 2 = 0
    """,
    "project_whitelist": """
        SELECT event_id, ts, event_type FROM events
    """,
    "scan_json_lines": """
        SELECT event_id, CAST(props->>'$.k' AS INT) AS prop_k FROM events
    """,
    "scan_csv_roundtrip": """
        SELECT c_custkey, c_name, ROUND(c_acctbal, 4) AS c_acctbal,
               c_mktsegment
        FROM customer WHERE c_acctbal > 1000.0
    """,
}
