"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``build_pipeline_with_apache_beam_spark.registry`` — the
operator library owns the (queries, oracle_sql) pairs; this file just
re-exports them plus the flagship ``entry`` smoke query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from build_pipeline_with_apache_beam_spark import registry
from build_pipeline_with_apache_beam_spark.operators.relational import agg_groupby_multi


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape on lineitem) at sf0.001."""
    return agg_groupby_multi(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
