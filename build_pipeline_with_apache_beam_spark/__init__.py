"""PySpark-native analytics engine with the capabilities of the reference
Beam ETL pipeline (hikmahdwi/Build-Pipeline-with-Apache-Beam) plus a general
relational query surface and LLM-data-pipeline operators.

Architecture: everything is declared through the DataFrame/SQL API so Catalyst
picks the physical plan (predicate pushdown, column pruning, broadcast joins,
AQE). Python UDFs appear only where built-in operators genuinely cannot
express the semantics (exact-parity ``str(dict)`` normalization, MinHash
kernels), and then always as Arrow-batched pandas UDFs / mapInPandas.

Modules
-------
- ``session``   SparkSession factory (AQE, Arrow, UTC, tuned shuffle partitions)
- ``catalog``   table loading from a scale-factor directory
- ``io``        sources and sinks (parquet / JSON lines / partitioned writes)
- ``operators`` relational + normalization + dedup + similarity + text ops
- ``streaming`` Structured Streaming: windows, watermarks, foreachBatch sinks
- ``registry``  the (queries, oracle_sql) contract consumed by __spark_entry__
"""

from build_pipeline_with_apache_beam_spark.session import get_spark  # noqa: F401

__all__ = ["get_spark"]
__version__ = "0.1.0"
