"""Late / out-of-order streaming soak (round-3 verdict #4).

The registered streaming ops run real multi-batch streams, but their
fixtures are time-ordered slices — the watermark machinery is never
actually exercised against late data.  These tests feed deliberately
LATE and OUT-OF-ORDER rows past the watermark through the same three
shapes (tumbling-window agg, session-window agg, CEP-session agg) and
assert:

- the state store's dropped-late accounting (numRowsDroppedByWatermark
  in the query progress) matches the known number of planted late rows;
- the emitted result equals the batch oracle computed over exactly the
  admitted rows with the same watermark cutoff.

Fixtures are deterministic: hand-written rows, one parquet file per
micro-batch, file order pinned via mtime (the file source processes
older files first).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

GAP = "30 minutes"


def _write_batches(spark, src_dir: str, batches: list[str]) -> None:
    """One single-file parquet per batch; mtimes force processing order."""
    shutil.rmtree(src_dir, ignore_errors=True)
    os.makedirs(src_dir)
    base = 1_600_000_000
    for i, rows_sql in enumerate(batches):
        df = spark.sql(
            f"SELECT CAST(user_id AS BIGINT) AS user_id, "
            f"CAST(ts AS TIMESTAMP) AS ts, CAST(value AS DOUBLE) AS value, "
            f"CAST(code AS STRING) AS code "
            f"FROM (VALUES {rows_sql}) AS t(user_id, ts, value, code)")
        tmp = os.path.join(src_dir, f"_tmp{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dest = os.path.join(src_dir, f"batch-{i}.parquet")
        shutil.move(part, dest)
        shutil.rmtree(tmp)
        os.utime(dest, (base + 100 * i, base + 100 * i))


def _run_append_stream(spark, agg_of, src_dir: str, tmpdir: str):
    """Run a 1-file-per-trigger availableNow stream; return (rows, dropped,
    n_batches)."""
    sink_dir = os.path.join(tmpdir, "sink")
    ckpt_dir = os.path.join(tmpdir, "ckpt")
    schema = spark.read.parquet(src_dir).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src_dir))
    agg = agg_of(stream)
    q = (agg.writeStream
         .foreachBatch(lambda b, _i: b.write.mode("append").parquet(sink_dir))
         .option("checkpointLocation", ckpt_dir)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    dropped = 0
    n_batches = 0
    for p in q.recentProgress:
        prog = json.loads(p.json) if hasattr(p, "json") else p
        if prog.get("numInputRows", 0) > 0:
            n_batches += 1
        for so in prog.get("stateOperators", []):
            dropped += so.get("numRowsDroppedByWatermark", 0)
    rows = spark.read.parquet(sink_dir).collect()
    return rows, dropped, n_batches


def test_tumbling_window_drops_late_rows_and_matches_cutoff(
        spark, tmp_path):
    """1-hour windows, 1-hour watermark delay.  A batch-2 row at 09:30
    (window end 10:00 < watermark 11:00) must be dropped and counted; an
    out-of-order batch-3 row at 11:10 is late but inside the delay and
    must be aggregated."""
    src = os.path.join(str(tmp_path), "src")
    # NOTE on timing: batch N runs under the watermark derived from batches
    # < N, and state eviction/emission happens at the END of batch N — so a
    # row only counts as dropped-late once its window was evicted in an
    # EARLIER batch.  The planted late row therefore arrives two batches
    # after its window's data.
    _write_batches(spark, src, [
        # batch 0: max ts 12:00 -> wm for batch 1 = 11:00
        "(1, '2024-03-01 09:15:00', 1.0, 'v'),"
        "(1, '2024-03-01 10:05:00', 2.0, 'v'),"
        "(1, '2024-03-01 12:00:00', 3.0, 'v')",
        # batch 1: runs under wm 11:00 -> at its end windows [09,10) and
        # [10,11) are emitted+evicted; max 12:30 -> wm for batch 2 = 11:30
        "(1, '2024-03-01 11:30:00', 4.0, 'v'),"
        "(1, '2024-03-01 12:30:00', 5.0, 'v')",
        # batch 2: 09:30 is LATE (its window was evicted, end 10:00 < wm
        # 11:30) -> dropped+counted; 11:10 is out-of-order but its window
        # end 12:00 > wm 11:30 -> admitted; max 14:00 -> final wm 13:00
        "(1, '2024-03-01 09:30:00', 10.0, 'v'),"
        "(1, '2024-03-01 11:10:00', 20.0, 'v'),"
        "(1, '2024-03-01 14:00:00', 6.0, 'v')",
    ])

    def agg_of(stream):
        return (stream.withWatermark("ts", "1 hour")
                .groupBy(F.window("ts", "1 hour").alias("w"))
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("value").alias("s"))
                .select(F.col("w.start").cast("string").alias("w_start"),
                        "n", "s"))

    rows, dropped, n_batches = _run_append_stream(
        spark, agg_of, src, str(tmp_path))
    assert n_batches == 3
    assert dropped == 1, f"expected exactly the planted late row, {dropped}"
    got = {r["w_start"]: (r["n"], r["s"]) for r in rows}
    # emitted = windows with end <= final watermark 13:00, EXCLUDING the
    # dropped 09:30 row, INCLUDING the admitted out-of-order 11:10 row
    assert got == {
        "2024-03-01 09:00:00": (1, 1.0),
        "2024-03-01 10:00:00": (1, 2.0),
        "2024-03-01 11:00:00": (2, 24.0),
        "2024-03-01 12:00:00": (2, 8.0),
    }, got


def test_session_window_drops_late_rows_and_matches_cutoff(
        spark, tmp_path):
    """30-min-gap sessions, 2-hour delay.  A batch-2 row whose session
    closed below the watermark is dropped and counted; open sessions at
    end-of-stream stay withheld."""
    src = os.path.join(str(tmp_path), "src")
    _write_batches(spark, src, [
        # batch 0: u1 session A 09:00-09:10; max 13:00 -> wm for b1 = 11:00
        "(1, '2024-03-01 09:00:00', 1.0, 'v'),"
        "(1, '2024-03-01 09:10:00', 2.0, 'v'),"
        "(1, '2024-03-01 13:00:00', 3.0, 'v')",
        # batch 1: runs under wm 11:00 -> at its end session A (end 09:40)
        # is emitted+evicted; 13:10 merges into the open 13:00 session;
        # max 13:10 -> wm for b2 = 11:10
        "(1, '2024-03-01 13:10:00', 4.0, 'v')",
        # batch 2: 09:05 would have merged into session A, but A was
        # evicted (end 09:40 < wm 11:10) -> dropped+counted; max 15:00 ->
        # final wm 13:00: session B (end 13:40) and C stay open/withheld
        "(1, '2024-03-01 09:05:00', 10.0, 'v'),"
        "(1, '2024-03-01 15:00:00', 5.0, 'v')",
    ])

    def agg_of(stream):
        return (stream.withWatermark("ts", "2 hours")
                .groupBy("user_id", F.session_window("ts", GAP).alias("w"))
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("value").alias("s"))
                .select("user_id",
                        F.col("w.start").cast("string").alias("s_start"),
                        "n", "s"))

    rows, dropped, n_batches = _run_append_stream(
        spark, agg_of, src, str(tmp_path))
    assert n_batches == 3
    assert dropped == 1, dropped
    got = {(r["user_id"], r["s_start"]): (r["n"], r["s"]) for r in rows}
    assert got == {(1, "2024-03-01 09:00:00"): (2, 3.0)}, got


def test_cep_sessions_drop_late_rows_and_still_match_pattern(
        spark, tmp_path):
    """The CEP-session shape (journey string per closed session, regex at
    emit): a late row that would have extended a closed session is dropped
    — the emitted journey reflects only admitted rows, and still fires the
    v+c*p pattern."""
    from build_pipeline_with_apache_beam_spark.operators.behavioral import (
        CEP_PATTERN,
    )

    src = os.path.join(str(tmp_path), "src")
    _write_batches(spark, src, [
        # batch 0: u1 journey v,c,p in one session; u2 pushes max ts to
        # 12:00 -> wm for b1 = 10:00
        "(1, '2024-03-01 09:00:00', 1.0, 'v'),"
        "(1, '2024-03-01 09:05:00', 1.0, 'c'),"
        "(1, '2024-03-01 09:10:00', 1.0, 'p'),"
        "(2, '2024-03-01 12:00:00', 1.0, 'v')",
        # batch 1: runs under wm 10:00 -> at its end u1's session (end
        # 09:40) is emitted as journey "vcp"; max 15:30 -> wm for b2 = 13:30
        "(2, '2024-03-01 15:30:00', 1.0, 'v')",
        # batch 2: 09:03 'v' would have extended u1's evicted session ->
        # dropped+counted; u2's sessions never match the pattern
        "(1, '2024-03-01 09:03:00', 1.0, 'v'),"
        "(2, '2024-03-01 16:00:00', 1.0, 'v')",
    ])

    def agg_of(stream):
        return (stream.withWatermark("ts", "2 hours")
                .groupBy("user_id", F.session_window("ts", GAP).alias("w"))
                .agg(F.concat_ws("", F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("ts", "code"))),
                    lambda s: s["code"])).alias("journey"))
                .select("user_id",
                        F.col("w.start").cast("string").alias("s_start"),
                        "journey",
                        F.regexp_count("journey", F.lit(CEP_PATTERN))
                        .cast("bigint").alias("n_matches"))
                .where(F.col("n_matches") > 0))

    rows, dropped, n_batches = _run_append_stream(
        spark, agg_of, src, str(tmp_path))
    assert n_batches == 3
    assert dropped == 1, dropped
    got = {(r["user_id"], r["s_start"]): (r["journey"], r["n_matches"])
           for r in rows}
    # u1's session emits with the 3 admitted rows only (journey "vcp",
    # NOT "vvcp"); u2's sessions never match v+c*p and never appear
    assert got == {(1, "2024-03-01 09:00:00"): ("vcp", 1)}, got


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
