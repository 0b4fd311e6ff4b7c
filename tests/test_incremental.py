"""Watermark store + IncrementalRunner: the engine's replacement for the
reference's SQLite checkpoints and driver loops — including regression tests
for the reference bugs the engine must NOT have (double processing,
premature commit)."""

from __future__ import annotations

import os
from datetime import datetime, timedelta, timezone

import pytest

from pyspark.sql import functions as F

from build_pipeline_with_apache_beam_spark.catalog import load_table
from build_pipeline_with_apache_beam_spark.streaming.runner import IncrementalRunner
from build_pipeline_with_apache_beam_spark.streaming.watermark import WatermarkStore

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def test_watermark_defaults_to_epoch(tmp_path):
    ws = WatermarkStore(str(tmp_path / "wm"), default_epoch=EPOCH)
    assert ws.last_processed() == EPOCH


def test_watermark_advances_to_max_commit(tmp_path):
    ws = WatermarkStore(str(tmp_path / "wm"), default_epoch=EPOCH)
    ws.commit(EPOCH, EPOCH + timedelta(minutes=20), 5)
    ws.commit(EPOCH + timedelta(minutes=20), EPOCH + timedelta(minutes=40), 7)
    assert ws.last_processed() == EPOCH + timedelta(minutes=40)
    assert [r["record_count"] for r in ws.history()] == [5, 7]


def test_runner_processes_each_window_exactly_once(spark, sf_dir, tmp_path):
    """No double download (normalization.py:144+154) and no gaps: each
    window's rows are seen exactly once and counts reconcile with a direct
    range scan (the reference's own count-reconciliation invariant)."""
    ws = WatermarkStore(str(tmp_path / "wm"), default_epoch=EPOCH)
    seen: list[tuple] = []

    def sink(df, w_start, w_end):
        n = df.count()
        seen.append((w_start, w_end, n))
        return n

    runner = IncrementalRunner(
        ws, source=lambda: load_table(spark, sf_dir, "events"),
        sink=sink, window=timedelta(hours=1))

    now = EPOCH + timedelta(hours=3, minutes=30)
    results = runner.run_once(now=now)
    assert len(results) == 3  # 3 full hours fit before 03:30
    assert [r["window_start"] for r in results] == [
        EPOCH, EPOCH + timedelta(hours=1), EPOCH + timedelta(hours=2)]

    # exactly-once: re-run at the same clock → nothing pending
    assert runner.run_once(now=now) == []

    # count reconciliation vs one direct scan of the full range
    total_direct = (
        load_table(spark, sf_dir, "events")
        .where((F.col("ts") >= F.lit("2024-01-01 00:00:00"))
               & (F.col("ts") < F.lit("2024-01-01 03:00:00")))
        .count())
    assert sum(n for _, _, n in seen) == total_direct


def test_runner_does_not_commit_on_sink_failure(spark, sf_dir, tmp_path):
    """The reference marks done BEFORE the pipeline runs
    (normalization.py:164); the engine must commit only after success."""
    ws = WatermarkStore(str(tmp_path / "wm"), default_epoch=EPOCH)

    def bad_sink(df, w_start, w_end):
        raise RuntimeError("sink exploded")

    runner = IncrementalRunner(
        ws, source=lambda: load_table(spark, sf_dir, "events"),
        sink=bad_sink, window=timedelta(hours=1))

    with pytest.raises(RuntimeError):
        runner.run_once(now=EPOCH + timedelta(hours=2))
    assert ws.last_processed() == EPOCH  # watermark unmoved


def test_runner_respects_min_lag(tmp_path, spark, sf_dir):
    """Freshness guard (retrieval.py:210-212): stay min_lag behind now."""
    ws = WatermarkStore(str(tmp_path / "wm"), default_epoch=EPOCH)
    runner = IncrementalRunner(
        ws, source=lambda: load_table(spark, sf_dir, "events"),
        sink=lambda df, s, e: 0, window=timedelta(hours=1),
        min_lag=timedelta(hours=25))
    assert runner.pending_windows(now=EPOCH + timedelta(hours=26, minutes=30)) == [
        (EPOCH, EPOCH + timedelta(hours=1))]
    assert runner.pending_windows(now=EPOCH + timedelta(hours=20)) == []


def test_pending_windows_properties():
    """Property: for any epoch/watermark/horizon/width, pending windows
    tile [watermark, horizon) with no gaps, no overlaps, constant width,
    and never cross the horizon — the invariant the reference's hand-rolled
    loops break (double download, normalization.py:144+154)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        start_min=st.integers(min_value=0, max_value=10_000),
        width_min=st.integers(min_value=1, max_value=600),
        horizon_min=st.integers(min_value=0, max_value=20_000),
        lag_min=st.integers(min_value=0, max_value=600),
    )
    def check(start_min, width_min, horizon_min, lag_min):
        wm = EPOCH + timedelta(minutes=start_min)
        now = EPOCH + timedelta(minutes=horizon_min)
        width = timedelta(minutes=width_min)
        lag = timedelta(minutes=lag_min)

        class _Store:
            def last_processed(self):
                return wm

        r = IncrementalRunner(_Store(), source=None, sink=None,
                              window=width, min_lag=lag)
        wins = r.pending_windows(now=now)
        horizon = now - lag
        assert all(e - s == width for s, e in wins)
        assert all(e <= horizon for _, e in wins)
        if wins:
            assert wins[0][0] == wm
            for (s1, e1), (s2, e2) in zip(wins, wins[1:]):
                assert e1 == s2          # contiguous, no gap/overlap
            # maximal: one more window would cross the horizon
            assert wins[-1][1] + width > horizon
        else:
            assert wm + width > horizon

    check()
