"""IncrementalRunner: the engine's version of the reference's driver loops.

Replaces ``retrieval.run`` (/root/reference/retrieval.py:198-254) and
``normalization.run_pipeline`` (normalization.py:133-170):

- tumbling windows are computed from the committed watermark, not wall-clock
  loops — each window is scanned ONCE (the reference downloads every window
  twice, normalization.py:144+154);
- the watermark commits only after the window's sink action succeeds (the
  reference commits before running, normalization.py:164);
- the >20 000-records adaptive re-plan branch (retrieval.py:217-249) is
  gone: AQE + file splitting parallelize a single scan, so the engine runs
  one plan per window regardless of cardinality;
- the freshness guard (retrieval.py:210-212) survives as ``min_lag``.

The scan itself stays fully distributed: the runner only moves *timestamps*
through the driver, never rows.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from build_pipeline_with_apache_beam_spark.streaming.watermark import WatermarkStore


class IncrementalRunner:
    """Process ``[watermark, now - min_lag)`` in tumbling windows.

    ``source``  : () -> DataFrame with an event-time column ``ts_col``
                  (a parquet scan — lazily re-planned per window so partition
                  pruning / pushdown applies to each window's range).
    ``sink``    : (DataFrame, window_start, window_end) -> int processed-count
                  (must be an action; its success gates the commit).
    """

    def __init__(self, store: WatermarkStore,
                 source: Callable[[], DataFrame],
                 sink: Callable[[DataFrame, datetime, datetime], int],
                 ts_col: str = "ts",
                 window: timedelta = timedelta(minutes=20),
                 min_lag: timedelta = timedelta(0)):
        self.store = store
        self.source = source
        self.sink = sink
        self.ts_col = ts_col
        self.window = window
        self.min_lag = min_lag

    def pending_windows(self, now: datetime | None = None) -> list[tuple[datetime, datetime]]:
        now = now or datetime.now(timezone.utc)
        horizon = now - self.min_lag
        start = self.store.last_processed()
        out = []
        while start + self.window <= horizon:
            out.append((start, start + self.window))
            start = start + self.window
        return out

    def run_once(self, now: datetime | None = None) -> list[dict]:
        """Process every pending window; returns per-window run metadata."""
        results = []
        for w_start, w_end in self.pending_windows(now):
            df = self.source()
            windowed = df.where(
                (F.col(self.ts_col) >= F.lit(w_start.replace(tzinfo=None)))
                & (F.col(self.ts_col) < F.lit(w_end.replace(tzinfo=None)))
            )
            n = self.sink(windowed, w_start, w_end)
            # commit strictly after the sink action succeeded
            self.store.commit(w_start, w_end, n)
            results.append({"window_start": w_start, "window_end": w_end,
                            "record_count": n})
        return results
