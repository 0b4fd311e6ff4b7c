"""Watermark store: the engine's replacement for the reference's SQLite
checkpoint tables (`balancelogs_dates`, /root/reference/retrieval.py:30-60;
`balance_note_date`, normalization.py:24-51).

A tiny append-only parquet run-log; the current watermark is the max
committed ``window_end``.  Kept deliberately simple: this is driver-side
metadata (a handful of rows per day), not data-plane state — on a cluster it
would live on the shared filesystem (S3/HDFS) next to the checkpoints.

Semantics preserved from the reference:
- default epoch when no watermark exists (retrieval.py:51);
- run metadata recorded per window: counts + timing (retrieval.py:53-60,
  normalization.py:38-43).

Bugs deliberately NOT preserved (SURVEY.md §7 non-goals):
- commit happens only AFTER a successful window (the reference marks done
  before the pipeline even runs, normalization.py:164);
- no +60-minute skew fudge on read (retrieval.py:49) — windows are derived
  from the committed end, so no gap/overlap arithmetic is needed.
"""

from __future__ import annotations

import json
import os
import uuid
from datetime import datetime, timezone

DEFAULT_EPOCH = datetime(2024, 9, 1, tzinfo=timezone.utc)


class WatermarkStore:
    """Append-only JSONL run-log with max-committed-end watermark reads.

    JSONL (not parquet) because each record is one tiny driver-side commit —
    a one-line atomic append; readers take the max.  Concurrent engines are
    expected to coordinate via one store per pipeline, like one Structured
    Streaming checkpoint dir per query.
    """

    def __init__(self, path: str, default_epoch: datetime = DEFAULT_EPOCH):
        self.path = path
        self.default_epoch = default_epoch
        os.makedirs(path, exist_ok=True)

    def _records(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.path)):
            if not name.endswith(".jsonl"):
                continue
            with open(os.path.join(self.path, name)) as f:
                out.extend(json.loads(line) for line in f if line.strip())
        return out

    @staticmethod
    def _utc(dt: datetime) -> datetime:
        """Normalize to tz-aware UTC: Spark collects session-UTC timestamps
        as NAIVE datetimes, and a naive record beside the tz-aware default
        epoch made watermark comparisons raise TypeError (r10)."""
        return dt.replace(tzinfo=timezone.utc) if dt.tzinfo is None else dt

    def last_processed(self) -> datetime:
        """Current watermark: max committed window_end, else the epoch
        (the reference's SELECT ... ORDER BY id DESC LIMIT 1, retrieval.py:43-51)."""
        recs = self._records()
        if not recs:
            return self.default_epoch
        return max(self._utc(datetime.fromisoformat(r["window_end"]))
                   for r in recs)

    def commit(self, window_start: datetime, window_end: datetime,
               record_count: int, **meta) -> None:
        """Record a successfully processed window (retrieval.py:53-60)."""
        rec = {
            "window_start": self._utc(window_start).isoformat(),
            "window_end": self._utc(window_end).isoformat(),
            "record_count": int(record_count),
            "committed_at": datetime.now(timezone.utc).isoformat(),
            **meta,
        }
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}")
        final = os.path.join(self.path, f"run-{uuid.uuid4().hex}.jsonl")
        with open(tmp, "w") as f:
            f.write(json.dumps(rec) + "\n")
        os.rename(tmp, final)

    def history(self) -> list[dict]:
        return sorted(self._records(), key=lambda r: r["committed_at"])
