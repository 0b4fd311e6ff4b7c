"""Loud drain for terminating streaming queries.

``q.awaitTermination(N)`` returns False on timeout WITHOUT stopping the
query — every call site that then reads the sink treats a half-drained
run as complete.  At sf10 the stream-stream interval join hit exactly
this: the second micro-batch was still joining at the 180 s mark, the op
read the sink early, and the result silently lost half its matches (the
r13 sweep caught it as a 2x oracle rowcount).  A drain timeout must be
an ERROR, never a truncated answer.
"""

from __future__ import annotations


def await_drained(q, timeout_sec: float = 1800.0) -> None:
    """Wait for an availableNow (terminating) query to finish; RAISE if
    it is still running at the deadline instead of returning a sink that
    is missing batches."""
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
        q.awaitTermination(60)
        raise TimeoutError(
            f"streaming drain still running after {timeout_sec}s - "
            f"refusing to read a half-drained sink (lastProgress="
            f"{q.lastProgress and q.lastProgress.get('batchId')})")
    if q.exception() is not None:
        raise q.exception()
