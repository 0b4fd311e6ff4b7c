"""Compare two bench.py JSON outputs and flag per-query regressions.

Usage:  python tools/bench_compare.py OLD.json NEW.json [ratio]

Exit code 1 if total wall regresses beyond `ratio` (default 2.0, the
BASELINE.md acceptance envelope) or any individual query regresses beyond
3x its old warm figure (ignoring sub-200ms noise).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    """A committed BENCH_local_r*.json is one pretty-printed object; raw
    bench.py stdout is line-oriented with the full object on its own line
    (possibly preceded by log noise).  Try the whole file first, then fall
    back to the first parseable JSON line."""
    with open(path) as f:
        text = f.read()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    raise SystemExit(f"no JSON object found in {path}")


def main() -> int:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    total_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    per_query_ratio = 3.0
    noise_floor = 0.2  # sub-200ms timings are scheduler noise at local[32]

    failed = False
    o_total, n_total = old["value"], new["value"]
    shared = set(old["queries"]) & set(new["queries"])
    print(f"total warm: {o_total:.1f}s -> {n_total:.1f}s "
          f"({n_total / o_total:.2f}x); {len(shared)} shared queries "
          f"(+{len(set(new['queries']) - set(old['queries']))} new, "
          f"-{len(set(old['queries']) - set(new['queries']))} removed)")
    if n_total > o_total * total_ratio:
        print(f"FAIL total regressed beyond {total_ratio}x")
        failed = True

    regressions = []
    for q in sorted(shared):
        o, n = old["queries"][q], new["queries"][q]
        if o <= 0 or n <= 0:
            if n < 0:
                print(f"FAIL {q}: errored in new run")
                failed = True
            continue
        # both gates: ratio AND ≥1 s absolute — sub-second ops on a shared
        # local[32] host jitter 3-4x from scheduler/GC noise alone
        if n > max(o, noise_floor) * per_query_ratio and n - o >= 1.0:
            regressions.append((n / o, q, o, n))
    for r, q, o, n in sorted(regressions, reverse=True):
        print(f"FAIL {q}: {o:.2f}s -> {n:.2f}s ({r:.1f}x)")
        failed = True
    if not failed:
        print("OK no regressions beyond envelope")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
