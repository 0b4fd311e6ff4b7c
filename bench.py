"""BENCH harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line:

    {"metric": "total_wall_sec", "value": N, "unit": "sec",
     "queries": {op: sec, ...}, "sf": ...}

Each query executes end-to-end into the ``noop`` sink so timing covers the
full distributed plan (scan → shuffle → operators) without driver-side
collect overhead distorting the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from build_pipeline_with_apache_beam_spark import registry
from build_pipeline_with_apache_beam_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench")

    qs = registry.queries()
    # warm up the JVM + parquet footer caches on the smallest table
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    # two passes per query, plus a CONDITIONAL third (round-3 verdict #5 —
    # the unconditional second warm pass doubled warm wall time yet changed
    # the minimum for only 3/331 ops): pass 1 pays plan compilation +
    # codegen JIT (recorded as cold); pass 2 is the headline warm number.
    # A warm pass should never exceed its own cold pass (cold ⊇ compile +
    # JIT), so warm1 > cold flags interference (GC/noisy neighbor) and ONLY
    # then is the op re-measured and the minimum kept — steady-state
    # numbers stay comparable across rounds at ~2/3 the sweep wall.
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}

    def _run_once(name: str, fn, attempt: str) -> float:
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            print(f"# bench error {name} ({attempt}): {e}", file=sys.stderr)
            return -1.0

    t_total = time.time()
    for name, fn in sorted(qs.items()):
        cold[name] = _run_once(name, fn, "cold")
        w1 = _run_once(name, fn, "warm1")
        if w1 > 0 and 0 < cold[name] < w1:
            w2 = _run_once(name, fn, "warm2")
            warm[name] = min(w1, w2) if w2 > 0 else w1
        else:
            warm[name] = w1
        # drop cached/persisted state between queries: leaked cache blocks +
        # old shuffle files otherwise accumulate across ~250 runs and the
        # resulting GC pressure adds multi-second noise to later queries
        spark.catalog.clearCache()
    total = round(time.time() - t_total, 3)

    print(json.dumps({
        "metric": "warm_total_sec",
        "value": round(sum(v for v in warm.values() if v > 0), 3),
        "unit": "sec",
        "queries": warm,
        "queries_cold": cold,
        "wall_total_sec": total,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
