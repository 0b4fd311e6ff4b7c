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

    # three passes per query: pass 1 pays plan compilation + codegen JIT
    # (recorded as cold); the headline `queries` timing is the BEST of two
    # warm passes — single warm runs on this shared host vary 2-3× from
    # GC/JIT/noisy-neighbor effects, and the minimum is the stable
    # steady-state estimate a regression gate can compare across rounds.
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    t_total = time.time()
    for name, fn in sorted(qs.items()):
        for attempt in ("cold", "warm1", "warm2"):
            t0 = time.time()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                took = round(time.time() - t0, 3)
            except Exception as e:  # noqa: BLE001
                took = -1.0
                print(f"# bench error {name} ({attempt}): {e}", file=sys.stderr)
            if attempt == "cold":
                cold[name] = took
            elif took > 0:
                warm[name] = min(warm.get(name, float("inf")), took)
            else:
                warm.setdefault(name, took)
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
