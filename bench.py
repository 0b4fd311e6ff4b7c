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

    timings: dict[str, float] = {}
    t_total = time.time()
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            timings[name] = -1.0
            print(f"# bench error {name}: {e}", file=sys.stderr)
    total = round(time.time() - t_total, 3)

    print(json.dumps({
        "metric": "total_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
