"""Memory-pressure / spill rehearsal (round-12 verdict #2).

Every recorded run so far had 128 GiB of headroom, so the 100 TB claim
that Tungsten spills gracefully under pressure had never been exercised.
This re-runs the most expensive sf1 ops under a deliberately small heap
(default: local[8], 4g driver — ~1/6 the normal budget) and asserts each
one COMPLETES (spill, not OOM), recording memory/disk spill bytes per op
from Spark's stage metrics (REST status API — the same numbers the UI
shows).

Usage: python tools/spill_rehearsal.py [sf_dir] [--json OUT] [op ...]
Defaults: <repo>/.scratch/sfscale/sf1, the pinned TOP_OPS list.
Env: SPILL_CPUS (8), SPILL_MEM (4g), SPILL_MEM_FRACTION (unset) — the
fraction knob shrinks execution memory to force spill at small sf for
the gating test.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the 15 most expensive sf1 ops (BENCH_sf1_r12.json) — the exact
# ground-truth dedup family, the sketch/ANN stack, streaming, and the
# heaviest aggregates: the shapes that would spill first on a loaded
# 100 TB executor
TOP_OPS = (
    "dedup_containment", "dedup_connected_groups", "corpus_dedup_rate_curve",
    "dedup_cluster_canonical", "dedup_ngram_jaccard", "corpus_semdedup",
    "dedup_incremental_minhash", "dedup_embedding_cosine",
    "pipeline_reference_etl_stream", "stream_cep_sessions",
    "agg_approx_percentile", "flagship_q18_large_orders",
    "stream_stream_interval_join", "stream_docstore_tail",
    "embedding_kmeans_train",
)


def _stage_spill(ui_url: str) -> tuple[int, int]:
    """Cumulative (memoryBytesSpilled, diskBytesSpilled) across all stages
    of the running app, via the REST status API."""
    base = f"{ui_url}/api/v1/applications"
    with urllib.request.urlopen(base, timeout=10) as r:
        apps = json.load(r)
    app_id = apps[0]["id"]
    with urllib.request.urlopen(
            f"{base}/{app_id}/stages?status=complete", timeout=30) as r:
        stages = json.load(r)
    return (sum(s.get("memoryBytesSpilled", 0) for s in stages),
            sum(s.get("diskBytesSpilled", 0) for s in stages))


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("--")]
    sf_dir = args[0] if args else os.path.join(
        REPO, ".scratch", "sfscale", "sf1")
    ops = tuple(args[1:]) or TOP_OPS

    cpus = os.environ.get("SPILL_CPUS", "8")
    mem = os.environ.get("SPILL_MEM", "4g")
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = mem

    from build_pipeline_with_apache_beam_spark import registry
    from build_pipeline_with_apache_beam_spark.session import get_spark

    # port 0 = OS-assigned: concurrent rehearsals (or any other session
    # holding a fixed port) would otherwise silently shift the UI one
    # port up while we query the stale one
    extra = {"spark.ui.enabled": "true", "spark.ui.port": "0"}
    frac = os.environ.get("SPILL_MEM_FRACTION")
    if frac:
        extra["spark.memory.fraction"] = frac
    spark = get_spark("spill-rehearsal", extra_conf=extra)
    ui_port = spark.sparkContext.uiWebUrl  # the BOUND url, not the conf

    qs = registry.queries()
    results: dict[str, dict] = {}
    n_fail = 0
    if "--probe-sort" in sys.argv:
        # synthetic wide sort sized to exceed the constrained pool: proves
        # THIS session config spills (not OOMs) and the metrics plumbing
        # reports it — the positive control for the in-mem rows below
        mem0, disk0 = _stage_spill(ui_port)
        t0 = time.time()
        (spark.range(0, 10_000_000)
         .selectExpr("id", "concat('payloadpayloadpayload', id) s")
         .orderBy("s").write.format("noop").mode("overwrite").save())
        mem1, disk1 = _stage_spill(ui_port)
        results["_probe_sort_10m"] = {
            "wall_sec": round(time.time() - t0, 1),
            "memory_spill_bytes": mem1 - mem0,
            "disk_spill_bytes": disk1 - disk0, "err": None}
        print(f"OK   _probe_sort_10m: spilled mem {mem1-mem0:,}B "
              f"disk {disk1-disk0:,}B", flush=True)
    for op in ops:
        mem0, disk0 = _stage_spill(ui_port)
        t0 = time.time()
        try:
            qs[op](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            err = None
        except Exception as e:  # noqa: BLE001 — OOM IS the finding
            err = f"{type(e).__name__}: {e}"[:300]
            n_fail += 1
        wall = round(time.time() - t0, 1)
        mem1, disk1 = _stage_spill(ui_port)
        results[op] = {
            "wall_sec": wall,
            "memory_spill_bytes": mem1 - mem0,
            "disk_spill_bytes": disk1 - disk0,
            "err": err,
        }
        spilled = "SPILLED" if disk1 > disk0 or mem1 > mem0 else "in-mem"
        print(f"{'FAIL' if err else 'OK':4} {op}: {wall}s {spilled} "
              f"(mem {mem1-mem0:,}B disk {disk1-disk0:,}B)"
              + (f" — {err}" if err else ""), flush=True)
        spark.catalog.clearCache()

    doc = {
        "sf_dir": sf_dir, "cpus": int(cpus), "driver_mem": mem,
        "memory_fraction": frac,
        "n_ops": len(ops), "n_failed": n_fail,
        "total_memory_spill_bytes": sum(
            r["memory_spill_bytes"] for r in results.values()),
        "total_disk_spill_bytes": sum(
            r["disk_spill_bytes"] for r in results.values()),
        "ops": results,
    }
    print(json.dumps({k: v for k, v in doc.items() if k != "ops"}))
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(doc, fh, indent=1)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
