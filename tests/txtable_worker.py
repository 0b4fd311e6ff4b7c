"""Subprocess worker for the multi-process TxTable torture test.

Runs REAL optimistic-retry MERGEs against a shared table root from its own
OS process and its own Spark JVM — the commit protocol's os.link
create-if-absent must serialize writers across processes, not just across
threads in one interpreter.

Modes:
    python txtable_worker.py merge <root> <key> <n_merges>
        MERGE n_merges change-sets, each setting row `key` to
        (merge_index + 1) * 1000 + key.  Prints "WORKER_DONE <versions>"
        (space-separated committed version numbers) on success.
    python txtable_worker.py kill <root> <key> <ready_file>
        Prepare one merge but PARK between snapshot write and commit
        attempt (the pre_commit hook touches ready_file then sleeps) —
        the parent SIGKILLs this process mid-commit; the snapshot dir must
        be left as unreferenced garbage, never a committed version.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from build_pipeline_with_apache_beam_spark.sources.txtable import (  # noqa: E402
    TxTable,
)


def _session(tag: str) -> SparkSession:
    # deliberately NOT get_spark(): each worker needs an isolated tiny JVM
    # (own local dirs, no UI, small heap) so two can race on one host
    scratch = f"/tmp/txworker-{tag}-{os.getpid()}"
    return (SparkSession.builder
            .master("local[2]")
            .appName(f"txtable-worker-{tag}")
            .config("spark.sql.shuffle.partitions", "2")
            .config("spark.driver.memory", "1500m")
            .config("spark.ui.enabled", "false")
            .config("spark.local.dir", scratch)
            .config("spark.sql.warehouse.dir", os.path.join(scratch, "wh"))
            .getOrCreate())


def _changes(spark: SparkSession, key: int, value: float):
    return spark.sql(
        f"SELECT CAST({key} AS BIGINT) AS k, CAST({value} AS DOUBLE) AS v")


def main() -> int:
    mode, root, key = sys.argv[1], sys.argv[2], int(sys.argv[3])
    spark = _session(f"{mode}{key}")
    table = TxTable(spark, root)

    if mode == "merge":
        n_merges = int(sys.argv[4])
        versions = []
        for i in range(n_merges):
            v = table.merge(_changes(spark, key, (i + 1) * 1000 + key),
                            key="k", max_retries=50)
            versions.append(v)
        print("WORKER_DONE", *versions, flush=True)
        return 0

    if mode == "kill":
        ready_file = sys.argv[4]

        def park():
            with open(ready_file, "w") as fh:
                fh.write(str(os.getpid()))
            time.sleep(300)  # parent SIGKILLs us here, mid-commit

        table.merge(_changes(spark, key, -1.0), key="k", pre_commit=park)
        print("WORKER_UNEXPECTEDLY_SURVIVED", flush=True)
        return 1

    raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    sys.exit(main())
