"""Broadcast-size audit (round-3 verdict #7): execute ops and read the
ACTUAL BroadcastExchange `data size` metric of every broadcast in their
final adaptive plans, from Spark's SQL status store — the empirical answer
to "does any declared-small broadcast silently grow with sf".

Every broadcast in this engine is by design bounded by model size or
dimension cardinality (codebooks, n-gram LMs, Bloom words, dim tables),
never by corpus size — so each op's LARGEST broadcast must stay under
``BROADCAST_BOUND_BYTES`` at any scale factor.  Run at sf1 (or larger)
and the audit fails loudly on the first broadcast that tracks the corpus.

Usage:
    python tools/broadcast_audit.py [sf_dir] [out.json] [op ...]

Writes {"sf_dir": ..., "bound_bytes": ..., "ops": {op: {"max_broadcast_bytes":
N, "n_broadcasts": K}}, "violations": [...]}; exit 1 on violations.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BROADCAST_BOUND_BYTES = 256 * 1024 * 1024  # declared-small means ≤ 256 MiB

_UNITS = {"B": 1, "KiB": 1 << 10, "MiB": 1 << 20,
          "GiB": 1 << 30, "TiB": 1 << 40}


def _parse_size(s: str) -> int:
    """'1024.8 KiB' / 'total (min, med, max)' strings -> max bytes seen."""
    best = 0
    for num, unit in re.findall(r"([\d.]+)\s*(B|KiB|MiB|GiB|TiB)", s):
        best = max(best, int(float(num) * _UNITS[unit]))
    return best


def _latest_exec_id(spark) -> int:
    """Largest SQL execution id currently retained (-1 if none).  Use this
    as the watermark for ``_broadcast_sizes`` — positional indices break
    once the status store trims past spark.sql.ui.retainedExecutions."""
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    return max((execs.apply(i).executionId()
                for i in range(execs.size())), default=-1)


def _broadcast_sizes(spark, after_exec_id: int) -> list[int]:
    """data-size metric of every BroadcastExchange node in the SQL
    executions with id > ``after_exec_id`` (id-based, trim-safe)."""
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    sizes: list[int] = []
    for ei in range(execs.size()):
        ex = execs.apply(ei)
        if ex.executionId() <= after_exec_id:
            continue
        vals = store.executionMetrics(ex.executionId())
        graph = store.planGraph(ex.executionId())
        nodes = graph.allNodes()
        for ni in range(nodes.size()):
            node = nodes.apply(ni)
            if "BroadcastExchange" not in node.name():
                continue
            mets = node.metrics()
            for mi in range(mets.size()):
                m = mets.apply(mi)
                if m.name() == "data size" and vals.contains(
                        m.accumulatorId()):
                    sizes.append(_parse_size(str(vals.apply(
                        m.accumulatorId()))))
    return sizes


def main() -> int:
    from build_pipeline_with_apache_beam_spark import registry
    from build_pipeline_with_apache_beam_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = args[0] if args else os.path.join(
        REPO, ".scratch", "sfscale", "sf1")
    out_path = args[1] if len(args) > 1 else os.path.join(
        REPO, "BROADCAST_AUDIT.json")
    only = set(args[2:])

    spark = get_spark("broadcast-audit")
    qs = registry.queries()

    ops: dict[str, dict] = {}
    violations: list[str] = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        before = _latest_exec_id(spark)
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            sizes = _broadcast_sizes(spark, before)
            mx = max(sizes, default=0)
            ops[name] = {"max_broadcast_bytes": mx, "n_broadcasts": len(sizes)}
            flag = " ** OVER BOUND" if mx > BROADCAST_BOUND_BYTES else ""
            if flag:
                violations.append(name)
            print(f"{name}: {len(sizes)} broadcasts, max "
                  f"{mx / (1 << 20):.1f} MiB{flag}", flush=True)
        except Exception as e:  # noqa: BLE001
            ops[name] = {"error": str(e)[:300]}
            print(f"{name}: ERROR {e}", flush=True)
        spark.catalog.clearCache()

    result = {"sf_dir": sf_dir, "bound_bytes": BROADCAST_BOUND_BYTES,
              "ops": ops, "violations": violations}
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(f"wrote {out_path}; violations: {violations or 'none'}")
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
