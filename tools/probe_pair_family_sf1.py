"""Engine-side sf1 run of the exact-pair dedup family.

At sf1 these five ops' DuckDB oracles are impractical single-node (the
quadratic token-list join / recursive closure that the distributed engine
does in seconds takes the oracle hours), so the cross-engine equality is
proven at sf0.01 — where tests additionally FORCE the tiling path — and
this probe demonstrates the engine itself executes the family at sf1,
recording wall seconds and output rows.

Usage: python tools/probe_pair_family_sf1.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from build_pipeline_with_apache_beam_spark import registry  # noqa: E402
from build_pipeline_with_apache_beam_spark.session import get_spark  # noqa: E402

OPS = ["dedup_ngram_jaccard", "dedup_containment", "corpus_dedup_rate_curve",
       "dedup_connected_groups", "dedup_cluster_canonical"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scratch", "sfscale", "sf1")
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "SCALE_r07_pairfamily_sf1.json")
    spark = get_spark("pair-family-sf1")
    qs = registry.queries()
    results = {}
    for op in OPS:
        t0 = time.time()
        n = qs[op](spark, sf_dir).count()
        results[op] = {"rows": n, "wall_sec": round(time.time() - t0, 2)}
        print(op, results[op])
    payload = {
        "sf_dir": sf_dir,
        "note": "engine-side only: the DuckDB oracle for this family is "
                "single-node-impractical at sf1; equality proven at sf0.01 "
                "incl. forced tiling (tests/test_llm_ops.py)",
        "ops": results,
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
