"""Dump the formatted physical plan of registered queries for plan audits.

Usage:
    python tools/explain_plans.py [op ...]          # default: all ops
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 ...   # plan-only; sf is cheap

Plans are built, not executed (no actions), so this is fast and safe to run
over the whole registry; streaming/sink ops that execute on construction are
skipped unless named explicitly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from build_pipeline_with_apache_beam_spark import registry
from build_pipeline_with_apache_beam_spark.session import get_spark

# building these executes a write/stream — skip in the default sweep
EXECUTES_ON_BUILD = {
    "sink_partitioned_write", "stream_foreach_batch_sink",
    "stream_stateful_user_agg", "stream_docstore_tail",
    "stream_window_append_watermark",
    "dedup_fuzzy_minhash", "dedup_simhash", "dedup_connected_groups",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    names = sys.argv[1:] or [n for n in sorted(qs) if n not in EXECUTES_ON_BUILD]
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        print(f"{'=' * 30} {name}\n{plan}")


if __name__ == "__main__":
    main()
