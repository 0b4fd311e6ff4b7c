"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at a given scale factor, runs the matching
``oracle_sql()`` in DuckDB over the same parquet tables, and compares
row-count + column names + order-insensitive values (exact — see
build_pipeline_with_apache_beam_spark/oracle.py).

Usage: python tools/check_correctness.py [--json OUT] [sf_dir] [op ...]

With ``--json OUT`` the per-op results are also written in the driver's
CORRECTNESS_r{N}.json format (rows_match/schema_match/hash_match/…), so a
full-registry artifact can be committed per round (round-2 verdict #5).
Rows-only ops are tagged ``err: "no_oracle"`` exactly as the driver does.

Set CHECK_MAX_ROWS to cap result size (default unlimited): ops whose
Spark result exceeds the cap are recorded as SKIP-LARGE instead of
collected — the compare is driver-side by design (it IS the oracle
harness, not a data path), so at big scale factors row-heavy outputs
are sampled out rather than materialized.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    # dynamic oracles (footer paths, codebook literals) must describe THIS
    # sf dir — the driver's gate leaves this unset and gets sf0.01
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    import __spark_entry__ as entrymod
    from build_pipeline_with_apache_beam_spark.oracle import compare, duck_connect
    from build_pipeline_with_apache_beam_spark.session import get_spark

    spark = get_spark("correctness-check")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duck_connect(sf_dir)

    n_pass = n_fail = n_rows_only = 0
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            max_rows = int(os.environ.get("CHECK_MAX_ROWS", "0"))
            # limit+count: the cap probe stops as soon as max_rows+1 rows
            # exist instead of executing the full pipeline a second time
            large = (max_rows
                     and sdf.limit(max_rows + 1).count() > max_rows)
            if large:
                if name in oracles:
                    # round-4 verdict #5: too big to row-dump, still
                    # value-checked — in-engine order-insensitive checksum
                    # (Spark agg vs streamed DuckDB agg, no driver dump)
                    from build_pipeline_with_apache_beam_spark.oracle_checksum import (  # noqa: E501
                        compare_checksum,
                    )

                    stats = {}
                    ok, msg = compare_checksum(sdf, con, oracles[name],
                                               stats=stats)
                    results[name] = {
                        "rows_match": ok or "rowcount" not in msg,
                        "schema_match": ok or "columns" not in msg,
                        "hash_match": ok,
                        "spark_rows": stats.get("spark_rows"),
                        "oracle_rows": stats.get("oracle_rows"),
                        "mode": "checksum", "err": None}
                    if ok:
                        print(f"PASS(checksum) {name}: {msg} "
                              f"({time.time()-t0:.1f}s)")
                        n_pass += 1
                    else:
                        print(f"FAIL(checksum) {name}: {msg}")
                        n_fail += 1
                else:
                    # rows-only op too big to dump: record the in-engine
                    # count (an aggregate, not a driver materialization)
                    n = sdf.count()
                    print(f"ROWS-ONLY(large) {name}: {n} rows "
                          f"({time.time()-t0:.1f}s)")
                    n_rows_only += 1
                    results[name] = {
                        "rows_match": None, "schema_match": None,
                        "hash_match": None, "spark_rows": n,
                        "oracle_rows": None, "err": "no_oracle"}
                continue
            if name not in oracles:
                n = sdf.count()
                print(f"ROWS-ONLY {name}: {n} rows  ({time.time()-t0:.1f}s)")
                n_rows_only += 1
                results[name] = {"rows_match": None, "schema_match": None,
                                 "hash_match": None, "spark_rows": n,
                                 "oracle_rows": None, "err": "no_oracle"}
                continue
            stats = {}
            ok, msg = compare(sdf, con, oracles[name], stats=stats)
            results[name] = {"rows_match": ok or "rowcount" not in msg,
                             "schema_match": ok or "columns" not in msg,
                             "hash_match": ok,
                             "spark_rows": stats.get("spark_rows"),
                             "oracle_rows": stats.get("oracle_rows"),
                             "err": None}
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"error: {e}"
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": None,
                             "oracle_rows": None, "err": str(e)[:300]}
        if ok:
            print(f"PASS {name}: {msg}  ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
        if json_out:
            # incremental checkpoint: a killed sweep (OOM, budget cutoff)
            # keeps every completed op's verdict (r13: two multi-hour sf10
            # runs died before the single end-of-run dump)
            import json as _json

            with open(json_out + ".partial", "w") as f:
                _json.dump(results, f, indent=1)

    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(results, f, indent=1)
        # the incremental checkpoint is superseded by the final dump —
        # remove it so a stale .partial never drifts beside the artifact
        try:
            os.remove(json_out + ".partial")
        except OSError:
            pass
        print(f"wrote {json_out} ({len(results)} ops)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
