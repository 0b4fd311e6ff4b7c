"""A/B the docstore DSv2 read path: Arrow-batched (HEAD) vs a replica of
the r11 row-at-a-time reader, on the same collection (round-11 verdict
#1 evidence).  Measures three levels:

1. parse kernel, single core, one 100k-row file: pyarrow ndjson reader
   vs a json.loads-per-line loop (the cost that dominates at real file
   sizes — 100 MB+ at 100 TB, not the 160 KB day files of sf1);
2. end-to-end Spark scan of the as-built sf collection (many small
   files: task dispatch dominates, so the gap narrows);
3. end-to-end Spark scan of a 10-file consolidation (the scale-shaped
   layout).

Usage: python tools/docstore_ab.py [big_sf_dir] [--json OUT]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql.datasource import (  # noqa: E402
    DataSource,
    DataSourceReader,
    InputPartition,
)


class _P(InputPartition):
    def __init__(self, path):
        self.path = path


class RowReader(DataSourceReader):
    """The r11 reader shape: one tuple per document."""

    def __init__(self, options):
        self.path = options["path"]

    def partitions(self):
        from build_pipeline_with_apache_beam_spark.sources.docstore import (
            MANIFEST,
        )

        manifest = json.load(open(os.path.join(self.path, MANIFEST)))
        return [_P(os.path.join(self.path, m["file"])) for m in manifest]

    def read(self, partition):
        with open(partition.path) as fh:
            for line in fh:
                doc = json.loads(line)
                yield (doc["event_id"], doc["ts_micros"], doc["user_id"],
                       doc["event_type"], doc["value"])


class RowDocStore(DataSource):
    @classmethod
    def name(cls):
        return "docstore_rowed"

    def schema(self):
        from build_pipeline_with_apache_beam_spark.sources.docstore import (
            SCHEMA_DDL,
        )

        return SCHEMA_DDL

    def reader(self, schema):
        return RowReader(self.options)


def _consolidate(root: str, n_files: int, out_dir: str) -> str:
    from build_pipeline_with_apache_beam_spark.sources.docstore import (
        MANIFEST,
    )

    if os.path.exists(os.path.join(out_dir, MANIFEST)):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    manifest = json.load(open(os.path.join(root, MANIFEST)))
    out_manifest = []
    for i in range(n_files):
        grp = manifest[i::n_files]
        name = f"big-{i}.jsonl"
        with open(os.path.join(out_dir, name), "wb") as out:
            for m in grp:
                with open(os.path.join(root, m["file"]), "rb") as fh:
                    out.write(fh.read())
        out_manifest.append({"file": name,
                             "min_ts": min(m["min_ts"] for m in grp),
                             "max_ts": max(m["max_ts"] for m in grp)})
    with open(os.path.join(out_dir, MANIFEST), "w") as fh:
        json.dump(out_manifest, fh)
    return out_dir


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
    sf_dir = args[0] if args else os.path.join(REPO, ".scratch", "sfscale",
                                               "sf1")

    from build_pipeline_with_apache_beam_spark.session import get_spark
    from build_pipeline_with_apache_beam_spark.sources.docstore import (
        ARROW_SCHEMA,
        DocStoreDataSource,
        build_collection,
    )
    from build_pipeline_with_apache_beam_spark.sources.sinks import SCRATCH

    spark = get_spark("docstore-ab")
    root = build_collection(spark, sf_dir)
    tag = os.path.basename(sf_dir.rstrip("/"))
    big = _consolidate(root, 10, os.path.join(SCRATCH, f"docstore_big_{tag}"))
    spark.dataSource.register(DocStoreDataSource)
    spark.dataSource.register(RowDocStore)

    # ---- level 1: single-core parse kernel on one consolidated file ----
    from pyarrow import json as pa_json

    path = os.path.join(big, "big-0.jsonl")
    n_file = sum(1 for _ in open(path))
    t0 = time.time()
    with open(path) as fh:
        for line in fh:
            doc = json.loads(line)
            (doc["event_id"], doc["ts_micros"], doc["user_id"],
             doc["event_type"], doc["value"])
    w_row = time.time() - t0
    t0 = time.time()
    pa_json.read_json(path, parse_options=pa_json.ParseOptions(
        explicit_schema=ARROW_SCHEMA, unexpected_field_behavior="ignore"))
    w_arrow = time.time() - t0

    # ---- levels 2+3: end-to-end scans, best of three warm -------------
    def scan(fmt: str, coll: str) -> float:
        df = spark.read.format(fmt).option("path", coll).load()
        df.count()  # warm
        return min(_timed(df) for _ in range(3))

    def _timed(df) -> float:
        t0 = time.time()
        df.count()
        return time.time() - t0

    n_total = (spark.read.format("docstore").option("path", root)
               .load().count())
    res = {
        "what": ("Arrow-batched DSv2 reader vs r11 row-at-a-time replica "
                 "on the same collection; kernel = the per-byte cost that "
                 "scales, end-to-end small-files = task-dispatch-bound"),
        "sf_dir": sf_dir,
        "rows": n_total,
        "parse_kernel": {
            "rows": n_file,
            "row_loop_sec": round(w_row, 3),
            "arrow_sec": round(w_arrow, 3),
            "row_loop_rows_per_sec": round(n_file / w_row),
            "arrow_rows_per_sec": round(n_file / w_arrow),
            "speedup": round(w_row / w_arrow, 1),
        },
        "scan_day_files": {
            "n_files": len(json.load(open(os.path.join(
                root, "_manifest.json")))),
            "arrow_sec": round(scan("docstore", root), 2),
            "rowed_sec": round(scan("docstore_rowed", root), 2),
        },
        "scan_10_files": {
            "arrow_sec": round(scan("docstore", big), 2),
            "rowed_sec": round(scan("docstore_rowed", big), 2),
        },
    }
    for k in ("scan_day_files", "scan_10_files"):
        res[k]["speedup"] = round(res[k]["rowed_sec"] / res[k]["arrow_sec"],
                                  2)
        res[k]["arrow_rows_per_sec"] = round(n_total / res[k]["arrow_sec"])
    line = json.dumps(res)
    print(line)
    if json_out:
        with open(json_out, "w") as fh:
            fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
