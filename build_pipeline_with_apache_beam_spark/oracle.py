"""Differential-testing support: compare a Spark DataFrame against a DuckDB
oracle query, the way the driver's correctness gate does (row count + column
names + order-insensitive values).

Comparison is EXACT, not tolerance-based — the driver hashes values, so any
float divergence means the operator's rounding convention is wrong (see
operators/__init__.py for the conventions).
"""

from __future__ import annotations

import math
import os

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):
            # Spark-written table = directory of part files (e.g. the
            # scale-up data); driver testdata = a single parquet file
            path = os.path.join(path, "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def canonicalize(rows, cols):
    """Sort columns by name, normalize cells, sort rows — order-insensitive
    canonical form for comparison."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out


def compare(sdf, con, sql: str) -> tuple[bool, str]:
    """(ok, message) — Spark DataFrame vs DuckDB SQL result."""
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    res = con.execute(sql)
    drows = res.fetchall()
    dcols = [d[0] for d in res.description]

    if sorted(scols) != sorted(dcols):
        return False, f"columns spark={sorted(scols)} duck={sorted(dcols)}"
    if len(srows) != len(drows):
        return False, f"rowcount spark={len(srows)} duck={len(drows)}"
    _, s_can = canonicalize(srows, scols)
    _, d_can = canonicalize(drows, dcols)
    if s_can != d_can:
        diffs = [(a, b) for a, b in zip(s_can, d_can) if a != b]
        return False, (f"{len(diffs)}/{len(s_can)} differing rows; "
                       f"first: spark={diffs[0][0]} duck={diffs[0][1]}")
    return True, f"{len(srows)} rows"
