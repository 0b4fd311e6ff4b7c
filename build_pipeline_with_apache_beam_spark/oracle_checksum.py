"""Order-insensitive result checksum for oracle comparison at big scale
factors — the comparator fallback for ops whose result sets are too large
to row-dump on the driver (round-4 verdict #5).

Instead of collecting rows, both engines reduce the result to
``(row_count, sum-of-row-hashes mod 2^64)``:

- Spark side: ``mapInPandas`` emits one (count, hash-sum) partial per
  Arrow batch; a final aggregation sums the partials.  Fully distributed —
  the driver only ever sees per-batch partials.
- DuckDB side: the oracle SQL is executed through a streaming Arrow
  record-batch reader, each batch hashed with the SAME numpy kernel,
  constant memory.

Because BOTH engines run the identical numpy kernel over bit-identical
values, there is no cross-engine rendering problem: Java formats/casts
doubles from the shortest decimal repr while DuckDB uses the exact binary
expansion, so any string/decimal canonicalization of doubles diverges in
the 16th+ significant digit (measured: %.17e disagrees on ~50% of random
doubles, DECIMAL(38,12) casts on ~90%).  Hashing the raw IEEE-754 bits
sidesteps the entire class.

Hash design: per column (sorted by name, same as the driver's compare) a
type-family kernel maps values to uint64 (ints as-is; doubles by bit
pattern after normalizing -0.0 -> +0.0 and NaN -> one canonical NaN;
strings/decimals/other by md5 prefix; timestamps as epoch-micros; dates as
epoch-days; nulls as a sentinel with a presence flag).  Row hash = a
splitmix64 finalizer over an accumulator of column hashes; result = sum of
row hashes mod 2^64 (order-insensitive by construction).
"""

from __future__ import annotations

import hashlib

import numpy as np

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)
_NULL_SENTINEL = np.uint64(0x9E3779B97F4A7C15)
_NAN_BITS = np.uint64(0x7FF8000000000000)
_MIX_MUL = np.uint64(0xFF51AFD7ED558CCD)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return x ^ (x >> np.uint64(31))


def _md5_u64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def spark_family(dtype: str) -> str:
    """Spark simpleString dtype -> hash-kernel family."""
    d = dtype.lower()
    if d in ("tinyint", "smallint", "int", "bigint", "byte", "short",
             "integer", "long"):
        return "int"
    if d in ("float", "double"):
        return "float"
    if d == "boolean":
        return "bool"
    if d.startswith("timestamp"):
        return "timestamp"
    if d == "date":
        return "date"
    return "str"  # string/decimal/array/struct: hash of str() rendering


def _canon_render(x) -> str:
    """Engine-neutral rendering for non-scalar values.

    Spark's mapInPandas hands array columns over as numpy ndarrays
    (``str()`` -> '[1 2]', and silently elides >1000 elements with '...')
    while DuckDB's to_pandas yields Python lists ('[1, 2]') — ``str()``
    on either is NOT a canonical form.  Recursively render via tolist()
    so both engines hash the identical byte string, with no elision.
    """
    if isinstance(x, np.ndarray):
        x = x.tolist()
    if isinstance(x, (list, tuple)):
        return "[" + ",".join(_canon_render(v) for v in x) + "]"
    if isinstance(x, dict):
        return ("{" + ",".join(f"{k}:{_canon_render(v)}"
                               for k, v in sorted(x.items())) + "}")
    if isinstance(x, (bytes, bytearray)):
        return "0x" + bytes(x).hex()
    if isinstance(x, np.generic):      # numpy scalar inside a container
        x = x.item()
    if isinstance(x, float):
        # same normalization the scalar float kernel applies (advice r6):
        # -0.0 and +0.0 must render alike, and every NaN payload collapses
        # to one token — container elements get no IEEE-bit path, so the
        # canonical form has to do it.
        if x != x:
            return "NaN"
        return repr(x + 0.0)
    return str(x)


def _scalar_null(x) -> bool:
    """Per-element null test that is safe for container values."""
    import pandas as pd

    if isinstance(x, (np.ndarray, list, tuple, dict, set)):
        return False
    try:
        return bool(pd.isna(x))
    except (TypeError, ValueError):
        return False


def _col_u64(col, family: str) -> np.ndarray:
    """Vectorized value->uint64 for one pandas Series; nulls -> sentinel."""
    import pandas as pd

    if family == "str":
        # str family covers string/decimal/array/struct/binary.  Null mask
        # and rendering are per-element: pd.isna() on a Series holding
        # ndarrays is elementwise-ambiguous, and str() is engine-dependent
        # for containers (see _canon_render).
        null_mask = np.fromiter((_scalar_null(x) for x in col),
                                dtype=bool, count=len(col))
        out = np.fromiter(
            (0 if m else _md5_u64(_canon_render(x))
             for m, x in zip(null_mask, col)),
            dtype=np.uint64, count=len(col))
        out[null_mask] = _NULL_SENTINEL
        return out

    null_mask = pd.isna(col).to_numpy()
    if family == "float":
        v = col.to_numpy(dtype="float64", na_value=0.0, copy=True)
        v = v + 0.0  # -0.0 -> +0.0
        bits = v.view(np.uint64).copy()
        bits[np.isnan(v)] = _NAN_BITS
        out = bits
    elif family == "int":
        if col.dtype.kind == "f":
            # int col null-padded to float64 by pandas: exact only below
            # 2^53 — ENFORCE it rather than round silently (advice r5).
            v = col.fillna(0.0).to_numpy(dtype="float64")
            if v.size and np.max(np.abs(v)) >= 2.0 ** 53:
                raise ValueError(
                    "int64 column exceeded 2^53 after float null-padding; "
                    "checksum would be lossy — both engine adapters ship "
                    "masked Int64 exactly to keep values off this path")
            out = v.astype(np.int64).view(np.uint64).copy()
        else:
            # masked nullable Int64 or plain int64 — both exact
            v = pd.array(col, dtype="Int64").fillna(0)
            out = (v.to_numpy(dtype="int64", na_value=0)
                   .view(np.uint64).copy())
    elif family == "bool":
        out = col.fillna(False).to_numpy().astype(np.uint64)
    elif family == "timestamp":
        v = pd.to_datetime(col).fillna(pd.Timestamp(0))
        out = (v.to_numpy(dtype="datetime64[us]").view(np.int64)
               .view(np.uint64).copy())
    else:  # date
        v = pd.to_datetime(pd.Series(col)).fillna(pd.Timestamp(0))
        out = (v.to_numpy(dtype="datetime64[D]").view(np.int64)
               .view(np.uint64).copy())
    out[null_mask] = _NULL_SENTINEL
    return out


def batch_rowhash(pdf, families: list[tuple[str, str]]) -> tuple[int, int]:
    """(row_count, sum-of-row-hashes mod 2^64) for one pandas batch.

    ``families``: [(column_name, family)] SORTED by column name — the
    shared spec both engines hash under.
    """
    n = len(pdf)
    if n == 0:
        return 0, 0
    acc = np.zeros(n, dtype=np.uint64)
    for name, fam in families:
        acc = (acc * _MIX_MUL + _col_u64(pdf[name], fam)) & _MASK
    h = _splitmix64(acc)
    # uint64 numpy sum wraps mod 2^64 exactly — the intended semantics
    return n, int(np.sum(h, dtype=np.uint64))


def spark_checksum(sdf) -> tuple[int, int]:
    """Distributed (count, hashsum) of a Spark DataFrame.

    Int columns ride to pandas exactly (advice r6): Spark's Arrow->pandas
    conversion null-pads a nullable int64 to float64, which is lossy at
    >=2^53 and would trip the kernel's fail-closed guard.  So the plan
    ships ``coalesce(col, 0)`` (no nulls -> pandas keeps int64) plus a
    boolean null-flag companion per int column, and the partials rebuild a
    masked nullable Int64 before hashing — the exact path, any magnitude.
    """
    from pyspark.sql import functions as F

    families = sorted((c, spark_family(t)) for c, t in sdf.dtypes)
    dtypes = dict(sdf.dtypes)
    int_cols = [c for c, f in families if f == "int"]
    # null-flag companion names must not collide with source columns
    # (a user column literally named __nul_0__ would corrupt the mask)
    tag = "nul"
    while any(c.startswith(f"__{tag}_") for c in sdf.columns):
        tag += "_"
    nul = {c: f"__{tag}_{i}__" for i, c in enumerate(int_cols)}
    proj = sdf
    for c in int_cols:
        proj = proj.withColumn(nul[c], F.col(c).isNull()).withColumn(
            c, F.coalesce(F.col(c), F.lit(0).cast(dtypes[c])))

    def _partials(it):
        import pandas as pd

        for pdf in it:
            for c in int_cols:
                vals = pd.array(pdf[c].to_numpy(dtype="int64"),
                                dtype="Int64")
                vals[pdf.pop(nul[c]).to_numpy(dtype=bool)] = pd.NA
                pdf[c] = vals
            n, h = batch_rowhash(pdf, families)
            # split the uint64 so partials ride in signed longs
            yield pd.DataFrame({"n": [n], "h_hi": [h >> 32],
                                "h_lo": [h & 0xFFFFFFFF]})

    parts = proj.mapInPandas(_partials, "n long, h_hi long, h_lo long")

    row = parts.agg(F.sum("n").alias("n"), F.sum("h_hi").alias("hi"),
                    F.sum("h_lo").alias("lo")).collect()[0]
    if row["n"] is None:
        return 0, 0
    total = (((row["hi"] or 0) << 32) + (row["lo"] or 0)) & ((1 << 64) - 1)
    return int(row["n"]), total


def _int64_mapper(t):
    """Arrow types_mapper: integer columns -> masked nullable Int64 so
    to_pandas never float-pads a nullable bigint (exact at any magnitude —
    advice r6; the float64 detour loses bits at >=2^53)."""
    import pandas as pd
    import pyarrow as pa

    return pd.Int64Dtype() if pa.types.is_integer(t) else None


def duck_checksum(con, sql: str,
                  families: list[tuple[str, str]]) -> tuple[int, int]:
    """Streamed (count, hashsum) of a DuckDB query — constant memory."""
    reader = con.execute(sql).fetch_record_batch(1 << 16)
    n_total, h_total = 0, 0
    for batch in reader:
        n, h = batch_rowhash(batch.to_pandas(types_mapper=_int64_mapper),
                             families)
        n_total += n
        h_total = (h_total + h) & ((1 << 64) - 1)
    return n_total, h_total


def compare_checksum(sdf, con, sql: str,
                     stats: dict | None = None) -> tuple[bool, str]:
    """compare()-shaped fallback: column names + type families (exact,
    reusing oracle.check_types) + count + order-insensitive 64-bit value
    checksum, computed in-engine on both sides."""
    from build_pipeline_with_apache_beam_spark.oracle import check_types

    scols = sorted(sdf.columns)
    res = con.execute(f"SELECT * FROM ({sql}) LIMIT 0")
    dcols = sorted(d[0] for d in res.description)
    if scols != dcols:
        return False, f"columns spark={scols} duck={dcols}"
    type_problems = check_types(sdf, con, sql)
    if type_problems:
        return False, "type-family mismatch: " + "; ".join(type_problems)
    families = sorted((c, spark_family(t)) for c, t in sdf.dtypes)
    sn, sh = spark_checksum(sdf)
    dn, dh = duck_checksum(con, sql, families)
    if stats is not None:
        stats["spark_rows"] = sn
        stats["oracle_rows"] = dn
    if sn != dn:
        return False, f"rowcount spark={sn} duck={dn}"
    if sh != dh:
        return False, f"checksum mismatch over {sn} rows: {sh:x} != {dh:x}"
    return True, f"{sn} rows checksum-equal"
