"""Guarded n-gram builders.

Spark's ``sequence(lo, hi)`` is bidirectional: when ``hi < lo`` it yields a
DESCENDING range (``sequence(1, 0) = [1, 0]``), so the common
``transform(sequence(1, size(toks) - (n-1)), ...)`` n-gram idiom silently
emits bogus grams — or crashes on the 0 index when the lambda slices from
``i`` (SQL arrays are 1-based) — for inputs shorter than ``n`` tokens.
DuckDB's ``range``/``generate_series`` is empty for the same bounds, so the
divergence is invisible on fixtures whose docs are all long.

Every n-gram builder in the engine goes through these guards: an input
shorter than ``n`` produces an EMPTY array, matching the SQL-oracle
semantics and never indexing position 0.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EMPTY_STR_ARRAY = "CAST(array() AS ARRAY<STRING>)"


def word_ngrams_sql(toks: str = "toks", n: int = 2) -> str:
    """Guarded SQL fragment: space-joined word ``n``-grams of array column
    ``toks``; empty array when the doc has fewer than ``n`` tokens."""
    body = (f"transform(sequence(1, size({toks}) - {n - 1}),"
            f" i -> concat_ws(' ', slice({toks}, i, {n})))")
    return f"CASE WHEN size({toks}) >= {n} THEN {body} ELSE {_EMPTY_STR_ARRAY} END"


def word_ngrams(toks: Column, n: int) -> Column:
    """Column form of :func:`word_ngrams_sql` for F-composed call sites."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(F.size(toks) >= n, grams).otherwise(F.expr(_EMPTY_STR_ARRAY))


def char_ngrams_sql(text: str = "text", n: int = 3) -> str:
    """Guarded SQL fragment: character ``n``-grams of string column ``text``;
    empty array when the text is shorter than ``n`` characters."""
    body = (f"transform(sequence(1, length({text}) - {n - 1}),"
            f" i -> substring({text}, i, {n}))")
    return f"CASE WHEN length({text}) >= {n} THEN {body} ELSE {_EMPTY_STR_ARRAY} END"
