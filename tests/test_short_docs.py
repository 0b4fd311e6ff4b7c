"""Short-document edge cases for the n-gram family.

Spark's ``sequence(1, 0)`` yields the DESCENDING array ``[1, 0]`` instead of
an empty range, so unguarded n-gram builders crash (slice at index 0) or
silently emit bogus grams for documents shorter than the gram width — while
the DuckDB oracle's ``range`` is empty for the same input.  The shipped
fixtures never contain docs under 10 tokens, so these cases are covered
here with a purpose-built tiny corpus.
"""

from __future__ import annotations

import os

import pytest

import duckdb
from pyspark.sql import functions as F

from build_pipeline_with_apache_beam_spark.oracle import compare
from build_pipeline_with_apache_beam_spark.registry import oracle_sql, queries

# doc_id, text, lang, source — includes empty text, 1/2/4-token docs (all
# below the 5-gram width), and two >=5-token docs so every op still has at
# least one gram-producing row in each source.
_SHORT_DOCS = [
    (0, "", "en", "src0"),
    (1, "one", "en", "src0"),
    (2, "two tok", "en", "src1"),
    (3, "a b c d", "en", "src1"),
    (4, "the quick brown fox jumps over the lazy dog", "en", "src0"),
    (5, "the quick brown fox jumps over a sleepy cat", "en", "src1"),
    (6, "x", "de", "src2"),
]

_NGRAM_OPS = [
    "text_char_ngrams",
    "text_ngram_freq",
    "text_repetition_ratio",
    "text_ngram_novelty",
    "corpus_vocab_growth",
    "corpus_contamination_check",
    "corpus_curation_funnel",
    # sequence(1, n)-guarded span builders from the continuation batch
    "dedup_span_chunks",
    "corpus_span_corruption",
    "text_tokenizer_fertility",
]


@pytest.fixture(scope="module")
def short_sf_dir(spark, tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("short_docs")
    df = spark.createDataFrame(
        [(i, t, l, s, len(t)) for i, t, l, s in _SHORT_DOCS],
        "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.parquet(os.path.join(str(d), "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("op", _NGRAM_OPS)
def test_ngram_op_matches_oracle_on_short_docs(spark, short_sf_dir, op):
    sql = oracle_sql().get(op)
    sdf = queries()[op](spark, short_sf_dir)
    if sql is None:
        # rows-only op: executing without a runtime error IS the regression
        # check (the unguarded slice(toks, 0, 5) used to throw here)
        assert sdf.count() >= 0
        return
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(short_sf_dir, 'documents.parquet', '*.parquet')}')")
    ok, msg = compare(sdf, con, sql)
    assert ok, f"{op}: {msg}"


def test_char_ngrams_empty_for_short_text(spark, short_sf_dir):
    rows = {r.doc_id: r for r in
            queries()["text_char_ngrams"](spark, short_sf_dir).collect()}
    assert rows[0].n_char3 == 0 and rows[0].n_distinct_char3 == 0
    assert rows[6].n_char3 == 0 and rows[6].n_distinct_char3 == 0
    assert rows[4].n_char3 == len(_SHORT_DOCS[4][1]) - 2


from hypothesis import given, settings, strategies as st

_texts = st.lists(
    st.text(alphabet="ab x", min_size=0, max_size=12), min_size=1, max_size=30)


def _py_word_ngrams(text: str, n: int) -> list[str]:
    toks = text.split(" ")  # Spark split semantics: "" -> [""]
    if len(toks) < n:
        return []
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


@settings(max_examples=5, deadline=None)
@given(_texts)
def test_word_ngrams_matches_python_reference(spark, texts):
    """Property: the guarded HOF n-gram builder equals the obvious Python
    implementation on arbitrary (including degenerate) inputs."""
    from build_pipeline_with_apache_beam_spark.functions.ngrams import (
        word_ngrams,
        word_ngrams_sql,
    )

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    toks = F.split("text", " ")
    got = {r.i: (r.g2, r.g5) for r in df.select(
        "i",
        F.expr(word_ngrams_sql("toks", 2).replace("toks", "split(text, ' ')"))
        .alias("g2"),
        word_ngrams(toks, 5).alias("g5")).collect()}
    for i, t in enumerate(texts):
        assert got[i][0] == _py_word_ngrams(t, 2), (t, got[i][0])
        assert got[i][1] == _py_word_ngrams(t, 5), (t, got[i][1])
