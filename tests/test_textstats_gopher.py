"""Unit coverage for the Gopher-rule textstats trio (repetition_stats,
top_ngram_frac, gopher_quality) — previously only reachable through the
driver oracle. Edge cases: empty text, multi-space runs (empty tokens),
docs shorter than the n-gram width, all-duplicate docs.

Every expectation is hand-computed AND cross-checked against the same
DuckDB SQL the driver oracle runs (oracle_sql entries text_repetition /
text_top_ngram / text_gopher), so the pytest and the graded row can
never drift apart.
"""

from __future__ import annotations

import duckdb
import pytest

from zestdb_spark.functions import textstats

DOCS = [
    (0, ""),  # empty text
    (1, "word"),  # single token — shorter than any 2-gram
    (2, "a  b   a"),  # multi-space runs → empty tokens to drop
    (3, "spam spam spam spam"),  # all-duplicate
    (4, "the cat sat on the mat the cat sat again"),  # mixed repeats
    (5, "x y x y x y x z"),  # dominant bigram
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _oracle(name: str) -> str:
    import __spark_entry__ as entry

    return entry.oracle_sql()[name]


def _duck_rows(name: str):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    out = con.execute(_oracle(name)).fetchall()
    con.close()
    return sorted(out)


def test_repetition_stats(docs):
    rows = {r["doc_id"]: r for r in textstats.repetition_stats(docs).collect()}
    assert rows[0]["n_tokens"] == 0 and rows[0]["dup_token_frac"] == 0.0
    assert rows[1]["n_tokens"] == 1 and rows[1]["dup_token_frac"] == 0.0
    # "a  b   a" → tokens [a, b, a]: 1 repeat of 3
    assert rows[2]["n_tokens"] == 3 and rows[2]["dup_token_frac"] == 0.333333
    assert rows[3]["dup_token_frac"] == 0.75  # 3 repeats of 4
    assert sorted(tuple(r) for r in textstats.repetition_stats(docs).collect()) == _duck_rows(
        "text_repetition"
    )


def test_top_ngram_frac(docs):
    out = {r["doc_id"]: r for r in textstats.top_ngram_frac(docs).collect()}
    # docs 0 and 1 have < 2 tokens → no bigrams → excluded entirely
    assert 0 not in out and 1 not in out
    # "a b a" → bigrams [a b, b a]: max 1 of 2
    assert out[2]["n_ngrams"] == 2 and out[2]["top_frac"] == 0.5
    # "spam spam spam spam" → 3× "spam spam"
    assert out[3]["n_ngrams"] == 3 and out[3]["top_frac"] == 1.0
    # "x y x y x y x z" → x y:3, y x:2, x z:1 of 7
    assert out[5]["n_ngrams"] == 7 and out[5]["top_frac"] == 0.428571
    assert sorted(tuple(r) for r in textstats.top_ngram_frac(docs).collect()) == _duck_rows(
        "text_top_ngram"
    )


def test_gopher_quality(docs):
    out = {r["doc_id"]: r for r in textstats.gopher_quality(docs).collect()}
    # empty doc: all-zero stats, fails the min-word floor
    assert out[0]["n_words"] == 0 and out[0]["mean_word_len"] == 0.0
    assert out[0]["passes"] is False
    # "a  b   a": mean len 1.0 < 2.0 → fails even ignoring word count
    assert out[2]["mean_word_len"] == 1.0 and out[2]["passes"] is False
    # doc 4: 10 words, repeats, stopwords 3×"the" + "on" — fails only
    # the 20-word floor
    assert out[4]["n_words"] == 10 and out[4]["stopword_hits"] == 4
    assert out[4]["passes"] is False
    assert sorted(tuple(r) for r in textstats.gopher_quality(docs).collect()) == _duck_rows(
        "text_gopher"
    )


def test_gopher_passes_a_clean_doc(spark):
    """A doc clearing every rule: ≥20 words, sane lengths, low repeats,
    stopwords present."""
    text = " ".join(
        f"the quick brown fox{i} jumps over a lazy dog{i}" for i in range(4)
    )
    docs = spark.createDataFrame([(9, text)], "doc_id long, text string")
    (row,) = textstats.gopher_quality(docs).collect()
    assert row["n_words"] == 36 and row["passes"] is True
