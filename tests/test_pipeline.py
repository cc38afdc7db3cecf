"""Composed clean-corpus pipeline."""

from __future__ import annotations

import pytest

from zestdb_spark.functions.pipeline import clean_corpus

DOCS = [
    # high quality (stopword-rich), no dup
    (1, "the cat is on the mat and the dog is in the house for now"),
    # near-dup pair: 2 survives (lower id), 3 dropped
    (2, "the quick brown fox jumps over the lazy dog on a sunny day"),
    (3, "the quick brown fox jumps over the lazy dog on a sunny morning"),
    # junk: no stopwords, short → fails the quality gate
    (4, "xyzzy plugh"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_clean_corpus_end_to_end(docs):
    out = {r["doc_id"]: r for r in clean_corpus(docs, min_score=0.1, jaccard_threshold=0.5).collect()}
    assert set(out) == {1, 2}  # 3 deduped away, 4 quality-gated away
    assert out[1]["pred_lang"] == "en"
    assert out[2]["n_tokens"] == 13
    assert 0.0 <= out[1]["score"] <= 1.0


def test_clean_corpus_no_thresholds_keeps_all(docs):
    out = clean_corpus(docs, min_score=0.0, jaccard_threshold=1.01)
    assert out.count() == 4  # nothing gated, nothing deduped
