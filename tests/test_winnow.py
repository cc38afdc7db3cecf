"""Winnowing fingerprints: overlap guarantee + edge cases."""

from __future__ import annotations

from zestdb_spark.functions.textstats import winnow_fingerprints


def test_shared_substring_yields_shared_fingerprint(spark):
    # docs share a 40-char substring ≫ k + window − 1 = 11
    shared = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, "PREFIX_A " + shared + " SUFFIX_A"),
        (2, "completely different beginning " + shared),
        (3, "no overlap with anything else at all here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(docs, k=8, window=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "docs sharing a long substring must share a fingerprint"
    assert not (by_doc[1] & by_doc[3] & by_doc[2])


def test_short_docs_produce_no_fingerprints(spark):
    docs = spark.createDataFrame([(1, "tiny"), (2, "elevenchars")], "doc_id long, text string")
    out = winnow_fingerprints(docs, k=8, window=4).collect()
    # doc 1: 4 chars < k → no k-grams. doc 2: 11 chars → 4 k-grams =
    # exactly one window → one fingerprint
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert 1 not in by_doc
    assert len(by_doc.get(2, set())) == 1


def test_identical_docs_identical_fingerprints(spark):
    t = "some reasonably long document text for fingerprinting purposes"
    docs = spark.createDataFrame([(1, t), (2, t)], "doc_id long, text string")
    by_doc = {}
    for r in winnow_fingerprints(docs).collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] == by_doc[2]
