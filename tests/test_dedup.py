"""Dedup operators: exact, n-gram Jaccard, MinHash-LSH, SimHash, embedding."""

from __future__ import annotations

import pytest

from zestdb_spark.functions import dedup

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy cat"),  # near dup
    (4, "completely different text about spark engines here"),
    (5, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_exact_duplicates(docs):
    out = dedup.exact_duplicates(docs).collect()
    assert len(out) == 1
    assert out[0]["canonical_id"] == 1 and out[0]["n_copies"] == 3


def test_shingles(spark):
    d = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    got = {r["shingle"] for r in dedup.shingles(d, 3).collect()}
    assert got == {"a b c", "b c d"}


def test_jaccard_pairs_exact(docs):
    out = {(r["id_a"], r["id_b"]): r["jaccard"] for r in dedup.jaccard_pairs(docs, 3, 0.5).collect()}
    # identical docs → jaccard 1.0
    assert out[(1, 2)] == 1.0 and out[(1, 5)] == 1.0 and out[(2, 5)] == 1.0
    # (1,3): last word differs → 6 of 8 distinct shingles shared = 0.75
    assert out[(1, 3)] == 0.75
    # threshold prunes: 0.8 drops the 0.75 pair
    high = {(r["id_a"], r["id_b"]) for r in dedup.jaccard_pairs(docs, 3, 0.8).collect()}
    assert (1, 3) not in high and (1, 2) in high


def test_minhash_matches_exact_jaccard(docs):
    exact = {(r["id_a"], r["id_b"]) for r in dedup.jaccard_pairs(docs, 3, 0.9).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_pairs(docs, 3, 64, 16, 0.9).collect()}
    assert lsh == exact


def test_simhash_identical_docs_zero_hamming(docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in dedup.simhash_pairs(docs, 3).collect()}
    assert pairs[(1, 2)] == 0 and pairs[(1, 5)] == 0


def test_embedding_dup_pairs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),  # ≈ vec 1
        (3, [0.0, 1.0, 0.0]),  # orthogonal
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {(r["id_a"], r["id_b"]) for r in dedup.embedding_dup_pairs(e, 0.9).collect()}
    assert out == {(1, 2)}


def test_dup_clusters_transitive_closure(spark):
    from zestdb_spark.functions import dedup
    from pyspark.sql import functions as F

    # chain 1-2-3-4 (diameter 3, forces multiple propagation rounds),
    # separate pair 10-11, and a triangle 20-21-22
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    rows = {r["doc_id"]: r["cluster_id"] for r in dedup.dup_clusters(pairs).collect()}
    assert rows == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_dup_clusters_empty_and_canonical_filter(spark):
    from pyspark.sql import functions as F

    from zestdb_spark.functions import dedup

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup.dup_clusters(empty).count() == 0
    pairs = spark.createDataFrame([(5, 9), (9, 7)], "id_a long, id_b long")
    clusters = dedup.dup_clusters(pairs)
    keep = clusters.filter(F.col("doc_id") == F.col("cluster_id"))
    assert [r["doc_id"] for r in keep.collect()] == [5]


# --------------------------------------------------------- cross_lsh_pairs

def test_cross_lsh_finds_cross_corpus_dups(spark):
    from zestdb_spark.functions import dedup as dd

    ref = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "completely unrelated reference text goes right here"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            # near-copy of ref 0; doc_id collides with ref 1 on purpose —
            # ids are namespaced per side
            (1, "the quick brown fox jumps over the lazy dog now"),
            (2, "totally novel content with no reference overlap at all"),
        ],
        "doc_id long, text string",
    )
    rows = dd.cross_lsh_pairs(new, ref, k=3, threshold=0.5).collect()
    assert [(r["new_id"], r["ref_id"]) for r in rows] == [(1, 0)]
    assert rows[0]["jaccard"] >= 0.5
    # exact-copy case: jaccard 1.0
    exact = dd.cross_lsh_pairs(ref, ref, k=3, threshold=0.99).collect()
    assert sorted((r["new_id"], r["ref_id"], r["jaccard"]) for r in exact) == [
        (0, 0, 1.0),
        (1, 1, 1.0),
    ]


def test_cross_lsh_band_validation(spark):
    from zestdb_spark.functions import dedup as dd

    df = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    import pytest as _pt

    with _pt.raises(ValueError, match="divisible"):
        dd.cross_lsh_pairs(df, df, num_hashes=64, bands=7)


def test_keep_canonical_survivor_and_singletons(spark):
    """One survivor per cluster (highest quality, tie → smallest id);
    docs without a near-dup survive as their own singleton cluster."""
    from zestdb_spark.functions import dedup

    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (7, 5)], "doc_id long, n_chars long"
    )
    # 1~2 and 2~3 must collapse into ONE cluster {1,2,3}; 7 is alone
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = {
        r["cluster_id"]: r
        for r in dedup.keep_canonical(
            docs, dedup.dup_clusters(pairs), "n_chars"
        ).collect()
    }
    assert set(out) == {1, 7}
    # quality tie between 2 and 3 at 99 → smallest id wins
    assert out[1]["doc_id"] == 2 and out[1]["n_members"] == 3
    assert out[7]["doc_id"] == 7 and out[7]["n_members"] == 1


def test_keep_canonical_refuses_non_integral_ids(spark):
    """A string id would cast to NULL, the join would match nothing,
    and the whole corpus would collapse into ONE NULL-cluster survivor
    — the operator must refuse instead."""
    import pytest as _pt
    from zestdb_spark.functions import dedup

    docs = spark.createDataFrame([("a", 5)], "doc_id string, n_chars long")
    clusters = spark.createDataFrame([(1, 1)], "doc_id long, cluster_id long")
    with _pt.raises(TypeError, match="integral id"):
        dedup.keep_canonical(docs, clusters)


def test_cross_lsh_self_mode_materializes_one_verify_side(spark):
    """Self-dedup through the cross API (VERDICT r10 #2 follow-up):
    when both sides ARE the same DataFrame, the banded signatures AND
    the verify-side shingle arrays each materialize once — 3 persisted
    frames total (banded, candidates, shared arr) vs 5 in true cross
    mode — while answers stay identical to the two-sided build."""
    from zestdb_spark.functions import dedup as dd

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "the quick brown fox jumps over the lazy dog now"),
            (2, "completely unrelated text right here goes this way"),
        ],
        "doc_id long, text string",
    )
    def _drain_registry():
        # the registry is global and CAPPED (eviction pops old frames
        # as new ones append), so a len delta only counts new frames
        # from a cold registry
        while dd._PERSISTED:
            try:
                dd._PERSISTED.pop().unpersist()
            except Exception:
                pass

    _drain_registry()
    self_rows = {
        (r["new_id"], r["ref_id"], r["jaccard"])
        for r in dd.cross_lsh_pairs(docs, docs, k=3, threshold=0.5).collect()
    }
    self_persisted = len(dd._PERSISTED)
    assert self_persisted == 3, f"self mode persisted {self_persisted} frames"
    # a distinct-but-equal frame takes the true cross path (5 frames)
    clone = spark.createDataFrame(
        docs.collect(), "doc_id long, text string"
    )
    _drain_registry()
    cross_rows = {
        (r["new_id"], r["ref_id"], r["jaccard"])
        for r in dd.cross_lsh_pairs(docs, clone, k=3, threshold=0.5).collect()
    }
    assert len(dd._PERSISTED) == 5
    assert self_rows == cross_rows  # the fast path changes cost, not answers
    assert (0, 0, 1.0) in self_rows  # every doc meets itself exactly
    assert any(a == 0 and b == 1 for a, b, _ in self_rows)  # the near-dup


def test_keep_canonical_children_only(spark):
    """The keep path may skip the centers union: keep_canonical's
    coalesce self-labels every doc missing from the labeling, which is
    exactly what the center rows would say — results must be identical
    with include_centers=False (the r13 one-exchange-less variant)."""
    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (7, 5)], "doc_id long, n_chars long"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    full = dedup.keep_canonical(docs, dedup.dup_clusters(pairs), "n_chars")
    slim = dedup.keep_canonical(
        docs, dedup.dup_clusters(pairs, include_centers=False), "n_chars"
    )
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, slim.collect()))
    # and the slim labeling itself carries no self-labeled rows
    slim_lab = dedup.dup_clusters(pairs, include_centers=False).collect()
    assert all(r["doc_id"] != r["cluster_id"] for r in slim_lab)
