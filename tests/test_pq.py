"""Product quantization (functions/similarity.py pq_train / pq_encode /
pq_topk): codebook determinism, encode/ADC contracts, and the
bit-exactness identities the DuckDB oracle replay rests on.

Recall quality lives in tests/test_ann_recall.py (pinned floors); the
driver-graded oracle rows are sim_pq_codes / sim_topk_pq.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zestdb_spark.functions import similarity

_EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def embs(spark):
    df = spark.read.parquet(_EMB).select("vec_id", "embedding").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def cb(embs):
    return similarity.pq_train(embs, m=8, n_codes=16, init="ids")


def test_train_is_deterministic(embs):
    a = similarity.pq_train(embs, m=8, n_codes=16, init="fps", iters=4)
    b = similarity.pq_train(embs, m=8, n_codes=16, init="fps", iters=4)
    assert a == b  # no RNG anywhere: hash-sample + greedy seeding + Lloyd


def test_train_rejects_indivisible_dim(embs):
    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_train(embs, m=7)


def test_ids_codebook_rows_encode_to_themselves(embs, cb):
    """The 16 smallest vec_ids ARE the centroids under ids-init, so
    vector i (i < 16) must take code i in every subspace — any drift
    here means the assignment math no longer matches the codebook."""
    rows = (
        similarity.pq_encode(embs, cb)
        .filter(F.col("vec_id") < 16)
        .orderBy("vec_id")
        .collect()
    )
    assert len(rows) == 16
    for r in rows:
        assert list(r["codes"]) == [int(r["vec_id"])] * 8


def test_codes_shape_and_range(embs, cb):
    enc = similarity.pq_encode(embs, cb)
    bad = enc.filter(
        (F.size("codes") != 8)
        | F.exists("codes", lambda c: (c < 0) | (c >= 16))
    ).count()
    assert bad == 0
    assert enc.count() == embs.count()  # fixture has no zero vectors


def test_adc_from_codes_matches_fused_kernel(embs, cb):
    """The two search paths — fused Arrow encode+score over embeddings
    vs pure-JVM element_at chain over a persisted codes table — must
    produce identical (vec_id, score) rows: same LUT, same left-fold
    sum, same q6 floor."""
    fused = similarity.pq_topk(embs, 3, 25, codebook=cb).collect()
    codes = similarity.pq_encode(embs, cb)
    jvm = similarity.pq_topk(embs, 3, 25, codebook=cb, codes=codes).collect()
    assert [(r["vec_id"], r["score"]) for r in fused] == [
        (r["vec_id"], r["score"]) for r in jvm
    ]


def test_full_rerank_equals_exact_search(embs, cb):
    """rerank=corpus-size degrades PQ to exact search: the refine step
    re-scores every candidate with true cosines, so the result must be
    cosine_topk row for row (scores included)."""
    n = embs.count()
    exact = similarity.cosine_topk(embs, 7, 10).collect()
    refined = similarity.pq_topk(embs, 7, 10, codebook=cb, rerank=n).collect()
    assert [(r["vec_id"], r["cosine"]) for r in exact] == [
        (r["vec_id"], r["cosine"]) for r in refined
    ]


def test_unknown_query_returns_empty(embs, cb):
    assert similarity.pq_topk(embs, 10**9, 5, codebook=cb).count() == 0
    assert (
        similarity.pq_topk(embs, 10**9, 5, codebook=cb, rerank=10).count() == 0
    )


def test_zero_norm_rows_dropped(spark, cb):
    zeros = spark.createDataFrame(
        [(0, [1.0] * 64), (1, [0.0] * 64)], "vec_id long, embedding array<float>"
    )
    got = similarity.pq_encode(zeros, cb).select("vec_id").collect()
    assert [r["vec_id"] for r in got] == [0]


def test_kernel_fold_matches_driver_fold(embs, cb):
    """The vectorized kernel's accumulation order is the contract the
    oracle replay depends on: recompute one row's ADC score with the
    driver-side sequential fold and require bit equality (before the
    q6 floor both run the identical IEEE chain, so after it they are
    equal as floats, not just close)."""
    qrow = similarity.with_norm(embs).filter(F.col("vec_id") == 0).collect()[0]
    qu = [float(x) / float(qrow["norm"]) for x in qrow["v"]]
    lut = [
        [similarity._seq_dot_py(qu[s * 8 : (s + 1) * 8], c) for c in cb["cents"][s]]
        for s in range(8)
    ]
    row = (
        similarity.pq_topk(embs, 0, 1, codebook=cb)
        .collect()[0]
    )
    codes = {
        r["vec_id"]: list(r["codes"])
        for r in similarity.pq_encode(embs, cb).filter(
            F.col("vec_id") == row["vec_id"]
        ).collect()
    }[row["vec_id"]]
    acc = lut[0][codes[0]]
    for s in range(1, 8):
        acc = acc + lut[s][codes[s]]
    import math

    assert row["score"] == math.floor(acc * 1000000.0) / 1000000.0


def test_ivfpq_paths_agree_and_prune(embs, cb):
    """Fused Arrow path vs persisted-codes JVM path must match row for
    row; and the probe must actually PRUNE: every result's coarse cell
    sits in the probe set."""
    icb = similarity._ivf_centroids(embs, 16)
    fused = similarity.ivfpq_topk(
        embs, 0, 25, ivf_codebook=icb, pq_codebook=cb
    ).collect()
    coded = similarity.pq_encode(embs, cb, ivf_codebook=icb)
    jvm = similarity.ivfpq_topk(
        embs, 0, 25, ivf_codebook=icb, pq_codebook=cb, codes=coded
    ).collect()
    assert [(r["vec_id"], r["score"]) for r in fused] == [
        (r["vec_id"], r["score"]) for r in jvm
    ]
    probes = set(
        similarity._rank_probes(
            icb,
            list(similarity.with_norm(embs).filter("vec_id = 0").collect()[0]["v"]),
            float(similarity.with_norm(embs).filter("vec_id = 0").collect()[0]["norm"]),
            4,
        )
    )
    cells = {
        r["cent"]
        for r in coded.join(
            embs.sparkSession.createDataFrame(
                [(r["vec_id"],) for r in fused], "vec_id long"
            ),
            "vec_id",
        ).collect()
    }
    assert cells <= probes


def test_ivfpq_is_pq_restricted_to_probed_cells(embs, cb):
    """IVFPQ == flat PQ minus the pruned cells: every IVFPQ hit must
    appear in the flat-PQ ranking with the SAME score."""
    icb = similarity._ivf_centroids(embs, 16)
    flat = {
        r["vec_id"]: r["score"]
        for r in similarity.pq_topk(embs, 0, 500, codebook=cb).collect()
    }
    for r in similarity.ivfpq_topk(
        embs, 0, 10, ivf_codebook=icb, pq_codebook=cb
    ).collect():
        assert flat[r["vec_id"]] == r["score"]


def test_bq_bits_sign_pattern(spark):
    """Hand-checkable signature: positives at dims 0, 2, 63 set exactly
    bits 0, 2, 63 (bit 63 via the min-long two's complement mask)."""
    v = [0.0] * 64
    v[0], v[2], v[63] = 1.0, 0.5, 3.0
    df = spark.createDataFrame([(1, v)], "vec_id long, embedding array<float>")
    got = similarity.bq_encode(df).collect()[0]["bits"]
    assert got == (1 | 4 | -(1 << 63))


def test_bq_persisted_bits_match_inline(embs):
    bits = similarity.bq_encode(embs)
    a = similarity.bq_topk(embs, 5, 20).collect()
    b = similarity.bq_topk(embs, 5, 20, bits=bits).collect()
    assert [(r["vec_id"], r["hamming"]) for r in a] == [
        (r["vec_id"], r["hamming"]) for r in b
    ]


def test_bq_full_rerank_equals_exact_search(embs):
    n = embs.count()
    exact = similarity.cosine_topk(embs, 9, 10).collect()
    refined = similarity.bq_topk(embs, 9, 10, rerank=n).collect()
    assert [(r["vec_id"], r["cosine"]) for r in exact] == [
        (r["vec_id"], r["cosine"]) for r in refined
    ]


def test_bq_unknown_query_empty(embs):
    assert similarity.bq_topk(embs, 10**9, 5).count() == 0


def test_bq_zero_norm_query_returns_empty(spark):
    df = spark.createDataFrame(
        [(0, [0.0] * 64), (1, [1.0] * 64)], "vec_id long, embedding array<float>"
    )
    assert similarity.bq_topk(df, 0, 5).count() == 0
    assert similarity.bq_topk(df, 0, 5, rerank=5).count() == 0


def test_knn_join_pq_matches_per_query_ivfpq(spark, embs):
    """The batch compressed-index join must equal ivfpq_topk(codes=...)
    query for query — the batch plan changes EXECUTION (one cell
    equi-join over the codes table + per-qid windows), never the
    answer. Refine path pinned the same way."""
    from zestdb_spark.functions.similarity import (
        _ivf_centroids,
        ivfpq_topk,
        knn_join_pq,
        pq_encode,
        pq_train,
    )

    icb = _ivf_centroids(embs, 16)
    pcb = pq_train(embs, m=8, n_codes=16, init="ids")
    codes = pq_encode(embs, pcb, ivf_codebook=icb).cache()
    codes.count()
    queries = embs.filter(embs.vec_id < 8)

    batch = {}
    for r in knn_join_pq(codes, queries, pcb, icb, k=5, n_probe=4).collect():
        batch.setdefault(r["qid"], []).append((r["vec_id"], r["score"]))
    assert set(batch) == set(range(8))
    for qid in range(8):
        solo = [
            (r["vec_id"], r["score"])
            for r in ivfpq_topk(
                embs, qid, k=5, n_centroids=16, n_probe=4,
                ivf_codebook=icb, pq_codebook=pcb, codes=codes,
            ).collect()
        ]
        got = sorted(batch[qid], key=lambda t: (-t[1], t[0]))
        assert got == solo, qid

    # refine: exact cosines over the ADC top-20, equal to the solo path
    rb = {}
    for r in knn_join_pq(
        codes, queries, pcb, icb, k=5, n_probe=4, rerank=20, embs=embs
    ).collect():
        rb.setdefault(r["qid"], []).append((r["vec_id"], r["cosine"]))
    for qid in range(8):
        solo = [
            (r["vec_id"], r["cosine"])
            for r in ivfpq_topk(
                embs, qid, k=5, n_centroids=16, n_probe=4,
                ivf_codebook=icb, pq_codebook=pcb, codes=codes, rerank=20,
            ).collect()
        ]
        got = sorted(rb[qid], key=lambda t: (-t[1], t[0]))
        assert got == solo, qid
    codes.unpersist()


def test_knn_join_pq_rejects_rerank_below_k():
    """ADVICE r10: 0 < rerank < k silently capped the ADC candidate
    pool below k, returning fewer than k neighbors per query — now a
    loud ValueError before any Spark work."""
    import pytest

    from zestdb_spark.functions.similarity import knn_join_pq

    with pytest.raises(ValueError, match="rerank=3 < k=10"):
        # validation fires before either DataFrame is touched
        knn_join_pq(None, None, {"m": 4}, [], k=10, rerank=3)
