"""ANN quality harness: recall@10 of the approximate paths (IVF, LSH)
against the brute-force truth (cosine_topk) on the driver-generated
embeddings fixture (/root/testdata/sf0.001/embeddings.parquet, 500 ×
64-dim, weak cluster structure — a deliberately HARD corpus: the true
top-10 is only ~11% same-label, so recall here is a lower bound on
what a genuinely clustered production corpus would see).

Everything is deterministic (fixed planes, fixed codebook seeding,
fixed query set), so these floors are regression tripwires for the
tuning claims in SCALE.md, not statistical tests. Measured values at
the time of pinning (avg over 20 fixed queries):

  ivf_topk  (fps-trained codebook, n_probe 8/16): 0.81  (min 0.60)
  lsh_topk  (nbits=6, margin-ordered 18 probes, fraction ~0.28): 0.51
  lsh_topk  (nbits=8, margin-ordered 24 probes, fraction ~0.094): 0.25

i.e. LSH buys ~1.8-2.7x over random candidate selection on
structure-free data, IVF with half the lists probed recovers ~0.8 —
and both keep EXACT cosine scores, so ranking within candidates is
never approximate. IVF remains the recommended ANN top-k scale path;
LSH's comparative advantage is bucketed PAIR generation
(lsh_bucketed_pairs), where banding multiplies its selectivity.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from zestdb_spark.functions import similarity

_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
_EMB = os.path.join(_SF_DIR, "embeddings.parquet")

pytestmark = pytest.mark.skipif(
    not os.path.exists(_EMB), reason="driver testdata not present"
)

K = 10
QUERIES = list(range(0, 200, 10))  # 20 fixed query vec_ids


@pytest.fixture(scope="module")
def embs(spark):
    df = spark.read.parquet(_EMB).select("vec_id", "embedding").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def truth(embs):
    """Exact top-K per query, computed once in numpy (500×64 fits any
    driver; the Spark-side exact path is itself covered by
    test_cosine_topk_matches_numpy)."""
    rows = embs.collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    U = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = U @ U.T
    idx = {int(v): i for i, v in enumerate(ids)}
    out = {}
    for q in QUERIES:
        qi = idx[q]
        order = np.argsort(-S[qi])
        order = order[order != qi][:K]
        out[q] = set(int(x) for x in ids[order])
    return out


def _avg_recall(topk_fn, truth) -> float:
    rs = []
    for q in QUERIES:
        got = {r["vec_id"] for r in topk_fn(q).collect()}
        rs.append(len(got & truth[q]) / K)
    return sum(rs) / len(rs)


def test_ivf_trained_recall_floor(embs, truth):
    """fps-seeded spherical k-means codebook, probing half the lists:
    measured 0.81 — pinned above 0.75."""
    cb = similarity.ivf_train(embs, 16, iters=2)
    r = _avg_recall(
        lambda q: similarity.ivf_topk(embs, q, K, 16, 8, codebook=cb), truth
    )
    assert r >= 0.75, f"ivf recall@10 regressed: {r:.3f}"


def test_lsh_recall_floor_and_beats_random(embs, truth):
    """Random-hyperplane LSH with margin-ordered multiprobe (Lv-style
    probe sequence, default budget 3·nbits buckets): measured 0.51 at
    nbits=6 (candidate fraction 18/64 ~= 0.28, ~1.8x random) — pinned
    above 0.40 — and 0.25 at nbits=8 (24/256 ~= 0.094, ~2.7x random),
    pinned above 0.18. At the OLD hamming<=1 budget (7 probes) the
    margin ordering alone lifts nbits=6 from 0.235 to 0.27."""
    r6 = _avg_recall(lambda q: similarity.lsh_topk(embs, q, K, nbits=6), truth)
    assert r6 >= 0.40, f"lsh(6) recall@10 regressed: {r6:.3f}"
    r8 = _avg_recall(lambda q: similarity.lsh_topk(embs, q, K, nbits=8), truth)
    assert r8 >= 0.18, f"lsh(8) recall@10 regressed: {r8:.3f}"
    assert r6 > 18 / 64  # strictly better than its candidate budget
    assert r8 > 24 / 256


def test_lsh_margin_ordering_beats_hamming_at_equal_budget(embs, truth):
    """The probe ORDER itself (not just the wider budget) must carry
    weight: at the legacy hamming<=1 budget of 1+nbits buckets the
    margin-ordered walk measured 0.27 vs 0.235 for the radius walk —
    pinned at >= the radius walk's old floor + its candidate-fraction
    baseline."""
    r = _avg_recall(
        lambda q: similarity.lsh_topk(embs, q, K, nbits=6, n_probes=7), truth
    )
    assert r >= 0.22, f"lsh(6, 7 probes) recall@10 regressed: {r:.3f}"


def test_ivf_cell_balance(embs):
    """The straggler guard the fps seeding exists for: no IVF cell may
    exceed 2x the mean cell size on this corpus (measured max/mean:
    1.31 trained vs 1.34 id-sampled; a degenerate codebook shows up
    as one giant cell long before it shows up as bad recall)."""
    cb = similarity.ivf_train(embs, 16, iters=2)
    sizes = [
        r["count"]
        for r in similarity.ivf_assign(embs, 16, codebook=cb)
        .groupBy("cent")
        .count()
        .collect()
    ]
    assert len(sizes) == 16  # every centroid owns a non-empty list
    assert max(sizes) <= 2.0 * (sum(sizes) / len(sizes))


def test_pq_recall_floor(embs, truth):
    """Product quantization, fps-trained codebook (m=8 subspaces x 16
    codes over dim 64 — 32x compression vs float32): pure-ADC top-k
    measured 0.335 (pinned above 0.28 — ADC alone is the candidate
    generator, same honest posture as lsh_topk), and with the
    FAISS-style exact refine over the top-100 ADC candidates (20% of
    this corpus; at 100 TB the refine set stays query-sized) measured
    0.86 — pinned above 0.78, ABOVE the IVF probe-8 floor: PQ+refine
    is a first-class top-k path, not just a compression tier."""
    cb = similarity.pq_train(embs, m=8, n_codes=16, init="fps", iters=8)
    r_adc = _avg_recall(lambda q: similarity.pq_topk(embs, q, K, codebook=cb), truth)
    assert r_adc >= 0.28, f"pq adc recall@10 regressed: {r_adc:.3f}"
    r_rr = _avg_recall(
        lambda q: similarity.pq_topk(embs, q, K, codebook=cb, rerank=100), truth
    )
    assert r_rr >= 0.78, f"pq rerank recall@10 regressed: {r_rr:.3f}"


def test_ivfpq_recall_floor(embs, truth):
    """The composed index (fps IVF, probe 8 of 16 cells, x fps PQ m=8):
    ADC-only measured 0.32 (pinned above 0.26), with the exact refine
    over the ADC top-100 measured 0.745 (pinned above 0.68) — on this
    deliberately near-random corpus the coarse pruning costs ~0.11
    recall vs flat PQ+refine (0.86) for a 2x scan cut; real clustered
    corpora pay less. Scores stay exact on the refine path."""
    icb = similarity.ivf_train(embs, 16, iters=2)
    pcb = similarity.pq_train(embs, m=8, n_codes=16, init="fps", iters=8)
    r_adc = _avg_recall(
        lambda q: similarity.ivfpq_topk(embs, q, K, 16, 8, icb, pcb), truth
    )
    assert r_adc >= 0.26, f"ivfpq adc recall@10 regressed: {r_adc:.3f}"
    r_rr = _avg_recall(
        lambda q: similarity.ivfpq_topk(embs, q, K, 16, 8, icb, pcb, rerank=100),
        truth,
    )
    assert r_rr >= 0.68, f"ivfpq rerank recall@10 regressed: {r_rr:.3f}"


def test_bq_recall_floor(embs, truth):
    """Binary quantization (one BIGINT sign signature per vector, the
    most compressed tier): hamming-only measured 0.27 (pinned above
    0.22 — the candidate generator), and with the exact refine over
    the hamming top-100 measured 0.84 (pinned above 0.76) — within
    0.02 of flat PQ+refine from an index a quarter the size of PQ's
    codes-plus-codebook and with zero float math in the scan."""
    r_h = _avg_recall(lambda q: similarity.bq_topk(embs, q, K), truth)
    assert r_h >= 0.22, f"bq hamming recall@10 regressed: {r_h:.3f}"
    r_rr = _avg_recall(lambda q: similarity.bq_topk(embs, q, K, rerank=100), truth)
    assert r_rr >= 0.76, f"bq rerank recall@10 regressed: {r_rr:.3f}"


def test_knn_join_matches_per_query_ivf(embs, truth):
    """The batch k-NN join must equal ivf_topk query for query under
    the same codebook/probe geometry — the batch plan (cell equi-join
    + per-qid window) changes the EXECUTION, never the answer. Its
    recall therefore inherits ivf_topk's pinned floor for free."""
    from pyspark.sql import functions as F

    cb = similarity.ivf_train(embs, 16, iters=2)
    qs = embs.filter(F.col("vec_id").isin(QUERIES))
    batch = {}
    rows = similarity.knn_join(
        embs, qs, k=K, n_centroids=16, n_probe=8, codebook=cb
    ).collect()
    for r in rows:
        batch.setdefault(r["qid"], []).append((r["vec_id"], r["cosine"]))
    for q in QUERIES:
        solo = [
            (r["vec_id"], r["cosine"])
            for r in similarity.ivf_topk(embs, q, K, 16, 8, codebook=cb).collect()
        ]
        assert batch.get(q) == solo, f"batch/solo divergence at query {q}"


def test_knn_join_recall_floors(embs, truth):
    """Pinned floors for the BATCH path itself, independent of the
    per-query equality pin (which could in principle drift with it):
    under trained codebooks on the hard fixture, knn_join measured
    0.810 at (16 cells, probe 8 — half the lists) and 0.540 at
    (16, probe 4 — a quarter) — pinned above 0.75 / 0.45. The spread
    between the two settings is the probe-width knob doing its job."""
    from pyspark.sql import functions as F

    qs = embs.filter(F.col("vec_id").isin(QUERIES))

    def _batch_recall(nc, n_probe, cb):
        got = {}
        rows = similarity.knn_join(
            embs, qs, k=K, n_centroids=nc, n_probe=n_probe, codebook=cb
        ).collect()
        for r in rows:
            got.setdefault(r["qid"], set()).add(r["vec_id"])
        return sum(len(got.get(q, set()) & truth[q]) / K for q in QUERIES) / len(
            QUERIES
        )

    cb16 = similarity.ivf_train(embs, 16, iters=2)
    r_wide = _batch_recall(16, 8, cb16)
    assert r_wide >= 0.75, f"knn_join(16,8) recall@10 regressed: {r_wide:.3f}"
    r_narrow = _batch_recall(16, 4, cb16)
    assert r_narrow >= 0.45, f"knn_join(16,4) recall@10 regressed: {r_narrow:.3f}"
    assert r_wide > r_narrow  # wider probes must buy recall


def test_knn_join_pq_recall_floors(embs, truth):
    """Pinned floors for the COMPRESSED batch path itself (VERDICT r10
    #8) — independent of the per-query ivfpq equality pin, which could
    in principle drift together with it. Same trained codebooks as
    test_ivfpq_recall_floor (fps IVF 16 cells, fps PQ m=8); measured
    on the hard fixture: ADC-only 0.320 at probe 8 and 0.290 at
    probe 4 (pinned above 0.26 / 0.22), exact refine over the ADC
    top-100 0.745 (pinned above 0.68). The refine must dominate
    ADC-only — that ordering is the knob's contract."""
    from pyspark.sql import functions as F

    icb = similarity.ivf_train(embs, 16, iters=2)
    pcb = similarity.pq_train(embs, m=8, n_codes=16, init="fps", iters=8)
    codes = similarity.pq_encode(embs, pcb, ivf_codebook=icb).cache()
    codes.count()
    qs = embs.filter(F.col("vec_id").isin(QUERIES))

    def _batch_recall(n_probe, rerank=0):
        kw = dict(k=K, n_probe=n_probe)
        if rerank:
            kw.update(rerank=rerank, embs=embs)
        got = {}
        for r in similarity.knn_join_pq(codes, qs, pcb, icb, **kw).collect():
            got.setdefault(r["qid"], set()).add(r["vec_id"])
        return sum(len(got.get(q, set()) & truth[q]) / K for q in QUERIES) / len(
            QUERIES
        )

    r_adc8 = _batch_recall(8)
    assert r_adc8 >= 0.26, f"knn_join_pq adc(8) recall@10 regressed: {r_adc8:.3f}"
    r_adc4 = _batch_recall(4)
    assert r_adc4 >= 0.22, f"knn_join_pq adc(4) recall@10 regressed: {r_adc4:.3f}"
    r_rr = _batch_recall(8, rerank=100)
    assert r_rr >= 0.68, f"knn_join_pq rerank recall@10 regressed: {r_rr:.3f}"
    assert r_rr > r_adc8  # exact refine must dominate ADC-only
    codes.unpersist()
