"""The Arrow IVF-assignment kernel vs the literal-codebook expression.

VERDICT r9 "What's wrong #2": `_nearest_centroid` / the knn_join probe
structs inline the whole codebook as literals — one HOF fold per
centroid per row — which cannot be PLANNED at the ~100k-centroid
codebooks SCALE.md recommends for crawl scale. The kernel path
(`method="kernel"`) broadcasts the codebook as numpy inside one
`mapInPandas` pass, so planning cost is independent of m.

Pins, on the driver embeddings fixture (500 × 64-dim):
- assignment equivalence: kernel == literal, row for row (vec_id, v,
  norm, cent all bit-equal — same IEEE left folds);
- search equivalence: ivf_topk / knn_join / semantic_dedup produce
  identical results under both methods;
- the large-codebook smoke: a 10_000-centroid synthetic codebook that
  the literal path cannot realistically plan both PLANS and RUNS
  through assignment, top-k, and the batch join.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from zestdb_spark.functions import similarity
from zestdb_spark.functions.similarity import (
    ivf_assign,
    ivf_topk,
    ivf_train,
    knn_join,
    semantic_dedup,
)

_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
_EMB = os.path.join(_SF_DIR, "embeddings.parquet")

pytestmark = pytest.mark.skipif(
    not os.path.exists(_EMB), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def embs(spark):
    df = spark.read.parquet(_EMB).select("vec_id", "embedding").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def codebook(embs):
    return ivf_train(embs, n_centroids=16, iters=1)


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_assign_kernel_matches_literal(embs, codebook):
    lit = ivf_assign(embs, codebook=codebook, method="literal")
    ker = ivf_assign(embs, codebook=codebook, method="kernel")
    a = _rows(lit.select("vec_id", "norm", "cent", "v"), "vec_id")
    b = _rows(ker.select("vec_id", "norm", "cent", "v"), "vec_id")
    assert len(a) == 500
    assert a == b  # bit-equal: norms, cents, and every vector element


def test_assign_kernel_matches_untrained_codebook(embs):
    # the deterministic smallest-id codebook exercises the tie-break
    # differently from the trained one (real corpus rows as centroids:
    # each centroid's own row scores cosine exactly 1.0)
    lit = ivf_assign(embs, n_centroids=16, method="literal")
    ker = ivf_assign(embs, n_centroids=16, method="kernel")
    assert _rows(lit, "vec_id") == _rows(ker, "vec_id")


def test_topk_kernel_matches_literal(embs, codebook):
    for qid in (0, 7, 123):
        a = _rows(
            ivf_topk(embs, qid, k=10, codebook=codebook, method="literal"),
            "cosine", "vec_id",
        )
        b = _rows(
            ivf_topk(embs, qid, k=10, codebook=codebook, method="kernel"),
            "cosine", "vec_id",
        )
        assert a == b and len(a) == 10


def test_knn_join_kernel_matches_literal(embs, codebook):
    queries = embs.filter(embs.vec_id < 20)
    a = _rows(
        knn_join(embs, queries, k=5, codebook=codebook, method="literal"),
        "qid", "cosine", "vec_id",
    )
    b = _rows(
        knn_join(embs, queries, k=5, codebook=codebook, method="kernel"),
        "qid", "cosine", "vec_id",
    )
    assert a == b and len(a) == 20 * 5


def test_semantic_dedup_kernel_matches_literal(embs, codebook):
    a = _rows(semantic_dedup(embs, tau=0.8, codebook=codebook, method="literal"), "vec_id")
    b = _rows(semantic_dedup(embs, tau=0.8, codebook=codebook, method="kernel"), "vec_id")
    assert a == b and len(a) == 500


def test_knn_join_excludes_zero_norm_corpus_rows(spark, codebook):
    # ADVICE r9: a zero-norm corpus vector scores 0.0/0.0 = NaN and
    # Spark ranks NaN above every real cosine — it must never appear
    dim = len(codebook[0]["v"])
    rng = np.random.default_rng(7)
    rows = [(int(i), [float(x) for x in rng.standard_normal(dim)]) for i in range(20)]
    rows.append((999, [0.0] * dim))  # the poisoned row
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.filter("vec_id < 3")
    for method in ("literal", "kernel"):
        out = knn_join(corpus, queries, k=5, codebook=codebook, method=method)
        got = {r["vec_id"] for r in out.collect()}
        assert 999 not in got
        assert not any(
            r["cosine"] != r["cosine"] for r in out.collect()
        )  # no NaN anywhere


def test_auto_dispatch_prefers_kernel(embs, codebook):
    # auto picks the kernel at every size (HOF folds are interpreted —
    # the kernel measured 3-4× faster even at m=16, and the two paths
    # are bit-identical); "literal" stays an explicit opt-in
    assert similarity._use_ivf_kernel(codebook, "auto")
    assert similarity._use_ivf_kernel(codebook, "kernel")
    assert not similarity._use_ivf_kernel(codebook, "literal")
    with pytest.raises(ValueError):
        similarity._use_ivf_kernel(codebook, "bogus")


def test_large_codebook_plans_and_runs(spark, embs):
    """The regime the literal expression cannot reach: 10k centroids.
    Codebook is synthetic (trained codebooks are bounded by the
    sample cap; the ceiling being lifted is PLANNING, not training).
    auto-dispatch must pick the kernel and the full ladder must run."""
    dim = 64
    rng = np.random.default_rng(42)
    cents = []
    for i in range(10_000):
        v = rng.standard_normal(dim)
        n = float(np.sqrt(np.sum(v * v)))
        cents.append({"vec_id": int(i), "v": [float(x) for x in v], "norm": n})

    assigned = ivf_assign(embs, codebook=cents)  # method="auto" → kernel
    assert assigned.count() == 500
    cent_vals = {r["cent"] for r in assigned.select("cent").distinct().collect()}
    assert cent_vals <= set(range(10_000))

    top = ivf_topk(embs, 0, k=10, codebook=cents, n_probe=512)
    assert 0 < top.count() <= 10

    queries = embs.filter(embs.vec_id < 5)
    kj = knn_join(embs, queries, k=3, codebook=cents, n_probe=512)
    got = kj.groupBy("qid").count().collect()
    assert len(got) == 5  # every query produced neighbors


def test_ivf_train_sampled_lloyd(embs):
    """train_cap: driver-side Lloyd over a hash sample — deterministic,
    produces a usable codebook at quality comparable to the
    distributed loop, and with a cap covering the whole fixture it is
    exactly equivalent up to the mean-accumulation order (same
    members per cell, same update rule)."""
    full = ivf_train(embs, 16, iters=2)
    samp = ivf_train(embs, 16, iters=2, train_cap=10_000)  # cap > corpus
    assert len(samp) == len(full) == 16
    assert {c["vec_id"] for c in samp} == {c["vec_id"] for c in full}
    for a, b in zip(
        sorted(samp, key=lambda c: c["vec_id"]),
        sorted(full, key=lambda c: c["vec_id"]),
    ):
        # means accumulate in different orders (numpy pairwise vs
        # Spark avg) — equal to float tolerance, not bit-equal
        assert abs(a["norm"] - b["norm"]) < 1e-9
        assert max(abs(x - y) for x, y in zip(a["v"], b["v"])) < 1e-9
    # determinism: same inputs, same codebook, twice
    again = ivf_train(embs, 16, iters=2, train_cap=10_000)
    assert again == samp
    # a bounded sample still yields full cell coverage on this corpus
    small = ivf_train(embs, 16, iters=2, train_cap=256)
    assigned = ivf_assign(embs, codebook=small)
    assert assigned.select("cent").distinct().count() >= 12


def test_persisted_assignment_reuse(embs, codebook):
    """knn_join/semantic_dedup with ``assigned=`` (a persisted
    ivf_assign output — the build-once search-many production path)
    must equal the recompute-inline path exactly."""
    from pyspark.sql import functions as F

    built = ivf_assign(embs, codebook=codebook).cache()
    built.count()
    queries = embs.filter(F.col("vec_id") < 10)
    inline = _rows(
        knn_join(embs, queries, k=5, codebook=codebook),
        "qid", "cosine", "vec_id",
    )
    reused = _rows(
        knn_join(embs, queries, k=5, codebook=codebook, assigned=built),
        "qid", "cosine", "vec_id",
    )
    assert inline == reused and len(inline) == 10 * 5
    a = _rows(semantic_dedup(embs, tau=0.8, codebook=codebook), "vec_id")
    b = _rows(
        semantic_dedup(embs, tau=0.8, codebook=codebook, assigned=built),
        "vec_id",
    )
    assert a == b
    built.unpersist()
