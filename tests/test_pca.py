"""PCA over embedding columns (similarity.fit_pca / pca_project).

Contracts: the one-pass moment accumulation is bit-stable under
repartitioning (decimal sums); the fit recovers a planted principal
axis; projection matches a hand numpy computation through the same
fold order; explained-variance ratios come out descending.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from zestdb_spark.functions import similarity


def _embs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(rows)],
        "vec_id long, embedding array<float>",
    )


def _planted(n=400, dim=6):
    # variance 9 along a fixed axis u, variance ~0.01 elsewhere;
    # deterministic pseudo-noise from index arithmetic (no RNG)
    u = np.zeros(dim)
    u[1], u[3] = 3 / 5, 4 / 5  # unit axis
    rows = []
    for i in range(n):
        t = 3.0 * math.sin(i * 0.7)  # spread along u
        noise = [0.1 * math.cos(i * (d + 2) * 0.13) for d in range(dim)]
        rows.append((t * u + np.array(noise)).tolist())
    return rows


def test_fit_recovers_planted_axis(spark):
    df = _embs(spark, _planted())
    m = similarity.fit_pca(df, k=2, dim=6)
    b0 = np.array(m["basis"][0])
    # leading component aligns with the planted axis (sign-fixed)
    u = np.zeros(6)
    u[1], u[3] = 3 / 5, 4 / 5
    assert abs(float(np.dot(b0, u))) > 0.999
    assert m["explained"][0] > 0.95
    # ratios descend
    assert m["explained"] == sorted(m["explained"], reverse=True)


def test_moments_are_partitioning_invariant(spark):
    df = _embs(spark, _planted(300))
    a = similarity.embedding_moments(df.coalesce(1), 6)
    b = similarity.embedding_moments(df.repartition(17), 6)
    assert a[0] == b[0]
    assert np.array_equal(a[1], b[1]) and np.array_equal(a[2], b[2])


def test_projection_matches_hand_computation(spark):
    rows = [[1.0, 2.0, 3.0], [0.0, -1.0, 0.5]]
    df = _embs(spark, rows)
    model = {
        "mean": [0.5, 0.5, 1.75],
        "basis": [[1.0, 0.0, 0.0], [0.0, 0.6, 0.8]],
    }
    got = {
        r.vec_id: (r.p0, r.p1)
        for r in similarity.pca_project(df, model).collect()
    }
    for i, v in enumerate(rows):
        for j, b in enumerate(model["basis"]):
            # the operator's exact arithmetic: left-fold dot minus the
            # driver-folded centering constant, then q6 floor
            d = 0.0
            for x, y in zip(v, b):
                d = d + x * y
            c = sum(m * y for m, y in zip(model["mean"], b))
            want = math.floor((d - c) * 1e6) / 1e6
            assert got[i][j] == want


def test_fit_project_roundtrip_reduces_residual(spark):
    df = _embs(spark, _planted())
    m = similarity.fit_pca(df, k=1, dim=6)
    proj = similarity.pca_project(df, m)
    # the 1-D projection carries almost all the variance: its sample
    # variance is close to the planted 9·Var(sin) spread
    import pyspark.sql.functions as F

    stats = proj.agg(
        F.avg("p0").alias("mu"), F.avg(F.col("p0") * F.col("p0")).alias("m2")
    ).first()
    var = stats.m2 - stats.mu * stats.mu
    assert var > 3.0


def test_fit_guards(spark):
    df = _embs(spark, _planted(10))
    with pytest.raises(ValueError, match="k <= dim"):
        similarity.fit_pca(df, k=9, dim=6)
    with pytest.raises(ValueError, match="empty"):
        similarity.fit_pca(df.filter("vec_id < 0"), k=1, dim=6)


def test_whitened_projection_has_unit_variance(spark):
    import pyspark.sql.functions as F

    df = _embs(spark, _planted(400))
    m = similarity.fit_pca(df, k=2, dim=6)
    proj = similarity.pca_project(df, m, whiten=True)
    for c in ("p0", "p1"):
        s = proj.agg(
            F.avg(c).alias("mu"), F.avg(F.col(c) * F.col(c)).alias("m2")
        ).first()
        var = s.m2 - s.mu * s.mu
        assert abs(var - 1.0) < 0.02, (c, var)
