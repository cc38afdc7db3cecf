"""Trained quality probe (functions/probe.py).

Contracts: the one-pass normal-equation fit recovers a planted linear
model exactly (up to the ridge term); the fitted model is bit-stable
under repartitioning (decimal accumulation is order-free); scoring is
a pure scan-local expression matching a hand computation; and the
standard feature set reuses the graded textstats arithmetic.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zestdb_spark.errors import BadRequest
from zestdb_spark.functions import probe

SCHEMA = T.StructType(
    [
        T.StructField("x1", T.DoubleType()),
        T.StructField("x2", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
    ]
)


def _planted(spark, n=200):
    # y = 1 + 2*x1 - 3*x2 exactly, on a deterministic grid
    rows = []
    for i in range(n):
        x1 = (i % 17) / 16.0
        x2 = (i % 23) / 22.0
        rows.append((x1, x2, 1.0 + 2.0 * x1 - 3.0 * x2))
    return spark.createDataFrame(rows, SCHEMA)


def test_fit_recovers_planted_model(spark):
    m = probe.fit_probe(_planted(spark), "y", ["x1", "x2"], ridge=1e-9)
    assert math.isclose(m["intercept"], 1.0, abs_tol=1e-6)
    assert math.isclose(m["weights"]["x1"], 2.0, abs_tol=1e-6)
    assert math.isclose(m["weights"]["x2"], -3.0, abs_tol=1e-6)
    assert m["n_rows"] == 200


def test_fit_is_partitioning_invariant(spark):
    df = _planted(spark, 300)
    m1 = probe.fit_probe(df.coalesce(1), "y", ["x1", "x2"])
    m2 = probe.fit_probe(df.repartition(13, "x2"), "y", ["x1", "x2"])
    # DECIMAL sums are order-free, so the two fits are IDENTICAL, not
    # merely close
    assert m1 == m2


def test_score_matches_hand_computation(spark):
    df = spark.createDataFrame([(0.5, 0.25, 0.0)], SCHEMA)
    model = {"intercept": 0.1, "weights": {"x1": 0.4, "x2": -0.2}}
    got = probe.score_probe(df, model).select("probe_score").first()[0]
    want = math.floor((0.1 + 0.4 * 0.5 - 0.2 * 0.25) * 1e6) / 1e6
    assert got == want


def test_fit_then_score_pipeline(spark):
    df = _planted(spark)
    m = probe.fit_probe(df, "y", ["x1", "x2"], ridge=1e-9)
    scored = probe.score_probe(df, m)
    err = scored.select(
        F.max(F.abs(F.col("probe_score") - F.col("y"))).alias("e")
    ).first()["e"]
    assert err < 1e-5


def test_quality_features_bounded_and_q6(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat and the hat!! the the", "en", "s", 10),
            (2, "", "en", "s", 0),
            (3, "unique words only here", "en", "s", 22),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {r.doc_id: r for r in probe.quality_features(docs).collect()}
    for r in rows.values():
        for c in probe.QUALITY_FEATURES:
            v = getattr(r, c)
            assert 0.0 <= v <= 1.0
    # empty text: guards keep every feature defined
    assert rows[2].stopword_ratio == 0.0 and rows[2].dup_token_frac == 0.0
    # q6 flooring: values are multiples of 1e-6
    v = rows[1].dup_token_frac
    assert v == math.floor(v * 1e6) / 1e6
    # repetition in doc 1 ("the" ×4): 7 tokens, 4 distinct → floor(3/7)
    assert rows[1].dup_token_frac == math.floor(3 / 7 * 1e6) / 1e6


def test_fit_guards(spark):
    df = spark.createDataFrame([], SCHEMA)
    with pytest.raises(BadRequest, match="empty"):
        probe.fit_probe(df, "y", ["x1"])
    with pytest.raises(BadRequest, match="at least one feature"):
        probe.fit_probe(_planted(spark), "y", [])


def test_fit_distributed_shape(spark):
    # the fit must be ONE aggregation job over the input — no row
    # collect, no iteration: assert the plan of the agg it builds has
    # a partial-aggregate (map-side combine) by checking fit runs on a
    # frame whose FULL collect would be forbidden
    df = _planted(spark, 500)
    calls = {"n": 0}
    orig = type(df).collect

    def spy(self):
        calls["n"] += 1
        return orig(self)

    import unittest.mock as mock

    with mock.patch.object(type(df), "collect", spy):
        probe.fit_probe(df, "y", ["x1", "x2"])
    # .first() lowers to a limit-1 collect on the 1-row agg — nothing
    # else may collect
    assert calls["n"] <= 1
