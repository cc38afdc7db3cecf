"""Pivot rollup: long → wide cross-tabulation (rows × an explicit
category list), the report-shaped output every BI layer asks an
analytics engine for.

Categories are an EXPLICIT list, not discovered: Spark's two-pass
value-discovering pivot runs a distinct job first and makes the
output schema data-dependent — non-reproducible across corpus
versions and not oracle-replayable. With the list given, the pivot
lowers to ONE map-side-combinable groupBy with a conditional
aggregate per category (whole-stage codegen, single exchange on the
row key), and unseen categories are honest zero/NULL columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pivot_counts", "pivot_sum"]


def _safe(name: str) -> str:
    """Category value → column name (non-alphanumeric → '_', the
    engine's deterministic label rule)."""
    return "".join(ch if ch.isalnum() else "_" for ch in name)


def _labels(categories: Sequence[str], prefix: str) -> list[str]:
    """Sanitized, collision-checked output column names. Two distinct
    categories may sanitize to the same label ('a-b' vs 'a_b'); a
    duplicate column would build fine and then resolve ambiguously on
    the first select — fail loudly instead."""
    labels = [f"{prefix}_{_safe(c)}" for c in categories]
    if len(set(labels)) != len(labels):
        dupes = sorted({l for l in labels if labels.count(l) > 1})
        raise ValueError(
            f"pivot: categories collide after sanitizing: {dupes} — "
            "rename the colliding categories"
        )
    return labels


def pivot_counts(
    df: DataFrame, row_key: Sequence[str], col_key: str, categories: Sequence[str]
) -> DataFrame:
    """(*row_key, n_<cat>...): row counts cross-tabulated over the
    explicit category list; rows whose category is outside the list
    are ignored (they'd be an invisible column otherwise)."""
    if not categories:
        raise ValueError("pivot_counts: categories must be non-empty")
    # count(when(...)) never yields NULL — a group whose col_key values
    # are all NULL still gets honest zeros (sum-of-casts would be NULL,
    # diverging from the SQL oracle's CASE ... ELSE 0).
    aggs = [
        F.count(F.when(F.col(col_key) == F.lit(c), F.lit(1))).alias(label)
        for c, label in zip(categories, _labels(categories, "n"))
    ]
    return df.groupBy(*row_key).agg(*aggs)


def pivot_sum(
    df: DataFrame,
    row_key: Sequence[str],
    col_key: str,
    categories: Sequence[str],
    value: str = "value",
) -> DataFrame:
    """(*row_key, sum_<cat>...): decimal-exact per-category sums (the
    A1 contract — reduce-order-free), NULL where a category never
    occurs for the row (sum-of-nothing, distinguishable from 0.0)."""
    if not categories:
        raise ValueError("pivot_sum: categories must be non-empty")
    aggs = [
        F.sum(
            F.when(F.col(col_key) == F.lit(c), F.col(value)).cast("decimal(38,6)")
        )
        .cast("double")
        .alias(label)
        for c, label in zip(categories, _labels(categories, "sum"))
    ]
    return df.groupBy(*row_key).agg(*aggs)
