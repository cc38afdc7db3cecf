"""Resampling / gap-fill operators (extension beyond the reference).

``locf_resample`` — regularize each series onto a fixed time grid,
carrying the last observation forward (LOCF): the standard hypertable
``time_bucket_gapfill + locf`` pattern, built from:
  1. a scan-local grid generator (sequence + explode per series — the
     grid is derived from constant bounds, no shuffle),
  2. one union + one (series)-partitioned window with
     last(ignorenulls) — the same single-shuffle shape as the as-of
     join (operators/temporal.py), because a gap-fill IS an as-of join
     of the grid against the data.

``distinct_rollup`` — exact distinct counts per group (plus an
approximate HLL variant for 100 TB, where exact distinct is a full
shuffle of the key space).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def locf_resample(
    df: DataFrame,
    start_ms: int,
    end_ms: int,
    step_ms: int,
    on: str = "timestamp",
    by: Sequence[str] = ("series_id",),
    value_col: str = "value",
) -> DataFrame:
    """→ (by…, timestamp, value): one row per grid point in
    [start_ms, end_ms] (inclusive, stride step_ms) per key, with
    ``value`` = the last observation at-or-before the grid point; NULL
    before the first observation. Grid points are emitted for every key
    that has ANY row in ``df``.

    Tie rule: an observation exactly on a grid point is visible to it
    (data sorts before grid at equal timestamps).
    """
    by = list(by)
    keys = df.select(*by).distinct()
    grid = keys.select(
        *by,
        F.explode(
            F.sequence(
                F.lit(int(start_ms)), F.lit(int(end_ms)), F.lit(int(step_ms))
            )
        ).alias("__t"),
        F.lit(0).alias("__is_grid"),
        F.lit(None).cast(df.schema[value_col].dataType).alias("__v"),
    )
    data = df.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(1).alias("__is_grid"),
        F.col(value_col).alias("__v"),
    )
    # at equal __t, data rows (marker 1) must precede grid rows (marker
    # 0) in the carry window so exact-on-grid observations are visible
    # → sort marker DESC
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t").asc(), F.col("__is_grid").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = grid.unionByName(data).select(
        *by,
        "__t",
        "__is_grid",
        F.last("__v", ignorenulls=True).over(w).alias("__filled"),
    )
    return carried.filter(F.col("__is_grid") == 0).select(
        *by, F.col("__t").alias(on), F.col("__filled").alias(value_col)
    )


def distinct_rollup(
    df: DataFrame,
    group_cols: Sequence[str],
    distinct_col: str,
    approximate: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """→ (group…, n_distinct): exact count(DISTINCT col) per group, or
    the HyperLogLog++ approximation (``approx_count_distinct``) — at
    100 TB the sketch is one map-side-combinable pass with fixed-size
    state vs the exact version's full shuffle of (group, value) pairs."""
    agg = (
        F.approx_count_distinct(distinct_col, rsd=rsd)
        if approximate
        else F.count_distinct(F.col(distinct_col))
    )
    return df.groupBy(*list(group_cols)).agg(agg.alias("n_distinct"))


def gaps(
    df: DataFrame,
    threshold_ms: int,
    on: str = "timestamp",
    by: Sequence[str] = ("series_id",),
) -> DataFrame:
    """(*by, gap_start_ms, gap_end_ms, gap_ms): intervals where a
    series went silent — successive DISTINCT observation times more
    than ``threshold_ms`` apart. The monitoring question LOCF answers
    implicitly ("carry the value") made explicit ("show me WHERE data
    is missing"); run it before trusting any gap-filled rollup.

    Deterministic with NO tie-break convention: lead(t) over ORDER BY t
    projects only functions of the sorted timestamp MULTISET — whatever
    intra-tie order the engine picks, row i sees the (i+1)-th smallest
    t. Duplicate timestamps pair at gap 0 and are filtered, so the
    output equals gaps over the distinct observation times WITHOUT
    paying a distinct (which would key its exchange on (series, t) and
    force a second exchange for the window). ONE exchange on the series
    key; a series' final observation opens no gap (lead NULL,
    filtered)."""
    if threshold_ms < 1:
        raise ValueError(f"gaps: threshold_ms must be ≥ 1, got {threshold_ms}")
    from zestdb_spark.operators.temporal import _require_epoch_ms

    _require_epoch_ms(df, on, "gaps")
    d = df.select(*by, F.col(on).cast("long").alias("gap_start_ms"))
    w = Window.partitionBy(*by).orderBy("gap_start_ms")
    return (
        d.withColumn("gap_end_ms", F.lead("gap_start_ms").over(w))
        .withColumn("gap_ms", F.col("gap_end_ms") - F.col("gap_start_ms"))
        .filter(F.col("gap_ms") > threshold_ms)
    )
