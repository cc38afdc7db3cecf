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

    Tie rules: an observation exactly on a grid point is visible to it;
    among duplicate (key, timestamp) observations the MAX value wins
    (deterministic — DuckDB's ASOF picks one arbitrarily, so dedupe
    upstream when grading). A NULL observation carries like any other
    (ASOF-join semantics: the latest row at-or-before the grid point,
    whatever its value).

    Plan (single-pass, r13): the old grid∪data + running
    last(ignorenulls) window scanned ``df`` twice (once for distinct
    keys, once for data — re-running any upstream aggregation twice)
    and shuffled grid+data rows through the carry window. Instead,
    each observation COVERS the grid points from ceil_grid(t) up to
    just below the next observation — one (key)-partitioned window
    (lead + row_number), then scan-local integer sequence + explode.
    One exchange over data rows only; the grid never rides a shuffle.
    At 100 TB the shuffle volume drops by the grid size and the
    upstream plan runs once.
    """
    by = list(by)
    start, end, step = int(start_ms), int(end_ms), int(step_ms)
    if step <= 0:
        raise ValueError(f"locf_resample: step_ms must be positive, got {step_ms}")
    # value ASC so the LAST row of an equal-timestamp run — the only
    # one whose coverage is non-empty — is the max-value observation
    w = Window.partitionBy(*by).orderBy(
        F.col("__zt").asc(), F.col("__zv").asc_nulls_first()
    )
    t = F.col("__zt")
    nxt = F.col("__znxt")
    lo, hi, st = F.lit(start), F.lit(end), F.lit(step)
    # first grid point this row covers: smallest p ≥ max(t, start)
    cov_first = F.when(t <= lo, lo).otherwise(
        lo + F.ceil((t - lo) / st).cast("long") * st
    )
    # last grid point: just below the next observation (end for the
    # key's final row); empty when the next observation is ≤ start
    cov_last = (
        F.when(nxt.isNull(), hi)
        .when(nxt > lo, F.least(hi, lo + ((nxt - 1 - lo) / st).cast("long") * st))
        .otherwise(None)
    )
    # NULL prefix before the key's first observation: [start, last p < t]
    null_last = F.when(
        (F.col("__zrn") == 1) & (t > lo),
        F.least(hi, lo + ((t - 1 - lo) / st).cast("long") * st),
    ).otherwise(None)
    empty = F.array().cast("array<long>")
    stepped = (
        df.select(
            *by,
            F.col(on).alias("__zt"),
            F.col(value_col).alias("__zv"),
        )
        .withColumn("__znxt", F.lead("__zt", 1).over(w))
        .withColumn("__zrn", F.row_number().over(w))
        .withColumn(
            "__zp",
            F.concat(
                F.when(null_last.isNotNull(), F.sequence(lo, null_last, st)).otherwise(
                    empty
                ),
                F.when(
                    cov_last.isNotNull() & (cov_first <= cov_last),
                    F.sequence(cov_first, cov_last, st),
                ).otherwise(empty),
            ),
        )
    )
    exploded = stepped.select(
        *by, "__zt", "__zv", F.explode("__zp").alias(on)
    )
    return exploded.select(
        *by,
        on,
        # p < t ⇔ a NULL-prefix point (every covered point is ≥ t)
        F.when(F.col(on) >= F.col("__zt"), F.col("__zv")).alias(value_col),
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


def m4_downsample(
    df: DataFrame,
    start_ms: int,
    end_ms: int,
    n_buckets: int,
    on: str = "timestamp",
    by: Sequence[str] = ("series_id",),
    value_col: str = "value",
) -> DataFrame:
    """→ (by…, bucket, timestamp, value): M4 downsampling (Jugel et
    al., VLDB 2014 — the error-free line-chart reduction): per time
    bucket keep the ≤4 REAL points a pixel column needs — first, last,
    value-min, value-max — so a 10⁹-row series renders from ≤4·width
    rows with a pixel-identical line. The standard visualization fan-in
    for TS stores (beyond the reference, which has no downsampler).

    Selector tie rules are lexicographic struct extrema (first/last:
    (t, v) min/max; vmin/vmax: (v, t) min/max) — deterministic and
    exactly replayable as ``row_number ORDER BY`` pairs in SQL. Rows
    outside [start_ms, end_ms] are ignored; buckets are
    ``((t − start) · n_buckets) div span`` with integer math (exact at
    any magnitude). Duplicate selector hits collapse (a bucket with
    one point emits one row).

    Plan: ONE groupBy (partial-aggregated map-side) + an explode of
    the 4-struct array — no window, no second shuffle."""
    if n_buckets < 1:
        raise ValueError(f"m4_downsample: n_buckets must be ≥ 1, got {n_buckets}")
    by = list(by)
    span = int(end_ms) - int(start_ms) + 1
    t = F.col(on).cast("long")
    d = df.filter(
        (t >= F.lit(int(start_ms))) & (t <= F.lit(int(end_ms)))
    ).select(
        *by,
        F.expr(
            f"((CAST(`{on}` AS BIGINT) - {int(start_ms)}L) * {int(n_buckets)}L)"
            f" div {span}L"
        ).alias("bucket"),
        t.alias("__t"),
        F.col(value_col).cast("double").alias("__v"),
    )
    agg = d.groupBy(*by, "bucket").agg(
        F.min(F.struct(F.col("__t"), F.col("__v"))).alias("first"),
        F.max(F.struct(F.col("__t"), F.col("__v"))).alias("last"),
        F.min(F.struct(F.col("__v"), F.col("__t"))).alias("vmin"),
        F.max(F.struct(F.col("__v"), F.col("__t"))).alias("vmax"),
    )
    pts = agg.select(
        *by,
        "bucket",
        F.explode(
            F.array(
                F.struct(
                    F.col("first.__t").alias("timestamp"),
                    F.col("first.__v").alias("value"),
                ),
                F.struct(
                    F.col("last.__t").alias("timestamp"),
                    F.col("last.__v").alias("value"),
                ),
                F.struct(
                    F.col("vmin.__t").alias("timestamp"),
                    F.col("vmin.__v").alias("value"),
                ),
                F.struct(
                    F.col("vmax.__t").alias("timestamp"),
                    F.col("vmax.__v").alias("value"),
                ),
            )
        ).alias("p"),
    )
    return pts.select(
        *by, "bucket", F.col("p.timestamp").alias(on), F.col("p.value").alias(value_col)
    ).distinct()


def interpolate_resample(
    df: DataFrame,
    start_ms: int,
    end_ms: int,
    step_ms: int,
    on: str = "timestamp",
    by: Sequence[str] = ("series_id",),
    value_col: str = "value",
) -> DataFrame:
    """→ (by…, timestamp, value): like ``locf_resample`` but LINEAR —
    each grid point gets the interpolation of its surrounding
    observations, ``prev_v + (next_v − prev_v)·(t − prev_t)/(next_t −
    prev_t)``; exact observations pass through, NULL outside the
    series' observed range (no extrapolation). Values are q6-floored
    (the engine-wide float quantization).

    Same single-shuffle shape as LOCF: grid ∪ data, ONE window per key
    carrying (t, v) structs both backward and forward; an observation
    exactly on a grid point sorts before it in BOTH directions'
    frames, so prev_t == t and the formula collapses to the observed
    value."""
    from zestdb_spark.functions.dedup import q6

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
        F.lit(None).cast("double").alias("__v"),
    )
    data = df.select(
        *by,
        F.col(on).cast("long").alias("__t"),
        F.lit(1).alias("__is_grid"),
        F.col(value_col).cast("double").alias("__v"),
    )
    u = grid.unionByName(data)
    obs = F.when(
        F.col("__is_grid") == 1, F.struct(F.col("__t"), F.col("__v"))
    )
    # ordering carries a value tie-break so duplicate observation
    # timestamps resolve deterministically (both directions pick the
    # max-value observation at a tied instant)
    wb = (
        Window.partitionBy(*by)
        .orderBy(
            F.col("__t").asc(), F.col("__is_grid").desc(), F.col("__v").asc()
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*by)
        .orderBy(
            F.col("__t").desc(), F.col("__is_grid").desc(), F.col("__v").asc()
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        u.withColumn("__prev", F.last(obs, ignorenulls=True).over(wb))
        .withColumn("__next", F.last(obs, ignorenulls=True).over(wf))
        .filter(F.col("__is_grid") == 0)
    )
    pt, pv = F.col("__prev.__t"), F.col("__prev.__v")
    nt, nv = F.col("__next.__t"), F.col("__next.__v")
    interp = F.when(pt == nt, pv).otherwise(
        pv + (nv - pv) * ((F.col("__t") - pt) / (nt - pt))
    )
    return carried.select(
        *by,
        F.col("__t").alias(on),
        q6(interp).alias(value_col),
    )


def counter_rate(
    df: DataFrame,
    on: str = "timestamp",
    by: Sequence[str] = ("series_id",),
    value_col: str = "value",
) -> DataFrame:
    """→ (by…, timestamp, rate_per_s): per-second increase rate of a
    MONOTONE counter with reset handling (the Prometheus ``rate()``
    contract, minus range averaging): per consecutive observation
    pair, ``Δv / Δt_seconds``, where a decrease means the counter
    restarted and contributes the post-reset value (Δv = v, not
    v − prev). The first observation of a key emits nothing;
    duplicate-timestamp pairs (Δt = 0) are dropped rather than
    dividing by zero. Rates are q6-floored.

    Deterministic: the lag window orders (t ASC, value ASC), so
    duplicate timestamps pair in a fixed order. ONE exchange on the
    key, one lag — the same shape as ``gaps``."""
    from zestdb_spark.functions.dedup import q6

    by = list(by)
    w = Window.partitionBy(*by).orderBy(
        F.col("__t").asc(), F.col("__v").asc()
    )
    d = (
        df.select(
            *by,
            F.col(on).cast("long").alias("__t"),
            F.col(value_col).cast("double").alias("__v"),
        )
        .withColumn("__pt", F.lag("__t").over(w))
        .withColumn("__pv", F.lag("__v").over(w))
        .filter(F.col("__pt").isNotNull() & (F.col("__t") > F.col("__pt")))
    )
    delta = F.when(F.col("__v") >= F.col("__pv"), F.col("__v") - F.col("__pv")).otherwise(
        F.col("__v")
    )
    return d.select(
        *by,
        F.col("__t").alias(on),
        q6(delta / ((F.col("__t") - F.col("__pt")) / F.lit(1000.0))).alias(
            "rate_per_s"
        ),
    )
