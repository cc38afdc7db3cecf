"""Temporal analytics operators beyond the reference surface.

The reference's only temporal tools are path windows (since/range,
last/first). Real time-series workloads — and multimodal training-data
pipelines that must align sensor/event streams — additionally need:

- ``asof_join``      — for each left row, the most recent right row at
  or before its timestamp (per key). Spark has no native as-of join;
  this is the classic union + last-non-null-window formulation: ONE
  shuffle on (key), no UDFs, no range explosion. (DuckDB has a native
  ASOF JOIN — that's the correctness oracle.)
- ``sessionize``     — gap-based sessions per key: lag + cumulative
  sum of gap-breaks, the standard two-window formulation; one shuffle.
- ``rollup_time_bucket`` — fixed-width time-bucket aggregates per
  series (the "hypertable rollup"): one groupBy on (series, bucket),
  map-side combinable.

All three are single-shuffle declarative plans that scale linearly in
rows; keys partition the work so 1000 executors each see only their
key ranges.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "timestamp",
    by: Sequence[str] = ("series_id",),
    right_cols: Sequence[str] = ("value",),
    suffix: str = "_right",
) -> DataFrame:
    """As-of (backward) join: every ``left`` row gains the latest
    ``right_cols`` from ``right`` whose ``on`` ≤ the left row's ``on``
    within the same ``by`` keys; NULL if no earlier right row exists.

    Implementation: tag and union both inputs, sort within each key
    partition by (on, right-first-on-ties), carry right values forward
    with last(ignorenulls) over an unbounded-preceding window, then
    keep the left rows. Equal timestamps match (≤, merge_asof
    semantics with allow_exact_matches=True).
    """
    by = list(by)
    lcols = [c for c in left.columns if c not in by and c != on]
    rcols = list(right_cols)

    l_tag = left.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rcols],
    )
    r_tag = right.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
    )
    unioned = l_tag.unionByName(r_tag)

    # right rows sort before left rows at equal __t so exact matches are
    # visible to the left row (asc __is_left: 0 right, 1 left)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *by,
        "__t",
        "__is_left",
        *lcols,
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in rcols
        ],
    )
    return carried.filter(F.col("__is_left") == 1).select(
        *by,
        F.col("__t").alias(on),
        *lcols,
        *[F.col(f"__f_{c}").alias(f"{c}{suffix}") for c in rcols],
    )


def sessionize(
    df: DataFrame,
    gap_ms: int,
    on: str = "timestamp",
    by: Sequence[str] = ("series_id",),
    chunk_ms: "int | None" = None,
) -> DataFrame:
    """Assign gap-based session ids per key: a new session starts when
    the time since the previous row (same key) exceeds ``gap_ms``.
    Adds ``session_id`` (0-based per key, ordered by time).

    Deterministic tie handling: rows are ordered by (on, all other
    columns) so equal-timestamp rows sessionize identically every run.

    ``chunk_ms`` turns on the PARALLEL formulation (bit-identical
    session ids). Sessionization is a per-key prefix scan, so the
    classic lag+cumsum plan partitions the window by the key alone —
    with a handful of hot keys (event types, a few big tenants) that
    caps parallelism at the key count no matter the cluster size, the
    low-cardinality twin of the skew problem. Chunking splits every
    key's timeline into fixed ``chunk_ms`` buckets and stitches at the
    boundaries:

    1. per (key, chunk): the usual lag + gap-flag window — but
       partitioned keys×chunks wide;
    2. a TINY per-chunk summary (first/last timestamp, #in-chunk
       breaks) gets one window pass over chunks-per-key rows to turn
       boundary gaps into per-chunk session-id offsets — prefix-sum
       stitching, O(keys·chunks) not O(rows);
    3. join the offsets back (null-safe keys, no broadcast hint — AQE
       broadcasts the genuinely small summary at runtime);
       session_id = offset + in-chunk running break count.

    Chunk assignment depends only on ``on`` (true floor bucketing, so
    pre-1970 rows chunk consistently), and the in-chunk order is the
    global order restricted to the chunk — equal-timestamp ties can
    never straddle a boundary. Rows with a NULL key column or NULL
    ``on`` (NULL chunk) survive: the offset join is null-safe, matching
    the classic formulation, which keeps NULL keys as a partition and
    orders NULL timestamps first. The flagged frame is persisted via
    the bounded registry (the summary and the final pass both read it;
    re-deriving would re-shuffle the full input twice) so repeated
    calls in a long session don't accumulate cached blocks. At 100 TB
    pick ``chunk_ms`` so a key's chunk holds ~10⁶ rows; parallelism is
    then rows-bound, not key-bound.
    """
    by = list(by)
    others = [c for c in df.columns if c not in by and c != on]
    order = [F.col(on).asc()] + [F.col(c).asc_nulls_first() for c in others]
    if chunk_ms is None:
        w = Window.partitionBy(*by).orderBy(*order)
        gap_break = (
            F.when(
                F.col(on) - F.lag(on, 1).over(w) > gap_ms, F.lit(1)
            ).otherwise(F.lit(0))
        )
        return df.withColumn(
            "session_id",
            F.sum(gap_break)
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
    if chunk_ms <= 0:
        raise ValueError(f"sessionize: chunk_ms must be positive, got {chunk_ms}")
    from zestdb_spark.functions.dedup import _persist_bounded

    chunk = (F.col(on) - F.pmod(F.col(on), F.lit(chunk_ms))).alias("__zchunk")
    wc = Window.partitionBy(*by, "__zchunk").orderBy(*order)
    flagged = _persist_bounded(
        df.withColumn("__zchunk", chunk).withColumn(
            "__zbreak",
            F.when(
                F.col(on) - F.lag(on, 1).over(wc) > gap_ms, F.lit(1)
            ).otherwise(F.lit(0)),
        )
    )
    # per-(key, chunk) summary: keys×chunks rows, tiny by construction
    summary = flagged.groupBy(*by, "__zchunk").agg(
        F.min(on).alias("__zfirst"),
        F.max(on).alias("__zlast"),
        F.sum("__zbreak").alias("__zwb"),
    )
    ws = Window.partitionBy(*by).orderBy(F.col("__zchunk").asc())
    prev_last = F.lag("__zlast", 1).over(ws)
    # boundary between chunk c-1 and c: does c's first row open a new
    # session? (the key's first chunk never does — lag is NULL)
    chunk_break = F.when(
        F.col("__zfirst") - prev_last > gap_ms, F.lit(1)
    ).otherwise(F.lit(0))
    offsets = summary.select(
        *by,
        "__zchunk",
        (
            F.sum(chunk_break).over(
                ws.rowsBetween(Window.unboundedPreceding, 0)
            )
            + F.coalesce(
                F.sum("__zwb").over(
                    ws.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
        ).alias("__zoffset"),
    )
    # Null-safe keys: a NULL key column or NULL chunk (NULL `on`) must
    # still find its offset row — a plain equi-join would silently drop
    # those rows while the classic window formulation keeps them. No
    # broadcast hint: the summary is keys×chunks-bounded only when
    # chunk_ms is sized sanely; AQE broadcasts small sides at runtime
    # without bypassing the size safety net.
    okeys = [*by, "__zchunk"]
    off = offsets.select(
        *[F.col(c).alias(f"__zok{i}") for i, c in enumerate(okeys)],
        "__zoffset",
    )
    cond = F.lit(True)
    for i, c in enumerate(okeys):
        cond = cond & F.col(c).eqNullSafe(F.col(f"__zok{i}"))
    out = flagged.join(off, cond).withColumn(
        "session_id",
        (
            F.col("__zoffset")
            + F.sum("__zbreak").over(wc.rowsBetween(Window.unboundedPreceding, 0))
        ).cast("long"),
    )
    return out.drop(
        "__zchunk", "__zbreak", "__zoffset", *[f"__zok{i}" for i in range(len(okeys))]
    )


def session_stats(
    df: DataFrame,
    gap_ms: int,
    on: str = "timestamp",
    by: Sequence[str] = ("series_id",),
    chunk_ms: "int | None" = None,
) -> DataFrame:
    """Per-session aggregates: (by…, session_id, n_rows, start_ms,
    end_ms, duration_ms, sum_value). ``chunk_ms`` selects sessionize's
    parallel chunked formulation (same results)."""
    s = sessionize(df, gap_ms, on, by, chunk_ms=chunk_ms)
    return s.groupBy(*by, "session_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(on).alias("start_ms"),
        F.max(on).alias("end_ms"),
        (F.max(on) - F.min(on)).alias("duration_ms"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
    )


def rollup_time_bucket(
    df: DataFrame,
    bucket_ms: int,
    on: str = "timestamp",
    by: Sequence[str] = ("series_id",),
) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: fixed-width bucket
    stats per series. bucket = floor(on / bucket_ms) · bucket_ms —
    true FLOOR bucketing via pmod, so pre-1970 rows land in the bucket
    BELOW them (a plain ``%`` truncates toward zero and would merge
    (−bucket, 0) with [0, bucket) under a label above the rows).
    Single map-side-combinable groupBy; at 100 TB this is THE pattern
    for downsampling (and the storage layer's time_bucket partitioning
    means bucket boundaries align with files — no cross-partition
    groups)."""
    bucket = (F.col(on) - F.pmod(F.col(on), F.lit(bucket_ms))).alias("bucket_ms")
    return df.groupBy(*by, bucket).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        (F.sum(F.col("value").cast("decimal(38,6)")).cast("double") / F.count("value")).alias(
            "mean_value"
        ),
    )


def moving_stats(
    df: DataFrame,
    n: int,
    on: str = "timestamp",
    by: Sequence[str] = ("series_id",),
    value: str = "value",
) -> DataFrame:
    """(*by, timestamp, value, mov_avg, mov_min, mov_max): per-series
    trailing-window statistics over the last ``n`` rows (current row
    inclusive) in event order — the TS-database moving-average staple.
    Row-count frames, not time frames: the reading cadence defines the
    window, matching the reference's shard-ordered reads.

    ONE exchange on the series key; the frame is bounded (n−1
    PRECEDING), so state per partition is O(n) whatever the series
    length. Order is the engine's total order (timestamp, then value —
    the T1 tie-break) so results are deterministic under duplicate
    timestamps. mov_avg is decimal-exact-summed then q6-floored; at a
    bucketized store the exchange disappears like every per-series
    window."""
    if n < 1:
        raise ValueError(f"moving_stats: n must be ≥ 1, got {n}")
    from zestdb_spark.functions.dedup import q6

    w = (
        Window.partitionBy(*by)
        # NULLS LAST explicitly: Spark's bare asc() is NULLS FIRST while
        # the SQL oracle's ORDER BY ... ASC is NULLS LAST — a NULL value
        # at a duplicate timestamp would silently shift every trailing
        # frame between the engines.
        .orderBy(F.col(on).asc_nulls_last(), F.col(value).asc_nulls_last())
        .rowsBetween(-(n - 1), 0)
    )
    s = F.sum(F.col(value).cast("decimal(38,6)")).over(w).cast("double")
    c = F.count(F.lit(1)).over(w)
    return df.select(
        *by,
        on,
        value,
        q6(s / c).alias("mov_avg"),
        F.min(value).over(w).alias("mov_min"),
        F.max(value).over(w).alias("mov_max"),
    )


def rollup_sliding(
    df: DataFrame,
    window_ms: int,
    slide_ms: int,
    on: str = "timestamp",
    by: Sequence[str] = ("series_id",),
) -> DataFrame:
    """Hopping-window rollup: overlapping windows of ``window_ms``
    advancing every ``slide_ms`` (the moving-average / rolling-rate
    shape tumbling buckets can't express). Uses Spark's native
    ``F.window`` — each row fans out to its window_ms/slide_ms
    member windows scan-locally, then ONE map-side-combinable groupBy
    on (key, window start), exactly the tumbling-rollup shuffle shape
    with a bounded fan-out factor. Epoch-aligned window starts, so
    results are replayable anywhere; decimal-exact sums (A1 contract).

    ``window_ms`` must be a multiple of ``slide_ms`` — a non-multiple
    silently changes which windows exist between engines, so it is
    rejected rather than approximated."""
    if slide_ms <= 0 or window_ms <= 0:
        raise ValueError("rollup_sliding: window_ms and slide_ms must be positive")
    if window_ms % slide_ms != 0:
        raise ValueError(
            f"rollup_sliding: window_ms ({window_ms}) must be a multiple of "
            f"slide_ms ({slide_ms})"
        )
    w = F.window(
        F.timestamp_millis(F.col(on)),
        f"{window_ms} milliseconds",
        f"{slide_ms} milliseconds",
    )
    return (
        df.groupBy(*by, w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            *by,
            F.unix_millis(F.col("w.start")).alias("bucket_ms"),
            "n",
            "sum_value",
            "min_value",
            "max_value",
        )
    )


def rollup_quantiles(
    df: DataFrame,
    bucket_ms: int,
    probs: Sequence[float] = (0.5, 0.95),
    on: str = "timestamp",
    by: Sequence[str] = ("series_id",),
) -> DataFrame:
    """Per-bucket EXACT percentiles (p50/p95/... with linear
    interpolation) — the observability rollup shape. Exact, not
    percentile_approx: reference parity keeps aggregates exact (A6
    median is exact), and bucket groups are bounded by the bucket
    width, so the per-group sort is small no matter the corpus size.
    One map-side-combinable groupBy, same single-shuffle shape as
    rollup_time_bucket. For full-table unbucketed quantiles at 100 TB
    switch to percentile_approx (documented tradeoff, SCALE.md)."""
    bucket = (F.col(on) - F.pmod(F.col(on), F.lit(bucket_ms))).alias("bucket_ms")
    # %g then '.'→'_' keeps p50/p95 stable while p=0.995 labels p99_5
    # instead of colliding with p99 (int() truncated)
    aggs = [
        F.percentile(F.col("value"), F.lit(p)).alias(
            "p" + ("%g" % (p * 100)).replace(".", "_")
        )
        for p in probs
    ]
    return df.groupBy(*by, bucket).agg(F.count(F.lit(1)).alias("n"), *aggs)


#: Spark dtypes that already ARE epoch-ms integers (the engine's
#: canonical time representation, schema.py). A TimestampType would
#: cast('long') to epoch SECONDS — every *_ms parameter silently off
#: by 1000× — so the millisecond operators refuse it loudly instead.
_EPOCH_MS_DTYPES = {"bigint", "int", "smallint", "tinyint"}


def _require_epoch_ms(df: DataFrame, on: str, op: str) -> None:
    dtype = dict(df.dtypes).get(on)
    if dtype not in _EPOCH_MS_DTYPES:
        raise TypeError(
            f"{op}: column {on!r} must be integral epoch-milliseconds "
            f"(got {dtype}); a timestamp column would cast to SECONDS and "
            f"misread every millisecond parameter by 1000× — convert with "
            f"(unix_micros(col) / 1000) first"
        )


def moving_stats_time(
    df: DataFrame,
    window_ms: int,
    on: str = "timestamp",
    by: Sequence[str] = ("series_id",),
    value: str = "value",
) -> DataFrame:
    """(*by, timestamp, value, mov_avg, mov_min, mov_max, mov_n):
    per-series trailing TIME-window statistics over [t−window_ms, t] —
    the "average over the last hour" complement to ``moving_stats``'s
    row frames (a row frame follows reading cadence; a time frame
    follows the clock, which is what alert thresholds are written
    against).

    RANGE frames are tie-INSENSITIVE: every row at the same timestamp
    gets the identical frame whatever the intra-tie order, so no
    tie-break convention is needed — the result is deterministic by
    construction in any engine. ONE exchange on the series key; frame
    state is bounded by the rows inside window_ms. mov_avg divides the
    decimal-exact sum by the ROW count of the frame (NULL values count
    as rows, like moving_stats); at a bucketized store the exchange
    disappears like every per-series window."""
    if window_ms < 1:
        raise ValueError(f"moving_stats_time: window_ms must be ≥ 1, got {window_ms}")
    _require_epoch_ms(df, on, "moving_stats_time")
    from zestdb_spark.functions.dedup import q6

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).cast("long"))
        .rangeBetween(-window_ms, 0)
    )
    s = F.sum(F.col(value).cast("decimal(38,6)")).over(w).cast("double")
    c = F.count(F.lit(1)).over(w)
    return df.select(
        *by,
        on,
        value,
        q6(s / c).alias("mov_avg"),
        F.min(value).over(w).alias("mov_min"),
        F.max(value).over(w).alias("mov_max"),
        c.alias("mov_n"),
    )


def series_delta(
    df: DataFrame,
    on: str = "timestamp",
    by: Sequence[str] = ("series_id",),
    value: str = "value",
) -> DataFrame:
    """(*by, timestamp, value, dt_ms, dv, rate_per_s): first
    difference and rate of change per series — the derivative every
    monitoring query starts from (throughput from counters, slope from
    gauges). First row of each series has NULL deltas; duplicate
    timestamps yield dt_ms = 0 and a NULL rate (never a division
    blow-up).

    Order is the engine total order (timestamp, then value, NULLS
    LAST — the T1 tie-break, matching the SQL oracle). dv and
    rate_per_s are q6-floored so both engines agree bit-for-bit. ONE
    exchange on the series key."""
    _require_epoch_ms(df, on, "series_delta")
    from zestdb_spark.functions.dedup import q6

    w = Window.partitionBy(*by).orderBy(
        F.col(on).asc_nulls_last(), F.col(value).asc_nulls_last()
    )
    pt = F.lag(F.col(on).cast("long")).over(w)
    pv = F.lag(value).over(w)
    dt = F.col(on).cast("long") - pt
    return df.select(
        *by,
        on,
        value,
        dt.alias("dt_ms"),
        q6(F.col(value) - pv).alias("dv"),
        F.when(dt > 0, q6((F.col(value) - pv) / dt * F.lit(1000.0)))
        .alias("rate_per_s"),
    )
