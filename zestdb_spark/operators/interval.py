"""Point-in-interval join: each point row matched to every interval
[start, end] (inclusive) that contains it — maintenance windows ×
sensor readings, promo periods × orders, incident spans × log events.

Spark has no native range join, and the naive formulation
(`points.join(intervals, (s <= t) & (t <= e))`) is a broadcast
nested-loop / cartesian filter — O(points × intervals), a
scale-killer. This operator BUCKETS time instead (the standard range-
join-on-bucketed-keys trick): intervals explode scan-locally to the
fixed-width buckets they span, points map to exactly ONE bucket, and
an equi-join on the bucket key co-locates candidates before the exact
containment filter. Each (point, interval) pair meets in exactly one
bucket — the point's — so no dedup pass is needed.

Cost: shuffle ∝ points + Σ span/bucket per interval, join work ∝
true candidates per bucket. Pick ``bucket_ms`` near the median
interval span: too small multiplies interval replication, too large
degrades bucket selectivity toward the cartesian. At 100 TB the
bucket key also aligns with the store's time_bucket partitioning, so
the points side shuffles along existing partition boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str = "timestamp",
    start: str = "start_ms",
    end: str = "end_ms",
    bucket_ms: int = 3_600_000,
    max_span_buckets: int = 1_000_000,
) -> DataFrame:
    """Inner join of every point to every containing interval
    (``start <= on <= end``, both ends inclusive — the P3/P4
    convention). Returns points.* + intervals.*; column names must not
    collide (rename before joining — a silent de-dup would hide which
    side a column came from).

    Floor bucketing via pmod (pre-1970 correct); intervals with
    end < start produce no rows (empty sequence), matching the
    zero-match semantics of the predicate itself.

    ``max_span_buckets`` bounds the per-interval fan-out: ONE corrupt
    interval (end in the year 99999) would otherwise build a
    multi-million-element bucket array and OOM deep inside the explode
    — instead the task fails loudly with the offending span (checked
    row-by-row inside the same expression, no extra validation job).
    Raise the cap only with a bucket_ms sized to the span
    distribution; a span of a million buckets usually means the wrong
    bucket_ms, not a real interval."""
    if bucket_ms <= 0:
        raise ValueError(f"interval_join: bucket_ms must be positive, got {bucket_ms}")
    if max_span_buckets < 1:
        raise ValueError(
            f"interval_join: max_span_buckets must be ≥ 1, got {max_span_buckets}"
        )
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"interval_join: colliding column names {sorted(overlap)} — rename "
            "one side so provenance stays explicit"
        )
    if "_b" in points.columns or "_b" in intervals.columns:
        raise ValueError(
            "interval_join: '_b' is reserved for the internal bucket key — "
            "rename that column (withColumn would silently overwrite it and "
            "the final drop would delete it from the output)"
        )
    t = F.col(on)
    p = points.withColumn("_b", t - F.pmod(t, F.lit(bucket_ms)))
    s, e = F.col(start), F.col(end)
    lo = s - F.pmod(s, F.lit(bucket_ms))
    hi = e - F.pmod(e, F.lit(bucket_ms))
    # span check INSIDE the branch expression (raise_error is NullType,
    # coercible into the array branch type) — it cannot be pruned away
    # and costs nothing per row beyond the comparison
    too_wide = (hi - lo) / F.lit(bucket_ms) >= F.lit(max_span_buckets)
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.when(
                e >= s,
                F.when(
                    too_wide,
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "interval_join: interval spans ≥ "
                                f"{max_span_buckets} buckets of {bucket_ms} ms "
                                "(start="
                            ),
                            s.cast("string"),
                            F.lit(", end="),
                            e.cast("string"),
                            F.lit(
                                ") — corrupt interval, or bucket_ms far too "
                                "small; see max_span_buckets"
                            ),
                        )
                    ),
                ).otherwise(F.sequence(lo, hi, F.lit(bucket_ms))),
            ).otherwise(F.array().cast("array<long>"))
        ),
    )
    return (
        p.join(iv, "_b")
        .filter((t >= s) & (t <= e))
        .drop("_b")
    )
