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
) -> DataFrame:
    """Inner join of every point to every containing interval
    (``start <= on <= end``, both ends inclusive — the P3/P4
    convention). Returns points.* + intervals.*; column names must not
    collide (rename before joining — a silent de-dup would hide which
    side a column came from).

    Floor bucketing via pmod (pre-1970 correct); intervals with
    end < start produce no rows (empty sequence), matching the
    zero-match semantics of the predicate itself."""
    if bucket_ms <= 0:
        raise ValueError(f"interval_join: bucket_ms must be positive, got {bucket_ms}")
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
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.when(
                e >= s,
                F.sequence(
                    s - F.pmod(s, F.lit(bucket_ms)),
                    e - F.pmod(e, F.lit(bucket_ms)),
                    F.lit(bucket_ms),
                ),
            ).otherwise(F.array().cast("array<long>"))
        ),
    )
    return (
        p.join(iv, "_b")
        .filter((t >= s) & (t <= e))
        .drop("_b")
    )
