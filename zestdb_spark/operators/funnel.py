"""Ordered-sequence funnel analysis over the events stream: how far
each user progresses through steps s1 → s2 → … → sk, with every later
step required AFTER the previous one and within a time budget of the
first.

Extension beyond the reference surface — the canonical product-
analytics query over exactly the event_type/user_id/ts data the
reference's observation streams carry.

Shape: one first-occurrence aggregate per step, chained by k−1
equi-joins on the user key (each later step's candidate set only
shrinks). All k step aggregates scan the SAME filtered source and
shuffle on the same user key, so AQE plans them as one exchange
family; the per-step tables are user-sized (≪ events) and the chain
joins are broadcast-eligible. No window over raw events is needed at
all — work ∝ matching events, state ∝ users. Timestamps are epoch-ms
longs (min() is exact), so the whole result is integer-derived and
oracle-replayable bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel", "retention_cohorts"]


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    within_ms: int,
    user: str = "user_id",
    ts: str = "timestamp",
    type_col: str = "event_type",
) -> DataFrame:
    """(user_id, steps_completed, t_start, t_end): the farthest prefix
    of ``steps`` each user completes in strict order (every step
    strictly after the previous one) with the whole run inside
    ``within_ms`` of the user's FIRST occurrence of step 1. Users who
    never perform step 1 are absent; t_end is the completion time of
    the last completed step.

    Matching is first-occurrence greedy: t1 = min ts of step 1, then
    t_i = min ts of step i with t_i > t_{i−1} and t_i ≤ t1 +
    within_ms. Greedy-earliest is the standard funnel semantics and
    maximizes the reachable prefix for the fixed t1.
    """
    if len(steps) < 2:
        raise ValueError(f"funnel: need at least 2 steps, got {list(steps)}")
    if within_ms <= 0:
        raise ValueError(f"funnel: within_ms must be positive, got {within_ms}")
    src = events.select(
        F.col(user).alias("user_id"),
        F.col(ts).alias("ts"),
        F.col(type_col).alias("step"),
    ).filter(F.col("step").isin(list(steps)))

    cur = (
        src.filter(F.col("step") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .withColumn("t_prev", F.col("t1"))
        .withColumn("steps_completed", F.lit(1))
        .withColumn("t_end", F.col("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = src.filter(F.col("step") == step).select(
            "user_id", F.col("ts").alias("_ts")
        )
        hit = (
            cur.join(nxt, "user_id")
            .filter(
                (F.col("_ts") > F.col("t_prev"))
                & (F.col("_ts") <= F.col("t1") + F.lit(within_ms))
            )
            .groupBy("user_id")
            .agg(F.min("_ts").alias("_ti"))
        )
        cur = (
            cur.join(hit, "user_id", "left")
            .withColumn(
                "steps_completed",
                F.when(F.col("_ti").isNotNull(), F.lit(i)).otherwise(
                    F.col("steps_completed")
                ),
            )
            .withColumn(
                "t_end",
                F.when(F.col("_ti").isNotNull(), F.col("_ti")).otherwise(
                    F.col("t_end")
                ),
            )
            # a user who stalled keeps t_prev beyond any event so no
            # later step can match (strict order through ALL steps)
            .withColumn(
                "t_prev",
                F.when(F.col("_ti").isNotNull(), F.col("_ti")).otherwise(
                    F.lit((1 << 62))
                ),
            )
            .drop("_ti")
        )
    return cur.select(
        "user_id",
        "steps_completed",
        F.col("t1").alias("t_start"),
        "t_end",
    )


def retention_cohorts(
    events: DataFrame,
    bucket_ms: int = 7 * 86_400_000,
    user: str = "user_id",
    ts: str = "timestamp",
) -> DataFrame:
    """(cohort_ms, period, n_users): the retention matrix — users
    grouped by the time bucket of their FIRST event (the cohort), and
    for each later period offset, how many of them came back. period 0
    is the cohort size itself; epoch-anchored floor bucketing (the
    rollup_time_bucket convention: bucket = ts − ts mod bucket_ms,
    correct for negative epochs too).

    Shape: per-user min-ts aggregate (one shuffle on the user key),
    join the user→cohort table back onto events, then one distinct +
    rollup on (cohort, period). The cohort join carries NO broadcast
    hint: the table is per-user (billions of rows at 100 TB), so the
    broadcast-vs-shuffle decision belongs to AQE, which sees the real
    size of the aggregate's shuffle output — small event logs still
    get a runtime broadcast, planet-scale ones degrade safely to a
    shuffle join on user_id. At 100 TB the user→cohort table is the
    thing to persist; each day's increment joins against it and
    appends matrix deltas.
    """
    if bucket_ms <= 0:
        raise ValueError(
            f"retention_cohorts: bucket_ms must be positive, got {bucket_ms}"
        )
    t = F.col(ts)
    bucket = t - F.pmod(t, F.lit(bucket_ms))
    first = (
        events.groupBy(F.col(user).alias("user_id"))
        .agg(F.min(ts).alias("_t0"))
        .select(
            "user_id",
            (F.col("_t0") - F.pmod(F.col("_t0"), F.lit(bucket_ms))).alias("cohort_ms"),
        )
    )
    hits = (
        events.select(F.col(user).alias("user_id"), bucket.alias("_b"))
        .join(first, "user_id")
        .select(
            "user_id",
            "cohort_ms",
            ((F.col("_b") - F.col("cohort_ms")) / F.lit(bucket_ms))
            .cast("int")
            .alias("period"),
        )
        .distinct()
    )
    return hits.groupBy("cohort_ms", "period").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
