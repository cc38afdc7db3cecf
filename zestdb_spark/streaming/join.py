"""Stream-stream interval join: the incremental face of
``operators/interval.py``'s batch interval join (and the streaming
sibling of ``temporal.asof_join``'s enrich-by-time semantics).

Spark-first: this is a NATIVE Structured Streaming stream-stream
equi-join with a time-range condition and watermarks on both sides —
no custom state code. The watermarks are what make it a 100 TB
operator: the join buffers only rows newer than
``watermark − window``, so state is bounded by (delay + window) ×
arrival rate per key, not by stream length; everything older is
evicted by the engine and late rows past the watermark are dropped
(the documented Structured Streaming contract, not a local guess).

Engine timestamps are epoch-ms BIGINTs (zest wire format); Spark's
stream-stream time-range conditions and watermarks require TIMESTAMP
columns, so both sides gain a derived event-time column via
``timestamp_millis`` — scan-local, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    points: DataFrame,
    anchors: DataFrame,
    key: str = "series_id",
    before_ms: int = 0,
    after_ms: int = 0,
    delay_ms: int = 60_000,
) -> DataFrame:
    """Join each streaming anchor row to the streaming point rows of
    the same ``key`` whose timestamp lies in
    ``[anchor.timestamp − before_ms, anchor.timestamp + after_ms]``
    (inclusive — the reference's closed range semantics, zest.re
    range reads).

    Both inputs carry (``key``, ``timestamp`` epoch-ms, ``value``).
    Output: one row per (point, anchor) match — key, point timestamp/
    value, anchor timestamp/value (``anchor_timestamp``,
    ``anchor_value``).

    ``delay_ms`` is the late-data allowance on BOTH sides: rows later
    than the stream's watermark are dropped, and join state older than
    ``watermark − window`` is evicted. Inner join only — with
    watermarks on both sides plus the time bound this is the
    combination Structured Streaming supports without unbounded
    state."""
    delay = f"{int(delay_ms)} milliseconds"
    p = (
        points.select(
            F.col(key).alias("p_key"),
            F.col("timestamp").alias("p_ts_ms"),
            F.col("value").alias("value"),
        )
        .withColumn("p_time", F.timestamp_millis(F.col("p_ts_ms")))
        .withWatermark("p_time", delay)
    )
    a = (
        anchors.select(
            F.col(key).alias("a_key"),
            F.col("timestamp").alias("anchor_timestamp"),
            F.col("value").alias("anchor_value"),
        )
        .withColumn("a_time", F.timestamp_millis(F.col("anchor_timestamp")))
        .withWatermark("a_time", delay)
    )
    cond = (
        (F.col("p_key") == F.col("a_key"))
        & (
            F.col("p_time")
            >= F.col("a_time") - F.expr(f"INTERVAL {int(before_ms)} MILLISECOND")
        )
        & (
            F.col("p_time")
            <= F.col("a_time") + F.expr(f"INTERVAL {int(after_ms)} MILLISECOND")
        )
    )
    return p.join(a, cond, "inner").select(
        F.col("p_key").alias(key),
        F.col("p_ts_ms").alias("timestamp"),
        "value",
        "anchor_timestamp",
        "anchor_value",
    )
