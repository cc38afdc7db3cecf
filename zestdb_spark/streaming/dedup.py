"""Streaming exact deduplication — the ingest-time "drop re-crawled /
re-delivered documents" step of a training-data firehose.

Batch dedup (functions/dedup.py) answers "which docs in the corpus are
duplicates"; this answers "never let a duplicate PAST the front door".
Spark-native: ``dropDuplicatesWithinWatermark`` keys the state store on
the dedup key and ages entries out once the event-time watermark passes
them — so state is BOUNDED by the watermark horizon (an unbounded
``dropDuplicates`` on a firehose would grow state forever), which is
the property that makes this runnable indefinitely at 100 TB/day.

A duplicate arriving WITHIN the watermark window is dropped however
micro-batches split; one arriving after its key aged out is passed
through (by design — that is the watermark contract; catch late
re-crawls with the batch dedup sweep downstream).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup(
    stream_df: DataFrame,
    key_cols: Sequence[str] = ("doc_id",),
    event_time: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First occurrence per key passes; later occurrences within the
    watermark horizon are dropped. ``event_time`` must be a
    TimestampType column; state per key is retained until the
    watermark passes its event time."""
    if event_time not in stream_df.columns:
        raise ValueError(f"stream is missing event-time column {event_time!r}")
    return stream_df.withWatermark(event_time, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def stream_dedup_by_content(
    stream_df: DataFrame,
    text_col: str = "text",
    event_time: str = "ts",
    watermark: str = "1 hour",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-addressed variant: dedup on md5(text) so re-crawls under
    NEW doc_ids are also suppressed. The 16-byte digest is what enters
    the state store, not the document body — state cost is per-key
    constant no matter how large documents get.

    NULL text carries no content to address, so null-text rows key on
    the row's own id instead of collapsing into one shared NULL state
    key (md5(NULL) is NULL, and dropDuplicates groups NULL keys — every
    metadata-only row after the first would silently vanish)."""
    key = F.coalesce(
        F.md5(F.col(text_col)),
        F.concat(F.lit("__null__:"), F.col(id_col).cast("string")),
    )
    hashed = stream_df.withColumn("__content_key", key)
    return stream_dedup(
        hashed, ("__content_key",), event_time, watermark
    ).drop("__content_key")
