"""Streaming ingest INTO the store (the write-side dual of observe.py).

The reference ingests one CoAP request at a time into a write buffer
that flushes to shards (src/server.re:1200 — max_buffer_size=10000,
shard_size=1000). The Spark-native equivalent of that firehose is
Structured Streaming: ``readStream`` on whatever transport lands the
data (file drop, Kafka, rate source) → validation → ``foreachBatch``
appending each micro-batch to the ZestStore layout as ONE bulk write
carrying ONE provenance record (write_log), exactly like each
reference buffer-flush is one Irmin commit with one Prov.info message.

At 100 TB/day this is the ingestion story: micro-batches are
distributed appends into (series_id, time_bucket) partitions,
checkpointing gives exactly-once per batch, and ``compact()`` plays
the role of the reference's shard overlap-merge behind the write head.

Validation mirrors the request path's is_valid (numeric_timeseries
.re:5-13) relationally: rows with a null/NaN value are diverted, not
fatal — a poisoned record must not kill a stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zestdb_spark.storage import ZestStore

#: columns a ts_numeric-shaped stream must provide
_REQUIRED = ("series_id", "timestamp", "value")


def validated(stream_df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a ts_numeric-shaped stream into (good, rejected) by the
    reference's ingest rules: series and timestamp present, value a
    real number. Both halves stay streaming frames."""
    for c in _REQUIRED:
        if c not in stream_df.columns:
            raise ValueError(f"stream is missing required column {c!r}")
    if "tag_name" not in stream_df.columns:
        stream_df = stream_df.withColumn("tag_name", F.lit(None).cast("string"))
    if "tag_value" not in stream_df.columns:
        stream_df = stream_df.withColumn("tag_value", F.lit(None).cast("string"))
    ok = (
        F.col("series_id").isNotNull()
        & F.col("timestamp").isNotNull()
        & F.col("value").isNotNull()
        & ~F.isnan(F.col("value"))
    )
    cols = ["series_id", "timestamp", "value", "tag_name", "tag_value"]
    return (
        stream_df.filter(ok).select(*cols),
        stream_df.filter(~F.coalesce(ok, F.lit(False))).select(*cols),
    )


def start_ingest(
    stream_df: DataFrame,
    store: ZestStore,
    checkpoint_dir: str,
    client: str = "stream",
    path: str = "/ts/stream",
    trigger_once: bool = False,
):
    """Attach a validated ts_numeric stream to ``store``: every
    micro-batch becomes one distributed bulk append under one
    provenance record (write_log path carries the batch id, so
    lineage survives at per-commit granularity like the reference's
    shard writes). Returns the StreamingQuery.

    Replay idempotence: foreachBatch is at-least-once, so a batch that
    committed before a crash can be redelivered — the sink skips any
    batch already present in the write_log (the log lands AFTER the
    data, so log-present ⇒ data-committed). Batch identity is scoped
    to the CHECKPOINT (a digest of checkpoint_dir is part of the
    logged path): batch ids only mean anything within one checkpoint's
    lineage, so a fresh checkpoint or a second stream on the same
    target path can never silently collide with old batch numbers.
    The committed set is read ONCE at attach time and maintained
    in-memory (no per-batch log scan). Residual windows: a crash
    MID-append re-appends stamped rows whose write_id has no log row
    (detectable duplicates); closing that fully needs a transactional
    table format."""
    import hashlib

    good, _bad = validated(stream_df)
    ck_digest = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:10]
    prefix = f"{path}/ck/{ck_digest}/batch/"
    committed: set[str] = set()
    if store._exists("write_log"):
        committed = {
            r.path
            for r in store.load("write_log")
            .filter(F.col("path").startswith(prefix))
            .select("path")
            .collect()
        }

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        batch_path = f"{prefix}{batch_id}"
        if batch_path in committed:
            return  # redelivered batch — already committed
        store.set_request_context("POST", batch_path, client, None)
        store.write_numeric_bulk(batch_df)
        committed.add(batch_path)

    writer = good.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
