"""Multimodal column plumbing: image/audio/video as opaque BINARY
payloads with typed metadata (schema.MEDIA_ASSETS).

Extension beyond the reference surface (nearest analogue: the binary
KV store, src/server.re:751-756). The Spark-side plumbing — schema,
partition-parallel batch processing via mapInPandas, Arrow batch
shapes — is real and tested; the actual media DECODE step is stubbed
(image/audio libraries are not in this container): ``decode_media``
raises NotImplementedError, and ``extract_features`` computes
deterministic byte-level features instead, so the pipeline shape is
verifiable end-to-end.

At 100 TB: payloads live in the parquet files (or as object-store
pointers in a `uri` column); mapInPandas streams Arrow batches so one
task never holds more than spark.sql.execution.arrow.maxRecordsPerBatch
payloads in memory; decode/resize/frame-sample parallelism is pure
data-parallel per asset.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURE_SCHEMA = "asset_id long, kind string, byte_len long, head_hex string"


def assets_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize a media_assets-shaped table from the documents
    fixture: payload = UTF-8 bytes of the text (a deterministic stand-in
    for real image/audio bytes), kind alternating by doc_id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 2 == 0, "image").otherwise("audio").alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.when(F.col("doc_id") % 2 == 0, "image/png").otherwise("audio/wav").alias("mime"),
    )


def decode_media(payload: bytes, mime: str):
    """Real media decode — requires PIL/librosa/av, not in this
    container. The Spark plumbing around it (extract_features) is what
    this module actually ships."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "environment; extract_features uses deterministic byte-level "
        "features instead"
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """Per-asset feature extraction over Arrow batches (mapInPandas):
    (asset_id, kind, byte_len, head_hex). byte_len/head_hex stand in
    for decoded width/height/duration until decode_media is real —
    the batch shape, schema contract, and partition parallelism are
    exactly what a real decoder plugs into."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "head_hex": payloads.map(lambda b: bytes(b[:8]).hex().upper()),
                }
            )

    return assets.mapInPandas(op, FEATURE_SCHEMA)


def frame_sample(assets: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling stub: emits one row per sampled 'frame' offset —
    the plumbing for video frame extraction (explode pattern keeps it
    data-parallel; a real decoder would yield actual frames)."""
    n_frames = F.greatest(
        (F.length("payload") / every_n_bytes).cast("int"), F.lit(1)
    )
    return (
        assets.select(
            "asset_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("__fi"),
        )
        .select(
            "asset_id",
            F.col("__fi").cast("long").alias("frame_idx"),
            (F.col("__fi").cast("long") * every_n_bytes).alias("byte_offset"),
        )
    )
