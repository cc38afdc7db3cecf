"""Canonical schemas for the engine tables.

Derived from the reference data model (SURVEY.md §1.4):
- numeric TS row = (series, epoch-ms timestamp, float value, ≤1 string
  tag)   [reference: src/numeric_timeseries.re:5-13]
- blob TS row   = (series, epoch-ms timestamp, arbitrary JSON)
  [reference: src/blob_timeseries.re:1-6]
- KV row        = (id, key) → value in json/text/binary formats
  [reference: src/keyvalue/keyvalue.re:3-127]
- catalog item  = href + item-metadata rel/val pairs
  [reference: src/hc.re:20-41]
- audit record  = timestamp server client method path code
  [reference: src/server.re:74-107]

Timestamps are epoch **milliseconds as LONG** everywhere — the reference
stamps `Unix.gettimeofday * 1000` (src/timeseries/timeseries.re:40-50).
We keep LONG ms (not TimestampType) as the canonical column to preserve
reference semantics; views can expose `to_timestamp(timestamp/1000)`.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- ts tables

TS_NUMERIC = T.StructType(
    [
        T.StructField("series_id", T.StringType(), False),
        T.StructField("timestamp", T.LongType(), False),  # epoch ms
        T.StructField("value", T.DoubleType(), False),
        T.StructField("tag_name", T.StringType(), True),  # ≤ 1 tag per row
        T.StructField("tag_value", T.StringType(), True),
    ]
)

TS_BLOB = T.StructType(
    [
        T.StructField("series_id", T.StringType(), False),
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("data", T.StringType(), False),  # arbitrary JSON text
    ]
)

# ---------------------------------------------------------------- kv tables

def _kv(value_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("key", T.StringType(), False),
            T.StructField("value", value_type, True),
        ]
    )


KV_JSON = _kv(T.StringType())
KV_TEXT = _kv(T.StringType())
KV_BINARY = _kv(T.BinaryType())

# ---------------------------------------------------------------- catalog

CATALOG_ITEMS = T.StructType(
    [
        T.StructField("href", T.StringType(), False),
        T.StructField(
            "item_metadata",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("rel", T.StringType(), False),
                        T.StructField("val", T.StringType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)

# ---------------------------------------------------------------- audit log

AUDIT = T.StructType(
    [
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("server", T.StringType(), False),
        T.StructField("client", T.StringType(), False),
        T.StructField("method", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("code", T.IntegerType(), False),
    ]
)

# ------------------------------------------------------- provenance log

# One row per write batch — the Spark equivalent of the reference's
# per-commit provenance message (src/prov.re:38-46 renders
# "event, trigger = (host, method, format, path)" and every
# shard write carries it as the Irmin commit message,
# src/timeseries/shard.re:9-11). ``write_id`` joins data rows
# (stamped at append time) to the batch that wrote them; ``n_rows``
# is NULL for bulk appends (counting would re-read the batch).
WRITE_LOG = T.StructType(
    [
        T.StructField("write_id", T.LongType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("server", T.StringType(), False),
        T.StructField("client", T.StringType(), False),
        T.StructField("method", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("content_format", T.StringType(), True),
        T.StructField("target_table", T.StringType(), False),
        T.StructField("n_rows", T.LongType(), True),
    ]
)

# ------------------------------------------------------- extension tables

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

# Multimodal assets: opaque binary payload + typed metadata
# (extension — SURVEY.md §7.1 step 9; no reference equivalent beyond the
# binary KV store, src/server.re:751-756).
MEDIA_ASSETS = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)
