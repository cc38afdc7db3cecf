"""Blob-store analytics (extension).

The reference's blob time series is write/read/length/delete only
(docs/README.md:50) — "no analytics". A Spark-first engine can do
better without breaking parity: the stored payload is a JSON string
column, so JSON-path extraction, typed projection, and filtering are
one `get_json_object`/`from_json` away, all JVM-side.

These run on the same ts_blob table the parity API serves; they're
extra read paths, not changed semantics.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def json_extract(df: DataFrame, fields: Mapping[str, str]) -> DataFrame:
    """Project JSON-path fields out of blob payloads:
    ``fields`` maps output column name → JSONPath (e.g. "$.foo.bar").
    → (series_id, timestamp, <fields…>) with NULL for missing paths."""
    cols = [
        F.get_json_object(F.col("data"), path).alias(name)
        for name, path in fields.items()
    ]
    return df.select("series_id", "timestamp", *cols)


def json_filter(df: DataFrame, path: str, value: str) -> DataFrame:
    """Rows whose payload has ``path`` == value (string compare, rows
    with a missing path drop — mirroring the numeric tag-filter's
    dropped-row rule)."""
    return df.filter(F.get_json_object(F.col("data"), path) == value)


def json_typed(df: DataFrame, schema_ddl: str) -> DataFrame:
    """Parse payloads into a typed struct column ``parsed`` with a
    user-supplied DDL schema (PERMISSIVE mode: malformed rows → NULL
    fields, never errors) — the bridge from schemaless blobs to typed
    analytics."""
    return df.withColumn("parsed", F.from_json(F.col("data"), schema_ddl))


def json_keys_histogram(df: DataFrame, ids: Sequence[str]) -> DataFrame:
    """Schema discovery over schemaless blobs: → (key, n_rows) counting
    top-level JSON keys across the selected series — the first question
    anyone asks of an unknown blob store."""
    sel = df.filter(F.col("series_id").isin(list(ids))) if ids else df
    keys = sel.select(
        F.explode(
            F.json_object_keys(F.col("data"))
        ).alias("key")
    )
    return keys.groupBy("key").agg(F.count(F.lit(1)).alias("n_rows"))
