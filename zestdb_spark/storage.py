"""Table-backed store: the engine's durable tables as partitioned parquet.

Replaces the reference's git/Irmin shard store (src/timeseries/shard.re,
index.re) with the Spark-native equivalent (SURVEY.md §4): parquet files
partitioned by ``series_id`` and a derived daily ``time_bucket``, so
- series selection is partition pruning (the reference's per-series
  directories),
- since/range reads prune whole day-buckets via the partition column
  and skip row groups via parquet min/max stats (the reference's
  interval-index walk, timeseries.re:197-231),
- compaction is file-level (OPTIMIZE-style rewrite) instead of the
  reference's overlap-merge (timeseries.re:64-111).

Would be Delta/Iceberg on a real cluster (ACID appends, MERGE,
DELETE); the jars aren't in this image, so writes emulate: append =
parquet append, upsert/delete = partition-scoped rewrite. The API is
format-agnostic — swap ``_write``/``_rewrite`` for table-format calls
without touching callers.

Ingest validation enforces the reference's numeric-TS schema
(src/numeric_timeseries.re:5-13): exactly ``{"value": <number>}`` plus
at most one string tag → BadRequest (CoAP 128) otherwise
(src/server.re:656-669).
"""

from __future__ import annotations

import json
import numbers
import os
import time
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zestdb_spark import schema as S
from zestdb_spark.errors import BadRequest

#: ms per day — time_bucket = timestamp div this (daily partitions)
_DAY_MS = 86_400_000

_TABLES = {
    "ts_numeric": S.TS_NUMERIC,
    "ts_blob": S.TS_BLOB,
    "kv_json": S.KV_JSON,
    "kv_text": S.KV_TEXT,
    "kv_binary": S.KV_BINARY,
    "catalog_items": S.CATALOG_ITEMS,
    "audit": S.AUDIT,
}


def now_ms() -> int:
    return int(time.time() * 1000)


def validate_numeric(payload: Any) -> tuple[float, Optional[str], Optional[str]]:
    """is_valid semantics (src/numeric_timeseries.re:5-13): a JSON dict
    that is exactly {"value": number} or {"value": number, tag: "str"}
    (either field order). Returns (value, tag_name, tag_value)."""
    if not isinstance(payload, dict) or "value" not in payload:
        raise BadRequest("numeric TS payload must be a dict with 'value'")
    value = payload["value"]
    if isinstance(value, bool) or not isinstance(value, numbers.Real):
        raise BadRequest("'value' must be a number")
    extras = {k: v for k, v in payload.items() if k != "value"}
    if not extras:
        return float(value), None, None
    if len(extras) > 1:
        raise BadRequest("numeric TS payload allows at most one tag")
    (tag_name, tag_value), = extras.items()
    if not isinstance(tag_value, str):
        raise BadRequest("tag value must be a string")
    return float(value), tag_name, tag_value


class ZestStore:
    """Parquet-backed engine tables under ``root``."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _exists(self, table: str) -> bool:
        p = self._path(table)
        return os.path.isdir(p) and any(
            not f.startswith((".", "_")) for f in os.listdir(p)
        )

    def load(self, table: str) -> DataFrame:
        """Read a table (empty frame with the right schema if unwritten).
        The partition columns are pruned back out so callers always see
        the canonical schema."""
        if table not in _TABLES:
            raise KeyError(table)
        if not self._exists(table):
            return self.spark.createDataFrame([], _TABLES[table])
        df = self.spark.read.schema(self._read_schema(table)).parquet(self._path(table))
        return df.select(*[f.name for f in _TABLES[table].fields])

    def _read_schema(self, table: str):
        base = _TABLES[table]
        if table in ("ts_numeric", "ts_blob"):
            from pyspark.sql import types as T

            return T.StructType(list(base.fields) + [T.StructField("time_bucket", T.LongType(), True)])
        return base

    # ------------------------------------------------------------- writes

    def _append_ts(self, table: str, rows: DataFrame) -> None:
        (
            rows.withColumn("time_bucket", F.col("timestamp") / _DAY_MS)
            .withColumn("time_bucket", F.col("time_bucket").cast("long"))
            .write.mode("append")
            .partitionBy("series_id", "time_bucket")
            .parquet(self._path(table))
        )

    def write_numeric(
        self, series_id: str, payload: Any, timestamp: Optional[int] = None
    ) -> int:
        """S1/S2: validate + stamp + append. Returns the timestamp."""
        value, tag_name, tag_value = validate_numeric(payload)
        ts = now_ms() if timestamp is None else int(timestamp)
        rows = self.spark.createDataFrame(
            [(series_id, ts, value, tag_name, tag_value)], S.TS_NUMERIC
        )
        self._append_ts("ts_numeric", rows)
        return ts

    def write_numeric_bulk(self, rows: DataFrame) -> None:
        """Bulk ingest (ts_numeric-shaped frame, already validated
        upstream) — the 100 TB path: one distributed append, daily
        partitions."""
        self._append_ts("ts_numeric", rows)

    def write_blob(
        self, series_id: str, payload: Any, timestamp: Optional[int] = None
    ) -> int:
        """S3: any-JSON append."""
        try:
            data = json.dumps(payload)
        except (TypeError, ValueError) as e:
            raise BadRequest("blob TS payload must be JSON-serializable") from e
        ts = now_ms() if timestamp is None else int(timestamp)
        rows = self.spark.createDataFrame([(series_id, ts, data)], S.TS_BLOB)
        self._append_ts("ts_blob", rows)
        return ts

    def _overwrite(self, table: str, df: DataFrame) -> None:
        # materialize before overwriting the dir we read from
        out = df.cache()
        out.count()
        out.write.mode("overwrite").parquet(self._path(table))
        out.unpersist()

    def kv_upsert(self, kind: str, id_: str, key: str, value: Any) -> None:
        """S4: LWW upsert at (id, key) — src/keyvalue/keyvalue.re:14-20."""
        table = f"kv_{kind}"
        from zestdb_spark.operators import kv as kv_ops

        updates = self.spark.createDataFrame([(id_, key, value)], _TABLES[table])
        self._overwrite(table, kv_ops.upsert(self.load(table), updates))

    def kv_delete(self, kind: str, id_: str, key: Optional[str] = None) -> None:
        """D3: delete key or whole id namespace."""
        from zestdb_spark.operators import kv as kv_ops

        table = f"kv_{kind}"
        self._overwrite(table, kv_ops.delete(self.load(table), id_, key))

    def catalog_upsert(self, item: dict) -> None:
        """S5/M2: validate + upsert by href (src/hc.re:43-51)."""
        from zestdb_spark.operators import catalog as cat_ops

        self._overwrite("catalog_items", cat_ops.upsert_item(self.load("catalog_items"), item))

    def ts_delete(self, plan, compat_collateral: bool = False) -> None:
        """D1: rewrite the table without the matched rows. With a real
        table format this is DELETE FROM + partition pruning; parquet
        emulation rewrites (only) the table."""
        from zestdb_spark.operators import ts_delete as del_ops

        table = "ts_numeric" if plan.store == "numeric" else "ts_blob"
        survivors = del_ops.delete_plan(self.load(table), plan, compat_collateral)
        out = survivors.cache()
        out.count()
        tmp = self._path(table) + ".tmp"
        out.withColumn("time_bucket", (F.col("timestamp") / _DAY_MS).cast("long")).write.mode(
            "overwrite"
        ).partitionBy("series_id", "time_bucket").parquet(tmp)
        out.unpersist()
        import shutil

        real = self._path(table)
        if os.path.isdir(real):
            shutil.rmtree(real)
        os.rename(tmp, real)

    def audit_append(self, record: tuple) -> None:
        """Append one audit row (timestamp, server, client, method,
        path, code) — src/server.re:74-107."""
        self.spark.createDataFrame([record], S.AUDIT).write.mode("append").parquet(
            self._path("audit")
        )
