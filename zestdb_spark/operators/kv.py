"""Key-value store operators (SURVEY.md §2.1 S4, §2.4 A9-A10, §2.7 D3).

Reference: a two-level namespace (id, key) → value with three formats
(json/text/binary by content-format, src/keyvalue/keyvalue.re:3-127),
last-writer-wins upsert (Ezirmin FS_lww_register), per-id key listing
(src/keyvalue/keys.re:32-45) and count (:62).

Spark-first: reads are predicate-pushdown point lookups / id-scans on a
(id, key)-partitioned table; the LWW upsert is the classic MERGE
emulation (anti-join + union) since Delta isn't on the classpath —
at scale you'd swap `upsert` for `MERGE INTO` on Delta/Iceberg without
touching callers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read(kv: DataFrame, id_: str, key: str) -> DataFrame:
    """GET /kv/<id>/<key> → 1-row (or empty) {value} frame
    (src/keyvalue/keyvalue.re:22-31: missing key reads empty)."""
    return kv.filter((F.col("id") == id_) & (F.col("key") == key)).select("value")


def keys(kv: DataFrame, id_: str) -> DataFrame:
    """GET /kv/<id>/keys → {key} rows (src/keyvalue/keys.re:32-45)."""
    return kv.filter(F.col("id") == id_).select("key")


def count(kv: DataFrame, id_: str) -> DataFrame:
    """GET /kv/<id>/count → 1-row {count} (src/keyvalue/keyvalue.re:35-36)."""
    return kv.filter(F.col("id") == id_).agg(F.count(F.lit(1)).alias("count"))


def upsert(kv: DataFrame, updates: DataFrame) -> DataFrame:
    """POST /kv/<id>/<key> — last-writer-wins by (id, key)
    (src/keyvalue/keyvalue.re:14-20).

    ``updates`` must be deduplicated on (id, key) by the caller (the
    reference processes one write at a time; batch callers pick their
    own intra-batch winner). Emulated MERGE: keep rows not being
    replaced, add the new versions.
    """
    survivors = kv.join(updates.select("id", "key"), ["id", "key"], "left_anti")
    return survivors.unionByName(updates)


def delete(kv: DataFrame, id_: str, key: str | None = None) -> DataFrame:
    """DELETE /kv/<id>[/<key>] → remaining rows (src/server.re:918-953;
    key=None is delete_all, iterating the id's keys)."""
    cond = F.col("id") == id_
    if key is not None:
        cond = cond & (F.col("key") == key)
    return kv.filter(~cond)
