"""END-TO-END exactly-once across the table format: the zest_changes
streaming source (manifest versions as offsets) feeding the streaming
ingest sink (per-batch txn markers inside the data's manifest commit)
— store-to-store replication where neither a source replay nor a sink
crash can ever duplicate or drop a row. This is the composition the
two primitives exist for: offsets prove which commits were READ,
txn watermarks prove which batches were WRITTEN, and both proofs live
in manifest records, not in side files that can disagree."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zestdb_spark.api import ZestEngine
from zestdb_spark.storage import ZestStore
from zestdb_spark.streaming import ingest


def _replicate(spark, src_root: str, dst_store: ZestStore, ck: str):
    stream = (
        spark.readStream.format("zest_changes")
        .option("root", src_root)
        .load()
        .select("series_id", "timestamp", "value", "tag_name", "tag_value")
    )
    return ingest.start_ingest(stream, dst_store, ck, client="replica", trigger_once=True)


def test_store_to_store_replication_is_exactly_once(spark, tmp_path, monkeypatch):
    from zestdb_spark.sources import register

    register(spark)
    src = ZestEngine(spark, str(tmp_path / "src"))
    dst = ZestStore(spark, str(tmp_path / "dst"))
    ck = str(tmp_path / "ck")
    for t in (100, 200, 300):
        src.post(f"/ts/a/at/{t}", {"value": float(t)})

    q = _replicate(spark, src.store._path("ts_numeric"), dst, ck)
    q.awaitTermination(180)
    assert dst.load("ts_numeric").count() == 3

    # new source commits + a SINK CRASH after the data commit (the
    # historical duplicate window): the replicated batch's txn marker
    # landed with its data, so the restarted query must not re-append
    src.post("/ts/b/at/400", {"value": 4.0})

    def boom(self, table, n_rows, wid=None):
        raise RuntimeError("injected crash after the replica's data commit")

    monkeypatch.setattr(ZestStore, "_log_write", boom)
    q = _replicate(spark, src.store._path("ts_numeric"), dst, ck)
    with pytest.raises(Exception):
        q.awaitTermination(180)
    monkeypatch.undo()
    assert dst.load("ts_numeric").count() == 4  # landed exactly once

    q = _replicate(spark, src.store._path("ts_numeric"), dst, ck)
    q.awaitTermination(180)
    assert dst.load("ts_numeric").count() == 4  # replay skipped

    # source-side REWRITES stay silent (delete), and the replica keeps
    # following genuine appends afterwards — byte-for-byte row equality
    src.delete("/ts/a/range/150/250")  # rewrite: feed must not re-send
    src.post("/ts/c/at/500", {"value": 5.0})
    q = _replicate(spark, src.store._path("ts_numeric"), dst, ck)
    q.awaitTermination(180)
    got = {
        (r.series_id, r.timestamp, r.value)
        for r in dst.load("ts_numeric").collect()
    }
    # the replica is an APPEND log of everything observed (the deleted
    # row 200 was genuinely appended upstream once — a live observer
    # saw it), each exactly once
    assert got == {
        ("a", 100, 100.0),
        ("a", 200, 200.0),
        ("a", 300, 300.0),
        ("b", 400, 4.0),
        ("c", 500, 5.0),
    }
    assert dst.load("ts_numeric").count() == 5
