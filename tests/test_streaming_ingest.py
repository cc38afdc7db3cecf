"""Streaming ingest → store: micro-batches land as provenance-stamped
bulk appends; malformed rows divert instead of killing the stream."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from zestdb_spark.api import ZestEngine
from zestdb_spark.storage import ZestStore
from zestdb_spark.streaming import ingest


def _write_batch(spark, src_dir: str, name: str, rows: list) -> None:
    spark.createDataFrame(
        rows, "series_id string, timestamp long, value double"
    ).coalesce(1).write.mode("append").parquet(src_dir)


def test_ingest_two_batches_with_provenance(spark, tmp_path):
    src = str(tmp_path / "landing")
    store = ZestStore(spark, str(tmp_path / "store"))
    _write_batch(spark, src, "b0", [("a", 1000, 1.0), ("b", 2000, 2.0)])

    stream = (
        spark.readStream.schema("series_id string, timestamp long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = ingest.start_ingest(
        stream, store, str(tmp_path / "ckpt"), client="lander", trigger_once=True
    )
    q.awaitTermination(120)

    assert store.load("ts_numeric").count() == 2
    wl = store.load("write_log").collect()
    assert len(wl) == 1 and wl[0].client == "lander" and wl[0].method == "POST"

    # second landing file → second batch → second provenance record
    _write_batch(spark, src, "b1", [("a", 3000, 3.0)])
    q2 = ingest.start_ingest(
        stream, store, str(tmp_path / "ckpt"), client="lander", trigger_once=True
    )
    q2.awaitTermination(120)
    assert store.load("ts_numeric").count() == 3
    wl = store.load("write_log").collect()
    assert len(wl) == 2 and len({r.write_id for r in wl}) == 2
    # exactly-once: every stored row joins to exactly one batch
    prov = store.load_with_provenance("ts_numeric")
    assert prov.filter(F.col("write_id").isNull()).count() == 0

    # and the engine read path serves the streamed data
    eng = ZestEngine(spark, str(tmp_path / "store"))
    assert json.loads(eng.get("/ts/a/latest")) == [
        {"timestamp": 3000, "data": {"value": 3.0}}
    ]


def test_replayed_batch_is_skipped(spark, tmp_path):
    """At-least-once foreachBatch redelivery must not duplicate rows:
    a batch whose write_log row exists (log lands after data) is
    skipped. Simulated by re-running the stream with a FRESH checkpoint
    so batch_id 0 is redelivered for the same landing file."""
    src = str(tmp_path / "landing3")
    store = ZestStore(spark, str(tmp_path / "store3"))
    _write_batch(spark, src, "b0", [("a", 1000, 1.0)])
    stream = (
        spark.readStream.schema("series_id string, timestamp long, value double")
        .parquet(src)
    )
    q = ingest.start_ingest(stream, store, str(tmp_path / "ck_a"), trigger_once=True)
    q.awaitTermination(120)
    # SAME checkpoint rerun: no new files -> no new batches -> no dupes
    q = ingest.start_ingest(stream, store, str(tmp_path / "ck_a"), trigger_once=True)
    q.awaitTermination(120)
    assert store.load("ts_numeric").count() == 1
    assert store.load("write_log").count() == 1


def test_fresh_checkpoint_with_new_data_is_not_skipped(spark, tmp_path):
    """Batch identity is scoped to the checkpoint: a RESET checkpoint
    re-numbers batches from 0, and those must not collide with the old
    checkpoint's logged batch 0 (which would silently drop new rows)."""
    src = str(tmp_path / "landing4")
    store = ZestStore(spark, str(tmp_path / "store4"))
    _write_batch(spark, src, "b0", [("a", 1000, 1.0)])
    stream = (
        spark.readStream.schema("series_id string, timestamp long, value double")
        .parquet(src)
    )
    q = ingest.start_ingest(stream, store, str(tmp_path / "ck_1"), trigger_once=True)
    q.awaitTermination(120)
    _write_batch(spark, src, "b1", [("b", 2000, 2.0)])
    # fresh checkpoint: batch 0 again, now covering BOTH files
    q = ingest.start_ingest(stream, store, str(tmp_path / "ck_2"), trigger_once=True)
    q.awaitTermination(120)
    # the new row must be present (at-least-once across a checkpoint
    # reset: the old row may duplicate — that is the documented
    # semantic of resetting checkpoints, never silent loss)
    assert store.load("ts_numeric").filter("series_id = 'b'").count() == 1


def test_crash_after_commit_before_log_is_exactly_once(spark, tmp_path, monkeypatch):
    """Crash-inject the historical at-least-once window: kill the sink
    AFTER the data's manifest commit but BEFORE the provenance log row.
    Because the batch marker (txn) rides the SAME atomic manifest
    commit as the data files, the redelivered batch is provably
    committed and must be skipped — no duplicate rows, ever."""
    src = str(tmp_path / "landing5")
    store = ZestStore(spark, str(tmp_path / "store5"))
    _write_batch(spark, src, "b0", [("a", 1000, 1.0), ("b", 2000, 2.0)])
    stream = (
        spark.readStream.schema("series_id string, timestamp long, value double")
        .parquet(src)
    )

    def boom(self, table, n_rows, wid=None):
        raise RuntimeError("injected crash between data commit and log row")

    monkeypatch.setattr(ZestStore, "_log_write", boom)
    q = ingest.start_ingest(stream, store, str(tmp_path / "ck_5"), trigger_once=True)
    with pytest.raises(Exception):  # StreamingQueryException wrapping the crash
        q.awaitTermination(120)
    monkeypatch.undo()

    # the data COMMITTED (manifest published before the crash point),
    # and the batch watermark committed with it — atomically
    assert store.load("ts_numeric").count() == 2
    prov = store.load_with_provenance("ts_numeric")
    assert prov.select("write_id").distinct().count() == 1

    # restart on the SAME checkpoint: Spark redelivers batch 0 (its
    # offset log advanced but the batch never completed) — the sink
    # must skip it via the manifest watermark
    q2 = ingest.start_ingest(stream, store, str(tmp_path / "ck_5"), trigger_once=True)
    q2.awaitTermination(120)
    assert store.load("ts_numeric").count() == 2  # no duplicates

    # and the stream keeps flowing afterwards: a NEW batch still lands
    _write_batch(spark, src, "b1", [("c", 3000, 3.0)])
    q3 = ingest.start_ingest(stream, store, str(tmp_path / "ck_5"), trigger_once=True)
    q3.awaitTermination(120)
    assert store.load("ts_numeric").count() == 3
    assert store.load("ts_numeric").filter("series_id = 'c'").count() == 1


def test_validated_diverts_bad_rows(spark, tmp_path):
    src = str(tmp_path / "landing2")
    spark.createDataFrame(
        [("a", 1000, 1.0), (None, 2000, 2.0), ("c", 3000, float("nan"))],
        "series_id string, timestamp long, value double",
    ).write.parquet(src)
    stream = (
        spark.readStream.schema("series_id string, timestamp long, value double")
        .parquet(src)
    )
    good, bad = ingest.validated(stream)
    store = ZestStore(spark, str(tmp_path / "store2"))
    q = ingest.start_ingest(stream, store, str(tmp_path / "ckpt2"), trigger_once=True)
    q.awaitTermination(120)
    rows = store.load("ts_numeric").collect()
    assert [(r.series_id, r.value) for r in rows] == [("a", 1.0)]
    assert good.isStreaming and bad.isStreaming


def test_pre_upgrade_checkpoint_batch_not_reappended(spark, tmp_path):
    """Upgrade path: a checkpoint whose batches committed BEFORE the
    manifest-txn watermarks existed has no txn record — only legacy
    write_log rows keyed by the old digest (md5(checkpoint_dir)[:10]).
    On attach, the sink must seed its watermark from those rows so the
    first post-upgrade redelivery is skipped, not appended twice."""
    import hashlib

    src = str(tmp_path / "landing_up")
    store = ZestStore(spark, str(tmp_path / "store_up"))
    ckpt = str(tmp_path / "ck_up")
    _write_batch(spark, src, "b0", [("a", 1000, 1.0), ("b", 2000, 2.0)])

    # pre-upgrade on-disk state for committed batch 0: data + a legacy
    # write_log row (old path format, NO txn marker) — byte-for-byte
    # what the r7 sink produced
    legacy_digest = hashlib.md5(ckpt.encode()).hexdigest()[:10]
    legacy = spark.createDataFrame(
        [("a", 1000, 1.0, None, None), ("b", 2000, 2.0, None, None)],
        "series_id string, timestamp long, value double, "
        "tag_name string, tag_value string",
    )
    store.set_request_context(
        "POST", f"/ts/stream/ck/{legacy_digest}/batch/0", "stream", None
    )
    store.write_numeric_bulk(legacy)  # legacy: no txn=
    new_digest = hashlib.md5(f"{ckpt}\x00/ts/stream".encode()).hexdigest()[:12]
    assert store.last_txn_version("ts_numeric", f"ingest-{new_digest}") is None

    # post-upgrade attach: the FRESH checkpoint redelivers batch 0 over
    # the same landing file (the at-least-once stand-in)
    stream = (
        spark.readStream.schema("series_id string, timestamp long, value double")
        .parquet(src)
    )
    q = ingest.start_ingest(stream, store, ckpt, trigger_once=True)
    q.awaitTermination(120)
    assert store.load("ts_numeric").count() == 2  # skipped, not re-appended

    # batches PAST the legacy watermark still land
    _write_batch(spark, src, "b1", [("c", 3000, 3.0)])
    q = ingest.start_ingest(stream, store, ckpt, trigger_once=True)
    q.awaitTermination(120)
    assert store.load("ts_numeric").count() == 3
    assert store.load("ts_numeric").filter("series_id = 'c'").count() == 1
