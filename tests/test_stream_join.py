"""Stream-stream interval join (streaming/join.py): matches inside the
window, cross-micro-batch buffering, watermark-bounded state, and
batch-parity against the batch interval operator's semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from zestdb_spark.schema import TS_NUMERIC
from zestdb_spark.streaming.join import stream_interval_join


def _writer(spark, path):
    def write(rows):
        spark.createDataFrame(rows, TS_NUMERIC).write.mode("append").parquet(path)

    return write


def _stream(spark, path):
    return (
        spark.readStream.schema(TS_NUMERIC)
        .option("maxFilesPerTrigger", "100")
        .parquet(path)
        .select("series_id", "timestamp", "value")
    )


def test_window_matches_and_cross_batch_buffering(spark, tmp_path):
    pdir, adir = str(tmp_path / "pts"), str(tmp_path / "anc")
    wp, wa = _writer(spark, pdir), _writer(spark, adir)
    # batch 1: anchor at t=10_000 on s1; points in and out of window
    wa([("s1", 10_000, 100.0, None, None)])
    wp(
        [
            ("s1", 8_000, 1.0, None, None),   # in [-5s, +2s]
            ("s1", 12_000, 2.0, None, None),  # in
            ("s1", 4_999, 3.0, None, None),   # before window
            ("s1", 12_001, 4.0, None, None),  # after window
            ("s2", 10_000, 5.0, None, None),  # wrong key
        ]
    )
    joined = stream_interval_join(
        _stream(spark, pdir),
        _stream(spark, adir),
        before_ms=5_000,
        after_ms=2_000,
        delay_ms=60_000,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("sj_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["timestamp"], r["value"])
            for r in spark.sql("SELECT * FROM sj_t").collect()
        }
        assert got == {(8_000, 1.0), (12_000, 2.0)}
        # boundary inclusivity (closed range, zest.re semantics)
        wp([("s1", 5_000, 6.0, None, None)])
        q.processAllAvailable()
        got = {
            (r["timestamp"], r["value"])
            for r in spark.sql("SELECT * FROM sj_t").collect()
        }
        assert (5_000, 6.0) in got  # t = anchor - before exactly
        # cross-batch: a NEW anchor must still see buffered points
        # (the points above sit in join state, not just past output)
        wa([("s1", 9_000, 200.0, None, None)])
        q.processAllAvailable()
        anchored = {
            (r["timestamp"], r["anchor_timestamp"])
            for r in spark.sql("SELECT * FROM sj_t").collect()
        }
        assert (8_000, 9_000) in anchored  # batch-1 point x batch-3 anchor
    finally:
        q.stop()


def test_watermark_drops_too_late_rows(spark, tmp_path):
    """State boundedness made observable: after both watermarks advance
    far past an old anchor, a point that would have matched it arrives
    too late and produces NO row — the eviction that keeps join state
    ∝ (delay + window) instead of ∝ stream length."""
    pdir, adir = str(tmp_path / "pts"), str(tmp_path / "anc")
    wp, wa = _writer(spark, pdir), _writer(spark, adir)
    wa([("s1", 10_000, 100.0, None, None)])
    wp([("s1", 10_500, 1.0, None, None)])
    joined = stream_interval_join(
        _stream(spark, pdir),
        _stream(spark, adir),
        before_ms=1_000,
        after_ms=1_000,
        delay_ms=5_000,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("sj_late")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) n FROM sj_late").collect()[0]["n"] == 1
        # advance both watermarks way past 10s (wm = max_event - 5s)
        wa([("s1", 10_000_000, 0.0, None, None)])
        wp([("s1", 10_000_000, 0.0, None, None)])
        q.processAllAvailable()
        # this point is inside the old anchor's window but far behind
        # the watermark: the engine must drop it, not join it
        wp([("s1", 9_800, 2.0, None, None)])
        q.processAllAvailable()
        n = spark.sql("SELECT count(*) n FROM sj_late").collect()[0]["n"]
        assert n == 2  # the 10M self-match only; late point contributed nothing
    finally:
        q.stop()
