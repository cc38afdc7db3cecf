"""applyInPandasWithState: per-series state must persist ACROSS
micro-batches (batch 2 continues batch 1's counts)."""

from __future__ import annotations

import pyspark.sql.functions as F

from zestdb_spark.schema import TS_NUMERIC
from zestdb_spark.streaming.stateful import running_series_stats


def test_state_survives_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "ingest")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(rows):
        spark.createDataFrame(rows, TS_NUMERIC).write.mode("append").parquet(src)

    write_batch(
        [
            ("s1", 1000, 1.0, None, None),
            ("s1", 2000, 5.0, None, None),
            ("s2", 1500, -2.0, None, None),
        ]
    )

    stream = (
        spark.readStream.schema(TS_NUMERIC)
        .option("maxFilesPerTrigger", "100")
        .parquet(src)
        .select("series_id", "timestamp", "value")
    )
    q = (
        running_series_stats(stream)
        .writeStream.format("memory")
        .queryName("stateful_t")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            r["series_id"]: (r["n"], r["sum_value"], r["last_ts"])
            for r in spark.sql("SELECT * FROM stateful_t").collect()
        }
        assert first["s1"] == (2, 6.0, 2000)
        assert first["s2"] == (1, -2.0, 1500)

        # second micro-batch: counts must CONTINUE, not restart
        write_batch([("s1", 3000, 10.0, None, None)])
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM stateful_t WHERE series_id = 's1' ORDER BY n DESC"
        ).collect()
        latest = rows[0]
        assert (latest["n"], latest["sum_value"], latest["last_ts"]) == (3, 16.0, 3000)
        assert latest["min_value"] == 1.0 and latest["max_value"] == 10.0
    finally:
        q.stop()


def test_streaming_sessions_split_and_timeout(spark, tmp_path):
    """Sessionization with idle timeout: an in-batch gap emits the
    finished session immediately; a key that goes quiet past the gap
    has its open session closed by the PROCESSING-time state timeout.
    ProcessingTimeTimeout keeps scheduling timeout-check batches, so
    the test drives a periodic trigger and polls the sink (never
    processAllAvailable, which cannot settle under timeout batches)."""
    import time as _time

    from zestdb_spark.streaming.stateful import streaming_sessions

    src = str(tmp_path / "sess_ingest")
    ckpt = str(tmp_path / "sess_ckpt")

    def write_batch(rows):
        spark.createDataFrame(rows, TS_NUMERIC).write.mode("append").parquet(src)

    # s1: two sessions split by an in-batch gap (7500 > 2000); the
    # second (9000) stays open and must close via the idle timeout
    write_batch(
        [
            ("s1", 1000, 1.0, None, None),
            ("s1", 1500, 1.0, None, None),
            ("s1", 9000, 1.0, None, None),
        ]
    )
    stream = (
        spark.readStream.schema(TS_NUMERIC)
        .option("maxFilesPerTrigger", "100")
        .parquet(src)
        .select("series_id", "timestamp", "value")
    )
    q = (
        streaming_sessions(stream, gap_ms=2000)
        .writeStream.format("memory")
        .queryName("sessions_t")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )

    def poll(pred, sec=90):
        deadline = _time.time() + sec
        rows = []
        while _time.time() < deadline:
            rows = spark.sql("SELECT * FROM sessions_t").collect()
            if pred(rows):
                break
            _time.sleep(0.3)
        return rows

    try:
        rows = poll(lambda r: len(r) >= 1)
        done = {(r.session_start, r.session_end, r.n_events) for r in rows}
        assert (1000, 1500, 2) in done  # in-batch split emitted eagerly

        # every event must eventually land in a closed session (the
        # open 9000-session closes via the timeout; no event lost, no
        # session double-counted)
        rows = poll(lambda r: sum(x.n_events for x in r) >= 3)
        done = {(r.session_start, r.session_end, r.n_events) for r in rows}
        assert done == {(1000, 1500, 2), (9000, 9000, 1)}
    finally:
        q.stop()
