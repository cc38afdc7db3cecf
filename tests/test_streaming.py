"""Structured Streaming observation tier (ST1/ST2) + windowed rollup."""

from __future__ import annotations

import time

from zestdb_spark import schema as S
from zestdb_spark.streaming import observe
from zestdb_spark.streaming.observe import ObserverRegistry


def test_registry_ttl_expiry(monkeypatch):
    reg = ObserverRegistry()
    oid = reg.register("/ts/x", max_age_s=1)
    forever = reg.register("/ts/x", max_age_s=0)
    assert reg.publish_data("/ts/x", {"value": 1}) == 2
    monkeypatch.setattr(observe, "_now_s", lambda: time.time() + 5)
    expired = reg.expire()
    assert expired == [oid]
    assert reg.publish_data("/ts/x", {"value": 2}) == 1  # only the forever one
    assert len(reg.messages(forever)) == 2


def test_registry_mode_separation():
    reg = ObserverRegistry()
    d = reg.register("/ts/x", mode="data")
    a = reg.register("/ts/x", mode="audit")
    other = reg.register("/kv/other", mode="audit")
    wild = reg.register("/ts/*", mode="audit")
    reg.publish_data("/ts/x", {"value": 1})
    reg.publish_audit((1, "srv", "cli", "GET", "/ts/x", 69))
    assert len(reg.messages(d)) == 1
    assert len(reg.messages(a)) == 1
    # audit observers are path-scoped (an observer authorized for one
    # path must not see every other client's audit lines)
    assert len(reg.messages(other)) == 0
    assert len(reg.messages(wild)) == 1


def test_audit_stream_fanout(spark, tmp_path):
    audit_dir = str(tmp_path / "audit")
    rows = [
        (1, "srv", "c1", "POST", "/ts/s1", 65),
        (2, "srv", "c2", "GET", "/ts/s1/latest", 69),
        (3, "srv", "c1", "POST", "/kv/foo/a", 65),
    ]
    spark.createDataFrame(rows, S.AUDIT).write.parquet(audit_dir)
    q = observe.start_audit_stream(spark, audit_dir, query_name="audit_t1")
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM audit_t1").count()
        assert got == 3
    finally:
        q.stop()


def test_data_stream_wildcard_filter(spark, tmp_path):
    log_dir = str(tmp_path / "audit2")
    rows = [
        (1, "srv", "c1", "POST", "/kv/foo/a", 65),
        (2, "srv", "c1", "POST", "/kv/foo/b", 65),
        (3, "srv", "c1", "POST", "/kv/bar/a", 65),
    ]
    import pyspark.sql.functions as F

    spark.createDataFrame(rows, S.AUDIT).write.parquet(log_dir)
    q = observe.start_audit_stream(spark, log_dir, path="/kv/foo/*", query_name="audit_t2")
    try:
        q.processAllAvailable()
        paths = [r["path"] for r in spark.sql("SELECT path FROM audit_t2").collect()]
        assert sorted(paths) == ["/kv/foo/a", "/kv/foo/b"]
    finally:
        q.stop()


def test_windowed_rollup_streaming(spark, tmp_path):
    """Event-time tumbling window with watermark, driven as a stream."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "events")
    rows = [
        ("s1", "2024-01-01 00:01:00", 1.0),
        ("s1", "2024-01-01 00:02:00", 2.0),
        ("s1", "2024-01-01 00:07:00", 10.0),
        ("s2", "2024-01-01 00:01:30", 5.0),
    ]
    df = spark.createDataFrame(rows, "series_id string, ts_str string, value double").select(
        "series_id", F.to_timestamp("ts_str").alias("ts"), "value"
    )
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    agg = observe.windowed_rollup(stream, "5 minutes", "10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("rollup_t")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        out = {
            (r["series_id"], r["window"].start.minute): (r["n"], r["sum_value"])
            for r in spark.sql("SELECT * FROM rollup_t").collect()
        }
        assert out[("s1", 0)] == (2, 3.0)
        assert out[("s1", 5)] == (1, 10.0)
        assert out[("s2", 0)] == (1, 5.0)
    finally:
        q.stop()


def test_data_stream_ignores_rewrites(spark, tmp_path):
    """Observers are an APPEND-event stream, like the reference's
    per-POST notifications (src/server.re:778-793): a delete's survivor
    files and a compaction's merged files re-materialize rows that were
    already announced, and must NOT re-notify a live observer."""
    from zestdb_spark.api import ZestEngine

    eng = ZestEngine(spark, str(tmp_path / "obsrw"))
    day = 86_400_000
    for t in (100, 200, 300):
        eng.post(f"/ts/a/at/{t}", {"value": float(t)})
    q = observe.start_data_stream(
        spark,
        eng.store._path("ts_numeric"),
        eng.store._read_schema("ts_numeric"),
        query_name="data_rw",
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM data_rw").count() == 3

        # a PARTIAL delete rewrites the two surviving rows into rw-*
        # files: the observer must see NOTHING new (the survivors were
        # announced when they were appended)
        eng.delete("/ts/a/range/150/250")
        assert eng.store.load("ts_numeric").count() == 2  # survivors live
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM data_rw").count() == 3

        # compaction likewise re-materializes without re-notifying
        eng.post("/ts/a/at/400", {"value": 9.0})  # 2+ files in bucket 0
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM data_rw").count() == 4
        eng.store.compact("ts_numeric")
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM data_rw").count() == 4

        # and a genuine post-maintenance APPEND still notifies
        eng.post(f"/ts/b/at/{3 * day}", {"value": 7.0})
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM data_rw").count() == 5
    finally:
        q.stop()


def test_audit_stream_ignores_log_compaction(spark, tmp_path):
    """Maintenance must never re-notify: compact_log re-materializes
    rows as rw-* files, and the audit stream's part-* glob keeps them
    out of the feed — only genuine appends arrive afterwards."""
    from zestdb_spark.storage import ZestStore, now_ms

    st = ZestStore(spark, str(tmp_path / "auditglob"))
    for i in range(3):
        st.audit_append((now_ms() + i, "srv", "cli", "GET", f"/ts/s{i}", 69))
    q = observe.start_audit_stream(
        spark, st._path("audit"), query_name="audit_glob_t"
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM audit_glob_t").count() == 3
        # compaction rewrites all three rows into one rw-* file and
        # vacuums the originals — the feed must stay at 3
        assert st.compact_log("audit", vacuum_retention_s=0.0) >= 3
        assert len(st._live_files("audit")) == 1
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM audit_glob_t").count() == 3
        # a genuine append after maintenance still flows
        st.audit_append((now_ms() + 10, "srv", "cli", "POST", "/ts/new", 65))
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM audit_glob_t").count() == 4
    finally:
        q.stop()
