"""Notification relay (ST3) + Spark SQL entry point."""

from __future__ import annotations

from zestdb_spark.streaming.notify import NotificationBroker


def test_notification_request_response_roundtrip():
    broker = NotificationBroker()
    # responder subscribes to the topic
    server_oid = broker.serve("switch")
    # requester sends and watches the callback path
    resp_oid, callback = broker.request("switch", {"cmd": "on"})
    # responder sees the request with the callback correlation key
    reqs = broker.poll(server_oid)
    assert len(reqs) == 1
    assert reqs[0]["data"]["payload"] == {"cmd": "on"}
    assert reqs[0]["data"]["callback"] == callback
    # responder answers to the callback path; requester receives it
    assert broker.respond(callback, {"status": "ok"}) == 1
    resps = broker.poll(resp_oid)
    assert len(resps) == 1 and resps[0]["data"] == {"status": "ok"}


def test_notification_responses_are_isolated():
    broker = NotificationBroker()
    oid_a, cb_a = broker.request("t", {"n": 1})
    oid_b, cb_b = broker.request("t", {"n": 2})
    broker.respond(cb_a, "for-a")
    assert [m["data"] for m in broker.poll(oid_a)] == ["for-a"]
    assert broker.poll(oid_b) == []


def test_sql_entry_point(spark, tmp_path):
    from zestdb_spark import sql as zsql
    from zestdb_spark.storage import ZestStore

    store = ZestStore(spark, str(tmp_path / "store"))
    store.write_numeric("s1", {"value": 1.0, "room": "a"}, timestamp=1000)
    store.write_numeric("s1", {"value": 2.0}, timestamp=2000)
    store.write_numeric("s2", {"value": 3.0}, timestamp=1500)
    zsql.register_store_views(store)

    out = spark.sql("SELECT sum(value) AS s FROM ts_numeric WHERE series_id = 's1'").collect()
    assert out[0]["s"] == 3.0

    top = spark.sql(zsql.last_n_sql("ts_numeric", ["s1", "s2"], 1)).collect()
    got = {(r["series_id"], r["timestamp"]) for r in top}
    assert got == {("s1", 2000), ("s2", 1500)}


def test_sql_testdata_views(spark):
    from zestdb_spark import sql as zsql

    names = zsql.register_testdata_views(spark, "/root/testdata/sf0.001")
    assert "ts_numeric_events" in names
    n = spark.sql(
        "SELECT count(*) AS n FROM ts_numeric_events WHERE series_id = 'click'"
    ).collect()[0]["n"]
    assert n > 0
