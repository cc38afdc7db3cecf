"""Write-side provenance: every mutation appends a write_log row (the
reference attaches Prov.info to every Irmin commit, src/prov.re:38-46,
src/timeseries/shard.re:9-11), and TS data rows carry the batch's
write_id so lineage is a join, not a log-grep."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from zestdb_spark.api import ZestEngine
from zestdb_spark.schema import TS_NUMERIC


def test_post_writes_provenance_row(spark, tmp_path):
    eng = ZestEngine(spark, str(tmp_path / "s"))
    eng.post("/ts/a/at/1000", {"value": 1.0}, client="alice")
    wl = eng.store.load("write_log").collect()
    assert len(wl) == 1
    row = wl[0]
    assert (row.method, row.path, row.client, row.target_table, row.n_rows) == (
        "POST",
        "/ts/a/at/1000",
        "alice",
        "ts_numeric",
        1,
    )
    # the stored data row joins back to that provenance record
    ts = eng.store.load_with_provenance("ts_numeric").collect()
    assert ts[0].write_id == row.write_id


def test_write_ids_are_monotonic_and_durable(spark, tmp_path):
    root = str(tmp_path / "s")
    eng = ZestEngine(spark, root)
    eng.post("/ts/a/at/1000", {"value": 1.0})
    eng.post("/kv/ns/k", {"v": 1})
    # a NEW store over the same root continues the sequence (seeded from
    # the durable log, not process memory)
    eng2 = ZestEngine(spark, root)
    eng2.post("/ts/a/at/2000", {"value": 2.0})
    ids = [r.write_id for r in eng2.store.load("write_log").collect()]
    assert sorted(ids) == [1, 2, 3]


def test_bulk_ingest_one_provenance_row(spark, tmp_path):
    eng = ZestEngine(spark, str(tmp_path / "s"))
    rows = spark.createDataFrame(
        [("s1", 1000, 1.0, None, None), ("s2", 2000, 2.0, None, None)], TS_NUMERIC
    )
    eng.ingest_bulk(rows, path="/ts/bulk/batch1", client="loader-1")
    wl = eng.store.load("write_log").collect()
    assert len(wl) == 1 and wl[0].n_rows is None and wl[0].client == "loader-1"
    ts = eng.store.load_with_provenance("ts_numeric")
    joined = ts.join(eng.store.load("write_log"), "write_id").select("series_id", "path")
    assert {(r.series_id, r.path) for r in joined.collect()} == {
        ("s1", "/ts/bulk/batch1"),
        ("s2", "/ts/bulk/batch1"),
    }


def test_delete_and_kv_mutations_logged(spark, tmp_path):
    eng = ZestEngine(spark, str(tmp_path / "s"))
    eng.post("/ts/d/at/1000", {"value": 1.0})
    eng.delete("/ts/d/since/0", client="reaper")
    eng.post("/kv/ns/k", {"v": 1})
    eng.delete("/kv/ns/k")
    methods = {
        (r.method, r.target_table)
        for r in eng.store.load("write_log").collect()
    }
    assert ("DELETE", "ts_numeric") in methods
    assert ("POST", "kv_json") in methods
    assert ("DELETE", "kv_json") in methods


def test_write_id_survives_partition_scoped_delete(spark, tmp_path):
    """Deleting one day-bucket must not wipe the provenance stamp on
    surviving rows of the rewritten series."""
    day = 86_400_000
    eng = ZestEngine(spark, str(tmp_path / "s"))
    eng.post("/ts/a/at/500", {"value": 1.0})  # bucket 0
    eng.post(f"/ts/a/at/{day + 500}", {"value": 2.0})  # bucket 1
    ids_before = {
        r.timestamp: r.write_id
        for r in eng.store.load_with_provenance("ts_numeric").collect()
    }
    eng.delete(f"/ts/a/range/{day}/{2 * day}")
    after = eng.store.load_with_provenance("ts_numeric").collect()
    assert len(after) == 1
    assert after[0].write_id == ids_before[500]


def test_canonical_load_hides_write_id(spark, tmp_path):
    eng = ZestEngine(spark, str(tmp_path / "s"))
    eng.post("/ts/a/at/1000", {"value": 1.0})
    assert "write_id" not in eng.store.load("ts_numeric").columns
    # and the read path still renders reference-shaped JSON
    out = json.loads(eng.get("/ts/a/latest"))
    assert out == [{"timestamp": 1000, "data": {"value": 1.0}}]
