"""KV store, catalog, and delete semantics (§2.1 S4-S5, §2.7, §2.12)."""

from __future__ import annotations

import json

import pytest

from zestdb_spark.errors import BadRequest, UnsupportedMethod
from zestdb_spark.operators import catalog, kv, ts_delete
from zestdb_spark.plans import compile_path
from zestdb_spark.schema import CATALOG_ITEMS, KV_JSON

KV_ROWS = [
    ("lounge", "lightbulb", '{"name":"dave","age":30}'),
    ("lounge", "thermostat", "21.5"),
    ("kitchen", "kettle", '{"on":false}'),
]


@pytest.fixture(scope="module")
def kvdf(spark):
    return spark.createDataFrame(KV_ROWS, KV_JSON).cache()


def test_kv_read_point_lookup(kvdf):
    out = kv.read(kvdf, "lounge", "lightbulb").collect()
    assert json.loads(out[0]["value"])["name"] == "dave"


def test_kv_read_missing_is_empty(kvdf):
    # missing key reads empty (src/keyvalue/keyvalue.re:28-31)
    assert kv.read(kvdf, "lounge", "nope").count() == 0


def test_kv_keys_and_count(kvdf):
    assert sorted(r["key"] for r in kv.keys(kvdf, "lounge").collect()) == [
        "lightbulb",
        "thermostat",
    ]
    assert kv.count(kvdf, "lounge").collect()[0]["count"] == 2
    assert kv.count(kvdf, "attic").collect()[0]["count"] == 0


def test_kv_upsert_is_lww(spark, kvdf):
    updates = spark.createDataFrame(
        [("lounge", "lightbulb", '{"name":"eve"}'), ("attic", "fan", "1")], KV_JSON
    )
    out = kv.upsert(kvdf, updates)
    assert out.count() == 4
    assert json.loads(kv.read(out, "lounge", "lightbulb").collect()[0]["value"])["name"] == "eve"


def test_kv_delete_key_and_all(kvdf):
    assert kv.delete(kvdf, "lounge", "lightbulb").count() == 2
    assert kv.delete(kvdf, "lounge").count() == 1  # delete_all


ITEM = {
    "href": "/sensor1",
    "item-metadata": [
        {"rel": catalog.REL_DESCRIPTION, "val": "room sensor"},
        {"rel": catalog.REL_CONTENT_TYPE, "val": "application/json"},
    ],
}


@pytest.fixture(scope="module")
def catdf(spark):
    return spark.createDataFrame(
        [("/old", [(catalog.REL_DESCRIPTION, "old"), (catalog.REL_CONTENT_TYPE, "x")])],
        CATALOG_ITEMS,
    )


def test_catalog_upsert_by_href(catdf):
    out = catalog.upsert_item(catdf, ITEM)
    assert out.count() == 2
    out2 = catalog.upsert_item(out, {**ITEM, "item-metadata": ITEM["item-metadata"]})
    assert out2.count() == 2  # replaced, not duplicated


@pytest.mark.parametrize(
    "item",
    [
        {},
        {"href": "/x"},
        {"href": "/x", "item-metadata": [{"rel": catalog.REL_DESCRIPTION, "val": "d"}]},
        {"href": "/x", "item-metadata": [{"rel": "other", "val": "d"}]},
        {"href": "", "item-metadata": []},
    ],
)
def test_catalog_validation_rejects(catdf, item):
    # src/hc.re:20-41 → CoAP 128
    with pytest.raises(BadRequest):
        catalog.upsert_item(catdf, item)


def test_catalog_render_envelope(catdf):
    cat = json.loads(catalog.render(catdf))
    assert cat["items"][0]["href"] == "/old"
    assert {m["rel"] for m in cat["catalogue-metadata"]} >= {catalog.REL_DESCRIPTION}


def test_catalog_flatten(catdf):
    flat = catalog.flatten(catdf).collect()
    assert {(r["href"], r["rel"]) for r in flat} == {
        ("/old", catalog.REL_DESCRIPTION),
        ("/old", catalog.REL_CONTENT_TYPE),
    }


# ------------------------------------------------------------------ deletes

def test_delete_range_with_filter(ts):
    plan = compile_path("/ts/sensor1/range/1000/2000/filter/room/equals/lounge")
    out = ts_delete.delete_plan(ts, plan)
    assert out.count() == 10  # only (sensor1,1000,1.0,room,lounge) dropped


def test_delete_since(ts):
    plan = compile_path("/ts/sensor2/since/2000")
    assert ts_delete.delete_plan(ts, plan).count() == 9


def test_delete_collateral_compat(ts):
    # reference quirk: rows sharing a matched timestamp die too
    # (timeseries.re:431-487)
    plan = compile_path("/ts/sensor1/range/1000/1000/filter/room/equals/lounge")
    strict = ts_delete.delete_plan(ts, plan)
    compat = ts_delete.delete_plan(ts, plan, compat_collateral=True)
    assert strict.count() == 10  # exact delete: 1 row
    assert compat.count() == 9  # collateral: the kitchen tie dies too


def test_delete_guards(ts):
    # deletes by count / of aggregates → CoAP 134 (src/server.re:955-974)
    for path in ["/ts/s/last/5", "/ts/s/first/2", "/ts/s/since/1/max"]:
        with pytest.raises(UnsupportedMethod):
            ts_delete.delete_plan(ts, compile_path(path))


def test_kv_ingest_bulk_replaces_only_loaded_namespaces(spark, tmp_path):
    from zestdb_spark.storage import ZestStore

    store = ZestStore(spark, str(tmp_path / "store"))
    store.set_request_context("POST", "/kv/bulk", "loader", "json")
    store.kv_ingest_bulk("json", spark.createDataFrame(KV_ROWS, KV_JSON))
    assert store.load("kv_json").count() == 3

    # a second bulk load carrying 'lounge' replaces that namespace
    # WHOLESALE (thermostat gone) and leaves 'kitchen' untouched
    store.kv_ingest_bulk(
        "json",
        spark.createDataFrame([("lounge", "lightbulb", '"v2"')], KV_JSON),
    )
    rows = {(r["id"], r["key"]): r["value"] for r in store.load("kv_json").collect()}
    assert rows == {
        ("lounge", "lightbulb"): '"v2"',
        ("kitchen", "kettle"): '{"on":false}',
    }
    # both loads logged provenance
    assert store.load("write_log").filter("target_table = 'kv_json'").count() == 2

    # per-key path APIs keep working on bulk-loaded data
    store.kv_delete("json", "lounge", "lightbulb")
    assert store.load("kv_json").count() == 1
