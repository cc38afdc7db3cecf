"""Regression pins for the round-6 review findings: front-end parity
(ZestQL routes through the same auth/audit/compat machinery as URI
paths), floor time-bucketing on pre-1970 rows, catalog payload
validation and JSON fidelity, empty-ids delete semantics, and bulk
ingest schema hardening."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from zestdb_spark.api import ZestEngine
from zestdb_spark.auth import AclValidator
from zestdb_spark.errors import BadRequest, Unauthorized
from zestdb_spark.operators import temporal, ts_delete
from zestdb_spark.plans import compile_path
from zestdb_spark.schema import TS_NUMERIC


def _engine(spark, tmp_path, **kw) -> ZestEngine:
    eng = ZestEngine(spark, str(tmp_path / "store"), **kw)
    eng.store.set_request_context("POST", "/ts/seed", "seeder")
    eng.store.write_numeric_bulk(
        eng.spark.createDataFrame(
            [("s", 1000, 1.0, None, None), ("s", 2000, 2.0, None, None)],
            TS_NUMERIC,
        )
    )
    return eng


def test_zestql_get_and_delete_respect_acl(spark, tmp_path):
    acl = AclValidator()
    acl.mint("reader", [("GET", "/ts/*")])
    eng = _engine(spark, tmp_path, acl=acl)
    # GET allowed for the reader token, DELETE is not
    assert json.loads(eng.zestql('get from "s" last 10;', token="reader"))
    with pytest.raises(Unauthorized):
        eng.zestql('delete from "s" range 10 s to 0 s;', now=10_000, token="reader")
    with pytest.raises(Unauthorized):
        eng.zestql('get from "s" last 10;', token=None)


def test_zestql_get_and_delete_are_audited(spark, tmp_path):
    eng = _engine(spark, tmp_path)
    eng.zestql('get from "s" last 10;', client="ql-client")
    eng.zestql('delete from "s" range 10 s to 0 s;', now=10_000, client="ql-client")
    audit = {
        (r["method"], r["client"]) for r in eng.store.load("audit").collect()
    }
    assert ("GET", "ql-client") in audit
    assert ("DELETE", "ql-client") in audit
    # the delete carried real request context into provenance, not the
    # DIRECT fallback
    log = eng.store.load("write_log").filter("method = 'DELETE'").collect()
    assert log and log[0]["client"] == "ql-client"


def test_zestql_delete_honors_collateral_compat(spark, tmp_path):
    # two rows share ts=1000 across series; compat mode deletes both
    # rows at a matched timestamp within the SELECTED series only
    eng = ZestEngine(
        spark, str(tmp_path / "store"), compat_collateral_delete=True
    )
    eng.store.set_request_context("POST", "/ts/seed", "seeder")
    eng.store.write_numeric_bulk(
        spark.createDataFrame(
            [("s", 1000, 1.0, "k", "1"), ("s", 1000, 2.0, None, None),
             ("s", 2000, 3.0, None, None)],
            TS_NUMERIC,
        )
    )
    eng.zestql('delete from "s" where "k" is "1" range 10 s to 0 s;', now=10_000)
    left = sorted(r["value"] for r in eng.store.load("ts_numeric").collect())
    # the untagged ts=1000 row died collaterally (reference quirk);
    # without the flag flowing through zestql it would have survived
    assert left == [3.0]


def test_rollup_buckets_floor_negative_timestamps(spark):
    df = spark.createDataFrame(
        [("s", -50, 1.0, None, None), ("s", 50, 2.0, None, None)], TS_NUMERIC
    )
    rows = {
        r["bucket_ms"]: r for r in temporal.rollup_time_bucket(df, 100).collect()
    }
    # floor semantics: -50 belongs to [-100, 0), not to 0's bucket
    assert set(rows) == {-100, 0}
    assert rows[-100]["n"] == 1 and rows[0]["n"] == 1


def test_rollup_quantile_labels_do_not_collide(spark):
    df = spark.createDataFrame(
        [("s", 0, float(v), None, None) for v in range(10)], TS_NUMERIC
    )
    out = temporal.rollup_quantiles(df, 1000, probs=(0.99, 0.995))
    assert "p99" in out.columns and "p99_5" in out.columns


def test_catalog_rejects_non_dict_payload(spark, tmp_path):
    eng = ZestEngine(spark, str(tmp_path / "store"))
    with pytest.raises(BadRequest):
        eng.post("/cat", ["not", "an", "object"])
    with pytest.raises(BadRequest):
        eng.post("/cat", "just a string")


def test_catalog_val_json_fidelity(spark, tmp_path):
    eng = ZestEngine(spark, str(tmp_path / "store"))
    eng.post("/cat", {
        "href": "sensor-1",
        "item-metadata": [
            {"rel": "urn:X-hypercat:rels:hasDescription:en", "val": "desc"},
            {"rel": "urn:X-hypercat:rels:isContentType", "val": True},
        ],
    })
    cat = json.loads(eng.get("/cat"))
    vals = {
        p["rel"]: p["val"]
        for item in cat["items"]
        for p in item["item-metadata"]
    }
    # JSON true round-trips as 'true', never Python's 'True'
    assert vals["urn:X-hypercat:rels:isContentType"] == "true"


def test_delete_plan_empty_ids_is_noop(spark):
    df = spark.createDataFrame(
        [("s", 1000, 1.0, None, None)], TS_NUMERIC
    )
    plan = compile_path("/ts/s/since/0").__class__(
        **{**compile_path("/ts/s/since/0").__dict__, "ids": ()}
    )
    assert ts_delete.delete_plan(df, plan).count() == 1  # nothing deleted


def test_write_numeric_bulk_casts_to_canonical_schema(spark, tmp_path):
    from zestdb_spark.storage import ZestStore

    store = ZestStore(spark, str(tmp_path / "store"))
    store.set_request_context("POST", "/ts/bulk", "loader")
    # INT value column + reordered columns must not poison the table
    bad_shape = spark.createDataFrame(
        [(5, "s", 1000, None, None)],
        "value int, series_id string, timestamp long, tag_name string, tag_value string",
    )
    store.write_numeric_bulk(bad_shape)
    rows = store.load("ts_numeric").collect()
    assert rows[0]["value"] == 5.0 and isinstance(rows[0]["value"], float)


def test_observe_grant_authorizes_observe_only(spark, tmp_path):
    acl = AclValidator()
    acl.mint("watcher", [("OBSERVE", "/ts/x")])
    eng = ZestEngine(spark, str(tmp_path / "store"), acl=acl)
    # an OBSERVE grant admits the observe registration...
    assert eng.observe("/ts/x", token="watcher")
    # ...but not a plain read of the same path
    with pytest.raises(Unauthorized):
        eng.get("/ts/x/latest", token="watcher")


def test_macaroon_packet_overflow_raises_at_mint():
    from zestdb_spark.macaroons import mint_token

    with pytest.raises(ValueError, match="65535"):
        mint_token(
            id="id", location="loc", path="/" + "x" * 70_000,
            meth="GET", target="t", key="secret",
        )


def test_extract_features_tolerates_null_payload(spark):
    from zestdb_spark.functions import multimodal

    assets = spark.createDataFrame(
        [(1, "audio", "audio/wav", bytearray(b"RIFFdata")), (2, "image", "image/bmp", None)],
        "asset_id long, kind string, mime string, payload binary",
    )
    rows = {r["asset_id"]: r for r in multimodal.extract_features(assets).collect()}
    assert rows[2]["byte_len"] == 0 and rows[2]["head_hex"] == ""
    assert rows[1]["byte_len"] == 8


def test_bucket_ids_rejects_wrong_dim(spark):
    from zestdb_spark.functions import similarity

    embs = spark.createDataFrame(
        [(1, [1.0] * 32)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="expected 64-dim"):
        similarity.bucket_ids(embs, 8, 64).collect()


def test_ivf_topk_missing_query_returns_empty(spark):
    from zestdb_spark.functions import similarity

    embs = spark.createDataFrame(
        [(i, [float(i + 1)] * 64) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    assert similarity.ivf_topk(embs, query_vec_id=999, k=3).count() == 0


def test_tail_source_bogus_table_is_friendly(spark, tmp_path):
    from zestdb_spark.sources import register

    register(spark)
    with pytest.raises(Exception, match="must be one of"):
        spark.read.format("zest_tail").option("table", "ts_bogus").option(
            "root", str(tmp_path)
        ).option("series", "s").option("n", "1").option("mode", "last").load().collect()
