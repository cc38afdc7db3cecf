"""URI-path front-end vs the reference dispatch (src/server.re:217-510)."""

from __future__ import annotations

import pytest

from zestdb_spark.errors import BadRequest
from zestdb_spark.plans import compile_path, plan_to_dataframe
from zestdb_spark.plans.plan import Window


def test_flagship_path():
    p = compile_path("/ts/sensor1,sensor2/last/100/filter/room/equals/lounge/max")
    assert p.ids == ("sensor1", "sensor2")
    assert p.window == Window("last", n=100)
    assert p.filter == ("equals", "room", "lounge")
    assert p.agg == "max"
    assert p.store == "numeric"


def test_window_paths():
    assert compile_path("/ts/s/latest").window.op == "latest"
    assert compile_path("/ts/s/earliest").window.op == "earliest"
    assert compile_path("/ts/s/since/123").window == Window("since", from_ms=123)
    assert compile_path("/ts/s/range/1/2").window == Window("range", from_ms=1, to_ms=2)
    assert compile_path("/ts/s/length").window.op == "length"


def test_bare_aggregate_allowed():
    p = compile_path("/ts/s/since/5/median")
    assert p.filter is None and p.agg == "median"


def test_bare_filter_allowed():
    p = compile_path("/ts/s/last/10/filter/room/contains/ou")
    assert p.filter == ("contains", "room", "ou") and p.agg is None


def test_blob_paths():
    p = compile_path("/ts/blob/b1,b2/last/5")
    assert p.store == "blob" and p.ids == ("b1", "b2")


@pytest.mark.parametrize(
    "path",
    [
        "/kv/foo/bar",  # not a ts path
        "/ts/s/last",  # missing n
        "/ts/s/range/1",  # missing t2
        "/ts/s/length/max",  # length takes no functions
        "/ts/s/last/5/max/min",  # two aggregates
        "/ts/s/last/5/filter/a/equals",  # missing filter value
        "/ts/s/last/5/filter/a/startswith/x",  # unknown filter op
        "/ts/s/last/5/sum/filter/a/equals/b",  # agg before filter
        "/ts/blob/b/last/5/max",  # blob takes no aggregate
        "/ts/s/last/abc",  # non-integer n
        "/ts/s/nonsense",  # unknown window
    ],
)
def test_invalid_paths_are_bad_requests(path):
    # the reference's `Empty` fallthrough → CoAP 128
    with pytest.raises(BadRequest):
        compile_path(path)


def test_end_to_end_flagship(ts):
    plan = compile_path("/ts/sensor1,single/last/10/filter/room/equals/lounge/max")
    out = plan_to_dataframe(plan, ts).collect()
    assert out[0]["result"] == 99.0


def test_end_to_end_rows_sorted_desc(ts):
    plan = compile_path("/ts/sensor1,sensor2/last/2")
    out = plan_to_dataframe(plan, ts, sort=True).collect()
    stamps = [r["timestamp"] for r in out]
    assert stamps == sorted(stamps, reverse=True)
