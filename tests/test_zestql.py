"""ZestQL parser vs the reference grammar (test/zestql/parser.mly) and
its statement corpus (test/zestql/test.zestql)."""

from __future__ import annotations

import pytest

from zestdb_spark.errors import BadRequest
from zestdb_spark.plans import zestql as zql
from zestdb_spark.plans.plan import Window

NOW = 1_000_000_000_000  # fixed now_ms for deterministic relative times


def test_corpus_parses():
    # every statement from the reference's test.zestql must parse
    corpus = [
        'connect key "vl6wu0A@XP?}Or/&BR#LSxn>A+}L)p44/W[wXL3<";',
        'connect key "k" host "foo";',
        'post 42.0 to "sensor1";',
        'POST 42.1 TO "sensor1";',
        'post 43.0 TO "sensor1" where "serial" is "A001";',
        'post 43.1 TO "sensor1" \nwhere "serial" is "A001";',
        'get min from "sensor1" SINCE 1m;',
        'get from "sensor1111" SINCE 24h;',
        'get from "sensor1111" SINCE 1d;',
        'get from "sensor1,sensor2" where "serial" is "A00" since 1s;',
        'get from "sensor2" last 10;',
        'get count from "sensor1,sensor2" where "serial" is "A00" since 10sec;',
        'get from "sensor200" range 1s to 0s;',
        'observe from "sensor1" for 10s;',
        'observe from "sensor1" mode audit;',
        'delete from "sensor42" range 0s to 1s;',
        'delete from "sensor1" where "serial" is "A00" range 5s to 10s;',
        'disconnect host "localhost";',
    ]
    for stmt in corpus:
        assert zql.parse(stmt, NOW) is not None


def test_get_since_relative_time():
    g = zql.parse('get min from "sensor1" SINCE 1m;', NOW)
    assert isinstance(g, zql.Get)
    assert g.plan.agg == "min"
    assert g.plan.ids == ("sensor1",)
    assert g.plan.window == Window("since", from_ms=NOW - 60_000)


def test_get_range_units():
    g = zql.parse('get from "s" range 2h to 1h;', NOW)
    assert g.plan.window == Window(
        "range", from_ms=NOW - 2 * 3_600_000, to_ms=NOW - 3_600_000
    )


def test_get_where_is_equals_filter():
    g = zql.parse('get count from "a,b" where "serial" is "A00" since 10sec;', NOW)
    assert g.plan.filter == ("equals", "serial", "A00")
    assert g.plan.agg == "count"
    assert g.plan.ids == ("a", "b")


def test_get_last():
    g = zql.parse('get from "sensor2" last 10;', NOW)
    assert g.plan.window == Window("last", n=10)
    assert g.plan.agg is None


def test_post_with_tag():
    p = zql.parse('post 43.0 TO "sensor1" where "serial" is "A001";', NOW)
    assert p == zql.Post(value=43.0, series_id="sensor1", tag=("serial", "A001"))


def test_observe_modes_and_ttl():
    o = zql.parse('observe from "sensor1" for 10s;', NOW)
    assert o.mode == "data" and o.max_age_s == 10
    # non-second units honor their multiplier (ADVICE r1)
    assert zql.parse('observe from "s" for 5 min;', NOW).max_age_s == 300
    o2 = zql.parse('observe from "sensor1" mode audit;', NOW)
    assert o2.mode == "audit" and o2.max_age_s == 0


def test_delete_range_with_filter():
    d = zql.parse('delete from "sensor1" where "serial" is "A00" range 5s to 10s;', NOW)
    assert isinstance(d, zql.Delete)
    assert d.plan.filter == ("equals", "serial", "A00")
    assert d.plan.window.op == "range"


def test_min_as_unit_is_contextual():
    # reference lexer chokes on '10min' as a time; ours is context-aware
    g = zql.parse('get from "s" since 10min;', NOW)
    assert g.plan.window == Window("since", from_ms=NOW - 600_000)


@pytest.mark.parametrize(
    "stmt",
    [
        "",
        "get;",
        'get from "s";',  # no window
        'post to "s";',  # no value
        'get from "s" last ten;',
        'observe from "s" mode video;',
        'delete from "s" last 5;',  # delete-by-count is not in the grammar
        'frobnicate from "s";',
    ],
)
def test_invalid_statements(stmt):
    with pytest.raises(BadRequest):
        zql.parse(stmt, NOW)
