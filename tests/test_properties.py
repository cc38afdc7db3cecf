"""Property-based tests (hypothesis) for the semantics SURVEY.md §7.4
flags as the hard parts: per-series top-k, inclusive bounds, tie
determinism, delete-as-complement, and filter/aggregate laws.

The Python model is the OCaml reference re-expressed over plain lists;
Spark must agree on arbitrary generated series.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st

from zestdb_spark.operators import ts_filter, ts_read
from zestdb_spark.plans import compile_path
from zestdb_spark.operators.ts_delete import delete_plan
from zestdb_spark.schema import TS_NUMERIC

# small domains force collisions in timestamps and values (tie coverage)
_row = st.tuples(
    st.sampled_from(["s1", "s2", "s3"]),
    st.integers(min_value=0, max_value=5).map(lambda x: x * 1000),
    st.sampled_from([1.0, 2.0, -1.5]),
    st.sampled_from([None, "room", "unit"]),
).map(
    lambda t: (t[0], t[1], t[2], t[3], None if t[3] is None else f"v{int(t[2])}")
)

_rows = st.lists(_row, min_size=0, max_size=25)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _df(spark, rows):
    return spark.createDataFrame(rows, TS_NUMERIC) if rows else spark.createDataFrame([], TS_NUMERIC)


@given(rows=_rows, n=st.integers(min_value=0, max_value=6))
@_SETTINGS
def test_last_n_is_per_series_top_n(spark, rows, n):
    got = [tuple(r) for r in ts_read.read_last(_df(spark, rows), ["s1", "s2"], n).collect()]
    # model: per series, the n largest by the total order
    expected: list[tuple] = []
    for sid in ("s1", "s2"):
        series = [r for r in rows if r[0] == sid]
        key = lambda r: (
            r[1],
            r[2],
            (r[3] is not None, r[3] or ""),
            (r[4] is not None, r[4] or ""),
        )
        expected.extend(sorted(series, key=key, reverse=True)[:n])
    assert Counter(got) == Counter(expected)


@given(rows=_rows, t1=st.integers(0, 5), t2=st.integers(0, 5))
@_SETTINGS
def test_range_inclusive_model(spark, rows, t1, t2):
    lo, hi = t1 * 1000, t2 * 1000
    got = ts_read.read_range(_df(spark, rows), ["s1", "s2", "s3"], lo, hi).collect()
    expected = [r for r in rows if lo <= r[1] <= hi]
    assert Counter(tuple(r) for r in got) == Counter(expected)


@given(rows=_rows, t=st.integers(0, 5))
@_SETTINGS
def test_since_union_range_partition(spark, rows, t):
    """since(t) == range(t, max) ∪ nothing-else; and length == count."""
    df = _df(spark, rows)
    ids = ["s1", "s2", "s3"]
    since = ts_read.read_since(df, ids, t * 1000).collect()
    expected = [r for r in rows if r[1] >= t * 1000]
    assert Counter(tuple(r) for r in since) == Counter(expected)
    assert ts_read.ts_length(df, ids).collect()[0]["length"] == len(rows)


@given(rows=_rows)
@_SETTINGS
def test_filter_partitions_rows(spark, rows):
    """equals(tag,v) + its complement-by-semantics == windowed set:
    matching rows have the tag; all others are dropped (incl. untagged)."""
    df = _df(spark, rows)
    got = ts_filter.tag_equals(df, "room", "v1").collect()
    expected = [r for r in rows if r[3] == "room" and r[4] == "v1"]
    assert Counter(tuple(r) for r in got) == Counter(expected)


@given(rows=_rows, t1=st.integers(0, 5), t2=st.integers(0, 5))
@_SETTINGS
def test_delete_is_complement_of_read(spark, rows, t1, t2):
    """survivors(delete range) == all − read(range) for the same plan."""
    df = _df(spark, rows)
    lo, hi = t1 * 1000, t2 * 1000
    plan = compile_path(f"/ts/s1,s2/range/{lo}/{hi}")
    survivors = Counter(tuple(r) for r in delete_plan(df, plan).collect())
    matched = Counter(
        tuple(r) for r in ts_read.read_range(df, ["s1", "s2"], lo, hi).collect()
    )
    assert survivors + matched == Counter(rows)


@given(rows=_rows)
@_SETTINGS
def test_latest_is_deterministic(spark, rows):
    """two runs of latest over shuffled input pick identical rows."""
    df1 = _df(spark, rows).repartition(7)
    df2 = _df(spark, list(reversed(rows))).repartition(3)
    a = sorted(tuple(r) for r in ts_read.read_latest(df1, ["s1", "s2", "s3"]).collect())
    b = sorted(tuple(r) for r in ts_read.read_latest(df2, ["s1", "s2", "s3"]).collect())
    assert a == b


# ------------------------------------------------- front-end round trips

from zestdb_spark.plans.paths import plan_to_path  # noqa: E402
from zestdb_spark.plans.plan import QueryPlan, Window as PWindow  # noqa: E402

_ids = st.lists(
    st.text(alphabet="abcdefgh012", min_size=1, max_size=6), min_size=1, max_size=3
).map(tuple)
_windows = st.one_of(
    st.just(PWindow("latest")),
    st.just(PWindow("earliest")),
    st.just(PWindow("length")),
    st.integers(1, 10**6).map(lambda n: PWindow("last", n=n)),
    st.integers(1, 10**6).map(lambda n: PWindow("first", n=n)),
    st.integers(0, 10**13).map(lambda t: PWindow("since", from_ms=t)),
    st.tuples(st.integers(0, 10**13), st.integers(0, 10**13)).map(
        lambda t: PWindow("range", from_ms=t[0], to_ms=t[1])
    ),
)
_filters = st.one_of(
    st.none(),
    st.tuples(
        st.sampled_from(["equals", "contains"]),
        st.text(alphabet="abcxyz", min_size=1, max_size=5),
        st.text(alphabet="abcxyz0189", min_size=1, max_size=6),
    ),
)
_aggs = st.sampled_from([None, "sum", "count", "min", "max", "mean", "median", "sd"])


@given(ids=_ids, window=_windows, filt=_filters, agg=_aggs)
@settings(max_examples=200, deadline=None)
def test_path_round_trip(ids, window, filt, agg):
    if window.op == "length":
        filt, agg = None, None
    plan = QueryPlan(ids=ids, window=window, filter=filt, agg=agg)
    assert compile_path(plan_to_path(plan)) == plan
