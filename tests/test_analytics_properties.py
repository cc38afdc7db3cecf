"""Property-based tests for the round-6 analytics operators: each
Spark operator must agree with a direct Python model on arbitrary
small generated inputs — interval containment, funnel step matching,
retention bucketing, and the weighted-sample ranking law."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as st

from zestdb_spark.functions import corpus_ops
from zestdb_spark.operators import funnel as fl
from zestdb_spark.operators.interval import interval_join

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# tight domains force bucket-edge and tie coverage
_pts = st.lists(
    st.tuples(st.integers(0, 30), st.integers(-50, 50)), min_size=0, max_size=12
)
_ivs = st.lists(
    st.tuples(st.integers(0, 15), st.integers(-50, 50), st.integers(-50, 50)),
    min_size=0,
    max_size=8,
)


@given(pts=_pts, ivs=_ivs, bucket=st.sampled_from([1, 3, 7, 100]))
@_SETTINGS
def test_interval_join_equals_naive(spark, pts, ivs, bucket):
    pdf = spark.createDataFrame(pts, "pid long, timestamp long") if pts else \
        spark.createDataFrame([], "pid long, timestamp long")
    idf = spark.createDataFrame(ivs, "iid long, start_ms long, end_ms long") if ivs else \
        spark.createDataFrame([], "iid long, start_ms long, end_ms long")
    got = sorted(
        (r["pid"], r["timestamp"], r["iid"])
        for r in interval_join(pdf, idf, bucket_ms=bucket).collect()
    )
    want = sorted(
        (pid, t, iid)
        for (pid, t) in pts
        for (iid, s, e) in ivs
        if s <= t <= e
    )
    assert got == want


_evs = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.integers(0, 40),
        st.sampled_from(["a", "b", "c", "x"]),
    ),
    min_size=0,
    max_size=16,
)


def _model_funnel(rows, steps, within):
    out = {}
    by_user: dict[int, list[tuple[int, str]]] = {}
    for (u, t, s) in rows:
        by_user.setdefault(u, []).append((t, s))
    for u, evs in by_user.items():
        firsts = [t for (t, s) in evs if s == steps[0]]
        if not firsts:
            continue
        t1 = min(firsts)
        prev, done, t_end = t1, 1, t1
        for step in steps[1:]:
            cand = [t for (t, s) in evs if s == step and t > prev and t <= t1 + within]
            if not cand:
                break
            prev = min(cand)
            done += 1
            t_end = prev
        out[u] = (done, t1, t_end)
    return out


@given(rows=_evs, within=st.sampled_from([1, 5, 20, 100]))
@_SETTINGS
def test_funnel_matches_model(spark, rows, within):
    df = spark.createDataFrame(rows, "user_id long, timestamp long, event_type string") \
        if rows else spark.createDataFrame([], "user_id long, timestamp long, event_type string")
    got = {
        r["user_id"]: (r["steps_completed"], r["t_start"], r["t_end"])
        for r in fl.funnel(df, ["a", "b", "c"], within).collect()
    }
    assert got == _model_funnel(rows, ["a", "b", "c"], within)


@given(
    rows=st.lists(st.tuples(st.integers(0, 4), st.integers(-30, 30)), max_size=16),
    bucket=st.sampled_from([3, 7, 10]),
)
@_SETTINGS
def test_retention_matches_model(spark, rows, bucket):
    df = spark.createDataFrame(rows, "user_id long, timestamp long") if rows else \
        spark.createDataFrame([], "user_id long, timestamp long")
    got = {
        (r["cohort_ms"], r["period"]): r["n_users"]
        for r in fl.retention_cohorts(df, bucket_ms=bucket).collect()
    }
    first = {}
    for (u, t) in rows:
        first[u] = min(first.get(u, t), t)
    want: dict[tuple[int, int], set] = {}
    for (u, t) in rows:
        c = first[u] - (first[u] % bucket)
        b = t - (t % bucket)
        want.setdefault((c, (b - c) // bucket), set()).add(u)
    assert got == {k: len(v) for k, v in want.items()}


@given(
    weights=st.lists(st.sampled_from([0.5, 1.0, 3.0, 10.0]), min_size=1, max_size=12),
    k=st.integers(1, 6),
)
@_SETTINGS
def test_weighted_sample_matches_model(spark, weights, k):
    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [r["doc_id"] for r in corpus_ops.weighted_sample(df, "w", k).collect()]

    def key(i, w):
        h = int(__import__("hashlib").md5(str(i).encode()).hexdigest()[:15], 16)
        u = (h + 0.5) / float(1 << 60)
        return math.floor(math.log(u) / w * 1e6) / 1e6

    want = sorted(rows, key=lambda t: (-key(*t), t[0]))[:k]
    assert got == [i for (i, _) in want]
