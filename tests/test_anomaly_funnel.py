"""Hand-computable invariants for the anomaly detectors (z-score /
MAD) and the ordered-funnel operator; the driver's DuckDB oracle pins
engine parity, these pin the semantics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from zestdb_spark.operators import anomaly, funnel


def _ts(spark, rows):
    return spark.createDataFrame(
        rows, "series_id string, timestamp long, value double"
    )


def test_zscore_flags_the_spike(spark):
    rows = [("a", i, 10.0) for i in range(10)] + [("a", 10, 1000.0)]
    out = {r["timestamp"]: r for r in anomaly.zscore_outliers(_ts(spark, rows)).collect()}
    assert out[10]["is_outlier"] and out[10]["z"] > 3
    assert not out[0]["is_outlier"]
    # z of the 10 identical baseline points is negative but small
    assert out[0]["z"] < 0


def test_zscore_degenerate_series_never_flag(spark):
    rows = [("solo", 0, 5.0), ("flat", 0, 7.0), ("flat", 1, 7.0), ("flat", 2, 7.0)]
    out = anomaly.zscore_outliers(_ts(spark, rows)).collect()
    assert all(r["z"] is None and not r["is_outlier"] for r in out)


def test_zscore_exact_value(spark):
    # values 1..5: mean 3, sample sd sqrt(2.5)
    rows = [("s", i, float(i)) for i in range(1, 6)]
    out = {r["value"]: r["z"] for r in anomaly.zscore_outliers(_ts(spark, rows)).collect()}
    q6 = lambda x: math.floor(x * 1e6) / 1e6
    sd = math.sqrt(2.5)
    assert out[5.0] == q6(2.0 / sd)
    assert out[3.0] == q6(0.0)


def test_mad_robust_to_the_outlier_it_flags(spark):
    # 10 baseline points + extreme spike: MAD ignores the spike
    rows = [("a", i, 10.0 + (i % 3)) for i in range(10)] + [("a", 99, 500.0)]
    out = {r["timestamp"]: r for r in anomaly.mad_outliers(_ts(spark, rows)).collect()}
    assert out[99]["is_outlier"]
    assert not out[0]["is_outlier"]


def test_mad_zero_mad_never_flags(spark):
    rows = [("flat", i, 4.0) for i in range(5)] + [("flat", 9, 9.0)]
    # over half identical → MAD 0 → no flags, scores NULL
    out = anomaly.mad_outliers(_ts(spark, rows)).collect()
    assert all(r["score"] is None and not r["is_outlier"] for r in out)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, timestamp long, event_type string"
    )


def test_funnel_orders_and_window(spark):
    W = 100
    rows = [
        # u1 completes all three in order inside the window
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # u2 clicks BEFORE viewing — stuck at step 1
        (2, 20, "click"), (2, 30, "view"),
        # u3 purchases outside the window of the first view
        (3, 10, "view"), (3, 20, "click"), (3, 200, "purchase"),
        # u4 never views — absent from the result
        (4, 10, "click"), (4, 20, "purchase"),
    ]
    out = {
        r["user_id"]: r
        for r in funnel.funnel(_ev(spark, rows), ["view", "click", "purchase"], W).collect()
    }
    assert set(out) == {1, 2, 3}
    assert (out[1]["steps_completed"], out[1]["t_start"], out[1]["t_end"]) == (3, 10, 30)
    assert out[2]["steps_completed"] == 1
    assert (out[3]["steps_completed"], out[3]["t_end"]) == (2, 20)


def test_funnel_strict_order_and_greedy_first(spark):
    rows = [
        # same-timestamp step 2 does NOT count (strictly after)
        (1, 10, "view"), (1, 10, "click"),
        # u2: the FIRST view anchors the window even though a later
        # view would let the purchase fit
        (2, 10, "view"), (2, 500, "view"), (2, 510, "click"), (2, 520, "purchase"),
    ]
    out = {
        r["user_id"]: r["steps_completed"]
        for r in funnel.funnel(_ev(spark, rows), ["view", "click", "purchase"], 100).collect()
    }
    assert out[1] == 1
    assert out[2] == 1


def test_funnel_validation(spark):
    ev = _ev(spark, [(1, 1, "view")])
    with pytest.raises(ValueError, match="at least 2"):
        funnel.funnel(ev, ["view"], 100)
    with pytest.raises(ValueError, match="positive"):
        funnel.funnel(ev, ["view", "click"], 0)


# -------------------------------------------------- retention + profiling

def test_retention_cohorts_matrix(spark):
    B = 100  # bucket
    rows = [
        # u1 first in bucket 0, back in periods 1 and 3
        (1, 10), (1, 150), (1, 320),
        # u2 first in bucket 1, never back
        (2, 120),
        # u3 first in bucket 0, back in period 1
        (3, 90), (3, 110),
    ]
    ev = spark.createDataFrame(rows, "user_id long, timestamp long")
    from zestdb_spark.operators.funnel import retention_cohorts

    got = {
        (r["cohort_ms"], r["period"]): r["n_users"]
        for r in retention_cohorts(ev, bucket_ms=B).collect()
    }
    assert got == {(0, 0): 2, (0, 1): 2, (0, 3): 1, (100, 0): 1}


def test_profile_counts_and_types(spark):
    from zestdb_spark.functions.profile import profile

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, -0.5), (2, "b", None)],
        "k long, s string, v double",
    )
    rows = {r["column"]: r for r in profile(df).collect()}
    assert rows["k"]["n"] == 3 and rows["k"]["n_distinct"] == 2
    assert rows["s"]["n_null"] == 1 and rows["s"]["min_str"] == "a"
    assert rows["v"]["n_null"] == 1 and rows["v"]["min_num"] == -0.5
    assert rows["k"]["min_num"] == 1.0 and rows["k"]["max_num"] == 2.0
    assert rows["v"]["min_str"] is None  # numeric column: no string stats
    # subset + validation
    assert profile(df, ["k"]).count() == 1
    import pytest as _pt

    with _pt.raises(ValueError, match="unknown columns"):
        profile(df, ["nope"])


def test_zscore_constant_series_off_grid_value(spark):
    """Regression: a constant series whose square is off the 1e-6 q6
    grid makes the computed variance slightly NEGATIVE — the guard
    must fire on var > 0 (sqrt of it is NaN in Spark / an error in
    DuckDB), yielding NULL z, never 0.0 or a crash."""
    rows = [("c", i, 1.234567) for i in range(5)]
    out = anomaly.zscore_outliers(_ts(spark, rows)).collect()
    assert all(r["z"] is None and not r["is_outlier"] for r in out)


# ------------------------------------------------------------------ pivot

def test_pivot_counts_and_sums(spark):
    from zestdb_spark.operators import pivot

    df = spark.createDataFrame(
        [("u1", "view", 1.0), ("u1", "view", 2.0), ("u1", "click", 5.0),
         ("u2", "view", 3.0), ("u2", "other", 9.0)],
        "user string, ev string, value double",
    )
    rows = {
        r["user"]: r
        for r in pivot.pivot_counts(df, ["user"], "ev", ["view", "click"]).collect()
    }
    assert (rows["u1"]["n_view"], rows["u1"]["n_click"]) == (2, 1)
    assert (rows["u2"]["n_view"], rows["u2"]["n_click"]) == (1, 0)
    sums = {
        r["user"]: r
        for r in pivot.pivot_sum(df, ["user"], "ev", ["view", "click"]).collect()
    }
    assert sums["u1"]["sum_view"] == 3.0 and sums["u1"]["sum_click"] == 5.0
    assert sums["u2"]["sum_click"] is None  # never occurred ≠ 0.0
    import pytest as _pt

    with _pt.raises(ValueError, match="non-empty"):
        pivot.pivot_counts(df, ["user"], "ev", [])


def test_histogram_edges_and_overflow(spark):
    from zestdb_spark.functions.profile import histogram

    df = spark.createDataFrame(
        [(x,) for x in [-5.0, 0.0, 0.5, 9.99, 10.0, 25.0, None]], "v double"
    )
    rows = {r["bucket"]: r for r in histogram(df, "v", 0.0, 10.0, 10).collect()}
    assert rows[-1]["n"] == 1        # below range
    assert rows[0]["n"] == 2         # 0.0 and 0.5
    assert rows[9]["n"] == 1         # 9.99
    assert rows[10]["n"] == 2        # 10.0 (hi is exclusive) and 25.0
    assert sum(r["n"] for r in rows.values()) == 6  # NULL excluded
    assert rows[0]["lo_edge"] == 0.0 and rows[0]["hi_edge"] == 1.0
    import pytest as _pt

    with _pt.raises(ValueError, match="hi > lo"):
        histogram(df, "v", 5.0, 5.0)


def test_histogram_inexact_width_keeps_in_range_values_in_range(spark):
    """width=(hi−lo)/nbins is inexact for hi=0.1: floor(x/width) hits
    nbins for x just below hi — the clamp must keep every x < hi out of
    the overflow bucket (bucket nbins is reserved for x ≥ hi)."""
    from zestdb_spark.functions.profile import histogram

    x = 0.09999999999999999  # < 0.1, but floor(x / (0.1/3)) == 3
    df = spark.createDataFrame([(x,), (0.1,)], "v double")
    rows = {r["bucket"]: r["n"] for r in histogram(df, "v", 0.0, 0.1, 3).collect()}
    assert rows.get(2) == 1      # in-range value stays in the top bin
    assert rows.get(3) == 1      # only x ≥ hi overflows


def test_histogram_equi_depth_balanced_counts(spark):
    from zestdb_spark.functions.profile import histogram_equi_depth

    # 0..15 → 4 buckets of exactly 4; boundary values (the cut points)
    # land in the UPPER bucket (bucket = #cuts ≤ x)
    df = spark.createDataFrame([(float(i),) for i in range(16)], "v double")
    rows = {r["bucket"]: r for r in histogram_equi_depth(df, "v", 4).collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    assert [rows[b]["n"] for b in range(4)] == [4, 4, 4, 4]
    # observed edges: bucket 0 spans the true min; bucket 3 the true max
    assert rows[0]["lo_edge"] == 0.0 and rows[3]["hi_edge"] == 15.0
    # edges never overlap between adjacent buckets
    for b in range(3):
        assert rows[b]["hi_edge"] < rows[b + 1]["lo_edge"]


def test_histogram_equi_depth_skew_and_sampled_cuts(spark):
    from zestdb_spark.functions.profile import histogram_equi_depth

    # heavy skew: 90 copies of one value + a thin tail. A fixed-width
    # histogram puts ~everything in one bin; equi-depth still emits a
    # hot bucket but every row is counted exactly once
    rows_in = [(i, 5.0) for i in range(90)] + [(90 + i, float(100 + i)) for i in range(10)]
    df = spark.createDataFrame(rows_in, "id long, v double")
    out = histogram_equi_depth(df, "v", 4).collect()
    assert sum(r["n"] for r in out) == 100
    # the sampled-cuts scale path: cuts from the md5 sample, assignment
    # over ALL rows — total count is exact regardless of the sample
    sampled = histogram_equi_depth(
        df, "v", 4, sample_key=["id"], rate_bits=2
    ).collect()
    assert sum(r["n"] for r in sampled) == 100
    # NULLs excluded; empty input yields no rows
    with_null = spark.createDataFrame([(1, None)], "id long, v double")
    assert histogram_equi_depth(with_null, "v", 4).count() == 0
    import pytest as _pt

    with _pt.raises(ValueError, match="nbins"):
        histogram_equi_depth(df, "v", 0)


def test_pivot_counts_all_null_category_group_is_zero(spark):
    """A group whose col_key values are all NULL gets 0, not NULL —
    matching the SQL oracle's CASE ... ELSE 0 semantics."""
    from zestdb_spark.operators import pivot

    df = spark.createDataFrame(
        [("u1", None, 1.0), ("u1", None, 2.0), ("u2", "view", 3.0)],
        "user string, ev string, value double",
    )
    rows = {
        r["user"]: r
        for r in pivot.pivot_counts(df, ["user"], "ev", ["view"]).collect()
    }
    assert rows["u1"]["n_view"] == 0
    assert rows["u2"]["n_view"] == 1


def test_pivot_sanitized_label_collision_raises(spark):
    """'a-b' and 'a_b' both sanitize to a_b — duplicate output columns
    resolve ambiguously later, so the pivot must refuse up front."""
    from zestdb_spark.operators import pivot
    import pytest as _pt

    df = spark.createDataFrame([("u", "a-b", 1.0)], "user string, ev string, value double")
    with _pt.raises(ValueError, match="collide"):
        pivot.pivot_counts(df, ["user"], "ev", ["a-b", "a_b"])
    with _pt.raises(ValueError, match="collide"):
        pivot.pivot_sum(df, ["user"], "ev", ["a-b", "a_b"])


def test_top_k_values_exact_with_deterministic_ties(spark):
    from zestdb_spark.functions.profile import top_k_values
    import pytest as _pt

    df = spark.createDataFrame(
        [("b",), ("b",), ("a",), ("a",), ("c",), (None,)], "v string"
    )
    rows = [(r["value"], r["n"]) for r in top_k_values(df, "v", 2).collect()]
    # counts tie at 2 → value ASC breaks it; NULL never counted
    assert rows == [("a", 2), ("b", 2)]
    with _pt.raises(ValueError, match="k must be"):
        top_k_values(df, "v", 0)
