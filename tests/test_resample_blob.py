"""LOCF resampling, distinct rollups, and blob JSON analytics."""

from __future__ import annotations

import pytest

from zestdb_spark.operators import blob, resample


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        ("a", 1000, 1.0),
        ("a", 2500, 2.0),
        ("a", 6000, 3.0),
        ("b", 4000, 9.0),
    ]
    return spark.createDataFrame(rows, "series_id string, timestamp long, value double")


def test_locf_grid_and_carry(series):
    out = {
        (r["series_id"], r["timestamp"]): r["value"]
        for r in resample.locf_resample(series, 0, 6000, 2000).collect()
    }
    # grid 0,2000,4000,6000; series a: obs at 1000, 2500, 6000
    assert out[("a", 0)] is None  # before first obs
    assert out[("a", 2000)] == 1.0
    assert out[("a", 4000)] == 2.0
    assert out[("a", 6000)] == 3.0  # exact-on-grid observation visible
    # series b: single obs at 4000
    assert out[("b", 0)] is None and out[("b", 2000)] is None
    assert out[("b", 4000)] == 9.0 and out[("b", 6000)] == 9.0
    assert len(out) == 8  # 4 grid points × 2 series


def test_locf_duplicate_timestamp_max_wins(spark):
    """r13 edge rule, pinned (VERDICT r13 #9): among duplicate
    (key, timestamp) observations the MAX value wins —
    deterministically, not via window order luck."""
    df = spark.createDataFrame(
        [("a", 1000, 5.0), ("a", 1000, 9.0), ("a", 1000, 1.0)],
        "series_id string, timestamp long, value double",
    )
    out = {
        r["timestamp"]: r["value"]
        for r in resample.locf_resample(df, 0, 4000, 2000).collect()
    }
    assert out[0] is None  # before the observation
    assert out[2000] == 9.0 and out[4000] == 9.0  # max of the tie carries


def test_locf_null_observation_carries(spark):
    """r13 edge rule, pinned: a NULL-valued observation carries like
    any other (ASOF semantics — latest row at-or-before the point,
    whatever its value), it is NOT skipped."""
    df = spark.createDataFrame(
        [("a", 1000, 7.0), ("a", 3000, None)],
        "series_id string, timestamp long, value double",
    )
    out = {
        r["timestamp"]: r["value"]
        for r in resample.locf_resample(df, 0, 6000, 1000).collect()
    }
    assert out[1000] == 7.0 and out[2000] == 7.0
    # from t=3000 on, the NULL observation is the latest → NULL carries
    assert out[3000] is None and out[4000] is None and out[6000] is None


def test_distinct_rollup_exact_and_approx(spark):
    rows = [("s", 1000, 1.0, "k", v) for v in ["a", "b", "a", None, "c"]]
    from zestdb_spark.schema import TS_NUMERIC

    df = spark.createDataFrame(
        [(s, t, val, tn, tv) for (s, t, val, tn, tv) in rows], TS_NUMERIC
    )
    exact = resample.distinct_rollup(df, ["series_id"], "tag_value").collect()
    assert exact[0]["n_distinct"] == 3  # NULL not counted
    approx = resample.distinct_rollup(df, ["series_id"], "tag_value", approximate=True).collect()
    assert approx[0]["n_distinct"] == 3  # tiny input → HLL is exact


@pytest.fixture(scope="module")
def blobs(spark):
    rows = [
        ("b1", 1000, '{"k": "42", "nested": {"x": 1}}'),
        ("b1", 2000, '{"k": "7"}'),
        ("b2", 1500, '{"other": true}'),
    ]
    from zestdb_spark.schema import TS_BLOB

    return spark.createDataFrame(rows, TS_BLOB).cache()


def test_blob_json_extract(blobs):
    out = {r["timestamp"]: (r["k"], r["x"]) for r in blob.json_extract(
        blobs, {"k": "$.k", "x": "$.nested.x"}).collect()}
    assert out[1000] == ("42", "1")
    assert out[2000] == ("7", None)
    assert out[1500] == (None, None)


def test_blob_json_filter_drops_missing(blobs):
    out = blob.json_filter(blobs, "$.k", "42").collect()
    assert len(out) == 1 and out[0]["timestamp"] == 1000


def test_blob_json_typed(blobs):
    out = blob.json_typed(blobs, "k STRING, nested STRUCT<x: INT>").collect()
    parsed = {r["timestamp"]: r["parsed"] for r in out}
    assert parsed[1000]["nested"]["x"] == 1
    assert parsed[1500]["k"] is None  # permissive: missing → NULL


def test_blob_keys_histogram(blobs):
    out = {r["key"]: r["n_rows"] for r in blob.json_keys_histogram(blobs, ["b1", "b2"]).collect()}
    assert out == {"k": 2, "nested": 1, "other": 1}


def test_gaps_detects_silence_and_collapses_dups(spark):
    from zestdb_spark.operators import resample

    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 0, 2.0), ("a", 500, 1.0), ("a", 5000, 1.0),
         ("b", 0, 1.0)],
        "series_id string, timestamp long, value double",
    )
    rows = [
        (r["series_id"], r["gap_start_ms"], r["gap_end_ms"], r["gap_ms"])
        for r in resample.gaps(df, 1000).collect()
    ]
    # only the 500→5000 silence exceeds 1000 ms; duplicate t=0 rows pair
    # at gap 0 and vanish; b's single observation opens no gap
    assert rows == [("a", 500, 5000, 4500)]
    import pytest as _pt

    with _pt.raises(ValueError, match="threshold_ms"):
        resample.gaps(df, 0)


# ---------------------------------------------------------------- M4 / interp / rate


def _series(spark, rows):
    return spark.createDataFrame(
        [("s1", t, float(v)) for t, v in rows],
        "series_id string, timestamp long, value double",
    )


def test_m4_keeps_only_real_points_and_extrema(spark):
    from zestdb_spark.operators.resample import m4_downsample

    rows = [(i * 100, v) for i, v in enumerate([5, 1, 9, 3, 7, 2, 8, 4, 6, 0])]
    df = _series(spark, rows)
    out = m4_downsample(df, 0, 999, 2).collect()
    got = {(r["bucket"], r["timestamp"], r["value"]) for r in out}
    # every output point is a REAL input point
    inp = {(t, float(v)) for t, v in rows}
    assert all((t, v) in inp for _, t, v in got)
    # bucket 0 = t in [0,400]: first (0,5), last (400,7), min (100,1), max (200,9)
    b0 = {(t, v) for b, t, v in got if b == 0}
    assert b0 == {(0, 5.0), (400, 7.0), (100, 1.0), (200, 9.0)}
    # bucket 1 = t in [500,900]: first (500,2), last (900,0)=min, max (600,8)
    b1 = {(t, v) for b, t, v in got if b == 1}
    assert b1 == {(500, 2.0), (900, 0.0), (600, 8.0)}
    # per-bucket global extrema preserved — the pixel-exactness property
    for b, lo, hi in [(0, 1.0, 9.0), (1, 0.0, 8.0)]:
        vs = [v for bb, _, v in got if bb == b]
        assert min(vs) == lo and max(vs) == hi


def test_m4_single_point_bucket_collapses(spark):
    from zestdb_spark.operators.resample import m4_downsample

    df = _series(spark, [(100, 42.0)])
    out = m4_downsample(df, 0, 999, 4).collect()
    assert [(r["bucket"], r["timestamp"], r["value"]) for r in out] == [
        (0, 100, 42.0)
    ]


def test_interpolate_midpoint_passthrough_and_edges(spark):
    from zestdb_spark.operators.resample import interpolate_resample

    df = _series(spark, [(1000, 10.0), (3000, 30.0)])
    out = {
        r["timestamp"]: r["value"]
        for r in interpolate_resample(df, 0, 4000, 1000).collect()
    }
    assert out[1000] == 10.0 and out[3000] == 30.0  # observations pass through
    assert out[2000] == 20.0  # linear midpoint
    assert out[0] is None and out[4000] is None  # no extrapolation


def test_counter_rate_reset_and_dup_handling(spark):
    from zestdb_spark.operators.resample import counter_rate

    # 0 → 10 over 2 s (rate 5/s), reset to 4 over 1 s (delta = post-reset
    # value 4 → 4/s), duplicate timestamp contributes nothing
    df = _series(spark, [(0, 0.0), (2000, 10.0), (2000, 10.0), (3000, 4.0)])
    out = {(r["timestamp"]): r["rate_per_s"] for r in counter_rate(df).collect()}
    assert out == {2000: 5.0, 3000: 4.0}
