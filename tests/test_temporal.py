"""Temporal operators: as-of join, sessionization, time-bucket rollup."""

from __future__ import annotations

import pytest

from zestdb_spark.operators import temporal


@pytest.fixture(scope="module")
def quotes(spark):
    # right side of the asof: (key, ts, value)
    rows = [
        ("a", 100, 1.0),
        ("a", 200, 2.0),
        ("a", 300, 3.0),
        ("b", 150, 9.0),
    ]
    return spark.createDataFrame(rows, "series_id string, timestamp long, value double")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        ("a", 99, 10.0),   # before any quote → NULL
        ("a", 100, 11.0),  # exact match → 1.0
        ("a", 250, 12.0),  # between → 2.0
        ("a", 900, 13.0),  # after all → 3.0
        ("b", 500, 14.0),  # → 9.0
        ("c", 100, 15.0),  # key with no quotes → NULL
    ]
    return spark.createDataFrame(rows, "series_id string, timestamp long, value double")


def test_asof_join_backward_semantics(trades, quotes):
    out = {
        (r["series_id"], r["timestamp"]): r["value_right"]
        for r in temporal.asof_join(trades, quotes).collect()
    }
    assert out[("a", 99)] is None
    assert out[("a", 100)] == 1.0  # exact timestamps match (<=)
    assert out[("a", 250)] == 2.0
    assert out[("a", 900)] == 3.0
    assert out[("b", 500)] == 9.0
    assert out[("c", 100)] is None


def test_asof_join_preserves_left_rows(trades, quotes):
    assert temporal.asof_join(trades, quotes).count() == trades.count()


def test_sessionize_gap_breaks(spark):
    rows = [
        ("s", 0, 1.0, None, None),
        ("s", 1000, 2.0, None, None),
        ("s", 2000, 3.0, None, None),
        ("s", 60_000, 4.0, None, None),  # > 10s gap → new session
        ("s", 61_000, 5.0, None, None),
        ("t", 0, 6.0, None, None),  # separate key → own sessions
    ]
    from zestdb_spark.schema import TS_NUMERIC

    df = spark.createDataFrame(rows, TS_NUMERIC)
    out = {
        (r["series_id"], r["timestamp"]): r["session_id"]
        for r in temporal.sessionize(df, gap_ms=10_000).collect()
    }
    assert out[("s", 0)] == 0 and out[("s", 1000)] == 0 and out[("s", 2000)] == 0
    assert out[("s", 60_000)] == 1 and out[("s", 61_000)] == 1
    assert out[("t", 0)] == 0


def test_sessionize_chunked_matches_classic(spark):
    """The parallel chunked formulation must be BIT-IDENTICAL to the
    classic key-partitioned window for every chunk width — boundary
    gaps, boundary continuations, equal-timestamp ties, pre-1970
    timestamps, NULL keys / NULL timestamps, and multi-key
    interleaving all included."""
    import random

    rng = random.Random(7)
    rows = []
    for key in ("a", "b", "hot"):
        t = -50_000  # pre-1970 start exercises floor chunking
        n = 400 if key == "hot" else 60
        for i in range(n):
            # mix sub-gap steps, exact-gap steps (NOT a break: the
            # contract is strict >), breaks, and repeated timestamps
            step = rng.choice([0, 500, 10_000, 10_001, 60_000])
            t += step
            rows.append((key, t, float(i), None, None))
    # NULL key column → its own partition in the classic formulation;
    # NULL timestamp → NULL chunk; both must survive the chunked
    # offset join (null-safe keys), not be silently dropped.
    rows += [
        (None, 100, 900.0, None, None),
        (None, 25_000, 901.0, None, None),
        ("a", None, 902.0, None, None),
        (None, None, 903.0, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "series_id string, timestamp long, value double,"
        " tag_name string, tag_value string",
    )
    classic = {
        (r["series_id"], r["timestamp"], r["value"]): r["session_id"]
        for r in temporal.sessionize(df, gap_ms=10_000).collect()
    }
    for chunk_ms in (1, 7_000, 10_000, 100_000, 10**12):
        got = {
            (r["series_id"], r["timestamp"], r["value"]): r["session_id"]
            for r in temporal.sessionize(
                df, gap_ms=10_000, chunk_ms=chunk_ms
            ).collect()
        }
        assert got == classic, f"chunk_ms={chunk_ms} diverged"
    with pytest.raises(ValueError, match="chunk_ms"):
        temporal.sessionize(df, gap_ms=10_000, chunk_ms=0)


def test_session_stats(spark):
    from zestdb_spark.schema import TS_NUMERIC

    rows = [
        ("s", 0, 1.0, None, None),
        ("s", 5_000, 2.0, None, None),
        ("s", 100_000, 4.0, None, None),
    ]
    df = spark.createDataFrame(rows, TS_NUMERIC)
    stats = {
        r["session_id"]: (r["n_rows"], r["duration_ms"], r["sum_value"])
        for r in temporal.session_stats(df, gap_ms=10_000).collect()
    }
    assert stats[0] == (2, 5_000, 3.0)
    assert stats[1] == (1, 0, 4.0)


def test_rollup_time_bucket(spark):
    from zestdb_spark.schema import TS_NUMERIC

    rows = [
        ("s", 0, 1.0, None, None),
        ("s", 1800_000, 3.0, None, None),  # same hour
        ("s", 3600_000, 5.0, None, None),  # next hour
    ]
    df = spark.createDataFrame(rows, TS_NUMERIC)
    out = {
        r["bucket_ms"]: (r["n"], r["sum_value"], r["min_value"], r["max_value"], r["mean_value"])
        for r in temporal.rollup_time_bucket(df, bucket_ms=3_600_000).collect()
    }
    assert out[0] == (2, 4.0, 1.0, 3.0, 2.0)
    assert out[3_600_000] == (1, 5.0, 5.0, 5.0, 5.0)


def test_rollup_quantiles(ts):
    from zestdb_spark.operators import temporal

    rows = temporal.rollup_quantiles(ts, bucket_ms=10_000, probs=(0.5, 0.95)).collect()
    by_key = {(r["series_id"], r["bucket_ms"]): r for r in rows}
    # sensor1 rows all in bucket 0: values 1.0, 2.5, 43.0, 7.0, -1.5
    r = by_key[("sensor1", 0)]
    assert r["n"] == 5 and r["p50"] == 2.5
    # p95 of 5 sorted values [-1.5, 1, 2.5, 7, 43]: idx 0.95*4=3.8 → 7 + 0.8*36 = 35.8
    assert abs(r["p95"] - 35.8) < 1e-9
    # single-row series: both quantiles equal the value
    s = by_key[("single", 0)]
    assert s["p50"] == 99.0 and s["p95"] == 99.0


# ---------------------------------------------------------- rollup_sliding

def test_sliding_rollup_fanout_and_values(spark):
    from zestdb_spark.operators import temporal

    rows = [("a", 0, 1.0), ("a", 1500, 2.0), ("a", 2500, 4.0)]
    df = spark.createDataFrame(rows, "series_id string, timestamp long, value double")
    out = {
        r["bucket_ms"]: r
        for r in temporal.rollup_sliding(df, 2000, 1000).collect()
    }
    # ts=0 → windows starting −1000, 0; ts=1500 → 0, 1000; ts=2500 → 1000, 2000
    assert set(out) == {-1000, 0, 1000, 2000}
    assert out[0]["n"] == 2 and out[0]["sum_value"] == 3.0
    assert out[1000]["n"] == 2 and out[1000]["max_value"] == 4.0
    assert out[-1000]["n"] == 1
    # every row lands in exactly window/slide = 2 windows
    assert sum(r["n"] for r in out.values()) == 2 * len(rows)


def test_sliding_rollup_validation(spark):
    from zestdb_spark.operators import temporal

    df = spark.createDataFrame([("a", 0, 1.0)], "series_id string, timestamp long, value double")
    with pytest.raises(ValueError, match="multiple"):
        temporal.rollup_sliding(df, 2500, 1000)
    with pytest.raises(ValueError, match="positive"):
        temporal.rollup_sliding(df, 1000, 0)


# ----------------------------------------------------------- interval_join

def test_interval_join_containment(spark):
    from zestdb_spark.operators.interval import interval_join

    pts = spark.createDataFrame(
        [(1, 50), (2, 150), (3, 250), (4, 1000)], "pid long, timestamp long"
    )
    ivs = spark.createDataFrame(
        [
            (10, 0, 100),      # catches p1
            (11, 100, 300),    # catches p2, p3
            (12, 40, 260),     # catches p1, p2, p3 (overlapping interval)
            (13, 400, 300),    # inverted — matches nothing
        ],
        "iid long, start_ms long, end_ms long",
    )
    # tiny bucket forces multi-bucket interval replication; results
    # must be bucket-size-invariant
    for bucket in (10, 1000, 7):
        got = sorted(
            (r["pid"], r["iid"])
            for r in interval_join(pts, ivs, bucket_ms=bucket).collect()
        )
        assert got == [(1, 10), (1, 12), (2, 11), (2, 12), (3, 11), (3, 12)]


def test_interval_join_inclusive_ends_and_validation(spark):
    from zestdb_spark.operators.interval import interval_join

    pts = spark.createDataFrame([(1, 100), (2, 200)], "pid long, timestamp long")
    ivs = spark.createDataFrame([(9, 100, 200)], "iid long, start_ms long, end_ms long")
    got = sorted(r["pid"] for r in interval_join(pts, ivs).collect())
    assert got == [1, 2]  # both ends inclusive
    with pytest.raises(ValueError, match="positive"):
        interval_join(pts, ivs, bucket_ms=0)
    bad = spark.createDataFrame([(9, 1, 2)], "pid long, start_ms long, end_ms long")
    with pytest.raises(ValueError, match="colliding"):
        interval_join(pts, bad)


# ------------------------------------------------------------ moving_stats

def test_moving_stats_trailing_window(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 6.0), ("b", 1, 10.0)],
        "series_id string, timestamp long, value double",
    )
    out = {
        (r["series_id"], r["timestamp"]): r
        for r in temporal.moving_stats(df, 2).collect()
    }
    assert out[("a", 1)]["mov_avg"] == 1.0
    assert out[("a", 2)]["mov_avg"] == 1.5
    assert out[("a", 3)]["mov_avg"] == 4.0 and out[("a", 3)]["mov_min"] == 2.0
    assert out[("b", 1)]["mov_avg"] == 10.0  # series isolated
    with pytest.raises(ValueError, match="n must be"):
        temporal.moving_stats(df, 0)


def test_moving_stats_tie_determinism(spark):
    # duplicate timestamps: the (timestamp, value) total order pins
    # which row is "previous", so results are stable across runs
    df = spark.createDataFrame(
        [("a", 5, 3.0), ("a", 5, 1.0), ("a", 6, 2.0)],
        "series_id string, timestamp long, value double",
    )
    a = sorted(map(tuple, temporal.moving_stats(df, 2).collect()))
    b = sorted(map(tuple, temporal.moving_stats(df, 2).collect()))
    assert a == b
    by_val = {r[2]: r for r in a}
    # order is (ts, value) asc → 1.0 comes first (window of itself),
    # 3.0 trails it: (1.0 + 3.0)/2
    assert by_val[1.0][3] == 1.0
    assert by_val[3.0][3] == 2.0


def test_moving_stats_null_value_orders_last(spark):
    """NULL value at a duplicate timestamp sorts LAST — Spark's bare
    asc() would put it first while the SQL oracle's ORDER BY ... ASC is
    NULLS LAST, silently shifting every trailing frame between engines."""
    df = spark.createDataFrame(
        [("a", 1000, None), ("a", 1000, 5.0), ("a", 2000, 7.0)],
        "series_id string, timestamp long, value double",
    )
    rows = temporal.moving_stats(df, 2).collect()
    # engine total order must be [5.0, NULL, 7.0]
    avgs = [r["mov_avg"] for r in sorted(
        rows, key=lambda r: (r["timestamp"], r["value"] is None, r["value"] or 0.0)
    )]
    # frames: [5.0] → 5.0; [5.0, NULL] → 5/2; [NULL, 7.0] → 7/2
    assert avgs == [5.0, 2.5, 3.5]


def test_moving_stats_time_range_frame(spark):
    """Time frames follow the clock: [t−w, t] inclusive; duplicate
    timestamps share one frame (tie-insensitive, unlike row frames)."""
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 1000, 2.0), ("a", 1000, 4.0), ("a", 2000, 8.0)],
        "series_id string, timestamp long, value double",
    )
    out = temporal.moving_stats_time(df, 1000)
    rows = sorted(
        [(r["timestamp"], r["value"], r["mov_avg"], r["mov_n"]) for r in out.collect()]
    )
    # t=0: frame {1.0}; t=1000 (both rows): frame {1.0,2.0,4.0} → 7/3;
    # t=2000: frame {2.0,4.0,8.0} (0 ms row fell out) → 14/3
    assert rows[0] == (0, 1.0, 1.0, 1)
    assert rows[1][2] == rows[2][2] == 2.333333 and rows[1][3] == 3
    assert rows[3] == (2000, 8.0, 4.666666, 3)
    import pytest as _pt

    with _pt.raises(ValueError, match="window_ms"):
        temporal.moving_stats_time(df, 0)


def test_series_delta_first_row_and_dup_ts(spark):
    df = spark.createDataFrame(
        [("a", 1000, 3.0), ("a", 1000, 5.0), ("a", 3000, 6.0), ("b", 0, 9.0)],
        "series_id string, timestamp long, value double",
    )
    rows = sorted(
        [(r["series_id"], r["timestamp"], r["value"], r["dt_ms"], r["dv"],
          r["rate_per_s"]) for r in temporal.series_delta(df).collect()]
    )
    # first row of each series: all NULL deltas
    assert rows[0][3:] == (None, None, None)          # (a,1000,3.0)
    # duplicate timestamp: dt 0, dv from the tie order, NULL rate
    assert rows[1][3:] == (0, 2.0, None)              # (a,1000,5.0)
    # normal step: 1.0 over 2 s → 0.5/s
    assert rows[2][3:] == (2000, 1.0, 0.5)            # (a,3000,6.0)
    assert rows[3][3:] == (None, None, None)          # (b,0,9.0)


def test_millisecond_operators_refuse_timestamp_columns(spark):
    """A TimestampType time column would cast('long') to epoch SECONDS
    — every *_ms parameter silently off by 1000× — so the ms-unit
    operators must raise instead of producing plausible wrong numbers."""
    import pytest as _pt
    from pyspark.sql import functions as F
    from zestdb_spark.operators import resample

    df = spark.createDataFrame(
        [("a", 0, 1.0)], "series_id string, timestamp long, value double"
    ).select("series_id", F.timestamp_millis("timestamp").alias("timestamp"), "value")
    with _pt.raises(TypeError, match="epoch-milliseconds"):
        temporal.moving_stats_time(df, 1000)
    with _pt.raises(TypeError, match="epoch-milliseconds"):
        temporal.series_delta(df)
    with _pt.raises(TypeError, match="epoch-milliseconds"):
        resample.gaps(df, 1000)


def test_interval_join_rejects_corrupt_span(spark):
    """One interval with end in the far future must fail LOUDLY at the
    span guard, not OOM building a multi-million-element bucket
    array."""
    import pytest as _pt

    from zestdb_spark.operators.interval import interval_join

    pts = spark.createDataFrame([(1, 1000)], "pid long, timestamp long")
    bad = spark.createDataFrame(
        [(1, 0, 10**15)], "iid long, start_ms long, end_ms long"
    )
    with _pt.raises(Exception, match="interval_join"):
        interval_join(pts, bad, bucket_ms=3_600_000, max_span_buckets=1000).collect()
    # a compliant interval still joins (guard is per-row, not global)
    ok = spark.createDataFrame(
        [(2, 0, 3_600_000)], "iid long, start_ms long, end_ms long"
    )
    rows = interval_join(pts, ok, bucket_ms=3_600_000).collect()
    assert [(r["pid"], r["iid"]) for r in rows] == [(1, 2)]


def test_renamed_columns_supported(spark):
    """The configurable-looking signatures must actually work with
    non-canonical column names (previously 'timestamp'/'value' were
    hard-coded in the projection)."""
    from zestdb_spark.operators import temporal
    from zestdb_spark.operators.anomaly import mad_outliers, zscore_outliers

    df = spark.createDataFrame(
        [("a", 1000, 1.0), ("a", 2000, 2.0), ("a", 3000, 50.0)],
        "sensor string, t long, reading double",
    )
    z = zscore_outliers(df, value="reading", by=("sensor",), on="t")
    assert set(z.columns) == {"sensor", "t", "reading", "z", "is_outlier"}
    m = mad_outliers(df, value="reading", by=("sensor",), on="t")
    assert set(m.columns) == {"sensor", "t", "reading", "score", "is_outlier"}
    mv = temporal.moving_stats(df, 2, on="t", by=("sensor",), value="reading")
    assert {"mov_avg", "reading", "t"} <= set(mv.columns)
    assert mv.count() == 3
    sd = temporal.series_delta(df, on="t", by=("sensor",), value="reading")
    assert {"dt_ms", "dv", "rate_per_s"} <= set(sd.columns)
