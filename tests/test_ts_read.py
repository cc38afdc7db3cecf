"""Window-read semantics vs the reference (SURVEY.md §2.2/§2.5)."""

from __future__ import annotations

from zestdb_spark.operators import ts_read


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_last_n_is_per_series(ts):
    # reference: limit applies per series → up to k·n rows
    # (src/timeseries/timeseries.re:275-283)
    out = ts_read.read_last(ts, ["sensor1", "sensor2"], 2)
    got = rows(out)
    assert len(got) == 4
    assert ("sensor1", 4000, -1.5, "room", "lounge") in got
    assert ("sensor1", 3000, 7.0, None, None) in got
    assert ("sensor2", 5000, 10.0, "serial", "SN0099") in got
    assert ("sensor2", 2000, -3.2, None, None) in got


def test_last_overcount_returns_all(ts):
    assert ts_read.read_last(ts, ["pair"], 10**6).count() == 2


def test_first_n(ts):
    got = rows(ts_read.read_first(ts, ["sensor1"], 2))
    assert got == [
        ("sensor1", 1000, 1.0, "room", "lounge"),
        ("sensor1", 1000, 2.5, "room", "kitchen"),
    ] or len(got) == 2  # same-ms tie: both rows ARE the two oldest here
    assert all(t == 1000 for (_, t, *_r) in got)


def test_latest_earliest_per_series(ts):
    latest = rows(ts_read.read_latest(ts, ["sensor1", "sensor2", "single"]))
    assert len(latest) == 3
    assert ("single", 1500, 99.0, "room", "lounge") in latest
    earliest = rows(ts_read.read_earliest(ts, ["pair"]))
    assert earliest == [("pair", 1000, 5.0, "unit", "c")]


def test_latest_tie_is_deterministic(ts):
    # two sensor1 rows share ts=1000; earliest must pick the total-order
    # minimum (value 1.0 < 2.5) every run
    out = rows(ts_read.read_first(ts, ["sensor1"], 1))
    assert out == [("sensor1", 1000, 1.0, "room", "lounge")]


def test_since_inclusive(ts):
    got = rows(ts_read.read_since(ts, ["sensor1"], 2000))
    assert [t for (_, t, *_r) in got] == [2000, 3000, 4000]


def test_range_inclusive_both_ends(ts):
    got = rows(ts_read.read_range(ts, ["sensor2"], 1000, 2000))
    assert [t for (_, t, *_r) in got] == [1000, 2000]


def test_range_point(ts):
    assert ts_read.read_range(ts, ["sensor1"], 1000, 1000).count() == 2


def test_missing_series_empty(ts):
    assert ts_read.read_last(ts, ["ghost"], 5).count() == 0


def test_length_counts_all_selected_series(ts):
    out = ts_read.ts_length(ts, ["sensor1", "sensor2"]).collect()
    assert out[0]["length"] == 8


def test_multi_series_is_union_not_join(ts):
    # k ids → concatenation of per-series reads (J1)
    out = ts_read.read_since(ts, ["sensor1", "sensor2"], 0)
    assert out.count() == 8


def test_blob_windows(blob):
    got = rows(ts_read.read_last(blob, ["b1", "b2"], 1))
    assert ("b1", 2000, '{"nested":{"a":[1,2]}}') in got
    assert ("b2", 1500, '{"value":1}') in got
    assert ts_read.ts_length(blob, ["b1"]).collect()[0]["length"] == 2
