"""Tag-filter and aggregate semantics vs the reference (§2.2 P1-P2, §2.4)."""

from __future__ import annotations

import math

import pytest

from zestdb_spark.operators import ts_agg, ts_filter, ts_read


def test_equals_exact_string_match(ts):
    out = ts_filter.tag_equals(ts, "room", "lounge")
    assert out.count() == 3  # sensor1×2 + single


def test_equals_drops_missing_tag_rows(ts):
    # rows without the tag are dropped, not errors (src/filter.re:9-14):
    # untagged rows and rows tagged with a different tag_name both drop
    out = ts_filter.tag_equals(ts, "serial", "A001")
    assert [tuple(r) for r in out.collect()] == [("sensor1", 2000, 43.0, "serial", "A001")]


def test_equals_is_not_substring(ts):
    assert ts_filter.tag_equals(ts, "serial", "SN00").count() == 0


def test_contains_literal_substring(ts):
    assert ts_filter.tag_contains(ts, "serial", "SN00").count() == 2
    assert ts_filter.tag_contains(ts, "serial", "0042").count() == 1


def test_contains_case_sensitive(ts):
    # Str.regexp_string is case-sensitive (src/filter.re:17-29)
    assert ts_filter.tag_contains(ts, "serial", "sn00").count() == 0


def _agg(ts, ids, name):
    df = ts_read.select_series(ts, ids)
    return ts_agg.apply_aggregate(df, name).collect()[0]["result"]


def test_sum(ts):
    assert _agg(ts, ["sensor1"], "sum") == pytest.approx(52.0)


def test_count_returns_float(ts):
    v = _agg(ts, ["sensor1"], "count")
    assert isinstance(v, float) and v == 5.0  # float count, src/numeric.re:41


def test_min_max(ts):
    assert _agg(ts, ["sensor1"], "min") == -1.5
    assert _agg(ts, ["sensor1"], "max") == 43.0


def test_mean(ts):
    assert _agg(ts, ["sensor1"], "mean") == pytest.approx(10.4)


def test_median_exact(ts):
    # sensor1 values: [-1.5, 1.0, 2.5, 7.0, 43.0] → 2.5 (exact, not approx)
    assert _agg(ts, ["sensor1"], "median") == 2.5
    # even count: sensor2 [-3.2, 10.0, 44.0] + single [99.0] → (10+44)/2
    assert _agg(ts, ["sensor2", "single"], "median") == 27.0


def test_sd_is_sample_stddev(ts):
    vals = [5.0, 6.0]
    m = sum(vals) / 2
    expected = math.sqrt(sum((v - m) ** 2 for v in vals) / (len(vals) - 1))
    # sd is floor-quantized to 6 dp (the q6 rule — see ts_agg._quant6)
    assert _agg(ts, ["pair"], "sd") == math.floor(expected * 1e6) / 1e6


def test_agg_empty_input_is_null(ts):
    # serializer renders NULL as {} (src/numeric.re:26)
    assert _agg(ts, ["ghost"], "sum") is None
    assert _agg(ts, ["ghost"], "count") == 0.0


def test_sd_single_row_is_null(ts):
    assert _agg(ts, ["single"], "sd") is None


def test_filter_then_agg_pipeline(ts):
    filtered = ts_filter.tag_equals(ts, "room", "lounge")
    out = ts_agg.apply_aggregate(filtered, "max").collect()[0]["result"]
    assert out == 99.0
