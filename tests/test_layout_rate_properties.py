"""Property-based tests (hypothesis) for the round-9 continuation's
pure-math operators: a Python model re-derives the expected answer for
arbitrary generated inputs and Spark must agree exactly.

- zorder_key_col: the Morton key round-trips — de-interleaving the key
  recovers every column's scaled value (bijectivity over the scaled
  grid), keys stay in [0, 2^(bits·k)), and equal inputs give equal keys.
- m4_downsample: output points are a subset of the input, and each
  bucket preserves the bucket's exact min/max values plus its earliest
  and latest timestamps.
- counter_rate: with no resets and no duplicate timestamps, the sum of
  (rate · Δt_seconds) telescopes to last − first.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from zestdb_spark.functions import layout
from zestdb_spark.operators import resample

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_points = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),
        st.integers(min_value=-500, max_value=500),
    ),
    min_size=1,
    max_size=40,
)


def _scale(x: int, lo: int, hi: int, bits: int) -> int:
    span = hi - lo
    if span <= 0:
        return 0
    return ((x - lo) * ((1 << bits) - 1)) // span


@given(_points, st.integers(min_value=2, max_value=8))
@_SETTINGS
def test_zorder_key_deinterleaves_to_scaled_values(spark, pts, bits):
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "rid long, x long, y long")
    bounds = layout.zorder_bounds(df, ["x", "y"])
    keyed = {
        r["rid"]: r["zkey"]
        for r in df.select(
            "rid", layout.zorder_key_col(["x", "y"], bounds, bits).alias("zkey")
        ).collect()
    }
    for rid, x, y in rows:
        key = keyed[rid]
        assert 0 <= key < 1 << (bits * 2)
        rx = sum(((key >> (b * 2)) & 1) << b for b in range(bits))
        ry = sum(((key >> (b * 2 + 1)) & 1) << b for b in range(bits))
        assert rx == _scale(x, *bounds["x"], bits)
        assert ry == _scale(y, *bounds["y"], bits)


@given(_points, st.integers(min_value=1, max_value=6))
@_SETTINGS
def test_m4_subset_and_bucket_extrema(spark, pts, n_buckets):
    # dedupe timestamps so selector tie rules are irrelevant to the model
    seen: dict[int, int] = {}
    for t, v in pts:
        seen[t] = v
    rows = [("s", t, float(v)) for t, v in seen.items()]
    df = spark.createDataFrame(rows, "series_id string, timestamp long, value double")
    lo, hi = 0, 10_000
    got = resample.m4_downsample(df, lo, hi, n_buckets).collect()
    inp = {(t, v) for _, t, v in rows}
    by_bucket: dict[int, list[tuple[int, float]]] = {}
    for r in got:
        assert (r["timestamp"], r["value"]) in inp
        by_bucket.setdefault(r["bucket"], []).append((r["timestamp"], r["value"]))
    span = hi - lo + 1
    model: dict[int, list[tuple[int, float]]] = {}
    for _, t, v in rows:
        model.setdefault((t - lo) * n_buckets // span, []).append((t, v))
    assert set(by_bucket) == set(model)
    for b, pts_b in model.items():
        vs = [v for _, v in pts_b]
        ts = [t for t, _ in pts_b]
        got_v = [v for _, v in by_bucket[b]]
        got_t = [t for t, _ in by_bucket[b]]
        assert min(vs) in got_v and max(vs) in got_v
        assert min(ts) in got_t and max(ts) in got_t
        assert len(by_bucket[b]) <= 4


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=100),  # gaps (seconds-ish)
            st.integers(min_value=0, max_value=50),   # increments
        ),
        min_size=1,
        max_size=20,
    )
)
@_SETTINGS
def test_counter_rate_telescopes_without_resets(spark, steps):
    t, v = 0, 0.0
    rows = [("s", t, v)]
    for dt, dv in steps:
        t += dt * 1000
        v += float(dv)
        rows.append(("s", t, v))
    df = spark.createDataFrame(rows, "series_id string, timestamp long, value double")
    got = resample.counter_rate(df).collect()
    assert len(got) == len(steps)
    total = 0.0
    prev_t = 0
    for r in sorted(got, key=lambda r: r["timestamp"]):
        dt_s = (r["timestamp"] - prev_t) / 1000.0
        total += r["rate_per_s"] * dt_s
        prev_t = r["timestamp"]
    # rates are q6-floored, so the telescoped sum matches to 1e-6·Δt
    assert abs(total - v) <= 1e-6 * (prev_t / 1000.0) + 1e-9
