"""The bench harness must degrade per-query, not per-suite: one broken
query records an ``{"err": ...}`` slot and every other query still
gets a number (round 4 lost its whole perf signal to a single broken
fixture aborting the loop)."""

from __future__ import annotations

import bench


def test_run_pass_records_error_and_continues(spark, tmp_path):
    calls = []

    def ok(s, d):
        calls.append("ok")
        return s.range(3)

    def boom(s, d):
        raise RuntimeError("fixture exploded")

    def late(s, d):
        calls.append("late")
        return s.range(1)

    qs = {"ok": ok, "boom": boom, "late": late}
    timings, errors, exec_timings, cold = bench.run_pass(
        spark, qs, ["ok", "boom", "late"], str(tmp_path), runs=1
    )
    assert isinstance(timings["ok"], float)
    assert isinstance(timings["late"], float)  # ran despite the failure
    assert "late" in calls
    assert timings["boom"] == {"err": errors["boom"]}
    assert "RuntimeError" in errors["boom"]
    assert exec_timings == {}  # no PRECOLLECT_TWINS in this suite
    # cold cycle recorded for the queries that ran, absent for the error
    assert isinstance(cold["ok"], float) and isinstance(cold["late"], float)
    assert "boom" not in cold
    # the suite total in main() sums only the float slots — mirror that
    total = sum(t for t in timings.values() if isinstance(t, float))
    assert total >= 0.0

def test_composite_is_per_query_min_across_passes():
    """The noise protocol's composite: min of every float observation;
    a query that errored everywhere keeps its error slot."""
    passes = [
        {"load1": 1.0, "sec": {"a": 2.0, "b": {"err": "x"}, "c": {"err": "x"}}},
        {"load1": 1.0, "sec": {"a": 1.5, "b": 3.0, "c": {"err": "y"}}},
    ]
    names = ["a", "b", "c"]
    composite = {}
    for name in names:
        vals = [
            ps["sec"][name]
            for ps in passes
            if isinstance(ps["sec"].get(name), float)
        ]
        composite[name] = min(vals) if vals else passes[-1]["sec"][name]
    assert composite == {"a": 1.5, "b": 3.0, "c": {"err": "y"}}


def test_precollect_twin_records_exec_sec(spark, tmp_path, monkeypatch):
    """Rows in PRECOLLECT_TWINS get a count()-terminated execution twin
    so the artifact separates operator cost from result transfer."""
    monkeypatch.setattr(bench, "PRECOLLECT_TWINS", ("big",))
    qs = {"big": lambda s, d: s.range(10)}
    timings, errors, exec_timings, cold = bench.run_pass(
        spark, qs, ["big"], str(tmp_path), runs=1
    )
    assert isinstance(timings["big"], float)
    assert isinstance(exec_timings["big"], float)
    assert isinstance(cold["big"], float)
    # with runs=1 the cold cycle IS the only cycle
    assert cold["big"] == timings["big"]
    assert not errors
