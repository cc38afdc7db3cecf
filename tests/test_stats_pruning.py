"""Manifest-level data skipping (Delta/Iceberg file statistics).

Every commit records per-file min/max for the table's stats columns
(storage._STATS_COLS) in the snapshot manifest; ``ZestStore.load``
accepts scan HINTS (since_ms/until_ms/series) that drop files the
manifest proves cannot match, before Spark ever lists or plans them.

Contracts pinned here:
- hints never change RESULTS — the hinted frame is a superset of the
  matching rows and callers apply exact predicates (so hinted+filter
  == full+filter, always);
- stats pruning works WITHIN a partition leaf (finer than the
  series_id/time_bucket directory pruning);
- stats survive the whole manifest life cycle: append CAS merge,
  delete rewrite, compaction, restore;
- pruning is conservative: files without stats (pre-stats bootstrap)
  are always kept.

The reference walks a per-series interval index to skip shards
(src/timeseries/timeseries.re:197-231); this is the same skip realized
through the public table-format recipe.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from zestdb_spark import snapshots
from zestdb_spark.api import ZestEngine
from zestdb_spark.schema import TS_NUMERIC
from zestdb_spark.storage import _DAY_MS


def _mk_rows(spark, spec):
    """spec: [(series, ts, value)] → canonical TS_NUMERIC frame."""
    rows = [(s, int(t), float(v), None, None) for s, t, v in spec]
    return spark.createDataFrame(rows, TS_NUMERIC)


def _collect(df):
    return sorted(
        (r.series_id, r.timestamp, r.value)
        for r in df.select("series_id", "timestamp", "value").collect()
    )


def test_append_records_footer_stats(spark, tmp_path):
    eng = ZestEngine(spark, str(tmp_path / "s"))
    eng.post("/ts/a/at/1000", {"value": 1.0})
    eng.post(f"/ts/a/at/{2 * _DAY_MS + 5}", {"value": 2.0})
    snap = eng.store._snapshot("ts_numeric")
    assert snap is not None and len(snap.files) == 2
    by_ts = {}
    for rel in snap.files:
        st = snap.stats.get(rel)
        assert st is not None, f"no stats recorded for {rel}"
        assert st["rows"] == 1
        assert st["min"]["timestamp"] == st["max"]["timestamp"]
        by_ts[st["min"]["timestamp"]] = rel
    assert set(by_ts) == {1000, 2 * _DAY_MS + 5}
    # stats round-trip through the JSON manifest (not just in-memory)
    reread = snapshots.latest(eng.store._path("ts_numeric"))
    assert reread.stats == snap.stats


def test_hinted_load_prunes_files_but_not_results(spark, tmp_path):
    eng = ZestEngine(spark, str(tmp_path / "s"))
    spec = [
        (s, d * _DAY_MS + off, d * 10 + off)
        for s in ("a", "b", "c")
        for d in range(4)
        for off in (100, 200)
    ]
    eng.ingest_bulk(_mk_rows(spark, spec), path="/ts/bulk/x", client="t")
    store = eng.store

    lo, hi = 1 * _DAY_MS, 2 * _DAY_MS + 150
    cond = F.col("timestamp").between(lo, hi) & F.col("series_id").isin("a", "b")

    full = store.load("ts_numeric").filter(cond)
    hinted = store.load(
        "ts_numeric", since_ms=lo, until_ms=hi, series={"a", "b"}
    ).filter(cond)
    assert _collect(hinted) == _collect(full) != []
    # the hint planned strictly fewer files: series c and days 0/3 gone
    assert 0 < len(hinted.inputFiles()) < len(full.inputFiles())
    for f in hinted.inputFiles():
        assert "series_id=c" not in f
        assert "time_bucket=0" not in f and "time_bucket=3" not in f


def test_stats_prune_within_one_partition_leaf(spark, tmp_path):
    """Two appends land in the SAME (series, day-bucket) leaf with
    disjoint intra-day time ranges — directory pruning cannot separate
    them, the per-file timestamp min/max must."""
    eng = ZestEngine(spark, str(tmp_path / "s"))
    eng.ingest_bulk(
        _mk_rows(spark, [("a", 1000, 1), ("a", 2000, 2)]),
        path="/ts/bulk/early",
        client="t",
    )
    eng.ingest_bulk(
        _mk_rows(spark, [("a", 50_000_000, 3), ("a", 50_000_500, 4)]),
        path="/ts/bulk/late",
        client="t",
    )
    store = eng.store
    full = store.load("ts_numeric")
    hinted = store.load("ts_numeric", since_ms=50_000_000)
    # both ingests share the one (a, bucket-0) leaf; the hint must
    # drop every early-ingest file on timestamp stats alone
    assert 0 < len(hinted.inputFiles()) < len(full.inputFiles())
    snap = eng.store._snapshot("ts_numeric")
    kept = {os.path.basename(f) for f in hinted.inputFiles()}
    for rel in snap.files:
        early = snap.stats[rel]["max"]["timestamp"] < 50_000_000
        assert early == (os.path.basename(rel) not in kept)
    got = _collect(hinted.filter(F.col("timestamp") >= 50_000_000))
    assert got == [("a", 50_000_000, 3.0), ("a", 50_000_500, 4.0)]
    # superset contract: the hinted frame may hold extra rows, callers
    # filter — but nothing matching may ever be missing
    assert _collect(hinted) == _collect(
        full.filter(F.col("timestamp") >= 50_000_000)
    )


def test_missing_stats_files_are_kept(spark, tmp_path):
    """A manifest entry without stats (pre-stats writer, bootstrap)
    must survive every time hint — pruning never guesses."""
    eng = ZestEngine(spark, str(tmp_path / "s"))
    eng.post("/ts/a/at/1000", {"value": 1.0})
    doc_rel = eng.store._snapshot("ts_numeric").files[0]
    # direct predicate check with stats WITHHELD: bucket matches → keep
    from zestdb_spark.storage import ZestStore

    assert ZestStore._file_may_match(doc_rel, None, 900, 1100, {"a"})
    # the DIRECTORY evidence alone still prunes confidently
    assert not ZestStore._file_may_match(doc_rel, None, 10**12, None, {"a"})
    assert not ZestStore._file_may_match(doc_rel, None, None, None, {"zz"})
    # a file with NO evidence at all (no partition dirs, no stats)
    # survives any hint
    assert ZestStore._file_may_match("part-0.parquet", None, 10**12, None, {"zz"})


def test_delete_and_compact_refresh_stats(spark, tmp_path):
    eng = ZestEngine(spark, str(tmp_path / "s"))
    spec = [("a", t, t) for t in (1000, 2000, 3000, 4000)]
    for s, t, v in spec:  # one commit per row → 4 small files
        eng.post(f"/ts/a/at/{t}", {"value": float(v)})
    eng.delete("/ts/a/range/1500/2500")
    eng.store.compact("ts_numeric")
    snap = eng.store._snapshot("ts_numeric")
    assert snap.files, "compact must leave live files"
    for rel in snap.files:
        st = snap.stats.get(rel)
        assert st is not None, f"rewritten file lost stats: {rel}"
    tss = sorted(
        v
        for rel in snap.files
        for v in (
            snap.stats[rel]["min"]["timestamp"],
            snap.stats[rel]["max"]["timestamp"],
        )
    )
    assert tss[0] == 1000 and tss[-1] == 4000
    # post-compact the leaf is ONE file spanning 1000..4000, so the
    # hint keeps it whole (superset contract) — the exact filter on
    # top returns precisely the late rows
    got = _collect(
        eng.store.load("ts_numeric", since_ms=3000).filter(
            F.col("timestamp") >= 3000
        )
    )
    assert got == [("a", 3000, 3000.0), ("a", 4000, 4000.0)]


def test_restore_regains_stats(spark, tmp_path):
    eng = ZestEngine(spark, str(tmp_path / "s"))
    eng.ingest_bulk(
        _mk_rows(spark, [("a", 1000, 1), ("b", 2000, 2)]),
        path="/ts/bulk/x",
        client="t",
    )
    pre = eng.store.history("ts_numeric")[0].version
    eng.delete("/ts/a/since/0")
    eng.store.restore("ts_numeric", pre)
    snap = eng.store._snapshot("ts_numeric")
    assert _collect(eng.store.load("ts_numeric")) == [
        ("a", 1000, 1.0),
        ("b", 2000, 2.0),
    ]
    # re-added files carry stats again (recomputed from their footers)
    for rel in snap.files:
        assert snap.stats.get(rel), f"restored file has no stats: {rel}"


def test_engine_path_reads_use_pruned_scan(spark, tmp_path):
    """The GET path wires the compiled plan's window/ids into the scan
    hint — and the answer matches the unpruned plan exactly."""
    import json

    eng = ZestEngine(spark, str(tmp_path / "s"))
    spec = [
        ("a", 100, 1),
        ("a", 3 * _DAY_MS, 2),
        ("b", 3 * _DAY_MS + 7, 5),
        ("c", 9 * _DAY_MS, 9),
    ]
    eng.ingest_bulk(_mk_rows(spark, spec), path="/ts/bulk/x", client="t")
    got = json.loads(eng.get(f"/ts/a,b/range/{2 * _DAY_MS}/{4 * _DAY_MS}"))
    assert {(r["timestamp"], r["data"]["value"]) for r in got} == {
        (3 * _DAY_MS, 2.0),
        (3 * _DAY_MS + 7, 5.0),
    }
    got = json.loads(eng.get(f"/ts/c/since/{8 * _DAY_MS}/sum"))
    assert got == {"result": 9.0}


def test_snapshot_commit_merges_stats_under_cas(tmp_path):
    """snapshots.commit stats semantics, no Spark: adds carry stats,
    survivors keep theirs, removed files drop theirs."""
    d = str(tmp_path / "t")
    os.makedirs(d)
    s_a = {"rows": 2, "min": {"timestamp": 10}, "max": {"timestamp": 20}}
    s_b = {"rows": 1, "min": {"timestamp": 99}, "max": {"timestamp": 99}}
    snapshots.commit(d, adds=["a.parquet"], stats={"a.parquet": s_a})
    snapshots.commit(d, adds=["b.parquet"], stats={"b.parquet": s_b})
    head = snapshots.latest(d)
    assert head.stats == {"a.parquet": s_a, "b.parquet": s_b}
    snapshots.commit(d, removes=["a.parquet"])
    head = snapshots.latest(d)
    assert head.files == ["b.parquet"]
    assert head.stats == {"b.parquet": s_b}
    # stats offered for a file that is not live are ignored
    snapshots.commit(d, stats={"ghost.parquet": s_a})
    assert snapshots.latest(d).stats == {"b.parquet": s_b}


def test_compact_clusters_by_time(spark, tmp_path):
    """Compaction range-partitions + sorts by timestamp, so the merged
    files' manifest stats are tight and DISJOINT — post-maintenance, a
    time hint isolates single files even inside one day-leaf."""
    eng = ZestEngine(spark, str(tmp_path / "s"))
    # interleaved appends inside ONE day bucket
    eng.ingest_bulk(
        _mk_rows(spark, [("a", t, t) for t in (100, 5000, 200, 6000)]),
        path="/ts/bulk/one",
        client="t",
    )
    eng.ingest_bulk(
        _mk_rows(spark, [("a", t, t) for t in (150, 5500, 250, 6500)]),
        path="/ts/bulk/two",
        client="t",
    )
    eng.store.compact("ts_numeric", target_files=2)
    snap = eng.store._snapshot("ts_numeric")
    assert len(snap.files) == 2
    spans = sorted(
        (snap.stats[r]["min"]["timestamp"], snap.stats[r]["max"]["timestamp"])
        for r in snap.files
    )
    # disjoint, ordered ranges — the clustering contract
    assert spans[0][1] < spans[1][0]
    # content preserved verbatim
    assert _collect(eng.store.load("ts_numeric")) == sorted(
        ("a", t, float(t)) for t in (100, 150, 200, 250, 5000, 5500, 6000, 6500)
    )
    # and a narrow hint now isolates one file within the leaf
    hinted = eng.store.load("ts_numeric", since_ms=5000)
    assert len(hinted.inputFiles()) == 1
