"""Keyed MERGE (upsert) into the snapshot table format.

``ZestStore.merge_rows`` is Delta's MERGE with whole-row replacement
on the natural key (series_id, timestamp). Contracts pinned here:

- replace-by-key semantics: matched live rows (ALL of them, duplicate
  keys included) are replaced; unmatched update rows are inserted;
  duplicate keys in the update batch all land;
- churn minimality: only files that actually CONTAIN a matched key are
  rewritten — same-series files outside the update's key range and
  unmatched-series files stay byte-identical on disk;
- atomicity: one manifest commit (op="merge"); a crash before the
  commit leaves the table fully OLD (the staged survivors/inserts are
  unreferenced orphans);
- provenance: surviving rows keep their original write_id, inserted
  rows get the merge's fresh write_id, and the merge logs one
  provenance row;
- the change feed and time travel see the merge like any rewrite.

The reference corrects a point by POSTing at its explicit timestamp
(src/server.re 'at' route); merge_rows is that correction lifted to a
distributed batch with table-format atomicity.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from zestdb_spark.api import ZestEngine
from zestdb_spark.errors import BadRequest
from zestdb_spark.schema import TS_NUMERIC
from zestdb_spark.storage import _DAY_MS


def _mk(spark, spec):
    """spec: [(series, ts, value)] → canonical TS_NUMERIC frame."""
    rows = [(s, int(t), float(v), None, None) for s, t, v in spec]
    return spark.createDataFrame(rows, TS_NUMERIC)


def _content(df):
    return sorted(
        (r.series_id, r.timestamp, r.value)
        for r in df.select("series_id", "timestamp", "value").collect()
    )


def _file_bytes(store, table):
    root = store._path(table)
    return {
        rel: open(os.path.join(root, rel), "rb").read()
        for rel in store._live_files(table)
    }


@pytest.fixture()
def eng(spark, tmp_path):
    return ZestEngine(spark, str(tmp_path / "store"))


def test_merge_replaces_matched_inserts_new(spark, eng):
    base = _mk(spark, [("a", 1000, 1.0), ("a", 2000, 2.0), ("b", 1000, 3.0)])
    eng.store.write_numeric_bulk(base)
    upd = _mk(spark, [("a", 2000, 20.0), ("c", 500, 5.0)])
    rewritten = eng.store.merge_rows("ts_numeric", upd)
    assert rewritten >= 1
    assert _content(eng.store.load("ts_numeric")) == [
        ("a", 1000, 1.0),
        ("a", 2000, 20.0),
        ("b", 1000, 3.0),
        ("c", 500, 5.0),
    ]
    assert eng.store.history("ts_numeric")[0].op == "merge"


def test_merge_duplicate_keys_both_sides(spark, eng):
    # two live rows share the key; the update batch carries the key
    # twice — ALL matched rows go, ALL update rows land
    base = _mk(spark, [("a", 1000, 1.0), ("a", 1000, 2.0), ("a", 3000, 3.0)])
    eng.store.write_numeric_bulk(base)
    upd = _mk(spark, [("a", 1000, 10.0), ("a", 1000, 11.0)])
    eng.store.merge_rows("ts_numeric", upd)
    assert _content(eng.store.load("ts_numeric")) == [
        ("a", 1000, 10.0),
        ("a", 1000, 11.0),
        ("a", 3000, 3.0),
    ]


def test_merge_rewrites_only_files_containing_matched_keys(spark, eng):
    # three appends → three file sets: series a day 0, a day 2, b day 0.
    # An update hitting only (a, day 0) must leave the other files'
    # BYTES untouched (not merely their content).
    eng.store.write_numeric_bulk(_mk(spark, [("a", 1000, 1.0)]))
    eng.store.write_numeric_bulk(_mk(spark, [("a", 2 * _DAY_MS + 7, 2.0)]))
    eng.store.write_numeric_bulk(_mk(spark, [("b", 1500, 3.0)]))
    before = _file_bytes(eng.store, "ts_numeric")
    rewritten = eng.store.merge_rows(
        "ts_numeric", _mk(spark, [("a", 1000, 10.0)])
    )
    assert rewritten == 1
    after = _file_bytes(eng.store, "ts_numeric")
    untouched_before = {
        rel: b for rel, b in before.items() if "series_id=a/time_bucket=0" not in rel
    }
    for rel, b in untouched_before.items():
        assert after.get(rel) == b, f"{rel} changed bytes"


def test_merge_candidate_but_unmatched_file_not_rewritten(spark, eng):
    # same series and same DAY in two files with disjoint keys: stats
    # pruning alone keeps both candidates, the input_file_name
    # semi-join must still rewrite only the hit file
    eng.store.write_numeric_bulk(_mk(spark, [("a", 1000, 1.0)]))
    eng.store.write_numeric_bulk(_mk(spark, [("a", 2000, 2.0)]))
    rewritten = eng.store.merge_rows("ts_numeric", _mk(spark, [("a", 2000, 9.0)]))
    assert rewritten == 1
    assert _content(eng.store.load("ts_numeric")) == [
        ("a", 1000, 1.0),
        ("a", 2000, 9.0),
    ]


def test_merge_into_empty_table_is_insert_only(spark, eng):
    n = eng.store.merge_rows("ts_numeric", _mk(spark, [("a", 1000, 1.0)]))
    assert n == 0
    assert _content(eng.store.load("ts_numeric")) == [("a", 1000, 1.0)]


def test_merge_empty_updates_is_noop(spark, eng):
    eng.store.write_numeric_bulk(_mk(spark, [("a", 1000, 1.0)]))
    v0 = eng.store.history("ts_numeric")[0].version
    assert eng.store.merge_rows("ts_numeric", _mk(spark, [])) == 0
    assert eng.store.history("ts_numeric")[0].version == v0


def test_merge_provenance(spark, eng):
    eng.store.write_numeric_bulk(_mk(spark, [("a", 1000, 1.0), ("a", 2000, 2.0)]))
    wid0 = {
        r.timestamp: r.write_id
        for r in eng.store.load_with_provenance("ts_numeric").collect()
    }
    eng.store.merge_rows("ts_numeric", _mk(spark, [("a", 2000, 20.0)]))
    rows = {
        (r.timestamp, r.value): r.write_id
        for r in eng.store.load_with_provenance("ts_numeric").collect()
    }
    # survivor keeps its original stamp; the replacement got a new one
    assert rows[(1000, 1.0)] == wid0[1000]
    assert rows[(2000, 20.0)] > wid0[2000]


def test_merge_crash_before_commit_leaves_table_old(spark, eng, monkeypatch):
    eng.store.write_numeric_bulk(_mk(spark, [("a", 1000, 1.0), ("a", 2000, 2.0)]))
    before = _content(eng.store.load("ts_numeric"))

    def boom(*a, **k):
        raise RuntimeError("injected crash before manifest publish")

    monkeypatch.setattr(eng.store, "_commit", boom)
    with pytest.raises(RuntimeError, match="injected"):
        eng.store.merge_rows("ts_numeric", _mk(spark, [("a", 2000, 20.0)]))
    monkeypatch.undo()
    assert _content(eng.store.load("ts_numeric")) == before
    # re-running the merge converges
    eng.store.merge_rows("ts_numeric", _mk(spark, [("a", 2000, 20.0)]))
    assert _content(eng.store.load("ts_numeric")) == [
        ("a", 1000, 1.0),
        ("a", 2000, 20.0),
    ]


def test_merge_changes_feed_sees_net_diff(spark, eng):
    eng.store.write_numeric_bulk(_mk(spark, [("a", 1000, 1.0), ("a", 2000, 2.0)]))
    v0 = eng.store.history("ts_numeric")[0].version
    eng.store.merge_rows("ts_numeric", _mk(spark, [("a", 2000, 20.0), ("b", 1, 9.0)]))
    v1 = eng.store.history("ts_numeric")[0].version
    diff = {
        (r.series_id, r.timestamp, r.value, r._change_type)
        for r in eng.store.changes("ts_numeric", v0, v1).collect()
    }
    assert diff == {
        ("a", 2000, 2.0, "delete"),
        ("a", 2000, 20.0, "insert"),
        ("b", 1, 9.0, "insert"),
    }


def test_merge_time_travel_pins_pre_merge(spark, eng):
    eng.store.write_numeric_bulk(_mk(spark, [("a", 1000, 1.0)]))
    v0 = eng.store.history("ts_numeric")[0].version
    eng.store.merge_rows("ts_numeric", _mk(spark, [("a", 1000, 10.0)]))
    assert _content(eng.store.load("ts_numeric", version=v0)) == [("a", 1000, 1.0)]
    assert _content(eng.store.load("ts_numeric")) == [("a", 1000, 10.0)]


def test_merge_blob_table(spark, eng):
    from zestdb_spark.schema import TS_BLOB

    base = spark.createDataFrame(
        [("b1", 1000, '{"v":1}'), ("b1", 2000, '{"v":2}')], TS_BLOB
    )
    eng.store.write_blob("b1", {"v": 1}, timestamp=1000)
    eng.store.write_blob("b1", {"v": 2}, timestamp=2000)
    upd = spark.createDataFrame([("b1", 2000, '{"v":22}')], TS_BLOB)
    eng.store.merge_rows("ts_blob", upd)
    got = sorted(
        (r.series_id, r.timestamp, r.data)
        for r in eng.store.load("ts_blob").collect()
    )
    assert got == [("b1", 1000, '{"v": 1}'), ("b1", 2000, '{"v":22}')]
    assert base.count() == 2  # silence unused-fixture lint


def test_merge_rejects_non_ts_tables(spark, eng):
    with pytest.raises(KeyError):
        eng.store.merge_rows("kv_json", _mk(spark, []))


def test_merge_hive_escaped_series_names(spark, eng):
    # partition-dir names with Hive-escaped characters must round-trip
    # through the input_file_name URI → relpath reversal
    weird = "a=b c%d"
    eng.store.write_numeric_bulk(_mk(spark, [(weird, 1000, 1.0), (weird, 2000, 2.0)]))
    n = eng.store.merge_rows("ts_numeric", _mk(spark, [(weird, 2000, 20.0)]))
    assert n == 1
    assert _content(eng.store.load("ts_numeric")) == [
        (weird, 1000, 1.0),
        (weird, 2000, 20.0),
    ]


def test_merge_prunes_candidates_by_stats(spark, eng, monkeypatch):
    # a store with many files far outside the update's key bounds:
    # the semi-join must only ever READ the candidate files — assert
    # by counting what _read_files is asked for
    for day in range(6):
        eng.store.write_numeric_bulk(
            _mk(spark, [("a", day * _DAY_MS + 50, float(day))])
        )
    reads: list[int] = []
    orig = type(eng.store)._read_files

    def spy(self, table, files):
        reads.append(len(files))
        return orig(self, table, files)

    monkeypatch.setattr(type(eng.store), "_read_files", spy)
    eng.store.merge_rows("ts_numeric", _mk(spark, [("a", 2 * _DAY_MS + 50, 9.0)]))
    # candidate scan (1 file: only day 2 overlaps the bounds) and the
    # touched-file rewrite scan (the same 1 file)
    assert reads and max(reads) == 1


def test_merge_vacuumed_version_raises_loudly(spark, eng):
    # sanity: a merge is an ordinary rewrite for retention purposes
    eng.store.write_numeric_bulk(_mk(spark, [("a", 1000, 1.0)]))
    v0 = eng.store.history("ts_numeric")[0].version
    eng.store.merge_rows("ts_numeric", _mk(spark, [("a", 1000, 2.0)]))
    eng.store.vacuum("ts_numeric", retention_s=0.0)
    with pytest.raises(BadRequest):
        eng.store.load("ts_numeric", version=v0).collect()
