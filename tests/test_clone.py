"""SHALLOW CLONE (ZestStore.clone_table).

Contracts: the clone reads identically (current or AS OF a past
version); clone and source are independent afterwards — appends and
rewrites on either side, and even a source-side VACUUM, cannot change
what the other reads (hard links + immutable data files); cloning
into a non-empty table refuses; a vacuum-reclaimed version refuses
loudly.
"""

from __future__ import annotations

import pytest

from zestdb_spark.api import ZestEngine
from zestdb_spark.errors import BadRequest
from zestdb_spark.schema import TS_NUMERIC


def _mk(spark, spec):
    rows = [(s, int(t), float(v), None, None) for s, t, v in spec]
    return spark.createDataFrame(rows, TS_NUMERIC)


def _content(store, table="ts_numeric", version=None):
    return sorted(
        (r.series_id, r.timestamp, r.value)
        for r in store.load(table, version=version).collect()
    )


@pytest.fixture()
def pair(spark, tmp_path):
    src = ZestEngine(spark, str(tmp_path / "src"))
    dst = ZestEngine(spark, str(tmp_path / "dst"))
    return src, dst


def test_clone_reads_identically(spark, pair):
    src, dst = pair
    src.store.write_numeric_bulk(_mk(spark, [("a", 1000, 1.0), ("b", 2000, 2.0)]))
    snap = src.store.clone_table("ts_numeric", dst.store)
    assert snap.op == "clone" and len(snap.files) == 2
    assert _content(dst.store) == _content(src.store)
    assert dst.store.history("ts_numeric")[0].op == "clone"


def test_clone_as_of_past_version(spark, pair):
    src, dst = pair
    src.store.write_numeric_bulk(_mk(spark, [("a", 1000, 1.0)]))
    v0 = src.store.history("ts_numeric")[0].version
    src.delete("/ts/a/since/0")
    assert _content(src.store) == []
    src.store.clone_table("ts_numeric", dst.store, version=v0)
    assert _content(dst.store) == [("a", 1000, 1.0)]


def test_clone_independence_both_ways(spark, pair):
    src, dst = pair
    src.store.write_numeric_bulk(_mk(spark, [("a", 1000, 1.0)]))
    src.store.clone_table("ts_numeric", dst.store)
    # mutate the clone: append + rewrite
    dst.store.write_numeric_bulk(_mk(spark, [("a", 2000, 2.0)]))
    dst.store.merge_rows("ts_numeric", _mk(spark, [("a", 1000, 10.0)]))
    # mutate the source: delete everything, vacuum immediately
    src.delete("/ts/a/since/0")
    src.store.vacuum("ts_numeric", retention_s=0.0)
    assert _content(src.store) == []
    assert _content(dst.store) == [("a", 1000, 10.0), ("a", 2000, 2.0)]
    # and clean the clone's own tombstones — source unaffected
    dst.store.vacuum("ts_numeric", retention_s=0.0)
    assert _content(dst.store) == [("a", 1000, 10.0), ("a", 2000, 2.0)]


def test_clone_carries_stats_for_pruning(spark, pair):
    src, dst = pair
    src.store.write_numeric_bulk(_mk(spark, [("a", 1000, 1.0)]))
    src.store.clone_table("ts_numeric", dst.store)
    snap = dst.store._snapshot("ts_numeric")
    assert snap.stats, "clone dropped the manifest file stats"
    for rel in snap.files:
        assert snap.stats[rel]["min"]["timestamp"] == 1000


def test_clone_guards(spark, pair):
    src, dst = pair
    src.store.write_numeric_bulk(_mk(spark, [("a", 1000, 1.0)]))
    dst.store.write_numeric_bulk(_mk(spark, [("x", 1, 1.0)]))
    with pytest.raises(BadRequest, match="already has data"):
        src.store.clone_table("ts_numeric", dst.store)
    with pytest.raises(KeyError):
        src.store.clone_table("nope", dst.store)


def test_clone_vacuumed_version_refuses(spark, pair):
    src, dst = pair
    src.store.write_numeric_bulk(_mk(spark, [("a", 1000, 1.0)]))
    v0 = src.store.history("ts_numeric")[0].version
    src.delete("/ts/a/since/0")
    src.store.vacuum("ts_numeric", retention_s=0.0)
    with pytest.raises(BadRequest, match="no longer clonable|no clonable"):
        src.store.clone_table("ts_numeric", dst.store, version=v0)


def test_clone_covers_the_logs_too(spark, pair):
    """Round 8: the logs are manifested like every other table, so a
    backup/branch clone carries the audit trail and write provenance —
    previously clone_table refused them."""
    src, dst = pair
    src.get("/ts/a/latest")  # writes an audit row on the source
    snap = src.store.clone_table("audit", dst.store)
    assert snap.version == 0
    assert dst.store.load("audit").count() == src.store.load("audit").count()
