"""Scale-posture guards: _spread's failure mode and the O(n²) baselines.

Both use the optimizer's size estimate probe (df._jdf...stats()); these
tests pin down what happens when the probe answers big, small, or not
at all — the "not at all" case must never add a shuffle (assuming BIG
is the safe default at 100 TB).
"""

from __future__ import annotations

import pytest

from zestdb_spark.functions import dedup


class _BrokenProbe:
    """Delegates to a real DataFrame but raises on the internal-API
    probe — simulates Spark Connect / private-API drift."""

    def __init__(self, df):
        self._df = df

    def __getattr__(self, name):
        if name == "_jdf":
            raise RuntimeError("queryExecution probe unavailable")
        return getattr(self._df, name)


def test_spread_probe_failure_assumes_big(spark):
    """No stats → pass through unchanged: no repartition Exchange may
    be added when we cannot tell the input is small."""
    df = spark.range(10)
    wrapped = _BrokenProbe(df)
    assert dedup._spread(wrapped) is wrapped


def test_spread_small_input_still_spreads(spark):
    """The healthy path is unchanged: a tiny local input is spread to
    defaultParallelism partitions."""
    out = dedup._spread(spark.range(10))
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_quadratic_guard_refuses_large_input(spark, monkeypatch):
    # parquet scans carry a REAL size estimate (local relations report
    # the unknown sentinel) — shrink the ceiling under it to simulate a
    # corpus-sized input without reading a corpus
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    monkeypatch.setattr(dedup, "QUADRATIC_MAX_BYTES", 0)
    with pytest.raises(ValueError, match="minhash_lsh_pairs"):
        dedup.jaccard_pairs(docs)


def test_quadratic_guard_override(spark, monkeypatch):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    monkeypatch.setattr(dedup, "QUADRATIC_MAX_BYTES", 0)
    # flag bypasses the guard — plan builds without raising
    dedup.jaccard_pairs(docs, allow_quadratic=True)


def test_quadratic_guard_embeddings(spark, monkeypatch):
    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    monkeypatch.setattr(dedup, "QUADRATIC_MAX_BYTES", 0)
    with pytest.raises(ValueError, match="lsh_bucketed_pairs"):
        dedup.embedding_dup_pairs(embs)
    dedup.embedding_dup_pairs(embs, allow_quadratic=True)


def test_quadratic_guard_unknown_stats_stay_quiet(spark, monkeypatch):
    """Local relations report Catalyst's Long.MaxValue unknown sentinel
    — the guard must not mistake 'unknown' for 'big'."""
    docs = spark.createDataFrame([(1, "a b"), (2, "a b")], "doc_id long, text string")
    monkeypatch.setattr(dedup, "QUADRATIC_MAX_BYTES", 0)
    dedup._guard_quadratic(docs, "op", "alt", allow=False)


def test_quadratic_guard_quiet_below_threshold(spark):
    """Default threshold: test-scale inputs sail through."""
    docs = spark.createDataFrame([(1, "a b c d"), (2, "a b c d")], "doc_id long, text string")
    assert dedup.jaccard_pairs(docs).count() == 1


def test_quadratic_guard_probe_failure_stays_quiet(spark):
    """No stats → the guard cannot prove the input is big, so it lets
    the call through (the flag stays the only forcing function)."""
    docs = spark.createDataFrame([(1, "a b"), (2, "a b")], "doc_id long, text string")
    dedup._guard_quadratic(_BrokenProbe(docs), "op", "alt", allow=False)
