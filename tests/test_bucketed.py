"""Bucketed-mirror read path: ZestStore.bucketize publishes a
hash-bucketed, sorted managed table and per-series aggregations and
windows over it run WITHOUT a shuffle exchange — the SCALE.md claim
("with bucketed tables the exchange disappears"), asserted on the
actual physical plan rather than assumed.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from zestdb_spark.storage import ZestStore


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _shuffle_exchanges(plan: str) -> int:
    # formatted explain prints each shuffle Exchange's Arguments as
    # "hashpartitioning(...)" (broadcast exchanges print a
    # BroadcastMode instead) — count those
    return plan.count("hashpartitioning(")


@pytest.fixture(scope="module")
def store(spark, ts, tmp_path_factory):
    st = ZestStore(spark, str(tmp_path_factory.mktemp("zest_bucketed")))
    st.set_request_context("POST", "/ts/bulk/test", "tester")
    st.write_numeric_bulk(ts)
    st.bucketize("ts_numeric", n_buckets=4)
    return st


def test_bucketized_groupby_has_no_shuffle(store):
    agg = store.load_bucketed("ts_numeric").groupBy("series_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
    )
    assert _shuffle_exchanges(_plan(agg)) == 0
    # and the numbers match the canonical layout
    base = {
        r["series_id"]: (r["n"], r["s"])
        for r in store.load("ts_numeric")
        .groupBy("series_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    got = {r["series_id"]: (r["n"], r["s"]) for r in agg.collect()}
    assert got == base


def test_bucketized_window_has_no_shuffle(store):
    df = store.load_bucketed("ts_numeric")
    w = Window.partitionBy("series_id").orderBy(F.col("timestamp").desc())
    top = df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    assert _shuffle_exchanges(_plan(top)) == 0
    assert top.count() > 0


def test_partitioned_layout_does_shuffle(store):
    """Control: the same agg over the canonical partitioned layout DOES
    carry an exchange — the mirror is what removes it."""
    agg = store.load("ts_numeric").groupBy("series_id").agg(F.sum("value"))
    assert _shuffle_exchanges(_plan(agg)) >= 1


def test_load_bucketed_requires_publish(spark, tmp_path):
    st = ZestStore(spark, str(tmp_path / "empty"))
    with pytest.raises(KeyError, match="bucketize"):
        st.load_bucketed("ts_blob")


def test_bucketized_moving_stats_has_no_shuffle(store):
    """The round-6 per-series operators inherit the elision: trailing
    moving stats over the mirror plan with ZERO shuffle exchanges."""
    from zestdb_spark.operators import temporal

    out = temporal.moving_stats(store.load_bucketed("ts_numeric"), 3)
    assert _shuffle_exchanges(_plan(out)) == 0
    assert out.count() > 0


def test_bucketized_zscore_has_no_shuffle(store):
    from zestdb_spark.operators import anomaly

    out = anomaly.zscore_outliers(store.load_bucketed("ts_numeric"))
    assert _shuffle_exchanges(_plan(out)) == 0
    assert out.count() > 0


def test_bucketized_time_window_delta_gaps_have_no_shuffle(store):
    """The newest per-series window operators inherit the elision too:
    time-frame moving stats, first differences, and gap detection over
    the bucketized mirror each plan ZERO shuffle exchanges."""
    from zestdb_spark.operators import resample, temporal

    src = store.load_bucketed("ts_numeric")
    for out in (
        temporal.moving_stats_time(src, 1000),
        temporal.series_delta(src),
        resample.gaps(src, 1000),
    ):
        assert _shuffle_exchanges(_plan(out)) == 0
    assert temporal.series_delta(src).count() > 0
