"""Unit coverage for the mergeable cardinality sketches (HLL + KMV).

The driver's DuckDB oracle pins engine↔oracle equality; these tests
pin the SKETCH laws the oracle can't see: merge–union equivalence
(the 100 TB property), small-range exactness, estimation accuracy
within the published error bound, and determinism across runs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zestdb_spark.functions import sketches


@pytest.fixture(scope="module")
def ids(spark):
    # 5000 distinct values, each appearing twice (duplicates must not
    # move the estimate)
    return spark.range(10_000).select((F.col("id") % 5000).alias("v"))


def test_hll_accuracy_within_bound(ids):
    (row,) = sketches.hll_distinct(ids, "v", p=12).collect()
    # standard error 1.04/sqrt(4096) ≈ 1.6%; allow 5 sigma
    assert row["estimate"] == pytest.approx(5000, rel=0.08)
    assert row["m"] == 4096


def test_hll_small_range_linear_counting(spark):
    # 10 distinct values in 4096 registers → linear-counting branch,
    # which is EXACT when no registers collide
    df = spark.range(10).select(F.col("id").alias("v"))
    (row,) = sketches.hll_distinct(df, "v", p=12).collect()
    assert row["v_zero"] >= 4086
    assert row["estimate"] == pytest.approx(10, abs=0.5)


def test_hll_merge_equals_union(spark):
    a = spark.range(0, 3000).select(F.col("id").alias("v"))
    b = spark.range(2000, 6000).select(F.col("id").alias("v"))
    merged = sketches.hll_merge(
        sketches.hll_registers(a, "v"), sketches.hll_registers(b, "v")
    )
    direct = sketches.hll_registers(a.unionAll(b), "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # and therefore identical estimates
    (em,) = sketches.hll_estimate(merged).collect()
    (ed,) = sketches.hll_estimate(direct).collect()
    assert em["estimate"] == ed["estimate"]


def test_hll_duplicates_are_free(spark, ids):
    once = spark.range(5000).select(F.col("id").alias("v"))
    (e1,) = sketches.hll_distinct(once, "v").collect()
    (e2,) = sketches.hll_distinct(ids, "v").collect()
    assert e1["estimate"] == e2["estimate"]


def test_hll_p_bounds():
    with pytest.raises(ValueError, match=r"p must be"):
        sketches.hll_registers(None, "v", p=3)


def test_kmv_exact_below_k(spark):
    df = spark.range(100).select(F.col("id").alias("v"))
    (row,) = sketches.kmv_distinct(df, "v", k=256).collect()
    assert row["n_min"] == 100
    assert row["estimate"] == 100.0


def test_kmv_accuracy_within_bound(ids):
    (row,) = sketches.kmv_distinct(ids, "v", k=256).collect()
    # rel error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert row["n_min"] == 256
    assert row["estimate"] == pytest.approx(5000, rel=0.25)


def test_kmv_k_bound():
    with pytest.raises(ValueError, match="k must be"):
        sketches.kmv_distinct(None, "v", k=1)


def test_sketches_deterministic(ids):
    r1 = sketches.hll_distinct(ids, "v").collect()
    r2 = sketches.hll_distinct(ids, "v").collect()
    assert r1 == r2
    k1 = sketches.kmv_distinct(ids, "v").collect()
    k2 = sketches.kmv_distinct(ids, "v").collect()
    assert k1 == k2
