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


# ------------------------------------------------------- sampled_quantiles

def test_sampled_quantiles_rate_zero_is_exact(spark):
    """rate_bits=0 keeps every row, so the 'estimates' must equal the
    exact interpolated quantiles (q6-floored) of the full input."""
    import math

    df = spark.range(1001).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v")
    )
    (row,) = sketches.sampled_quantiles(
        df, "v", ["k"], (0.25, 0.5, 0.75), rate_bits=0
    ).collect()
    assert row["n_sample"] == 1001 and row["est_total"] == 1001
    assert row["q_250"] == 250.0
    assert row["q_500"] == 500.0
    assert row["q_750"] == 750.0


def test_sampled_quantiles_accuracy_and_merge(spark):
    df = spark.range(20_000).select(
        F.col("id").alias("k"), (F.col("id") % 1000).cast("double").alias("v")
    )
    (row,) = sketches.sampled_quantiles(df, "v", ["k"], (0.5,), rate_bits=3).collect()
    # 1/8 sample of 20k ≈ 2500 rows; rank error O(1/sqrt(n)) ≈ 2%
    assert row["est_total"] == pytest.approx(20_000, rel=0.1)
    assert row["q_500"] == pytest.approx(499.5, abs=25)
    # merge law: the same predicate applied per shard then unioned IS
    # the sample of the union — quantiles over two half-shards must
    # equal the single-pass result exactly
    lo = df.filter(F.col("k") < 10_000)
    hi = df.filter(F.col("k") >= 10_000)
    (merged,) = sketches.sampled_quantiles(
        lo.unionAll(hi), "v", ["k"], (0.5,), rate_bits=3
    ).collect()
    assert merged == row


def test_sampled_quantiles_validation(spark):
    df = spark.range(5).select(F.col("id").alias("k"), F.col("id").alias("v"))
    with pytest.raises(ValueError, match="key_cols"):
        sketches.sampled_quantiles(df, "v", [])
    with pytest.raises(ValueError, match="rate_bits"):
        sketches.sampled_quantiles(df, "v", ["k"], rate_bits=41)
    with pytest.raises(ValueError, match="outside"):
        sketches.sampled_quantiles(df, "v", ["k"], qs=(1.5,))


def test_fast_hash_variants_accurate(spark, ids):
    """portable=False (masked xxhash64 — the 100 TB hash) must keep
    every estimator law: same error bounds, duplicates free, exact
    below k. Only oracle replayability is given up."""
    (h,) = sketches.hll_distinct(ids, "v", p=12, portable=False).collect()
    assert h["estimate"] == pytest.approx(5000, rel=0.08)
    (kv,) = sketches.kmv_distinct(ids, "v", k=256, portable=False).collect()
    assert kv["estimate"] == pytest.approx(5000, rel=0.25)
    small = spark.range(100).select(F.col("id").alias("v"))
    (ex,) = sketches.kmv_distinct(small, "v", k=256, portable=False).collect()
    assert ex["estimate"] == 100.0
    df = spark.range(1001).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v")
    )
    (row,) = sketches.sampled_quantiles(
        df, "v", ["k"], (0.5,), rate_bits=0, portable=False
    ).collect()
    assert row["q_500"] == 500.0  # rate 0 keeps all rows whatever the hash
    # rate_bits>0 exercises the raw-column variadic-xxhash64 sample
    # predicate (no per-row string build): the sampled median must
    # still track the true median within sampling error
    big = spark.range(40_000).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v")
    )
    (s,) = sketches.sampled_quantiles(
        big, "v", ["k"], (0.5,), rate_bits=3, portable=False
    ).collect()
    assert s["n_sample"] == pytest.approx(40_000 / 8, rel=0.1)
    assert s["q_500"] == pytest.approx(20_000, rel=0.05)


# --------------------------------------------------------- per-group HLL

def test_hll_by_group_matches_global_per_group(spark):
    df = spark.range(6000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 900).alias("v"),  # 900 distinct, all in every group
    )
    rows = {r["g"]: r for r in sketches.hll_distinct(df, "v", by=("g",)).collect()}
    assert set(rows) == {"0", "1", "2"}
    # every group holds exactly the values ≡ its residues — compare each
    # group's estimate to a single-group sketch of the same value set
    for g in rows:
        sub = df.filter(F.col("g") == g)
        (solo,) = sketches.hll_distinct(sub, "v").collect()
        assert rows[g]["estimate"] == solo["estimate"]
        assert rows[g]["v_zero"] == solo["v_zero"]


def test_hll_merge_by_group(spark):
    a = spark.range(0, 2000).select(F.lit("x").alias("g"), F.col("id").alias("v"))
    b = spark.range(1000, 3000).select(F.lit("x").alias("g"), F.col("id").alias("v"))
    merged = sketches.hll_merge(
        sketches.hll_registers(a, "v", by=("g",)),
        sketches.hll_registers(b, "v", by=("g",)),
        by=("g",),
    )
    direct = sketches.hll_registers(a.unionAll(b), "v", by=("g",))
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


# ------------------------------------------------------- count-min sketch

def test_cm_estimate_overcounts_never_under(spark):
    """CM guarantees estimate ≥ true count; with width >> distinct the
    estimate is exact."""
    df = spark.range(10_000).select((F.col("id") % 100).alias("v"))
    sk = sketches.cm_sketch(df, "v", depth=4, width=1024)
    items = spark.range(100).select(F.col("id").alias("v"))
    rows = sketches.cm_estimate(sk, items, "v", depth=4, width=1024).collect()
    assert len(rows) == 100
    assert all(r["estimate"] == 100 for r in rows)  # exact: no collisions


def test_cm_absent_item_zero(spark):
    df = spark.range(1000).select(F.col("id").alias("v"))
    sk = sketches.cm_sketch(df, "v", depth=4, width=4096)
    items = spark.createDataFrame([(999_999,)], "v long")
    (row,) = sketches.cm_estimate(sk, items, "v", depth=4, width=4096).collect()
    # an unseen item can still collide into occupied cells, but with
    # width=4096 and 1000 values a 4-way simultaneous collision is
    # effectively impossible — and the bound still holds
    assert row["estimate"] <= 2  # 2N/width = 0.49 expected error bound


def test_cm_merge_equals_union(spark):
    a = spark.range(0, 500).select((F.col("id") % 50).alias("v"))
    b = spark.range(0, 300).select((F.col("id") % 30).alias("v"))
    merged = sketches.cm_merge(
        sketches.cm_sketch(a, "v"), sketches.cm_sketch(b, "v")
    )
    direct = sketches.cm_sketch(a.unionAll(b), "v")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_cm_sketch_bounded_size(spark):
    df = spark.range(100_000).select(F.col("id").alias("v"))
    assert sketches.cm_sketch(df, "v", depth=4, width=64).count() <= 4 * 64
    with pytest.raises(ValueError, match="depth"):
        sketches.cm_sketch(df, "v", depth=0)


def test_hll_small_m_alpha_constants(spark):
    """p=4 (m=16) must use the tabulated alpha_16 = 0.673, not the
    asymptotic formula (0.676) — and still estimate within the much
    wider small-m error bound 1.04/sqrt(16) = 26%."""
    assert sketches._alpha(16) == 0.673
    assert sketches._alpha(32) == 0.697
    assert sketches._alpha(64) == 0.709
    assert abs(sketches._alpha(4096) - 0.7213 / (1 + 1.079 / 4096)) < 1e-12
    df = spark.range(100_000).select(F.col("id").alias("v"))
    (row,) = sketches.hll_distinct(df, "v", p=4).collect()
    assert row["estimate"] == pytest.approx(100_000, rel=0.55)  # 2 sigma


def test_sampled_quantiles_by_group(spark):
    df = spark.range(4000).selectExpr(
        "id AS k",
        "CAST(id % 2 AS STRING) AS g",
        "CAST(CASE WHEN id % 2 = 0 THEN id % 100 ELSE 1000 + id % 100 END AS DOUBLE) AS v",
    )
    rows = {
        r["g"]: r
        for r in sketches.sampled_quantiles(
            df, "v", ["k"], (0.5,), rate_bits=2, by=("g",)
        ).collect()
    }
    assert set(rows) == {"0", "1"}
    assert rows["0"]["q_500"] < 100
    assert rows["1"]["q_500"] > 1000
    # grouped row equals the filtered single-group run exactly
    (solo,) = sketches.sampled_quantiles(
        df.filter("g = '1'"), "v", ["k"], (0.5,), rate_bits=2
    ).collect()
    assert rows["1"]["q_500"] == solo["q_500"]
    assert rows["1"]["n_sample"] == solo["n_sample"]


# ------------------------------------------------------------ bloom filter

def test_bloom_no_false_negatives(spark):
    df = spark.range(2000).select(F.col("id").alias("v"))
    bl = sketches.bloom_build(df, "v", m_bits=1 << 15, k=5)
    rows = sketches.bloom_probe(bl, df, "v", m_bits=1 << 15, k=5).collect()
    assert len(rows) == 2000
    assert all(r["maybe_contains"] for r in rows)  # the hard guarantee


def test_bloom_false_positive_rate_in_range(spark):
    n, m = 2000, 1 << 15
    df = spark.range(n).select(F.col("id").alias("v"))
    bl = sketches.bloom_build(df, "v", m_bits=m, k=5)
    absent = spark.range(1_000_000, 1_002_000).select(F.col("id").alias("v"))
    hits = (
        sketches.bloom_probe(bl, absent, "v", m_bits=m, k=5)
        .filter("maybe_contains")
        .count()
    )
    # theoretical fp ≈ (1 - e^(-5*2000/32768))^5 ≈ 0.2%; allow 10×
    assert hits <= 40


def test_bloom_merge_equals_union(spark):
    a = spark.range(0, 700).select(F.col("id").alias("v"))
    b = spark.range(500, 1200).select(F.col("id").alias("v"))
    merged = sketches.bloom_merge(
        sketches.bloom_build(a, "v"), sketches.bloom_build(b, "v")
    )
    direct = sketches.bloom_build(a.unionAll(b), "v")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_bloom_validation():
    with pytest.raises(ValueError, match="m_bits"):
        sketches.bloom_build(None, "v", m_bits=10)
    with pytest.raises(ValueError, match="at least one"):
        sketches.bloom_merge()


def test_fast_hash_variant_contract(spark):
    """portable=False (masked xxhash64 — the 100 TB fast path) must
    differ from the md5 path ONLY in the hash: registers obey the same
    structural bounds the estimate arithmetic assumes (60-bit domain,
    p-bit register, rho in [1, width+1]), and both estimates land
    within HLL standard error of the true distinct count. Referenced
    from BASELINE.md's measured fast-path table."""
    n, p = 5000, 12
    df = spark.range(0, n).select(F.col("id").alias("v"))
    regs = sketches.hll_registers(df, "v", p, portable=False).collect()
    width = 60 - p
    assert all(0 <= r["register"] < (1 << p) for r in regs)
    assert all(1 <= r["max_rho"] <= width + 1 for r in regs)

    import math

    tol = 5 * 1.04 / math.sqrt(1 << p) * n  # 5σ of HLL standard error
    for portable in (True, False):
        est = sketches.hll_distinct(df, "v", p, portable=portable).collect()[0][
            "estimate"
        ]
        assert abs(est - n) < tol, (portable, est)
    # KMV: fewer than k distinct hashes ⇒ exact in BOTH variants
    small = spark.range(0, 100).select(F.col("id").alias("v"))
    for portable in (True, False):
        row = sketches.kmv_distinct(small, "v", k=256, portable=portable).collect()[0]
        assert row["n_min"] == 100 and row["estimate"] == 100.0


def test_sketches_ignore_nulls(spark):
    """NULLs are not values: the sketched estimate must equal the
    sketch of the non-null rows (previously a NULL emitted a NULL
    register/cell/bit row that drifted hll_estimate's n_present)."""
    vals = spark.createDataFrame(
        [(i,) for i in range(500)] + [(None,)] * 50, "v int"
    )
    clean = vals.filter(F.col("v").isNotNull())
    with_null = sketches.hll_distinct(vals, "v").collect()[0]
    without = sketches.hll_distinct(clean, "v").collect()[0]
    assert tuple(with_null) == tuple(without)
    assert sorted(map(tuple, sketches.cm_sketch(vals, "v").collect())) == sorted(
        map(tuple, sketches.cm_sketch(clean, "v").collect())
    )
    assert sorted(map(tuple, sketches.bloom_build(vals, "v").collect())) == sorted(
        map(tuple, sketches.bloom_build(clean, "v").collect())
    )
    # NULL never occupies a min-k slot: < k distinct non-nulls ⇒ exact
    small = spark.createDataFrame([(i,) for i in range(100)] + [(None,)] * 20, "v int")
    row = sketches.kmv_distinct(small, "v").collect()[0]
    assert row["n_min"] == 100 and row["estimate"] == 100.0


# ------------------------------------------------------- heavy hitters


def test_heavy_hitters_exact_matches_groupby(spark):
    """Two-pass MG top-k == the exact groupBy answer (capacity well
    above the domain, so the exactness condition trivially holds),
    including the deterministic (freq desc, item asc) tie order."""
    df = spark.range(20_000).select(
        # zipf-ish: value v appears ~ 20000/(v+1) times
        (F.floor(F.sqrt(F.col("id"))) % 200).cast("long").alias("v")
    )
    got = [
        (r["item"], r["freq"])
        for r in sketches.heavy_hitters_exact(df, "v", k=10, capacity=512).collect()
    ]
    want = [
        (r["item"], r["freq"])
        for r in df.select(F.col("v").cast("string").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("item").asc())
        .limit(10)
        .collect()
    ]
    assert got == want


def test_heavy_hitters_tiny_capacity_keeps_true_heavies(spark):
    """The MG guarantee under pressure: capacity 4 over a 1000-key
    domain still surfaces the two planted items that each hold >20% of
    the stream (freq >> n/(capacity+1) = n/5)."""
    base = spark.range(2000).select((F.col("id") % 1000 + 100).alias("v"))
    heavy = spark.range(6000).select(
        F.when(F.col("id") % 2 == 0, F.lit(1)).otherwise(F.lit(2)).alias("v")
    )
    df = base.unionAll(heavy).repartition(8)  # spread over partitions
    top = sketches.heavy_hitters_exact(df, "v", k=2, capacity=4).collect()
    assert [(r["item"], r["freq"]) for r in top] == [("1", 3000), ("2", 3000)]


def test_heavy_hitter_candidates_bounded_and_lower_bound(spark):
    """Candidate output stays <= capacity per partition and weights
    never exceed true counts (MG lower-bound law); NULLs ignored."""
    df = spark.range(5000).select(
        F.when(F.col("id") % 50 == 0, None)       # NULLs: ignored
        .when(F.col("id") % 3 == 0, F.lit(999))   # planted heavy (~33%)
        .otherwise(F.col("id") % 37)
        .alias("v")
    ).coalesce(1)
    cand = sketches.heavy_hitter_candidates(df, "v", capacity=8).collect()
    assert 0 < len(cand) <= 8
    assert "999" in {r["item"] for r in cand}  # > n/(c+1) must survive
    true = {
        r["item"]: r["freq"]
        for r in df.filter(F.col("v").isNotNull())
        .select(F.col("v").cast("string").alias("item"))
        .groupBy("item").agg(F.count(F.lit(1)).alias("freq")).collect()
    }
    for r in cand:
        assert r["weight"] <= true[r["item"]]
    with pytest.raises(ValueError):
        sketches.heavy_hitter_candidates(df, "v", capacity=0)


def test_mg_fold_matches_dict_reference():
    """The r14 vectorized MG fold (index-aligned Series add + one
    nlargest compression per batch) must produce the IDENTICAL
    (item → weight) summary as the r13 per-item dict fold over the
    same batch stream — adversarial shapes: compression triggered
    multiple times, exact ties at the decrement quantile, items
    vanishing and re-entering, a batch of all-new keys, empty batches,
    and an empty stream."""
    import random

    import pandas as pd

    from zestdb_spark.functions.sketches import _mg_fold

    def dict_fold(batches, capacity):
        import heapq

        counts, n_rows = {}, 0
        for pdf in batches:
            n_rows += len(pdf)
            for item, c in pdf["item"].value_counts().items():
                counts[item] = counts.get(item, 0) + int(c)
            if len(counts) > capacity:
                d = heapq.nlargest(capacity + 1, counts.values())[-1]
                counts = {k: v - d for k, v in counts.items() if v > d}
        return counts, n_rows

    import pyarrow as pa

    rng = random.Random(1234)
    cases = []
    for trial in range(30):
        batches = []
        for _ in range(rng.randint(1, 6)):
            n = rng.choice([0, 1, 5, 40, 200])
            items = [f"k{rng.randint(0, rng.choice([3, 10, 60]))}" for _ in range(n)]
            batches.append(items)
        cases.append((batches, rng.choice([1, 2, 4, 16])))
    cases.append(([], 4))  # empty stream
    for batches, cap in cases:
        arrow = [
            pa.RecordBatch.from_arrays(
                [pa.array(items, type=pa.string())], names=["item"]
            )
            for items in batches
        ]
        pandas = [pd.DataFrame({"item": items}) for items in batches]
        got_items, got_weights, got_n = _mg_fold(iter(arrow), cap)
        ref_counts, ref_n = dict_fold(pandas, cap)
        assert dict(zip(got_items, got_weights)) == ref_counts
        assert got_n == ref_n
        assert len(got_items) <= cap


def test_heavy_hitters_partitioning_invariant(spark):
    """Same answer at 1 and 16 partitions (the per-partition summaries
    merge losslessly through the exact recount)."""
    df = spark.range(10_000).select((F.col("id") % 97).alias("v"))
    a = sketches.heavy_hitters_exact(df.coalesce(1), "v", k=5, capacity=256).collect()
    b = sketches.heavy_hitters_exact(df.repartition(16), "v", k=5, capacity=256).collect()
    assert [(r["item"], r["freq"]) for r in a] == [(r["item"], r["freq"]) for r in b]


def test_heavy_hitters_verify_guard(spark):
    """An under-sized capacity on a near-uniform domain must fail
    LOUDLY (the runtime assert on the MG frequency floor), never return
    a silently-wrong top-k; verify=False opts out for callers who know
    the domain fits; empty input passes trivially."""
    # 500 distinct values, ~20 each: n/(capacity+1) = 10000/9 >> 20
    uniform = spark.range(10_000).select((F.col("id") % 500).alias("v"))
    with pytest.raises(Exception, match="nothing certifies under the MG floor"):
        sketches.heavy_hitters_exact(uniform, "v", k=3, capacity=8).collect()
    # opt-out path returns (possibly-incomplete) rows without raising
    rows = sketches.heavy_hitters_exact(
        uniform, "v", k=3, capacity=8, verify=False
    ).collect()
    assert len(rows) <= 3
    empty = uniform.filter(F.lit(False))
    assert sketches.heavy_hitters_exact(empty, "v", k=3, capacity=8).collect() == []


def test_heavy_hitters_sparse_tail_returns_certified_prefix(spark):
    """A domain with fewer than k values clearing the MG floor must
    return the certified prefix — exact rows, no spurious failure (the
    pre-fix behavior crashed on this provably-correct answer): one
    overwhelming value plus a 5-row tail at k=10."""
    heavy = spark.range(100_000).select(F.lit("a").alias("v"))
    tail = spark.range(5).select(F.lit("b").alias("v"))
    df = heavy.unionAll(tail)
    got = [
        (r["item"], r["freq"])
        for r in sketches.heavy_hitters_exact(df, "v", k=10, capacity=1024).collect()
    ]
    # 'a' certifies (100000 > n/1025); 'b' (freq 5) is below the floor
    # and is omitted rather than returned unproven
    assert got == [("a", 100_000)]
    # verify=False keeps the uncertified tail
    raw = [
        (r["item"], r["freq"])
        for r in sketches.heavy_hitters_exact(
            df, "v", k=10, capacity=1024, verify=False
        ).collect()
    ]
    assert raw == [("a", 100_000), ("b", 5)]
