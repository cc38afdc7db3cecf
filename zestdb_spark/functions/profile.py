"""One-pass table profiling: per-column null counts, distinct counts,
and min/max — the "what is in this 100 TB directory" first query of
any data-engineering engagement.

Shape: ONE aggregate computes every column's statistics in a single
scan (multiple distinct-aggregates lower to Spark's Expand operator —
one pass, expand factor = #columns), then the 1-row result is
unpivoted scan-locally into one row per column. Nothing driver-side
but the final k-row matrix.

Determinism/oracle contract: counts are exact integers; numeric
min/max stay DOUBLE (never stringified — double→string formatting is
engine-specific, e.g. 1e7 renders '1.0E7' in Spark and '10000000.0'
in DuckDB); string min/max are lexicographic on the raw bytes.
``approx=True`` swaps exact distinct counts for
``approx_count_distinct`` — the scale path for very wide tables,
engine-internal and therefore not oracle-replayable (use the portable
``sketches.hll_distinct`` per column when the sketch itself must be
auditable).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile", "histogram", "histogram_equi_depth", "top_k_values"]

#: exact dtype names (plus parameterized decimal) — prefix matching
#: would misclassify 'interval day to second' as numeric via 'int'
_NUMERIC = {"int", "bigint", "smallint", "tinyint", "float", "double"}


def _is_numeric(dtype: str) -> bool:
    return dtype in _NUMERIC or dtype.startswith("decimal(")


def profile(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """(column, dtype, n, n_null, n_distinct, min_num, max_num,
    min_str, max_str): one row per profiled column. min/max_num are
    populated for numeric columns (cast to double), min/max_str for
    string columns; other types (timestamps, arrays, binary) profile
    counts only."""
    dtypes = dict(df.dtypes)
    cols = list(columns) if columns is not None else df.columns
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"profile: unknown columns {missing}")

    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(c).alias(f"_nn{i}"))
        aggs.append(
            (
                F.approx_count_distinct(c) if approx else F.count_distinct(F.col(c))
            ).alias(f"_nd{i}")
        )
        t = dtypes[c]
        if _is_numeric(t):
            aggs.append(F.min(F.col(c).cast("double")).alias(f"_mn{i}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"_mx{i}"))
        elif t == "string":
            aggs.append(F.min(c).alias(f"_mn{i}"))
            aggs.append(F.max(c).alias(f"_mx{i}"))
    row = df.agg(*aggs)

    structs = []
    for i, c in enumerate(cols):
        t = dtypes[c]
        is_num = _is_numeric(t)
        is_str = t == "string"
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(t).alias("dtype"),
                F.col("_n").alias("n"),
                (F.col("_n") - F.col(f"_nn{i}")).alias("n_null"),
                F.col(f"_nd{i}").cast("long").alias("n_distinct"),
                (F.col(f"_mn{i}") if is_num else F.lit(None).cast("double")).alias(
                    "min_num"
                ),
                (F.col(f"_mx{i}") if is_num else F.lit(None).cast("double")).alias(
                    "max_num"
                ),
                (F.col(f"_mn{i}") if is_str else F.lit(None).cast("string")).alias(
                    "min_str"
                ),
                (F.col(f"_mx{i}") if is_str else F.lit(None).cast("string")).alias(
                    "max_str"
                ),
            )
        )
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbins: int = 20,
) -> DataFrame:
    """(bucket, lo_edge, hi_edge, n): fixed-width histogram of a
    numeric column over [lo, hi) — buckets 0..nbins−1, plus bucket −1
    (below lo) and nbins (at/above hi) so no row is silently dropped
    and the bucket counts always sum to count(col). NULLs are excluded
    (they are n_null in ``profile``, not a magic bucket).

    Deterministic: the bucket index floor((x−lo)/width) is integer
    output of double math identical in any engine; edges derive from
    (lo, width, index) so they are replayable too. ONE map-side-
    combinable groupBy on an int key ≤ nbins+2 distinct values — the
    same movement as the HLL register table."""
    if not hi > lo:
        raise ValueError(f"histogram: need hi > lo, got [{lo}, {hi})")
    if nbins < 1:
        raise ValueError(f"histogram: nbins must be ≥ 1, got {nbins}")
    width = (hi - lo) / nbins
    x = F.col(col).cast("double")
    bucket = (
        F.when(x < lo, F.lit(-1))
        .when(x >= hi, F.lit(nbins))
        .otherwise(
            # width = (hi−lo)/nbins is inexact for most (lo, hi, nbins);
            # floor((x−lo)/width) can reach nbins for x just below hi,
            # which would mislabel an IN-RANGE value as overflow — clamp
            # so bucket nbins is reserved for x ≥ hi as documented.
            F.least(
                F.floor((x - F.lit(lo)) / F.lit(width)).cast("int"),
                F.lit(nbins - 1),
            )
        )
    )
    return (
        df.filter(x.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("lo_edge"),
            (F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)).alias("hi_edge"),
            "n",
        )
    )


def histogram_equi_depth(
    df: DataFrame,
    col: str,
    nbins: int = 10,
    sample_key: Sequence[str] | None = None,
    rate_bits: int = 4,
    portable: bool = True,
) -> DataFrame:
    """(bucket, lo_edge, hi_edge, n): EQUI-DEPTH histogram — nbins
    buckets holding ~equal row counts, the complement of the
    fixed-width ``histogram`` for skewed columns (one hot value no
    longer swallows 19 empty bins). Cut points are the i/nbins
    percentiles; bucket(x) = #cuts ≤ x, so boundary values land in the
    upper bucket deterministically. lo_edge/hi_edge are the OBSERVED
    per-bucket min/max (empty buckets are omitted, like the fixed-width
    groupBy); NULLs are excluded (they are n_null in ``profile``).

    Scale posture: with ``sample_key=None`` the cuts are EXACT
    percentiles (the A6 interpolation contract — DuckDB quantile_cont
    replays them bit-for-bit), whose aggregation buffer holds every
    value: fine at API/fixture scale, not at 100 TB. There, pass
    ``sample_key`` (a row-unique key) — the cuts come from the same
    fixed 2^−rate_bits md5 Bernoulli sample as
    ``sketches.sampled_quantiles`` (bounded buffer, still
    engine-replayable, rank error O(1/√sample)); bucket ASSIGNMENT is
    always over all rows either way. The assignment join is a 1-row
    broadcast (bounded by construction: nbins−1 doubles), and the
    final rollup is a map-side-combinable groupBy on an int key with
    ≤ nbins distinct values."""
    if nbins < 1:
        raise ValueError(f"histogram_equi_depth: nbins must be ≥ 1, got {nbins}")
    from zestdb_spark.functions.dedup import q6

    x = F.col(col).cast("double")
    vals = df.filter(x.isNotNull()).select(x.alias("_x"))
    src = vals
    if sample_key is not None:
        from zestdb_spark.functions.sketches import _HASH_BITS, _h60

        if not 0 <= rate_bits <= 40:
            raise ValueError(
                f"histogram_equi_depth: rate_bits must be in [0, 40], got {rate_bits}"
            )
        key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in sample_key])
        src = (
            df.filter(x.isNotNull())
            .filter(_h60(key, portable) < F.lit(1 << (_HASH_BITS - rate_bits)))
            .select(x.alias("_x"))
        )
    fracs = [i / nbins for i in range(1, nbins)]
    cuts = (
        F.transform(
            F.percentile(F.col("_x"), F.array(*[F.lit(f) for f in fracs])),
            q6,
        )
        if fracs
        else F.array().cast("array<double>")
    )
    stats = src.agg(cuts.alias("_cuts"))
    # an empty sample yields NULL cuts — degrade to one bucket rather
    # than a NULL bucket key (raise rate_bits responsibly instead)
    safe_cuts = F.coalesce(F.col("_cuts"), F.array().cast("array<double>"))
    bucket = F.size(F.filter(safe_cuts, lambda c: F.col("_x") >= c))
    return (
        vals.crossJoin(F.broadcast(stats))
        .groupBy(bucket.alias("bucket"))
        .agg(
            q6(F.min("_x")).alias("lo_edge"),
            q6(F.max("_x")).alias("hi_edge"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def top_k_values(df: DataFrame, col: str, k: int = 10) -> DataFrame:
    """(value, n): the k most frequent values of a column, EXACT — the
    batch complement to the Count-Min estimate (``sketches.cm_sketch``
    bounds error at stream scale; this is the truth when a full scan is
    affordable). NULLs are excluded (they are n_null in ``profile``).

    Deterministic: ties rank by (n DESC, value ASC) — a total order, so
    the k-th place never depends on partitioning. The plan is a
    map-side-combined groupBy on the value key followed by
    TakeOrderedAndProject — each task keeps only its local top-k and
    the driver merges k·tasks rows; no global sort ever materializes."""
    if k < 1:
        raise ValueError(f"top_k_values: k must be ≥ 1, got {k}")
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("value").asc())
        .limit(k)
    )
