"""Per-series anomaly detection over the TS tables: z-score and
MAD (median absolute deviation) outlier flagging.

Extension beyond the reference surface (ZestDB computes aggregates
but never flags rows — SURVEY.md §2.4); the natural next query an IoT
deployment runs on sensor series. Design rules shared with the
package: pure column expressions + one grouped window per statistic,
every float that crosses the oracle boundary derived from
reduce-order-free exact sums (DECIMAL(38,6)) or exact medians, then
q6-floored — so DuckDB replays the flags bit-exactly.

Shuffle shape: ONE exchange on the series key per operator (the
per-key stats window and the row-level flags share it). At 100 TB
over the bucketize() mirror the exchange disappears like every other
per-series window in the package; the stats are windowed, not
collected — nothing is driver-side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from zestdb_spark.functions.dedup import q6

__all__ = ["zscore_outliers", "mad_outliers"]


def zscore_outliers(
    df: DataFrame,
    value: str = "value",
    by: Sequence[str] = ("series_id",),
    threshold: float = 3.0,
    on: str = "timestamp",
) -> DataFrame:
    """(*by, timestamp, value, z, is_outlier): each row scored against
    its own series' mean and SAMPLE sd (the A7 contract). Keys with
    n < 2 (sd undefined) or sd = 0 (constant series) yield z NULL and
    is_outlier false — a constant series has no outliers, not all.

    Determinism: Σv and Σv² accumulate as DECIMAL(38,6) (exact,
    order-free); each v² is q6-FLOORED before the decimal cast (floor
    of an identical double is engine-identical, while HALF_UP of a raw
    double can differ between Spark's shortest-string path and the
    oracle's binary rounding); mean and sd derive from the sums in one
    fixed double expression — sd² = (Σv² − (Σv)²/n)/(n−1) — and z is
    q6-floored.

    Shape (r13): grouped aggregate + join back on the key, not a
    whole-partition window — the window formulation exchanges and
    per-key BUFFERS the entire fact table (one straggler task per hot
    series), while the aggregate shuffles only map-side partials and
    the join back is exchange-free on the data side once AQE
    broadcasts the key-cardinality stats table (the ``mad_outliers``
    shape; no hint — a high-cardinality ``by`` degrades to a shuffle
    equi-join). Identical values: same exact decimal sums, same fixed
    double expression per key.
    """
    stats = df.groupBy(*by).agg(
        F.sum(F.col(value).cast("decimal(38,6)")).cast("double").alias("_s1"),
        F.sum(q6(F.col(value) * F.col(value)).cast("decimal(38,6)"))
        .cast("double")
        .alias("_s2"),
        F.count(F.lit(1)).cast("double").alias("_n"),
    )
    s1, s2, n = F.col("_s1"), F.col("_s2"), F.col("_n")
    mean = s1 / n
    var = (s2 - (s1 * s1) / n) / (n - F.lit(1.0))
    # guard on the VARIANCE, not sqrt(var): the q6-floored squares can
    # push a constant series' computed variance slightly NEGATIVE, and
    # sqrt of that is NaN in Spark (NaN > 0 is true there — the z rows
    # would silently floor to 0.0) and an Out-of-Range ERROR in the
    # oracle. var > 0 short-circuits both engines identically.
    z = q6((F.col(value) - mean) / F.sqrt(var))
    z = F.when((n > 1) & (var > 0), z)
    return df.join(stats, list(by)).select(
        *by,
        on,
        value,
        z.alias("z"),
        F.coalesce(F.abs(z) > F.lit(threshold), F.lit(False)).alias("is_outlier"),
    )


def mad_outliers(
    df: DataFrame,
    value: str = "value",
    by: Sequence[str] = ("series_id",),
    threshold: float = 3.5,
    on: str = "timestamp",
) -> DataFrame:
    """(*by, timestamp, value, score, is_outlier): robust outliers via
    the modified z-score 0.6745·|v − median| / MAD (Iglewicz & Hoaglin
    1993) — immune to the very outliers that inflate a z-score's sd.
    MAD = median(|v − median(v)|) per key; MAD = 0 (over half the
    series identical) ⇒ score NULL, flagged false.

    Exact medians (the A6 contract — percentile interpolation matches
    DuckDB quantile_cont bit-for-bit), computed as two grouped
    aggregates joined back on the key: medians aren't window-able in
    either engine. The stats joins carry NO broadcast hint — the
    table is key-cardinality sized, which a forced hint would assume
    bounded; AQE broadcasts it at runtime when the aggregate output
    is in fact small and shuffle-joins on the series key when a
    high-cardinality `by` makes it large."""
    med = df.groupBy(*by).agg(F.median(value).alias("_med"))
    mad = (
        df.join(med, list(by))
        .groupBy(*by)
        .agg(F.median(F.abs(F.col(value) - F.col("_med"))).alias("_mad"))
    )
    stats = med.join(mad, list(by))
    score = q6(
        F.lit(0.6745) * F.abs(F.col(value) - F.col("_med")) / F.col("_mad")
    )
    score = F.when(F.col("_mad") > 0, score)
    return (
        df.join(stats, list(by))
        .select(
            *by,
            on,
            value,
            score.alias("score"),
            F.coalesce(score > F.lit(threshold), F.lit(False)).alias("is_outlier"),
        )
    )
