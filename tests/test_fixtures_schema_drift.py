"""Schema-drift insurance for fixtures.ts_ms (io/fixtures.py).

The driver-generated ``events.parquet`` has changed its ``ts`` parquet
physical type twice across rounds (TIMESTAMP(NANOS) → timestamp[us]).
These tests write the same instants under every physical layout pyarrow
can emit — int64 nanos (read as bigint under ``nanosAsLong``),
timestamp[us], and timestamp[ms] — and assert ``ts_ms`` produces
identical epoch-milliseconds for all of them, and that a genuinely
unexpected dtype fails FAST instead of silently mis-scaling.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from zestdb_spark.io import fixtures

#: epoch-ms instants with sub-second parts (exercise the scale math)
MS_VALUES = [0, 1, 999, 1_000, 1_704_844_800_123, 1_705_708_800_999]


def _write(tmp_path, name: str, arr: pa.Array) -> str:
    path = str(tmp_path / name)
    pq.write_table(
        pa.table({"ts": arr}),
        path,
        # keep nanos as TIMESTAMP(NANOS) instead of coercing to micros
        coerce_timestamps=None,
        version="2.6",
    )
    return path


def _read_ms(spark, path: str) -> list[int]:
    df = fixtures.harden_session(spark).read.parquet(path)
    rows = df.select(fixtures.ts_ms(df).alias("ms")).collect()
    return sorted(r["ms"] for r in rows)


def test_ts_ms_identical_across_physical_types(spark, tmp_path):
    nanos = _write(
        tmp_path, "nanos.parquet",
        pa.array([v * 1_000_000 for v in MS_VALUES], pa.timestamp("ns")),
    )
    micros = _write(
        tmp_path, "micros.parquet",
        pa.array([v * 1_000 for v in MS_VALUES], pa.timestamp("us")),
    )
    millis = _write(
        tmp_path, "millis.parquet", pa.array(MS_VALUES, pa.timestamp("ms"))
    )
    expected = sorted(MS_VALUES)
    assert _read_ms(spark, nanos) == expected
    assert _read_ms(spark, micros) == expected
    assert _read_ms(spark, millis) == expected


def test_ts_ms_nanos_surface_as_bigint(spark, tmp_path):
    """The nanos branch must actually be the bigint branch: under
    nanosAsLong Spark reads TIMESTAMP(NANOS) as int64, and that is the
    only non-timestamp dtype ts_ms may accept."""
    path = _write(
        tmp_path, "nanos2.parquet",
        pa.array([v * 1_000_000 for v in MS_VALUES], pa.timestamp("ns")),
    )
    df = fixtures.harden_session(spark).read.parquet(path)
    assert dict(df.dtypes)["ts"] == "bigint"


def test_ts_ms_rejects_unknown_dtype(spark):
    """A drifted physical type (e.g. plain int32, string, double) must
    raise, not silently divide by 1e6."""
    for bad in (
        spark.createDataFrame([("2024-01-01",)], "ts string"),
        spark.createDataFrame([(1.5,)], "ts double"),
        spark.range(1).select(F.col("id").cast("int").alias("ts")),
    ):
        with pytest.raises(ValueError, match="unexpected dtype"):
            fixtures.ts_ms(bad)


def test_ts_ms_public_alias():
    """__spark_entry__ uses the private name; both must be the same
    callable so the alias can't drift."""
    assert fixtures._ts_ms is fixtures.ts_ms


def test_ts_ms_date_dtype(spark, tmp_path):
    """DATE columns (a plausible future lineitem regeneration) map to
    midnight-UTC epoch-ms, matching DuckDB epoch_ms(DATE)."""
    import datetime

    path = str(tmp_path / "dates.parquet")
    pq.write_table(
        pa.table({"ts": pa.array([datetime.date(2024, 1, 10), datetime.date(1996, 1, 1)])}),
        path,
    )
    assert _read_ms(spark, path) == [820454400000, 1704844800000]
