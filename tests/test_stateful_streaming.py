"""applyInPandasWithState: per-series state must persist ACROSS
micro-batches (batch 2 continues batch 1's counts)."""

from __future__ import annotations

import pyspark.sql.functions as F

from zestdb_spark.schema import TS_NUMERIC
from zestdb_spark.streaming.stateful import running_series_stats


def test_state_survives_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "ingest")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(rows):
        spark.createDataFrame(rows, TS_NUMERIC).write.mode("append").parquet(src)

    write_batch(
        [
            ("s1", 1000, 1.0, None, None),
            ("s1", 2000, 5.0, None, None),
            ("s2", 1500, -2.0, None, None),
        ]
    )

    stream = (
        spark.readStream.schema(TS_NUMERIC)
        .option("maxFilesPerTrigger", "100")
        .parquet(src)
        .select("series_id", "timestamp", "value")
    )
    q = (
        running_series_stats(stream)
        .writeStream.format("memory")
        .queryName("stateful_t")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            r["series_id"]: (r["n"], r["sum_value"], r["last_ts"])
            for r in spark.sql("SELECT * FROM stateful_t").collect()
        }
        assert first["s1"] == (2, 6.0, 2000)
        assert first["s2"] == (1, -2.0, 1500)

        # second micro-batch: counts must CONTINUE, not restart
        write_batch([("s1", 3000, 10.0, None, None)])
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM stateful_t WHERE series_id = 's1' ORDER BY n DESC"
        ).collect()
        latest = rows[0]
        assert (latest["n"], latest["sum_value"], latest["last_ts"]) == (3, 16.0, 3000)
        assert latest["min_value"] == 1.0 and latest["max_value"] == 10.0
    finally:
        q.stop()
