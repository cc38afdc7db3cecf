"""The HLL register table is a groupBy-max — Spark maintains it
INCREMENTALLY over a stream with zero extra code: each micro-batch
folds its rows into the per-register max state. Pin that the streamed
sketch after two batches equals the batch sketch of all data (the
merge law, streaming edition) and that the estimate derived from the
streamed registers matches exactly."""

from __future__ import annotations

from zestdb_spark.functions import sketches


def test_streaming_hll_accumulates_across_batches(spark, tmp_path):
    src = str(tmp_path / "vals")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(lo, hi):
        spark.range(lo, hi).selectExpr("id AS v").write.mode("append").parquet(src)

    write_batch(0, 3000)
    stream = spark.readStream.schema("v long").parquet(src)
    q = (
        sketches.hll_registers(stream, "v", p=12)
        .writeStream.format("memory")
        .queryName("hll_stream_t")
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        write_batch(2000, 6000)  # overlapping second batch
        q.processAllAvailable()
        streamed = spark.sql("SELECT * FROM hll_stream_t")
        direct = sketches.hll_registers(
            spark.range(0, 3000).selectExpr("id AS v").unionAll(
                spark.range(2000, 6000).selectExpr("id AS v")
            ),
            "v",
            p=12,
        )
        assert sorted(map(tuple, streamed.collect())) == sorted(
            map(tuple, direct.collect())
        )
        # and the estimate derived from the streamed state is identical
        (es,) = sketches.hll_estimate(streamed).collect()
        (ed,) = sketches.hll_estimate(direct).collect()
        assert es == ed
    finally:
        q.stop()
