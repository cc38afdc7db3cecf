"""Streaming exact dedup: duplicates are dropped ACROSS micro-batches
(keyed state), new keys pass, and the content-addressed variant
suppresses re-crawls under fresh doc_ids."""

from __future__ import annotations

from zestdb_spark.streaming.dedup import stream_dedup, stream_dedup_by_content

_SCHEMA = "doc_id long, text string, ts timestamp"


def _write(spark, src: str, rows) -> None:
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _drain(spark, src: str, ck: str, dedup_fn) -> list:
    out: list = []
    stream = (
        spark.readStream.schema(_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        dedup_fn(stream)
        .writeStream.foreachBatch(lambda df, _id: out.extend(df.collect()))
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return out


def test_stream_dedup_drops_across_batches(spark, tmp_path):
    from datetime import datetime, timezone

    t = lambda s: datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)
    src = str(tmp_path / "in")
    # two landing files → two micro-batches (maxFilesPerTrigger=1):
    # d1 recurs in the second batch and must be dropped by keyed state
    _write(spark, src, [(1, "alpha", t(100)), (2, "beta", t(110))])
    _write(spark, src, [(1, "alpha", t(120)), (3, "gamma", t(130))])

    out = _drain(
        spark, src, str(tmp_path / "ck"),
        lambda s: stream_dedup(s, ("doc_id",), "ts", "1 hour"),
    )
    assert sorted(r["doc_id"] for r in out) == [1, 2, 3]
    # the FIRST occurrence is the one that passed
    assert {r["doc_id"]: r["ts"] for r in out}[1] == t(100)


def test_stream_dedup_by_content_catches_new_ids(spark, tmp_path):
    from datetime import datetime, timezone

    t = lambda s: datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)
    src = str(tmp_path / "in")
    # doc 20 is a re-crawl of doc 10's content under a new id; docs
    # 30/31 are metadata-only rows with NULL text — both must pass
    # (no content to deduplicate on), not collapse into one NULL key
    _write(spark, src, [(10, "same words", t(100)), (11, "unique", t(105))])
    _write(spark, src, [(20, "same words", t(115)), (30, None, t(116)), (31, None, t(117))])

    out = _drain(
        spark, src, str(tmp_path / "ck"),
        lambda s: stream_dedup_by_content(s, "text", "ts", "1 hour"),
    )
    assert sorted(r["doc_id"] for r in out) == [10, 11, 30, 31]
    # the helper key column does not leak into the output
    assert "__content_key" not in out[0].asDict()
