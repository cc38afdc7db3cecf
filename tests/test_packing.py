"""Unit coverage for sequence chunking / pack-and-split (packing.py).

Properties checked beyond the driver oracle:
- chunking reassembles to the original token stream,
- pack_spans partitions the concatenated stream exactly: every block
  except the last carries seq_len tokens, spans are disjoint and
  complete per doc, and results are invariant to the bucket size
  (the two-level prefix sum is an execution detail).
"""

from __future__ import annotations

import pytest

from zestdb_spark.functions import packing

DOCS = [
    (0, ""),  # empty — must vanish
    (1, "a b c"),  # shorter than one chunk
    (2, " ".join(f"t{i}" for i in range(10))),  # multi-chunk at size 4
    (3, "x"),
    (4, " ".join(f"u{i}" for i in range(7))),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_chunk_tokens_shapes(docs):
    rows = packing.chunk_tokens(docs, 4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 0 not in by_doc
    assert [r["n_tokens"] for r in sorted(by_doc[2], key=lambda r: r["chunk_idx"])] == [4, 4, 2]
    assert [r["n_tokens"] for r in by_doc[1]] == [3]
    # chunks reassemble to the doc
    text2 = " ".join(
        r["chunk_text"] for r in sorted(by_doc[2], key=lambda r: r["chunk_idx"])
    )
    assert text2 == DOCS[2][1]


def test_pack_spans_partitions_stream(docs):
    seq_len = 8
    rows = packing.pack_spans(docs, seq_len, bucket=2).collect()
    # total packed tokens = 3 + 10 + 1 + 7 = 21 → blocks 0..2
    per_block = {}
    for r in rows:
        per_block.setdefault(r["block_id"], 0)
        per_block[r["block_id"]] += r["span_len"]
    assert per_block == {0: 8, 1: 8, 2: 5}
    # per-doc spans are complete and start at 0
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, n in [(1, 3), (2, 10), (3, 1), (4, 7)]:
        spans = sorted(per_doc[doc_id], key=lambda r: r["doc_tok_start"])
        assert spans[0]["doc_tok_start"] == 0
        assert sum(s["span_len"] for s in spans) == n
        # contiguous
        acc = 0
        for s in spans:
            assert s["doc_tok_start"] == acc
            acc += s["span_len"]
    # block-internal offsets stay inside the block
    assert all(0 <= r["block_tok_start"] < seq_len for r in rows)


def test_pack_spans_bucket_invariance(docs):
    a = sorted(tuple(r) for r in packing.pack_spans(docs, 8, bucket=1).collect())
    b = sorted(tuple(r) for r in packing.pack_spans(docs, 8, bucket=4096).collect())
    assert a == b


def test_pack_spans_exact_block_fit(spark):
    """Docs summing exactly to block boundaries: no straddling spans."""
    docs = spark.createDataFrame(
        [(0, " ".join(["a"] * 4)), (1, " ".join(["b"] * 4))],
        "doc_id long, text string",
    )
    rows = packing.pack_spans(docs, 4).collect()
    assert sorted((r["block_id"], r["doc_id"], r["span_len"]) for r in rows) == [
        (0, 0, 4),
        (1, 1, 4),
    ]


def test_shard_plan_is_deterministic_partition_and_dense(spark):
    from zestdb_spark.functions.packing import shard_plan

    blocks = spark.createDataFrame(
        [(i,) for i in range(200)], "block_id long"
    )
    a = shard_plan(blocks, 8).collect()
    b = shard_plan(blocks.repartition(7), 8).collect()
    ka = {(r["block_id"], r["shard"], r["pos"]) for r in a}
    kb = {(r["block_id"], r["shard"], r["pos"]) for r in b}
    assert ka == kb  # partitioning cannot move a single position
    assert len(ka) == 200  # every block exactly once
    by_shard = {}
    for _, s, p in ka:
        by_shard.setdefault(s, []).append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps)))  # dense 0..n-1 per shard
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) <= 2 * (200 // 8)  # md5 balance sanity


def test_write_shards_round_trip(spark, tmp_path):
    from pyspark.sql import functions as F

    from zestdb_spark.functions.packing import write_shards

    blocks = spark.createDataFrame(
        [(i, f"payload-{i}") for i in range(64)], "block_id long, payload string"
    )
    root = str(tmp_path / "shards")
    manifest = {r["shard"]: (r["n_blocks"], r["n_rows"])
                for r in write_shards(blocks, root, 4).collect()}
    back = spark.read.parquet(root)
    assert back.count() == 64
    assert back.select("block_id").distinct().count() == 64
    got = {r["shard"]: r["n"] for r in back.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert {s: n for s, (nb, n2) in manifest.items() for n in [n2]} == got
    assert sum(n for _, n in manifest.values()) == 64
