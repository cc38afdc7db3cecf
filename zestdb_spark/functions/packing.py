"""Sequence chunking & packing for LLM pretraining pipelines.

Extension beyond the reference surface. Two operators:

- ``chunk_tokens`` — split each document's token stream into
  fixed-size windows (the "chunk one doc at a time" shape used for
  context-window-bounded fine-tuning data). Entirely scan-local array
  expressions: ZERO shuffles at any scale.

- ``pack_spans`` — GPT-style pack-and-split: conceptually concatenate
  ALL documents' tokens in doc_id order and cut the stream into
  fixed-length training blocks, emitting for every (document × block)
  overlap the span to copy. This needs a GLOBAL prefix sum of token
  counts, which naively is a single-partition window — a scale-killer.
  Instead it is computed as the classic two-level scan:

    1. per-doc token counts (scan-local),
    2. bucket subtotal per ``doc_id div bucket`` group (one partial
       agg on a compact int key),
    3. exclusive prefix over the ~n_docs/bucket subtotals with a
       single-partition window — safe because the input is already
       reduced by the bucket factor (control-plane-sized rows, never
       raw docs),
    4. join the bucket bases back (AQE broadcasts the control-plane-
       sized table when it fits) and add a within-bucket running sum
       (window partitioned BY BUCKET — parallel again).

  All arithmetic is integer, so results are bit-exact against the
  DuckDB oracle's plain window cumsum.

Both emit deterministic output for any partitioning/cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _toks() -> F.Column:
    return F.filter(F.split(F.col("text"), " "), lambda t: t != "")


def chunk_tokens(docs: DataFrame, chunk_size: int = 64) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, chunk_text): consecutive
    ``chunk_size``-token windows per document; the final chunk may be
    short. Docs with zero tokens produce no chunks."""
    c = int(chunk_size)
    toks = _toks()
    n_chunks = F.ceil(F.size(toks) / F.lit(c)).cast("int")
    idxs = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    exploded = docs.select(
        "doc_id", toks.alias("__toks"), F.explode(idxs).alias("chunk_idx")
    )
    chunk = F.slice(F.col("__toks"), F.col("chunk_idx") * c + 1, c)
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def pack_spans(
    docs: DataFrame, seq_len: int = 256, bucket: int = 4096
) -> DataFrame:
    """(block_id, doc_id, doc_tok_start, block_tok_start, span_len):
    for each training block of ``seq_len`` tokens in the packed
    stream (all docs concatenated in doc_id order), the piece of each
    document that lands in it. A doc spanning a block boundary emits
    one row per touched block; empty docs emit nothing.

    Token offsets are 0-based: ``doc_tok_start`` indexes into the
    doc's own token array, ``block_tok_start`` into the block.

    Scale bound: the second prefix-sum level is a single-task window
    over the bucket subtotals — ceil(max_doc_id / bucket) rows of two
    longs. At the default bucket=4096 that is one task over ~2.4 M
    rows per 10^10 of doc-id space: fine past 10^10 documents, and
    the knob is ``bucket`` — size it so max_doc_id/bucket stays below
    ~10^7 (a third level would only be needed past ~10^11 of doc-id
    space WITH a bucket too small to raise, which doesn't occur:
    bucket can always grow, it only trades level-1 window width).
    Doc ids may be sparse and arbitrarily large (int64) — offsets use
    integer div throughout, exact past 2^53 (property-tested).
    """
    s = int(seq_len)
    counts = docs.select(
        "doc_id", F.size(_toks()).cast("long").alias("n")
    ).filter(F.col("n") > 0)
    # integer div, not double-divide-and-cast: doc_id > 2^53 would
    # round through IEEE double and could bucket a boundary doc wrong,
    # corrupting the prefix sum (same reason 'off div s' below)
    counts = counts.withColumn("b", F.expr(f"doc_id div {int(bucket)}"))

    # two-level exclusive prefix sum of n in doc_id order
    subtotals = counts.groupBy("b").agg(F.sum("n").alias("bn"))
    # global (partition-less) window — intentional: the single task is
    # the documented level-2 bound above. WindowExec's blanket
    # "No Partition Defined" WARN is quieted in harden_session (a
    # constant partition key can't silence it — the optimizer folds it
    # back to an empty spec; see corpus_ops.vocab_topk)
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    bases = subtotals.select(
        "b", F.coalesce(F.sum("bn").over(wb), F.lit(0)).alias("base")
    )
    wd = (
        Window.partitionBy("b")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # no broadcast hint on the bucket-base table: it is n_docs/bucket
    # sized — small by construction at sane bucket settings, but still
    # data-dependent, so the size decision belongs to AQE (which
    # broadcasts it when it fits and falls back to a co-partitioned
    # shuffle join on the compact int key when it doesn't) — the same
    # policy as every other data-dependent join this round
    offs = (
        counts.join(bases, "b")
        .withColumn("off", F.col("base") + F.coalesce(F.sum("n").over(wd), F.lit(0)))
        .select("doc_id", "n", "off")
    )

    # integer division (div), not double-divide-and-cast: exact at any
    # stream length (double mantissa runs out past 2^53 tokens)
    first_b = F.expr(f"off div {s}")
    last_b = F.expr(f"(off + n - 1) div {s}")
    spans = offs.select(
        "doc_id", "n", "off", F.explode(F.sequence(first_b, last_b)).alias("block_id")
    )
    blk_start = F.col("block_id") * s  # block's global token offset
    doc_tok_start = F.greatest(blk_start - F.col("off"), F.lit(0))
    block_tok_start = F.greatest(F.col("off") - blk_start, F.lit(0))
    span_len = (
        F.least(F.col("off") + F.col("n"), blk_start + s)
        - F.greatest(F.col("off"), blk_start)
    )
    return spans.select(
        "block_id",
        "doc_id",
        doc_tok_start.alias("doc_tok_start"),
        block_tok_start.alias("block_tok_start"),
        span_len.alias("span_len"),
    )


def shard_plan(
    blocks: DataFrame, n_shards: int, key: str = "block_id"
) -> DataFrame:
    """(key, shard, pos): the deterministic last-mile layout — assign
    every training block to a shard by ``hash_bucket(key)`` and give
    it a within-shard position by HASH order (md5 hex, key tie-break).

    Hash order IS the reproducible shuffle: training wants blocks in
    an order uncorrelated with document order, and ordering by a hash
    of the id gives exactly that while staying a pure function of the
    data — re-runs, retries, and repartitioning cannot change a
    single position (the property rand() shuffles lose). Shard sizes
    concentrate tightly around n/n_shards (md5 uniformity).

    Plan: one distinct on the key + ONE window per shard partition.
    At 100 TB the writer streams each shard partition in pos order —
    ``write_shards`` below."""
    if n_shards < 1:
        raise ValueError(f"shard_plan: n_shards must be >= 1, got {n_shards}")
    from zestdb_spark.functions.corpus_ops import hash_bucket

    b = blocks.select(key).distinct()
    hx = F.md5(F.col(key).cast("string"))
    w = Window.partitionBy("shard").orderBy(hx.asc(), F.col(key).asc())
    return (
        b.withColumn("shard", hash_bucket(F.col(key), int(n_shards)).cast("int"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
    )


def write_shards(
    blocks: DataFrame,
    root: str,
    n_shards: int,
    key: str = "block_id",
) -> DataFrame:
    """Write the blocks as ``root/shard=K/`` parquet, each shard's rows
    sorted by the plan's ``pos`` (one file per shard partition via
    repartition on the shard key), and return the per-shard manifest
    (shard, n_blocks, n_rows) the consumer checks before training.
    Deterministic end to end: same input → byte-stable shard
    membership and order."""
    plan = shard_plan(blocks.select(key).distinct(), n_shards, key)
    placed = blocks.join(plan, key)
    (
        # sort by (shard, pos), not pos alone: repartition hashes shard
        # VALUES, so two shards can share one task (murmur3 collision at
        # small n_shards) — a pos-only sort would interleave them and
        # leave each shard's file order resting on the dynamic-partition
        # writer's own (stability-unspecified) sort
        placed.repartition(int(n_shards), "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(root)
    )
    return placed.groupBy("shard").agg(
        F.count_distinct(F.col(key)).alias("n_blocks"),
        F.count(F.lit(1)).alias("n_rows"),
    )
