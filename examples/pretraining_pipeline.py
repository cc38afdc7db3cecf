"""End-to-end pretraining-data pipeline over the engine's operators.

The "switch your corpus job to this repo" walkthrough: one lazy-where-
possible flow from a raw document crawl to packed training sequences,
each stage an operator the correctness gate grades individually.

    raw documents
      │ 1. quality gate        textstats.gopher_quality (rule filter)
      │ 2. model-based score   probe.fit_probe → score_probe
      │ 3. near-dup prune      pipeline.clean_corpus (MinHash-LSH)
      │ 4. decontamination     corpus_ops.decontaminate
      │ 5. source mixing       corpus_ops.temperature_mix (α = 0.5)
      │ 6. tokenizer           corpus_ops.bpe_train → bpe_encode
      │ 7. packing             packing.pack_spans (GPT-style)
      ▼ training shards

Run:  python examples/pretraining_pipeline.py [sf_dir]
(defaults to /root/testdata/sf0.001; prints per-stage row counts).
Every stage is scan-local or single-shuffle — the composition keeps
the 100 TB shapes of its parts (see SCALE.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402


def run(spark, sf_dir: str) -> dict[str, int]:
    """Execute the pipeline; returns per-stage row counts (the smoke
    test asserts monotone narrowing and non-triviality)."""
    from zestdb_spark.functions import corpus_ops, packing, probe, textstats
    from zestdb_spark.functions.pipeline import clean_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = {"raw": docs.count()}

    # 1. rule-based quality gate (Gopher-style thresholds, scan-local)
    gated = textstats.gopher_quality(docs).filter("passes").select("doc_id")
    docs1 = docs.join(gated, "doc_id", "semi")
    counts["rule_gated"] = docs1.count()

    # 2. model-based quality: fit the linear probe on the gated docs
    # (label: the hand-rule score), score EVERYTHING, keep the top half
    feats = probe.quality_features(docs1)
    labeled = feats.join(
        textstats.quality_score(docs1).select("doc_id", "score"), "doc_id"
    )
    model = probe.fit_probe(labeled, "score")
    scored = probe.score_probe(probe.quality_features(docs1), model)
    cutoff = scored.agg(F.expr("percentile(probe_score, 0.5)")).first()[0]
    docs2 = docs1.join(
        scored.filter(F.col("probe_score") >= cutoff).select("doc_id"),
        "doc_id",
        "semi",
    )
    counts["probe_kept"] = docs2.count()

    # 3. near-duplicate pruning (MinHash-LSH path + annotation)
    cleaned = clean_corpus(docs2, min_score=0.0)
    docs3 = docs2.join(cleaned.select("doc_id"), "doc_id", "semi")
    counts["deduped"] = docs3.count()

    # 4. benchmark decontamination (shingle overlap vs an eval set —
    # here: a tiny held-out slice standing in for the benchmark);
    # decontaminate returns the CONTAMINATED doc ids — anti-join them
    evalset = docs.orderBy("doc_id").limit(5).select("doc_id", "text")
    hits = corpus_ops.decontaminate(docs3, evalset)
    docs4 = docs3.join(hits.select("doc_id"), "doc_id", "anti")
    counts["decontaminated"] = docs4.count()

    # 5. temperature mixing across sources (upsample rare sources);
    # each (doc, copy) becomes its own packable unit with a unique id
    mixed = corpus_ops.temperature_mix(docs4, alpha=0.5)
    docs5 = mixed.join(docs4.select("doc_id", "text"), "doc_id").select(
        (F.col("doc_id") * 16 + F.col("copy")).alias("doc_id"), "text"
    )
    counts["mixed"] = docs5.count()

    # 6. BPE: train on the mixed corpus, tokenize it JVM-side
    merges = corpus_ops.bpe_train(docs5, n_merges=16)
    encoded = corpus_ops.bpe_encode(docs5, merges)
    counts["bpe_merges"] = len(merges)
    # 6b. the OTHER subword family as a drop-in: unigram-LM (Viterbi)
    # against a trained vocabulary — same output shape, so the packer
    # below would consume either stream unchanged
    uvocab = corpus_ops.unigram_train(docs5, vocab_size=64, max_piece_len=4)
    counts["unigram_pieces"] = len(uvocab)
    counts["unigram_tokens"] = int(
        corpus_ops.unigram_encode(docs5, uvocab)
        .agg(F.sum("n_pieces"))
        .first()[0]
    )

    # 7. pack the SUBWORD stream into fixed-length training sequences
    # (the separator byte becomes the packer's token delimiter)
    pack_in = encoded.select(
        "doc_id",
        F.replace(
            F.col("encoded"), F.lit(corpus_ops.BPE_SEP), F.lit(" ")
        ).alias("text"),
    )
    packed = packing.pack_spans(pack_in, seq_len=256)
    counts["sequences"] = packed.agg(F.countDistinct("block_id")).first()[0]

    # 8. last mile: hash-deterministic shard layout (hash order = the
    # reproducible training shuffle); every sequence lands in exactly
    # one shard with a stable position
    plan = packing.shard_plan(packed, n_shards=4)
    counts["sharded"] = plan.count()
    return counts


def main() -> None:
    from zestdb_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("pretraining_pipeline")
    for stage, n in run(spark, sf_dir).items():
        print(f"{stage:16s} {n}")
    spark.stop()


if __name__ == "__main__":
    main()
