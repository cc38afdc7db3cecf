"""Composed training-data pipeline (the capstone extension).

``clean_corpus`` chains the extension operators the way a real
pretraining-data job does:
  1. quality gate   — stopword/length score ≥ threshold (textstats),
  2. near-dup prune — MinHash-LSH candidates, exactly verified to
     n-gram Jaccard ≥ τ (the scale path — never an all-pairs shingle
     join); of each duplicate pair the LOWER doc_id survives (drop
     every doc that appears as the higher id of a pair —
     deterministic, order-free),
  3. annotate       — token counts + language ID on the survivors.

Everything stays one lazy DataFrame: Catalyst sees the whole chain, so
the quality filter prunes documents BEFORE shingling (predicate
pushdown through the pipeline), and the dedup self-join only processes
gated docs. At 100 TB each stage is the already-audited scale shape
(SCALE.md); composition adds one anti-join (broadcast-able: the drop
list is pair-count sized, ≪ corpus size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zestdb_spark.functions import dedup, textstats


def clean_corpus(
    docs: DataFrame,
    min_score: float = 0.1,
    jaccard_threshold: float = 0.8,
    k: int = 3,
) -> DataFrame:
    """→ (doc_id, n_tokens, score, pred_lang) for the cleaned corpus."""
    scored = textstats.quality_score(docs).filter(F.col("score") >= min_score)
    gated = docs.join(scored.select("doc_id"), "doc_id", "left_semi")

    pairs = dedup.minhash_lsh_pairs(gated, k, 64, 16, jaccard_threshold)
    doomed = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    kept = gated.join(F.broadcast(doomed), "doc_id", "left_anti")

    stats = textstats.quality_score(kept).select("doc_id", "n_tokens", "score")
    lang = textstats.lang_id(kept)
    return stats.join(lang, "doc_id")
