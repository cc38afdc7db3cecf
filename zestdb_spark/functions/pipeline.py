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

Everything stays one lazy DataFrame and — outside the LSH dedup
itself — ZERO extra joins: the quality gate is a pure scan-local
predicate on the document scan (not a semi-join back onto docs), and
the final annotation is one projection computing n_tokens/score/lang
together (an earlier stats⋈lang formulation scanned the survivors
twice and shuffled both sides on doc_id — measured ~25% of pipeline
time). Composition adds one anti-join for the drop list
(broadcast-able: pair-count sized, ≪ corpus size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zestdb_spark.functions import dedup
from zestdb_spark.functions.dedup import q6
from zestdb_spark.functions.textstats import LANG_ORDER, _hits, _tokens


def clean_corpus(
    docs: DataFrame,
    min_score: float = 0.1,
    jaccard_threshold: float = 0.8,
    k: int = 3,
) -> DataFrame:
    """→ (doc_id, n_tokens, score, pred_lang) for the cleaned corpus."""
    # stage 1: quality gate as a scan-local predicate (same arithmetic
    # as textstats.quality_score, kept alongside text so no join-back)
    n = F.size(F.filter(_tokens(), lambda t: t != "")).cast("long")
    ratio = q6(_hits("en") / F.greatest(n, F.lit(1)))  # ANSI: no 0-div
    score = q6(ratio * 0.5 + F.least(n, F.lit(400)) / 400 * 0.5)
    gated = (
        docs.withColumn("__n", n)
        .withColumn("__score", score)
        .filter(F.col("__score") >= min_score)
    )

    # stage 2: LSH near-dup prune (the scale path — never all-pairs)
    pairs = dedup.minhash_lsh_pairs(gated, k, 64, 16, jaccard_threshold)
    doomed = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    kept = gated.join(F.broadcast(doomed), "doc_id", "left_anti")

    # stage 3: annotate survivors in ONE projection (no stats⋈lang join)
    hits = {lang: _hits(lang) for lang in LANG_ORDER}
    cond_en = (hits["en"] >= hits["es"]) & (hits["en"] >= hits["de"]) & (hits["en"] >= hits["fr"]) & (hits["en"] > 0)
    cond_es = (hits["es"] >= hits["de"]) & (hits["es"] >= hits["fr"]) & (hits["es"] > 0)
    cond_de = (hits["de"] >= hits["fr"]) & (hits["de"] > 0)
    pred = (
        F.when(cond_en, "en")
        .when(cond_es, "es")
        .when(cond_de, "de")
        .when(hits["fr"] > 0, "fr")
        .otherwise("und")
    )
    return kept.select(
        "doc_id",
        F.col("__n").alias("n_tokens"),
        F.col("__score").alias("score"),
        pred.alias("pred_lang"),
    )
