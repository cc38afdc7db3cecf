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
time). Composition adds one anti-join for the drop list — with NO
forced broadcast: on a real crawl 30-80% of docs are near-dups, so
the doomed list is corpus-scale; AQE broadcasts it when it is in
fact small and shuffle-joins when it isn't.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zestdb_spark.functions import dedup
from zestdb_spark.functions.textstats import (
    LANG_ORDER,
    lang_hit_cols,
    lang_pred_from_hits,
)


@lru_cache(maxsize=None)
def _gate_exprs():
    """(token-array, stopword-hit-count, score) constant expression
    templates of the stage-1 quality gate — memoized because the
    bench/driver rebuild the pipeline frame every cycle and each
    interpreted HOF costs dozens of py4j round-trips to construct
    (the textstats._hits precedent, r13). Same arithmetic as
    textstats.quality_exprs, staged over the __ztoks/__n/__zhits
    projections the caller sets up."""
    from zestdb_spark.functions.dedup import q6
    from zestdb_spark.functions.textstats import STOPWORDS, _tokens

    toks = F.filter(_tokens(), lambda t: t != "")
    zhits = F.size(
        F.filter(F.col("__ztoks"), lambda t: t.isin(*STOPWORDS["en"]))
    )
    ratio = q6(F.col("__zhits") / F.greatest(F.col("__n"), F.lit(1)))
    length_credit = F.least(F.col("__n"), F.lit(400)) / 400
    score = q6(ratio * 0.5 + length_credit * 0.5)
    return toks, zhits, score


def clean_corpus(
    docs: DataFrame,
    min_score: float = 0.1,
    jaccard_threshold: float = 0.8,
    k: int = 3,
) -> DataFrame:
    """→ (doc_id, n_tokens, score, pred_lang) for the cleaned corpus."""
    # stage 1: quality gate as a scan-local predicate — the same
    # arithmetic as textstats.quality_exprs (pinned equal by the
    # oracle), but with the token array and the stopword-hit count
    # STAGED in their own projections: the inlined expression trio
    # re-evaluates the interpreted token filter at every reference
    # (CodegenFallback HOFs are never CSE'd — the lang_id lesson),
    # which the gate predicate then multiplies again via pushdown.
    toks, zhits, score = _gate_exprs()
    s1 = docs.withColumn("__ztoks", toks)
    s2 = s1.withColumn("__n", F.size("__ztoks").cast("long")).withColumn(
        "__zhits", zhits
    )
    gated = (
        s2.withColumn("__score", score)
        .filter(F.col("__score") >= min_score)
        .drop("__ztoks", "__zhits")
    )
    # MATERIALIZE the gate once: three downstream subtrees consume
    # gated (the LSH signature pipeline, the anti-join's left side,
    # and the survivor annotation), and Spark has no cross-subtree
    # common-plan reuse without an identical exchange — unpersisted,
    # the interpreted token-filter gate above re-runs over the full
    # corpus three times. Persisted columns are the input's plus two
    # numerics — the standard inter-stage materialization of a staged
    # corpus pipeline, MEMORY_AND_DISK via the bounded registry so
    # long sessions can't accumulate blocks (an evicted block just
    # recomputes the gate for its rows, correctness-neutral).
    gated = dedup._persist_bounded(gated)

    # stage 2: LSH near-dup prune (the scale path — never all-pairs)
    pairs = dedup.minhash_lsh_pairs(gated, k, 64, 16, jaccard_threshold)
    doomed = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    # no broadcast hint — the doomed list is duplicate-rate sized
    # (corpus-scale on a dup-heavy crawl); AQE decides from the
    # runtime shuffle stats of the distinct above
    kept = gated.join(doomed, "doc_id", "left_anti")

    # stage 3: annotate survivors — hit counts staged in their own
    # projection (each is an interpreted HOF filter the argmax tree
    # references 2-4x; see textstats.lang_hit_cols), then the shared
    # decision tree over the staged columns. Still join-free.
    staged = kept.select(
        "doc_id",
        "__n",
        "__score",
        *[c.alias(f"__hits_{lang}") for lang, c in lang_hit_cols().items()],
    )
    pred = lang_pred_from_hits(
        {lang: F.col(f"__hits_{lang}") for lang in LANG_ORDER}
    )
    return staged.select(
        "doc_id",
        F.col("__n").alias("n_tokens"),
        F.col("__score").alias("score"),
        pred.alias("pred_lang"),
    )
