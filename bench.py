"""Benchmark harness — one JSON line on stdout.

Runs the headline queries from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``. Each query is timed as a full
plan-build + execute + collect (results are API-sized: top-k rows or
1-row aggregates). One warm-up action first so JVM/codegen startup
isn't billed to the first query.

Output: {"metric": "suite_sec", "value": <total>, "unit": "sec",
         "queries": {name: sec, ...}, "sf": <float>}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry
from zestdb_spark.session import get_spark

#: Headline set: the heaviest/most representative operators. Volume
#: queries run on the lineitem mapping (~600k rows at sf0.1); the rest
#: exercise per-series top-k, filters, exact median, and extensions.
BENCH_QUERIES = [
    "li_last_n_multi",
    "li_since_filter",
    "li_range_sum",
    "li_range_median",
    "li_length",
    "ts_last_n_multi",
    "ts_since",
    "filter_equals_multi",
    "agg_median",
    "agg_sd",
    "dedup_exact",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "sim_topk_bruteforce",
    "text_quality",
    "text_langid",
    "tmp_asof_join",
    "tmp_sessionize",
    "tmp_rollup_hour",
    "rs_locf_hourly",
    "an_revenue_join",
    "pipe_clean_corpus",
    "text_tfidf",
    "text_decontam",
    "dedup_spans",
    "text_unigram",
    "text_bm25",
    "dedup_semantic",
    "text_bpe_pairs",
    "sk_hll_partkey",
    "sk_quantiles",
    "corpus_dsir",
    "an_zscore",
    "ev_funnel",
    "ev_retention",
    "dedup_cross",
    # round-7 additions: the star-CC dedup pipeline (pairs → connected
    # components → canonical survivor) and the equi-depth histogram
    "dedup_keep",
    "tbl_histogram_eq",
    # round-7 continuation: the three new scan-shaped training ops —
    # trained-probe scoring, temperature mixing, PCA projection
    "text_probe_score",
    "corpus_temp_mix",
    "sim_pca_project",
]


def run_suite(
    spark, qs, names, sf_dir, runs: int = 2
) -> tuple[dict[str, object], dict[str, str]]:
    """Time each query (min of ``runs`` full build+execute+collect
    cycles). FAIL-SOFT per query: one broken fixture must not zero the
    whole suite's signal (round 4 lesson) — record ``{"err": ...}`` and
    keep going."""
    timings: dict[str, object] = {}
    errors: dict[str, str] = {}
    for name in names:
        best = float("inf")
        try:
            # Persisted intermediates (LSH signatures/candidates, pipeline
            # stages) from EARLIER queries otherwise accumulate across the
            # session, fill the storage pool, and push later shuffle-heavy
            # queries into spill — cross-query pollution, not query cost.
            # Cache reuse WITHIN a query's two runs still happens (the
            # second run re-persists the identical plan post-clear).
            spark.catalog.clearCache()
            for _ in range(runs):
                t0 = time.time()
                qs[name](spark, sf_dir).collect()
                best = min(best, time.time() - t0)
            timings[name] = round(best, 3)
        except Exception as exc:  # noqa: BLE001 — any query failure
            msg = f"{type(exc).__name__}: {exc}"
            errors[name] = msg[:300]
            timings[name] = {"err": msg[:300]}
    return timings, errors


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench")
    qs = entry.queries()
    names = [n for n in BENCH_QUERIES if n in qs]

    # warm-up: JVM, parquet footer reads, codegen (also fail-soft — a
    # broken first query must not abort the suite before it starts)
    try:
        qs[names[0]](spark, sf_dir).collect()
    except Exception:
        pass

    # min of 2 runs per query: the first run can absorb stragglers from
    # JIT/GC; the min is the steadier signal for round-over-round compare.
    timings, errors = run_suite(spark, qs, names, sf_dir)

    result = {
        "metric": "suite_sec",
        "value": round(sum(t for t in timings.values() if isinstance(t, float)), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        result["errors"] = len(errors)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
