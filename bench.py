"""Benchmark harness — one JSON line on stdout.

Runs the headline queries from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``. Each query is timed as a full
plan-build + execute + collect (results are API-sized: top-k rows or
1-row aggregates). One warm-up action first so JVM/codegen startup
isn't billed to the first query.

NOISE PROTOCOL (round 8): this host drifts (measured ±40% between
sessions — BASELINE.md's A/B calibration), so one sample per query is
not a number. The suite now runs ``$SPARK_GRAFT_BENCH_PASSES`` full
passes (default 2; pass 0 times min-of-2 back-to-back cycles to absorb
JIT, later passes one cycle each — a query's revisits are naturally
spaced by the rest of the suite), reports the per-query MIN across
everything observed as the headline ``queries``/``value``, and carries
the raw per-pass timings plus the 1-minute loadavg at each pass start
in ``passes`` so a drifted sample is diagnosable after the fact. A
load guard before the FIRST pass waits (bounded) for an externally
busy machine to settle; between passes only the load is recorded —
our own just-finished pass dominates the 1-minute average there, so
sleeping on it would always trigger.

Output: FINAL stdout line is the compact composite only —
  {"metric": "suite_sec", "value": <sum of per-query mins>,
   "unit": "sec", "queries": {name: sec, ...}, "sf": <float>}
The raw per-pass timings + load1 go to an earlier stdout line and to
the ``bench_passes.json`` sidecar (the consumer keeps only a bounded
tail of stdout, so the last line must stay small).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

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
    # dedup_ngram_jaccard stays: the bench contract is add-only (rows
    # in BENCH_r12 may never be removed or renamed). text_gopher is the
    # r13 ADDITION — a graded family row the suite never timed.
    "dedup_ngram_jaccard",
    "text_gopher",
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
    # the xxhash64-gram-key deployment variant (text-key twin stays the
    # graded row; same oracle, identical output on every fixture)
    "dedup_spans_hashed",
    "text_unigram",
    "text_bm25",
    "dedup_semantic",
    "text_bpe_pairs",
    # sk_hll_partkey stays (add-only bench contract); sk_hll_fast is
    # the r13 ADDITION — the xxhash64 deployment variant a user runs
    # at 100 TB (the sk_quantiles_fast precedent, VERDICT r11 #4)
    "sk_hll_partkey",
    "sk_hll_fast",
    # the xxhash64 deployment variant — what a user runs at 100 TB;
    # the md5 (oracle-replayable) twin sk_quantiles stays graded for
    # correctness but is not the throughput row (VERDICT r11 #4)
    "sk_quantiles_fast",
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
    # round-8: two-pass exact heavy hitters (bounded-state MG candidate
    # pass + broadcast exact recount)
    "sk_heavy_hitters",
    # round-9 continuation: product-quantization ANN (fused Arrow
    # encode + ADC scoring in one pass), the batch k-NN join (cell
    # equi-join + per-qid window), M4 downsampling (one combinable
    # groupBy), and the Z-order clustering key (pure-codegen scan)
    "sim_topk_pq",
    "sim_knn_join",
    "rs_m4_downsample",
    "layout_zorder",
]


# rows whose .collect() materializes a table-sized result through the
# bench protocol (1M+ rows at sf0.1): the collect dominates the
# operator, so record a count()-terminated EXECUTION twin alongside
# (VERDICT r11 #8) — `sec` stays the end-to-end number, `exec_sec`
# is the operator cost with result transfer excluded.
PRECOLLECT_TWINS = (
    "layout_zorder",
    "text_tfidf",
    "an_zscore",
    "dedup_spans_hashed",
    # r14 additions: both rows measured collect-bound at sf1 (asof
    # exec marginal ≈ 0.05-0.1 s/10× vs 0.75 end-to-end — the delta is
    # driver-side transfer of the ~200k-row result the bench contract
    # collects; li_since_filter was diagnosed the same way in r13)
    "tmp_asof_join",
    "li_since_filter",
)


def run_pass(
    spark, qs, names, sf_dir, runs: int
) -> tuple[dict[str, object], dict[str, str], dict[str, float], dict[str, float]]:
    """One full suite pass: time each query (min of ``runs`` full
    build+execute+collect cycles). FAIL-SOFT per query: one broken
    fixture must not zero the whole suite's signal (round 4 lesson) —
    record ``{"err": ...}`` and keep going. Also returns each query's
    FIRST-cycle time (``cold``): the cycle right after clearCache(),
    before any within-query persisted intermediate is warm — VERDICT
    r13 asked for this alongside the min so persist-bearing rows'
    cold cost is visible in the artifact (headline protocol
    unchanged)."""
    timings: dict[str, object] = {}
    errors: dict[str, str] = {}
    exec_timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in names:
        best = float("inf")
        try:
            # Persisted intermediates (LSH signatures/candidates, pipeline
            # stages) from EARLIER queries otherwise accumulate across the
            # session, fill the storage pool, and push later shuffle-heavy
            # queries into spill — cross-query pollution, not query cost.
            # Cache reuse WITHIN a query's cycles still happens (the
            # second run re-persists the identical plan post-clear).
            spark.catalog.clearCache()
            for i in range(runs):
                t0 = time.time()
                qs[name](spark, sf_dir).collect()
                dt = time.time() - t0
                if i == 0:
                    cold[name] = round(dt, 3)
                best = min(best, dt)
            timings[name] = round(best, 3)
            if name in PRECOLLECT_TWINS:
                # Execution twin: operator cost WITHOUT driver-side
                # result transfer. NOT .count() — Catalyst prunes
                # unreferenced projections under count() (an_zscore's
                # window, dedup_spans_hashed's array filter vanish from
                # the plan), under-reporting cost. Hashing a struct of
                # every column forces full evaluation; the 1-row sum is
                # all that crosses to the driver. bit_xor, not sum —
                # summing hashes overflows long under ANSI mode.
                t0 = time.time()
                qs[name](spark, sf_dir).select(
                    F.bit_xor(F.xxhash64(F.struct("*")))
                ).collect()
                exec_timings[name] = round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — any query failure
            msg = f"{type(exc).__name__}: {exc}"
            errors[name] = msg[:300]
            timings[name] = {"err": msg[:300]}
    return timings, errors, exec_timings, cold


def _load1() -> float:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # platform without loadavg
        return -1.0


def _settle(cpus: int, max_wait_s: float = 90.0) -> float:
    """Bounded wait for an externally busy host before the FIRST pass:
    a loadavg above the core count means someone else's work would be
    billed to our queries. Returns seconds waited."""
    t0 = time.time()
    while _load1() > cpus and time.time() - t0 < max_wait_s:
        time.sleep(5.0)
    return round(time.time() - t0, 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    n_passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2")))
    spacing_s = float(os.environ.get("SPARK_GRAFT_BENCH_SPACING_S", "0"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    waited = _settle(cpus)

    spark = get_spark("bench")
    qs = entry.queries()
    names = [n for n in BENCH_QUERIES if n in qs]

    # warm-up: JVM, parquet footer reads, codegen (also fail-soft — a
    # broken first query must not abort the suite before it starts)
    try:
        qs[names[0]](spark, sf_dir).collect()
    except Exception:
        pass

    passes: list[dict] = []
    all_errors: dict[str, str] = {}
    for p in range(n_passes):
        if p and spacing_s:
            time.sleep(spacing_s)
        load1 = _load1()
        timings, errors, exec_timings, cold = run_pass(
            spark, qs, names, sf_dir, runs=2 if p == 0 else 1
        )
        all_errors.update(errors)
        passes.append(
            {"load1": load1, "sec": timings, "exec_sec": exec_timings, "cold": cold}
        )

    # composite: per-query min across every observed cycle — the
    # round-over-round comparison signal (BASELINE.md's method, now in
    # the tool). A query that errored in EVERY pass keeps its error.
    composite: dict[str, object] = {}
    for name in names:
        vals = [
            ps["sec"][name] for ps in passes if isinstance(ps["sec"].get(name), float)
        ]
        composite[name] = min(vals) if vals else passes[-1]["sec"][name]

    exec_composite = {
        name: min(ps["exec_sec"][name] for ps in passes if name in ps["exec_sec"])
        for name in PRECOLLECT_TWINS
        if any(name in ps["exec_sec"] for ps in passes)
    }

    # cold-cycle companion (VERDICT r13 "What's wrong" #1): pass 0's
    # FIRST cycle per query — the run where within-query persisted
    # intermediates (bm25 base projection, clean_corpus gate, minhash
    # signatures, MG output) are built from parquet, not reused. The
    # headline stays the min (protocol unchanged, comparable across
    # rounds); this makes the warm-vs-cold spread visible per row.
    sec_cold = {
        name: passes[0]["cold"][name]
        for name in names
        if name in passes[0].get("cold", {})
    }

    result = {
        "metric": "suite_sec",
        "value": round(sum(t for t in composite.values() if isinstance(t, float)), 3),
        "unit": "sec",
        "queries": composite,
        "sec_cold": sec_cold,
        "exec_sec": exec_composite,
        "sf": sf,
        # the headline numbers are per-query MINs across every observed
        # cycle — say so IN the artifact (VERDICT r10 #9) so cross-round
        # deltas are read as like-for-like: pass 0 runs each query
        # twice back-to-back, later passes once each
        "passes": n_passes,
        "cycles": n_passes + 1,
        "agg": "min",
    }
    if waited:
        result["settle_wait_s"] = waited
    if all_errors:
        result["errors"] = len(all_errors)
    # Raw per-pass timings + host load go to a sidecar (and an EARLY
    # stdout line): the harness that consumes this output keeps only a
    # bounded tail of stdout, so the FINAL line must stay compact —
    # exactly the composite, nothing else.
    sidecar = {"passes": passes, "composite": result}
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_passes.json"),
            "w",
        ) as fh:
            json.dump(sidecar, fh)
    except OSError:
        pass
    print(json.dumps({"passes": passes}))
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
