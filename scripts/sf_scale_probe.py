"""sf-scaling probe: engine-vs-DuckDB min-of-N on the DATA-DOMINATED
query tier at two scale factors, reporting marginal cost per 10x —
the evidence VERDICT r10 #1 asked for (every sf0.1 ratio above 2x
rested on "the ~0.3-0.5 s per-query scheduling floor dominates";
this measures what actually grows when the data does).

Per row and per sf dir it reports:
  engine_sec  min over N full build+execute+collect cycles (Spark,
              cache cleared between cycles — the bench.py protocol)
  oracle_sec  min over N DuckDB executions of the SAME row's exact
              oracle SQL on the SAME parquet files
  rows        output rows (sanity: both sides must agree)

Marginal cost per 10x = engine_sec(sf1) - engine_sec(sf0.1), the
number that predicts cluster behavior: the floor cancels out.

Usage:
  python scripts/gen_sf.py /tmp/zest_sf1 10     # once
  python scripts/sf_scale_probe.py [sf_small] [sf_big] [runs] [name...]

Defaults: /root/testdata/sf0.1  /tmp/zest_sf1  3  <the heavy tier>.
Writes a JSON line per row + a markdown table to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: VERDICT r10 #1's data-dominated tier: dedup, ANN, corpus scoring,
#: sketches, anomaly joins, and the windowed top-k volume read.
HEAVY_TIER = [
    "dedup_minhash",
    "dedup_keep",
    "dedup_cross",
    "dedup_semantic",
    "dedup_spans",
    "pipe_clean_corpus",
    "text_tfidf",
    "text_decontam",
    "sk_hll_partkey",
    "an_zscore",
    "sim_knn_join",
    "li_last_n_multi",
]


def _bench_engine(spark, fn, sf_dir: str, runs: int) -> tuple[float, int]:
    best, rows = float("inf"), -1
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.time()
        rows = len(fn(spark, sf_dir).collect())
        best = min(best, time.time() - t0)
    return round(best, 3), rows


def _bench_oracle(sql: str, sf_dir: str, runs: int) -> tuple[float, int]:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    best, rows = float("inf"), -1
    for _ in range(runs):
        t0 = time.time()
        rows = len(con.execute(sql).fetchall())
        best = min(best, time.time() - t0)
    con.close()
    return round(best, 3), rows


def main() -> int:
    sf_small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf_big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/zest_sf1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    names = sys.argv[4:] or HEAVY_TIER

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count() or 8)}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("sf_scale_probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = entry.queries(), entry.oracle_sql()
    qs["dedup_exact"](spark, sf_small).collect()  # warm-up

    results = []
    for name in names:
        rec = {"query": name}
        for label, sf_dir in (("small", sf_small), ("big", sf_big)):
            e_sec, e_rows = _bench_engine(spark, qs[name], sf_dir, runs)
            o_sec, o_rows = _bench_oracle(oracles[name], sf_dir, runs)
            rec[f"engine_{label}"] = e_sec
            rec[f"oracle_{label}"] = o_sec
            rec[f"rows_{label}"] = e_rows
            if e_rows != o_rows:
                rec[f"ROWS_MISMATCH_{label}"] = f"engine={e_rows} oracle={o_rows}"
        rec["engine_marginal"] = round(rec["engine_big"] - rec["engine_small"], 3)
        rec["oracle_marginal"] = round(rec["oracle_big"] - rec["oracle_small"], 3)
        results.append(rec)
        print(json.dumps(rec), flush=True)

    print("\n| query | engine sf0.1 | engine sf1 | marginal/10x | duckdb sf0.1 | duckdb sf1 | duckdb marginal | rows sf1 |")
    print("|---|---|---|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r['query']} | {r['engine_small']} | {r['engine_big']} | "
            f"{r['engine_marginal']} | {r['oracle_small']} | {r['oracle_big']} | "
            f"{r['oracle_marginal']} | {r['rows_big']} |"
        )
    bad = [r["query"] for r in results if any(k.startswith("ROWS_MISMATCH") for k in r)]
    if bad:
        print(f"\nROW-COUNT MISMATCHES: {bad}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
