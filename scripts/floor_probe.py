"""Per-query job/stage floor decomposition — VERDICT r12 #1a.

~30 of 46 bench rows sit on Spark's per-query scheduling floor; the 2x
composite gate rests on how much of the suite total is irreducible
fixed cost. This probe measures, per bench row at the bench sf:

  jobs    Spark jobs scheduled by ONE warm build+execute+collect
          cycle (job-group attributed). >1 job per cycle usually
          means an extra driver action (an eager stats/partition
          probe, a separate resolve step, a collect-then-replan) —
          each extra job pays the full scheduling floor again.
          NOTE: AQE legitimately multiplies jobs (each materialized
          query stage is a job), so the number to chase is a row
          whose job count is high WITHOUT a shuffle to justify it.
  stages  total stages across those jobs (proxy for exchanges).
  tasks   total tasks (parallelism x stages actually launched).
  sec     the cycle's wall time (warm: cycle 2, caches cleared
          first, same as bench.py's protocol).

Usage:
  python scripts/floor_probe.py [sf_dir] [name_filter...]

Writes one markdown table + a JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from bench import BENCH_QUERIES  # noqa: E402
from zestdb_spark.session import get_spark  # noqa: E402


def probe(spark, fn, sf_dir: str, group: str):
    sc = spark.sparkContext
    spark.catalog.clearCache()
    # cycle 1: warm (codegen, parquet footers, AQE stats) — unattributed
    fn(spark, sf_dir).collect()
    sc.setJobGroup(group, group)
    t0 = time.time()
    fn(spark, sf_dir).collect()
    sec = time.time() - t0
    sc.setJobGroup(None, None)
    tracker = sc.statusTracker()
    job_ids = tracker.getJobIdsForGroup(group)
    stages = 0
    tasks = 0
    for jid in job_ids:
        info = tracker.getJobInfo(jid)
        if info is None:
            continue
        stages += len(info.stageIds)
        for sid in info.stageIds:
            sinfo = tracker.getStageInfo(sid)
            if sinfo is not None:
                tasks += sinfo.numTasks
    return {
        "jobs": len(job_ids),
        "stages": stages,
        "tasks": tasks,
        "sec": round(sec, 3),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    filters = sys.argv[2:]
    spark = get_spark("floor_probe")
    qs = entry.queries()
    names = [n for n in BENCH_QUERIES if n in qs]
    if filters:
        names = [n for n in names if any(f in n for f in filters)]
    out = {}
    print("| query | jobs | stages | tasks | sec |")
    print("|---|---|---|---|---|")
    for name in names:
        try:
            r = probe(spark, qs[name], sf_dir, f"fp_{name}")
        except Exception as exc:  # noqa: BLE001 — keep probing
            r = {"err": f"{type(exc).__name__}: {exc}"[:200]}
        out[name] = r
        if "err" in r:
            print(f"| {name} | err: {r['err'][:60]} | | | |")
        else:
            print(
                f"| {name} | {r['jobs']} | {r['stages']} | {r['tasks']} "
                f"| {r['sec']} |"
            )
        sys.stdout.flush()
    print(json.dumps({"sf_dir": sf_dir, "rows": out}))
    spark.stop()


if __name__ == "__main__":
    main()
