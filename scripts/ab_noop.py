"""Interleaved same-session A/B harness (guide §1.4): time variants of
one query noop-terminated, alternating A,B,A,B,... in ONE session so
host drift hits both sides equally. Variants are (name, fn) pairs
registered by the experiment module passed on the command line.

Usage:
  python scripts/ab_noop.py <experiment.py> [sf_dir] [cycles]

The experiment file must define VARIANTS: list[tuple[str, fn]] with
fn(spark, sf_dir) -> DataFrame. Each cycle clears the cache first, so
persisted intermediates are rebuilt inside the timed region (no
cross-cycle result reuse).
"""

from __future__ import annotations

import os
import runpy
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zestdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    exp_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cycles = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = get_spark("ab_noop")
    ns = runpy.run_path(exp_path)
    variants = ns["VARIANTS"]
    # warm-up: run each variant once unattributed (JVM, codegen, footers)
    for _, fn in variants:
        spark.catalog.clearCache()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    times: dict[str, list[float]] = {name: [] for name, _ in variants}
    for c in range(cycles):
        for name, fn in variants:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"ab:{name}:{c}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    for name, ts in times.items():
        print(f"{name:28s} min={min(ts):.3f} med={sorted(ts)[len(ts)//2]:.3f} all={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
