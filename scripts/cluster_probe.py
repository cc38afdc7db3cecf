"""Multi-process shuffle probe — VERDICT r11 #2.

Every number this repo ever recorded ran on local[32], where an
"Exchange" is an in-process memcpy and Python workers talk to the one
JVM over loopback pipes. That leaves the standing claim — "the
residual gap vs DuckDB is serialization cost that buys horizontal
scaling" — untested against REAL exchanges: separate executor JVMs,
shuffle blocks served over TCP, task results crossing process
boundaries.

This script stands up a genuine 2-worker Spark STANDALONE cluster on
this host (master + 2 worker daemons, each worker one executor JVM
with half the cores), runs the sf1 heavy probe tier through it, and
prints engine seconds side by side with a local[NCPU] twin measured
by the SAME script in the SAME process sequence — so the delta is
exactly "multi-process shuffle + executor isolation", nothing else.

Reading the result:
- a row whose cluster time ≈ local time: the plan's shuffle volume is
  small enough that real exchanges don't bite — scales out.
- a row whose cluster time blows up >2x: the plan moves too much data
  across the exchange for its work — fix the plan, not the cluster.

Usage:
    python scripts/cluster_probe.py [sf_dir] [runs] [name...]

Defaults: /tmp/zest_sf1, 3 runs, the sf_scale_probe HEAVY_TIER.
Writes a JSON line per row and a markdown table to stdout (same
posture as sf_scale_probe.py).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark

MASTER_URL = "spark://127.0.0.1:7077"
SPARK_HOME = os.path.dirname(pyspark.__file__)
JARS = os.path.join(SPARK_HOME, "jars", "*")


def _java_cmd(cls: str, *args: str) -> list[str]:
    java = os.path.join(os.environ.get("JAVA_HOME", ""), "bin", "java")
    if not os.path.exists(java):
        java = "java"
    return [
        java,
        "-cp",
        JARS,
        "-Xmx1g",
        cls,
        *args,
    ]


def start_cluster(workers: int, cores_per: int, mem_per: str) -> list:
    """Master + N worker daemons as real child processes. WebUIs on
    port 0 (ephemeral) so nothing collides; logs to /tmp."""
    procs = []
    # the Worker's executor launcher resolves its classpath through
    # SPARK_HOME (AbstractCommandBuilder.getScalaVersion wants
    # $SPARK_HOME/jars) — point it at the pip-installed pyspark dir
    env = dict(
        os.environ,
        SPARK_HOME=SPARK_HOME,
        PYSPARK_PYTHON=sys.executable,
        # pip pyspark has no launcher/target build dirs — pin the
        # Scala version so the executor command builder skips the
        # build-directory probe ("Cannot find any build directories")
        SPARK_SCALA_VERSION="2.13",
    )
    log = open("/tmp/zest_cluster_master.log", "w")
    procs.append(
        subprocess.Popen(
            _java_cmd(
                "org.apache.spark.deploy.master.Master",
                "--host", "127.0.0.1", "--port", "7077",
                "--webui-port", "0",
            ),
            stdout=log, stderr=subprocess.STDOUT, env=env,
        )
    )
    time.sleep(3.0)
    for i in range(workers):
        wlog = open(f"/tmp/zest_cluster_worker{i}.log", "w")
        # distinct work dirs so executors never collide on disk
        wd = f"/tmp/zest_cluster_work{i}"
        os.makedirs(wd, exist_ok=True)
        procs.append(
            subprocess.Popen(
                _java_cmd(
                    "org.apache.spark.deploy.worker.Worker",
                    "--cores", str(cores_per),
                    "--memory", mem_per,
                    "--work-dir", wd,
                    "--webui-port", "0",
                    MASTER_URL,
                ),
                stdout=wlog, stderr=subprocess.STDOUT, env=env,
            )
        )
    time.sleep(4.0)
    return procs


def build_session(master: str, cores_total: int, executor_mem: str):
    from pyspark.sql import SparkSession

    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    b = (
        SparkSession.builder.master(master)
        .appName(f"cluster_probe_{master.split(':')[0]}")
        .config("spark.sql.shuffle.partitions", str(cores_total))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.ui.enabled", "false")
    )
    if master.startswith("spark://"):
        # one executor per worker: all of a worker's cores, real
        # cross-JVM shuffle between the two. Executor Python workers
        # are fresh processes — ship the repo root so mapInPandas
        # kernels can import zestdb_spark.
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        b = (
            b.config("spark.executor.memory", executor_mem)
            .config("spark.executor.cores", str(cores_total // 2))
            .config("spark.driver.memory", "8g")
            .config("spark.executorEnv.PYTHONPATH", repo_root)
        )
    else:
        b = b.config("spark.driver.memory", "16g")
    return b.getOrCreate()


def time_rows(spark, names: list[str], sf_dir: str, runs: int) -> dict[str, float]:
    import __spark_entry__ as entry

    qs = entry.queries()
    out: dict[str, float] = {}
    # warm-up: JVM + executor Python daemons + parquet footers
    qs[names[0]](spark, sf_dir).collect()
    for name in names:
        best = float("inf")
        spark.catalog.clearCache()
        for _ in range(runs):
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    return out


def main() -> None:
    from scripts.sf_scale_probe import HEAVY_TIER  # noqa: F401

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/zest_sf1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3:] or list(HEAVY_TIER)
    ncpu = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    # ---- twin 1: local[NCPU], same script, same sequence ----
    spark = build_session(f"local[{ncpu}]", ncpu, "")
    local = time_rows(spark, names, sf_dir, runs)
    spark.stop()
    time.sleep(2.0)

    # ---- twin 2: 2-worker standalone, half the cores each ----
    procs = start_cluster(workers=2, cores_per=ncpu // 2, mem_per="24g")
    try:
        spark = build_session(MASTER_URL, ncpu, "20g")
        # wait for both executors to register — memory status includes
        # the driver, so a real 2-worker cluster reports 3 entries
        deadline = time.time() + 60
        execs = 0
        while time.time() < deadline:
            execs = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
            if execs >= 3:
                break
            time.sleep(1.0)
        print(f"# executors (incl. driver): {execs}")
        if execs < 3:
            raise SystemExit(
                "cluster probe ABORTED: fewer than 2 worker executors "
                "registered — the reading would silently measure a "
                "driver-only cluster (check /tmp/zest_cluster_*.log)"
            )
        cluster = time_rows(spark, names, sf_dir, runs)
        spark.stop()
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()

    print("\n| query | local[%d] s | 2-worker s | ratio |" % ncpu)
    print("|---|---|---|---|")
    for name in names:
        ls, cs = local.get(name), cluster.get(name)
        ratio = round(cs / ls, 2) if ls else float("nan")
        print(f"| {name} | {ls} | {cs} | {ratio} |")
        print(
            json.dumps(
                {
                    "row": name,
                    "local_sec": ls,
                    "cluster_sec": cs,
                    "ratio": ratio,
                    "sf_dir": sf_dir,
                    "runs": runs,
                }
            ),
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
