"""SparkSession factory.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; production target is a
multi-executor cluster, so every knob here is also correct at scale:
AQE on (runtime shuffle coalescing + skew-join splitting), shuffle
partitions sized to the environment, UTC session timezone (so epoch-ms
arithmetic matches the DuckDB oracle), Arrow enabled for the few
Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "zestdb_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus.strip("*") or 32) if cpus != "*" else 32, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # shuffled-hash join where the build side fits (guide §3.1/§9):
        # planner preference + AQE's runtime rewrite gated on the real
        # post-shuffle partition size — sort-merge stays the fallback
        # past 64 MB per partition. Measured 20-30% on the self-join /
        # verify-join rows (see io/fixtures.py harden_session, which
        # applies the same pair to vanilla driver sessions).
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(64 * 1024 * 1024),
        )
        # driver testdata stores events.ts as TIMESTAMP(NANOS) which Spark
        # cannot read as a timestamp; read the raw int64 nanos instead and
        # convert with integer division (see io/fixtures.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # InferFiltersFromGenerate clones the full generator expression
        # into a pre-Generate Filter; with CodegenFallback higher-order
        # array builders (every shingle/n-gram op) that re-runs the
        # interpreted chain twice per row — measured 14x on a shingle
        # explode. The inferred filter only skips zero-output rows, so
        # excluding it is semantics-preserving (io/fixtures.py
        # harden_session applies the same exclusion to vanilla driver
        # sessions).
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer."
            "InferFiltersFromGenerate",
        )
        # PySpark 4 wraps EVERY functions.* call with a call-site
        # capture for DataFrame error context; when enabled each
        # Column-building call pays ~4 extra py4j round-trips
        # (getActiveSession + conf.get + origin set/clear). Complex
        # plans here build thousands of Columns per query (64 MinHash
        # aggs, 16-band structs, language trees), and the bench
        # rebuilds the frame every cycle — measured 0.9 s of a 2.5 s
        # dedup_minhash build in pure py4j chatter. Static conf, so it
        # must be set at builder time; harden_session flips the
        # Python-side cache for vanilla driver sessions.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
