"""Map the driver's TPC-H-ish testdata onto the engine tables
(FIXTURES.md §6) — with, for each mapping, the EXACT equivalent DuckDB
SQL so the correctness oracle sees the same rows.

Contract notes (verified empirically, Spark 4.1.2 vs DuckDB 1.0):
- ``events.ts`` has changed physical type across driver testdata
  regenerations: round 1-3 files were parquet TIMESTAMP(NANOS) (Spark
  reads them as int64 nanos under
  ``spark.sql.legacy.parquet.nanosAsLong``, and ``ts div 1000000``
  equals DuckDB's ``epoch_ms(ts)``); round-4+ files are timestamp[us]
  (Spark reads TIMESTAMP_NTZ, and with session TZ UTC
  ``unix_millis(cast(ts as timestamp))`` equals ``epoch_ms(ts)``
  bit-exactly). ``ts_ms`` branches on the loaded dtype so both
  generations — and timestamp[ms] — map to the same epoch-ms
  ``timestamp`` column. The DuckDB oracle side (``epoch_ms(ts)``) is
  type-agnostic and never changes.
- ``lineitem.l_shipdate`` / ``orders.o_orderdate`` are TIMESTAMP(MS) →
  Spark TIMESTAMP_NTZ; with session TZ UTC,
  ``unix_millis(cast(x as timestamp))`` equals ``epoch_ms(x)``.
- ``get_json_object(props,'$.k')`` equals
  ``json_extract_string(props,'$.k')``.

Rows where ``user_id % 5 == 0`` are deliberately left untagged
(tag_name/tag_value NULL) so the filter's dropped-row semantics
(src/filter.re:9-14) are exercised by the oracle corpus, not just unit
tests.
"""

from __future__ import annotations

import functools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _memoized_mapping(file_rel: str):
    """Decorator: memoize a fixture mapping's lazy frame per
    (session, sf_dir, source-file mtime) via ``_frame_memo`` — the
    mapping is a pure column projection over one parquet file, so the
    plan object is reusable until the file changes."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
            try:
                mtime = os.stat(os.path.join(sf_dir, file_rel)).st_mtime_ns
            except OSError:
                return fn(spark, sf_dir)
            return _frame_memo(
                spark,
                (fn.__name__, sf_dir, mtime),
                lambda: fn(spark, sf_dir),
            )

        return wrapper

    return deco

#: path → (mtime, nanosAsLong-conf, StructType). Schema-INFERENCE
#: memo: a bare ``spark.read.parquet(path)`` schedules a 1-task
#: footer-read job at plan time, every time — the floor probe measured
#: it as a constant +1 job (+~0.1 s) on all 46 bench rows, ≈4-5 s of
#: pure scheduling per suite pass. The testdata parquet is immutable
#: per path (mtime-keyed for safety), so infer once and hand Spark the
#: explicit schema afterwards. Keyed on the nanosAsLong conf too:
#: events.ts surfaces as bigint under it and timestamp without it, so
#: one cached schema must never leak across session configurations.
_SCHEMA_MEMO: dict = {}


def _frame_memo(spark: SparkSession, key: tuple, build):
    """Memoize an immutable LAZY DataFrame (a logical plan, never a
    result) on the session object. Query/fixture builders are pure
    functions of (session, file path, mtime): rebuilding the identical
    plan costs dozens of py4j round-trips (measured ~0.3-0.9 s per
    fixture mapping under load — the dominant share of a floor row's
    build time), while reusing the plan object costs nothing and
    changes nothing: every action still plans, optimizes, and executes
    from the parquet input exactly as before. Keys carry the file
    mtime, so a rewritten input is a new entry. Stored as a session
    attribute (not a module dict keyed by id()) so a stopped session's
    memo dies with it and ids reused by GC cannot alias."""
    memo = getattr(spark, "_zestdb_frame_memo", None)
    if memo is None:
        try:
            memo = {}
            spark._zestdb_frame_memo = memo
        except Exception:  # exotic session proxies — just rebuild
            return build()
    df = memo.get(key)
    if df is None:
        df = memo[key] = build()
    return df


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` with the inferred schema memoized per
    (path, mtime, nanos-conf) — plan-time only, zero schema-inference
    jobs after the first read of a path — and the scan FRAME memoized
    per session (see ``_frame_memo``)."""
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        return spark.read.parquet(path)  # let Spark raise its own error
    try:
        nanos = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong")
    except Exception:
        nanos = None
    key = (path, mtime, nanos)

    def build() -> DataFrame:
        schema = _SCHEMA_MEMO.get(key)
        if schema is None:
            df = spark.read.parquet(path)
            _SCHEMA_MEMO[key] = df.schema
            return df
        return spark.read.schema(schema).parquet(path)

    return _frame_memo(spark, ("scan",) + key, build)


# ------------------------------------------------------------------ events

def harden_session(spark: SparkSession) -> SparkSession:
    """Make ANY SparkSession — including the driver harness's vanilla
    one — able to run the fixture mappings. Both confs are
    runtime-settable, so the ``queries()`` contract assumes nothing
    about the caller's session factory:

    - ``nanosAsLong``: events.ts is parquet TIMESTAMP(NANOS), which
      Spark refuses to read as a timestamp otherwise.
    - ``session.timeZone=UTC``: the lineitem/orders TIMESTAMP_NTZ →
      epoch-ms casts are only oracle-exact under UTC.

    Idempotent per session and MEMOIZED on the session object itself
    (an attribute, not an id() set — ids can be reused after GC across
    the sequential sessions tests create): every fixture loader calls
    this, the bench builds ~150 frames per pass, and each un-memoized
    call costs ~8 py4j round-trips of conf churn (r13, guide §4 —
    driver-side chatter). Callers that mutate these confs afterwards
    own the consequences — nothing in the package does.
    """
    if getattr(spark, "_zestdb_hardened", False):
        return spark
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # InferFiltersFromGenerate clones the ENTIRE generator expression
    # into a pre-Generate Filter (size(expr) > 0 AND isnotnull(expr)).
    # Higher-order array functions (zip_with/transform/filter — every
    # shingle and n-gram builder here) are CodegenFallback, so that
    # filter re-runs the whole interpreted chain twice per input row:
    # measured 14x on a shingle explode (2.8 s -> 0.2 s for 500 docs
    # at sf1). The inferred filter only skips rows that would generate
    # zero output — a no-op for correctness — so excluding the rule is
    # semantics-preserving. Appended, not overwritten, in case the
    # caller excluded rules of their own.
    _infer = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    try:
        prev = spark.conf.get("spark.sql.optimizer.excludedRules") or ""
    except Exception:
        prev = ""
    if _infer not in prev:
        spark.conf.set(
            "spark.sql.optimizer.excludedRules",
            f"{prev},{_infer}" if prev else _infer,
        )
    # Allow shuffled-hash joins where the per-partition build side
    # fits (guide §3.1/§9): the planner preference when the estimate
    # is safely small, plus AQE's runtime rewrite gated on the REAL
    # post-shuffle partition size (64 MB — bounded build-side memory
    # at any scale). Sort-merge remains the fallback for partitions
    # past the threshold. Interleaved noop A/B at sf0.1: ngram self-
    # join 1.89 -> 1.34, minhash verify 1.71 -> 1.27, revenue join
    # 1.33 -> 1.04, knn join 0.95 -> 0.80, asof 0.36 -> 0.28. Results
    # unaffected (join strategy only); both confs runtime-settable.
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    spark.conf.set(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        str(64 * 1024 * 1024),
    )
    # Disable PySpark's per-call DataFrame debugging origin capture:
    # every functions.* invocation otherwise pays ~4 py4j round-trips
    # (getActiveSession + conf.get + PySparkCurrentOrigin set/clear)
    # just to record a call-site string for error messages. Queries
    # here build thousands of Columns per call (MinHash aggs, band
    # structs, language trees) and the bench rebuilds each frame per
    # cycle — measured ~0.9 s per dedup_minhash build. The conf is
    # STATIC (cannot be set on a live vanilla session), but its
    # Python-side gate is a module-level cache pyspark populates
    # lazily from that conf — setting the cache is exactly equivalent
    # for this process and only affects error-message decoration,
    # never results. Guarded: private attr may move across versions.
    try:
        import pyspark.errors.utils as _eu

        if hasattr(_eu, "_enable_debugging_cache"):
            _eu._enable_debugging_cache = False
    except Exception:
        pass
    # Quiet WindowExec's blanket "No Partition Defined" WARN: the only
    # partition-less windows in the package run over ≤ k rows by
    # construction (vocab_topk / bpe_pair_stats rank a limit(k) frame;
    # pack_spans' level-2 prefix sum is the documented bucket-subtotal
    # bound) — the WARN would flood every bench/driver log with false
    # alarms. A constant partition key cannot silence it (Catalyst
    # folds it back to an empty spec). Real global-window regressions
    # are pinned by tests/test_plan_contracts.py shuffle counts.
    # Best-effort: log4j2 internals may differ across Spark builds.
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass
    try:
        spark._zestdb_hardened = True
    except Exception:  # exotic session proxies without attribute slots
        pass
    return spark


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet(harden_session(spark), f"{sf_dir}/events.parquet")


def ts_ms(ev: DataFrame, col: str = "ts") -> F.Column:
    """Epoch-milliseconds from ``events.ts`` regardless of the parquet
    physical type the driver generated (see module docstring).
    Oracle-exact vs DuckDB ``epoch_ms(ts)`` under the UTC session TZ
    ``harden_session`` sets; verified row-wise and in aggregate.

    Recognized dtypes, exhaustively:
    - ``timestamp`` / ``timestamp_ntz`` — parquet TIMESTAMP(MICROS/
      MILLIS); ``unix_millis`` after a tz-cast.
    - ``date`` — midnight UTC, matching DuckDB ``epoch_ms(DATE)``.
    - ``bigint`` — parquet TIMESTAMP(NANOS) surfaced as int64 nanos
      under ``nanosAsLong`` (harden_session sets it).
    Anything else is schema drift in the generated testdata — fail
    FAST with the observed dtype instead of silently mis-scaling
    (the driver has changed the physical type twice already).
    """
    dtype = dict(ev.dtypes)[col]
    if dtype.startswith("timestamp") or dtype == "date":
        return F.unix_millis(F.col(col).cast("timestamp"))
    if dtype == "bigint":
        # legacy TIMESTAMP(NANOS) read as int64 under nanosAsLong
        return F.expr(f"{col} div 1000000")
    raise ValueError(
        f"events.{col} has unexpected dtype {dtype!r}: expected a "
        "timestamp type or int64 nanoseconds (nanosAsLong). The "
        "testdata's parquet physical type drifted — extend ts_ms "
        "deliberately rather than guessing a scale."
    )


#: Backwards-compatible alias — callers predating the public export.
_ts_ms = ts_ms


@_memoized_mapping("events.parquet")
def ts_numeric_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events(spark, sf_dir)
    tagged = F.col("user_id") % 5 != 0
    # props is one-key JSON from the fixture generator — in practice
    # always '{"k": <digits>}'. A full JSON parse (get_json_object /
    # Jackson) costs ~8x a regexp match per row and dominates every
    # events-mapped query's scan, so short-circuit the generator's
    # shape and fall back to the real JSON path ONLY for rows that
    # don't match (CaseWhen branches evaluate lazily per row, so
    # matching rows never pay the parse; semantics are identical —
    # json_extract_string('{"k": 76}', '$.k') is exactly the digits).
    simple = F.regexp_extract("props", r'^\{"k": ([0-9]+)\}$', 1)
    tag_value = F.when(simple != "", simple).otherwise(
        F.get_json_object("props", "$.k")
    )
    return ev.select(
        F.col("event_type").alias("series_id"),
        ts_ms(ev).alias("timestamp"),
        F.col("value"),
        F.when(tagged, F.lit("k")).alias("tag_name"),
        F.when(tagged, tag_value).alias("tag_value"),
    )


TS_NUMERIC_FROM_EVENTS_SQL = """
  SELECT event_type AS series_id,
         epoch_ms(ts) AS "timestamp",
         value,
         CASE WHEN user_id % 5 <> 0 THEN 'k' END AS tag_name,
         CASE WHEN user_id % 5 <> 0
              THEN json_extract_string(props, '$.k') END AS tag_value
  FROM events
"""


@_memoized_mapping("events.parquet")
def ts_blob_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events(spark, sf_dir)
    return ev.select(
        F.col("event_type").alias("series_id"),
        ts_ms(ev).alias("timestamp"),
        F.col("props").alias("data"),
    )


TS_BLOB_FROM_EVENTS_SQL = """
  SELECT event_type AS series_id,
         epoch_ms(ts) AS "timestamp",
         props AS data
  FROM events
"""

# ---------------------------------------------------------------- lineitem

@_memoized_mapping("lineitem.parquet")
def ts_numeric_from_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk/bench mapping: one series per returnflag, price as value."""
    li = read_parquet(harden_session(spark), f"{sf_dir}/lineitem.parquet")
    return li.select(
        F.concat(F.lit("li_"), F.col("l_returnflag")).alias("series_id"),
        ts_ms(li, "l_shipdate").alias("timestamp"),
        F.col("l_extendedprice").alias("value"),
        F.lit("status").alias("tag_name"),
        F.col("l_linestatus").alias("tag_value"),
    )


TS_NUMERIC_FROM_LINEITEM_SQL = """
  SELECT 'li_' || l_returnflag AS series_id,
         epoch_ms(l_shipdate) AS "timestamp",
         l_extendedprice AS value,
         'status' AS tag_name,
         l_linestatus AS tag_value
  FROM lineitem
"""

# --------------------------------------------------------------------- kv

@_memoized_mapping("nation.parquet")
def kv_json_from_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KV namespace per region name, key per nation name."""
    n = read_parquet(spark, f"{sf_dir}/nation.parquet")
    r = read_parquet(spark, f"{sf_dir}/region.parquet")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("r_name").alias("id"),
            F.col("n_name").alias("key"),
            F.col("n_nationkey").cast("string").alias("value"),
        )
    )


KV_JSON_FROM_NATION_SQL = """
  SELECT r.r_name AS id,
         n.n_name AS key,
         CAST(n.n_nationkey AS VARCHAR) AS value
  FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
"""

@_memoized_mapping("supplier.parquet")
def kv_text_from_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-format KV: one namespace, key per supplier, plain-text value."""
    s = read_parquet(spark, f"{sf_dir}/supplier.parquet")
    return s.select(
        F.lit("suppliers").alias("id"),
        F.col("s_name").alias("key"),
        F.concat(F.col("s_name"), F.lit(" balance "), F.col("s_acctbal").cast("string")).alias(
            "value"
        ),
    )


KV_TEXT_FROM_SUPPLIER_SQL = """
  SELECT 'suppliers' AS id,
         s_name AS key,
         s_name || ' balance ' || CAST(s_acctbal AS VARCHAR) AS value
  FROM supplier
"""

# ----------------------------------------------------------------- catalog

@_memoized_mapping("part.parquet")
def catalog_items_from_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One hypercat item per part brand — href + required rels
    (src/hc.re:20-41) in the flat (href, rel, val) projection that the
    catalog read renders."""
    p = read_parquet(spark, f"{sf_dir}/part.parquet")
    brands = p.select(F.col("p_brand").alias("brand")).distinct()
    desc = brands.select(
        F.concat(F.lit("/brand/"), F.col("brand")).alias("href"),
        F.lit("urn:X-hypercat:rels:hasDescription:en").alias("rel"),
        F.col("brand").alias("val"),
    )
    ctype = brands.select(
        F.concat(F.lit("/brand/"), F.col("brand")).alias("href"),
        F.lit("urn:X-hypercat:rels:isContentType").alias("rel"),
        F.lit("application/json").alias("val"),
    )
    return desc.unionAll(ctype)


CATALOG_ITEMS_SQL = """
  WITH brands AS (SELECT DISTINCT p_brand AS brand FROM part)
  SELECT '/brand/' || brand AS href,
         'urn:X-hypercat:rels:hasDescription:en' AS rel,
         brand AS val
  FROM brands
  UNION ALL
  SELECT '/brand/' || brand AS href,
         'urn:X-hypercat:rels:isContentType' AS rel,
         'application/json' AS val
  FROM brands
"""
