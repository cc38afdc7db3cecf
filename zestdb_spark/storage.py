"""Table-backed store: the engine's durable tables as partitioned parquet.

Replaces the reference's git/Irmin shard store (src/timeseries/shard.re,
index.re) with the Spark-native equivalent (SURVEY.md §4): parquet files
partitioned by ``series_id`` and a derived daily ``time_bucket``, so
- series selection is partition pruning (the reference's per-series
  directories),
- since/range reads prune whole day-buckets via the partition column
  and skip row groups via parquet min/max stats (the reference's
  interval-index walk, timeseries.re:197-231),
- compaction is file-level (OPTIMIZE-style rewrite) instead of the
  reference's overlap-merge (timeseries.re:64-111).

Would be Delta/Iceberg on a real cluster (ACID appends, MERGE,
DELETE); the jars aren't in this image, so writes emulate: append =
parquet append, upsert/delete = partition-scoped rewrite. The API is
format-agnostic — swap ``_write``/``_rewrite`` for table-format calls
without touching callers.

Ingest validation enforces the reference's numeric-TS schema
(src/numeric_timeseries.re:5-13): exactly ``{"value": <number>}`` plus
at most one string tag → BadRequest (CoAP 128) otherwise
(src/server.re:656-669).
"""

from __future__ import annotations

import contextlib
import json
import numbers
import os
import shutil
import time
from typing import Any, Optional
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zestdb_spark import schema as S
from zestdb_spark.errors import BadRequest, StoreBusy

#: ms per day — time_bucket = timestamp div this (daily partitions)
_DAY_MS = 86_400_000

_TABLES = {
    "ts_numeric": S.TS_NUMERIC,
    "ts_blob": S.TS_BLOB,
    "kv_json": S.KV_JSON,
    "kv_text": S.KV_TEXT,
    "kv_binary": S.KV_BINARY,
    "catalog_items": S.CATALOG_ITEMS,
    "audit": S.AUDIT,
    "write_log": S.WRITE_LOG,
}

#: tables whose stored rows carry a hidden ``write_id`` provenance stamp
#: (pruned from canonical ``load()``; see ``load_with_provenance``)
_STAMPED = ("ts_numeric", "ts_blob")


def now_ms() -> int:
    return int(time.time() * 1000)


def _bucket_of(ms: int) -> int:
    """time_bucket of a timestamp — MUST mirror the write path's
    ``cast(timestamp / _DAY_MS as long)``, which truncates toward ZERO
    (Python ``//`` floors, disagreeing for pre-1970 timestamps: the
    write puts ts=-50 in bucket 0, floor division says -1)."""
    q = abs(int(ms)) // _DAY_MS
    return q if ms >= 0 else -q


def validate_numeric(payload: Any) -> tuple[float, Optional[str], Optional[str]]:
    """is_valid semantics (src/numeric_timeseries.re:5-13): a JSON dict
    that is exactly {"value": number} or {"value": number, tag: "str"}
    (either field order). Returns (value, tag_name, tag_value)."""
    if not isinstance(payload, dict) or "value" not in payload:
        raise BadRequest("numeric TS payload must be a dict with 'value'")
    value = payload["value"]
    if isinstance(value, bool) or not isinstance(value, numbers.Real):
        raise BadRequest("'value' must be a number")
    extras = {k: v for k, v in payload.items() if k != "value"}
    if not extras:
        return float(value), None, None
    if len(extras) > 1:
        raise BadRequest("numeric TS payload allows at most one tag")
    (tag_name, tag_value), = extras.items()
    if not isinstance(tag_value, str):
        raise BadRequest("tag value must be a string")
    return float(value), tag_name, tag_value


class ZestStore:
    """Parquet-backed engine tables under ``root``."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        #: request provenance (method, path, client, content_format) —
        #: set per-request by the engine facade, consumed by mutations
        self._ctx: Optional[tuple[str, str, str, Optional[str]]] = None
        self._write_seq: Optional[int] = None
        self._server = __import__("socket").gethostname()

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    @contextlib.contextmanager
    def _rewrite_lock(self, table: str, wait_s: float = 30.0):
        """Advisory per-table writer lock for the REWRITE paths (delete
        / upsert / compact — appends commute and take no lock). The
        reference serializes every write through one server loop over a
        transactional store (src/server.re:1075-1084); this is the
        single-node emulation of that serialization: O_EXCL lockfile
        creation (atomic on POSIX), pid recorded for stale-holder
        reclaim (a crashed rewriter must not wedge the table forever),
        StoreBusy (CoAP 163) after ``wait_s``. Cross-NODE writers need
        a real table format (Delta/Iceberg optimistic commit) — this
        lock is scoped to one host's filesystem, like the store itself.
        """
        path = os.path.join(self.root, f".lock_{table}")
        deadline = time.monotonic() + wait_s
        while True:
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                break
            except FileExistsError:
                try:
                    pid = int(open(path).read().strip() or "0")
                except (OSError, ValueError):
                    pid = 0
                stale = False
                if pid:
                    try:
                        os.kill(pid, 0)  # signal 0: existence probe only
                    except ProcessLookupError:
                        stale = True
                    except PermissionError:
                        pass  # alive, owned by someone else
                if stale:
                    with contextlib.suppress(OSError):
                        os.unlink(path)
                    continue
                if time.monotonic() > deadline:
                    raise StoreBusy(
                        f"table {table!r} is being rewritten by pid {pid or '?'} "
                        f"(lock {path}); retry when it finishes"
                    )
                time.sleep(0.05)
        try:
            yield
        finally:
            with contextlib.suppress(OSError):
                os.unlink(path)

    def _exists(self, table: str) -> bool:
        p = self._path(table)
        return os.path.isdir(p) and any(
            not f.startswith((".", "_")) for f in os.listdir(p)
        )

    def load(self, table: str) -> DataFrame:
        """Read a table (empty frame with the right schema if unwritten).
        The partition columns are pruned back out so callers always see
        the canonical schema."""
        if table not in _TABLES:
            raise KeyError(table)
        if not self._exists(table):
            return self.spark.createDataFrame([], _TABLES[table])
        df = self.spark.read.schema(self._read_schema(table)).parquet(self._path(table))
        return df.select(*[f.name for f in _TABLES[table].fields])

    def _read_schema(self, table: str):
        base = _TABLES[table]
        if table in ("ts_numeric", "ts_blob"):
            from pyspark.sql import types as T

            return T.StructType(
                list(base.fields)
                + [
                    T.StructField("write_id", T.LongType(), True),
                    T.StructField("time_bucket", T.LongType(), True),
                ]
            )
        return base

    def load_with_provenance(self, table: str) -> DataFrame:
        """Canonical columns plus the ``write_id`` provenance stamp —
        join against ``load('write_log')`` for per-row (who, how, which
        path, when) lineage, the analytic equivalent of the reference's
        per-commit provenance message (src/prov.re:38-46)."""
        if table not in _STAMPED:
            raise KeyError(f"{table!r} rows are not provenance-stamped")
        if not self._exists(table):
            return self.spark.createDataFrame([], self._read_schema(table)).select(
                *[f.name for f in _TABLES[table].fields], "write_id"
            )
        df = self.spark.read.schema(self._read_schema(table)).parquet(self._path(table))
        return df.select(*[f.name for f in _TABLES[table].fields], "write_id")

    # --------------------------------------------------------- bucketing

    def bucketize(self, table: str, n_buckets: int = 32) -> str:
        """Publish a BUCKETED mirror of a TS table (hash-bucketed AND
        sorted by series_id, timestamp) as a managed Spark table, and
        return its name. Downstream groupBy/window on ``series_id``
        over ``load_bucketed`` then runs with ZERO exchange — Spark
        trusts the bucket layout instead of reshuffling (asserted in
        tests/test_bucketed.py). This is the batch-analytics read path
        at 100 TB: pay the shuffle once at publish time, every
        subsequent per-series scan/agg/window is exchange-free. The
        write path stays on the partitioned layout (cheap appends);
        bucketize() is the OPTIMIZE-style republish step, run at the
        same cadence as compact().

        ``n_buckets`` should be sized so a bucket's hot-series rows fit
        an executor (buckets ≈ executors at the target scale)."""
        if table not in ("ts_numeric", "ts_blob"):
            raise KeyError(f"{table!r} is not a TS table")
        name = self._bucketed_name(table)
        path = self._path(f"bucketed_{table}")
        # republish atomically-enough for a maintenance op: drop the
        # catalog entry and its EXTERNAL location (under the store
        # root, so two stores can never collide in the warehouse)
        self.spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(path, ignore_errors=True)
        (
            self.load(table)
            .write.mode("overwrite")
            .option("path", path)
            .bucketBy(int(n_buckets), "series_id")
            .sortBy("series_id", "timestamp")
            .format("parquet")
            .saveAsTable(name)
        )
        return name

    def _bucketed_name(self, table: str) -> str:
        import hashlib

        suffix = hashlib.md5(self.root.encode()).hexdigest()[:8]
        return f"zest_bucketed_{table}_{suffix}"

    def load_bucketed(self, table: str) -> DataFrame:
        """Read the bucketed mirror published by ``bucketize`` (must
        exist). Reads carry the bucket spec, so series_id aggregations
        and windows skip their exchange."""
        name = self._bucketed_name(table)
        if not self.spark.catalog.tableExists(name):
            raise KeyError(f"no bucketed mirror for {table!r} — run bucketize()")
        return self.spark.table(name)

    # --------------------------------------------------------- provenance

    def set_request_context(
        self, method: str, path: str, client: str, content_format: Optional[str] = None
    ) -> None:
        """Record the request that the next mutation(s) execute under —
        called by the engine facade at dispatch; direct store callers
        that skip it get a DIRECT/<table> provenance row."""
        self._ctx = (method, path, client, content_format)

    def _next_write_id(self) -> int:
        """Monotonic batch id, seeded from the durable log (single-writer
        facade, like the reference's one-server-per-store Irmin repo)."""
        if self._write_seq is None:
            if self._exists("write_log"):
                row = self.load("write_log").agg(F.max("write_id")).first()
                self._write_seq = int(row[0] or 0)
            else:
                self._write_seq = 0
        self._write_seq += 1
        return self._write_seq

    def _log_write(self, table: str, n_rows: Optional[int], wid: Optional[int] = None) -> int:
        """Append one write_log row for a mutation on ``table`` under the
        current request context; returns the batch's write_id.

        INVARIANT: callers log AFTER the data mutation commits, so a
        write_log row's presence implies its batch landed — which is
        what makes streaming-ingest replay idempotence a write_log
        lookup (streaming/ingest.py)."""
        if wid is None:
            wid = self._next_write_id()
        method, path, client, fmt = self._ctx or ("DIRECT", f"/{table}", "local", None)
        rec = (wid, now_ms(), self._server, client, method, path, fmt, table, n_rows)
        self.spark.createDataFrame([rec], S.WRITE_LOG).write.mode("append").parquet(
            self._path("write_log")
        )
        return wid


    # -------------------------------------------- partition-dir plumbing
    # Parquet emulation of table-format partition-scoped commits: writes
    # land in a .tmp dir, then only the touched Hive-style partition
    # dirs are swapped into the live table. With Delta/Iceberg on the
    # classpath this whole block becomes MERGE/DELETE and goes away.

    @staticmethod
    def _part_dirs(path: str, col: str):
        """(decoded value, full path) for ``col=<escaped>`` dirs under
        ``path`` — decoding via percent-unquote, the same escaping Spark
        (Hive ``escapePathName``) applies when writing."""
        prefix = col + "="
        if not os.path.isdir(path):
            return
        for name in sorted(os.listdir(path)):
            full = os.path.join(path, name)
            if name.startswith(prefix) and os.path.isdir(full):
                yield unquote(name[len(prefix):]), full

    @classmethod
    def _promote_partitions(cls, tmp: str, real: str) -> None:
        """Move every partition dir written under ``tmp`` into ``real``,
        replacing same-named dirs; recurses so nested layouts
        (series_id=X/time_bucket=N) replace at the leaf level."""
        os.makedirs(real, exist_ok=True)
        for name in sorted(os.listdir(tmp)):
            src = os.path.join(tmp, name)
            if "=" not in name or not os.path.isdir(src):
                continue
            dst = os.path.join(real, name)
            if os.path.isdir(dst):
                if any("=" in s for s in os.listdir(src)):
                    cls._promote_partitions(src, dst)
                    continue
                shutil.rmtree(dst)
            shutil.move(src, dst)
        shutil.rmtree(tmp, ignore_errors=True)

    # ------------------------------------------------------------- writes

    def _append_ts(self, table: str, rows: DataFrame, n_rows: Optional[int]) -> None:
        """Append a batch, stamped with the write_id of its provenance
        row — every data row joins back to (who, method, path, when),
        like every Irmin commit carries Prov.info
        (src/timeseries/shard.re:9-11, src/prov.re:38-46). Data lands
        BEFORE the log row (see _log_write's invariant); a crash in
        between leaves stamped rows whose write_id has no log entry —
        detectable and re-appendable, never silently lost."""
        wid = self._next_write_id()
        # cast to the canonical schema first: appending a frame with a
        # mismatched physical type (INT value, reordered columns) would
        # poison every later read of the whole table (same guard as
        # kv_ingest_bulk)
        rows = rows.select(
            *[F.col(f.name).cast(f.dataType) for f in _TABLES[table].fields]
        )
        (
            rows.withColumn("time_bucket", F.col("timestamp") / _DAY_MS)
            .withColumn("time_bucket", F.col("time_bucket").cast("long"))
            .withColumn("write_id", F.lit(wid))
            .write.mode("append")
            .partitionBy("series_id", "time_bucket")
            .parquet(self._path(table))
        )
        self._log_write(table, n_rows, wid)

    def write_numeric(
        self, series_id: str, payload: Any, timestamp: Optional[int] = None
    ) -> int:
        """S1/S2: validate + stamp + append. Returns the timestamp."""
        value, tag_name, tag_value = validate_numeric(payload)
        ts = now_ms() if timestamp is None else int(timestamp)
        rows = self.spark.createDataFrame(
            [(series_id, ts, value, tag_name, tag_value)], S.TS_NUMERIC
        )
        self._append_ts("ts_numeric", rows, 1)
        return ts

    def write_numeric_bulk(self, rows: DataFrame) -> None:
        """Bulk ingest (ts_numeric-shaped frame, already validated
        upstream) — the 100 TB path: one distributed append, daily
        partitions, ONE provenance row for the whole batch (n_rows is
        left NULL rather than forcing a second pass over the input)."""
        self._append_ts("ts_numeric", rows, None)

    def write_blob(
        self, series_id: str, payload: Any, timestamp: Optional[int] = None
    ) -> int:
        """S3: any-JSON append."""
        try:
            data = json.dumps(payload)
        except (TypeError, ValueError) as e:
            raise BadRequest("blob TS payload must be JSON-serializable") from e
        ts = now_ms() if timestamp is None else int(timestamp)
        rows = self.spark.createDataFrame([(series_id, ts, data)], S.TS_BLOB)
        self._append_ts("ts_blob", rows, 1)
        return ts

    def _overwrite(self, table: str, df: DataFrame) -> None:
        """Whole-table rewrite (catalog only — href-keyed, control-plane
        sized). Write-to-tmp then atomic swap: never overwrite the dir a
        lazy plan is still reading from (an evicted cache block would
        otherwise recompute from the half-truncated source)."""
        tmp = self._path(table) + ".tmp"
        df.write.mode("overwrite").parquet(tmp)
        real = self._path(table)
        if os.path.isdir(real):
            shutil.rmtree(real)
        os.rename(tmp, real)

    def _rewrite_kv_namespace(self, table: str, id_: str, new_rows: DataFrame) -> None:
        """Replace ONE ``id=<id_>`` partition of an id-partitioned KV
        table with ``new_rows`` — every other namespace's files are
        untouched (the reference's per-namespace git tree writes;
        MERGE INTO on a real table format).

        Crash ordering: promote FIRST (the per-dir replace inside
        _promote_partitions removes the old dir only once its
        replacement exists next to it), THEN prune the live dir in the
        emptied-namespace case. A crash mid-sequence leaves either the
        old or the new namespace readable — never a window where the
        only copy of committed keys has been rmtree'd before its
        replacement landed (the old delete-then-promote order lost the
        whole namespace if the process died between the two)."""
        tmp = self._path(table) + ".tmp"
        new_rows.write.mode("overwrite").partitionBy("id").parquet(tmp)
        real = self._path(table)
        tmp_ids = {val for val, _ in self._part_dirs(tmp, "id")}
        self._promote_partitions(tmp, real)
        if id_ not in tmp_ids:
            # namespace emptied (delete_all / last-key delete): nothing
            # replaced its dir, so prune it now; a crash before this
            # point leaves the delete un-applied but loses no data
            for val, full in self._part_dirs(real, "id"):
                if val == id_:
                    shutil.rmtree(full)

    def kv_upsert(self, kind: str, id_: str, key: str, value: Any) -> None:
        """S4: LWW upsert at (id, key) — src/keyvalue/keyvalue.re:14-20.
        Rewrites only the touched namespace partition."""
        table = f"kv_{kind}"
        from zestdb_spark.operators import kv as kv_ops

        updates = self.spark.createDataFrame([(id_, key, value)], _TABLES[table])
        # the lock spans the read-modify-write: the namespace load is
        # lazy and executes inside the tmp write, so serializing only
        # the swap would still let two upserts read the same base state
        with self._rewrite_lock(table):
            ns = self.load(table).filter(F.col("id") == id_)
            self._rewrite_kv_namespace(table, id_, kv_ops.upsert(ns, updates))
        self._log_write(table, 1)

    def kv_ingest_bulk(self, kind: str, rows: DataFrame) -> None:
        """Bulk KV load ((id, key, value) frame, duplicates pre-collapsed
        upstream) — the 100 TB load path: one distributed id-partitioned
        write and ONE provenance row, vs per-key ``kv_upsert``'s one
        namespace rewrite per call. Namespaces present in the batch are
        replaced wholesale (a bulk load is the authoritative snapshot of
        those namespaces — the reference's whole-tree import); absent
        namespaces keep their files byte-identical."""
        table = f"kv_{kind}"
        if table not in _TABLES:
            raise KeyError(table)
        # cast to the canonical schema so a frame with (say) an INT value
        # column can't write type-mismatched parquet that poisons every
        # later load(); an uncastable column fails HERE, before any
        # namespace is replaced (the tmp write precedes promotion)
        sel = rows.select(
            *[F.col(f.name).cast(f.dataType) for f in _TABLES[table].fields]
        )
        with self._rewrite_lock(table):
            tmp = self._path(table) + ".tmp"
            sel.write.mode("overwrite").partitionBy("id").parquet(tmp)
            self._promote_partitions(tmp, self._path(table))
        self._log_write(table, None)

    def kv_delete(self, kind: str, id_: str, key: Optional[str] = None) -> None:
        """D3: delete key or whole id namespace (namespace-scoped)."""
        from zestdb_spark.operators import kv as kv_ops

        table = f"kv_{kind}"
        if not self._exists(table):
            return
        with self._rewrite_lock(table):
            ns = self.load(table).filter(F.col("id") == id_)
            self._rewrite_kv_namespace(table, id_, kv_ops.delete(ns, id_, key))
        self._log_write(table, None)

    def catalog_upsert(self, item: dict) -> None:
        """S5/M2: validate + upsert by href (src/hc.re:43-51)."""
        from zestdb_spark.operators import catalog as cat_ops

        with self._rewrite_lock("catalog_items"):
            self._overwrite(
                "catalog_items",
                cat_ops.upsert_item(self.load("catalog_items"), item),
            )
        self._log_write("catalog_items", 1)

    def ts_delete(self, plan, compat_collateral: bool = False) -> None:
        """D1: partition-scoped delete. Only the (series_id, time_bucket)
        partitions the window can touch are re-read and rewritten —
        untouched partition files stay byte-identical (asserted by
        tests/test_durability.py). DELETE FROM + partition pruning on a
        real table format."""
        from zestdb_spark.operators import ts_delete as del_ops

        table = "ts_numeric" if plan.store == "numeric" else "ts_blob"
        if plan.window.op not in ("since", "range") or plan.agg is not None:
            # raise the reference's 134 before touching any file
            del_ops.delete_plan(self.load(table), plan, compat_collateral)
            return
        if not self._exists(table):
            return

        w = plan.window
        from_bucket = _bucket_of(w.from_ms)
        to_bucket = _bucket_of(w.to_ms) if w.op == "range" else None
        ids = set(plan.ids)

        def affected(series: str, bucket: int) -> bool:
            return (
                series in ids
                and bucket >= from_bucket
                and (to_bucket is None or bucket <= to_bucket)
            )

        part_cond = F.col("series_id").isin(list(ids)) & (
            F.col("time_bucket") >= F.lit(from_bucket)
        )
        if to_bucket is not None:
            part_cond = part_cond & (F.col("time_bucket") <= F.lit(to_bucket))

        with self._rewrite_lock(table):
            self._ts_delete_rewrite(table, plan, compat_collateral, part_cond, affected)
        self._log_write(table, None)

    def _ts_delete_rewrite(self, table, plan, compat_collateral, part_cond, affected):
        from zestdb_spark.operators import ts_delete as del_ops

        full = self.spark.read.schema(self._read_schema(table)).parquet(self._path(table))
        survivors = del_ops.delete_plan(full.filter(part_cond), plan, compat_collateral)

        tmp = self._path(table) + ".tmp"
        survivors.write.mode("overwrite").partitionBy("series_id", "time_bucket").parquet(tmp)

        # Promote the survivor leaves FIRST, then drop affected leaves
        # the survivors did NOT cover (every row deleted) — the same
        # ordering as _rewrite_kv_namespace. Torn-window contract
        # (pinned by tests/test_durability.py): a crash before
        # promotion leaves the table fully OLD (the .tmp sibling is
        # invisible to reads); promotion itself swaps whole leaf dirs,
        # so each (series, bucket) partition reads fully old or fully
        # new, never a mix of files; a crash between promotion and the
        # empty-leaf sweep leaves fully-emptied partitions still
        # holding their old rows — re-running the same delete converges
        # (delete is idempotent). Rows are never part-written.
        real = self._path(table)
        promoted = {
            (series, int(bucket))
            for series, sdir in self._part_dirs(tmp, "series_id")
            for bucket, _ in self._part_dirs(sdir, "time_bucket")
        }
        self._promote_partitions(tmp, real)
        for series, series_dir in self._part_dirs(real, "series_id"):
            for bucket, bucket_dir in self._part_dirs(series_dir, "time_bucket"):
                if affected(series, int(bucket)) and (series, int(bucket)) not in promoted:
                    shutil.rmtree(bucket_dir)
            if not any(self._part_dirs(series_dir, "time_bucket")):
                shutil.rmtree(series_dir)

    def compact(self, table: str, target_files: int = 1) -> int:
        """S7 maintenance: merge each (series_id, time_bucket) leaf
        partition's small files down to ``target_files`` — the
        reference's shard overlap-merge (timeseries.re:64-111), which
        its write path runs whenever a flushed buffer overlaps existing
        shards; here it's an explicit OPTIMIZE-style pass (per-write
        appends accumulate one file per request, like one git commit
        per shard write).

        Partition-scoped like ts_delete: only leaves with more than
        ``target_files`` data files are re-read and atomically swapped;
        everything else stays byte-identical. Row content (including
        provenance stamps) is preserved verbatim. Returns the number of
        leaves compacted."""
        if table not in ("ts_numeric", "ts_blob"):
            raise KeyError(f"compact targets TS tables, not {table!r}")
        if not self._exists(table):
            return 0
        from pyspark.sql import types as T

        # leaf files hold data columns only (partition cols live in the
        # dir names); write_id may be absent in pre-provenance files
        leaf_schema = T.StructType(
            [
                f
                for f in self._read_schema(table).fields
                if f.name not in ("series_id", "time_bucket")
            ]
        )
        real = self._path(table)
        # staging lives OUTSIDE the table tree: a partition-dir
        # lookalike like 'time_bucket=0.tmp' inside the series dir
        # would be picked up by _part_dirs / Spark partition discovery
        # (and int() on its value) if a crash left it. The old-rows dir
        # PRESERVES the series_id=/time_bucket= structure, so crash
        # recovery is just promoting it back into the table.
        tmp = os.path.join(self.root, f".compact_tmp_{table}")
        old_root = os.path.join(self.root, f".compact_old_{table}")
        with self._rewrite_lock(table):
            if os.path.isdir(old_root):
                # a previous compact() crashed mid-swap: restore its rows
                # FIRST (worst case the leaf exists too and gets replaced
                # by the identical-row uncompacted copy — rows never lost)
                self._promote_partitions(old_root, real)
            shutil.rmtree(tmp, ignore_errors=True)

            done = 0
            for series, series_dir in self._part_dirs(real, "series_id"):
                for bucket, leaf in self._part_dirs(series_dir, "time_bucket"):
                    files = [
                        f
                        for f in os.listdir(leaf)
                        if f.endswith(".parquet") and not f.startswith(("_", "."))
                    ]
                    if len(files) <= target_files:
                        continue
                    (
                        self.spark.read.schema(leaf_schema)
                        .parquet(leaf)
                        .coalesce(target_files)
                        .write.mode("overwrite")
                        .parquet(tmp)
                    )
                    old_leaf = os.path.join(
                        old_root, os.path.basename(series_dir), os.path.basename(leaf)
                    )
                    os.makedirs(os.path.dirname(old_leaf), exist_ok=True)
                    # two atomic renames; a crash in between leaves the
                    # rows intact under .compact_old_* and the NEXT
                    # compact() promotes them back — no window loses data
                    os.rename(leaf, old_leaf)
                    os.rename(tmp, leaf)
                    shutil.rmtree(old_leaf)
                    done += 1
            shutil.rmtree(old_root, ignore_errors=True)
        return done

    def audit_append(self, record: tuple) -> None:
        """Append one audit row (timestamp, server, client, method,
        path, code) — src/server.re:74-107."""
        self.spark.createDataFrame([record], S.AUDIT).write.mode("append").parquet(
            self._path("audit")
        )
