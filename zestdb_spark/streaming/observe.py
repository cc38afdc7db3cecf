"""Observation layer (SURVEY.md §2.10 ST1-ST5).

The reference's "streaming" is pub/sub fan-out: a client OBSERVEs a
path (optionally a wildcard prefix ``/kv/foo/*``) with a mode
(``data`` | ``audit`` | ``notification``) and a ``max-age`` TTL; every
matching write/read/audit event is routed to it
(src/observe.re, src/server.re:836-916).

Two tiers here:
- ``ObserverRegistry`` — the control plane: registrations with
  wildcard matching and TTL expiry, plus synchronous in-process
  delivery (queues per observer). This is driver-side by design —
  the registry is tiny and must not entangle query execution
  (SURVEY.md §7.4).
- ``start_data_stream`` / ``start_audit_stream`` — the data plane at
  scale: Structured Streaming over the engine's append log, one
  filtered stream per observer predicate. Sinks are pluggable
  (memory sink for tests; Kafka/files in production).

Payload shapes follow src/server.re:74-141: data observers get
``ts path content-format data``; audit observers get
``ts server client method path code``.
"""

from __future__ import annotations

import itertools
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zestdb_spark.errors import ObserverExpired


def _now_s() -> float:
    return time.time()


@dataclass
class Observation:
    uuid: str
    path: str
    mode: str  # data | audit | notification
    expiry_s: float  # 0 = forever (src/observe.re:52)
    messages: list = field(default_factory=list)

    def matches(self, path: str) -> bool:
        """Exact match, or wildcard prefix ``/kv/foo/*``
        (src/observe.re:9-27, src/token.re:3-13)."""
        if self.path.endswith("/*"):
            return path.startswith(self.path[:-2] + "/")
        return path == self.path

    @property
    def expired(self) -> bool:
        return self.expiry_s != 0 and _now_s() > self.expiry_s


class ObserverRegistry:
    """Driver-side registration table + synchronous fan-out."""

    def __init__(self):
        self._obs: dict[str, Observation] = {}

    def register(self, path: str, mode: str = "data", max_age_s: int = 0) -> str:
        """ST1/ST2 + ST4: returns the observer uuid
        (src/server.re:859-872)."""
        oid = str(uuid.uuid4())
        expiry = 0 if max_age_s == 0 else _now_s() + max_age_s
        self._obs[oid] = Observation(uuid=oid, path=path, mode=mode, expiry_s=expiry)
        return oid

    def expire(self) -> list[str]:
        """Sweep expired registrations (run on every message in the
        reference, src/server.re:203-206). Returns expired uuids — the
        reference sends each a code-163 notification."""
        dead = [oid for oid, o in self._obs.items() if o.expired]
        for oid in dead:
            del self._obs[oid]
        return dead

    def publish_data(self, path: str, payload: Any) -> int:
        """Route a write/read payload to matching data observers
        (ST1/ST5; payload format src/server.re:109-141)."""
        self.expire()
        n = 0
        msg = {"ts": int(_now_s() * 1000), "path": path, "data": payload}
        for o in self._obs.values():
            if o.mode == "data" and o.matches(path):
                o.messages.append(msg)
                n += 1
        return n

    def publish_audit(self, record: tuple) -> int:
        """Route an audit record to audit observers (ST2;
        format src/server.re:74-107)."""
        self.expire()
        ts, server, client, method, path, code = record
        line = f"{ts} {server} {client} {method} {path} {code}"
        n = 0
        for o in self._obs.values():
            # audit observers are path-scoped like data observers — an
            # observer authorized for /ts/mine must not receive audit
            # lines for every other client's paths
            if o.mode == "audit" and o.matches(path):
                o.messages.append(line)
                n += 1
        return n

    def messages(self, oid: str) -> list:
        # sweep HERE too: TTL enforcement must not depend on unrelated
        # traffic having triggered a publish since the expiry passed
        self.expire()
        if oid not in self._obs:
            raise ObserverExpired(f"observer {oid} expired or unknown")
        return self._obs[oid].messages


# ------------------------------------------------------- streaming tier

def _path_predicate(path: str):
    if path.endswith("/*"):
        return F.col("path").startswith(path[:-2] + "/")
    return F.col("path") == path


_counter = itertools.count()


def start_audit_stream(
    spark: SparkSession,
    audit_dir: str,
    path: Optional[str] = None,
    query_name: Optional[str] = None,
):
    """ST2 at scale: readStream over the audit log (parquet append dir),
    filtered per observer, memory sink for tests. Returns the
    StreamingQuery; rows appear in the in-memory table ``query_name``."""
    from zestdb_spark import schema as S

    name = query_name or f"audit_obs_{next(_counter)}"
    # part-* only: log COMPACTION re-materializes rows as rw-* files
    # (storage.compact_log), and observers must never be re-notified
    # by maintenance — the same append-purity glob as the data stream
    stream = (
        spark.readStream.schema(S.AUDIT)
        .option("pathGlobFilter", "part-*")
        .parquet(audit_dir)
    )
    if path is not None:
        stream = stream.filter(_path_predicate(path))
    return (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )


def start_data_stream(
    spark: SparkSession,
    log_dir: str,
    schema,
    path: Optional[str] = None,
    query_name: Optional[str] = None,
):
    """ST1 at scale: one filtered Structured Streaming query per
    observer over an append log of writes. The engine's parquet append
    dirs are valid streaming sources as-is. The ``part-*`` glob admits
    only APPEND outputs: rewrites (delete survivors, upserts,
    compactions) re-materialize already-announced rows under ``rw-*``
    names (storage.py ``_stage_move``), and the reference's observers
    fire per POST, never on maintenance (src/server.re:778-793)."""
    name = query_name or f"data_obs_{next(_counter)}"
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "part-*")
        .parquet(log_dir)
    )
    if path is not None:
        stream = stream.filter(_path_predicate(path))
    return (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )


def windowed_rollup(events: DataFrame, window_duration: str = "5 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Beyond-reference streaming aggregation: event-time tumbling
    window with late-data watermark (the reference has no event-time
    windows at all — SURVEY.md §2.10). ``events`` must carry an
    event-time ``ts`` TimestampType column, a ``series_id``, and a
    ``value``; works identically on batch and streaming frames."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration), F.col("series_id"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
