"""Engine errors mirroring the reference's CoAP response codes.

The reference replies with CoAP-style codes (src/server.re): 128 Bad
Request for invalid payloads/paths, 129 Unauthorized, 134 Unsupported
(e.g. DELETE of an aggregate path, src/server.re:955-974), 163 for
expired observers. We surface them as typed exceptions at the API layer;
inside the engine everything is plain DataFrames.
"""

from __future__ import annotations


class ZestError(Exception):
    code: int = 128

    def __init__(self, message: str = ""):
        super().__init__(message or self.__class__.__name__)


class BadRequest(ZestError):
    """CoAP 128 — invalid payload, path, or operator combination
    (reference: src/server.re:656-669, the `Empty` fallthrough of the
    dispatch table src/server.re:217-258)."""

    code = 128


class Unauthorized(ZestError):
    """CoAP 129 — token check failed (src/server.re:811-820)."""

    code = 129


class UnsupportedMethod(ZestError):
    """CoAP 134 — e.g. DELETE on first/last/length/aggregate paths
    (src/server.re:955-974)."""

    code = 134


class ObserverExpired(ZestError):
    """CoAP 163 — observer registration past max-age (src/observe.re:96-113)."""

    code = 163


class StoreBusy(ZestError):
    """CoAP 163 Service Unavailable — another writer holds a table's
    rewrite lock past the wait deadline. The reference serializes ALL
    writes through one server loop over a transactional Irmin store
    (src/server.re:1075-1084, src/timeseries/shard.re:9-11); the
    parquet emulation serializes only the REWRITE paths (delete /
    upsert / compact — plain appends commute and need no lock) via an
    advisory per-table lockfile. Retry after the holder finishes, or
    move to Delta/Iceberg for real concurrent-writer coordination."""

    code = 163
