"""URI-path front-end — the reference's primary "query language".

Mirrors the pattern-match in src/server.re:260-510 (window ops) and the
fn-suffix table at src/server.re:217-258: a suffix is one of
  []                                   — raw window read
  [<agg>]                              — bare aggregate
  [filter/<tag>/<equals|contains>/<val>]          — bare filter
  [filter/<tag>/<op>/<val>, <agg>]     — filter then aggregate
Any other combination is invalid → BadRequest (the reference's `Empty`
fallthrough → CoAP 128). ``length`` and all ``/ts/blob`` reads accept no
suffix. Ids are comma-split (src/server.re:208-215) — the multi-series
UNION ALL of SURVEY §2.3.

Example:  /ts/sensor1,sensor2/last/100/filter/room/equals/lounge/max
"""

from __future__ import annotations

from zestdb_spark.errors import BadRequest
from zestdb_spark.plans.plan import QueryPlan, Window, VALID_AGGS


def _parse_int(s: str) -> int:
    try:
        return int(s)
    except ValueError as e:
        raise BadRequest(f"expected integer path segment, got {s!r}") from e


def _parse_fn(parts: list[str]) -> tuple:
    """→ (filter | None, agg | None); raises BadRequest on any other shape."""
    if not parts:
        return None, None
    if len(parts) == 1 and parts[0] in VALID_AGGS:
        return None, parts[0]
    if len(parts) >= 4 and parts[0] == "filter" and parts[2] in ("equals", "contains"):
        filt = (parts[2], parts[1], parts[3])
        rest = parts[4:]
        if not rest:
            return filt, None
        if len(rest) == 1 and rest[0] in VALID_AGGS:
            return filt, rest[0]
    raise BadRequest(f"invalid function suffix: {'/'.join(parts)}")


def plan_to_path(plan: QueryPlan) -> str:
    """Inverse of ``compile_path``: render a QueryPlan back to its URI
    path (round-trip property: compile_path(plan_to_path(p)) == p)."""
    parts = ["", "ts"]
    if plan.store == "blob":
        parts.append("blob")
    parts.append(",".join(plan.ids))
    w = plan.window
    if w.op in ("latest", "earliest", "length"):
        parts.append(w.op)
    elif w.op in ("last", "first"):
        parts += [w.op, str(w.n)]
    elif w.op == "since":
        parts += ["since", str(w.from_ms)]
    else:
        parts += ["range", str(w.from_ms), str(w.to_ms)]
    if plan.filter is not None:
        op, tag, val = plan.filter
        parts += ["filter", tag, op, val]
    if plan.agg is not None:
        parts.append(plan.agg)
    return "/".join(parts)


def compile_path(path: str) -> QueryPlan:
    """GET path → QueryPlan. Raises BadRequest on unrecognized shapes."""
    parts = path.split("/")
    if len(parts) < 3 or parts[0] != "" or parts[1] != "ts":
        raise BadRequest(f"not a ts read path: {path!r}")

    store = "numeric"
    rest = parts[2:]
    if rest and rest[0] == "blob":
        store = "blob"
        rest = rest[1:]
    if not rest:
        raise BadRequest(f"missing series ids: {path!r}")

    ids = tuple(rest[0].split(","))
    ops = rest[1:]
    if not ops:
        raise BadRequest(f"missing window op: {path!r}")

    op, args = ops[0], ops[1:]
    if op == "length":
        window, fn_parts = Window("length"), args
    elif op == "latest":
        window, fn_parts = Window("latest"), args
    elif op == "earliest":
        window, fn_parts = Window("earliest"), args
    elif op == "last" and args:
        window, fn_parts = Window("last", n=_parse_int(args[0])), args[1:]
    elif op == "first" and args:
        window, fn_parts = Window("first", n=_parse_int(args[0])), args[1:]
    elif op == "since" and args:
        window, fn_parts = Window("since", from_ms=_parse_int(args[0])), args[1:]
    elif op == "range" and len(args) >= 2:
        window = Window("range", from_ms=_parse_int(args[0]), to_ms=_parse_int(args[1]))
        fn_parts = args[2:]
    else:
        raise BadRequest(f"unrecognized window op: {path!r}")

    if window.op == "length" and fn_parts:
        # length takes no suffix (src/server.re:268-271 matches exactly)
        raise BadRequest(f"length takes no functions: {path!r}")

    filt, agg = _parse_fn(list(fn_parts))
    if store == "blob" and (filt or agg):
        # blob reads have no fn pipeline (src/server.re blob arms take no func)
        raise BadRequest(f"blob reads accept no filter/aggregate: {path!r}")

    return QueryPlan(ids=ids, window=window, store=store, filter=filt, agg=agg)
