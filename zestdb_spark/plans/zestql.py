"""ZestQL front-end — the reference's prototype SQL-ish shell
(test/zestql/: lexer.mll, parser.mly, zestql.re), reimplemented as a
hand-rolled tokenizer + recursive-descent parser that lowers to the
same ``QueryPlan`` as the URI-path front-end.

Statement forms (parser.mly:42-50):
  CONNECT KEY "k" [HOST "h"]
  POST <float> TO "id" [WHERE "tag" IS "val"]
  GET [func] FROM "id[,id2]" [WHERE "tag" IS "val"] SINCE <n><unit>
  GET [func] FROM "ids" [WHERE ...] RANGE <n><unit> TO <n><unit>
  GET [func] FROM "ids" [WHERE ...] LAST <n>
  OBSERVE FROM "id" [MODE data|audit] [FOR <n> s]
  DELETE FROM "ids" [WHERE ...] RANGE <n><unit> TO <n><unit>
  DISCONNECT [HOST "h"]

Relative times resolve to ``now_ms − n·unit`` (zestql.re:9-12); pass
``now_ms`` explicitly for deterministic tests. Funcs are
min/max/sum/count/mean/sd (parser.mly:63) — we additionally accept
median, which the engine supports everywhere else.

Reference quirks handled deliberately:
- the reference lexer tokenizes ``min`` as the aggregate even in time
  position (lexer.mll first-match), so ``SINCE 10min`` fails there; our
  parser is context-aware and accepts m/min/minutes as a unit.
- the reference compiles POST values as JSON *strings*
  (zestql.re:46-50) which its own numeric validator then rejects; we
  emit proper numeric writes.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

from zestdb_spark.errors import BadRequest
from zestdb_spark.plans.plan import QueryPlan, Window

_UNIT_MS = {
    "s": 1000, "sec": 1000, "seconds": 1000,
    "m": 60_000, "min": 60_000, "minutes": 60_000,
    "h": 3_600_000, "hr": 3_600_000, "hours": 3_600_000,
    "d": 86_400_000, "days": 86_400_000,
}
_FUNCS = ("min", "max", "sum", "count", "mean", "median", "sd")

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<string>"[^"]*")
      | (?P<number>-?\d+(?:\.\d+)?)
      | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
      | (?P<semi>;)
    )""",
    re.VERBOSE,
)


@dataclass(frozen=True)
class Post:
    value: float
    series_id: str
    tag: Optional[tuple[str, str]] = None  # (tag_name, tag_value)


@dataclass(frozen=True)
class Observe:
    series_id: str
    mode: str = "data"
    max_age_s: int = 0  # 0 = forever (src/observe.re:52)


@dataclass(frozen=True)
class Connect:
    key: str
    host: Optional[str] = None


@dataclass(frozen=True)
class Disconnect:
    host: Optional[str] = None


@dataclass(frozen=True)
class Delete:
    plan: QueryPlan


@dataclass(frozen=True)
class Get:
    plan: QueryPlan


Statement = Post | Observe | Connect | Disconnect | Delete | Get


def _tokenize(text: str) -> list[str]:
    tokens, pos = [], 0
    while pos < len(text):
        if text[pos].isspace():
            pos += 1
            continue
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise BadRequest(f"ZestQL: unexpected character {text[pos]!r}")
        tokens.append(m.group().strip())
        pos = m.end()
    return tokens


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> Optional[str]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def peek_kw(self) -> Optional[str]:
        t = self.peek()
        return t.lower() if t is not None else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            raise BadRequest("ZestQL: unexpected end of statement")
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect_kw(self, kw: str) -> None:
        t = self.next()
        if t.lower() != kw:
            raise BadRequest(f"ZestQL: expected {kw.upper()}, got {t!r}")

    def accept_kw(self, kw: str) -> bool:
        if self.peek_kw() == kw:
            self.i += 1
            return True
        return False

    def string(self) -> str:
        t = self.next()
        if not (t.startswith('"') and t.endswith('"')):
            raise BadRequest(f"ZestQL: expected string literal, got {t!r}")
        return t[1:-1]

    def integer(self) -> int:
        t = self.next()
        try:
            return int(t)
        except ValueError as e:
            raise BadRequest(f"ZestQL: expected integer, got {t!r}") from e

    def number(self) -> float:
        t = self.next()
        try:
            return float(t)
        except ValueError as e:
            raise BadRequest(f"ZestQL: expected number, got {t!r}") from e

    def unit_ms(self) -> int:
        t = self.next().lower()
        if t not in _UNIT_MS:
            raise BadRequest(f"ZestQL: unknown time unit {t!r}")
        return _UNIT_MS[t]

    def rel_time(self, now_ms: int) -> int:
        n = self.integer()
        return now_ms - n * self.unit_ms()

    def tag(self) -> Optional[tuple[str, str]]:
        if self.accept_kw("where"):
            name = self.string()
            self.expect_kw("is")
            return (name, self.string())
        return None


def parse(statement: str, now_ms: int) -> Statement:
    """Parse one ZestQL statement (trailing ';' optional)."""
    tokens = _tokenize(statement)
    if tokens and tokens[-1] == ";":
        tokens = tokens[:-1]
    if not tokens:
        raise BadRequest("ZestQL: empty statement")
    p = _Parser(tokens)
    kw = p.next().lower()

    if kw == "connect":
        p.expect_kw("key")
        key = p.string()
        host = p.string() if p.accept_kw("host") else None
        return Connect(key=key, host=host)

    if kw == "disconnect":
        host = p.string() if p.accept_kw("host") else None
        return Disconnect(host=host)

    if kw == "post":
        value = p.number()
        p.expect_kw("to")
        series = p.string()
        return Post(value=value, series_id=series, tag=p.tag())

    if kw == "observe":
        p.expect_kw("from")
        series = p.string()
        mode = "data"
        if p.accept_kw("mode"):
            mode = p.next().lower()
            if mode not in ("data", "audit"):
                raise BadRequest(f"ZestQL: unknown observe mode {mode!r}")
        max_age = 0
        if p.accept_kw("for"):
            n = p.integer()
            # grammar allows only SECONDS (parser.mly max_age); we accept
            # any unit but honor its multiplier instead of silently
            # registering 'FOR 5 min' as a 5-second TTL
            max_age = n * p.unit_ms() // 1000
        return Observe(series_id=series, mode=mode, max_age_s=max_age)

    if kw in ("get", "delete"):
        func = None
        if kw == "get" and p.peek_kw() in _FUNCS:
            func = p.next().lower()
        p.expect_kw("from")
        ids = tuple(p.string().split(","))
        tag = p.tag()
        filt = ("equals", tag[0], tag[1]) if tag else None

        w = p.peek_kw()
        if w == "since" and kw == "get":
            p.next()
            window = Window("since", from_ms=p.rel_time(now_ms))
        elif w == "range":
            p.next()
            t1 = p.rel_time(now_ms)
            p.expect_kw("to")
            t2 = p.rel_time(now_ms)
            window = Window("range", from_ms=t1, to_ms=t2)
        elif w == "last" and kw == "get":
            p.next()
            window = Window("last", n=p.integer())
        else:
            raise BadRequest(f"ZestQL: expected window clause, got {w!r}")

        plan = QueryPlan(ids=ids, window=window, filter=filt, agg=func)
        return Get(plan) if kw == "get" else Delete(plan)

    raise BadRequest(f"ZestQL: unknown statement {kw!r}")
