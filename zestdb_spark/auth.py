"""Thin ACL shim (SURVEY.md §2.12 M4).

The reference authorizes requests with macaroons whose caveats restrict
method / path / target, with wildcard paths (src/token.re:3-21,
src/server.re:811-820; `utils/mint.re` mints them). Cryptographic
macaroon verification is transport-layer and out of analytic scope —
this shim reproduces the AUTHORIZATION semantics: a token is a set of
grants, each ``(method, path-pattern)`` where the pattern is exact or a
``/prefix/*`` wildcard (the same matching rule as observation scoping,
src/token.re:3-13).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from zestdb_spark.errors import Unauthorized


def path_matches(pattern: str, path: str) -> bool:
    """Exact match, or wildcard prefix ``/a/b/*`` (src/token.re:3-13).

    The reference requires len(pattern) <= len(path), so ``/a/b/*``
    never matches the bare ``/a/b`` — same rule as observe.py's
    matcher."""
    if pattern == "*":
        return True
    if pattern.endswith("/*"):
        return path.startswith(pattern[:-2] + "/")
    return path == pattern


@dataclass(frozen=True)
class Grant:
    method: str  # GET | POST | DELETE | OBSERVE | *
    path: str  # exact, /prefix/*, or *

    def allows(self, method: str, path: str) -> bool:
        return (self.method == "*" or self.method == method.upper()) and path_matches(
            self.path, path
        )


@dataclass
class Token:
    grants: list[Grant] = field(default_factory=list)

    def allows(self, method: str, path: str) -> bool:
        return any(g.allows(method, path) for g in self.grants)


class AclValidator:
    """Pluggable `ZestEngine.authorize` implementation: token-id →
    grant set; unknown token or no matching grant → Unauthorized
    (CoAP 129, src/server.re:811-820). ``enabled=False`` (the default
    engine behavior) accepts everything — matching the reference's
    ``--enable-macaroons`` opt-in."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self._tokens: dict[str, Token] = {}

    def mint(self, token_id: str, grants: list[tuple[str, str]]) -> Token:
        tok = Token([Grant(m.upper(), p) for m, p in grants])
        self._tokens[token_id] = tok
        return tok

    def revoke(self, token_id: str) -> None:
        self._tokens.pop(token_id, None)

    def check(
        self,
        method: str,
        path: str,
        token_id: str | None,
        observe: str | None = None,
    ) -> None:
        """``observe`` is set for observation registrations: an OBSERVE
        grant authorizes exactly those, and a plain GET grant covers
        them too (observing a path you may read). Without this branch
        the OBSERVE method the Grant docstring advertises could never
        match — the engine authorizes observe requests as GET."""
        if not self.enabled:
            return
        tok = self._tokens.get(token_id or "")
        if tok is None:
            raise Unauthorized(f"{method} {path} not permitted for this token")
        if observe is not None and tok.allows("OBSERVE", path):
            return
        if not tok.allows(method, path):
            raise Unauthorized(f"{method} {path} not permitted for this token")


class MacaroonValidator:
    """Cryptographic token verification — the reference's actual auth
    (src/server.re:811-820): the request context is rendered as
    ``["path = <p>", "method = <m>", ("observe = <o>",) "target =
    <identity>"]`` and the presented token must be a macaroon signed by
    ``secret_key`` whose every caveat matches that context
    (zestdb_spark.macaroons implements the public libmacaroons chain).

    An empty secret key accepts everything, exactly like the reference's
    unset ``token_secret_key`` (server.re:812-813)."""

    def __init__(self, secret_key: str, identity: str):
        self.secret_key = secret_key
        self.identity = identity

    def context(self, method: str, path: str, observe: str | None = None) -> list[str]:
        ctx = [f"path = {path}", f"method = {method.upper()}"]
        if observe is not None:
            ctx.append(f"observe = {observe}")
        ctx.append(f"target = {self.identity}")
        return ctx

    def check(
        self, method: str, path: str, token: str | None, observe: str | None = None
    ) -> None:
        from zestdb_spark import macaroons

        if self.secret_key == "":
            return
        if not macaroons.is_valid(
            token or "", self.secret_key, self.context(method, path, observe)
        ):
            raise Unauthorized(f"{method} {path}: invalid or insufficient token")
