"""Pure-Python macaroons (mint + verify, first-party caveats).

Replaces the round-1 ACL shim's missing half: the reference's tokens
ARE macaroons (src/token.re:15-21 verifies, utils/mint.re mints), and
the construction is public — Google's "Macaroons: Cookies with
Contextual Caveats" (NDSS'14) / libmacaroons. Only the pieces the
reference uses are implemented: location + identifier + first-party
caveats + HMAC signature chain, V1 text serialization.

Construction (libmacaroons V1, HMAC-SHA256 as in pymacaroons; the
reference's sodium binding uses libsodium's crypto_auth — same chain
structure, different MAC, so tokens are semantically but not
byte-compatible):

    derived = HMAC(key="macaroons-key-generator", msg=secret)
    sig0    = HMAC(derived, identifier)
    sig_i   = HMAC(sig_{i-1}, caveat_i)

Verification recomputes the chain under the server secret and then
checks every caveat against the request context with the reference's
matching rule (src/token.re:3-13): a caveat ending in ``*`` matches a
context string that starts with the caveat minus the star; any other
caveat must appear verbatim.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
from dataclasses import dataclass, field, replace

_KEY_GEN = b"macaroons-key-generator"


def _hmac(key: bytes, msg: bytes) -> bytes:
    return hmac.new(key, msg, hashlib.sha256).digest()


def _derive_key(secret: str | bytes) -> bytes:
    raw = secret.encode() if isinstance(secret, str) else secret
    return _hmac(_KEY_GEN, raw)


def _packet(key: str, value: bytes) -> bytes:
    """V1 packet: 4 lowercase-hex chars of TOTAL length (prefix + body +
    newline), then ``key value\\n``. The length field caps a packet at
    0xFFFF bytes — enforce it at MINT time (libmacaroons does the
    same): a silent 5-hex-digit overflow would serialize a token whose
    packet stream desynchronizes on read, failing verification much
    later with no hint why."""
    body = key.encode() + b" " + value + b"\n"
    total = len(body) + 4
    if total > 0xFFFF:
        raise ValueError(
            f"macaroon packet {key!r} is {total} bytes; the v1 format "
            "caps packets at 65535"
        )
    return f"{total:04x}".encode() + body


@dataclass(frozen=True)
class Macaroon:
    location: str
    identifier: str
    signature: bytes
    caveats: tuple[str, ...] = field(default_factory=tuple)

    # ------------------------------------------------------------- minting

    @classmethod
    def create(cls, location: str, identifier: str, key: str | bytes) -> "Macaroon":
        return cls(location, identifier, _hmac(_derive_key(key), identifier.encode()))

    def add_first_party_caveat(self, cid: str) -> "Macaroon":
        return replace(
            self,
            caveats=self.caveats + (cid,),
            signature=_hmac(self.signature, cid.encode()),
        )

    # --------------------------------------------------------- wire format

    def serialize(self) -> str:
        pkts = [
            _packet("location", self.location.encode()),
            _packet("identifier", self.identifier.encode()),
        ]
        for c in self.caveats:
            pkts.append(_packet("cid", c.encode()))
        pkts.append(_packet("signature", self.signature))
        return base64.urlsafe_b64encode(b"".join(pkts)).rstrip(b"=").decode()

    @classmethod
    def deserialize(cls, token: str) -> "Macaroon":
        raw = base64.urlsafe_b64decode(token + "=" * (-len(token) % 4))
        loc = ident = None
        sig = None
        caveats: list[str] = []
        pos = 0
        while pos < len(raw):
            ln = int(raw[pos : pos + 4], 16)
            body = raw[pos + 4 : pos + ln]
            pos += ln
            # exactly ONE trailing newline belongs to the packet frame —
            # rstrip would eat 0x0a bytes of a raw signature
            if body.endswith(b"\n"):
                body = body[:-1]
            key, _, value = body.partition(b" ")
            if key == b"location":
                loc = value.decode()
            elif key == b"identifier":
                ident = value.decode()
            elif key == b"cid":
                caveats.append(value.decode())
            elif key == b"signature":
                sig = value
            else:
                raise ValueError(f"unsupported packet {key!r}")
        if loc is None or ident is None or sig is None:
            raise ValueError("truncated macaroon")
        return cls(loc, ident, sig, tuple(caveats))

    # ---------------------------------------------------------- validation

    def verify_signature(self, key: str | bytes) -> bool:
        sig = _hmac(_derive_key(key), self.identifier.encode())
        for c in self.caveats:
            sig = _hmac(sig, c.encode())
        return hmac.compare_digest(sig, self.signature)


def caveat_satisfied(caveat: str, context: list[str]) -> bool:
    """src/token.re:3-13 ``check``: trailing-star caveats are prefix
    patterns over the context strings; others are exact members."""
    if caveat.endswith("*"):
        return any(
            len(caveat) <= len(c) and caveat == c[: len(caveat) - 1] + "*"
            for c in context
        )
    return caveat in context


def is_valid(token: str, key: str | bytes, context: list[str]) -> bool:
    """src/token.re:15-21 ``is_valid``: deserialize (malformed → False),
    verify the HMAC chain, then require EVERY caveat satisfied."""
    try:
        m = Macaroon.deserialize(token)
    except (ValueError, IndexError):
        return False
    if not m.verify_signature(key):
        return False
    return all(caveat_satisfied(c, context) for c in m.caveats)


def mint_token(
    *,
    id: str,
    location: str,
    path: str,
    meth: str,
    target: str,
    key: str | bytes,
    observe: str | None = None,
) -> str:
    """utils/mint.re ``mint_token``: caveats are the pre-rendered
    ``attr = value`` strings the server's context will contain."""
    m = Macaroon.create(location, id, key)
    m = m.add_first_party_caveat(path)
    m = m.add_first_party_caveat(meth)
    m = m.add_first_party_caveat(target)
    if observe is not None:
        m = m.add_first_party_caveat(observe)
    return m.serialize()
