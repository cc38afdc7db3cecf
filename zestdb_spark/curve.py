"""CurveZMQ security mechanism (ZMTP CURVE) via the system libsodium.

The reference encrypts both server sockets with CurveZMQ
(src/protocol/zest.re:242-243 ``set_curve_server``/``set_curve_secretkey``;
key material is Z85 text like the sample key in src/server.re:1087).
This module implements the PUBLIC CurveZMQ handshake + message format
(https://rfc.zeromq.org/spec/26/ — HELLO, WELCOME + cookie, INITIATE +
vouch, READY, MESSAGE; all crypto_box/crypto_secretbox over
Curve25519-XSalsa20-Poly1305) and Z85 key encoding
(https://rfc.zeromq.org/spec/32/), binding libsodium through ctypes —
no pyzmq needed. transport.py negotiates it from the ZMTP greeting
when keys are configured and falls back to NULL otherwise.

Layouts implemented from the spec, byte for byte:

  HELLO    = %d5 "HELLO" %x1 %x0 72%x00 Ct(32) nonce(8)
             box[64×%x00](Ct'→S)                 nonce "CurveZMQHELLO---"
  WELCOME  = %d7 "WELCOME" nonce(16)
             box[St + cookie(96)](S'→Ct)         nonce "WELCOME-"
    cookie = nonce(16) + secretbox[Ct + St'](cookie-key)  "COOKIE--"
  INITIATE = %d8 "INITIATE" cookie(96) nonce(8)
             box[C + vouch(96) + metadata](Ct'→St)  "CurveZMQINITIATE"
    vouch  = nonce(16) + box[Ct + S](C'→St)      nonce "VOUCH---"
  READY    = %d5 "READY" nonce(8)
             box[metadata](St'→Ct)               nonce "CurveZMQREADY---"
  MESSAGE  = %d7 "MESSAGE" nonce(8)
             box[flags(1) + payload]             nonce "CurveZMQMESSAGEC"
                                                 (client) / …"S" (server)

Short nonces are strictly-increasing little-endian counters per
direction (replay/reorder rejection falls out of open_box failing).
Client authentication: the server learns the client's long-term key C
from INITIATE (proven by the vouch); by default any client is
accepted — exactly the reference's posture, which configures only the
server secret — but ``allowed_clients`` enables pinning.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import struct
import threading

# ------------------------------------------------------------- libsodium

_BOX_PK = 32
_BOX_SK = 32
_BOX_NONCE = 24
_BOX_MAC = 16
_SECRETBOX_KEY = 32

_sodium = None
_sodium_err: str | None = None


def _load() -> "ctypes.CDLL | None":
    global _sodium, _sodium_err
    if _sodium is not None or _sodium_err is not None:
        return _sodium
    name = ctypes.util.find_library("sodium")
    for cand in ([name] if name else []) + ["libsodium.so.23", "libsodium.so"]:
        try:
            lib = ctypes.CDLL(cand)
            if lib.sodium_init() < 0:  # 0 fresh, 1 already initialized
                continue
            lib.crypto_box_easy.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_ulonglong,
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ]
            lib.crypto_box_open_easy.argtypes = lib.crypto_box_easy.argtypes
            lib.crypto_secretbox_easy.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_ulonglong,
                ctypes.c_char_p, ctypes.c_char_p,
            ]
            lib.crypto_secretbox_open_easy.argtypes = lib.crypto_secretbox_easy.argtypes
            _sodium = lib
            return lib
        except OSError:
            continue
    _sodium_err = "libsodium not found"
    return None


def available() -> bool:
    """True when the system libsodium is loadable — transport falls
    back to NULL (and serve.py refuses --curve flags) otherwise."""
    return _load() is not None


class CurveError(Exception):
    """Handshake/decryption failure — the connection must close."""


def _lib() -> ctypes.CDLL:
    lib = _load()
    if lib is None:
        raise CurveError("CURVE needs libsodium, which is not available here")
    return lib


def keypair() -> tuple[bytes, bytes]:
    """(public, secret) Curve25519 keypair."""
    lib = _lib()
    pk, sk = ctypes.create_string_buffer(_BOX_PK), ctypes.create_string_buffer(_BOX_SK)
    lib.crypto_box_keypair(pk, sk)
    return pk.raw, sk.raw


def public_from_secret(sk: bytes) -> bytes:
    """Derive the Curve25519 public key from a 32-byte secret — the
    reference configures only the secret (server.re:1102-1104), so the
    server's public key is recovered here for WELCOME/vouch checks."""
    lib = _lib()
    if len(sk) != _BOX_SK:
        raise ValueError("secret key must be 32 bytes")
    pk = ctypes.create_string_buffer(_BOX_PK)
    lib.crypto_scalarmult_base(pk, sk)
    return pk.raw


def _random(n: int) -> bytes:
    return os.urandom(n)  # libsodium's randombytes also wraps the OS CSPRNG


def _box(msg: bytes, nonce: bytes, pk: bytes, sk: bytes) -> bytes:
    lib = _lib()
    out = ctypes.create_string_buffer(len(msg) + _BOX_MAC)
    if lib.crypto_box_easy(out, msg, len(msg), nonce, pk, sk) != 0:
        raise CurveError("crypto_box failed")
    return out.raw


def _open_box(cipher: bytes, nonce: bytes, pk: bytes, sk: bytes) -> bytes:
    lib = _lib()
    if len(cipher) < _BOX_MAC:
        raise CurveError("box too short")
    out = ctypes.create_string_buffer(len(cipher) - _BOX_MAC)
    if lib.crypto_box_open_easy(out, cipher, len(cipher), nonce, pk, sk) != 0:
        raise CurveError("box authentication failed")
    return out.raw


def _secretbox(msg: bytes, nonce: bytes, key: bytes) -> bytes:
    lib = _lib()
    out = ctypes.create_string_buffer(len(msg) + _BOX_MAC)
    if lib.crypto_secretbox_easy(out, msg, len(msg), nonce, key) != 0:
        raise CurveError("crypto_secretbox failed")
    return out.raw


def _open_secretbox(cipher: bytes, nonce: bytes, key: bytes) -> bytes:
    lib = _lib()
    out = ctypes.create_string_buffer(len(cipher) - _BOX_MAC)
    if lib.crypto_secretbox_open_easy(out, cipher, len(cipher), nonce, key) != 0:
        raise CurveError("cookie authentication failed")
    return out.raw


# ------------------------------------------------------------------- Z85

_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_REV = {c: i for i, c in enumerate(_Z85)}


def z85_encode(data: bytes) -> str:
    """Z85 (spec/32): 4 bytes → 5 chars; the key-text format the
    reference configures (server.re:1087 sample key)."""
    if len(data) % 4:
        raise ValueError("Z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(data), 4):
        (v,) = struct.unpack(">I", data[i : i + 4])
        chunk = []
        for _ in range(5):
            chunk.append(_Z85[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("Z85 input must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            try:
                v = v * 85 + _Z85_REV[c]
            except KeyError:
                raise ValueError(f"invalid Z85 character {c!r}") from None
        out += struct.pack(">I", v)
    return bytes(out)


def decode_key(key: str | bytes) -> bytes:
    """Accept a 32-byte raw key or its 40-char Z85 text form."""
    if isinstance(key, bytes):
        if len(key) != 32:
            raise ValueError("raw CURVE key must be 32 bytes")
        return key
    if len(key) != 40:
        raise ValueError("Z85 CURVE key must be 40 characters")
    return z85_decode(key)


# ------------------------------------------------------ handshake logic


def _short_nonce_prefixed(prefix: bytes, counter: int) -> tuple[bytes, bytes]:
    # BIG-endian: libzmq writes short nonces with put_uint64 (network
    # byte order, wire.hpp) and enforces strictly-increasing on the
    # same read — a little-endian counter survives loopback but trips
    # a real libzmq peer's replay floor once the counter passes 255
    short = struct.pack(">Q", counter)
    assert len(prefix) == 16
    return short, prefix + short


class _Session:
    """Post-handshake state: the transient-key pair in use plus one
    strictly-increasing send counter and a floor for receives."""

    def __init__(self, our_sk: bytes, their_pk: bytes, we_are_server: bool):
        self.our_sk = our_sk
        self.their_pk = their_pk
        self.send_prefix = b"CurveZMQMESSAGES" if we_are_server else b"CurveZMQMESSAGEC"
        self.recv_prefix = b"CurveZMQMESSAGEC" if we_are_server else b"CurveZMQMESSAGES"
        self._send_counter = 1
        self._recv_floor = 0
        self._lock = threading.Lock()

    def encrypt(self, flags: int, payload: bytes) -> bytes:
        with self._lock:
            c = self._send_counter
            self._send_counter += 1
        short, nonce = _short_nonce_prefixed(self.send_prefix, c)
        body = _box(bytes([flags]) + payload, nonce, self.their_pk, self.our_sk)
        return b"\x07MESSAGE" + short + body

    def decrypt(self, command: bytes) -> tuple[int, bytes]:
        if not command.startswith(b"\x07MESSAGE") or len(command) < 16:
            raise CurveError("expected MESSAGE command")
        short = command[8:16]
        (counter,) = struct.unpack(">Q", short)  # libzmq wire order
        if counter <= self._recv_floor:
            raise CurveError("MESSAGE nonce replayed or out of order")
        plain = _open_box(
            command[16:], self.recv_prefix + short, self.their_pk, self.our_sk
        )
        self._recv_floor = counter
        if not plain:
            raise CurveError("empty MESSAGE plaintext")
        return plain[0], plain[1:]


def client_handshake(
    send_command,
    recv_command,
    server_key: bytes,
    client_public: bytes,
    client_secret: bytes,
    metadata: bytes,
) -> tuple[_Session, bytes]:
    """Run the client side over a command transport (callables that
    send/receive one ZMTP command body). Returns (session, server
    metadata bytes)."""
    ct_pk, ct_sk = keypair()
    # HELLO: prove we can box to the server's long-term key
    short, nonce = _short_nonce_prefixed(b"CurveZMQHELLO---", 1)
    hello_box = _box(b"\x00" * 64, nonce, server_key, ct_sk)
    send_command(
        b"\x05HELLO" + bytes([1, 0]) + b"\x00" * 72 + ct_pk + short + hello_box
    )
    # WELCOME: learn the server transient key + take the cookie
    welcome = recv_command()
    if not welcome.startswith(b"\x07WELCOME") or len(welcome) != 8 + 16 + 144:
        raise CurveError("malformed WELCOME")
    wnonce = welcome[8:24]
    plain = _open_box(welcome[24:], b"WELCOME-" + wnonce, server_key, ct_sk)
    st_pk, cookie = plain[:32], plain[32:]
    # INITIATE: vouch for our transient key with our long-term key
    vnonce = _random(16)
    vouch = vnonce + _box(ct_pk + server_key, b"VOUCH---" + vnonce, st_pk, client_secret)
    short, nonce = _short_nonce_prefixed(b"CurveZMQINITIATE", 2)
    init_box = _box(client_public + vouch + metadata, nonce, st_pk, ct_sk)
    send_command(b"\x08INITIATE" + cookie + short + init_box)
    # READY: server metadata under the transient pair
    ready = recv_command()
    if not ready.startswith(b"\x05READY") or len(ready) < 14:
        raise CurveError("malformed READY")
    short = ready[6:14]
    meta = _open_box(ready[14:], b"CurveZMQREADY---" + short, st_pk, ct_sk)
    sess = _Session(ct_sk, st_pk, we_are_server=False)
    # the client's short-nonce sequence is ONE counter across the whole
    # connection: HELLO consumed 1, INITIATE consumed 2, so the first
    # MESSAGE must carry 3 — libzmq tracks cn_peer_nonce from INITIATE
    # and rejects any MESSAGE nonce <= 2 (spec/26 strictly-increasing)
    sess._send_counter = 3
    sess._recv_floor = 1  # READY consumed server nonce 1
    return sess, meta


def server_handshake(
    send_command,
    recv_command,
    server_public: bytes,
    server_secret: bytes,
    metadata: bytes,
    allowed_clients: "set[bytes] | None" = None,
) -> tuple[_Session, bytes, bytes]:
    """Run the server side. Returns (session, client metadata bytes,
    client long-term public key)."""
    hello = recv_command()
    if not hello.startswith(b"\x05HELLO") or len(hello) != 6 + 2 + 72 + 32 + 8 + 80:
        raise CurveError("malformed HELLO")
    if hello[6] != 1:
        raise CurveError(f"unsupported CurveZMQ version {hello[6]}")
    ct_pk = hello[80:112]
    short = hello[112:120]
    _open_box(  # contents are 64 zeros; authenticity is the point
        hello[120:], b"CurveZMQHELLO---" + short, ct_pk, server_secret
    )
    # WELCOME with an anti-DoS cookie (we could forget St' here and
    # recover it from the cookie; we keep it in scope — same wire shape)
    st_pk, st_sk = keypair()
    cookie_key = _random(_SECRETBOX_KEY)
    cnonce = _random(16)
    cookie = cnonce + _secretbox(ct_pk + st_sk, b"COOKIE--" + cnonce, cookie_key)
    wnonce = _random(16)
    welcome_box = _box(st_pk + cookie, b"WELCOME-" + wnonce, ct_pk, server_secret)
    send_command(b"\x07WELCOME" + wnonce + welcome_box)
    # INITIATE: check the cookie, open the box, verify the vouch chain
    init = recv_command()
    if not init.startswith(b"\x08INITIATE") or len(init) < 9 + 96 + 8 + 16:
        raise CurveError("malformed INITIATE")
    cookie_back = init[9:105]
    cookie_plain = _open_secretbox(
        cookie_back[16:], b"COOKIE--" + cookie_back[:16], cookie_key
    )
    if cookie_plain[:32] != ct_pk or cookie_plain[32:] != st_sk:
        raise CurveError("INITIATE cookie does not match this exchange")
    short = init[105:113]
    plain = _open_box(init[113:], b"CurveZMQINITIATE" + short, ct_pk, st_sk)
    if len(plain) < 32 + 96:
        raise CurveError("INITIATE box too short")
    c_pk, vouch, meta = plain[:32], plain[32:128], plain[128:]
    vouch_plain = _open_box(vouch[16:], b"VOUCH---" + vouch[:16], c_pk, st_sk)
    if vouch_plain != ct_pk + server_public:
        raise CurveError("vouch does not bind this client and server")
    if allowed_clients is not None and c_pk not in allowed_clients:
        raise CurveError("client key not in the allowed set")
    # READY
    short2, nonce2 = _short_nonce_prefixed(b"CurveZMQREADY---", 1)
    send_command(b"\x05READY" + short2 + _box(metadata, nonce2, ct_pk, st_sk))
    sess = _Session(st_sk, ct_pk, we_are_server=True)
    sess._send_counter = 2  # READY consumed server nonce 1
    # client nonces 1 (HELLO) and 2 (INITIATE) are spent: enforce the
    # libzmq receive floor so a replayed handshake-era nonce is rejected
    sess._recv_floor = 2
    return sess, meta, c_pk
