"""Golden WIRE BYTES for the ZMTP 3.0 / CurveZMQ stack — interop
evidence beyond loopback consistency.

The loopback tests prove our client talks to our server; these pin the
bytes against literals hand-written from the PUBLIC specs
(rfc.zeromq.org/spec/23 greeting/framing/NULL, spec/26 CurveZMQ
command layouts) and against libzmq's documented wire conventions
(big-endian short nonces via put_uint64). A same-bug-both-sides
regression cannot pass these: the expected bytes never go through the
implementation under test.

The raw NULL exchange below IS a hand-rolled minimal libzmq peer: the
greeting, READY and message frames the test sends are spelled out as
byte literals, so if our server answers them correctly it would answer
a real libzmq REQ socket speaking NULL the same way.
"""

from __future__ import annotations

import socket
import struct

import pytest

from zestdb_spark import curve
from zestdb_spark.transport import ZestRepServer, _greeting

# --------------------------------------------------------- ZMTP (spec/23)

#: 64-octet greeting, spelled from the spec: signature %xFF 8%x00 %x7F,
#: version 3.0, mechanism "NULL" zero-padded to 20, as-server %x00,
#: 31 filler octets
GREETING_NULL = (
    b"\xff\x00\x00\x00\x00\x00\x00\x00\x00\x7f"
    + b"\x03\x00"
    + b"NULL" + b"\x00" * 16
    + b"\x00"
    + b"\x00" * 31
)

#: READY command frame for a REQ socket: flags %x04 (command), length
#: 25, command-name "\x05READY", metadata "Socket-Type" -> "REQ"
#: (1-octet name length + name, 4-octet big-endian value length + value)
READY_REQ = b"\x04\x19\x05READY" + b"\x0bSocket-Type" + b"\x00\x00\x00\x03" + b"REQ"
READY_REP = b"\x04\x19\x05READY" + b"\x0bSocket-Type" + b"\x00\x00\x00\x03" + b"REP"


def test_greeting_matches_spec_literal():
    assert len(GREETING_NULL) == 64
    assert _greeting(b"NULL", as_server=False) == GREETING_NULL
    # CURVE greeting differs only in the mechanism field + as-server
    g = _greeting(b"CURVE", as_server=True)
    assert g[:12] == GREETING_NULL[:12]
    assert g[12:32] == b"CURVE" + b"\x00" * 15
    assert g[32] == 0x01


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


def test_null_rep_server_against_handrolled_req_bytes():
    """Drive ZestRepServer with raw spec-literal bytes end to end:
    greeting, READY, then a REQ-enveloped request — asserting every
    byte the server answers with. No code under test produces the
    expected values."""
    srv = ZestRepServer(lambda b: b"PONG:" + b).start()
    try:
        sock = socket.create_connection(("127.0.0.1", int(srv.endpoint.rsplit(":", 1)[1])), timeout=10)
        sock.settimeout(10)
        sock.sendall(GREETING_NULL)
        assert _recv_exact(sock, 64) == GREETING_NULL  # NULL server: as-server 0
        sock.sendall(READY_REQ)
        assert _recv_exact(sock, 2 + 25) == READY_REP
        # REQ request: empty delimiter frame (flags MORE, len 0) + body
        sock.sendall(b"\x01\x00" + b"\x00\x04ping")
        # reply mirrors the envelope: delimiter + "PONG:ping"
        assert _recv_exact(sock, 2) == b"\x01\x00"
        assert _recv_exact(sock, 2 + 9) == b"\x00\x09PONG:ping"
        # long-frame boundary: a 300-byte body uses flags %x02 + 8-octet
        # big-endian length (spec/23 long frame)
        body = b"x" * 300
        sock.sendall(b"\x01\x00" + b"\x02" + struct.pack(">Q", 300) + body)
        assert _recv_exact(sock, 2) == b"\x01\x00"
        hdr = _recv_exact(sock, 9)
        assert hdr == b"\x02" + struct.pack(">Q", 305)
        assert _recv_exact(sock, 305) == b"PONG:" + body
        sock.close()
    finally:
        srv.stop()


# ------------------------------------------------------ CURVE (spec/26)

pytestmark_curve = pytest.mark.skipif(
    not curve.available(), reason="libsodium not available"
)

#: the reference's own published sample key doubles as the fixed
#: long-term server identity for the layout vectors
REF_SECRET = "uf4XGHI7[fLoe&aG1tU83[ptpezyQMVIHh)J=zB1"


@pytest.mark.skipif(not curve.available(), reason="libsodium not available")
def test_curve_command_layouts_match_spec26(monkeypatch):
    """Run the full handshake with PINNED transient keys and check
    every command against spec/26's layout table: exact sizes, field
    offsets, version octets, zero padding, and big-endian short-nonce
    counters at the positions libzmq reads them from."""
    import queue
    import threading

    server_secret = curve.decode_key(REF_SECRET)
    server_public = curve.public_from_secret(server_secret)
    client_public, client_secret = curve.keypair()

    # pin the transient keypairs deterministically (client then server)
    fixed = [curve.keypair(), curve.keypair()]
    seq = iter(fixed)
    monkeypatch.setattr(curve, "keypair", lambda: next(seq))
    ct_pk = fixed[0][0]

    c2s: "queue.Queue[bytes]" = queue.Queue()
    s2c: "queue.Queue[bytes]" = queue.Queue()
    sent_c: list[bytes] = []
    sent_s: list[bytes] = []
    out: dict = {}

    def server():
        out["server"] = curve.server_handshake(
            lambda b: (sent_s.append(b), s2c.put(b)),
            lambda: c2s.get(timeout=5),
            server_public,
            server_secret,
            b"",
        )

    t = threading.Thread(target=server)
    t.start()
    sess_c, _meta = curve.client_handshake(
        lambda b: (sent_c.append(b), c2s.put(b)),
        lambda: s2c.get(timeout=5),
        server_public,
        client_public,
        client_secret,
        b"",
    )
    t.join(timeout=5)
    sess_s = out["server"][0]

    hello, initiate = sent_c
    welcome, ready = sent_s

    # HELLO: 200 octets = %d5"HELLO" + version %x1 %x0 + 72 zeros +
    # client transient key (32) + nonce (8, BE counter 1) + box (80)
    assert len(hello) == 200
    assert hello[:6] == b"\x05HELLO"
    assert hello[6:8] == b"\x01\x00"
    assert hello[8:80] == b"\x00" * 72  # anti-amplification padding
    assert hello[80:112] == ct_pk
    assert hello[112:120] == struct.pack(">Q", 1)
    # the box must open under the LONG-TERM server key (that is the
    # proof-of-possession HELLO exists for) and contain 64 zeros
    plain = curve._open_box(
        hello[120:], b"CurveZMQHELLO---" + hello[112:120], ct_pk, server_secret
    )
    assert plain == b"\x00" * 64

    # WELCOME: 168 octets = %d7"WELCOME" + long nonce (16) + box (144)
    assert len(welcome) == 168
    assert welcome[:8] == b"\x07WELCOME"

    # INITIATE: 257 octets + metadata (empty here) = %d8"INITIATE" +
    # cookie (96) + nonce (8, BE counter 2) + box (16 MAC + 32 + 96)
    assert len(initiate) == 257
    assert initiate[:9] == b"\x08INITIATE"
    assert initiate[105:113] == struct.pack(">Q", 2)

    # READY: 30 octets + metadata = %d5"READY" + nonce (8, BE counter
    # 1 — the server's own sequence) + box (16 MAC + metadata)
    assert len(ready) == 30
    assert ready[:6] == b"\x05READY"
    assert ready[6:14] == struct.pack(">Q", 1)

    # MESSAGE: 33 octets + payload; first client counter 3, server 2 —
    # the positions and byte order libzmq's replay floor reads
    msg_c = sess_c.encrypt(0, b"")
    assert len(msg_c) == 33
    assert msg_c[:8] == b"\x07MESSAGE"
    assert msg_c[8:16] == struct.pack(">Q", 3)
    msg_s = sess_s.encrypt(0, b"")
    assert msg_s[8:16] == struct.pack(">Q", 2)
