"""CurveZMQ mechanism tests: the reference's transport encryption
(src/protocol/zest.re:242-243 set_curve_server/set_curve_secretkey,
key handling src/server.re:1102-1124) re-implemented from the public
specs — rfc.zeromq.org/spec/26 (CurveZMQ) and spec/32 (Z85) — over the
system libsodium, and mounted as a ZMTP mechanism in transport.py.

Covers: Z85 spec vectors and the reference's own sample key
(server.re:1087), the full HELLO/WELCOME/INITIATE/READY handshake with
metadata exchange, message encryption with replay rejection, client
pinning via allowed_clients, mechanism-mismatch and wrong-key
rejection over real TCP, and the composed ZestServer flow: encrypted
REP requests, the observe ack carrying the router's fresh public key
(server.re:866-867, 1122-1124), and an encrypted DEALER receiving
notifications."""

from __future__ import annotations

import json
import queue
import threading

import pytest

from zestdb_spark import curve, protocol
from zestdb_spark.api import ZestEngine
from zestdb_spark.transport import (
    TransportError,
    ZestDealerClient,
    ZestRepServer,
    ZestReqClient,
    ZestServer,
)

pytestmark = pytest.mark.skipif(
    not curve.available(), reason="libsodium not available"
)

#: the reference's own sample key (server.re:1087 "test key")
REF_SECRET = "uf4XGHI7[fLoe&aG1tU83[ptpezyQMVIHh)J=zB1"


def ref_public() -> str:
    return curve.z85_encode(curve.public_from_secret(curve.decode_key(REF_SECRET)))


# ----------------------------------------------------------------- Z85


def test_z85_spec_vector():
    """The spec/32 test case: 86 4F D2 6F B5 59 F7 5B ↔ 'HelloWorld'."""
    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert curve.z85_encode(raw) == "HelloWorld"
    assert curve.z85_decode("HelloWorld") == raw


def test_z85_reference_key_roundtrip():
    sk = curve.decode_key(REF_SECRET)
    assert len(sk) == 32
    assert curve.z85_encode(sk) == REF_SECRET
    # a raw 32-byte key passes through decode_key unchanged
    assert curve.decode_key(sk) == sk


def test_z85_rejects_bad_input():
    with pytest.raises(ValueError):
        curve.z85_decode("four")  # not a multiple of 5
    with pytest.raises(ValueError):
        curve.z85_decode('"""""')  # '"' is outside the alphabet
    with pytest.raises(ValueError):
        curve.decode_key("tooshort")


def test_public_from_secret_matches_keypair():
    pk, sk = curve.keypair()
    assert curve.public_from_secret(sk) == pk


# ----------------------------------------------- handshake (in memory)


def _duplex_handshake(
    server_secret: bytes,
    client_keys: tuple[bytes, bytes],
    allowed: "set[bytes] | None" = None,
):
    """Run both handshake halves over in-memory queues; returns
    (client_session, server_session, server_meta_seen_by_client,
    client_meta_seen_by_server, client_pk_seen_by_server)."""
    c2s: "queue.Queue[bytes]" = queue.Queue()
    s2c: "queue.Queue[bytes]" = queue.Queue()
    s_pk = curve.public_from_secret(server_secret)
    out: dict = {}

    def server():
        try:
            out["server"] = curve.server_handshake(
                s2c.put, lambda: c2s.get(timeout=5), s_pk, server_secret,
                b"SMETA", allowed_clients=allowed,
            )
        except Exception as e:  # surfaced by the caller
            out["error"] = e

    t = threading.Thread(target=server)
    t.start()
    cl_pk, cl_sk = client_keys
    try:
        sess_c, smeta = curve.client_handshake(
            c2s.put, lambda: s2c.get(timeout=5), s_pk, cl_pk, cl_sk, b"CMETA"
        )
    except queue.Empty:
        # server aborted mid-handshake; its error is the real cause
        t.join(timeout=5)
        raise out["error"]
    t.join(timeout=5)
    if "error" in out:
        raise out["error"]
    sess_s, cmeta, cpk = out["server"]
    return sess_c, sess_s, smeta, cmeta, cpk


def test_handshake_exchanges_metadata_and_identifies_client():
    cl = curve.keypair()
    sess_c, sess_s, smeta, cmeta, cpk = _duplex_handshake(
        curve.decode_key(REF_SECRET), cl
    )
    assert smeta == b"SMETA" and cmeta == b"CMETA"
    assert cpk == cl[0]  # the vouch proved the client's long-term key


def test_messages_roundtrip_and_replay_rejected():
    sess_c, sess_s, *_ = _duplex_handshake(curve.decode_key(REF_SECRET), curve.keypair())
    wire = sess_c.encrypt(0, b"payload")
    assert sess_s.decrypt(wire) == (0, b"payload")
    with pytest.raises(curve.CurveError):
        sess_s.decrypt(wire)  # strictly-increasing nonce floor
    # both directions, MORE flag preserved
    back = sess_s.encrypt(1, b"more")
    assert sess_c.decrypt(back) == (1, b"more")


def test_nonce_counters_continue_past_handshake():
    """spec/26: short nonces are ONE strictly-increasing sequence per
    peer across the whole connection. The client spent 1 (HELLO) and 2
    (INITIATE), so its first MESSAGE carries 3 — libzmq tracks
    cn_peer_nonce from INITIATE and rejects any MESSAGE nonce <= 2;
    symmetrically the server spent 1 (READY) so its first MESSAGE
    carries 2 and the client's floor is 1."""
    import struct

    sess_c, sess_s, *_ = _duplex_handshake(curve.decode_key(REF_SECRET), curve.keypair())
    wire = sess_c.encrypt(0, b"first")
    (counter,) = struct.unpack(">Q", wire[8:16])
    assert counter == 3  # not 1: HELLO/INITIATE consumed 1 and 2
    assert sess_s.decrypt(wire) == (0, b"first")
    back = sess_s.encrypt(0, b"reply")
    (counter_s,) = struct.unpack(">Q", back[8:16])
    assert counter_s == 2  # READY consumed server nonce 1
    assert sess_c.decrypt(back) == (0, b"reply")

    # a forged client MESSAGE reusing a handshake-era nonce (<= 2) is
    # rejected by the server's receive floor even though the box would
    # verify — the libzmq interop contract the floor exists for
    forged = curve._Session(sess_c.our_sk, sess_c.their_pk, we_are_server=False)
    forged._send_counter = 2
    with pytest.raises(curve.CurveError, match="replayed"):
        sess_s.decrypt(forged.encrypt(0, b"replay"))


def test_tampered_message_rejected():
    sess_c, sess_s, *_ = _duplex_handshake(curve.decode_key(REF_SECRET), curve.keypair())
    wire = bytearray(sess_c.encrypt(0, b"payload"))
    wire[-1] ^= 0x01
    with pytest.raises(curve.CurveError):
        sess_s.decrypt(bytes(wire))


def test_allowed_clients_pinning():
    good = curve.keypair()
    bad = curve.keypair()
    allowed = {good[0]}
    # pinned client passes
    _duplex_handshake(curve.decode_key(REF_SECRET), good, allowed=allowed)
    # unpinned client is refused at INITIATE
    with pytest.raises(curve.CurveError, match="allowed"):
        _duplex_handshake(curve.decode_key(REF_SECRET), bad, allowed=allowed)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    frames=st.lists(
        st.binary(min_size=0, max_size=600),  # crosses the LONG-frame line
        min_size=1,
        max_size=5,
    )
)
def test_encrypted_framing_roundtrip_property(frames):
    """Any message shape survives the encrypted path: frames chained
    via the MORE bit inside MESSAGE commands reassemble losslessly
    across a socketpair with live sessions on both ends."""
    import socket

    from zestdb_spark.transport import _Conn

    sess_c, sess_s, *_ = _duplex_handshake(
        curve.decode_key(REF_SECRET), curve.keypair()
    )
    a, b = socket.socketpair()
    try:
        ca, cb = _Conn(a, "DEALER"), _Conn(b, "DEALER")
        ca._session, cb._session = sess_c, sess_s
        ca.send_message(frames)
        assert cb.recv_message() == frames
        cb.send_message(frames[::-1])
        assert ca.recv_message() == frames[::-1]
    finally:
        a.close()
        b.close()


# ------------------------------------------------------------ over TCP


def test_curve_rep_roundtrip_short_and_long():
    """Encrypted REP echo over real TCP, crossing the 255 B LONG-frame
    line both ways (the encrypted MESSAGE command adds 30 B overhead)."""
    srv = ZestRepServer(lambda b: b[::-1], curve_secret=REF_SECRET).start()
    try:
        assert srv.public_key == ref_public()
        cli = ZestReqClient(srv.endpoint, server_key=ref_public())
        assert cli.request(b"abc") == b"cba"
        big = bytes(range(256)) * 64  # 16 KiB
        assert cli.request(big) == big[::-1]
        cli.close()
    finally:
        srv.stop()


def test_null_client_refused_by_curve_server():
    srv = ZestRepServer(lambda b: b, curve_secret=REF_SECRET).start()
    try:
        with pytest.raises((TransportError, ConnectionError, OSError)):
            cli = ZestReqClient(srv.endpoint)  # no server_key → NULL greeting
            cli.request(b"x")
    finally:
        srv.stop()


def test_wrong_server_key_refused():
    srv = ZestRepServer(lambda b: b, curve_secret=REF_SECRET).start()
    try:
        stranger_pk, _ = curve.keypair()
        with pytest.raises((TransportError, ConnectionError, OSError)):
            cli = ZestReqClient(srv.endpoint, server_key=stranger_pk)
            cli.request(b"x")
    finally:
        srv.stop()


def test_allowed_clients_over_tcp():
    good = curve.keypair()
    srv = ZestRepServer(
        lambda b: b.upper(), curve_secret=REF_SECRET, allowed_clients={good[0]}
    ).start()
    try:
        cli = ZestReqClient(srv.endpoint, server_key=ref_public(), client_keys=good)
        assert cli.request(b"abc") == b"ABC"
        cli.close()
        with pytest.raises((TransportError, ConnectionError, OSError)):
            cli = ZestReqClient(srv.endpoint, server_key=ref_public())
            cli.request(b"x")
    finally:
        srv.stop()


# ------------------------------------------- the composed server flow


@pytest.fixture(scope="module")
def curve_server(spark, tmp_path_factory):
    engine = ZestEngine(spark, str(tmp_path_factory.mktemp("curve_store")))
    # warm the write path OUTSIDE the socket timeout: the first Spark
    # job of a session costs seconds, and the REQ client's 10 s recv
    # deadline must measure the transport, not executor warmup
    engine.post("/kv/_warm/k", {"w": 1})
    srv = ZestServer(engine, curve_secret=REF_SECRET).start()
    yield srv
    srv.stop()


def test_engine_requests_over_curve(curve_server):
    """The reference deployment shape: every analytics request rides
    the encrypted REP socket (zest.re:242-246)."""
    cli = ZestReqClient(curve_server.rep.endpoint, server_key=ref_public(), timeout_s=60.0)
    try:
        resp = protocol.decode(
            cli.request(protocol.request_post("/kv/curv/k1", b'{"a": 1}'))
        )
        assert resp.code == protocol.ACK_CREATED
        resp = protocol.decode(cli.request(protocol.request_get("/kv/curv/k1")))
        assert resp.code == protocol.ACK_CONTENT
        assert json.loads(resp.payload.decode()) == {"a": 1}
    finally:
        cli.close()


def test_observe_ack_carries_router_key_and_encrypted_dealer_flow(curve_server):
    """Observe over the encrypted transport end-to-end: the observe ack
    must carry the router's PER-START public key (Ack.Observe payload,
    server.re:866-867) — the client then CURVE-connects its DEALER with
    exactly that key and receives the notification."""
    import time

    cli = ZestReqClient(curve_server.rep.endpoint, server_key=ref_public(), timeout_s=60.0)
    try:
        resp = protocol.decode(
            cli.request(protocol.request_observe("/kv/curvobs/*", mode="data"))
        )
        assert resp.code == protocol.ACK_CONTENT
        router_key = (resp.option(protocol.OPT_PUBLIC_KEY) or b"").decode()
        assert router_key == curve_server.router.public_key
        assert len(router_key) == 40  # Z85 of a fresh 32-byte key
        assert router_key != ref_public()  # fresh, not the REP key
        oid = resp.payload.decode()

        dealer = ZestDealerClient(
            curve_server.router.endpoint, identity=oid, server_key=router_key
        )
        try:
            time.sleep(0.3)  # let the router register the identity
            resp = protocol.decode(
                cli.request(protocol.request_post("/kv/curvobs/x", b'{"v": 9}'))
            )
            assert resp.code == protocol.ACK_CREATED
            note = protocol.decode(dealer.recv(timeout_s=60.0))
            msg = json.loads(note.payload.decode())
            assert msg["path"] == "/kv/curvobs/x"
            assert msg["data"] == {"v": 9}
        finally:
            dealer.close()
    finally:
        cli.close()


def test_serve_entrypoint_with_secret_key_file(spark, tmp_path):
    """The reference CLI contract: --secret-key-file holds the Z85
    curve secret (server.re:1102-1104, 1136) and flips the whole
    transport to CURVE."""
    from zestdb_spark import serve

    key_file = tmp_path / "curve.key"
    key_file.write_text(REF_SECRET + "\n")
    srv = serve.main(
        [
            "--store-root",
            str(tmp_path / "served"),
            "--request-endpoint",
            "tcp://127.0.0.1:0",
            "--router-endpoint",
            "tcp://127.0.0.1:0",
            "--secret-key-file",
            str(key_file),
        ],
        block=False,
    )
    try:
        cli = ZestReqClient(srv.rep.endpoint, server_key=ref_public(), timeout_s=60.0)
        resp = protocol.decode(
            cli.request(protocol.request_post("/ts/curvsrv/at/1000", b'{"value": 4.5}'))
        )
        assert resp.code == protocol.ACK_CREATED
        resp = protocol.decode(cli.request(protocol.request_get("/ts/curvsrv/latest")))
        assert json.loads(resp.payload.decode()) == [
            {"timestamp": 1000, "data": {"value": 4.5}}
        ]
        cli.close()
    finally:
        srv.stop()
