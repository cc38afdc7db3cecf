"""Zest wire format: codec round trips and frame-level server dispatch
(protocol/zest.re + test/client.re frame shapes, minus sockets)."""

from __future__ import annotations

import json
import struct

import pytest

from zestdb_spark import protocol as P
from zestdb_spark.api import ZestEngine
from zestdb_spark.auth import MacaroonValidator
from zestdb_spark.macaroons import mint_token


def test_frame_roundtrip_bytes():
    f = P.Frame(
        code=2,
        token=b"tok-bytes",
        options=[(11, b"/ts/a"), (3, b"host-1"), (12, struct.pack(">H", 50))],
        payload=b'{"value": 1.0}',
    )
    raw = P.encode(f)
    # header layout: code, oc, tkl (16 BE) — byte-level check
    assert raw[0] == 2 and raw[1] == 3 and struct.unpack(">H", raw[2:4])[0] == 9
    out = P.decode(raw)
    assert out == f
    assert out.uri_path == "/ts/a" and out.content_format == 50


def test_decode_rejects_truncation():
    raw = P.request_post("/ts/a", b"{}")
    for cut in (1, 3, len(raw) - len(b"{}") - 3):
        with pytest.raises(ValueError):
            P.decode(raw[:cut])


def test_observe_frame_options():
    f = P.decode(P.request_observe("/ts/a", mode="audit", max_age_s=120))
    assert f.observe_mode == "audit" and f.max_age_s == 120


@pytest.fixture()
def srv(spark, tmp_path):
    return P.ZestFrameServer(ZestEngine(spark, str(tmp_path / "wire")))


def test_wire_post_get_delete_cycle(srv):
    ack = srv.handle(P.request_post("/ts/s/at/1000", b'{"value": 4.5}'))
    assert P.decode(ack).code == P.ACK_CREATED

    resp = P.decode(srv.handle(P.request_get("/ts/s/latest")))
    assert resp.code == P.ACK_CONTENT and resp.content_format == 50
    assert json.loads(resp.payload) == [{"timestamp": 1000, "data": {"value": 4.5}}]

    ack = srv.handle(P.request_delete("/ts/s/since/0"))
    assert P.decode(ack).code == P.ACK_DELETED
    resp = P.decode(srv.handle(P.request_get("/ts/s/length")))
    assert json.loads(resp.payload) == {"length": 0}


def test_wire_kv_content_formats(srv):
    # text format routes to the text store, like the CoAP option does
    srv.handle(P.request_post("/kv/ns/k", b"plain text", fmt=0))
    resp = P.decode(srv.handle(P.request_get("/kv/ns/k", fmt=0)))
    assert resp.payload == b"plain text" and resp.content_format == 0


def test_wire_errors_map_to_codes(srv):
    bad = srv.handle(P.request_post("/ts/s", b'{"novalue": 1}'))
    assert P.decode(bad).code == 128  # invalid numeric payload
    unsupported = srv.handle(P.request_delete("/ts/s/last/5"))
    assert P.decode(unsupported).code == 134  # guarded delete
    garbage = srv.handle(b"\x01")
    assert P.decode(garbage).code == 128


def test_wire_observe_registers_and_receives(srv):
    ack = P.decode(srv.handle(P.request_observe("/ts/obs", mode="data")))
    assert ack.code == P.ACK_CONTENT
    oid = ack.payload.decode()
    srv.handle(P.request_post("/ts/obs", b'{"value": 1.0}'))
    msgs = srv.engine.observers.messages(oid)
    assert len(msgs) == 1 and msgs[0]["data"] == {"value": 1.0}


def test_wire_binary_value_roundtrip_unmangled(srv):
    """Bytes >= 0x80 must survive the wire: body encoding is latin-1
    for binary/text formats (UTF-8 would mangle them)."""
    raw = bytes([0xFF, 0x01, 0x80, 0x00, 0x41])
    srv.handle(P.request_post("/kv/bin/k", raw, fmt=42))
    resp = P.decode(srv.handle(P.request_get("/kv/bin/k", fmt=42)))
    assert resp.payload == raw


def test_wire_malformed_option_values_get_128(srv):
    # 1-byte content-format value (option framing allows any length)
    bad_fmt = P.encode(P.Frame(1, options=[(P.OPT_URI_PATH, b"/ts/a"), (P.OPT_CONTENT_FORMAT, b"\x00")]))
    assert P.decode(srv.handle(bad_fmt)).code == 128
    # observe with a 2-byte max-age
    bad_age = P.encode(
        P.Frame(1, options=[
            (P.OPT_URI_PATH, b"/ts/a"), (P.OPT_OBSERVE, b"data"),
            (P.OPT_CONTENT_FORMAT, struct.pack(">H", 50)), (P.OPT_MAX_AGE, b"\x00\x01"),
        ])
    )
    assert P.decode(srv.handle(bad_age)).code == 128
    # non-UTF-8 uri path bytes
    bad_path = P.encode(P.Frame(1, options=[(P.OPT_URI_PATH, b"/ts/\xff\xfe"), (P.OPT_CONTENT_FORMAT, struct.pack(">H", 50))]))
    assert P.decode(srv.handle(bad_path)).code == 128


def test_wire_unicode_text_value_still_retrievable(srv):
    """A non-latin-1 text value written via the Python API must come
    back over the wire as UTF-8 bytes, not a 128 error."""
    srv.engine.post("/kv/t/u", "snow ☃", content_format="text")
    resp = P.decode(srv.handle(P.request_get("/kv/t/u", fmt=0)))
    assert resp.code == P.ACK_CONTENT
    assert resp.payload == "snow ☃".encode("utf-8")


def test_zestql_observe_requires_token(spark, tmp_path):
    """ZestQL observe statements go through the same ACL/audit path as
    the wire front-end (no unauthorized side door)."""
    from zestdb_spark.errors import Unauthorized

    acl = MacaroonValidator("zq-secret", "zest-zq")
    eng = ZestEngine(spark, str(tmp_path / "zq"), acl=acl)
    with pytest.raises(Unauthorized):
        eng.zestql('observe from "s1";')
    tok = mint_token(
        id="z", location="zest", path="path = /ts/s1", meth="method = GET",
        target="target = zest-zq", key="zq-secret",
    )
    eng.zestql('observe from "s1";', token=tok)
    audit = eng.store.load("audit").filter("method = 'GET(OBSERVE)'").collect()
    assert {r.code for r in audit} == {129, 69}


def test_wire_observe_requires_token_and_audits(spark, tmp_path):
    """Observe registration must go through the ACL (reference adds the
    observe caveat context, server.re:817-818) and leave an audit row."""
    acl = MacaroonValidator("obs-secret", "zest-o")
    eng = ZestEngine(spark, str(tmp_path / "obs"), acl=acl)
    srv = P.ZestFrameServer(eng)
    denied = P.decode(srv.handle(P.request_observe("/ts/x", mode="data")))
    assert denied.code == 129
    tok = mint_token(
        id="o", location="zest", path="path = /ts/x", meth="method = GET",
        target="target = zest-o", key="obs-secret",
    ).encode()
    ok = P.decode(srv.handle(P.request_observe("/ts/x", mode="data", token=tok)))
    assert ok.code == P.ACK_CONTENT and ok.payload
    audit = eng.store.load("audit").filter("method = 'GET(OBSERVE)'").collect()
    assert {r.code for r in audit} == {129, 69}


def test_wire_macaroon_auth_end_to_end(spark, tmp_path):
    """The full reference auth stack over the wire: a macaroon minted
    for GET /ts/w/* is accepted for that subtree and rejected
    elsewhere (CoAP 129), token carried in the frame's token field."""
    acl = MacaroonValidator("wire-secret", "zest-w")
    eng = ZestEngine(spark, str(tmp_path / "auth"), acl=acl)
    srv = P.ZestFrameServer(eng)

    # unauthenticated write is rejected before touching storage
    assert P.decode(srv.handle(P.request_post("/ts/w/at/5", b'{"value": 1}'))).code == 129

    write_tok = mint_token(
        id="w", location="zest", path="path = /ts/w/*", meth="method = POST",
        target="target = zest-w", key="wire-secret",
    ).encode()
    read_tok = mint_token(
        id="r", location="zest", path="path = /ts/w/*", meth="method = GET",
        target="target = zest-w", key="wire-secret",
    ).encode()

    ok = srv.handle(P.request_post("/ts/w/at/5", b'{"value": 1}', token=write_tok))
    assert P.decode(ok).code == P.ACK_CREATED
    resp = P.decode(srv.handle(P.request_get("/ts/w/latest", token=read_tok)))
    assert json.loads(resp.payload)[0]["data"] == {"value": 1.0}
    # read token cannot write; write token cannot read elsewhere
    assert P.decode(srv.handle(P.request_post("/ts/w/at/9", b'{"value": 2}', token=read_tok))).code == 129
    assert P.decode(srv.handle(P.request_get("/kv/x/k", token=read_tok))).code == 129
