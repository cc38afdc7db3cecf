"""Zest wire-format codec + frame-level server dispatch.

The reference speaks CoAP-shaped frames over CurveZMQ REQ/REP +
ROUTER/DEALER sockets (src/protocol/zest.re). The byte format is:

    header   code:8 | option-count:8 | token-length:16 BE
    token    tkl bytes (the macaroon, verbatim)
    options  oc × ( number:16 BE | length:16 BE | value:length bytes )
    payload  the rest

Options used (zest.re:26-66, test/client.re:251-289): 11 uri-path,
3 uri-host, 12 content-format (uint16 BE: 0 text / 42 binary /
50 json), 6 observe mode (string), 14 max-age (uint32 BE, seconds).
Acks (zest.re:155-215): Code → bare header; Payload → header(69) +
content-format option + payload; Observe → header(69) + content-format
+ option-2048 router-public-key + uuid payload.

This module implements that format fully in pure Python and dispatches
decoded frames into :class:`zestdb_spark.api.ZestEngine` — so a
reference client's REQUEST BYTES produce the reference server's
RESPONSE BYTES. The socket layer lives in
:mod:`zestdb_spark.transport`: a pure-stdlib ZMTP 3.0 REP + ROUTER
server that mounts ``ZestFrameServer.handle`` behind real TCP sockets
(NULL mechanism; only the CurveZMQ encryption layer is absent —
libsodium is not in this environment — see transport.py's docstring
for the seam)."""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass, field

from zestdb_spark.errors import ZestError

# option numbers (zest.re:26-66)
OPT_URI_HOST = 3
OPT_OBSERVE = 6
OPT_URI_PATH = 11
OPT_CONTENT_FORMAT = 12
OPT_MAX_AGE = 14
OPT_PUBLIC_KEY = 2048

#: content-format wire ids ↔ engine format names (src/prov.re:30-36)
FORMAT_ID = {"text": 0, "binary": 42, "json": 50}
FORMAT_NAME = {v: k for k, v in FORMAT_ID.items()}

# CoAP-style response codes the reference uses (src/server.re)
ACK_CREATED = 65
ACK_DELETED = 66
ACK_CONTENT = 69


@dataclass
class Frame:
    code: int
    token: bytes = b""
    options: list[tuple[int, bytes]] = field(default_factory=list)
    payload: bytes = b""

    # ------------------------------------------------------------ helpers

    def option(self, number: int) -> bytes | None:
        for n, v in self.options:
            if n == number:
                return v
        return None

    @property
    def uri_path(self) -> str:
        v = self.option(OPT_URI_PATH)
        return v.decode() if v is not None else ""

    @property
    def uri_host(self) -> str:
        v = self.option(OPT_URI_HOST)
        return v.decode() if v is not None else ""

    @property
    def content_format(self) -> int:
        v = self.option(OPT_CONTENT_FORMAT)
        if v is None:
            return FORMAT_ID["json"]
        return struct.unpack(">H", v)[0]

    @property
    def observe_mode(self) -> str | None:
        """zest.re get_observed: '' and 'data' → data; absent → None."""
        v = self.option(OPT_OBSERVE)
        if v is None:
            return None
        mode = v.decode()
        return {"": "data", "data": "data", "audit": "audit", "notification": "notification"}.get(
            mode, "none"
        )

    @property
    def max_age_s(self) -> int:
        v = self.option(OPT_MAX_AGE)
        return struct.unpack(">I", v)[0] if v is not None else 0


def encode(frame: Frame) -> bytes:
    out = struct.pack(">BBH", frame.code, len(frame.options), len(frame.token))
    out += frame.token
    for number, value in frame.options:
        out += struct.pack(">HH", number, len(value)) + value
    return out + frame.payload


def decode(data: bytes) -> Frame:
    if len(data) < 4:
        raise ValueError("frame shorter than header")
    code, oc, tkl = struct.unpack_from(">BBH", data, 0)
    pos = 4
    token = data[pos : pos + tkl]
    if len(token) != tkl:
        raise ValueError("truncated token")
    pos += tkl
    options: list[tuple[int, bytes]] = []
    for _ in range(oc):
        if pos + 4 > len(data):
            raise ValueError("truncated option header")
        number, length = struct.unpack_from(">HH", data, pos)
        pos += 4
        value = data[pos : pos + length]
        if len(value) != length:
            raise ValueError("truncated option value")
        pos += length
        options.append((number, value))
    return Frame(code=code, token=token, options=options, payload=data[pos:])


# --------------------------------------------------------- client encoders
# Mirrors test/client.re frame construction — usable as a Python client
# library for a real reference server, and as the test vector generator.

def _base_options(uri: str, host: str, fmt: int) -> list[tuple[int, bytes]]:
    return [
        (OPT_URI_PATH, uri.encode()),
        (OPT_URI_HOST, host.encode()),
        (OPT_CONTENT_FORMAT, struct.pack(">H", fmt)),
    ]


def request_get(uri: str, host: str = "client", fmt: int = 50, token: bytes = b"") -> bytes:
    return encode(Frame(1, token, _base_options(uri, host, fmt)))


def request_post(
    uri: str, payload: bytes, host: str = "client", fmt: int = 50, token: bytes = b""
) -> bytes:
    return encode(Frame(2, token, _base_options(uri, host, fmt), payload))


def request_delete(uri: str, host: str = "client", fmt: int = 50, token: bytes = b"") -> bytes:
    return encode(Frame(4, token, _base_options(uri, host, fmt)))


def request_observe(
    uri: str,
    host: str = "client",
    fmt: int = 50,
    mode: str = "data",
    max_age_s: int = 0,
    token: bytes = b"",
) -> bytes:
    opts = [
        (OPT_URI_PATH, uri.encode()),
        (OPT_URI_HOST, host.encode()),
        (OPT_OBSERVE, mode.encode()),
        (OPT_CONTENT_FORMAT, struct.pack(">H", fmt)),
        (OPT_MAX_AGE, struct.pack(">I", max_age_s)),
    ]
    return encode(Frame(1, token, opts))


# ------------------------------------------------------------ ack encoders

def ack_code(code: int) -> bytes:
    return encode(Frame(code))


def ack_payload(fmt: int, payload: bytes) -> bytes:
    return encode(
        Frame(
            ACK_CONTENT,
            options=[(OPT_CONTENT_FORMAT, struct.pack(">H", fmt))],
            payload=payload,
        )
    )


def ack_observe(public_key: str, uuid: str) -> bytes:
    return encode(
        Frame(
            ACK_CONTENT,
            options=[
                (OPT_CONTENT_FORMAT, struct.pack(">H", 0)),
                (OPT_PUBLIC_KEY, public_key.encode()),
            ],
            payload=uuid.encode(),
        )
    )


# ------------------------------------------------------------- dispatcher

class ZestFrameServer:
    """Frame-in → frame-out server core: decode, dispatch into a
    ZestEngine, encode the reference's ack. Mount behind a REP socket
    for the real transport (handle() is the whole request loop body,
    src/server.re:1085-1105 minus the socket reads)."""

    def __init__(self, engine):
        self.engine = engine
        #: Z85 public key of the notification router, handed to
        #: observers in the observe ack (Ack.Observe(router_public_key,
        #: uuid), server.re:866-867); empty when the transport is
        #: unencrypted or absent
        self.router_public_key = ""

    def handle(self, frame_bytes: bytes) -> bytes:
        try:
            return self._handle(frame_bytes)
        except ZestError as e:
            return ack_code(e.code)
        except (ValueError, struct.error, UnicodeDecodeError):
            # malformed frame, option value, or payload encoding — a
            # poisoned request must not kill the REP loop
            return ack_code(128)

    def _handle(self, frame_bytes: bytes) -> bytes:
        req = decode(frame_bytes)
        fmt_id = req.content_format  # may raise struct.error → 128 above
        fmt = FORMAT_NAME.get(fmt_id)
        if fmt is None:
            return ack_code(128)
        token = req.token.decode("latin-1") or None
        client = req.uri_host or "client"
        # JSON bodies are unicode text (UTF-8 on the wire); text/binary
        # round-trip through latin-1 so every stored byte is preserved
        wire_enc = "utf-8" if fmt == "json" else "latin-1"
        if req.code == 1 and req.observe_mode is not None:  # GET + observe
            if req.observe_mode == "none":
                return ack_code(128)
            oid = self.engine.observe(
                req.uri_path,
                mode=req.observe_mode,
                max_age_s=req.max_age_s,
                client=client,
                token=token,
            )
            return ack_observe(self.router_public_key, oid)
        if req.code == 1:  # GET
            body = self.engine.get(
                req.uri_path, client=client, token=token, content_format=fmt
            )
            try:
                payload_bytes = (body or "").encode(wire_enc)
            except UnicodeEncodeError:
                # a text/binary value written through the PYTHON API may
                # hold non-latin-1 unicode; UTF-8 it rather than telling
                # the client its well-formed request was bad (values
                # written over the wire always round-trip via latin-1)
                payload_bytes = (body or "").encode("utf-8")
            return ack_payload(fmt_id, payload_bytes)
        if req.code == 2:  # POST
            payload: object = req.payload
            if fmt == "json":
                try:
                    payload = json.loads(req.payload.decode() or "null")
                except ValueError:
                    return ack_code(128)
            elif fmt == "text":
                payload = req.payload.decode("latin-1")
            self.engine.post(
                req.uri_path, payload, client=client, token=token, content_format=fmt
            )
            return ack_code(ACK_CREATED)
        if req.code == 4:  # DELETE
            self.engine.delete(
                req.uri_path, client=client, token=token, content_format=fmt
            )
            return ack_code(ACK_DELETED)
        return ack_code(128)
