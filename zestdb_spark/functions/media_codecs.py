"""Real media decoders, dependency-free (numpy + stdlib only).

Round-1 shipped the multimodal plumbing with ``decode_media`` stubbed
"until image/audio libraries appear". They haven't — but five useful
container formats need none: RIFF/WAV PCM, BMP (BI_RGB), Netpbm
P5/P6, PNG (zlib IS in the stdlib; the filter pass is plain numpy),
and JFIF JPEG — both sequential AND progressive (jpeg_codec.py —
Huffman, the Annex-G refinement walks, and the IDCT are spec
arithmetic, no codec library involved). These are complete decoders
for their declared subsets, not stubs: they parse the actual
container, decode actual samples/pixels, and raise
``UnsupportedMedia`` (a clearly-typed error, no longer
NotImplementedError) on anything outside the subset
(arithmetic-coded JPEG / MP3 / video genuinely need codec
libraries).

Everything here is driver-free pure-Python over ``bytes`` — invoked
per-asset inside Arrow-batched ``mapInPandas``
(multimodal.decode_features), so decode parallelism at 100 TB is
data-parallel per partition with zero JVM round-trips.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class UnsupportedMedia(ValueError):
    """Payload is not in a decodable subset (format needs codec libs)."""


# ------------------------------------------------------------------ WAV

def decode_wav(payload: bytes) -> dict:
    """RIFF/WAVE PCM (8/16/32-bit int) → sample stats.

    Returns kind/sample_rate/n_channels/n_samples/duration_ms plus
    peak and rms over all channels (float, in native sample units).
    """
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise UnsupportedMedia("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise UnsupportedMedia("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _byte_rate, _align, bits = fmt
    if audio_format != 1 or bits not in (8, 16, 32):
        raise UnsupportedMedia(f"non-PCM or {bits}-bit WAV")
    dtype = {8: np.uint8, 16: np.int16, 32: np.int32}[bits]
    samples = np.frombuffer(data, dtype=dtype)
    if bits == 8:  # 8-bit WAV is unsigned, centered at 128
        samples = samples.astype(np.int16) - 128
    n_samples = len(samples) // max(n_channels, 1)
    x = samples.astype(np.float64)
    return {
        "kind": "audio",
        "sample_rate": int(sample_rate),
        "n_channels": int(n_channels),
        "n_samples": int(n_samples),
        "duration_ms": int(n_samples * 1000 // sample_rate) if sample_rate else 0,
        "peak": float(np.abs(x).max()) if len(x) else 0.0,
        "rms": float(np.sqrt(np.mean(x * x))) if len(x) else 0.0,
    }


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mint a 16-bit mono PCM WAV (test/synthesis helper — the inverse
    subset of decode_wav)."""
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, sample_rate, sample_rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


# ------------------------------------------------------------------ BMP

def _bmp_pixels(payload: bytes) -> np.ndarray:
    """Uncompressed (BI_RGB) 24/32-bit BMP → (h, w, 3) uint8 RGB."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise UnsupportedMedia("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    _planes, bits = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bits not in (24, 32):
        raise UnsupportedMedia(f"compressed or {bits}-bit BMP")
    bottom_up = height > 0
    height = abs(height)
    bpp = bits // 8
    stride = (width * bpp + 3) & ~3  # rows padded to 4 bytes
    px = np.frombuffer(payload, dtype=np.uint8, count=stride * height, offset=data_offset)
    rows = px.reshape(height, stride)[:, : width * bpp].reshape(height, width, bpp)
    if bottom_up:
        rows = rows[::-1]
    return rows[..., 2::-1]  # BGR(A) → RGB


def _image_stats(rgb: np.ndarray) -> dict:
    return {
        "kind": "image",
        "width": int(rgb.shape[1]),
        "height": int(rgb.shape[0]),
        "mean_r": float(rgb[..., 0].mean()),
        "mean_g": float(rgb[..., 1].mean()),
        "mean_b": float(rgb[..., 2].mean()),
    }


def decode_bmp(payload: bytes) -> dict:
    """Uncompressed (BI_RGB) 24/32-bit BMP → dimensions + channel means."""
    return _image_stats(_bmp_pixels(payload))


def encode_bmp(rgb: np.ndarray) -> bytes:
    """Mint a 24-bit bottom-up BMP from an (h, w, 3) uint8 RGB array."""
    h, w, _ = rgb.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # flip + RGB→BGR
    data = rows.tobytes()
    hdr = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + len(data), 0, 0, 54,
        40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0,
    )
    return hdr + data


# --------------------------------------------------------------- Netpbm

def _netpbm_pixels(payload: bytes) -> np.ndarray:
    """Binary PGM (P5) / PPM (P6), 8-bit → (h, w, 3) uint8 RGB (gray
    broadcast across channels)."""
    if payload[:2] not in (b"P5", b"P6"):
        raise UnsupportedMedia("not a binary PGM/PPM payload")
    # header: magic, whitespace/comment-separated width height maxval
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = tokens
    if maxval > 255:
        raise UnsupportedMedia("16-bit netpbm")
    ch = 3 if payload[:2] == b"P6" else 1
    px = np.frombuffer(payload, np.uint8, count=width * height * ch, offset=pos)
    px = px.reshape(height, width, ch)
    if ch == 1:
        px = np.repeat(px, 3, axis=2)
    return px


def decode_netpbm(payload: bytes) -> dict:
    """Binary PGM (P5) / PPM (P6), 8-bit → dimensions + means."""
    return _image_stats(_netpbm_pixels(payload))


# ------------------------------------------------------------------ PNG

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
#: channels per color type (0=gray, 2=RGB, 4=gray+A, 6=RGBA)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_pixels(payload: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG → (h, w, 3) uint8 RGB (alpha dropped,
    gray broadcast)."""
    img, width, height, ch = _png_raw(payload)
    px = img.reshape(height, width, ch)
    if ch == 1:
        return np.repeat(px, 3, axis=2)
    if ch == 2:  # gray + alpha
        return np.repeat(px[..., :1], 3, axis=2)
    return px[..., :3]


def decode_png(payload: bytes) -> dict:
    """8-bit non-interlaced PNG (gray/RGB/±alpha): full inflate +
    per-row unfilter (types 0-4 per the PNG spec) → dimensions +
    channel means. Palette/16-bit/interlaced raise UnsupportedMedia.
    Means are over the IMAGE channels (alpha excluded; gray counted
    once per channel), matching _image_stats on the RGB projection."""
    return _image_stats(_png_pixels(payload))


def _png_raw(payload: bytes):
    """→ (unfiltered (h, w·ch) uint8 array, width, height, channels)."""
    if payload[:8] != _PNG_MAGIC:
        raise UnsupportedMedia("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        size, ctype = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + size  # len + type + crc
    if ihdr is None or not idat:
        raise UnsupportedMedia("missing IHDR/IDAT")
    width, height, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise UnsupportedMedia("only 8-bit non-interlaced gray/RGB(A) PNG")
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = width * ch
    if len(raw) < height * (stride + 1):
        raise UnsupportedMedia("truncated PNG stream")
    img = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, stride, y * (stride + 1) + 1).copy()
        if f == 0:  # None
            pass
        elif f == 2:  # Up
            line += prev
        elif f in (1, 3, 4):  # Sub / Average / Paeth need left-to-right
            line = line.astype(np.int32)
            p = prev.astype(np.int32)
            out = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = out[i - ch] if i >= ch else 0
                b = p[i]
                if f == 1:
                    out[i] = (line[i] + a) & 0xFF
                elif f == 3:
                    out[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                else:
                    c = p[i - ch] if i >= ch else 0
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    out[i] = (line[i] + pr) & 0xFF
            line = out.astype(np.uint8)
        else:
            raise UnsupportedMedia(f"unknown PNG filter {f}")
        img[y] = line
        prev = img[y]
    return img, width, height, ch


def encode_png(rgb: np.ndarray) -> bytes:
    """Mint an 8-bit RGB PNG (filter 0 rows) from (h, w, 3) uint8."""
    h, w, _ = rgb.shape

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# ------------------------------------------------------------ transforms

def _jpeg_pixels_lazy(payload: bytes):
    from zestdb_spark.functions.jpeg_codec import _jpeg_pixels

    return _jpeg_pixels(payload)


_PIXEL_DECODERS = (
    (lambda p: p[:8] == _PNG_MAGIC, _png_pixels),
    (lambda p: p[:2] == b"BM", _bmp_pixels),
    (lambda p: p[:2] in (b"P5", b"P6"), _netpbm_pixels),
    (lambda p: p[:2] == b"\xff\xd8", _jpeg_pixels_lazy),
)


def decode_pixels(payload: bytes) -> np.ndarray:
    """Full pixel decode → (h, w, 3) uint8 RGB, any supported image
    container (audio/unknown formats raise UnsupportedMedia)."""
    payload = bytes(payload)
    for sniff, dec in _PIXEL_DECODERS:
        if sniff(payload):
            try:
                return dec(payload)
            except UnsupportedMedia:
                raise
            except (struct.error, zlib.error, ValueError, IndexError, EOFError) as e:
                raise UnsupportedMedia(f"malformed image payload: {e}") from e
    raise UnsupportedMedia("not a decodable image container")


def resize_nearest(rgb: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width, 3) — pure index
    arithmetic (the PIL-free resize; sample i maps to source cell
    floor(i·src/dst), the standard NN grid)."""
    src_h, src_w = rgb.shape[:2]
    ys = (np.arange(height) * src_h) // height
    xs = (np.arange(width) * src_w) // width
    return rgb[ys][:, xs]


def resize_media(payload: bytes, width: int, height: int) -> bytes:
    """Decode any supported image container, NN-resize, re-encode as
    24-bit BMP (the canonical uncompressed interchange here)."""
    return encode_bmp(resize_nearest(decode_pixels(payload), width, height))


# ------------------------------------------------------------- dispatch

def _decode_jpeg_lazy(payload: bytes) -> dict:
    from zestdb_spark.functions.jpeg_codec import decode_jpeg

    return decode_jpeg(payload)


_decode_jpeg_lazy.__name__ = "decode_jpeg"  # error messages name the format

_SNIFFERS = (
    (lambda p: p[:4] == b"RIFF" and p[8:12] == b"WAVE", decode_wav),
    (lambda p: p[:8] == _PNG_MAGIC, decode_png),
    (lambda p: p[:2] == b"BM", decode_bmp),
    (lambda p: p[:2] in (b"P5", b"P6"), decode_netpbm),
    (lambda p: p[:2] == b"\xff\xd8", _decode_jpeg_lazy),
)


def decode_media(payload: bytes, mime: str | None = None) -> dict:
    """Dispatch on magic bytes (mime is advisory only — bytes win).
    Raises UnsupportedMedia for formats that need codec libraries AND
    for sniffable-but-malformed containers (truncated chunks, corrupt
    deflate streams, bad headers) — every decode failure surfaces as
    the one typed error callers are told to expect."""
    payload = bytes(payload)
    for sniff, dec in _SNIFFERS:
        if sniff(payload):
            try:
                return dec(payload)
            except UnsupportedMedia:
                raise
            except (struct.error, zlib.error, ValueError, IndexError, EOFError) as e:
                raise UnsupportedMedia(f"malformed {dec.__name__[7:]} payload: {e}") from e
    raise UnsupportedMedia(
        f"undecodable payload (mime={mime!r}); MP3/video need codec libs"
    )
