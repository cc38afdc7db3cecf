"""JPEG (ITU-T T.81 / JFIF) decode in pure numpy + stdlib — baseline
AND progressive.

The dominant crawl image format joins the real-decode set
(media_codecs.py): until now JPEG payloads landed as typed
``unsupported`` rows, leaving the feature-extraction tier blind to
most of a real crawl's images (VERDICT r9 "What's missing #2").

Declared subset — complete for it, loudly ``UnsupportedMedia`` outside
it (the same contract as the WAV/BMP/Netpbm/PNG decoders):

- sequential Huffman DCT (SOF0/SOF1) and PROGRESSIVE Huffman DCT
  (SOF2: spectral selection + successive approximation, EOB-run
  batching, non-interleaved AC scans — T.81 Annex G), 8-bit
  precision, 1 (grayscale) or 3 (YCbCr) components;
- arbitrary integral sampling factors (4:4:4, 4:2:2, 4:2:0, ...) with
  replication upsampling; multi-scan sequential files;
- restart intervals (DRI / RSTn), multi-table DQT/DHT segments,
  APPn/COM segments skipped.

Out of subset: arithmetic coding, hierarchical, lossless, 12-bit,
CMYK — these raise ``UnsupportedMedia``.

Architecture: every scan decodes into per-component integer
COEFFICIENT planes (accumulated across scans — the natural form for
progressive, free for sequential); dequantization + the batched
orthonormal inverse DCT (two numpy matmuls over all blocks at once)
run exactly once at the end. Everything is spec-driven from the
embedded tables: canonical Huffman code construction (F.2.2.3),
EXTEND sign recovery (F.2.2.1), the Annex-G refinement walks — no
codec library anywhere.

``encode_jpeg_baseline`` / ``encode_jpeg_progressive`` are the
test/synthesis inverses (the ``encode_wav``/``encode_bmp`` posture):
valid interchange-format encoders with self-describing flat Huffman
tables — any conforming decoder reads their output; fixture tests
decode them both through this module and against hand-assembled
golden streams, and pin progressive decodes bit-identical to the
baseline decode of the same pixels.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from zestdb_spark.functions.media_codecs import UnsupportedMedia

#: zigzag scan position -> natural (row-major) position
_ZZ = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: orthonormal DCT basis: spatial = _M @ F @ _M.T (A.3.3)
_M = np.array([
    [math.sqrt((1 if k == 0 else 2) / 8.0)
     * math.cos((2 * n + 1) * k * math.pi / 16.0) for k in range(8)]
    for n in range(8)
])


class _MarkerHit(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment: un-stuffs
    FF00, surfaces any other marker as ``_MarkerHit`` (restart
    handling consumes RSTn explicitly via ``restart()``)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data, self.pos = data, pos
        self.cur, self.nbits = 0, 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise UnsupportedMedia("truncated JPEG entropy data")
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else -1
                if nxt != 0x00:
                    raise _MarkerHit(nxt)
                self.pos += 2
            else:
                self.pos += 1
            self.cur, self.nbits = b, 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume the expected RSTn marker (F.2.1.3.1)."""
        self.nbits = 0
        d = self.data
        if (
            self.pos + 1 >= len(d)
            or d[self.pos] != 0xFF
            or not 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            raise UnsupportedMedia("missing JPEG restart marker")
        self.pos += 2


def _build_huff(bits: list[int], vals: bytes) -> dict:
    """Canonical Huffman table (F.2.2.3): {(length, code): symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_huff(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise UnsupportedMedia("invalid JPEG huffman code")


def _extend(v: int, t: int) -> int:
    """EXTEND (F.2.2.1): recover the signed value from t magnitude bits."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _decode_seq_block(br, dc_tbl, ac_tbl, pred, coef):
    """Sequential block (F.2): DC diff + full AC band into the 64-int
    natural-order coefficient row. Returns the new DC predictor."""
    t = _decode_huff(br, dc_tbl)
    if t > 11:
        raise UnsupportedMedia("DC category > 11")
    pred += _extend(br.read_bits(t), t) if t else 0
    coef[0] = pred
    k = 1
    while k < 64:
        rs = _decode_huff(br, ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise UnsupportedMedia("AC coefficient index overflow")
        coef[int(_ZZ[k])] = _extend(br.read_bits(s), s)
        k += 1
    return pred


def _decode_dc_first(br, dc_tbl, pred, coef, al):
    """Progressive DC, first pass (G.1.2.1): diff-coded high bits."""
    t = _decode_huff(br, dc_tbl)
    if t > 11:
        raise UnsupportedMedia("DC category > 11")
    pred += _extend(br.read_bits(t), t) if t else 0
    coef[0] = pred << al  # arithmetic shift: two's-complement-safe
    return pred


def _decode_dc_refine(br, coef, al):
    """Progressive DC refinement (G.1.2.3): one appended magnitude bit
    per block — plain OR reconstructs two's complement exactly because
    the first pass used an arithmetic shift."""
    if br.read_bit():
        coef[0] = int(coef[0]) | (1 << al)


def _decode_ac_first(br, ac_tbl, coef, ss, se, al, eob_run):
    """Progressive AC, first pass (G.1.2.2) with EOB-run batching.
    Returns the remaining EOB run."""
    if eob_run > 0:
        return eob_run - 1
    k = ss
    while k <= se:
        rs = _decode_huff(br, ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:  # EOBn: run of (1<<r)+bits all-done blocks
                run = 1 << r
                if r:
                    run += br.read_bits(r)
                return run - 1  # includes THIS block
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise UnsupportedMedia("AC coefficient index overflow")
        coef[int(_ZZ[k])] = _extend(br.read_bits(s), s) << al
        k += 1
    return 0


def _decode_ac_refine(br, ac_tbl, coef, ss, se, al, eob_run):
    """Progressive AC refinement (G.1.2.3): correction bits for
    already-nonzero coefficients interleave with newly-significant
    ±1<<Al insertions; zero-runs count only zero-HISTORY positions.
    Returns the remaining EOB run."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eob_run == 0:
        while k <= se:
            rs = _decode_huff(br, ac_tbl)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eob_run = 1 << r
                    if r:
                        eob_run += br.read_bits(r)
                    break
                # ZRL: advance over 16 zero-history positions below
            else:
                if s != 1:
                    raise UnsupportedMedia("invalid AC refinement code")
                val = p1 if br.read_bit() else m1
            while k <= se:
                c = int(coef[int(_ZZ[k])])
                if c != 0:
                    if br.read_bit() and (c & p1) == 0:
                        coef[int(_ZZ[k])] = c + (p1 if c >= 0 else m1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if val:
                if k > se:
                    raise UnsupportedMedia("AC refinement overflow")
                coef[int(_ZZ[k])] = val
            k += 1
    if eob_run > 0:
        while k <= se:  # correction bits across the rest of the band
            c = int(coef[int(_ZZ[k])])
            if c != 0:
                if br.read_bit() and (c & p1) == 0:
                    coef[int(_ZZ[k])] = c + (p1 if c >= 0 else m1)
            k += 1
        eob_run -= 1
    return eob_run


def _jpeg_pixels(payload: bytes) -> np.ndarray:
    """Decode a baseline JFIF payload → (h, w, 3) uint8 RGB."""
    if payload[:2] != b"\xff\xd8":
        raise UnsupportedMedia("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    coefs: dict[int, np.ndarray] = {}
    scanned = False
    restart_interval = 0
    pos = 2
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise UnsupportedMedia("bad JPEG marker stream")
        while pos < len(payload) and payload[pos] == 0xFF:
            pos += 1  # fill bytes
        if pos >= len(payload):
            raise UnsupportedMedia("truncated JPEG marker stream")
        m = payload[pos]
        pos += 1
        if m == 0xD9:  # EOI
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:  # standalone
            continue
        if pos + 2 > len(payload):
            raise UnsupportedMedia("truncated JPEG segment")
        (seg_len,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seg_len]
        pos += seg_len
        if m == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise UnsupportedMedia("16-bit quantization tables")
                zz = np.frombuffer(seg, np.uint8, 64, i + 1).astype(np.float64)
                nat = np.empty(64)
                nat[_ZZ] = zz  # DQT rides in zigzag order
                qt[tq] = nat
                i += 65
        elif m == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                huff[(tc, th)] = _build_huff(bits, seg[i + 17 : i + 17 + n])
                i += 17 + n
        elif m in (0xC0, 0xC1, 0xC2):  # sequential / progressive Huffman DCT
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise UnsupportedMedia(f"{prec}-bit JPEG")
            if nc not in (1, 3):
                raise UnsupportedMedia(f"{nc}-component JPEG (CMYK?)")
            if not h or not w:
                raise UnsupportedMedia("zero-dimension JPEG")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            h_max = max(c["h"] for c in comps)
            v_max = max(c["v"] for c in comps)
            for c in comps:
                if (
                    not c["h"] or not c["v"]
                    or h_max % c["h"] or v_max % c["v"]
                ):
                    raise UnsupportedMedia("non-integral sampling ratio")
            frame = {
                "h": h, "w": w, "comps": comps,
                "h_max": h_max, "v_max": v_max,
                "mcus_x": -(-w // (8 * h_max)),
                "mcus_y": -(-h // (8 * v_max)),
                "progressive": m == 0xC2,
            }
            # per-component coefficient planes (MCU-padded block grid),
            # accumulated across every scan, transformed once at EOI
            coefs = {
                c["id"]: np.zeros(
                    (frame["mcus_y"] * c["v"], frame["mcus_x"] * c["h"], 64),
                    dtype=np.int64,
                )
                for c in comps
            }
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedMedia(
                "arithmetic/hierarchical/lossless JPEG"
            )
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif m == 0xDA:  # SOS — entropy data follows the segment
            if frame is None:
                raise UnsupportedMedia("JPEG scan before frame header")
            ns = seg[0]
            order, tbls = [], {}
            by_id = {c["id"]: c for c in frame["comps"]}
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                if cs not in by_id:
                    raise UnsupportedMedia("scan names unknown component")
                order.append(by_id[cs])
                tbls[cs] = (tdta >> 4, tdta & 0x0F)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            if not frame["progressive"]:
                ss, se, ah, al = 0, 63, 0, 0  # sequential: full band
            pos = _run_scan(
                payload, pos, frame, order, tbls, ss, se, ah, al,
                huff, restart_interval, coefs,
            )
            scanned = True
        # APPn / COM / anything else: skipped
    if frame is None or not scanned:
        raise UnsupportedMedia("JPEG has no scan data")
    return _finish(frame, coefs, qt)


def _run_scan(
    payload, pos, frame, order, tbls, ss, se, ah, al, huff,
    restart_interval, coefs,
):
    """Decode one scan's entropy segment into the coefficient planes.
    Interleaved (multi-component) scans walk the frame MCU grid;
    single-component scans walk that component's own block grid
    (non-interleaved — mandatory for progressive AC scans, legal for
    sequential too). Returns the stream position after the scan."""
    progressive = frame["progressive"]
    if progressive and ss > 0 and len(order) > 1:
        raise UnsupportedMedia("interleaved progressive AC scan")
    br = _BitReader(payload, pos)
    preds = {c["id"]: 0 for c in order}
    state = {"eob": 0}

    def block(c, by, bx):
        arr = coefs[c["id"]][by, bx]
        td, ta = tbls[c["id"]]
        if not progressive:
            dc_tbl, ac_tbl = huff.get((0, td)), huff.get((1, ta))
            if dc_tbl is None or ac_tbl is None:
                raise UnsupportedMedia("missing huffman table")
            preds[c["id"]] = _decode_seq_block(
                br, dc_tbl, ac_tbl, preds[c["id"]], arr
            )
        elif ss == 0:
            if ah == 0:
                dc_tbl = huff.get((0, td))
                if dc_tbl is None:
                    raise UnsupportedMedia("missing huffman table")
                preds[c["id"]] = _decode_dc_first(
                    br, dc_tbl, preds[c["id"]], arr, al
                )
            else:
                _decode_dc_refine(br, arr, al)
        else:
            ac_tbl = huff.get((1, ta))
            if ac_tbl is None:
                raise UnsupportedMedia("missing huffman table")
            if ah == 0:
                state["eob"] = _decode_ac_first(
                    br, ac_tbl, arr, ss, se, al, state["eob"]
                )
            else:
                state["eob"] = _decode_ac_refine(
                    br, ac_tbl, arr, ss, se, al, state["eob"]
                )

    def maybe_restart(n):
        if restart_interval and n and n % restart_interval == 0:
            br.restart()
            for cid in preds:
                preds[cid] = 0
            state["eob"] = 0

    try:
        if len(order) > 1:
            n = 0
            for my in range(frame["mcus_y"]):
                for mx in range(frame["mcus_x"]):
                    maybe_restart(n)
                    for c in order:
                        for i in range(c["v"]):
                            for j in range(c["h"]):
                                block(c, my * c["v"] + i, mx * c["h"] + j)
                    n += 1
        else:
            c = order[0]
            cw = -(-frame["w"] * c["h"] // frame["h_max"])
            ch = -(-frame["h"] * c["v"] // frame["v_max"])
            bw, bh = -(-cw // 8), -(-ch // 8)
            n = 0
            for by in range(bh):
                for bx in range(bw):
                    maybe_restart(n)
                    block(c, by, bx)
                    n += 1
    except _MarkerHit as e:
        raise UnsupportedMedia(
            f"JPEG entropy data ended early at marker {e.marker:#x}"
        ) from e
    return br.pos


def _finish(frame, coefs, qt):
    """Dequantize + inverse-transform every component's accumulated
    coefficients, upsample, and color-convert."""
    h, w = frame["h"], frame["w"]
    h_max, v_max = frame["h_max"], frame["v_max"]
    full = []
    for c in frame["comps"]:
        if c["tq"] not in qt:
            raise UnsupportedMedia("missing quantization table")
        arr = coefs[c["id"]].astype(np.float64) * qt[c["tq"]][None, None, :]
        by, bx = arr.shape[0], arr.shape[1]
        blocks = arr.reshape(by, bx, 8, 8)
        spatial = _M @ blocks @ _M.T + 128.0  # batched over (by, bx)
        p = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        p = np.repeat(np.repeat(p, v_max // c["v"], axis=0), h_max // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(np.round(full[0]), 0, 255)
        return np.dstack([y, y, y]).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    # round, don't truncate: IDCT output is float and a value a hair
    # under an integer must not drop a full level
    return np.clip(np.round(np.dstack([r, g, b])), 0, 255).astype(np.uint8)


# --------------------------------------------------------------- encoder

def _bit_sizes(v: int) -> int:
    """DC/AC magnitude category (number of magnitude bits)."""
    return int(abs(v)).bit_length()


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc, self.nbits = 0, 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.nbits = 0, 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1-bits (F.1.2.3)


#: encoder Huffman geometry: flat canonical tables that cover every
#: symbol sequential OR progressive scans can emit — 12 DC categories
#: at 4 bits; at 8 bits the EOBn run-length symbols (r<<4, r ≤ 14 —
#: progressive EOB-run batching), ZRL, and all 160 (run, size) AC
#: symbols (codes 0..175, so the all-ones code is never assigned).
#: Self-describing via DHT, so ANY conforming decoder reads the
#: stream; simplicity beats compression here.
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = bytes(range(12))
_ENC_AC_VALS = bytes(
    [r << 4 for r in range(15)]  # EOB (0x00) + EOBn runs
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_ENC_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _enc_codes(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    table = _build_huff(bits, vals)
    return {sym: (length, code) for (length, code), sym in table.items()}


def _encode_block(bw, block, quant, pred, dc_codes, ac_codes):
    f = _M.T @ (block.astype(np.float64) - 128.0) @ _M
    q = np.round(f / quant.reshape(8, 8)).astype(np.int64)
    zz = q.reshape(64)[_ZZ]
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    s = _bit_sizes(diff)
    length, code = dc_codes[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0 and k > last_nz:
            length, code = ac_codes[0x00]  # EOB
            bw.write(code, length)
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _bit_sizes(v)
        length, code = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    return pred


def _prep_components(rgb: np.ndarray, subsample):
    """Shared encoder front half: color-convert, optionally subsample
    chroma, MCU-pad. ``subsample``: falsy = 4:4:4, True/"420" = 4:2:0,
    "422" = 4:2:2 (horizontal-only). Returns (h, w, padded planes,
    samp, mcus_x, mcus_y)."""
    gray = rgb.ndim == 2
    h, w = rgb.shape[:2]
    if gray:
        planes = [rgb.astype(np.float64)]
        samp = [(1, 1)]
    else:
        x = rgb.astype(np.float64)
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            fy, fx = (1, 2) if subsample == "422" else (2, 2)
            pad_h, pad_w = -(-h // fy) * fy, -(-w // fx) * fx
            def _sub(p):
                p = np.pad(p, ((0, pad_h - h), (0, pad_w - w)), mode="edge")
                return p.reshape(pad_h // fy, fy, pad_w // fx, fx).mean(axis=(1, 3))
            planes = [y, _sub(cb), _sub(cr)]
            samp = [(fx, fy), (1, 1), (1, 1)]
        else:
            planes, samp = [y, cb, cr], [(1, 1), (1, 1), (1, 1)]
    h_max = max(s[0] for s in samp)
    v_max = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * h_max))
    mcus_y = -(-h // (8 * v_max))
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = mcus_y * sv * 8, mcus_x * sh * 8
        padded.append(
            np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
        )
    return h, w, padded, samp, mcus_x, mcus_y


def encode_jpeg_baseline(
    rgb: np.ndarray,
    quant: int = 1,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Mint a baseline JFIF JPEG from (h, w, 3) uint8 RGB (or (h, w)
    grayscale): flat quantization at ``quant`` (1 = near-lossless —
    only DCT rounding), optional 4:2:0 ``subsample``, optional DRI
    restart markers. Test/synthesis helper, interchange-format valid."""
    h, w, padded, samp, mcus_x, mcus_y = _prep_components(rgb, subsample)
    qtab = np.full(64, float(quant))
    dc_codes = _enc_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _enc_codes(_ENC_AC_BITS, _ENC_AC_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    zz_q = np.empty(64, dtype=np.uint8)
    zz_q[np.arange(64)] = qtab[_ZZ].astype(np.uint8)  # natural → zigzag
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0x00]) + zz_q.tobytes()
    nc = len(padded)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i, (sh, sv) in enumerate(samp):
        sof += struct.pack(">BBB", i + 1, (sh << 4) | sv, 0)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, bits, vals in (
        (0, _ENC_DC_BITS, _ENC_DC_VALS),
        (1, _ENC_AC_BITS, _ENC_AC_VALS),
    ):
        body = bytes([tc << 4]) + bytes(bits) + vals
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    preds = [0] * nc
    n_mcus = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcus and n_mcus % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0] * nc
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
                for i in range(sv):
                    for j in range(sh):
                        y0 = (my * sv + i) * 8
                        x0 = (mx * sh + j) * 8
                        preds[ci] = _encode_block(
                            bw,
                            p[y0 : y0 + 8, x0 : x0 + 8],
                            qtab,
                            preds[ci],
                            dc_codes,
                            ac_codes,
                        )
            n_mcus += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _fdct_quant_zz(block: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """Forward DCT + quantize one spatial block → 64 ints in ZIGZAG
    order (the encoder-side coefficient domain)."""
    f = _M.T @ (block.astype(np.float64) - 128.0) @ _M
    q = np.round(f / quant.reshape(8, 8)).astype(np.int64)
    return q.reshape(64)[_ZZ]


class _ScanWriter:
    """Per-scan emission state for the progressive encoder: a fresh
    bit writer plus the EOB-run counter and the buffered correction
    bits that ride after the next emitted AC symbol (G.1.2.3 — the
    encoder mirror of ``_decode_ac_refine``'s walk)."""

    def __init__(self, ac_codes, dc_codes) -> None:
        self.bw = _BitWriter()
        self.ac_codes, self.dc_codes = ac_codes, dc_codes
        self.eobrun = 0
        #: correction bits owned by the pending EOB run (completed
        #: blocks) — the decoder consumes them in those blocks' tail
        #: walks right after the EOBn symbol (libjpeg's BE buffer)
        self.corr_eob: list[int] = []
        #: correction bits of the CURRENT block since the last emitted
        #: symbol — they ride after the next ZRL / newly-significant
        #: symbol of this block (libjpeg's BR buffer)
        self.corr: list[int] = []

    def ac(self, sym: int) -> None:
        length, code = self.ac_codes[sym]
        self.bw.write(code, length)

    def emit_corr(self) -> None:
        for bit in self.corr:
            self.bw.write(bit, 1)
        self.corr = []

    def end_block(self) -> None:
        """Current block folds into the EOB run: its pending correction
        bits transfer to the run's buffer."""
        self.eobrun += 1
        self.corr_eob.extend(self.corr)
        self.corr = []
        if self.eobrun == 0x7FFF:
            self.flush_eobrun()

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self.ac(r << 4)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
            for bit in self.corr_eob:
                self.bw.write(bit, 1)
            self.corr_eob = []


def encode_jpeg_progressive(
    rgb: np.ndarray,
    quant: int = 1,
    subsample: bool = False,
    al_dc: int = 0,
    al_ac: int = 0,
) -> bytes:
    """Mint a PROGRESSIVE (SOF2) JFIF JPEG — the test/synthesis inverse
    of the progressive decode path, exercising every scan species:

    - one interleaved DC first scan at successive-approximation depth
      ``al_dc``, then ``al_dc`` DC refinement scans (one bit/block);
    - per component: an AC first scan (Ss=1..Se=63) at depth
      ``al_ac`` with EOB-run batching across blocks, then ``al_ac``
      AC refinement scans (correction bits + newly-significant ±1).

    ``al_dc=al_ac=0`` is plain spectral selection. Interchange-format
    valid (self-describing flat tables), so any conforming decoder
    reads it; round trips at quant=1 must land within DCT rounding of
    the source, pixel-identical to the baseline encoding of the same
    image (pinned by test)."""
    h, w, padded, samp, mcus_x, mcus_y = _prep_components(rgb, subsample)
    qtab = np.full(64, float(quant))
    dc_codes = _enc_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _enc_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    nc = len(padded)

    # coefficient domain first: per comp, (by, bx, 64) ints in zigzag
    Z = []
    for p, (sh, sv) in zip(padded, samp):
        by, bx = mcus_y * sv, mcus_x * sh
        z = np.empty((by, bx, 64), dtype=np.int64)
        for yb in range(by):
            for xb in range(bx):
                z[yb, xb] = _fdct_quant_zz(
                    p[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8], qtab
                )
        Z.append(z)

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qtab[_ZZ].astype(
        np.uint8
    ).tobytes()
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i, (sh, sv) in enumerate(samp):
        sof += struct.pack(">BBB", i + 1, (sh << 4) | sv, 0)
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2
    for tc, bits, vals in (
        (0, _ENC_DC_BITS, _ENC_DC_VALS),
        (1, _ENC_AC_BITS, _ENC_AC_VALS),
    ):
        body = bytes([tc << 4]) + bytes(bits) + vals
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    def sos(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    def emit(scan_bytes):
        out.extend(scan_bytes)

    # --- DC first scan (interleaved over all components) ---
    sw = _ScanWriter(ac_codes, dc_codes)
    preds = [0] * nc
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (sh, sv) in enumerate(samp):
                for i in range(sv):
                    for j in range(sh):
                        v = int(Z[ci][my * sv + i, mx * sh + j, 0]) >> al_dc
                        diff = v - preds[ci]
                        preds[ci] = v
                        s = _bit_sizes(diff)
                        length, code = dc_codes[s]
                        sw.bw.write(code, length)
                        if s:
                            sw.bw.write(
                                diff if diff >= 0 else diff + (1 << s) - 1, s
                            )
    sw.bw.flush()
    emit(sos(list(range(1, nc + 1)), 0, 0, 0, al_dc))
    emit(sw.bw.out)

    # --- DC refinement scans ---
    for a in range(al_dc - 1, -1, -1):
        sw = _ScanWriter(ac_codes, dc_codes)
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (sh, sv) in enumerate(samp):
                    for i in range(sv):
                        for j in range(sh):
                            v = int(Z[ci][my * sv + i, mx * sh + j, 0])
                            sw.bw.write((v >> a) & 1, 1)
        sw.bw.flush()
        emit(sos(list(range(1, nc + 1)), 0, 0, a + 1, a))
        emit(sw.bw.out)

    def _shrink(v: int, al: int) -> int:
        """AC successive approximation: magnitude shift TOWARD zero."""
        return v >> al if v >= 0 else -((-v) >> al)

    # --- per-component AC first scans ---
    for ci, (sh, sv) in enumerate(samp):
        # component block grid (non-interleaved)
        h_max = max(s[0] for s in samp)
        v_max = max(s[1] for s in samp)
        cw = -(-w * sh // h_max)
        ch = -(-h * sv // v_max)
        gbw, gbh = -(-cw // 8), -(-ch // 8)
        sw = _ScanWriter(ac_codes, dc_codes)
        for by in range(gbh):
            for bx in range(gbw):
                zz = Z[ci][by, bx]
                r = 0
                for k in range(1, 64):
                    t = _shrink(int(zz[k]), al_ac)
                    if t == 0:
                        r += 1
                        continue
                    sw.flush_eobrun()
                    while r > 15:
                        sw.ac(0xF0)
                        r -= 16
                    s = abs(t).bit_length()
                    sw.ac((r << 4) | s)
                    sw.bw.write(t if t >= 0 else t + (1 << s) - 1, s)
                    r = 0
                if r > 0:
                    sw.eobrun += 1
                    if sw.eobrun == 0x7FFF:
                        sw.flush_eobrun()
        sw.flush_eobrun()
        sw.bw.flush()
        emit(sos([ci + 1], 1, 63, 0, al_ac))
        emit(sw.bw.out)

    # --- per-component AC refinement scans ---
    for a in range(al_ac - 1, -1, -1):
        for ci, (sh, sv) in enumerate(samp):
            h_max = max(s[0] for s in samp)
            v_max = max(s[1] for s in samp)
            cw = -(-w * sh // h_max)
            ch = -(-h * sv // v_max)
            gbw, gbh = -(-cw // 8), -(-ch // 8)
            sw = _ScanWriter(ac_codes, dc_codes)
            for by in range(gbh):
                for bx in range(gbw):
                    zz = Z[ci][by, bx]
                    absv = [abs(int(zz[k])) >> a for k in range(64)]
                    eob_pos = 0
                    for k in range(1, 64):
                        if absv[k] == 1:
                            eob_pos = k
                    r = 0
                    for k in range(1, 64):
                        t = absv[k]
                        if t == 0:
                            r += 1
                            continue
                        while r > 15 and k <= eob_pos:
                            sw.flush_eobrun()
                            sw.ac(0xF0)
                            r -= 16
                            sw.emit_corr()
                        if t > 1:
                            # already nonzero at coarser precision:
                            # buffered correction bit
                            sw.corr.append(t & 1)
                            continue
                        # newly significant at THIS precision
                        sw.flush_eobrun()
                        sw.ac((r << 4) | 1)
                        sw.bw.write(1 if int(zz[k]) >= 0 else 0, 1)
                        sw.emit_corr()
                        r = 0
                    if r > 0 or sw.corr:
                        sw.end_block()
            sw.flush_eobrun()
            sw.bw.flush()
            emit(sos([ci + 1], 1, 63, a + 1, a))
            emit(sw.bw.out)

    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg(payload: bytes) -> dict:
    """JFIF JPEG (sequential OR progressive) → dimensions + channel
    means (the ``decode_bmp``-shaped stats record)."""
    from zestdb_spark.functions.media_codecs import _image_stats

    return _image_stats(_jpeg_pixels(payload))
