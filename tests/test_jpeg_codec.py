"""JPEG codec (zestdb_spark/functions/jpeg_codec.py) — sequential and
progressive.

The decoder is pinned four independent ways:
1. a HAND-ASSEMBLED golden stream (bytes written from the T.81 spec,
   no encoder involved) whose decoded pixels have a closed form;
2. encode→decode round trips at quant=1 (error bounded by DCT
   rounding alone) across 4:4:4, grayscale, 4:2:0, and restart
   intervals;
3. progressive decodes pinned PIXEL-IDENTICAL to the baseline decode
   of the same image across every scan species (spectral selection,
   DC/AC successive approximation, EOB-run batching);
4. typed rejection of everything outside the subset (arithmetic,
   truncation, non-JPEG).
No Spark session needed — pure numpy over bytes.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from zestdb_spark.functions import media_codecs
from zestdb_spark.functions.jpeg_codec import (
    _jpeg_pixels,
    decode_jpeg,
    encode_jpeg_baseline,
)
from zestdb_spark.functions.media_codecs import UnsupportedMedia


def _golden_dc_only(dc_value: int, q: int) -> bytes:
    """Hand-assemble (straight from T.81, no encoder code) a 8×8
    grayscale baseline JPEG whose single block has ONE quantized DC
    coefficient = ``dc_value`` (category 4, so 0 < |v| ≤ 15 with
    v ≥ 8, keep it simple: v in [8, 15]) and flat quant table ``q``.
    Decoded: every pixel = round(dc_value·q/8) + 128.

    Tables: DC Huffman = single symbol (category 4) with the 1-bit
    code '0'; AC Huffman = single symbol EOB (0x00) with code '0'.
    Scan bits: DC code '0', 4 magnitude bits of dc_value, EOB '0' —
    6 bits, padded with 1s."""
    assert 8 <= dc_value <= 15  # category 4, positive: bits = value
    out = bytearray(b"\xff\xd8")  # SOI
    # DQT: table 0, flat q
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([q] * 64)
    # SOF0: 8-bit, 8×8, 1 component (id 1, 1×1 sampling, quant table 0)
    out += b"\xff\xc0" + struct.pack(">H", 11) + struct.pack(
        ">BHHB", 8, 8, 8, 1
    ) + bytes([1, 0x11, 0])
    # DHT: DC table 0 = one symbol (4) at code length 1
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1) + b"\x00" + bytes(
        [1] + [0] * 15
    ) + bytes([4])
    # DHT: AC table 0 = one symbol (0x00 = EOB) at code length 1
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1) + b"\x10" + bytes(
        [1] + [0] * 15
    ) + bytes([0x00])
    # SOS: 1 component, DC table 0 / AC table 0
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    # entropy: '0' + dc_value:4 + '0', pad to a byte with 1s
    bits = "0" + format(dc_value, "04b") + "0" + "11"
    out += bytes([int(bits, 2)])
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def test_golden_dc_only_stream():
    for dc, q in ((10, 16), (8, 8), (15, 2)):
        rgb = _jpeg_pixels(_golden_dc_only(dc, q))
        assert rgb.shape == (8, 8, 3)
        expect = round(dc * q / 8) + 128
        assert np.all(rgb == expect), (dc, q, np.unique(rgb))


def test_roundtrip_444_near_lossless():
    rng = np.random.default_rng(7)
    img = (rng.integers(0, 256, (24, 33, 3)) * 0.3 + 100).astype(np.uint8)
    dec = _jpeg_pixels(encode_jpeg_baseline(img))
    assert dec.shape == img.shape
    # quant=1: only DCT float rounding — tiny bounded error
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_roundtrip_solid_gray_exact():
    # uniform plane = one integer DC coefficient at quant=1: EXACT
    for v in (0, 7, 128, 200, 255):
        for shape in ((8, 8), (5, 13), (17, 9)):
            img = np.full(shape, v, dtype=np.uint8)
            dec = _jpeg_pixels(encode_jpeg_baseline(img))
            assert dec.shape == (*shape, 3)
            assert np.all(dec == v), (v, shape)


def test_roundtrip_grayscale_and_gradient():
    g = (np.add.outer(np.arange(16) * 8, np.arange(24) * 5) % 256).astype(
        np.uint8
    )
    dec = _jpeg_pixels(encode_jpeg_baseline(g))
    assert dec.shape == (16, 24, 3)
    assert np.abs(dec[..., 0].astype(int) - g.astype(int)).max() <= 1
    assert np.array_equal(dec[..., 0], dec[..., 1])  # gray replicates


def test_roundtrip_420_subsampled():
    # smooth content: 4:2:0 loses only chroma detail
    y, x = np.mgrid[0:20, 0:30]
    img = np.dstack([100 + y * 2, 80 + x, 120 + (x + y)]).astype(np.uint8)
    enc = encode_jpeg_baseline(img, subsample=True)
    dec = _jpeg_pixels(enc)
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8
    # and it genuinely is subsampled (smaller than 4:4:4)
    assert len(enc) < len(encode_jpeg_baseline(img))


def test_roundtrip_restart_intervals():
    rng = np.random.default_rng(11)
    img = (rng.integers(0, 256, (24, 40, 3)) * 0.25 + 90).astype(np.uint8)
    plain = _jpeg_pixels(encode_jpeg_baseline(img))
    rst = _jpeg_pixels(encode_jpeg_baseline(img, restart_interval=3))
    assert np.array_equal(plain, rst)  # markers change framing, not pixels


def test_quantization_actually_applies():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    fine = encode_jpeg_baseline(img, quant=1)
    coarse = encode_jpeg_baseline(img, quant=24)
    assert len(coarse) < len(fine)  # coarser quant compresses harder
    err = np.abs(_jpeg_pixels(coarse).astype(int) - img.astype(int)).max()
    assert err > 2  # and visibly costs fidelity on noise


def test_rejects_out_of_subset():
    img = np.full((8, 8), 50, dtype=np.uint8)
    enc = bytearray(encode_jpeg_baseline(img))
    # arithmetic coding: flip SOF0 (FFC0) to SOF9 (FFC9)
    sof = bytes(enc).find(b"\xff\xc0")
    arith = bytes(enc[:sof]) + b"\xff\xc9" + bytes(enc[sof + 2 :])
    with pytest.raises(UnsupportedMedia, match="arithmetic"):
        _jpeg_pixels(arith)
    # truncated entropy data
    with pytest.raises(UnsupportedMedia):
        _jpeg_pixels(bytes(enc[:-12]))
    # not a JPEG at all
    with pytest.raises(UnsupportedMedia):
        _jpeg_pixels(b"\x00\x01\x02")


def test_media_codecs_dispatch_sniffs_jpeg():
    img = np.full((6, 10), 99, dtype=np.uint8)
    enc = encode_jpeg_baseline(img)
    stats = media_codecs.decode_media(enc)
    assert stats == {
        "kind": "image",
        "width": 10,
        "height": 6,
        "mean_r": 99.0,
        "mean_g": 99.0,
        "mean_b": 99.0,
    }
    assert stats == decode_jpeg(enc)
    # the pixel path (resize etc.) sniffs it too
    rgb = media_codecs.decode_pixels(enc)
    assert rgb.shape == (6, 10, 3) and np.all(rgb == 99)
    resized = media_codecs.resize_media(enc, 4, 3)
    assert media_codecs.decode_media(resized)["width"] == 4


def test_spark_decode_features_over_jpeg_assets(spark):
    from zestdb_spark.functions import multimodal

    assets = multimodal.synth_jpeg_assets(spark, "/root/testdata/sf0.001")
    rows = (
        multimodal.decode_features(assets)
        .select("asset_id", "width", "height", "mean_r")
        .orderBy("asset_id")
        .limit(20)
        .collect()
    )
    assert len(rows) == 20
    for r in rows:
        d = r["asset_id"]
        assert r["width"] == d % 16 + 1
        assert r["height"] == d % 8 + 1
        assert r["mean_r"] == float(d % 256)


# ------------------------------------------------------- progressive

def test_progressive_roundtrips_match_baseline_decode():
    """Every progressive scan species (spectral selection, DC/AC
    successive approximation at several depths, EOB-run batching
    across many blocks) must reconstruct the EXACT same coefficients
    as the sequential encoding of the same pixels — pinned as
    pixel-identical decodes."""
    from zestdb_spark.functions.jpeg_codec import encode_jpeg_progressive

    rng = np.random.default_rng(5)
    img = (rng.integers(0, 256, (24, 33, 3)) * 0.4 + 80).astype(np.uint8)
    base = _jpeg_pixels(encode_jpeg_baseline(img))
    for kw in (
        {},
        {"al_dc": 2},
        {"al_ac": 2},
        {"al_dc": 1, "al_ac": 3},
    ):
        dec = _jpeg_pixels(encode_jpeg_progressive(img, **kw))
        assert np.array_equal(dec, base), kw
    # noise across many blocks at deep SA: the hardest refinement load
    noise = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
    b = _jpeg_pixels(encode_jpeg_baseline(noise))
    p = _jpeg_pixels(encode_jpeg_progressive(noise, al_dc=3, al_ac=3))
    assert np.array_equal(p, b)


def test_progressive_subsampled_and_gray():
    from zestdb_spark.functions.jpeg_codec import encode_jpeg_progressive

    y, x = np.mgrid[0:20, 0:30]
    img = np.dstack([100 + y * 2, 80 + x, 120 + (x + y)]).astype(np.uint8)
    base = _jpeg_pixels(encode_jpeg_baseline(img, subsample=True))
    prog = _jpeg_pixels(
        encode_jpeg_progressive(img, subsample=True, al_dc=2, al_ac=2)
    )
    assert np.array_equal(prog, base)
    g = (np.add.outer(np.arange(16) * 7, np.arange(24) * 3) % 256).astype(
        np.uint8
    )
    dec = _jpeg_pixels(encode_jpeg_progressive(g, al_dc=2, al_ac=3))
    assert np.abs(dec[..., 0].astype(int) - g.astype(int)).max() <= 1


def test_progressive_through_media_dispatch():
    from zestdb_spark.functions.jpeg_codec import encode_jpeg_progressive

    img = np.full((6, 10), 99, dtype=np.uint8)
    stats = media_codecs.decode_media(encode_jpeg_progressive(img, al_ac=1))
    assert stats["width"] == 10 and stats["mean_r"] == 99.0


def test_progressive_truncation_is_typed():
    from zestdb_spark.functions.jpeg_codec import encode_jpeg_progressive

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    enc = encode_jpeg_progressive(img, al_ac=2)
    with pytest.raises(UnsupportedMedia):
        _jpeg_pixels(enc[: len(enc) // 2])


def test_corruption_fuzz_is_always_typed():
    """The decode_media contract under hostile bytes: any corruption of
    a valid stream (byte flips, truncations, splices) either decodes
    or raises the ONE typed error — never an IndexError/struct.error
    escape, never a hang. Deterministic fuzz (fixed seed)."""
    from zestdb_spark.functions.jpeg_codec import encode_jpeg_progressive

    rng = np.random.default_rng(17)
    img = (rng.integers(0, 256, (16, 24, 3)) * 0.5 + 60).astype(np.uint8)
    seeds = [
        encode_jpeg_baseline(img, subsample=True, restart_interval=2),
        encode_jpeg_progressive(img, al_dc=1, al_ac=2),
    ]
    n_ok, n_typed = 0, 0
    for seed in seeds:
        arr = np.frombuffer(seed, dtype=np.uint8).copy()
        for trial in range(150):
            mutated = arr.copy()
            kind = trial % 3
            if kind == 0:  # flip 1-4 random bytes
                idx = rng.integers(2, len(arr), size=rng.integers(1, 5))
                mutated[idx] ^= rng.integers(1, 256, size=len(idx)).astype(np.uint8)
            elif kind == 1:  # truncate
                mutated = mutated[: rng.integers(2, len(arr))]
            else:  # splice a random window elsewhere
                a, b = sorted(rng.integers(2, len(arr), size=2))
                mutated = np.concatenate([mutated[:a], mutated[b:]])
            try:
                media_codecs.decode_media(bytes(mutated.tobytes()))
                n_ok += 1
            except UnsupportedMedia:
                n_typed += 1
    assert n_ok + n_typed == 2 * 150
    assert n_typed > 0  # the fuzz genuinely broke streams


def test_roundtrip_422_sampling():
    """4:2:2 (horizontal-only chroma subsampling — the other common
    crawl variant): exercises the mixed-ratio upsampling path the 4:2:0
    and 4:4:4 tests cannot reach, sequential and progressive."""
    from zestdb_spark.functions.jpeg_codec import encode_jpeg_progressive

    y, x = np.mgrid[0:20, 0:30]
    img = np.dstack([100 + y * 2, 80 + x, 120 + (x + y)]).astype(np.uint8)
    enc = encode_jpeg_baseline(img, subsample="422")
    dec = _jpeg_pixels(enc)
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 6
    # vertical chroma is NOT averaged in 4:2:2 — on this vertically
    # smooth image it must beat 4:2:0 on worst-case error
    dec420 = _jpeg_pixels(encode_jpeg_baseline(img, subsample=True))
    e422 = np.abs(dec.astype(int) - img.astype(int)).max()
    e420 = np.abs(dec420.astype(int) - img.astype(int)).max()
    assert e422 <= e420
    # progressive agrees with sequential at the same sampling
    prog = _jpeg_pixels(encode_jpeg_progressive(img, subsample="422", al_ac=1))
    assert np.array_equal(prog, dec)
