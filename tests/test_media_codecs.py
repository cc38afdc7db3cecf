"""Real media decoders (functions/media_codecs.py): encode→decode
round trips, cross-format dispatch, and the Spark decode_features
operator over Arrow batches."""

from __future__ import annotations

import numpy as np
import pytest

from zestdb_spark.functions import media_codecs as mc


def test_wav_roundtrip_stats():
    wave = np.full(800, 250, dtype=np.int16)
    wave[1::2] = -250
    out = mc.decode_wav(mc.encode_wav(wave, 8000))
    assert out == {
        "kind": "audio",
        "sample_rate": 8000,
        "n_channels": 1,
        "n_samples": 800,
        "duration_ms": 100,
        "peak": 250.0,
        "rms": 250.0,
    }


def test_wav_8bit_and_rejects():
    with pytest.raises(mc.UnsupportedMedia):
        mc.decode_wav(b"RIFFxxxxWAVE")  # no chunks
    with pytest.raises(mc.UnsupportedMedia):
        mc.decode_wav(b"not audio at all" * 4)


def test_bmp_roundtrip_means():
    rgb = np.zeros((3, 5, 3), dtype=np.uint8)
    rgb[..., 0], rgb[..., 1], rgb[..., 2] = 10, 20, 30
    out = mc.decode_bmp(mc.encode_bmp(rgb))
    assert out == {
        "kind": "image",
        "width": 5,
        "height": 3,
        "mean_r": 10.0,
        "mean_g": 20.0,
        "mean_b": 30.0,
    }


def test_bmp_nonuniform_pixels_and_padding():
    # width 3 → stride padding exercised; distinct per-pixel values
    rgb = np.arange(3 * 3 * 3, dtype=np.uint8).reshape(3, 3, 3)
    out = mc.decode_bmp(mc.encode_bmp(rgb))
    assert out["mean_r"] == pytest.approx(rgb[..., 0].mean())
    assert out["mean_b"] == pytest.approx(rgb[..., 2].mean())


def test_netpbm_p6_and_p5():
    ppm = b"P6\n# comment\n2 2\n255\n" + bytes([255, 0, 0] * 4)
    out = mc.decode_netpbm(ppm)
    assert (out["width"], out["height"]) == (2, 2)
    assert (out["mean_r"], out["mean_g"]) == (255.0, 0.0)
    pgm = b"P5\n3 1\n255\n" + bytes([0, 128, 255])
    g = mc.decode_netpbm(pgm)
    assert g["mean_r"] == g["mean_g"] == pytest.approx((0 + 128 + 255) / 3)


def test_png_roundtrip_filter0():
    rgb = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = mc.decode_png(mc.encode_png(rgb))
    assert (out["width"], out["height"]) == (6, 4)
    assert out["mean_r"] == pytest.approx(rgb[..., 0].mean())


def test_png_filtered_rows():
    """Decode a PNG using Sub/Up/Average/Paeth filters (hand-encoded)."""
    import struct
    import zlib

    w, h = 4, 5
    rgb = (np.arange(h * w * 3, dtype=np.int32) * 37 % 256).astype(np.uint8).reshape(h, w, 3)
    stride = w * 3
    rows = rgb.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    filters = [0, 1, 2, 3, 4]
    prev = np.zeros(stride, dtype=np.int32)
    for y, f in enumerate(filters):
        cur = rows[y]
        enc = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            a = cur[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            enc[i] = (cur[i] - pred) & 0xFF
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype, body):
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(
            ">I", zlib.crc32(ctype + body)
        )

    png = (
        mc._PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    out = mc.decode_png(png)
    assert out["mean_r"] == pytest.approx(rgb[..., 0].mean())
    assert out["mean_g"] == pytest.approx(rgb[..., 1].mean())
    assert out["mean_b"] == pytest.approx(rgb[..., 2].mean())


def test_sniffable_but_malformed_payloads_raise_typed_error():
    """Truncated/corrupt containers must surface as UnsupportedMedia,
    never struct.error / zlib.error / ValueError (a corrupt asset must
    not kill a Spark job)."""
    import struct as st
    import zlib

    wav_short_fmt = b"RIFF" + st.pack("<I", 20) + b"WAVE" + b"fmt " + st.pack("<I", 4) + b"\x01\x00\x01\x00"
    bmp_truncated = mc.encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8))[:40]
    png_bad_idat = (
        mc._PNG_MAGIC
        + st.pack(">I", 13) + b"IHDR" + st.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0) + b"\x00" * 4
        + st.pack(">I", 5) + b"IDAT" + b"junk!" + b"\x00" * 4
        + st.pack(">I", 0) + b"IEND" + st.pack(">I", zlib.crc32(b"IEND"))
    )
    netpbm_bad_header = b"P5\nabc def\n255\n" + b"\x00" * 9
    for payload in (wav_short_fmt, bmp_truncated, png_bad_idat, netpbm_bad_header):
        with pytest.raises(mc.UnsupportedMedia):
            mc.decode_media(payload)


def test_dispatch_by_magic_bytes():
    wav = mc.encode_wav(np.ones(8, dtype=np.int16), 8000)
    assert mc.decode_media(wav, "image/bmp")["kind"] == "audio"  # bytes win
    with pytest.raises(mc.UnsupportedMedia):
        mc.decode_media(b"\xff\xd8\xff\xe0 jpeg-ish", "image/jpeg")


def test_resize_nearest_matches_numpy_reference():
    rgb = np.arange(6 * 9 * 3, dtype=np.uint8).reshape(6, 9, 3)
    out = mc.resize_nearest(rgb, 3, 2)
    assert out.shape == (2, 3, 3)
    # nearest grid: y -> y*6//2, x -> x*9//3
    for y in range(2):
        for x in range(3):
            assert (out[y, x] == rgb[y * 3, x * 3]).all()


def test_resize_media_roundtrip_across_formats():
    rgb = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    for enc in (mc.encode_bmp, mc.encode_png):
        resized = mc.resize_media(enc(rgb), 2, 2)
        out = mc.decode_bmp(resized)
        assert (out["width"], out["height"]) == (2, 2)
    with pytest.raises(mc.UnsupportedMedia):
        mc.resize_media(mc.encode_wav(np.ones(8, dtype=np.int16), 8000), 2, 2)


def test_resize_images_operator(spark):
    from zestdb_spark.functions import multimodal

    rgb = np.zeros((6, 10, 3), dtype=np.uint8)
    rgb[...] = (9, 8, 7)
    rows = [
        (1, "image", bytearray(mc.encode_bmp(rgb)), "image/bmp"),
        (2, "audio", bytearray(b"not an image"), "audio/wav"),
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, kind string, payload binary, mime string"
    )
    resized = multimodal.resize_images(assets, 5, 3)
    got = {r.asset_id: r for r in multimodal.decode_features(resized).collect()}
    assert (got[1].width, got[1].height) == (5, 3)
    assert (got[1].mean_r, got[1].mean_b) == (9.0, 7.0)
    assert got[2].kind == "unsupported"


def test_decode_features_operator(spark):
    """Arrow-batched decode over a mixed WAV/BMP/garbage frame."""
    from zestdb_spark.functions import multimodal

    wave = np.full(160, 99, dtype=np.int16)
    wave[1::2] = -99
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    rgb[...] = (1, 2, 3)
    rows = [
        (1, "audio", bytearray(mc.encode_wav(wave, 8000)), "audio/wav"),
        (2, "image", bytearray(mc.encode_bmp(rgb)), "image/bmp"),
        (3, "video", bytearray(b"\x00\x01garbage"), "video/mp4"),
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, kind string, payload binary, mime string"
    )
    got = {r.asset_id: r for r in multimodal.decode_features(assets).collect()}
    assert got[1].kind == "audio" and got[1].rms == 99.0 and got[1].duration_ms == 20
    assert got[2].kind == "image" and (got[2].width, got[2].height) == (2, 2)
    assert got[2].mean_b == 3.0 and got[2].sample_rate is None
    assert got[3].kind == "unsupported" and got[3].width is None


# --------------------------------------------- MP3/MP4 container metadata


def test_mp3_frame_walk_golden():
    """Frame-header walk (ISO/IEC 11172-3): exact frame count, sample
    math, duration, and channel mode from the headers alone."""
    p = mc.encode_mp3_frames(5, kbps=128, sample_rate=44100, mono=False)
    got = mc.parse_mp3(p)
    assert got == {
        "kind": "audio",
        "sample_rate": 44100,
        "n_channels": 2,
        "n_samples": 5 * 1152,
        "duration_ms": 5 * 1152 * 1000 // 44100,
        "n_frames": 5,
        "bitrate_kbps": 128,
    }
    # frame byte length must match the spec formula (floor(144*br/sr))
    assert len(p) == 5 * (144 * 128000 // 44100)


def test_mp3_id3_skip_trailing_junk_and_vbr():
    # ID3v2 prefix (synchsafe size) is skipped; ID3v1/junk tail ends
    # the walk after complete frames
    p = mc.encode_mp3_frames(4, mono=True, id3_pad=117) + b"TAG" + b"\x01" * 30
    got = mc.parse_mp3(p)
    assert (got["n_frames"], got["n_channels"]) == (4, 1)
    # VBR: per-frame bitrates differ, duration stays exact, mean kbps
    p = mc.encode_mp3_frames(2, kbps=128) + mc.encode_mp3_frames(2, kbps=64)
    got = mc.parse_mp3(p)
    assert got["n_frames"] == 4 and got["n_samples"] == 4 * 1152
    assert got["bitrate_kbps"] == 96
    # truncated final frame counts only complete frames
    whole = mc.encode_mp3_frames(3)
    got = mc.parse_mp3(whole[: len(whole) - 10])
    assert got["n_frames"] == 2


def test_mp3_malformed_is_typed():
    for bad in (
        b"\xff\xe6\x00\x00",          # reserved layer bits
        b"\xff\xfb\xf0\x00",          # bitrate index 15
        b"\xff\xfb\x9c\x00",          # reserved sample-rate index
        b"ID3\x03\x00\x00\x00\x00\x00\xff",  # non-synchsafe ID3 size
        mc.encode_mp3_frames(1)[:3],  # no complete frame
    ):
        with pytest.raises(mc.UnsupportedMedia):
            mc.parse_mp3(bad)
    # sample-rate change mid-stream is refused, not mis-summed
    p = mc.encode_mp3_frames(1, sample_rate=44100) + mc.encode_mp3_frames(
        1, sample_rate=32000
    )
    with pytest.raises(mc.UnsupportedMedia, match="mid-stream"):
        mc.parse_mp3(p)


def test_mp4_box_walk_golden():
    p = mc.encode_mp4_meta(12500, tracks=(("vide", 320, 240), ("soun", None, None)))
    assert mc.parse_mp4(p) == {
        "kind": "video",
        "duration_ms": 12500,
        "n_tracks": 2,
        "width": 320,
        "height": 240,
    }
    # audio-only: no dimensions, still a valid container
    got = mc.parse_mp4(mc.encode_mp4_meta(800, tracks=(("soun", None, None),)))
    assert got == {"kind": "video", "duration_ms": 800, "n_tracks": 1}


def test_mp4_largesize_and_malformed():
    import struct as _s

    p = mc.encode_mp4_meta(1000)
    # rewrite the moov box as a 64-bit largesize box: same parse
    ftyp_len = _s.unpack_from(">I", p, 0)[0]
    moov = p[ftyp_len:]
    size32 = _s.unpack_from(">I", moov, 0)[0]
    big = _s.pack(">I", 1) + b"moov" + _s.pack(">Q", size32 + 8) + moov[8:]
    assert mc.parse_mp4(p[:ftyp_len] + big)["duration_ms"] == 1000
    # overrunning box size is refused loudly
    broken = p[:ftyp_len] + _s.pack(">I", len(moov) + 99) + moov[4:]
    with pytest.raises(mc.UnsupportedMedia, match="overruns"):
        mc.parse_mp4(broken)
    with pytest.raises(mc.UnsupportedMedia, match="ftyp"):
        mc.parse_mp4(b"\x00" * 16)
    # the metadata tier never pretends to decode samples/pixels
    with pytest.raises(mc.UnsupportedMedia):
        mc.decode_pixels(p)


def test_decode_media_dispatches_containers():
    a = mc.decode_media(mc.encode_mp3_frames(2), "audio/mpeg")
    v = mc.decode_media(mc.encode_mp4_meta(500), None)
    assert a["kind"] == "audio" and a["n_frames"] == 2
    assert v["kind"] == "video" and v["duration_ms"] == 500


# ------------------------------------------------------------------ FLAC


def _flac_decode_channels(payload):
    """Decode and return per-channel int sample lists (test shim over
    the frame walk, so losslessness is checked sample-exact)."""
    import numpy as np

    pos = 4
    last = False
    info = None
    while not last:
        hdr = payload[pos]
        last = bool(hdr & 0x80)
        size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        if (hdr & 0x7F) == 0:
            sb = mc._Bits(payload[pos + 4 : pos + 4 + size])
            sb.take(16); sb.take(16); sb.take(24); sb.take(24)
            info = {
                "rate": sb.take(20),
                "n_channels": sb.take(3) + 1,
                "bits": sb.take(5) + 1,
                "total": sb.take(36),
            }
        pos += 4 + size
    b = mc._Bits(payload, pos * 8)
    chans = [[] for _ in range(info["n_channels"])]
    while True:
        f = mc._flac_frame(b, info)
        if f is None:
            break
        for acc, c in zip(chans, f):
            acc.extend(c)
        if len(chans[0]) >= info["total"]:
            break
    return [c[: info["total"]] for c in chans]


def _saw(n, lo=-400, hi=400, step=7):
    out, v = [], lo
    for _ in range(n):
        out.append(v)
        v += step
        if v > hi:
            v = lo
    return out


def test_flac_roundtrip_is_lossless_fixed_and_verbatim():
    """FLAC is lossless by definition — decode(encode(x)) must equal x
    SAMPLE-EXACT for every subframe type the encoder emits."""
    mono = _saw(1000)
    for sub in ("fixed2", "verbatim"):
        p = mc.encode_flac([mono], 8000, bits=16, blocksize=256, subframe=sub)
        assert _flac_decode_channels(p) == [mono], sub
    # multi-frame + non-dividing tail block
    p = mc.encode_flac([mono], 8000, bits=16, blocksize=192)
    assert _flac_decode_channels(p) == [mono]


def test_flac_stereo_decorrelation_modes():
    left = _saw(500, step=11)
    right = [l - (i % 17) for i, l in enumerate(left)]
    for mode in ("left_side", "mid_side", "independent"):
        p = mc.encode_flac(
            [left, right], 44100, bits=16, blocksize=250, stereo=mode
        )
        assert _flac_decode_channels(p) == [left, right], mode


def test_flac_lpc_subframe_roundtrip():
    """LPC path: order-2 coefficients with a fractional shift — the
    prediction truncates, so the residual arithmetic must line up
    bit-exactly for the round-trip to hold."""
    x = _saw(700, lo=-1000, hi=1000, step=13)
    p = mc.encode_flac([x], 22050, blocksize=350, subframe="lpc2")
    assert _flac_decode_channels(p) == [x]
    # and through the stats front door
    assert mc.decode_flac(p)["n_samples"] == 700


def test_flac_rice_partitions_and_params():
    x = _saw(1024, step=3)
    for porder in (0, 1, 2, 4):
        for param in (0, 2, 6):
            p = mc.encode_flac(
                [x], 16000, blocksize=512,
                rice_param=param, partition_order=porder,
            )
            assert _flac_decode_channels(p) == [x], (porder, param)


def test_flac_stats_shape_matches_wav_contract():
    x = _saw(2000)
    p = mc.encode_flac([x], 8000, blocksize=1024)
    got = mc.decode_flac(p)
    assert got["kind"] == "audio"
    assert got["sample_rate"] == 8000
    assert got["n_channels"] == 1
    assert got["n_samples"] == 2000
    assert got["duration_ms"] == 250
    import numpy as np

    xx = np.asarray(x, dtype=np.float64)
    assert got["peak"] == float(np.abs(xx).max())
    assert got["rms"] == pytest.approx(float(np.sqrt(np.mean(xx * xx))))
    # dispatch: magic bytes win
    assert mc.decode_media(p)["n_samples"] == 2000


def test_flac_malformed_is_typed():
    x = _saw(300)
    p = mc.encode_flac([x], 8000, blocksize=300)
    # truncations at every tenth byte must raise the ONE typed error
    for cut in range(5, len(p), max(len(p) // 40, 1)):
        try:
            mc.decode_flac(p[:cut])
        except mc.UnsupportedMedia:
            pass  # the contract
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"cut={cut}: {type(e).__name__}: {e}") from e
    # bit flips in the frame section: typed error or a clean decode
    # (stats decode skips CRCs, so SOME flips decode to other values —
    # they must never escape as IndexError/struct.error/etc.)
    body = bytearray(p)
    for i in range(40, len(body), max(len(body) // 60, 1)):
        mut = bytearray(body)
        mut[i] ^= 0x40
        try:
            mc.decode_flac(bytes(mut))
        except mc.UnsupportedMedia:
            pass
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"flip@{i}: {type(e).__name__}: {e}") from e
    with pytest.raises(mc.UnsupportedMedia, match="not a FLAC"):
        mc.decode_flac(b"fLaX" + p[4:])


def test_flac_wasted_bits_exhausting_bps_is_typed():
    # crafted subframe: pad=0, type=000000 (CONSTANT), wasted flag=1,
    # unary 0000000→1 ⇒ wasted=8 == bps=8 ⇒ take_signed(0) without the
    # guard (ValueError: negative shift) — must stay UnsupportedMedia
    bits = mc._Bits(bytes([0b00000001, 0b00000001]))
    with pytest.raises(mc.UnsupportedMedia, match="wasted bits"):
        mc._flac_subframe(bits, blocksize=4, bps=8)
