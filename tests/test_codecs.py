"""Pure-stdlib PNG/WAV codecs: exact roundtrips, filter coverage, seams."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from perfect_bloomfilter_ray.functions.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    resize_nearest,
    to_gray,
)


def test_png_roundtrip_known_4x4():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4) * 16
    data = encode_png(img)
    assert data.startswith(b"\x89PNG\r\n\x1a\n")
    back = decode_png(data)
    np.testing.assert_array_equal(back, img)


def test_png_roundtrip_gray_and_rgb_random():
    rng = np.random.RandomState(0)
    g = rng.randint(0, 256, (37, 53), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(g)), g)
    rgb = rng.randint(0, 256, (21, 17, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(rgb)), rgb)


def test_png_encode_deterministic():
    img = np.full((8, 8), 42, dtype=np.uint8)
    assert encode_png(img) == encode_png(img.copy())


def _hand_png(h, w, bpp, color_type, rows_with_filters: list[tuple[int, bytes]]) -> bytes:
    """Build a PNG whose scanlines use specific filter types (spec-level
    fixture: filtered bytes are crafted so the DECODER must undo them)."""
    raw = b"".join(bytes([f]) + line for f, line in rows_with_filters)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)

    def chunk(t, d):
        body = t + d
        return struct.pack(">I", len(d)) + body + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_all_five_filters_decode_correctly():
    """Reference vectors computed by hand from the PNG spec recurrences."""
    # grayscale 5 rows x 4 cols, one row per filter type
    # row0 None:  [10, 20, 30, 40]
    # row1 Sub:   raw [5, 5, 5, 5]  -> [5, 10, 15, 20]
    # row2 Up:    raw [1, 2, 3, 4]  -> [6, 12, 18, 24]
    # row3 Avg:   raw [4, 4, 4, 4]  -> a=prev-left: [4+(0+6)//2=7, 4+(7+12)//2=13, 4+(13+18)//2=19, 4+(19+24)//2=25]
    # row4 Paeth: raw [1, 1, 1, 1]  -> pred=paeth(a,b,c):
    #   x0: a=0 b=7  c=0  -> p=7  pick b=7  -> 8
    #   x1: a=8 b=13 c=7  -> p=14 pa=6 pb=1 pc=7 -> b=13 -> 14
    #   x2: a=14 b=19 c=13 -> p=20 pa=6 pb=1 pc=7 -> b=19 -> 20
    #   x3: a=20 b=25 c=19 -> p=26 pa=6 pb=1 pc=7 -> b=25 -> 26
    data = _hand_png(
        5, 4, 1, 0,
        [
            (0, bytes([10, 20, 30, 40])),
            (1, bytes([5, 5, 5, 5])),
            (2, bytes([1, 2, 3, 4])),
            (3, bytes([4, 4, 4, 4])),
            (4, bytes([1, 1, 1, 1])),
        ],
    )
    expected = np.array(
        [
            [10, 20, 30, 40],
            [5, 10, 15, 20],
            [6, 12, 18, 24],
            [7, 13, 19, 25],
            [8, 14, 20, 26],
        ],
        dtype=np.uint8,
    )
    np.testing.assert_array_equal(decode_png(data), expected)


def test_png_palette_decodes_to_rgb():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    ihdr = struct.pack(">IIBBBBB", 3, 1, 8, 3, 0, 0, 0)
    raw = bytes([0, 0, 1, 2])  # filter 0 + indices

    def chunk(t, d):
        body = t + d
        return struct.pack(">I", len(d)) + body + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = decode_png(data)
    np.testing.assert_array_equal(
        out, np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255]]], dtype=np.uint8)
    )


def test_png_rejects_out_of_scope():
    img = np.zeros((2, 2), np.uint8)
    ok = bytearray(encode_png(img))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + bytes(ok))
    # flip bit depth byte inside IHDR (offset: 8 sig + 8 len/type + 8 w/h)
    bad_depth = bytearray(ok)
    bad_depth[24] = 16
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(bad_depth))
    bad_interlace = bytearray(ok)
    bad_interlace[28] = 1
    with pytest.raises(ValueError, match="interlacing"):
        decode_png(bytes(bad_interlace))


def test_png_truncation_fuzz_fails_cleanly():
    """Every truncation/corruption of a valid PNG must raise a clean
    ValueError/zlib.error — never an IndexError/segfault/garbage array
    (the actor stage surfaces the row; undefined behavior would poison
    the batch)."""
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = encode_png(img)
    for cut in range(0, len(data), 7):
        try:
            out = decode_png(data[:cut])
            # a prefix that still parses must yield the true pixels
            np.testing.assert_array_equal(out, img)
        except (ValueError, zlib.error, struct.error):
            pass
    rng = np.random.RandomState(9)
    for _ in range(200):
        b = bytearray(data)
        i = rng.randint(8, len(b))  # keep the signature; corrupt the rest
        b[i] ^= 1 << rng.randint(8)
        try:
            decode_png(bytes(b))
        except (ValueError, zlib.error, struct.error):
            pass


def test_wav_garbage_fails_cleanly():
    import wave

    for payload in (b"", b"RIFF", b"RIFFxxxxWAVEfmt ", bytes(100)):
        try:
            decode_wav(payload)
        except (ValueError, wave.Error, EOFError, struct.error):
            pass


def test_to_gray_and_resize():
    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[..., 0] = 255  # pure red
    g = to_gray(rgb)
    assert g.shape == (2, 2) and int(g[0, 0]) == 255 * 299 // 1000
    big = np.arange(64, dtype=np.uint8).reshape(8, 8)
    small = resize_nearest(big, 4, 4)
    np.testing.assert_array_equal(small, big[::2, ::2])
    up = resize_nearest(small, 8, 8)
    assert up.shape == (8, 8)


def test_wav_roundtrip_mono_exact():
    rng = np.random.RandomState(1)
    s = rng.randint(-32768, 32767, 1000, dtype=np.int16)
    back, rate = decode_wav(encode_wav(s, 8000))
    assert rate == 8000
    np.testing.assert_array_equal(back, s)


def test_png_decoder_stage_seam(ray_session):
    """ImageDecodeStage with decoder_cls=PngDecoder decodes REAL PNGs to the
    exact encoded pixels (same-size → no resample error)."""
    from perfect_bloomfilter_ray.stages.multimodal import ImageDecodeStage, PngDecoder

    rng = np.random.RandomState(2)
    imgs = [rng.randint(0, 256, (16, 16), dtype=np.uint8) for _ in range(5)]
    payloads = pa.array([encode_png(im) for im in imgs], pa.large_binary())
    t = pa.table({"media_id": pa.array(range(5), pa.int64()), "payload": payloads})
    stage = ImageDecodeStage(height=16, width=16, decoder_cls=PngDecoder)
    out = stage(t)
    px = np.asarray(out.column("pixels").combine_chunks().flatten()).reshape(5, 16, 16)
    for i, im in enumerate(imgs):
        np.testing.assert_array_equal(px[i], im)


def test_wav_decoder_stage_seam(ray_session):
    from perfect_bloomfilter_ray.stages.multimodal import AudioFrameSampleStage, WavFrameDecoder

    rng = np.random.RandomState(3)
    clips = [rng.randint(-30000, 30000, 4096, dtype=np.int16) for _ in range(3)]
    t = pa.table(
        {
            "media_id": pa.array(range(3), pa.int64()),
            "payload": pa.array([encode_wav(c) for c in clips], pa.large_binary()),
        }
    )
    stage = AudioFrameSampleStage(frames=4, frame_samples=256, decoder_cls=WavFrameDecoder)
    out = stage(t)
    assert out.num_rows == 12
    # frame 0 starts at sample 0: uint8 layout (s >> 8) + 128 must match
    first = np.asarray(out.column("samples").combine_chunks().flatten()).reshape(12, 256)[0]
    expected = ((clips[0][:256].astype(np.int32) >> 8) + 128).astype(np.uint8)
    np.testing.assert_array_equal(first, expected)


def test_audio_spectral_fingerprint_contract(ray_session):
    """A pure sine's dominant band lands where its frequency says; identical
    clips collide exactly; distinct tones differ."""
    from perfect_bloomfilter_ray.stages.multimodal import AudioSpectralFingerprintStage

    stage = AudioSpectralFingerprintStage()
    n = 4096
    t_axis = np.arange(n)
    # bin 20 of a 256-sample frame → band 20 // 8 = 2
    tone = (np.sin(2 * np.pi * 20 / 256 * t_axis) * 20000).astype(np.int16)
    fp = stage._fingerprint(tone)
    assert all(((fp >> (4 * i)) & 0xF) == 2 for i in range(16))
    # bin 100 → band 12
    tone2 = (np.sin(2 * np.pi * 100 / 256 * t_axis) * 20000).astype(np.int16)
    fp2 = stage._fingerprint(tone2)
    assert all(((fp2 >> (4 * i)) & 0xF) == 12 for i in range(16))
    assert fp != fp2

    t = pa.table(
        {
            "media_id": pa.array([1, 2, 3], pa.int64()),
            "payload": pa.array(
                [encode_wav(tone), encode_wav(tone), encode_wav(tone2)], pa.large_binary()
            ),
        }
    )
    out = stage(t)
    afp = out.column("afp").to_pylist()
    assert afp[0] == afp[1] and afp[0] != afp[2]


def test_audio_fingerprint_dup_pairs_hamming0_contract(ray_session):
    """Every re-ingested byte-identical clip (doc_id % 50 == 0 under id+1e6)
    MUST surface at Hamming 0 — the deterministic dedup guarantee."""
    import duckdb

    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["audio_fingerprint_dup_pairs"](sf)
    expected_ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{sf}/documents.parquet' WHERE doc_id % 50 = 0"
        ).fetchall()
    ]
    got = {(a, b) for a, b, h in zip(out["id_a"], out["id_b"], out["hamming"]) if h == 0}
    for d in expected_ids:
        assert (d, d + 1_000_000) in got or (d + 1_000_000, d) in got, d


def test_text_to_png_payload_real_roundtrip():
    from perfect_bloomfilter_ray.stages.multimodal import text_to_png_payload

    col = pa.array(["hello world", "hello world", "different text", None])
    payloads = text_to_png_payload(col, height=8, width=8)
    assert payloads[0].as_py() == payloads[1].as_py()  # identical text -> identical PNG
    assert payloads[0].as_py() != payloads[2].as_py()
    assert payloads[3].as_py() is None
    img = decode_png(payloads[0].as_py())
    expected = np.resize(np.frombuffer(b"hello world", np.uint8), 64).reshape(8, 8)
    np.testing.assert_array_equal(img, expected)
