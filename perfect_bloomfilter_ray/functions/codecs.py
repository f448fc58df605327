"""Pure-stdlib media codecs: PNG (zlib inflate + scanline unfilter) and WAV.

The sandbox ships no PIL/libvips/ffmpeg, but a REAL decode path matters for
the multimodal pipeline family (stages/multimodal.py): these codecs are
implemented from the public specs only — PNG (RFC 2083 / W3C PNG spec:
critical chunks, the five scanline filters) with zlib from the stdlib, WAV
via the stdlib ``wave`` module — so the decode → resize → feature stages run
on real pixels/samples end-to-end with zero new dependencies.

Scope (documented, checked, raising beyond it):

- PNG decode: bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA), non-interlaced. That covers the overwhelming
  majority of web PNGs; Adam7/16-bit raise ``ValueError`` (the actor stage
  surfaces the row id). All five filter types are implemented; None/Sub/Up
  rows unfilter fully vectorized (Sub is a mod-256 cumsum per byte lane),
  Average/Paeth fall back to a per-byte scan — our own encoder always
  writes filter 0, so the synthetic-corpus hot path never pays it.
- PNG encode: 8-bit grayscale or RGB, filter 0, one IDAT. Deterministic
  bytes for a given array (fixed zlib level) — corpus generation and
  roundtrip tests rely on that.
- WAV: 16-bit PCM mono/stereo via ``wave``; decode returns int16 samples.

At 100-TB scale these run inside actor-pool ``map_batches`` stages: decode
is inherently per-item work, so the per-row loop over a batch's payloads is
the contract there (state in ``__init__``, bounded batch_size × decoded
size); everything inside one image is numpy-vectorized.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# samples per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(typ: bytes, data: bytes) -> bytes:
    body = typ + data
    return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)


def encode_png(img: np.ndarray, compress_level: int = 6) -> bytes:
    """8-bit PNG bytes for a (h, w) grayscale or (h, w, 3) RGB uint8 array
    (filter 0 on every scanline — decodes on the vectorized path)."""
    a = np.ascontiguousarray(img, dtype=np.uint8)
    if a.ndim == 2:
        color_type, h, w = 0, a.shape[0], a.shape[1]
        flat = a.reshape(h, w)
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type, h, w = 2, a.shape[0], a.shape[1]
        flat = a.reshape(h, w * 3)
    else:
        raise ValueError(f"expected (h,w) gray or (h,w,3) RGB uint8, got {a.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.concatenate([np.zeros((h, 1), np.uint8), flat], axis=1).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, compress_level))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo the five PNG scanline filters. ``raw``: (h, 1 + stride) uint8."""
    ftypes = raw[:, 0]
    lines = raw[:, 1:].astype(np.int32)
    recon = np.zeros((h, stride), np.int32)
    prev = np.zeros(stride, np.int32)
    n_lanes = stride // bpp
    for y in range(h):
        f = int(ftypes[y])
        line = lines[y]
        if f == 0:  # None
            cur = line
        elif f == 1:  # Sub — mod-256 cumsum per byte lane, vectorized
            cur = (np.cumsum(line.reshape(n_lanes, bpp), axis=0) % 256).reshape(-1)
        elif f == 2:  # Up
            cur = (line + prev) & 255
        elif f in (3, 4):  # Average / Paeth — x-sequential by spec
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if f == 3:
                    cur[x] = (line[x] + ((a + b) >> 1)) & 255
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                    cur[x] = (line[x] + pred) & 255
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        recon[y] = cur
        prev = cur
    return recon.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes → uint8 array: (h, w) for grayscale, (h, w, c)
    otherwise (palette expands to RGB). See module docstring for scope."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos = len(_PNG_SIG)
    ihdr = None
    plte = None
    idat = bytearray()
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc (crc not verified: cost)
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    if interlace:
        raise ValueError("Adam7 interlacing not supported")
    if color_type not in _CHANNELS:
        raise ValueError(f"unknown PNG color type {color_type}")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard compression/filter method")
    bpp = _CHANNELS[color_type]
    stride = w * bpp
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    px = _unfilter(raw.reshape(h, stride + 1), h, stride, bpp)
    if color_type == 0:
        return px.reshape(h, w)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[px.reshape(h, w)]
    return px.reshape(h, w, bpp)


def to_gray(img: np.ndarray) -> np.ndarray:
    """(h, w[, c]) uint8 → (h, w) uint8 luma (BT.601 integer weights;
    alpha ignored — decode-stage policy, not compositing)."""
    if img.ndim == 2:
        return img
    c = img.shape[2]
    if c == 2:  # gray + alpha
        return img[:, :, 0]
    r, g, b = img[:, :, 0].astype(np.uint32), img[:, :, 1].astype(np.uint32), img[:, :, 2].astype(np.uint32)
    return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resample of a (h, w) array to (out_h, out_w) —
    index gather, any scale factor, fully vectorized."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys[:, None], xs[None, :]]


# ---------------------------------------------------------------------------
# WAV (stdlib `wave`)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """16-bit PCM mono WAV bytes from an int16 (or castable) 1-D array."""
    import io
    import wave

    s = np.ascontiguousarray(samples, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(s.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 mono samples, sample_rate). Stereo averages to
    mono; 8-bit PCM widens to int16."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as f:
        nch, width, rate = f.getnchannels(), f.getsampwidth(), f.getframerate()
        raw = f.readframes(f.getnframes())
    if width == 2:
        s = np.frombuffer(raw, np.int16)
    elif width == 1:  # unsigned 8-bit per spec
        s = ((np.frombuffer(raw, np.uint8).astype(np.int16) - 128) << 8).astype(np.int16)
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if nch > 1:
        s = s.reshape(-1, nch).mean(axis=1).astype(np.int16)
    return s, rate
