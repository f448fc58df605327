"""Multimodal (image/audio/video) processing stages — Ray plumbing is real;
PNG and WAV decode are REAL (pure-stdlib codecs, functions/codecs.py);
other formats (JPEG/WebP/video containers) remain behind the
``RealCodecDecoder`` swap point.

Media payloads are opaque ``binary`` columns with typed metadata columns
alongside (``media_type``, ``width``/``height``/``sample_rate``/...). All
stages are actor-pool ``map_batches`` classes: decoder/model state is built
once per actor in ``__init__`` (the expensive part at scale), work happens
per batch in ``__call__``. Batch sizes default small — media bytes are large,
and ``batch_size × concurrency × decoded_size`` must fit the worker heap.

This container has no image/audio codec libraries, so ``RealCodecDecoder``
raises ``NotImplementedError`` by construction and the default
``DeterministicFakeDecoder`` derives pixel/sample arrays from a splitmix64
counter stream keyed on the payload hash — deterministic, so downstream
feature/resize/frame-sample stages are REAL and testable end-to-end.

Usage::

    ds = media_dataset_from_binary(ds, payload_col="html")  # any binary col
    decoded = ds.map_batches(ImageDecodeStage(64, 64), batch_size=64,
                             concurrency=(2, 8), num_cpus=1,
                             batch_format="pyarrow")
    feats = decoded.map_batches(ImageFeatureStage(), batch_size=64,
                                concurrency=(2, 8), batch_format="pyarrow")
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from perfect_bloomfilter_ray.functions.hashing import hash64, splitmix64

_U64 = np.uint64


def media_dataset_from_binary(
    ds: Dataset, payload_col: str, media_type: str = "image/x-fake"
) -> Dataset:
    """Attach typed media metadata to an opaque binary payload column."""

    def tag(t: pa.Table) -> pa.Table:
        n = len(t)
        payload = t.column(payload_col)
        if payload.type not in (pa.binary(), pa.large_binary()):
            payload = pc.cast(payload, pa.large_binary())
        return pa.table(
            {
                # int64 bit-view: media_id is a groupby key downstream and
                # Ray's aggregate key path overflows on uint64 above 2^63
                "media_id": pa.array(hash64(t.column(payload_col), 0x3D1A).astype(np.uint64).view(np.int64)),
                "media_type": pa.array([media_type] * n, pa.string()),
                "payload": payload,
                "payload_bytes": pc.cast(pc.binary_length(payload), pa.int64()),
            }
        )

    return ds.map_batches(tag, batch_format="pyarrow")


class RealCodecDecoder:
    """Placeholder for an external codec library (PIL / libvips / ffmpeg).

    For PNG and WAV a real pure-stdlib codec EXISTS in this repo — use
    :class:`PngDecoder` / the WAV path in :class:`WavFrameDecoder`
    (functions/codecs.py, implemented from the public specs). This class
    remains the swap point for formats that genuinely need an external
    library (JPEG/WebP/ffmpeg video): load it ONCE here in ``__init__``
    (never per batch).
    """

    def __init__(self) -> None:
        raise NotImplementedError(
            "no external codec libraries in this environment; PNG/WAV have "
            "real stdlib codecs (PngDecoder / WavFrameDecoder); other "
            "formats need PIL/ffmpeg at deployment"
        )


class PngDecoder:
    """REAL image decoder: PNG bytes → fixed-size grayscale tensor, using
    the pure-stdlib codec (functions/codecs.py: zlib inflate + scanline
    unfilter + luma + nearest-resample). Drop-in for the ``decoder_cls``
    seam of :class:`ImageDecodeStage`.

    Decode is inherently per-item; the loop over a batch's payloads is the
    actor-stage contract (everything within one image is vectorized)."""

    def __init__(self, height: int, width: int) -> None:
        from perfect_bloomfilter_ray.functions.codecs import (
            decode_png,
            resize_nearest,
            to_gray,
        )

        self.height, self.width = height, width
        self._decode, self._gray, self._resize = decode_png, to_gray, resize_nearest

    def decode_batch(self, payload: pa.Array) -> np.ndarray:
        out = np.zeros((len(payload), self.height, self.width), dtype=np.uint8)
        for i, v in enumerate(payload):
            b = v.as_py()
            if b:
                out[i] = self._resize(self._gray(self._decode(b)), self.height, self.width)
        return out


class WavFrameDecoder:
    """REAL audio decoder for the frame-sampling seam: WAV bytes → K evenly
    spaced frames of N samples each (uint8 center-128 layout, matching the
    fake decoder's output contract so downstream RMS/features are unchanged).
    Short clips zero-pad; sample positions are deterministic in the clip."""

    def __init__(self, frames: int, frame_samples: int) -> None:
        from perfect_bloomfilter_ray.functions.codecs import decode_wav

        self.frames, self.frame_samples = frames, frame_samples
        self._decode = decode_wav

    def decode_batch(self, payload: pa.Array) -> np.ndarray:
        k, m = self.frames, self.frame_samples
        out = np.zeros((len(payload), k, m), dtype=np.uint8)
        for i, v in enumerate(payload):
            b = v.as_py()
            if not b:
                continue
            s, _rate = self._decode(b)
            starts = (np.arange(k) * max(len(s) - m, 0)) // max(k - 1, 1) if k > 1 else np.zeros(1, np.int64)
            for j, st in enumerate(starts):
                seg = s[int(st) : int(st) + m]
                out[i, j, : len(seg)] = ((seg.astype(np.int32) >> 8) + 128).astype(np.uint8)
        return out


class AudioSpectralFingerprintStage:
    """Actor-pool stage: WAV payload → 64-bit spectral fingerprint.

    A Shazam-style landmark reduction (Wang 2003, simplified to one word):
    REAL stdlib WAV decode → 16 evenly spaced 256-sample frames → rFFT
    magnitude per frame → dominant band among 16 equal bins (DC excluded)
    → 16 × 4-bit band codes pack into one uint64. Deterministic in the
    payload bytes, robust to per-sample noise below the dominant partial —
    byte-identical clips collide at Hamming 0 and the fingerprint column
    feeds the SAME pigeonhole banding engine as simhash/pHash dedup
    (stages/dedup.hamming_pairs_u64). Output: media_id + ``afp`` int64.
    """

    FRAMES = 16
    FRAME_SAMPLES = 256
    BANDS = 16

    def __init__(self) -> None:
        from perfect_bloomfilter_ray.functions.codecs import decode_wav

        self._decode = decode_wav
        # 128 positive-frequency bins (DC dropped) → 16 bands of 8 bins
        self._band_of = np.repeat(np.arange(self.BANDS), (self.FRAME_SAMPLES // 2) // self.BANDS)

    def _fingerprint(self, samples: np.ndarray) -> int:
        k, m = self.FRAMES, self.FRAME_SAMPLES
        if len(samples) < m:
            samples = np.pad(samples, (0, m - len(samples)))
        starts = (np.arange(k) * max(len(samples) - m, 0)) // max(k - 1, 1)
        frames = np.stack([samples[s : s + m] for s in starts]).astype(np.float64)
        mag = np.abs(np.fft.rfft(frames, axis=1))[:, 1 : m // 2 + 1]  # drop DC
        # dominant band per frame: max of per-band peak magnitudes
        band_peaks = np.zeros((k, self.BANDS))
        for b in range(self.BANDS):
            band_peaks[:, b] = mag[:, self._band_of == b].max(axis=1)
        codes = band_peaks.argmax(axis=1).astype(np.uint64)  # (k,) 4-bit codes
        fp = np.uint64(0)
        with np.errstate(over="ignore"):
            for i, c in enumerate(codes):
                fp |= c << np.uint64(4 * i)
        return int(fp)

    def __call__(self, t: pa.Table) -> pa.Table:
        fps = np.zeros(len(t), dtype=np.uint64)
        payload = t.column("payload")
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        for i, v in enumerate(payload):
            b = v.as_py()
            if b:
                s, _rate = self._decode(b)
                fps[i] = self._fingerprint(s)
        return pa.table(
            {"media_id": t.column("media_id"), "afp": pa.array(fps.view(np.int64))}
        )


def text_to_wav_payload(col, n_samples: int = 4096, sample_rate: int = 16_000) -> pa.Array:
    """Deterministic REAL WAV bytes from a string/binary column: row bytes
    tile an ``n_samples``-long int16 PCM signal ((b − 128) << 8) which is
    ACTUALLY WAV-encoded — downstream frame-sampling exercises the full
    stdlib ``wave`` decode path. Byte-identical inputs → identical WAVs."""
    from perfect_bloomfilter_ray.functions.codecs import encode_wav

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = []
    for v in col:
        b = v.as_py()
        if b is None:
            out.append(None)
            continue
        if isinstance(b, str):
            b = b.encode("utf-8", "surrogatepass")
        buf = np.frombuffer(b, np.uint8) if b else np.zeros(1, np.uint8)
        s = ((np.resize(buf, n_samples).astype(np.int16) - 128) << 8).astype(np.int16)
        out.append(encode_wav(s, sample_rate))
    return pa.array(out, pa.large_binary())


def text_to_png_payload(col, height: int = 32, width: int = 32) -> pa.Array:
    """Deterministic REAL PNG bytes from a string/binary column: the row's
    bytes tile a (height, width) grayscale raster which is then ACTUALLY
    PNG-encoded (filter 0, fixed zlib level). Byte-identical inputs yield
    byte-identical PNGs — the property the image-dedup contracts rely on —
    and downstream stages exercise the full real decode path."""
    from perfect_bloomfilter_ray.functions.codecs import encode_png

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n_px = height * width
    out = []
    for v in col:
        b = v.as_py()
        if b is None:
            out.append(None)
            continue
        if isinstance(b, str):
            b = b.encode("utf-8", "surrogatepass")
        buf = np.frombuffer(b, np.uint8) if b else np.zeros(1, np.uint8)
        out.append(encode_png(np.resize(buf, n_px).reshape(height, width)))
    return pa.array(out, pa.large_binary())


class DeterministicFakeDecoder:
    """Derives a (h, w) uint8 'pixel' array per payload from a counter-based
    splitmix64 stream keyed on the payload hash — stable across runs/workers."""

    def __init__(self, height: int, width: int) -> None:
        self.height = height
        self.width = width

    def decode_batch(self, payload: pa.Array) -> np.ndarray:
        keys = hash64(payload, 0xDECD)
        n = len(keys)
        px_per = self.height * self.width
        # counter stream: pixel[i, j] = mix(key_i + j); vectorized in one shot
        with np.errstate(over="ignore"):
            ctr = keys[:, None].astype(_U64) + np.arange(px_per, dtype=_U64)[None, :]
        return (splitmix64(ctr.ravel()) & _U64(0xFF)).astype(np.uint8).reshape(n, self.height, self.width)


class ImageDecodeStage:
    """Actor-pool stage: payload binary → fixed-size grayscale pixel tensor.

    Decoder state is constructed once per actor (``__init__``), per-batch work
    is vectorized. Output: ``pixels`` fixed_size_list<uint8>[h*w] + dims.
    """

    def __init__(self, height: int = 64, width: int = 64, decoder_cls=DeterministicFakeDecoder):
        self.decoder = decoder_cls(height, width)
        self.height, self.width = height, width

    def __call__(self, t: pa.Table) -> pa.Table:
        pixels = self.decoder.decode_batch(t.column("payload"))
        n = len(t)
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "height": pa.array(np.full(n, self.height, dtype=np.int32)),
                "width": pa.array(np.full(n, self.width, dtype=np.int32)),
                "pixels": pa.FixedSizeListArray.from_arrays(
                    pa.array(pixels.reshape(n, -1).ravel()), self.height * self.width
                ),
            }
        )


class ImageResizeStage:
    """Actor-pool stage: block-mean downsample (real math, no codec needed)."""

    def __init__(self, out_height: int = 16, out_width: int = 16):
        self.oh, self.ow = out_height, out_width

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        h = int(t.column("height")[0].as_py())
        w = int(t.column("width")[0].as_py())
        px = np.asarray(t.column("pixels").combine_chunks().flatten()).reshape(n, h, w)
        fh, fw = h // self.oh, w // self.ow
        small = px[:, : fh * self.oh, : fw * self.ow].reshape(n, self.oh, fh, self.ow, fw).mean(axis=(2, 4))
        small8 = np.clip(small, 0, 255).astype(np.uint8)
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "height": pa.array(np.full(n, self.oh, dtype=np.int32)),
                "width": pa.array(np.full(n, self.ow, dtype=np.int32)),
                "pixels": pa.FixedSizeListArray.from_arrays(
                    pa.array(small8.reshape(n, -1).ravel()), self.oh * self.ow
                ),
            }
        )


class ImageFeatureStage:
    """Actor-pool stage: pixel tensor → feature vector (mean/std/quartiles,
    row/col profile energies, dHash-style 64-bit perceptual hash)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        h = int(t.column("height")[0].as_py())
        w = int(t.column("width")[0].as_py())
        px = np.asarray(t.column("pixels").combine_chunks().flatten()).reshape(n, h, w).astype(np.float64)
        flat = px.reshape(n, -1)
        # dHash: 8x8 block-mean then horizontal gradient sign → 64 bits
        fh, fw = max(h // 8, 1), max(w // 9, 1)
        blocks = px[:, : fh * 8, : fw * 9].reshape(n, 8, fh, 9, fw).mean(axis=(2, 4))
        bits = (blocks[:, :, 1:] > blocks[:, :, :-1]).reshape(n, 64)
        dhash = (bits.astype(_U64) << np.arange(64, dtype=_U64)[None, :]).sum(axis=1, dtype=_U64)
        cols = {
            "media_id": t.column("media_id"),
            "px_mean": pa.array(flat.mean(axis=1)),
            "px_std": pa.array(flat.std(axis=1)),
            "px_p25": pa.array(np.percentile(flat, 25, axis=1)),
            "px_p75": pa.array(np.percentile(flat, 75, axis=1)),
            "row_energy": pa.array(np.abs(np.diff(px, axis=1)).mean(axis=(1, 2))),
            "col_energy": pa.array(np.abs(np.diff(px, axis=2)).mean(axis=(1, 2))),
            "dhash": pa.array(dhash),
        }
        if "frame" in t.column_names:  # video path: keep the frame index
            cols["frame"] = t.column("frame")
        return pa.table(cols)


class AudioFrameSampleStage:
    """Actor-pool stage: payload binary → K sampled 'frames' of N samples each
    (deterministic fake decode), with per-frame RMS — the video/audio
    frame-sampling layout (one output row per (media, frame))."""

    def __init__(self, frames: int = 4, frame_samples: int = 256, decoder_cls=DeterministicFakeDecoder):
        self.frames = frames
        self.frame_samples = frame_samples
        self.decoder = decoder_cls(frames, frame_samples)

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        raw = self.decoder.decode_batch(t.column("payload"))  # (n, frames, samples)
        x = raw.astype(np.float64) - 127.5
        rms = np.sqrt((x**2).mean(axis=2))  # (n, frames)
        ids = np.asarray(t.column("media_id")).repeat(self.frames)
        frame_idx = np.tile(np.arange(self.frames, dtype=np.int32), n)
        return pa.table(
            {
                "media_id": pa.array(ids),
                "frame": pa.array(frame_idx),
                "samples": pa.FixedSizeListArray.from_arrays(
                    pa.array(raw.reshape(n * self.frames, -1).ravel()), self.frame_samples
                ),
                "rms": pa.array(rms.ravel()),
            }
        )


class VideoFrameSampleStage:
    """Actor-pool stage: payload binary → K sampled 2-D frames per video
    (decoder stubbed per module policy), one output row per (media, frame)
    with the same (pixels, height, width) layout the image stages consume —
    so per-frame feature extraction is the UNCHANGED ImageFeatureStage."""

    def __init__(self, frames: int = 4, height: int = 32, width: int = 32, decoder_cls=DeterministicFakeDecoder):
        self.frames, self.h, self.w = frames, height, width
        self.decoder = decoder_cls(frames, height * width)

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        raw = self.decoder.decode_batch(t.column("payload"))  # (n, frames, h*w)
        ids = np.asarray(t.column("media_id")).repeat(self.frames)
        rows = n * self.frames
        return pa.table(
            {
                "media_id": pa.array(ids),
                "frame": pa.array(np.tile(np.arange(self.frames, dtype=np.int32), n)),
                "pixels": pa.FixedSizeListArray.from_arrays(
                    pa.array(raw.reshape(rows, -1).ravel()), self.h * self.w
                ),
                "height": pa.array(np.full(rows, self.h, dtype=np.int32)),
                "width": pa.array(np.full(rows, self.w, dtype=np.int32)),
            }
        )


def video_pipeline(
    ds: Dataset,
    payload_col: str,
    frames: int = 4,
    frame_hw: tuple[int, int] = (32, 32),
    concurrency: tuple[int, int] = (1, 4),
    batch_size: int = 64,
) -> Dataset:
    """tag → frame-sample (actor pool) → per-frame features (actor pool).

    Output: one row per (media_id, frame) with the image feature columns.
    Batch sizing: a batch decodes to ``batch × frames × h × w`` bytes — keep
    ``batch_size`` small enough that this times the pool size fits the heap.
    """
    tagged = media_dataset_from_binary(ds, payload_col)
    sampled = tagged.map_batches(
        VideoFrameSampleStage,
        fn_constructor_kwargs={"frames": frames, "height": frame_hw[0], "width": frame_hw[1]},
        batch_size=batch_size,
        concurrency=concurrency,
        batch_format="pyarrow",
    )
    return sampled.map_batches(
        ImageFeatureStage,
        batch_size=batch_size * frames,
        concurrency=concurrency,
        batch_format="pyarrow",
    )


def image_pipeline(
    ds: Dataset,
    payload_col: str,
    decode_hw: tuple[int, int] = (64, 64),
    concurrency: tuple[int, int] = (2, 8),
    batch_size: int = 64,
    decoder_cls=DeterministicFakeDecoder,
) -> Dataset:
    """tag → decode (actor pool) → features (actor pool). Small batches:
    decoded tensors are ``batch × h × w`` bytes and must fit the heap.
    ``decoder_cls=PngDecoder`` runs the REAL stdlib PNG codec."""
    tagged = media_dataset_from_binary(ds, payload_col)
    # actor pools: pass the CLASS + constructor args — state built once per
    # actor in __init__, not per batch (and not per task)
    decoded = tagged.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"height": decode_hw[0], "width": decode_hw[1], "decoder_cls": decoder_cls},
        batch_size=batch_size,
        concurrency=concurrency,
        batch_format="pyarrow",
    )
    return decoded.map_batches(
        ImageFeatureStage,
        batch_size=batch_size,
        concurrency=concurrency,
        batch_format="pyarrow",
    )
