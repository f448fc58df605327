"""Multimodal stage plumbing: schemas, actor-pool stages, determinism.

Decode is the documented deterministic fake (no codec libs in container);
the Ray-side plumbing — schema, batch size, actor signature, output layout —
is real and verified here (SURVEY §2.3 multimodal columns).
"""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def media_ds(ray_session):
    import ray.data as rd

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"])

    def to_bin(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"blob": pc.cast(t.column("text"), pa.binary())})

    return docs.map_batches(to_bin, batch_format="pyarrow")


def test_media_tagging_schema(ray_session, media_ds):
    from perfect_bloomfilter_ray.stages.multimodal import media_dataset_from_binary

    tagged = media_dataset_from_binary(media_ds, "blob")
    df = tagged.limit(5).to_pandas()
    assert set(df.columns) == {"media_id", "media_type", "payload", "payload_bytes"}
    assert df["payload_bytes"].tolist() == [len(b) for b in df["payload"]]


def test_image_pipeline_end_to_end(ray_session, media_ds):
    from perfect_bloomfilter_ray.stages.multimodal import image_pipeline

    feats = image_pipeline(media_ds, "blob", decode_hw=(32, 32), concurrency=(1, 2), batch_size=32)
    df = feats.to_pandas()
    assert len(df) == media_ds.count()
    assert {"media_id", "px_mean", "px_std", "dhash"} <= set(df.columns)
    assert df["px_mean"].between(0, 255).all()
    # determinism: same payload -> same features regardless of run/actor
    df2 = image_pipeline(media_ds, "blob", decode_hw=(32, 32), concurrency=(1, 2), batch_size=32).to_pandas()
    a = df.sort_values("media_id").reset_index(drop=True)
    b = df2.sort_values("media_id").reset_index(drop=True)
    assert (a["dhash"].to_numpy() == b["dhash"].to_numpy()).all()


def test_resize_stage_block_mean(ray_session):
    from perfect_bloomfilter_ray.stages.multimodal import ImageResizeStage

    n, h, w = 3, 32, 32
    px = np.arange(n * h * w, dtype=np.float64).reshape(n, h, w) % 251
    t = pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.uint64)),
            "height": pa.array(np.full(n, h, dtype=np.int32)),
            "width": pa.array(np.full(n, w, dtype=np.int32)),
            "pixels": pa.FixedSizeListArray.from_arrays(
                pa.array(px.astype(np.uint8).reshape(n, -1).ravel()), h * w
            ),
        }
    )
    out = ImageResizeStage(8, 8)(t)
    small = np.asarray(out.column("pixels").combine_chunks().flatten()).reshape(n, 8, 8)
    expect = px.astype(np.uint8).astype(np.float64).reshape(n, 8, 4, 8, 4).mean(axis=(2, 4))
    assert np.abs(small - expect).max() <= 1.0  # uint8 clip/round


def test_audio_frame_sampling(ray_session, media_ds):
    from perfect_bloomfilter_ray.stages.multimodal import (
        AudioFrameSampleStage,
        media_dataset_from_binary,
    )

    tagged = media_dataset_from_binary(media_ds, "blob", media_type="audio/x-fake")
    frames = tagged.map_batches(
        AudioFrameSampleStage,
        fn_constructor_kwargs={"frames": 4, "frame_samples": 64},
        batch_size=32,
        concurrency=(1, 2),
        batch_format="pyarrow",
    )
    df = frames.to_pandas()
    assert len(df) == 4 * media_ds.count()
    assert df.groupby("media_id")["frame"].nunique().eq(4).all()
    assert (df["rms"] > 0).all()


def test_real_codec_is_explicit_stub():
    from perfect_bloomfilter_ray.stages.multimodal import RealCodecDecoder

    with pytest.raises(NotImplementedError):
        RealCodecDecoder()


def test_video_pipeline_frame_layout(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.multimodal import video_pipeline

    blobs = pa.table({"blob": [f"video-{i}".encode() for i in range(20)]})
    out = video_pipeline(rd.from_arrow(blobs), "blob", frames=3, frame_hw=(16, 16), batch_size=8).to_pandas()
    # one row per (media, frame)
    assert len(out) == 60
    assert sorted(out["frame"].unique()) == [0, 1, 2]
    assert out.groupby("media_id").size().eq(3).all()
    # per-frame features present and finite
    for c in ["px_mean", "px_std", "row_energy", "col_energy"]:
        assert np.isfinite(out[c]).all()
    # deterministic: same payloads -> same features
    out2 = video_pipeline(rd.from_arrow(blobs), "blob", frames=3, frame_hw=(16, 16), batch_size=8).to_pandas()
    a = out.sort_values(["media_id", "frame"]).reset_index(drop=True)
    b = out2.sort_values(["media_id", "frame"]).reset_index(drop=True)
    assert (a["dhash"] == b["dhash"]).all()


def _fake_decode(payloads, h, w):
    """Driver-side numpy reference of DeterministicFakeDecoder (recomputed
    from the primitives, no Ray): pixel[i,j] = splitmix64(hash(payload_i)+j)."""
    import numpy as np

    from perfect_bloomfilter_ray.functions.hashing import hash64, splitmix64

    import pyarrow as pa

    keys = hash64(pa.array(payloads, pa.binary()), 0xDECD)
    with np.errstate(over="ignore"):
        ctr = keys[:, None].astype(np.uint64) + np.arange(h * w, dtype=np.uint64)[None, :]
    return (splitmix64(ctr.ravel()) & np.uint64(0xFF)).astype(np.uint8).reshape(len(payloads), h, w)


def test_image_feature_stats_expected_exact(ray_session):
    """The query renders text → REAL PNG → stdlib decode; the roundtrip is
    lossless, so the ground-truth pixels are the tiled text bytes and the
    aggregate has ONE exact expected table — computed here driver-side in
    pure numpy WITHOUT the codec (independently verifying the encode →
    decode path loses nothing)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    texts = pq.read_table(f"{sf}/documents.parquet", columns=["text"]).column("text").to_pylist()
    px = np.stack(
        [np.resize(np.frombuffer(t.encode(), np.uint8), 32 * 32).reshape(32, 32) for t in texts]
    ).astype(np.float64)
    exp = pd.DataFrame(
        [
            {
                "n_media": len(texts),
                "avg_px_mean": px.reshape(len(texts), -1).mean(axis=1).mean(),
                "avg_row_energy": np.abs(np.diff(px, axis=1)).mean(axis=(1, 2)).mean(),
            }
        ]
    ).round(4)
    got = QUERIES["image_feature_stats"](sf).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_video_frame_stats_expected_exact(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    texts = pq.read_table(f"{sf}/documents.parquet", columns=["text"]).column("text").to_pylist()
    frames, h, w = 4, 16, 16
    raw = _fake_decode([t.encode() for t in texts], frames, h * w)  # (n, frames, h*w)
    rows = []
    for f in range(frames):
        px = raw[:, f, :].reshape(len(texts), h, w).astype(np.float64)
        rows.append(
            {
                "frame": f,
                "n_frames": len(texts),
                "avg_px_mean": px.reshape(len(texts), -1).mean(axis=1).mean(),
                "avg_row_energy": np.abs(np.diff(px, axis=1)).mean(axis=(1, 2)).mean(),
            }
        )
    exp = pd.DataFrame(rows)
    exp[["avg_px_mean", "avg_row_energy"]] = exp[["avg_px_mean", "avg_row_energy"]].round(4)
    got = QUERIES["video_frame_stats"](sf).reset_index(drop=True)
    got["frame"] = got["frame"].astype(int)
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)


def test_audio_frame_rms_stats_expected_exact(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    texts = pq.read_table(f"{sf}/documents.parquet", columns=["text"]).column("text").to_pylist()
    frames, frame_samples, clip_len = 4, 128, 2048
    # ground truth WITHOUT the codec: the WAV roundtrip is lossless and the
    # (b-128)<<8 → >>8 → +128 layout returns the original tiled bytes, so
    # each frame is a slice of the tiled text bytes at the sampler's starts
    starts = (np.arange(frames) * (clip_len - frame_samples)) // (frames - 1)
    raw = np.stack(
        [
            np.stack(
                [
                    np.resize(np.frombuffer(t.encode(), np.uint8), clip_len)[s : s + frame_samples]
                    for s in starts
                ]
            )
            for t in texts
        ]
    )  # (n, frames, samples)
    x = raw.astype(np.float64) - 127.5
    rms = np.sqrt((x**2).mean(axis=2))  # (n, frames)
    exp = pd.DataFrame(
        {"frame": np.arange(frames), "n": len(texts), "avg_rms": rms.mean(axis=0)}
    )
    got = QUERIES["audio_frame_rms_stats"](sf).reset_index(drop=True)
    got["frame"] = got["frame"].astype(int)
    exp["avg_rms"] = exp["avg_rms"].round(4)
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)
