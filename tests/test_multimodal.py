"""Multimodal binary-payload plumbing: encode → decode (fake codec,
actor pool) → featurize. The codecs are stubs; the Ray-side plumbing
(schema, actor stage shape, batch sizing) is the tested surface."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_payload_roundtrip(ray_session):
    from turboxsl_ray.pipelines.multimodal import HEADER_LEN, payload_dataset

    df = payload_dataset(SF_DIR).to_pandas()
    assert {"doc_id", "payload", "format", "width", "height"} <= set(df.columns)
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    merged = df.merge(docs, on="doc_id")
    # payload = 16-byte header + utf-8 text bytes, byte-exact
    for _, row in merged.head(20).iterrows():
        assert bytes(row["payload"])[HEADER_LEN:] == row["text"].encode("utf-8")


def test_decode_stage_actor_pool(ray_session):
    from turboxsl_ray.pipelines.multimodal import decoded_features

    df = decoded_features(SF_DIR, concurrency=2).to_pandas()
    assert df["decoded_ok"].all()
    assert (df["width"] >= 16).all() and (df["width"] < 80).all()
    assert (df["body_len"] > 0).sum() > 0  # empty texts allowed, most nonzero


def test_decode_stage_unknown_codec_raises():
    from turboxsl_ray.pipelines.multimodal import DecodeStage

    stage = DecodeStage(codec="jpeg")
    with pytest.raises(NotImplementedError):
        stage(pa.table({"doc_id": pa.array([1], pa.int64()),
                        "payload": pa.array([b"x"], pa.binary())}))


def test_featurize_deterministic(ray_session):
    from turboxsl_ray.pipelines.multimodal import FeaturizeStage, payload_dataset

    ds = payload_dataset(SF_DIR)
    feats = ds.map_batches(
        FeaturizeStage, batch_size=64, batch_format="pyarrow", concurrency=2
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(feats) == 500
    v = np.stack(feats["feature"].to_numpy())
    assert v.shape == (500, 8)
    assert ((v >= 0) & (v <= 1)).all()
    # same payload -> same feature (determinism across actors)
    stage = FeaturizeStage()
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    from turboxsl_ray.pipelines.multimodal import encode_payload_block

    local = stage(encode_payload_block(docs)).to_pandas().sort_values("doc_id")
    lv = np.stack(local["feature"].to_numpy())
    np.testing.assert_array_equal(v, lv)


def test_resize_stage(ray_session):
    from turboxsl_ray.pipelines.multimodal import ResizeStage, payload_dataset

    ds = payload_dataset(SF_DIR)
    resized = ds.map_batches(
        ResizeStage, fn_constructor_kwargs={"max_side": 32},
        batch_size=64, batch_format="pyarrow", concurrency=2,
    ).to_pandas()
    assert (resized["width"] <= 32).all() and (resized["height"] <= 32).all()
    assert (resized["width"] >= 1).all()
    # header stays parseable by the decode stage
    from turboxsl_ray.pipelines.multimodal import DecodeStage

    dec = DecodeStage()(
        pa.table({"doc_id": pa.array(resized["doc_id"].head(10).to_numpy()),
                  "payload": pa.array([bytes(b) for b in resized["payload"].head(10)],
                                      pa.binary())})
    ).to_pandas()
    assert dec["decoded_ok"].all()


def test_ppm_codec_roundtrip_and_comments():
    """Real raster codec: encode → decode is pixel-exact; headers with
    comments parse (the P6 grammar, not just our own output)."""
    from turboxsl_ray.pipelines.multimodal import decode_ppm, encode_ppm

    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(px)), px)
    with_comment = b"P6\n# a comment\n5 7\n255\n" + px.tobytes()
    np.testing.assert_array_equal(decode_ppm(with_comment), px)
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")


def test_ppm_resize_nearest_known_values():
    from turboxsl_ray.pipelines.multimodal import resize_nearest

    # 4x4 gradient, downsample to 2x2 -> picks rows/cols 0 and 2
    base = np.arange(16, dtype=np.uint8).reshape(4, 4)
    px = np.stack([base] * 3, axis=-1)
    out = resize_nearest(px, 2, 2)
    np.testing.assert_array_equal(out[:, :, 0], [[0, 2], [8, 10]])


def test_image_stats_real_decode(ray_session):
    """q_image_stats decodes REAL pixels through the actor pool; means
    match a local numpy decode bit-for-bit."""
    from turboxsl_ray.pipelines.multimodal import (
        decode_ppm,
        q_image_stats,
        synth_ppm,
    )

    df = q_image_stats(SF_DIR).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(df) == 500
    assert df["decoded_ok"].all()
    assert ((df["mean_r"] >= 0) & (df["mean_r"] <= 255)).all()
    import pyarrow.parquet as pq

    docs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    for i in range(0, 50, 7):
        px = decode_ppm(synth_ppm(docs["text"][i].encode()))
        assert df["height"][i] == px.shape[0] and df["width"][i] == px.shape[1]
        np.testing.assert_allclose(
            df["mean_g"][i], round(float(px[:, :, 1].mean()), 4), rtol=0, atol=1e-9
        )


def test_ppm_resize_stage_real(ray_session):
    from turboxsl_ray.pipelines.multimodal import (
        DecodeStage,
        ResizeStage,
        encode_ppm_block,
        read_documents,
    )
    from turboxsl_ray.stages.partitioning import map_partitions

    imgs = map_partitions(read_documents(SF_DIR, ["doc_id", "text"]), encode_ppm_block)
    resized = imgs.map_batches(
        ResizeStage, fn_constructor_kwargs={"max_side": 8, "codec": "ppm"},
        batch_size=64, batch_format="pyarrow", concurrency=2,
    ).to_pandas()
    assert (resized["width"] <= 8).all() and (resized["height"] <= 8).all()
    dec = DecodeStage(codec="ppm")(
        pa.table({
            "doc_id": pa.array(resized["doc_id"].head(10).to_numpy()),
            "payload": pa.array(
                [bytes(b) for b in resized["payload"].head(10)], pa.binary()
            ),
        })
    ).to_pandas()
    assert dec["decoded_ok"].all()
    assert (dec["width"] == resized["width"].head(10).to_numpy()).all()


def test_frame_sample_stage(ray_session):
    from turboxsl_ray.pipelines.multimodal import FrameSampleStage, payload_dataset

    ds = payload_dataset(SF_DIR)
    frames = ds.map_batches(
        FrameSampleStage, fn_constructor_kwargs={"stride": 4},
        batch_size=64, batch_format="pyarrow", concurrency=2,
    ).to_pandas()
    assert len(frames) > 500  # fan-out: more frames than docs
    assert (frames["frame_idx"] % 4 == 0).all()
    assert frames["frame"].map(len).max() <= 16


def test_wav_roundtrip_and_chunk_walk():
    """Encode → decode returns the exact samples; the parser walks
    chunks (an extra chunk before 'data' must not break it)."""
    import struct

    from turboxsl_ray.pipelines.multimodal import decode_wav, encode_wav

    s = (np.sin(np.linspace(0, 20, 1000)) * 20000).astype(np.int16)
    buf = encode_wav(s, 8000)
    got, rate = decode_wav(buf)
    assert rate == 8000 and np.array_equal(got, s)
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = buf[:fmt_end] + extra + buf[fmt_end:]
    got2, _ = decode_wav(spliced)
    assert np.array_equal(got2, s)


def test_audio_stage_sine_identities(ray_session):
    """A pure sine's RMS is amp/sqrt(2) and its zero-crossing rate is
    ~2f/rate — the stage must compute real signal math, not metadata."""
    import ray.data

    from turboxsl_ray.pipelines.multimodal import AudioDecodeStage, encode_wav

    rate, freq, amp, n = 8000, 440.0, 0.5, 8000
    t = np.arange(n) / rate
    s = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    tbl = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([encode_wav(s, rate), b"not a wav"], pa.binary()),
    })
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(AudioDecodeStage, batch_size=None, batch_format="pyarrow",
                     concurrency=1)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    good = out.iloc[0]
    assert bool(good["decoded_ok"])
    assert abs(good["rms"] - amp / np.sqrt(2)) < 1e-3
    assert abs(good["zcr"] - 2 * freq / rate) < 5e-3
    assert abs(good["duration_s"] - 1.0) < 1e-9
    bad = out.iloc[1]
    assert not bool(bad["decoded_ok"]) and bad["n_samples"] == 0


def test_audio_stats_query_runs(ray_session):
    from turboxsl_ray.pipelines.multimodal import q_audio_stats

    df = q_audio_stats("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500 and df["decoded_ok"].all()
    assert (df["duration_s"] > 0).all() and (df["rms"] > 0).all()
