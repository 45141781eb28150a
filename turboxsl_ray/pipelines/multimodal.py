"""Multimodal (binary-payload) column plumbing.

Images/audio/video are opaque ``binary`` columns with typed metadata.
Three codecs exist:

- ``fake``: the deterministic header+text payload (metadata query has
  an exact SQL oracle via ``octet_length(encode(text))``);
- ``ppm``: REAL raster images — binary PPM (P6) is a complete image
  format encodable/decodable with numpy alone, so decode, per-channel
  stats, and nearest-neighbor resize below operate on actual pixels
  with no external imaging library;
- ``wav``: REAL audio — RIFF/WAVE 16-bit mono PCM, chunk-walking
  parser + signal stats (RMS/peak/zero-crossing) over actual samples.

Anything else (JPEG/PNG/ffmpeg codecs) raises ``NotImplementedError``
— those libraries are not in this container; swapping them into the
same actor stages changes no Ray plumbing.

The Ray-side shape is the tested contract either way: actor-pool
stages (setup in ``__init__``, work in ``__call__``), small-batch
sizing for large payloads, flat-map frame sampling, and the
metadata-extraction pass.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from turboxsl_ray.kernels.arrays import as_array
from turboxsl_ray.pipelines.text import read_documents
from turboxsl_ray.stages.partitioning import map_partitions

HEADER = b"TXSLRAY1"  # 8-byte magic
HEADER_LEN = 16  # magic + u32 width + u32 height

# large binary payloads need small batches: batch_size * concurrency
# blobs must fit the worker heap (SURVEY.md "memory-aware").
PAYLOAD_BATCH_SIZE = 64


def encode_payload_block(t: pa.Table) -> pa.Table:
    """documents block → (doc_id, payload binary, format, width, height).

    Deterministic fake payload: 16-byte header + the UTF-8 text bytes.
    Width/height are derived from the text digest (stable)."""
    text = as_array(t["text"])
    ids = as_array(t["doc_id"])
    raw = as_array(pc.cast(text, pa.binary()))
    texts = raw.to_pylist()
    payloads = []
    widths = np.empty(len(texts), dtype=np.int32)
    heights = np.empty(len(texts), dtype=np.int32)
    for i, b in enumerate(texts):
        d = hashlib.blake2b(b, digest_size=8).digest()
        w = 16 + (d[0] % 64)
        h = 16 + (d[1] % 64)
        widths[i], heights[i] = w, h
        payloads.append(HEADER + struct.pack("<II", w, h) + b)
    return pa.table(
        {
            "doc_id": ids,
            "payload": pa.array(payloads, type=pa.binary()),
            "format": pa.array(["fake/v1"] * len(texts), type=pa.string()),
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
        }
    )


# ---------------------------------------------------------------- PPM (P6)
# A real raster format, numpy-only. Encoder/decoder/resizer below work
# on actual pixel arrays (uint8 HxWx3).


def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def decode_ppm(buf: bytes) -> np.ndarray:
    """Parse a binary PPM (P6): ASCII header (magic, width, height,
    maxval, whitespace/comment separated) + raw RGB bytes."""
    if buf[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # tokenize the header: 3 integers after the magic, '#' comments ok
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":
            while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    data = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3)


def synth_ppm(text_bytes: bytes, max_side: int = 24) -> bytes:
    """Deterministic real image from a document: dimensions and pixel
    field seeded by the text digest."""
    d = hashlib.blake2b(text_bytes, digest_size=16).digest()
    w = 4 + (d[0] % max_side)
    h = 4 + (d[1] % max_side)
    rng = np.random.default_rng(int.from_bytes(d[2:10], "little"))
    return encode_ppm(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))


def resize_nearest(pixels: np.ndarray, nw: int, nh: int) -> np.ndarray:
    h, w, _ = pixels.shape
    yi = (np.arange(nh) * h // nh).astype(np.int64)
    xi = (np.arange(nw) * w // nw).astype(np.int64)
    return pixels[yi][:, xi]


def encode_ppm_block(t: pa.Table) -> pa.Table:
    """documents block → real PPM image payloads + parsed dimensions."""
    texts = as_array(pc.cast(as_array(t["text"]), pa.binary())).to_pylist()
    payloads = [synth_ppm(b) for b in texts]
    dims = [decode_ppm(p).shape for p in payloads]
    return pa.table(
        {
            "doc_id": as_array(t["doc_id"]),
            "payload": pa.array(payloads, type=pa.binary()),
            "format": pa.array(["image/x-portable-pixmap"] * len(texts)),
            "width": pa.array([d[1] for d in dims], type=pa.int32()),
            "height": pa.array([d[0] for d in dims], type=pa.int32()),
        }
    )


class DecodeStage:
    """Actor-pool decode stage (stateful: codec init once per actor).

    ``codec='ppm'`` is a REAL decode — actual pixels come out and
    per-channel means are computed from them. ``codec='fake'`` parses
    the deterministic header payload. Real heavy codecs (JPEG/ffmpeg)
    are absent in this container and raise ``NotImplementedError``;
    swapping them in changes no Ray plumbing."""

    def __init__(self, codec: str = "fake"):
        self.codec = codec  # expensive model/codec load would go here

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.codec == "ppm":
            payloads = as_array(t["payload"]).to_pylist()
            n = len(payloads)
            ok = np.zeros(n, dtype=bool)
            widths = np.zeros(n, dtype=np.int32)
            heights = np.zeros(n, dtype=np.int32)
            means = np.zeros((n, 3), dtype=np.float64)
            for i, p in enumerate(payloads):
                try:
                    px = decode_ppm(p)
                except (ValueError, IndexError):
                    continue
                ok[i] = True
                heights[i], widths[i] = px.shape[0], px.shape[1]
                means[i] = px.reshape(-1, 3).mean(axis=0)
            return pa.table(
                {
                    "doc_id": as_array(t["doc_id"]),
                    "decoded_ok": pa.array(ok),
                    "width": pa.array(widths, type=pa.int32()),
                    "height": pa.array(heights, type=pa.int32()),
                    "mean_r": pa.array(np.round(means[:, 0], 4)),
                    "mean_g": pa.array(np.round(means[:, 1], 4)),
                    "mean_b": pa.array(np.round(means[:, 2], 4)),
                }
            )
        if self.codec != "fake":
            raise NotImplementedError(
                f"codec {self.codec!r} unavailable in this environment; "
                "'fake' and 'ppm' are implemented"
            )
        payloads = as_array(t["payload"]).to_pylist()
        ok = np.empty(len(payloads), dtype=bool)
        widths = np.empty(len(payloads), dtype=np.int32)
        heights = np.empty(len(payloads), dtype=np.int32)
        body_len = np.empty(len(payloads), dtype=np.int64)
        for i, p in enumerate(payloads):
            good = p[:8] == HEADER and len(p) >= HEADER_LEN
            ok[i] = good
            if good:
                w, h = struct.unpack("<II", p[8:16])
                widths[i], heights[i] = w, h
                body_len[i] = len(p) - HEADER_LEN
            else:
                widths[i] = heights[i] = 0
                body_len[i] = 0
        return pa.table(
            {
                "doc_id": as_array(t["doc_id"]),
                "decoded_ok": pa.array(ok),
                "width": pa.array(widths, type=pa.int32()),
                "height": pa.array(heights, type=pa.int32()),
                "body_len": pa.array(body_len, type=pa.int64()),
            }
        )


class FeaturizeStage:
    """Actor-pool feature extraction: a deterministic 8-dim 'embedding'
    from payload digests (stand-in for batched model inference; the
    model load happens once per actor in ``__init__``)."""

    DIM = 8

    def __init__(self, seed: int = 0):
        self.seed = seed  # real: load model weights here, once per actor

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = as_array(t["payload"]).to_pylist()
        feats = np.empty((len(payloads), self.DIM), dtype=np.float32)
        for i, p in enumerate(payloads):
            d = hashlib.blake2b(p, digest_size=self.DIM * 4, salt=bytes([self.seed])).digest()
            feats[i] = np.frombuffer(d, dtype=np.uint32).astype(np.float32) / 2**32
        return pa.table(
            {
                "doc_id": as_array(t["doc_id"]),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1)), self.DIM
                ),
            }
        )


class ResizeStage:
    """Actor-pool resize stage. ``codec='ppm'`` is a REAL resize:
    decode pixels, nearest-neighbor sample into the target box
    (aspect-preserving), re-encode — numpy only. ``codec='fake'``
    rescales the deterministic header payload. A PIL/libvips codec
    would swap into ``__call__`` with zero Ray-plumbing changes."""

    def __init__(self, max_side: int = 32, codec: str = "fake"):
        self.max_side = max_side  # real: init codec/thread pool here
        self.codec = codec

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.codec == "ppm":
            payloads = as_array(t["payload"]).to_pylist()
            out_payloads, widths, heights = [], [], []
            for p in payloads:
                px = decode_ppm(p)
                h, w, _ = px.shape
                scale = min(self.max_side / max(w, h), 1.0)
                nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
                out = resize_nearest(px, nw, nh)
                out_payloads.append(encode_ppm(out))
                widths.append(nw)
                heights.append(nh)
            return pa.table(
                {
                    "doc_id": as_array(t["doc_id"]),
                    "payload": pa.array(out_payloads, type=pa.binary()),
                    "format": as_array(t["format"]),
                    "width": pa.array(widths, type=pa.int32()),
                    "height": pa.array(heights, type=pa.int32()),
                }
            )
        payloads = as_array(t["payload"]).to_pylist()
        out_payloads = []
        widths = np.empty(len(payloads), dtype=np.int32)
        heights = np.empty(len(payloads), dtype=np.int32)
        for i, p in enumerate(payloads):
            w, h = struct.unpack("<II", p[8:16])
            scale = min(self.max_side / max(w, h), 1.0)
            nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
            body = p[HEADER_LEN:]
            nbody = body[: max(int(len(body) * scale * scale), 1)]
            widths[i], heights[i] = nw, nh
            out_payloads.append(HEADER + struct.pack("<II", nw, nh) + nbody)
        return pa.table(
            {
                "doc_id": as_array(t["doc_id"]),
                "payload": pa.array(out_payloads, type=pa.binary()),
                "format": as_array(t["format"]),
                "width": pa.array(widths, type=pa.int32()),
                "height": pa.array(heights, type=pa.int32()),
            }
        )


class FrameSampleStage:
    """Actor-pool frame sampler (STUB): treats the payload body as a
    sequence of fixed-size "frames" and emits every ``stride``-th one
    as its own row (one input row → many output rows, the flat_map
    shape video pipelines need)."""

    FRAME_BYTES = 16

    def __init__(self, stride: int = 4):
        self.stride = stride

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = as_array(t["payload"]).to_pylist()
        ids = as_array(t["doc_id"]).to_numpy()
        out_id, out_frame_idx, out_frame = [], [], []
        for i, p in enumerate(payloads):
            body = p[HEADER_LEN:]
            n_frames = max(len(body) // self.FRAME_BYTES, 0)
            for fi in range(0, n_frames, self.stride):
                out_id.append(int(ids[i]))
                out_frame_idx.append(fi)
                out_frame.append(body[fi * self.FRAME_BYTES:(fi + 1) * self.FRAME_BYTES])
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "frame_idx": pa.array(out_frame_idx, type=pa.int32()),
                "frame": pa.array(out_frame, type=pa.binary()),
            }
        )


def payload_dataset(sf_dir: str) -> Dataset:
    return map_partitions(read_documents(sf_dir, ["doc_id", "text"]), encode_payload_block)


def decoded_features(sf_dir: str, concurrency: int = 2) -> Dataset:
    """The full multimodal actor-pool pipeline: encode → decode →
    featurize (both stateful stages are callable classes)."""
    ds = payload_dataset(sf_dir)
    decoded = ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"codec": "fake"},
        batch_size=PAYLOAD_BATCH_SIZE,
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    return decoded


def q_image_stats(sf_dir: str, concurrency: int = 2) -> Dataset:
    """Real-pixel pipeline: synthesize PPM images from documents →
    actor-pool decode (actual pixels) → per-channel means + dims.
    Deterministic but not SQL-expressible (rows-only check; pixel math
    pinned by pytest)."""
    imgs = map_partitions(
        read_documents(sf_dir, ["doc_id", "text"]), encode_ppm_block
    )
    return imgs.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"codec": "ppm"},
        batch_size=PAYLOAD_BATCH_SIZE,
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def q_multimodal_meta(sf_dir: str) -> Dataset:
    """Oracle-checkable metadata pass: payload byte length per doc
    (== octet_length(encode(text)) + 16-byte header in SQL)."""
    ds = payload_dataset(sf_dir)

    def meta(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": as_array(t["doc_id"]),
                "payload_len": as_array(
                    pc.cast(pc.binary_length(t["payload"]), pa.int64())
                ),
                "format": as_array(t["format"]),
            }
        )

    return map_partitions(ds, meta)


# ---------------------------------------------------------------- WAV (PCM)
# A real audio container, numpy-only: RIFF/WAVE with 16-bit LE PCM.
# Like the PPM path, decode and the signal stats below operate on
# actual samples — no audio library involved.


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono PCM → RIFF/WAVE bytes."""
    assert samples.dtype == np.int16 and samples.ndim == 1
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → (int16 mono samples, sample_rate). Walks the
    chunk list (a real parser, not a fixed offset) and accepts only
    16-bit mono PCM — anything else raises like an unsupported codec."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        size = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            afmt, channels, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if afmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only 16-bit mono PCM supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype=np.int16)
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, rate


WAV_RATE = 8000


def synth_wav(text_bytes: bytes) -> bytes:
    """Deterministic real audio clip from a document: a sine whose
    frequency, amplitude, and length are seeded by the text digest."""
    d = hashlib.blake2b(text_bytes, digest_size=16).digest()
    freq = 200 + int.from_bytes(d[0:2], "little") % 1800
    n = 256 + int.from_bytes(d[2:4], "little") % 1792
    amp = 0.25 + (d[4] / 255) * 0.5
    t = np.arange(n, dtype=np.float64) / WAV_RATE
    sig = amp * np.sin(2 * np.pi * freq * t)
    return encode_wav((sig * 32767).astype(np.int16), WAV_RATE)


def encode_wav_block(t: pa.Table) -> pa.Table:
    """documents block → real WAV payloads."""
    texts = as_array(pc.cast(as_array(t["text"]), pa.binary())).to_pylist()
    payloads = [synth_wav(b) for b in texts]
    return pa.table(
        {
            "doc_id": as_array(t["doc_id"]),
            "payload": pa.array(payloads, type=pa.binary()),
            "format": pa.array(["audio/wav"] * len(texts)),
        }
    )


class AudioDecodeStage:
    """Actor-pool audio decode: REAL sample math per clip — duration,
    RMS and peak of the normalized signal, zero-crossing rate (the
    cheap pitch-ish feature). Payloads that fail the parser surface as
    ``decoded_ok=false`` rows, not exceptions (corrupt blobs must not
    kill a 100 TB job)."""

    def __init__(self, codec: str = "wav"):
        if codec != "wav":
            raise NotImplementedError(
                f"codec {codec!r} unavailable in this environment; 'wav' "
                "(RIFF 16-bit mono PCM) is implemented"
            )
        self.codec = codec

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = as_array(t["payload"]).to_pylist()
        n = len(payloads)
        ok = np.zeros(n, dtype=bool)
        n_samples = np.zeros(n, dtype=np.int64)
        duration = np.zeros(n, dtype=np.float64)
        rms = np.zeros(n, dtype=np.float64)
        peak = np.zeros(n, dtype=np.float64)
        zcr = np.zeros(n, dtype=np.float64)
        for i, p in enumerate(payloads):
            try:
                s, rate = decode_wav(p)
            except (ValueError, struct.error):
                continue
            if len(s) == 0:
                continue
            ok[i] = True
            x = s.astype(np.float64) / 32768.0
            n_samples[i] = len(s)
            duration[i] = len(s) / rate
            rms[i] = np.sqrt(np.mean(x * x))
            peak[i] = np.abs(x).max()
            zcr[i] = np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))
        return pa.table(
            {
                "doc_id": as_array(t["doc_id"]),
                "decoded_ok": pa.array(ok),
                "n_samples": pa.array(n_samples),
                "duration_s": pa.array(np.round(duration, 6)),
                "rms": pa.array(np.round(rms, 6)),
                "peak": pa.array(np.round(peak, 6)),
                "zcr": pa.array(np.round(zcr, 6)),
            }
        )


def q_audio_stats(sf_dir: str, concurrency: int = 2) -> Dataset:
    """Real-sample audio pipeline: synthesize WAV clips from documents
    → actor-pool decode (actual PCM) → duration/RMS/peak/zero-crossing
    features. Deterministic but not SQL-expressible (rows-only driver
    check; the signal math is pinned by pytest against closed-form
    sine identities)."""
    clips = map_partitions(
        read_documents(sf_dir, ["doc_id", "text"]), encode_wav_block
    )
    return clips.map_batches(
        AudioDecodeStage,
        fn_constructor_kwargs={"codec": "wav"},
        batch_size=PAYLOAD_BATCH_SIZE,
        batch_format="pyarrow",
        concurrency=concurrency,
    )
