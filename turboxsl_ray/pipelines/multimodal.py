"""Multimodal (binary-payload) column plumbing.

Images/audio/video are opaque ``binary`` columns with typed metadata.
The decode libraries are not in this container, so the decode kernels
are STUBS — ``DecodeStage`` raises ``NotImplementedError`` unless
given the deterministic fake codec — but the Ray-side plumbing is
real and tested: schema, actor-pool stage shape (setup in
``__init__``, work in ``__call__``), small-batch sizing for large
payloads, and the metadata-extraction pass.

Payloads here are synthesized from ``documents.text`` (UTF-8 bytes
with a fixed 16-byte header), so the metadata query has an exact SQL
oracle via ``octet_length(encode(text))``.
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


class DecodeStage:
    """Actor-pool decode stage (stateful: codec init once per actor).

    Real codecs (PIL/ffmpeg/...) are absent in this container; only
    ``codec='fake'`` is implemented, which parses the deterministic
    header and returns payload bytes. Everything else raises
    ``NotImplementedError`` at call time — the plumbing (actor
    signature, batch shape, output schema) is the tested surface."""

    def __init__(self, codec: str = "fake"):
        self.codec = codec  # expensive model/codec load would go here

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.codec != "fake":
            raise NotImplementedError(
                f"codec {self.codec!r} unavailable in this environment; "
                "only the deterministic 'fake' codec is implemented"
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
