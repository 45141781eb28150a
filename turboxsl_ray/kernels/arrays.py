"""Tiny Arrow array normalization helpers."""

from __future__ import annotations

import pyarrow as pa


def as_array(x: pa.Array | pa.ChunkedArray) -> pa.Array:
    """A contiguous pa.Array from either an Array or a ChunkedArray."""
    if isinstance(x, pa.ChunkedArray):
        if x.num_chunks == 1:
            return x.chunk(0)
        combined = x.combine_chunks()
        if isinstance(combined, pa.ChunkedArray):  # older pyarrow quirk
            return combined.chunk(0) if combined.num_chunks else pa.array([], type=x.type)
        return combined
    return x


import numpy as np


def to_cents(x: "np.ndarray", scale: int = 100) -> "np.ndarray":
    """Round-half-away-from-zero integer cents — DuckDB/C++ ROUND
    semantics. numpy's half-even round diverges from SQL oracles on
    exact .5-cent products (price * (1-discount) has 4 decimals, so
    ~1%% of rows land exactly on a half cent)."""
    v = x * float(scale)
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
