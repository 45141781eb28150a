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
