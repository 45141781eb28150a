"""Deterministic vectorized hashing for partitioning and salting.

Python's builtin ``hash`` is per-process salted — useless for
resumable partitioning. We use pandas' stable 64-bit row hasher
(deterministic across processes/runs for a fixed hash_key).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from turboxsl_ray.kernels.arrays import as_array


def stable_hash64(values: pa.Array | pa.ChunkedArray | np.ndarray) -> np.ndarray:
    """Deterministic uint64 hash of a string/int column (vectorized).

    HASH CONTRACT: this is pandas' ``hash_pandas_object`` with its
    default ``hash_key`` ("0123456789123456") — SipHash-1-3 under the
    hood, stable for a fixed pandas major line. Every persisted
    artifact keyed by this hash (minhash signatures, LSH buckets,
    simhash values, dedup digests, partition/lineage ids) is only
    comparable across runs that share the pandas hash implementation;
    a pandas upgrade that changes it invalidates previously persisted
    signatures (recompute, don't mix). Round 3 already broke artifact
    compatibility once by switching shingle hashing to this function —
    outputs persisted before that change are not comparable either."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        ser = as_array(values).to_pandas()
    else:
        ser = pd.Series(values)
    return pd.util.hash_pandas_object(ser, index=False).to_numpy()


def partition_ids(conv_ids, num_partitions: int) -> np.ndarray:
    """Stable partition id in [0, num_partitions) per row — the
    engine's lineage/resume unit (deterministic across runs)."""
    return (stable_hash64(conv_ids) % np.uint64(num_partitions)).astype(np.int64)


def hash_sample_mask(
    values, rate_num: int, rate_den: int = 16
) -> np.ndarray:
    """Deterministic sampling mask, fully vectorized: keep a row iff
    ``stable_hash64(value) % rate_den < rate_num``.

    This is the PRODUCT sampling path for scale — one SipHash pass
    over the column (C speed, no per-row Python digest), the same
    stability contract as :func:`partition_ids` (identical keep set
    across runs, block splits, retries, and resumes for a fixed pandas
    hash implementation). :func:`md5_first_hex_digit` stays alongside
    it ONLY because DuckDB can recompute ``md5()`` — the two
    oracle-checked sampling queries use it so the driver can verify
    the exact keep set in SQL; at 100 TB prefer this function."""
    h = stable_hash64(values)
    return (h % np.uint64(rate_den)) < np.uint64(rate_num)


def md5_first_hex_digit(ids: np.ndarray) -> np.ndarray:
    """First hex digit of md5(str(id)) per row, as int64 0..15 — the
    deterministic sampling hash shared by q_sample_hash and
    q_stratified_sample (stable across runs/partitionings/resumes;
    oracle-matchable via DuckDB's md5()). md5 is inherently per-value;
    the loop is a C-speed digest per row, like ltr:md5_hex."""
    import hashlib

    return np.fromiter(
        (int(hashlib.md5(str(i).encode()).hexdigest()[0], 16) for i in ids),
        dtype=np.int64,
        count=len(ids),
    )
