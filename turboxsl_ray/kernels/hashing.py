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


# SQL-replayable polynomial hash constants (embedded as literals in the
# DuckDB oracles): FNV prime as the base (odd -> invertible mod 2^64,
# enabling the vectorized prefix trick below) and FNV offset basis as
# the init. NOT cryptographic; used only for dedup/LSH bucketing where
# a 64-bit collision is vanishingly unlikely and harmless.
POLY_BASE = 1099511628211
POLY_INIT = 14695981039346656037
# murmur3 fmix64 finalizer constants: the raw fold's bit i depends only
# on input bits <= i (mod-2^64 arithmetic carries strictly upward), so
# its LOW bits are near-constant across ASCII inputs — fatal for
# simhash's per-bit majorities. The xorshift/multiply finalizer pushes
# high-bit entropy back down; every step is SQL-replayable (xor and >>
# on UBIGINT, multiply as HUGEINT % 2^64).
POLY_MIX1 = 0xFF51AFD7ED558CCD
POLY_MIX2 = 0xC4CEB9FE1A85EC53
_POLY_BASE_U64 = np.uint64(POLY_BASE)
_POLY_INIT_U64 = np.uint64(POLY_INIT)
_POLY_BASE_INV_U64 = np.uint64(pow(POLY_BASE, -1, 1 << 64))


def _fmix64(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(POLY_MIX1)
    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(POLY_MIX2)
    return h ^ (h >> np.uint64(33))


def poly_hash64(strings: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """uint64 wraparound polynomial hash of each string's utf8 bytes:
    ``h = POLY_INIT; for byte: h = h*POLY_BASE + byte (mod 2^64)``.

    ``h = fmix64(h)`` finalizes (murmur3's xorshift/multiply mix, see
    POLY_MIX1/2) — without it the raw fold's low bits are
    near-constant across ASCII inputs, which simhash's per-bit
    majorities cannot tolerate.

    This is the hash the minhash/LSH/simhash family keys on INSTEAD
    of :func:`stable_hash64` precisely because DuckDB can replay both
    the fold (``list_reduce`` with HUGEINT mod-2^64 arithmetic) and
    the finalizer (xor / ``>>`` on UBIGINT; each multiply decomposed
    into 32-bit halves to stay under INT128), making the seeded
    signatures, band buckets and candidate pairs exactly
    SQL-oracle-checkable — the winnow_dedup discipline applied to
    minhash. (stable_hash64 is SipHash inside pandas; no SQL engine
    can recompute it.) The SQL replay lives in
    registry._poly_hash_ctes.

    Vectorized with the modular-inverse prefix trick (no per-row
    loop): with B odd, B^-1 exists mod 2^64, so the hash of bytes
    [s, e) of the flat buffer is
    ``INIT*B^(e-s) + B^(e-1) * (S[e] - S[s])`` where
    ``S[t] = sum_{k<t} byte_k * B^-k`` — three cumulative passes over
    the flat byte buffer and one gather per row, all uint64 wraparound
    (numpy unsigned arithmetic wraps silently, which is exactly the
    mod-2^64 semantics the SQL replays with ``% 2^64``)."""
    a = as_array(strings)
    n = len(a)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if pa.types.is_large_string(a.type) or pa.types.is_large_binary(a.type):
        off_dt, width = np.int64, 8
    else:
        off_dt, width = np.int32, 4
    offs = np.frombuffer(
        a.buffers()[1], dtype=off_dt, count=n + 1, offset=a.offset * width
    ).astype(np.int64)
    data = np.frombuffer(a.buffers()[2], dtype=np.uint8)
    base = offs[0]
    s = offs[:-1] - base
    e = offs[1:] - base
    b = data[base : offs[-1]].astype(np.uint64)
    m = len(b)
    powB = np.empty(m + 1, dtype=np.uint64)
    powB[0] = 1
    if m:
        np.multiply.accumulate(
            np.full(m, _POLY_BASE_U64, dtype=np.uint64), out=powB[1:]
        )
    powBinv = np.empty(m + 1, dtype=np.uint64)
    powBinv[0] = 1
    if m:
        np.multiply.accumulate(
            np.full(m, _POLY_BASE_INV_U64, dtype=np.uint64), out=powBinv[1:]
        )
    S = np.zeros(m + 1, dtype=np.uint64)
    if m:
        np.add.accumulate(b * powBinv[:m], out=S[1:])
    seg = powB[np.maximum(e - 1, 0)] * (S[e] - S[s])
    seg[e == s] = 0  # empty string: just the init term
    return _fmix64(_POLY_INIT_U64 * powB[e - s] + seg)


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
