"""Bloom-filter join pruning: drop probe-side rows that certainly
have no build-side match BEFORE they enter the exchange.

When the build (left) side of an equi-join is selective — a filtered
dimension, a sampled cohort — most probe-side rows shuffle only to be
discarded by the per-block hash join. A Bloom filter of the build keys
is KB-to-MB sized regardless of probe volume, so the plan becomes:

1. one projected scan of the build side's key column, per-block
   partial bitsets (numpy uint64 words, double hashing);
2. OR-combine the partials on the driver (bitset size x blocks bytes,
   independent of row count) and broadcast the result once;
3. a vectorized membership test per probe block filters rows before
   the shuffle — false positives only cost a shuffled row that the
   join drops anyway, so correctness is unaffected by construction.

Reference analog: the closest thing turboxsl has is the key() lookup
re-scanning the whole secondary document per probe
(/root/reference/src/functions.c:1115-1165); this stage is the
scale-path inversion — summarize the build side once, prune probes
early.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from turboxsl_ray.kernels.arrays import as_array

# default 2^22 bits = 512 KiB; at 1M build keys that is ~4 bits/key ->
# ~15% false positives with k=2 — fine for pruning (not membership)
DEFAULT_NBITS = 1 << 22
_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _key_hash(col) -> np.ndarray:
    """Vectorized uint64 hash of an Arrow key column.

    Integer keys mix directly. String/binary keys dictionary-encode
    per block first, so Python hashing touches only the block's
    DISTINCT values; rows map through the indices (vectorized take).
    """
    import pyarrow.compute as pc

    arr = as_array(col)
    valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
    if pa.types.is_integer(arr.type):
        v = (
            pc.fill_null(arr.cast(pa.int64()), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        h = v.view(np.uint64).copy()
    else:
        # deterministic across processes (builtin hash() is per-process
        # salted); dictionary-encode first so the digest loop touches
        # only the block's DISTINCT values
        from hashlib import blake2b

        enc = arr.dictionary_encode()
        uniq = np.array(
            [
                int.from_bytes(
                    blake2b(str(x).encode(), digest_size=8).digest(), "little"
                )
                for x in enc.dictionary.to_pylist()
            ],
            dtype=np.uint64,
        )
        # null rows have null indices -> NaN via to_numpy; point them at
        # slot 0 (any slot) and let the returned mask exclude them
        idx = (
            pc.fill_null(enc.indices, 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        h = uniq[idx] if len(uniq) else np.zeros(len(arr), dtype=np.uint64)
    h ^= h >> np.uint64(33)
    h *= _MIX1
    h ^= h >> np.uint64(29)
    h *= _MIX2
    h ^= h >> np.uint64(32)
    return h, valid


def _positions(h: np.ndarray, nbits: int) -> tuple[np.ndarray, np.ndarray]:
    """Double hashing: two bit positions per key."""
    p1 = (h % np.uint64(nbits)).astype(np.int64)
    p2 = ((h >> np.uint64(32)) % np.uint64(nbits)).astype(np.int64)
    return p1, p2


def build_bloom(ds: Dataset, on: str, nbits: int = DEFAULT_NBITS) -> np.ndarray:
    """uint64-word bitset of the build side's keys.

    Per-block partial bitsets (one projected pass), OR-combined on the
    driver — the combine moves bitset-size x blocks bytes, never keys.
    """
    from turboxsl_ray.stages.aggregate import collect_tables
    from turboxsl_ray.stages.partitioning import map_partitions

    nwords = nbits // 64

    def block_bits(t: pa.Table) -> pa.Table:
        words = np.zeros(nwords, dtype=np.uint64)
        if t.num_rows:
            h, valid = _key_hash(t[on])
            h = h[valid]
            for p in _positions(h, nbits):
                np.bitwise_or.at(words, p >> 6, np.uint64(1) << (p & 63).astype(np.uint64))
        return pa.table({"bits": pa.array([words.tobytes()], type=pa.large_binary())})

    bloom = np.zeros(nwords, dtype=np.uint64)
    for t in collect_tables(map_partitions(ds.select_columns([on]), block_bits)):
        for buf in t["bits"].to_pylist():
            bloom |= np.frombuffer(buf, dtype=np.uint64)
    return bloom


def bloom_mask(col, bloom: np.ndarray) -> np.ndarray:
    """Boolean keep-mask: True where the key MIGHT be in the build set."""
    nbits = len(bloom) * 64
    h, valid = _key_hash(col)
    keep = np.ones(len(h), dtype=bool)
    for p in _positions(h, nbits):
        keep &= (bloom[p >> 6] >> (p & 63).astype(np.uint64)) & np.uint64(1) != 0
    # a null key can never be pruned by a bloom of VALUES: pass it
    # through unfiltered and let the join's own null semantics decide
    return keep | ~valid
