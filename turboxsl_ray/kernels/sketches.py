"""Mergeable sketches: HyperLogLog approximate distinct count.

The reference has no sketch/distinct operator (SURVEY.md §2.6 notes
the gap); at 10^12 rows an exact global COUNT(DISTINCT) on a
high-cardinality key costs a full shuffle, while an HLL register array
is a few KB per block and merges by elementwise max — the canonical
partial-aggregate shape (combine per block inside map_batches, tiny
final merge on the driver).

Standard HLL (Flajolet et al. 2007, public algorithm): m = 2^p
registers; register j keeps the max leading-zero rank of hashes
routed to it; estimate = alpha_m * m^2 / sum(2^-M) with the usual
small-range (linear counting) correction.
"""

from __future__ import annotations

import numpy as np

from turboxsl_ray.kernels.hashing import stable_hash64


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_partial(values, p: int = 12) -> np.ndarray:
    """Register array (uint8, len 2^p) for one block of values."""
    m = 1 << p
    h = stable_hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining 64-p bits at the top
    # rank = leading zeros of `rest` within (64-p) bits, + 1
    nbits = 64 - p
    rank = np.full(len(h), nbits + 1, dtype=np.uint8)
    found = np.zeros(len(h), dtype=bool)
    for b in range(nbits):
        bit = ((rest >> np.uint64(63 - b)) & np.uint64(1)).astype(bool)
        newly = bit & ~found
        rank[newly] = b + 1
        found |= bit
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(regs_list) -> np.ndarray:
    """Elementwise max of register arrays (associative, commutative)."""
    out = None
    for r in regs_list:
        out = r.copy() if out is None else np.maximum(out, r)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    """Cardinality estimate with linear-counting small-range fix."""
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)
