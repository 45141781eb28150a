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
    """Register array (uint8, len 2^p) for one block of values.

    Values are hashed as their DECIMAL-STRING rendering through
    kernels/hashing.poly_hash64 — the SQL-replayable hash — so the
    merged registers, and therefore the estimate itself, are exactly
    reproducible in DuckDB (registry oracle for approx_distinct_parts;
    same discipline as the minhash/simhash oracles). Duplicates cannot
    change a register max, so the oracle may dedup first."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from turboxsl_ray.kernels.hashing import poly_hash64

    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = pa.array(np.asarray(values))
    if not (pa.types.is_string(values.type) or pa.types.is_large_string(values.type)):
        values = pc.cast(values, pa.string())
    m = 1 << p
    h = poly_hash64(values)
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


# --------------------------------------------------------------------------
# Histogram quantile sketch: two cheap passes (min/max, then counts),
# deterministic, merges by vector ADD. Value-space error <= range/bins.
# --------------------------------------------------------------------------


def hist_partial(values: np.ndarray, lo: float, hi: float, bins: int) -> np.ndarray:
    """int64 bin-count vector for one block (values clipped into
    [lo, hi]; equal-width bins)."""
    v = np.asarray(values, dtype=np.float64)
    v = v[np.isfinite(v)]
    if hi <= lo:
        out = np.zeros(bins, dtype=np.int64)
        out[0] = len(v)
        return out
    idx = np.clip(((v - lo) / (hi - lo) * bins).astype(np.int64), 0, bins - 1)
    return np.bincount(idx, minlength=bins).astype(np.int64)


def hist_quantiles(
    counts: np.ndarray, lo: float, hi: float, qs
) -> np.ndarray:
    """Quantile estimates from a merged histogram: locate the bin where
    the cumulative count crosses q*n, interpolate linearly within it.
    Deterministic; absolute value error <= (hi - lo) / bins."""
    total = int(counts.sum())
    bins = len(counts)
    width = (hi - lo) / bins if hi > lo else 0.0
    cum = np.concatenate(([0], np.cumsum(counts)))
    out = np.empty(len(qs), dtype=np.float64)
    for i, q in enumerate(qs):
        if total == 0:
            out[i] = lo
            continue
        target = q * total
        b = int(np.searchsorted(cum, target, side="left"))
        b = max(1, min(b, bins)) - 1
        inbin = counts[b]
        frac = (target - cum[b]) / inbin if inbin else 0.0
        out[i] = lo + (b + frac) * width
    return out


# --------------------------------------------------------------------------
# Count-min sketch + heavy hitters: d x w counter matrix, merged by
# ADD; estimates only ever OVER-count. Candidates come from per-block
# exact local top-k (any global heavy hitter is heavy in some block).
# --------------------------------------------------------------------------

_CMS_SEEDS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)


def cms_partial(values, width: int = 2048, depth: int = 4) -> np.ndarray:
    """(depth, width) int64 count-min partial for one block."""
    h = stable_hash64(values)
    out = np.zeros((depth, width), dtype=np.int64)
    for d in range(depth):
        idx = ((h * _CMS_SEEDS[d]) >> np.uint64(40)) % np.uint64(width)
        np.add.at(out[d], idx.astype(np.int64), 1)
    return out


def cms_estimate(sketch: np.ndarray, values) -> np.ndarray:
    """Point estimates (min over rows) for each value; >= true count."""
    h = stable_hash64(values)
    depth, width = sketch.shape
    est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        idx = ((h * _CMS_SEEDS[d]) >> np.uint64(40)) % np.uint64(width)
        est = np.minimum(est, sketch[d][idx.astype(np.int64)])
    return est
