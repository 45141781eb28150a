"""Segment-vectorized window kernels.

A *segment* is the contiguous run of rows belonging to one
conversation in a partition sorted by ``(conv_id, ts, turn_idx)``.
These kernels re-express turboxsl's sibling-axis navigation
(``preceding-sibling``/``following-sibling``,
/root/reference/src/xpath.c:359-428) and ``position()`` windows
(xpath.c:178-188) as O(n) vectorized index arithmetic over numpy
arrays instead of pointer-chasing a node tree.

Point-in-time discipline: every *feature* kernel here reads only rows
with index <= i within the segment (``lag``, ``ffill``, ``rolling``,
``gap``, ``session``) — the analog of the reference's past-only
``preceding-sibling`` axis.  ``lead`` is the explicit, opt-in
forward-looking analog of ``following-sibling`` (label/eval columns
only, never features).

Conventions
-----------
- index arrays use ``-1`` as the "no such row" sentinel; use
  :func:`take_with_null` to gather values with nulls at sentinels.
- a session *breaks* when ``gap > threshold`` (strictly greater), per
  FIXTURES.md F5; a gap exactly equal to the threshold stays in the
  same session.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "segment_starts_from_arrow",
    "segment_starts",
    "segment_first_index",
    "segment_last_index",
    "cumcount",
    "lag_indices",
    "lead_indices",
    "take_with_null",
    "ffill_indices",
    "gap_us",
    "session_index",
    "rolling_sum",
    "rolling_count",
    "rolling_mean",
]


def segment_starts(codes: np.ndarray) -> np.ndarray:
    """Boolean mask: True where a new segment (conversation) starts.

    ``codes`` is any equality-comparable numpy array already grouped so
    that equal values are contiguous (the post-repartition sort
    guarantees this).
    """
    n = len(codes)
    starts = np.empty(n, dtype=bool)
    if n == 0:
        return starts
    starts[0] = True
    np.not_equal(codes[1:], codes[:-1], out=starts[1:])
    return starts


def segment_starts_from_arrow(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Segment starts from an Arrow (chunked) array without a Python loop.

    Compares ``arr[1:]`` to ``arr[:-1]`` with a vectorized Arrow kernel
    (works for string conv_ids with zero copy of the character data).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    starts = np.empty(n, dtype=bool)
    if n == 0:
        return starts
    starts[0] = True
    if n > 1:
        neq = pc.not_equal(arr.slice(1), arr.slice(0, n - 1))
        # nulls compare as null -> treat as boundary (defensive; conv_id
        # should never be null)
        neq = pc.fill_null(neq, True)
        starts[1:] = neq.to_numpy(zero_copy_only=False)
    return starts


def segment_first_index(starts: np.ndarray) -> np.ndarray:
    """For each row i, the index of its segment's first row."""
    n = len(starts)
    idx = np.arange(n, dtype=np.int64)
    return np.maximum.accumulate(np.where(starts, idx, 0))


def segment_last_index(starts: np.ndarray) -> np.ndarray:
    """For each row i, the index of its segment's last row."""
    n = len(starts)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.empty(n, dtype=bool)
    ends[:-1] = starts[1:]
    ends[-1] = True
    idx = np.arange(n, dtype=np.int64)
    rev = np.where(ends, idx, n)[::-1]
    return np.minimum.accumulate(rev)[::-1]


def cumcount(starts: np.ndarray) -> np.ndarray:
    """0-based position of each row within its segment.

    The analog of the reference's 1-based per-parent ``position``
    (ltr_xsl.h:62, renumbered per selection at xpath.c:114-134) —
    0-based here; ``turn_idx`` plays the persistent-id role.
    """
    n = len(starts)
    return np.arange(n, dtype=np.int64) - segment_first_index(starts)


def lag_indices(starts: np.ndarray, k: int) -> np.ndarray:
    """Index of the row k positions earlier in the same segment, else -1.

    ``preceding-sibling::*[k]`` (xpath.c:359-372).
    """
    if k < 1:
        raise ValueError("lag k must be >= 1")
    n = len(starts)
    idx = np.arange(n, dtype=np.int64) - k
    valid = cumcount(starts) >= k
    return np.where(valid, idx, -1)


def lead_indices(starts: np.ndarray, k: int) -> np.ndarray:
    """Index of the row k positions later in the same segment, else -1.

    ``following-sibling::*[k]`` (xpath.c:394-407). Forward-looking:
    for labels/eval only, never point-in-time features.
    """
    if k < 1:
        raise ValueError("lead k must be >= 1")
    n = len(starts)
    idx = np.arange(n, dtype=np.int64) + k
    valid = idx <= segment_last_index(starts)
    return np.where(valid, idx, -1)


def take_with_null(values: pa.Array | pa.ChunkedArray | np.ndarray, indices: np.ndarray) -> pa.Array:
    """Gather ``values[indices]`` producing null where index == -1."""
    idx_arr = pa.array(indices, type=pa.int64(), mask=indices < 0)
    if isinstance(values, np.ndarray):
        values = pa.array(values)
    out = pc.take(values, idx_arr)
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def ffill_indices(starts: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """For each row i: index of the latest row j <= i in the same
    segment with ``valid[j]``, else -1.

    This single kernel powers both *backfill* (forward-fill of the last
    non-null ``tool``/``role`` value at ts' <= ts) and the distributed
    *as-of join* (union two sorted sides, forward-fill the right side's
    row index — see stages/asof_join.py). Past-only by construction:
    the analog of ``preceding-sibling::x[1]`` (xpath.c:359-372 with the
    positional filter at xpath.c:178-188).
    """
    n = len(starts)
    idx = np.arange(n, dtype=np.int64)
    last_valid = np.maximum.accumulate(np.where(valid, idx, -1))
    seg_first = segment_first_index(starts)
    return np.where(last_valid >= seg_first, last_valid, -1)


def gap_us(starts: np.ndarray, ts_us: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(gap_microseconds, valid_mask): ts[i] - ts[i-1] within segment.

    First row of each segment has no gap (valid=False, gap value 0).
    """
    n = len(ts_us)
    gaps = np.zeros(n, dtype=np.int64)
    if n > 1:
        gaps[1:] = ts_us[1:] - ts_us[:-1]
    valid = ~starts
    gaps[~valid] = 0
    return gaps, valid


def session_index(starts: np.ndarray, ts_us: np.ndarray, gap_threshold_us: int) -> tuple[np.ndarray, np.ndarray]:
    """(new_session bool, session_idx int64): gap-based sessionization.

    A new session starts at each segment start and wherever the gap to
    the previous row is STRICTLY greater than ``gap_threshold_us``
    (FIXTURES.md F5: gap == threshold stays in-session).
    ``session_idx`` is the 0-based session ordinal within the
    conversation.
    """
    gaps, gvalid = gap_us(starts, ts_us)
    new_session = starts | (gvalid & (gaps > gap_threshold_us))
    cs = np.cumsum(new_session)
    seg_first = segment_first_index(starts)
    session_idx = cs - cs[seg_first]  # 0 at each segment's first row
    return new_session, session_idx.astype(np.int64)


def _padded_cumsum(values: np.ndarray) -> np.ndarray:
    out = np.empty(len(values) + 1, dtype=np.float64)
    out[0] = 0.0
    np.cumsum(values, out=out[1:])
    return out


def _window_start(starts: np.ndarray, k: int) -> np.ndarray:
    """First index of the trailing-k-rows window clamped to the segment."""
    n = len(starts)
    idx = np.arange(n, dtype=np.int64)
    return np.maximum(idx - (k - 1), segment_first_index(starts))


def rolling_sum(starts: np.ndarray, values: np.ndarray, k: int) -> np.ndarray:
    """Trailing sum over the last k rows (inclusive) within the segment.

    NaNs in ``values`` are treated as 0 (use rolling_count of non-nan
    for a mean). O(n) via cumulative sums.
    """
    v = np.nan_to_num(values.astype(np.float64, copy=False), nan=0.0)
    cs = _padded_cumsum(v)
    lo = _window_start(starts, k)
    idx = np.arange(len(v), dtype=np.int64)
    return cs[idx + 1] - cs[lo]


def rolling_count(starts: np.ndarray, valid: np.ndarray, k: int) -> np.ndarray:
    """Trailing count of ``valid`` rows over the last k rows within segment."""
    cs = _padded_cumsum(valid.astype(np.float64))
    lo = _window_start(starts, k)
    idx = np.arange(len(valid), dtype=np.int64)
    return (cs[idx + 1] - cs[lo]).astype(np.int64)


def rolling_mean(starts: np.ndarray, values: np.ndarray, k: int) -> np.ndarray:
    """Trailing mean over the last k rows within segment (NaN-aware)."""
    v = values.astype(np.float64, copy=False)
    ok = ~np.isnan(v)
    s = rolling_sum(starts, np.where(ok, v, 0.0), k)
    c = rolling_count(starts, ok, k)
    with np.errstate(invalid="ignore"):
        return np.where(c > 0, s / np.maximum(c, 1), np.nan)


def seg_lengths_per_row(starts: np.ndarray) -> np.ndarray:
    """Length of each row's segment, broadcast to every row."""
    return segment_last_index(starts) - segment_first_index(starts) + 1


def rank_in_segments(starts: np.ndarray, values: np.ndarray):
    """SQL RANK / DENSE_RANK / PERCENT_RANK / CUME_DIST over ``values``
    ascending within each segment, fully vectorized (one lexsort +
    scatter).

    Ties share the min rank (SQL RANK, gaps after ties); dense rank
    counts distinct values (no gaps); percent_rank = (rank-1)/(n-1)
    (0 for singleton segments); cume_dist = rows-with-value<=v / n.
    The analog of ``position()`` over an ``xsl:sort``-ed selection
    (xpath.c:484-576 + 114-134), with SQL tie semantics the
    reference's stable sort cannot express.
    """
    n = len(starts)
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), np.empty(0), np.empty(0)
    seg = np.cumsum(starts) - 1
    order = np.lexsort((values, seg))
    vs, ss = values[order], seg[order]
    idx = np.arange(n, dtype=np.int64)
    first_of_seg = np.empty(n, dtype=bool)
    first_of_seg[0] = True
    first_of_seg[1:] = ss[1:] != ss[:-1]
    seg_start_pos = np.maximum.accumulate(np.where(first_of_seg, idx, 0))
    new_run = first_of_seg.copy()
    new_run[1:] |= vs[1:] != vs[:-1]
    run_start_pos = np.maximum.accumulate(np.where(new_run, idx, 0))
    run_starts = np.flatnonzero(new_run)
    run_end_pos = np.append(run_starts[1:], n)  # one past each run
    run_id = np.cumsum(new_run) - 1
    seg_len = seg_lengths_per_row(starts)[order].astype(np.float64)
    rank_sorted = run_start_pos - seg_start_pos + 1
    denom = np.maximum(seg_len - 1, 1)
    pct_sorted = (rank_sorted - 1) / denom
    cume_sorted = (run_end_pos[run_id] - seg_start_pos) / seg_len
    # dense rank: distinct-run ordinal within segment (no gaps)
    run_at_seg_start = np.maximum.accumulate(
        np.where(first_of_seg, run_id, 0)
    )
    dense_sorted = run_id - run_at_seg_start + 1
    rank = np.empty(n, dtype=np.int64)
    dense = np.empty(n, dtype=np.int64)
    pct = np.empty(n)
    cume = np.empty(n)
    rank[order] = rank_sorted
    dense[order] = dense_sorted
    pct[order] = pct_sorted
    cume[order] = cume_sorted
    return rank, dense, pct, cume


def ntile_in_segments(starts: np.ndarray, k: int) -> np.ndarray:
    """SQL NTILE(k) over the rows' existing in-segment order: the first
    ``n % k`` tiles get ``n//k + 1`` rows, the rest ``n//k``."""
    if k < 1:
        raise ValueError("ntile k must be >= 1")
    i = cumcount(starts)
    n = seg_lengths_per_row(starts)
    q, r = n // k, n % k
    cut = r * (q + 1)
    big = np.maximum(q + 1, 1)
    small = np.maximum(q, 1)
    return np.where(i < cut, i // big + 1, r + (i - cut) // small + 1).astype(np.int64)


def rolling_range_bounds(
    starts: np.ndarray, ts_us: np.ndarray, window_us: int
) -> tuple[np.ndarray, np.ndarray]:
    """(lo, hi) row-index bounds of the trailing TIME window
    ``[ts_i - window_us, ts_i]`` within each segment — SQL ``RANGE
    BETWEEN INTERVAL w PRECEDING AND CURRENT ROW`` semantics, i.e.
    rows tied with the current row's ts (peers) are INCLUDED even when
    they sort after it.

    Requires ``ts_us`` nondecreasing within each segment (the engine's
    standard (conv, ts, turn) sort). Fully vectorized: segments are
    flattened onto one strictly-segment-increasing key line
    (seg_id * stride + ts_rel) so ONE pair of global searchsorted
    calls answers every row; falls back to a per-segment loop only if
    the composite key would overflow int64 (absurd spans)."""
    n = len(ts_us)
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    seg_first = segment_first_index(starts)
    seg_id = np.cumsum(starts) - 1
    ts_rel = ts_us - ts_us[seg_first]
    n_segs = int(seg_id[-1]) + 1
    span = int(ts_rel.max()) if n else 0
    stride = span + int(window_us) + 2
    if n_segs * stride < 2**62:
        key = seg_id * stride + ts_rel
        lo = np.searchsorted(key, seg_id * stride + np.maximum(ts_rel - window_us, 0), side="left")
        hi = np.searchsorted(key, seg_id * stride + ts_rel, side="right")
        return lo.astype(np.int64), hi.astype(np.int64)
    # overflow fallback: per-segment two-pointer
    lo = np.empty(n, dtype=np.int64)
    hi = np.empty(n, dtype=np.int64)
    bounds = np.append(np.flatnonzero(starts), n)
    for s, e in zip(bounds[:-1], bounds[1:]):
        seg = ts_us[s:e]
        lo[s:e] = s + np.searchsorted(seg, seg - window_us, side="left")
        hi[s:e] = s + np.searchsorted(seg, seg, side="right")
    return lo, hi


def rolling_range_sum_count(
    starts: np.ndarray,
    ts_us: np.ndarray,
    values: np.ndarray,
    window_us: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Trailing time-window (sum, row count) per row within segment
    (NaNs sum as 0; count is COUNT(*) — every in-window row)."""
    lo, hi = rolling_range_bounds(starts, ts_us, window_us)
    v = np.nan_to_num(values.astype(np.float64, copy=False), nan=0.0)
    cs = _padded_cumsum(v)
    sums = cs[hi] - cs[lo]
    counts = (hi - lo).astype(np.int64)
    return sums, counts
