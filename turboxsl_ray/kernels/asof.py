"""As-of (point-in-time, backward) join kernels.

Semantics match ``pandas.merge_asof(..., by=key, on=ts,
direction="backward")``: for each left row, pick the right row of the
same key with the greatest ``ts' <= ts``; among duplicate right
timestamps the *last* one in right's sort order wins; no match -> null.
Backward-only indices enforce zero temporal leakage by construction.

Reference analog: ``preceding-sibling::x[1]`` — "the latest earlier
sibling" (/root/reference/src/xpath.c:359-372 plus the positional
filter xpath.c:178-188) — and the ``key()`` lookup that the reference
re-scans linearly per call (functions.c:1115-1165, admitted in TODO:15);
here it is a vectorized galloping binary-search merge.
"""

from __future__ import annotations

import numpy as np

__all__ = ["asof_backward_indices"]


def asof_backward_indices(
    left_keys: np.ndarray,
    left_ts: np.ndarray,
    right_keys: np.ndarray,
    right_ts: np.ndarray,
    tolerance_us: int | None = None,
) -> np.ndarray:
    """Index into the right side for each left row, or -1.

    Both sides must be sorted by ``(key, ts)`` with stable order among
    equal ``(key, ts)`` (so the last duplicate wins, matching pandas).
    Keys are integer codes (factorize string conv_ids first) or any
    sortable numpy dtype.

    Implementation: ``np.searchsorted`` twice — once to locate each
    key's contiguous span on the right (galloping over key boundaries),
    once per key-run on the left to binary-search its timestamps into
    the right span. The per-key-run loop is over *distinct keys present
    in the left partition* (bounded by partition size / conversation
    granularity), with all row-level work vectorized.
    """
    n = len(left_ts)
    out = np.full(n, -1, dtype=np.int64)
    if n == 0 or len(right_ts) == 0:
        return out

    # Contiguous runs of equal key on the left.
    run_starts = np.flatnonzero(
        np.concatenate(([True], left_keys[1:] != left_keys[:-1]))
    )
    run_ends = np.append(run_starts[1:], n)
    run_keys = left_keys[run_starts]

    # Right-side span per left run (vectorized over runs).
    r_lo = np.searchsorted(right_keys, run_keys, side="left")
    r_hi = np.searchsorted(right_keys, run_keys, side="right")

    for s, e, lo, hi in zip(run_starts, run_ends, r_lo, r_hi):
        if lo == hi:
            continue  # key absent on the right
        pos = np.searchsorted(right_ts[lo:hi], left_ts[s:e], side="right") - 1
        idx = np.where(pos >= 0, pos + lo, -1)
        out[s:e] = idx

    if tolerance_us is not None:
        matched = out >= 0
        taken_ts = right_ts[np.where(matched, out, 0)]
        too_old = matched & ((left_ts - taken_ts) > tolerance_us)
        out[too_old] = -1
    return out


def window_rank(
    right_keys: np.ndarray,
    right_ts: np.ndarray,
    left_keys: np.ndarray,
    left_ts: np.ndarray,
) -> np.ndarray:
    """For each left row: the number of right rows lexicographically
    <= ``(key, ts)`` (right rows tie-break BEFORE left rows at equal
    (key, ts), so equal timestamps count as included). Both sides may
    be in any order; O((n+m) log(n+m)) with no Python loop.

    Two ranks at shifted timestamps bound a trailing interval: rows in
    ``(ts - w, ts]`` = rank(ts) - rank(ts - w) — the range-join kernel
    (``preceding-sibling`` generalized from [1] to a time window)."""
    n_r, n_l = len(right_keys), len(left_keys)
    codes = np.concatenate([right_keys, left_keys])
    ts = np.concatenate([right_ts, left_ts])
    src = np.concatenate(
        [np.zeros(n_r, dtype=np.int8), np.ones(n_l, dtype=np.int8)]
    )
    perm = np.lexsort((src, ts, codes))
    is_r = src[perm] == 0
    cum = np.cumsum(is_r)
    lpos = np.flatnonzero(~is_r)
    out = np.empty(n_l, dtype=np.int64)
    out[perm[lpos] - n_r] = cum[lpos]
    return out


def range_count_sum(
    left_keys: np.ndarray,
    left_ts: np.ndarray,
    right_keys: np.ndarray,
    right_ts: np.ndarray,
    right_vals: np.ndarray,
    window: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Per left row: count and sum of right rows of the same key with
    ``ts' in (ts - window, ts]``. The RIGHT side must be sorted by
    (key, ts) (its prefix sums are taken in that order); the left side
    may be in any order. Exact for integer ``right_vals`` (cents)."""
    hi = window_rank(right_keys, right_ts, left_keys, left_ts)
    lo = window_rank(right_keys, right_ts, left_keys, left_ts - window)
    prefix = np.concatenate(([0], np.cumsum(right_vals)))
    return hi - lo, prefix[hi] - prefix[lo]


def asof_forward_indices(
    left_keys: np.ndarray,
    left_ts: np.ndarray,
    right_keys: np.ndarray,
    right_ts: np.ndarray,
    tolerance_us: int | None = None,
) -> np.ndarray:
    """Forward as-of: for each left row, the right row of the same key
    with the SMALLEST ``ts' >= ts`` (among duplicate right timestamps
    the FIRST in sort order wins, matching
    ``pandas.merge_asof(direction="forward")``); -1 for no match.

    Forward selection is anti-causal — it reads the future — so it is
    for LABELS (e.g. "next purchase after this turn"), never for
    point-in-time features; name outputs ``next_*``/``lead_*`` so the
    leakage tests can assert on the feature set. Same sortedness
    contract as :func:`asof_backward_indices`."""
    n = len(left_ts)
    out = np.full(n, -1, dtype=np.int64)
    if n == 0 or len(right_ts) == 0:
        return out

    run_starts = np.flatnonzero(
        np.concatenate(([True], left_keys[1:] != left_keys[:-1]))
    )
    run_ends = np.append(run_starts[1:], n)
    run_keys = left_keys[run_starts]

    r_lo = np.searchsorted(right_keys, run_keys, side="left")
    r_hi = np.searchsorted(right_keys, run_keys, side="right")

    for s, e, lo, hi in zip(run_starts, run_ends, r_lo, r_hi):
        if lo == hi:
            continue
        pos = np.searchsorted(right_ts[lo:hi], left_ts[s:e], side="left")
        idx = np.where(pos < (hi - lo), pos + lo, -1)
        out[s:e] = idx

    if tolerance_us is not None:
        matched = out >= 0
        taken_ts = right_ts[np.where(matched, out, 0)]
        too_far = matched & ((taken_ts - left_ts) > tolerance_us)
        out[too_far] = -1
    return out


def asof_nearest_indices(
    left_keys: np.ndarray,
    left_ts: np.ndarray,
    right_keys: np.ndarray,
    right_ts: np.ndarray,
    tolerance_us: int | None = None,
) -> np.ndarray:
    """Nearest as-of: the right row minimizing ``|ts' - ts|``; backward
    wins ties, matching ``pandas.merge_asof(direction="nearest")``."""
    back = asof_backward_indices(left_keys, left_ts, right_keys, right_ts)
    fwd = asof_forward_indices(left_keys, left_ts, right_keys, right_ts)
    if len(right_ts) == 0:
        return back
    b_ok, f_ok = back >= 0, fwd >= 0
    b_dist = np.where(b_ok, left_ts - right_ts[np.where(b_ok, back, 0)], 0)
    f_dist = np.where(f_ok, right_ts[np.where(f_ok, fwd, 0)] - left_ts, 0)
    use_fwd = f_ok & (~b_ok | (f_dist < b_dist))
    out = np.where(use_fwd, fwd, back)
    if tolerance_us is not None:
        matched = out >= 0
        dist = np.where(use_fwd, f_dist, b_dist)
        out = np.where(matched & (dist <= tolerance_us), out, -1)
    return out
