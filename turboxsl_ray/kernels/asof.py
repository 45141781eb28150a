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
