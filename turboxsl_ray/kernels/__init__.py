"""Pure numpy/pyarrow compute kernels — no Ray dependency.

Every kernel operates on a *partition*: arrays for rows sorted by
``(conv_id, ts, turn_idx)`` where each conversation is a contiguous
"segment". Kernels are O(n) vectorized; no Python loop over rows.
"""
