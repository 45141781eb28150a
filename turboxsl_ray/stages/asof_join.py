"""Distributed point-in-time (as-of, backward) join.

Strategy — ONE shuffle, no per-row work:

1. align both sides to a common schema, tagging rows ``__src`` (0 =
   right/feature side, 1 = left/transcript side);
2. ``union`` the two Datasets (streaming, no materialization);
3. hash co-partition by the ``by`` key (``repartition(keys=[by])``) so
   each conversation's rows from BOTH sides share a block;
4. per block: stable sort by ``(by, on, __src[, seq])`` — right rows
   sort before left rows at equal ts (backward-inclusive semantics) —
   then forward-fill the right-side row index within each key segment
   (kernels.windows.ffill_indices) and gather the right value columns
   onto the left rows.

Matches ``pandas.merge_asof(left.sort_values(on), right.sort_values(on),
by=by, on=on, direction="backward")``; among duplicate right ``(by,
on)`` rows the one with the greatest ``seq`` wins when ``right_seq_col``
is given (pandas analog: last row in right's sort order).

Reference analog: the ``key()`` lookup the reference re-scans linearly
per call (/root/reference/src/functions.c:1115-1165; "better match
strategies where linear search is used", TODO:15) and
``preceding-sibling::x[1]`` "latest earlier sibling"
(src/xpath.c:359-372) — re-expressed as a co-partitioned sort-merge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from turboxsl_ray.kernels import windows as W
from turboxsl_ray.kernels.asof import asof_backward_indices
from turboxsl_ray.stages.partitioning import map_partitions, partition_by_conv

SRC_COL = "__src"


def _align(
    tbl: pa.Table,
    out_names: list[str],
    out_types: dict[str, pa.DataType],
    src: int,
) -> pa.Table:
    n = tbl.num_rows
    cols = []
    for name in out_names:
        if name == SRC_COL:
            cols.append(pa.array(np.full(n, src, dtype=np.int8)))
        elif name in tbl.column_names:
            cols.append(tbl[name].cast(out_types[name]))
        else:
            cols.append(pa.nulls(n, type=out_types[name]))
    return pa.table(dict(zip(out_names, cols)))


def asof_join_datasets(
    left: Dataset,
    right: Dataset,
    *,
    on: str = "ts",
    by: str = "conv_id",
    num_partitions: int = 16,
    tolerance_us: int | None = None,
    right_seq_col: str | None = None,
) -> Dataset:
    """Backward as-of join ``left`` (transcripts) with ``right``
    (feature observations) on ``(by, on)``. Returns left rows plus the
    right side's value columns (null where no earlier observation).
    """
    def _arrow_schema(ds: Dataset) -> pa.Schema:
        s = ds.schema()
        base = getattr(s, "base_schema", s)
        if not isinstance(base, pa.Schema):
            base = pa.schema(list(zip(s.names, s.types)))
        return base

    lschema = _arrow_schema(left)
    rschema = _arrow_schema(right)
    lnames = list(lschema.names)
    rvalue_names = [n for n in rschema.names if n not in (by, on)]
    overlap = set(lnames) & set(rvalue_names)
    if overlap:
        raise ValueError(f"right value columns collide with left: {sorted(overlap)}")

    out_names = lnames + rvalue_names + [SRC_COL]
    out_types: dict[str, pa.DataType] = {}
    for n in lnames:
        out_types[n] = lschema.field(n).type
    for n in rvalue_names:
        out_types[n] = rschema.field(n).type
    out_types[SRC_COL] = pa.int8()

    lal = left.map_batches(
        lambda t: _align(t, out_names, out_types, 1),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ral = right.map_batches(
        lambda t: _align(t, out_names, out_types, 0),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    combined = lal.union(ral)
    combined = partition_by_conv(combined, num_partitions, keys=[by])

    sort_keys = [by, on, SRC_COL] + ([right_seq_col] if right_seq_col else [])

    def block_fn(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl.drop_columns([SRC_COL])
        tbl = tbl.sort_by([(k, "ascending") for k in sort_keys])
        starts = W.segment_starts_from_arrow(tbl[by])
        src = tbl[SRC_COL].combine_chunks().to_numpy(zero_copy_only=False)
        is_right = src == 0
        ffi = W.ffill_indices(starts, is_right)
        if tolerance_us is not None:
            ts_us = tbl[on].cast(pa.int64()).combine_chunks().to_numpy()
            matched = ffi >= 0
            r_ts = ts_us[np.where(matched, ffi, 0)]
            ffi = np.where(matched & ((ts_us - r_ts) <= tolerance_us), ffi, -1)
        left_mask = ~is_right
        out_cols = {}
        for name in lnames:
            out_cols[name] = tbl[name].combine_chunks().filter(pa.array(left_mask))
        for name in rvalue_names:
            gathered = W.take_with_null(tbl[name].combine_chunks(), ffi)
            out_cols[name] = gathered.filter(pa.array(left_mask))
        return pa.table(out_cols)

    return map_partitions(combined, block_fn)


def asof_join_tables(
    left: pa.Table,
    right: pa.Table,
    *,
    on: str = "ts",
    by: str = "conv_id",
    tolerance_us: int | None = None,
) -> pa.Table:
    """In-memory as-of join of two Arrow tables (both arbitrary order).

    Single-node path used by tests and by per-partition joins where
    both sides are already co-located. Uses the galloping
    binary-search kernel (kernels/asof.py) directly.
    """
    left_sorted = left.sort_by([(by, "ascending"), (on, "ascending")])
    right_sorted = right.sort_by([(by, "ascending"), (on, "ascending")])

    from turboxsl_ray.kernels.arrays import as_array

    lk = as_array(left_sorted[by])
    rk = as_array(right_sorted[by])
    # factorize keys into a shared code space via one dictionary encode
    both = pa.concat_arrays([lk, rk]).dictionary_encode()
    codes = both.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    lcodes, rcodes = codes[: len(lk)], codes[len(lk):]
    lts = left_sorted[on].cast(pa.int64()).combine_chunks().to_numpy()
    rts = right_sorted[on].cast(pa.int64()).combine_chunks().to_numpy()

    # dictionary codes are assigned in first-appearance order, not sorted
    # order — re-sort both sides by (code, ts) to restore the kernel's
    # precondition.
    lperm = np.lexsort((lts, lcodes))
    rperm = np.lexsort((rts, rcodes))
    idx = asof_backward_indices(
        lcodes[lperm], lts[lperm], rcodes[rperm], rts[rperm], tolerance_us
    )
    # undo the left permutation; map right indices back through rperm
    back = np.empty_like(lperm)
    back[lperm] = np.arange(len(lperm))
    idx_orig = np.where(idx >= 0, rperm[np.where(idx >= 0, idx, 0)], -1)[back]

    out = left_sorted
    rvalue_names = [n for n in right.column_names if n not in (by, on)]
    for name in rvalue_names:
        out = out.append_column(
            name, W.take_with_null(right_sorted[name].combine_chunks(), idx_orig)
        )
    return out
