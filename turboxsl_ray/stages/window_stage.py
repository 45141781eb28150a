"""Windowed feature stage: lag/lead, gaps, sessionization, backfill,
trailing rolling aggregates — spec-driven, one pass per partition.

The spec is compiled ONCE (driver side) into a closure of kernel
calls — the analog of turboxsl compiling every XPath expression once
into a cached AST (/root/reference/src/xpath.c:37-51) instead of
re-parsing per node.

Point-in-time guarantee: every feature column emitted here reads only
rows at ``ts' <= ts`` within the same conversation (lag / gap /
session / ffill / rolling). ``leads`` are forward-looking by design
(labels), named ``lead_*`` so leakage tests can assert on the feature
set.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from turboxsl_ray.kernels import windows as W
from turboxsl_ray.stages.partitioning import sort_block


@dataclass(frozen=True)
class WindowSpec:
    """Which window features to compute. All trailing (past-only)
    except ``leads``."""

    lags: tuple = ()          # ((col, k), ...)
    leads: tuple = ()         # ((col, k), ...)
    gap: bool = True          # gap_us: int64 ts delta to previous turn
    session_gap_us: int | None = None  # adds session_idx (+ session_new)
    ffill_cols: tuple = ()    # ({col} -> {col}_ffill backfill)
    rolling: tuple = ()       # ((col, k, "sum"|"mean"|"count"), ...)
    turn_pos: bool = False    # 0-based position within conv after sort

    def column_names(self) -> list[str]:
        out = [f"lag_{c}_{k}" for c, k in self.lags]
        out += [f"lead_{c}_{k}" for c, k in self.leads]
        if self.gap:
            out.append("gap_us")
        if self.session_gap_us is not None:
            out += ["session_new", "session_idx"]
        out += [f"{c}_ffill" for c in self.ffill_cols]
        out += [f"roll_{agg}_{k}_{c}" for c, k, agg in self.rolling]
        if self.turn_pos:
            out.append("turn_pos")
        return out


def make_window_fn(
    spec: WindowSpec,
    presorted: bool = False,
    segment_keys: tuple = ("conv_id",),
) -> Callable[[pa.Table], pa.Table]:
    """Compile a WindowSpec to a per-partition Arrow->Arrow function.

    ``segment_keys`` is ``("conv_id", "salt")`` for salted (skew-split)
    runs — each salt bucket is its own window segment, fed boundary
    replicas by stages/salting.py.
    """

    def fn(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl
        if not presorted:
            tbl = sort_block(
                tbl, keys=[*segment_keys, "ts", "turn_idx"]
            )
        starts = W.segment_starts_from_arrow(tbl[segment_keys[0]])
        for key in segment_keys[1:]:
            starts |= W.segment_starts_from_arrow(tbl[key])
        ts_us = tbl["ts"].cast(pa.int64()).combine_chunks().to_numpy()

        cols: dict[str, pa.Array] = {}
        for col, k in spec.lags:
            idx = W.lag_indices(starts, k)
            cols[f"lag_{col}_{k}"] = W.take_with_null(tbl[col].combine_chunks(), idx)
        for col, k in spec.leads:
            idx = W.lead_indices(starts, k)
            cols[f"lead_{col}_{k}"] = W.take_with_null(tbl[col].combine_chunks(), idx)
        if spec.gap:
            gaps, gvalid = W.gap_us(starts, ts_us)
            cols["gap_us"] = pa.array(gaps, type=pa.int64(), mask=~gvalid)
        if spec.session_gap_us is not None:
            new_s, sess = W.session_index(starts, ts_us, spec.session_gap_us)
            cols["session_new"] = pa.array(new_s, type=pa.bool_())
            cols["session_idx"] = pa.array(sess, type=pa.int64())
        for col in spec.ffill_cols:
            arr = tbl[col].combine_chunks()
            valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
            idx = W.ffill_indices(starts, valid)
            cols[f"{col}_ffill"] = W.take_with_null(arr, idx)
        for col, k, agg in spec.rolling:
            v = tbl[col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
            if agg == "sum":
                out = pa.array(W.rolling_sum(starts, v, k), type=pa.float64())
            elif agg == "mean":
                out = pa.array(W.rolling_mean(starts, v, k), type=pa.float64())
            elif agg == "count":
                out = pa.array(
                    W.rolling_count(starts, ~np.isnan(v), k), type=pa.int64()
                )
            else:
                raise ValueError(f"unknown rolling agg {agg!r}")
            cols[f"roll_{agg}_{k}_{col}"] = out
        if spec.turn_pos:
            cols["turn_pos"] = pa.array(W.cumcount(starts), type=pa.int64())

        for name, arr in cols.items():
            tbl = tbl.append_column(name, arr)
        return tbl

    return fn
