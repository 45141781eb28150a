"""Global total order with exact ranks — the scalable two-pass plan.

``xsl:sort`` produces a totally ordered selection with fresh 1-based
positions (/root/reference/src/xpath.c:484-576, re-numbering at
:560-567 — via bubble sort under a mutex). At 10^12 rows a global sort
must never funnel through one worker; the classic plan:

1. SAMPLE: per-block stride samples of the key → driver picks
   ``num_ranges - 1`` ascending split points (balance only — never
   correctness).
2. COUNT: per-block partial counts per range → driver computes exact
   global range offsets (tiny: blocks × ranges numbers move).
3. PLACE: tag each row with its range id (all equal keys land in ONE
   range by construction), hash-repartition by range id, sort each
   range block, rank = range offset + local position.

Equal keys are broken by the ``tiebreak`` column, so ranks are total
and deterministic — the reference's ordered-result-slot guarantee
(instructions.c:131-143) without any shared mutable slot array.

``sorted_with_prefix_sum`` reuses the same sample/count/place
scaffolding with per-range WEIGHT sums instead of row counts — the
distributed prefix sum behind token-budget shard assignment.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from turboxsl_ray.context import adaptive_partitions
from turboxsl_ray.kernels.arrays import as_array
from turboxsl_ray.stages.aggregate import broadcast, collect_tables
from turboxsl_ray.stages.partitioning import map_partitions, partition_by_conv

RANGE_COL = "__range"


def _sample_bounds(ds_factory, keyvals, num_ranges: int | None, sample_stride: int):
    """Pass 1a shared by both plans: stride-sample keys per block,
    pick ascending split points (balance heuristic, never
    correctness). Returns (bounds, rid_of) where ``rid_of(t)`` assigns
    each row its range id via the broadcast bounds.

    ``num_ranges=None`` sizes the range count from the bytes the
    sample pass actually scanned (each block reports its ``nbytes``
    alongside its key samples), so one range ≈ one shuffle partition's
    worth of data at any input scale — a constant count would put
    1/constant of a 100 TB input in a single sort task."""
    import ray

    def sample_block(t: pa.Table) -> pa.Table:
        k = keyvals(t)[::sample_stride]
        nb = np.zeros(len(k), dtype=np.int64)
        if len(nb):
            nb[0] = t.nbytes
        return pa.table({"k": pa.array(k, type=pa.float64()), "nb": pa.array(nb)})

    sampled = collect_tables(map_partitions(ds_factory(), sample_block))
    samples = np.sort(
        np.concatenate([t["k"].to_numpy() for t in sampled] or [np.zeros(1)])
    )
    if num_ranges is None:
        total_nb = int(sum(int(t["nb"].to_numpy().sum()) for t in sampled))
        num_ranges = adaptive_partitions(total_nb)
    qs = np.linspace(0, 1, num_ranges + 1)[1:-1]
    bounds = np.unique(np.quantile(samples, qs)) if len(samples) else np.array([])
    bref = broadcast(bounds)

    def rid_of(t: pa.Table) -> np.ndarray:
        return np.searchsorted(ray.get(bref), keyvals(t), side="right")

    return bounds, rid_of


def _place_by_range(ds_factory, rid_of, bounds) -> Dataset:
    """Pass 2 entry shared by both plans: tag rows with their range id
    and exchange by it (all equal keys land in one range)."""

    def place(t: pa.Table) -> pa.Table:
        return t.append_column(
            RANGE_COL, pa.array(rid_of(t).astype(np.int64))
        )

    placed = map_partitions(ds_factory(), place)
    return partition_by_conv(placed, max(len(bounds) + 1, 1), keys=[RANGE_COL])


def sorted_with_rank(
    ds_factory,
    *,
    key: str,
    tiebreak: str,
    descending: bool = False,
    num_ranges: int | None = None,
    sample_stride: int = 101,
) -> Dataset:
    """Rank every row under total order (key, tiebreak); appends an
    int64 1-based ``rank`` column. ``num_ranges=None`` (default)
    derives the range count from the sampled input bytes.

    ``ds_factory``: zero-arg callable returning the input Dataset —
    the plan scans the input twice (sample+count, then place), and a
    fresh Dataset per pass keeps both streaming.
    """
    import ray

    sign = -1.0 if descending else 1.0

    def keyvals(t: pa.Table) -> np.ndarray:
        return as_array(t[key]).to_numpy(zero_copy_only=False).astype(np.float64) * sign

    bounds, rid_of = _sample_bounds(ds_factory, keyvals, num_ranges, sample_stride)

    # -- pass 1b: exact per-range counts → global offsets
    def count_block(t: pa.Table) -> pa.Table:
        cnt = np.bincount(rid_of(t), minlength=len(bounds) + 1)
        return pa.table(
            {"rid": pa.array(np.arange(len(cnt), dtype=np.int64)),
             "n": pa.array(cnt.astype(np.int64))}
        )

    counts = np.zeros(len(bounds) + 1, dtype=np.int64)
    for t in collect_tables(map_partitions(ds_factory(), count_block)):
        counts[t["rid"].to_numpy()] += t["n"].to_numpy()
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    oref = broadcast(offsets)

    parts = _place_by_range(ds_factory, rid_of, bounds)

    order = "descending" if descending else "ascending"

    def rank_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.drop_columns([RANGE_COL]).append_column(
                "rank", pa.array([], pa.int64())
            )
        offs = ray.get(oref)
        # tiebreak stays ASCENDING regardless of key direction (matches
        # ROW_NUMBER() OVER (ORDER BY key DESC, tiebreak))
        t = t.sort_by([(RANGE_COL, "ascending"), (key, order), (tiebreak, "ascending")])
        rid = as_array(t[RANGE_COL]).to_numpy()
        # local position within each contiguous range run
        starts = np.concatenate(([True], rid[1:] != rid[:-1]))
        idx = np.arange(len(rid), dtype=np.int64)
        seg_first = np.maximum.accumulate(np.where(starts, idx, 0))
        rank = offs[rid] + (idx - seg_first) + 1
        return t.drop_columns([RANGE_COL]).append_column(
            "rank", pa.array(rank, type=pa.int64())
        )

    return map_partitions(parts, rank_block)


def sorted_with_prefix_sum(
    ds_factory,
    *,
    key: str,
    weight: str,
    num_ranges: int = 8,
    sample_stride: int = 101,
) -> Dataset:
    """Exclusive running total of ``weight`` under global ``key`` order
    (the distributed prefix-sum): appends an int64 ``prefix`` column =
    sum of weights of all strictly-earlier rows. Same two-pass plan as
    ``sorted_with_rank`` with per-range WEIGHT sums instead of counts;
    ``key`` must be unique (ids), so order is total without a
    tiebreak. Powers token-budget shard assignment: shard_id =
    prefix // budget."""
    import ray

    def keyvals(t: pa.Table) -> np.ndarray:
        return as_array(t[key]).to_numpy(zero_copy_only=False).astype(np.float64)

    bounds, rid_of = _sample_bounds(ds_factory, keyvals, num_ranges, sample_stride)

    # -- pass 1b: exact per-range weight totals → global offsets
    def weight_block(t: pa.Table) -> pa.Table:
        w = as_array(t[weight]).to_numpy(zero_copy_only=False).astype(np.int64)
        sums = np.bincount(
            rid_of(t), weights=w, minlength=len(bounds) + 1
        ).astype(np.int64)
        return pa.table(
            {"rid": pa.array(np.arange(len(sums), dtype=np.int64)),
             "w": pa.array(sums)}
        )

    totals = np.zeros(len(bounds) + 1, dtype=np.int64)
    for t in collect_tables(map_partitions(ds_factory(), weight_block)):
        totals[t["rid"].to_numpy()] += t["w"].to_numpy()
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1]))
    oref = broadcast(offsets)

    parts = _place_by_range(ds_factory, rid_of, bounds)

    def prefix_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.drop_columns([RANGE_COL]).append_column(
                "prefix", pa.array([], pa.int64())
            )
        offs = ray.get(oref)
        t = t.sort_by([(RANGE_COL, "ascending"), (key, "ascending")])
        rid = as_array(t[RANGE_COL]).to_numpy()
        w = as_array(t[weight]).to_numpy(zero_copy_only=False).astype(np.int64)
        cs = np.concatenate(([0], np.cumsum(w)[:-1]))  # exclusive, block-wide
        starts = np.concatenate(([True], rid[1:] != rid[:-1]))
        idx = np.arange(len(rid), dtype=np.int64)
        seg_first = np.maximum.accumulate(np.where(starts, idx, 0))
        prefix = offs[rid] + (cs - cs[seg_first])
        return t.drop_columns([RANGE_COL]).append_column(
            "prefix", pa.array(prefix, type=pa.int64())
        )

    return map_partitions(parts, prefix_block)
