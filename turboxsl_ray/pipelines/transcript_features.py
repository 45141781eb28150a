"""Oracle-checkable point-in-time feature queries over transcripts.

The driver's testdata has no transcripts table, so each query first
*derives* one deterministically from ``events`` (conv_id = user_id,
turn order = (ts, event_id)) — the Ray derivation here and the SQL
derivation in :data:`DERIVE_SQL` are contractually identical.

Physical shape of every query (the 100 TB-honest plan):

    read events (columns pruned) → ONE hash shuffle by conv →
    one fused block fn: sort → derive → window math → (tiny) output

All window/as-of math is partition-local after the single exchange;
nothing re-blocks between the shuffle and the fused block fn, so a
conversation can never straddle workers. The kernels are the same
segment-vectorized O(n) routines the flagship pipeline uses
(kernels/windows.py, kernels/asof.py) — the reference's sibling-axis
navigation re-expressed (/root/reference/src/xpath.c:359-428).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

import ray.data

from turboxsl_ray.kernels import windows as W
from turboxsl_ray.context import partitions_for_input
from turboxsl_ray.kernels.arrays import as_array
from turboxsl_ray.kernels.asof import asof_backward_indices
from turboxsl_ray.stages.partitioning import map_partitions, partition_by_conv

SESSION_GAP_US = 15 * 60 * 1_000_000
TOOL_ROLES = ("click", "purchase")

def _reduceat(v: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """np.add.reduceat that tolerates an empty block."""
    if len(idx) == 0:
        return np.empty(0, dtype=np.float64 if v.dtype.kind == "f" else v.dtype)
    return np.add.reduceat(v, idx)


DERIVE_SQL = """
    SELECT CAST(user_id AS VARCHAR) AS conv_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
           event_type AS role,
           props AS text,
           CASE WHEN event_type IN ('click', 'purchase') THEN event_type END AS tool,
           ts,
           value
    FROM events
"""


def read_events(sf_dir: str, columns: list[str] | None = None) -> Dataset:
    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def derive_block(tbl: pa.Table) -> pa.Table:
    """events rows (one whole-conv block) → sorted transcript rows.

    MUST stay semantically identical to :data:`DERIVE_SQL`.
    """
    tbl = tbl.sort_by(
        [("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")]
    )
    starts = W.segment_starts_from_arrow(tbl["user_id"])
    turn_idx = W.cumcount(starts).astype(np.int32)
    role = as_array(tbl["event_type"])
    tool = pc.if_else(
        pc.is_in(role, value_set=pa.array(list(TOOL_ROLES))),
        role,
        pa.scalar(None, pa.string()),
    )
    cols: dict[str, pa.Array] = {
        "conv_id": as_array(pc.cast(tbl["user_id"], pa.string())),
        "turn_idx": pa.array(turn_idx, type=pa.int32()),
        "role": role,
    }
    if "props" in tbl.column_names:
        cols["text"] = as_array(tbl["props"])
    cols["tool"] = tool
    cols["ts"] = as_array(tbl["ts"])
    if "value" in tbl.column_names:
        cols["value"] = as_array(tbl["value"])
    return pa.table(cols)


# sf_dir -> parquet dir holding an already-derived transcripts table
# whose FILES are aligned to conv-hash partitions (one file per final
# block of transcripts_pipeline). Registered explicitly by
# materialize_derived(); used only by benchmarking/batch harnesses that
# run MANY transcript queries over one sf_dir — the product path (and
# the driver's correctness gate) always derives.
_DERIVED_DIRS: dict[str, str] = {}


def materialize_derived(
    sf_dir: str, out_dir: str, *, num_partitions: int | None = None,
    max_attempts: int = 2,
) -> str | None:
    """Run the events→transcripts derivation ONCE, write it as
    conv-partition-aligned parquet shards, and register it so later
    ``transcripts_pipeline(sf_dir)`` calls skip the events read, the
    conv hash-shuffle, and the derive (bench hygiene: per-query times
    then measure the OPERATOR, not the shared derive).

    The no-shuffle read-back (:func:`_read_derived`) is one task per
    cache FILE, so block boundaries are exactly file boundaries by
    construction. Files in turn are conv-disjoint because the derive's
    hash exchange put each conversation wholly in one partition — the
    only way a conversation can straddle two files is Ray's output
    builder splitting a partition larger than
    ``DataContext.target_max_block_size`` at write time. Registration
    VALIDATES that via the identical per-file read; on failure it
    SELF-HEALS: rewrite the cache with enough partitions that every
    file sits well under the block-size ceiling, re-validate, and if a
    cache still cannot be aligned (e.g. one conversation alone exceeds
    the ceiling) log and return ``None`` WITHOUT registering — queries
    then use the always-correct derive path below. Never raises for a
    misaligned cache; a bad cache costs speed, not answers."""
    import math
    import shutil
    import warnings

    from turboxsl_ray.context import on_disk_nbytes

    from ray.data import DataContext

    target = DataContext.get_current().target_max_block_size or (128 << 20)
    nparts = num_partitions
    for _ in range(max_attempts):
        shutil.rmtree(out_dir, ignore_errors=True)
        transcripts_pipeline(sf_dir, num_partitions=nparts).write_parquet(out_dir)
        try:
            _validate_conv_alignment(out_dir)
        except ValueError:
            # size the rewrite from the cache actually on disk: parquet
            # decodes to several x its compressed bytes (factor 8 is
            # deliberately generous), and a quarter-of-ceiling file can
            # never trip the output builder's split
            disk = on_disk_nbytes(out_dir) or 0
            need = math.ceil(max(1, disk * 8) / max(1, target // 4))
            nparts = max(need, 2 * (nparts or 1), 4)
            continue
        _DERIVED_DIRS[sf_dir] = out_dir
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    warnings.warn(
        f"derived transcript cache for {sf_dir} could not be "
        "conv-aligned after rewrite; skipping registration — queries "
        "fall back to the (always-correct) fused derive path"
    )
    return None


def _read_derived(
    cached: str, fn: Callable[[pa.Table], pa.Table] | None = None
) -> Dataset:
    """THE cached read-back: one task per cache file, the file read
    WHOLE inside the task, ``fn`` fused onto the loaded table.

    This deliberately avoids ``read_parquet`` + ``map_batches`` fusion:
    a fused ReadParquet→MapBatches hands the map fn the reader's
    internal yield chunks (~10k rows), NOT whole files — measured at
    sf0.1/32 CPUs, where it split conversations mid-block and round 4's
    validator killed the bench. Registration-time validation and the
    cached query path both go through THIS function, so the validated
    blocking is exactly the one queries see."""
    import os

    files = sorted(
        os.path.join(cached, f)
        for f in os.listdir(cached)
        if f.endswith(".parquet")
    )
    if not files:
        raise ValueError(f"derived transcript cache at {cached} is empty")

    def load(t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        # ≥2 paths per block would only ever CONCATENATE whole files
        # (safe: files are conv-disjoint); splitting cannot happen here
        tab = pa.concat_tables(
            pq.read_table(p) for p in t["item"].to_pylist()
        )
        return tab if fn is None else fn(tab)

    items = ray.data.from_items(files, override_num_blocks=len(files))
    return map_partitions(items, load)


def _validate_conv_alignment(cached: str) -> None:
    """Raise unless every conversation is wholly contained in one
    read-back block. Each block contributes its DISTINCT conv hashes
    (uint64, collision odds ~n_convs²/2⁶⁴ and a collision can only
    cause a false ALARM); blocks are disjoint iff the global distinct
    count equals the sum of per-block distinct counts. Driver-side
    state is one int64 set of conversation-count size — tiny next to
    the turn-level data, and this runs once per cache registration."""
    from turboxsl_ray.kernels.hashing import stable_hash64

    def block_convs(t: pa.Table) -> pa.Table:
        u = np.unique(stable_hash64(t["conv_id"]))
        return pa.table({"h": pa.array(u.astype(np.int64))})

    seen: set[int] = set()
    total = 0
    for b in _read_derived(cached, block_convs).iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        h = b["h"].to_pylist()
        total += len(h)
        seen.update(h)
    if len(seen) != total:
        raise ValueError(
            f"derived transcript cache at {cached} is misaligned: "
            f"{total - len(seen)} conversation(s) straddle a file "
            "boundary (the write split a partition larger than the "
            "block-size ceiling) — rewrite with more partitions"
        )


def clear_derived_cache() -> None:
    _DERIVED_DIRS.clear()


def transcripts_pipeline(
    sf_dir: str,
    block_fn: Callable[[pa.Table], pa.Table] | None = None,
    columns: list[str] | None = None,
    num_partitions: int | None = None,
) -> Dataset:
    """events → one conv-hash shuffle → fused derive(+feature) blocks."""
    cached = _DERIVED_DIRS.get(sf_dir)
    if cached is not None:
        # the same per-file read materialize_derived validated for
        # conv-block alignment (whole conversations per block, no
        # exchange needed); block_fn fuses onto the in-task file load

        def reblock(t: pa.Table) -> pa.Table:
            t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
            return t if block_fn is None else block_fn(t)

        return _read_derived(cached, reblock)
    ds = read_events(sf_dir, columns=columns)
    parts = partition_by_conv(
        ds,
        num_partitions or partitions_for_input(f"{sf_dir}/events.parquet"),
        keys=["user_id"],
    )
    if block_fn is None:
        return map_partitions(parts, derive_block)
    return map_partitions(parts, lambda t: block_fn(derive_block(t)))


# --------------------------------------------------------------------------
# queries — each returns a Dataset; SQL oracles live in registry.py
# --------------------------------------------------------------------------

def q_transcripts(sf_dir: str) -> Dataset:
    """The derivation itself (per-turn text byte-equality surface)."""
    return transcripts_pipeline(sf_dir)


def q_window_ranks(sf_dir: str) -> Dataset:
    """Per-conversation rank functions: RANK/PERCENT_RANK/CUME_DIST
    over ``value`` (SQL tie semantics, kernels/windows.rank_in_segments)
    and NTILE(4) over turn order — all block-local after the one conv
    exchange. Nulls rank first via a COALESCE sentinel (mirrored in
    the oracle)."""

    def feats(t: pa.Table) -> pa.Table:
        starts = W.segment_starts_from_arrow(t["conv_id"])
        v = (
            as_array(pc.coalesce(t["value"], pa.scalar(-1e18)))
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        rank, dense, pct, cume = W.rank_in_segments(starts, v)
        return pa.table(
            {
                "conv_id": as_array(t["conv_id"]),
                "turn_idx": as_array(t["turn_idx"]),
                "value": as_array(t["value"]),
                "value_rank": pa.array(rank),
                "value_dense_rank": pa.array(dense),
                "value_pct_rank": pa.array(np.round(pct, 6)),
                "value_cume_dist": pa.array(np.round(cume, 6)),
                "turn_quartile": pa.array(W.ntile_in_segments(starts, 4)),
            }
        )

    return transcripts_pipeline(
        sf_dir, feats, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )


def q_first_last(sf_dir: str) -> Dataset:
    """FIRST_VALUE / LAST_VALUE / NTH_VALUE(2) over the whole-
    conversation frame plus a running (unbounded-preceding) sum —
    the head/tail/position() picks of SURVEY §2.6 (``last()``
    functions.c:147-158) as window features. The running sum is
    integer cents end-to-end (kernels/arrays.to_cents) and divides
    back once, so reordered-float drift vs the SQL oracle is
    impossible; rows before the first non-null value yield NULL
    (SQL SUM-over-empty-frame semantics)."""
    from turboxsl_ray.kernels.arrays import to_cents

    def feats(t: pa.Table) -> pa.Table:
        starts = W.segment_starts_from_arrow(t["conv_id"])
        v = as_array(t["value"])
        first_i = W.segment_first_index(starts)
        last_i = W.segment_last_index(starts)
        nth_i = np.where(first_i + 1 <= last_i, first_i + 1, -1)
        vals = v.to_numpy(zero_copy_only=False).astype(np.float64)
        isnull = np.isnan(vals)
        cents = to_cents(np.where(isnull, 0.0, vals))
        run = np.cumsum(cents)
        run_in_seg = run - (run[first_i] - cents[first_i])
        nn = np.cumsum(~isnull)
        nn_in_seg = nn - (nn[first_i] - (~isnull[first_i]).astype(np.int64))
        return pa.table(
            {
                "conv_id": as_array(t["conv_id"]),
                "turn_idx": as_array(t["turn_idx"]),
                "value": v,
                "first_value": W.take_with_null(v, first_i),
                "last_value": W.take_with_null(v, last_i),
                "second_value": W.take_with_null(v, nth_i),
                "run_value": pa.array(
                    run_in_seg / 100.0, type=pa.float64(), mask=nn_in_seg == 0
                ),
            }
        )

    return transcripts_pipeline(
        sf_dir, feats, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )


def q_lag_lead(sf_dir: str) -> Dataset:
    """lag/lead features: preceding/following-sibling analogs."""

    def feats(t: pa.Table) -> pa.Table:
        starts = W.segment_starts_from_arrow(t["conv_id"])
        out = {
            "conv_id": as_array(t["conv_id"]),
            "turn_idx": as_array(t["turn_idx"]),
            "value": as_array(t["value"]),
            "lag_value_1": W.take_with_null(as_array(t["value"]), W.lag_indices(starts, 1)),
            "lag_value_2": W.take_with_null(as_array(t["value"]), W.lag_indices(starts, 2)),
            "lead_value_1": W.take_with_null(as_array(t["value"]), W.lead_indices(starts, 1)),
            "lag_role_1": W.take_with_null(as_array(t["role"]), W.lag_indices(starts, 1)),
        }
        return pa.table(out)

    return transcripts_pipeline(
        sf_dir, feats, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )


def _session_arrays(t: pa.Table):
    starts = W.segment_starts_from_arrow(t["conv_id"])
    ts_us = as_array(t["ts"].cast(pa.int64())).to_numpy()
    gaps, gvalid = W.gap_us(starts, ts_us)
    new_s, session_idx = W.session_index(starts, ts_us, SESSION_GAP_US)
    return starts, ts_us, gaps, gvalid, new_s, session_idx


def q_sessionize(sf_dir: str) -> Dataset:
    """Gap-based sessionization (idle threshold 15 min; gap == threshold
    stays in-session)."""

    def feats(t: pa.Table) -> pa.Table:
        _starts, _ts, gaps, gvalid, new_s, session_idx = _session_arrays(t)
        return pa.table(
            {
                "conv_id": as_array(t["conv_id"]),
                "turn_idx": as_array(t["turn_idx"]),
                "gap_us": pa.array(gaps, type=pa.int64(), mask=~gvalid),
                "session_new": pa.array(new_s),
                "session_idx": pa.array(session_idx, type=pa.int64()),
            }
        )

    return transcripts_pipeline(
        sf_dir, feats, columns=["event_id", "ts", "user_id", "event_type"]
    )


def q_backfill(sf_dir: str) -> Dataset:
    """Forward-fill of the last non-null tool at ts' <= ts (backfill)."""

    def feats(t: pa.Table) -> pa.Table:
        starts = W.segment_starts_from_arrow(t["conv_id"])
        tool = as_array(t["tool"])
        valid = pc.is_valid(tool).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "conv_id": as_array(t["conv_id"]),
                "turn_idx": as_array(t["turn_idx"]),
                "tool": tool,
                "tool_ffill": W.take_with_null(tool, W.ffill_indices(starts, valid)),
            }
        )

    return transcripts_pipeline(
        sf_dir, feats, columns=["event_id", "ts", "user_id", "event_type"]
    )


def q_rolling(sf_dir: str) -> Dataset:
    """Trailing 10-row windowed sum/mean within conversation.

    Computed in integer cents (value has 2-decimal precision) so the
    result is EXACT — summation-order and rounding-rule differences
    vs the SQL oracle cannot bite (both sides divide the identical
    integer by the identical double)."""

    def feats(t: pa.Table) -> pa.Table:
        starts = W.segment_starts_from_arrow(t["conv_id"])
        v = as_array(t["value"]).to_numpy(zero_copy_only=False).astype(np.float64)
        cents = np.round(v * 100.0).astype(np.int64)
        csum = W.rolling_sum(starts, cents.astype(np.float64), 10)
        cnt = W.rolling_count(starts, np.ones(len(v), dtype=bool), 10)
        return pa.table(
            {
                "conv_id": as_array(t["conv_id"]),
                "turn_idx": as_array(t["turn_idx"]),
                "roll_sum_10": pa.array(csum / 100.0),
                "roll_mean_10": pa.array(csum / (cnt * 100.0)),
            }
        )

    return transcripts_pipeline(
        sf_dir, feats, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )


ROLL_WINDOW_US = 30 * 60 * 1_000_000  # trailing 30-minute time window


def q_rolling_time(sf_dir: str) -> Dataset:
    """Trailing TIME-window aggregate within conversation: sum/count of
    ``value`` over ``[ts - 30min, ts]`` — SQL ``RANGE BETWEEN INTERVAL
    30 MINUTE PRECEDING AND CURRENT ROW`` semantics including ts-peer
    rows, vs q_rolling's row-count frame. One global searchsorted pair
    per block (kernels/windows.rolling_range_bounds), integer cents
    for summation-order-proof exactness."""

    def feats(t: pa.Table) -> pa.Table:
        starts = W.segment_starts_from_arrow(t["conv_id"])
        ts_us = as_array(t["ts"].cast(pa.int64())).to_numpy()
        v = as_array(t["value"]).to_numpy(zero_copy_only=False).astype(np.float64)
        cents = np.round(v * 100.0).astype(np.int64)
        s, c = W.rolling_range_sum_count(
            starts, ts_us, cents.astype(np.float64), ROLL_WINDOW_US
        )
        return pa.table(
            {
                "conv_id": as_array(t["conv_id"]),
                "turn_idx": as_array(t["turn_idx"]),
                "roll30m_sum": pa.array(s / 100.0),
                "roll30m_n": pa.array(c),
            }
        )

    return transcripts_pipeline(
        sf_dir, feats, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )


def q_asof_join(sf_dir: str) -> Dataset:
    """Point-in-time as-of join: for every turn, the latest purchase
    (ts' <= ts) of the same conversation — backward, leak-free.

    Both sides come out of the same conv-partitioned block, so the
    merge is partition-local (the distributed case with a separate
    right table is exercised by the flagship pipeline / tests)."""

    def feats(t: pa.Table) -> pa.Table:
        conv = as_array(t["conv_id"])
        starts = W.segment_starts_from_arrow(conv)
        conv_codes = np.cumsum(starts) - 1
        ts_us = as_array(t["ts"].cast(pa.int64())).to_numpy()
        role = as_array(t["role"])
        is_p = pc.equal(role, "purchase").to_numpy(zero_copy_only=False)
        val = as_array(t["value"]).to_numpy(zero_copy_only=False)

        # right side: purchases aggregated per (conv, ts) — rows are
        # sorted, so equal (conv, ts) runs are contiguous: reduceat sum
        p_codes = conv_codes[is_p]
        p_ts = ts_us[is_p]
        p_val = val[is_p]
        if len(p_ts):
            rstart = np.concatenate(
                ([True], (p_codes[1:] != p_codes[:-1]) | (p_ts[1:] != p_ts[:-1]))
            )
            ridx = np.flatnonzero(rstart)
            r_codes = p_codes[ridx]
            r_ts = p_ts[ridx]
            r_val = np.round(_reduceat(p_val, ridx), 3)
        else:
            r_codes = np.empty(0, dtype=np.int64)
            r_ts = np.empty(0, dtype=np.int64)
            r_val = np.empty(0, dtype=np.float64)

        idx = asof_backward_indices(conv_codes, ts_us, r_codes, r_ts)
        hit = idx >= 0
        safe = np.where(hit, idx, 0)
        pv = np.where(hit, r_val[safe] if len(r_val) else 0.0, np.nan)
        pts = np.where(hit, r_ts[safe] if len(r_ts) else 0, 0)
        return pa.table(
            {
                "conv_id": conv,
                "turn_idx": as_array(t["turn_idx"]),
                "ts": as_array(t["ts"]),
                "purchase_ts": pa.array(pts, type=pa.int64(), mask=~hit).cast(
                    pa.timestamp("us")
                ),
                "purchase_value": pa.array(pv, type=pa.float64(), mask=~hit),
            }
        )

    return transcripts_pipeline(
        sf_dir, feats, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )


def q_asof_forward(sf_dir: str) -> Dataset:
    """FORWARD as-of (label join): for every turn, the NEXT purchase
    (smallest ts' >= ts) of the same conversation. Anti-causal by
    design — this is how training LABELS are built; the ``next_*``
    naming keeps it out of the point-in-time feature set the leakage
    tests police (kernels/asof.asof_forward_indices)."""
    from turboxsl_ray.kernels.asof import asof_forward_indices

    def feats(t: pa.Table) -> pa.Table:
        conv = as_array(t["conv_id"])
        starts = W.segment_starts_from_arrow(conv)
        conv_codes = np.cumsum(starts) - 1
        ts_us = as_array(t["ts"].cast(pa.int64())).to_numpy()
        is_p = pc.equal(as_array(t["role"]), "purchase").to_numpy(
            zero_copy_only=False
        )
        val = as_array(t["value"]).to_numpy(zero_copy_only=False)

        p_codes, p_ts, p_val = conv_codes[is_p], ts_us[is_p], val[is_p]
        if len(p_ts):
            rstart = np.concatenate(
                ([True], (p_codes[1:] != p_codes[:-1]) | (p_ts[1:] != p_ts[:-1]))
            )
            ridx = np.flatnonzero(rstart)
            r_codes, r_ts = p_codes[ridx], p_ts[ridx]
            r_val = np.round(_reduceat(p_val, ridx), 3)
        else:
            r_codes = np.empty(0, dtype=np.int64)
            r_ts = np.empty(0, dtype=np.int64)
            r_val = np.empty(0, dtype=np.float64)

        idx = asof_forward_indices(conv_codes, ts_us, r_codes, r_ts)
        hit = idx >= 0
        safe = np.where(hit, idx, 0)
        pv = np.where(hit, r_val[safe] if len(r_val) else 0.0, np.nan)
        pts = np.where(hit, r_ts[safe] if len(r_ts) else 0, 0)
        return pa.table(
            {
                "conv_id": conv,
                "turn_idx": as_array(t["turn_idx"]),
                "ts": as_array(t["ts"]),
                "next_purchase_ts": pa.array(
                    pts, type=pa.int64(), mask=~hit
                ).cast(pa.timestamp("us")),
                "next_purchase_value": pa.array(pv, type=pa.float64(), mask=~hit),
            }
        )

    return transcripts_pipeline(
        sf_dir, feats, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )


RANGE_WINDOW_US = 10 * 60 * 1_000_000


def q_range_join(sf_dir: str) -> Dataset:
    """Trailing RANGE (interval) join: for every turn, count + exact
    cents-sum of the conversation's purchases with ``ts' in
    (ts - 10min, ts]`` — ``preceding-sibling::x[1]`` generalized from
    "the latest one" to "all within a time window" (a shape Ray Data
    has no built-in for; kernels/asof.range_count_sum). Both sides come
    out of the same conv-partitioned block, so the join is
    partition-local after the one conv-hash exchange."""
    from turboxsl_ray.kernels.arrays import to_cents
    from turboxsl_ray.kernels.asof import range_count_sum

    def feats(t: pa.Table) -> pa.Table:
        conv = as_array(t["conv_id"])
        starts = W.segment_starts_from_arrow(conv)
        conv_codes = np.cumsum(starts) - 1
        ts_us = as_array(t["ts"].cast(pa.int64())).to_numpy()
        is_p = pc.equal(as_array(t["role"]), "purchase").to_numpy(
            zero_copy_only=False
        )
        cents = to_cents(as_array(t["value"]).to_numpy(zero_copy_only=False))
        n, s = range_count_sum(
            conv_codes, ts_us,
            conv_codes[is_p], ts_us[is_p], cents[is_p],
            RANGE_WINDOW_US,
        )
        return pa.table(
            {
                "conv_id": conv,
                "turn_idx": as_array(t["turn_idx"]),
                "n_recent": pa.array(n, type=pa.int64()),
                "sum_recent": pa.array(s / 100.0, type=pa.float64()),
            }
        )

    return transcripts_pipeline(
        sf_dir, feats, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )


def q_session_stats(sf_dir: str) -> Dataset:
    """Per-(conversation, session) rollup — sessions never straddle
    blocks, so this is a block-local aggregate (no second shuffle)."""

    def feats(t: pa.Table) -> pa.Table:
        starts, ts_us, _g, _gv, new_s, session_idx = _session_arrays(t)
        v = as_array(t["value"]).to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(new_s)
        n = len(ts_us)
        sizes = np.diff(np.append(bounds, n))
        return pa.table(
            {
                "conv_id": as_array(t["conv_id"]).take(pa.array(bounds)),
                "session_idx": pa.array(session_idx[bounds], type=pa.int64()),
                "n_turns": pa.array(sizes, type=pa.int64()),
                "ts_min": as_array(t["ts"]).take(pa.array(bounds)),
                "ts_max": as_array(t["ts"]).take(
                    pa.array(np.append(bounds[1:], n) - 1)
                ),
                "sum_value": pa.array(
                    np.round(_reduceat(v, bounds), 3), type=pa.float64()
                ),
            }
        )

    return transcripts_pipeline(
        sf_dir, feats, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )


def q_zscore(sf_dir: str) -> Dataset:
    """Per-conversation feature standardization: value_z = (value -
    mean_conv) / std_conv with SQL STDDEV_SAMP semantics (null for
    single-turn conversations and zero-variance groups). The classic
    per-entity normalization step before model training — block-local
    after the one conv exchange (segment sums via np.add.reduceat, no
    second shuffle). Rounded to 6 digits on both sides: mean/std are
    reduceat sums over the block's contiguous segment, and the oracle
    aggregates the same doubles per window, so ties at the rounding
    boundary cannot arise from ordering."""

    def feats(t: pa.Table) -> pa.Table:
        starts = W.segment_starts_from_arrow(t["conv_id"])
        v = as_array(t["value"]).to_numpy(zero_copy_only=False).astype(np.float64)
        bounds = np.flatnonzero(starts)
        n = len(v)
        sizes = np.diff(np.append(bounds, n)).astype(np.float64)
        seg_id = np.cumsum(starts) - 1
        s1 = _reduceat(v, bounds)
        mean = s1 / sizes
        dev = v - mean[seg_id]
        ss = _reduceat(dev * dev, bounds)
        with np.errstate(divide="ignore", invalid="ignore"):
            std = np.sqrt(ss / np.maximum(sizes - 1.0, 0.0))
        std_row = std[seg_id]
        with np.errstate(divide="ignore", invalid="ignore"):
            z = dev / std_row
        ok = np.isfinite(z)
        return pa.table(
            {
                "conv_id": as_array(t["conv_id"]),
                "turn_idx": as_array(t["turn_idx"]),
                "value": as_array(t["value"]),
                "value_z": pa.array(
                    np.round(np.where(ok, z, 0.0), 6), mask=~ok
                ),
            }
        )

    return transcripts_pipeline(
        sf_dir, feats, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )


def q_role_transitions(sf_dir: str) -> "pd.DataFrame":
    """Role-transition statistics: count of (previous role → role)
    adjacent pairs across all conversations — the Markov-chain summary
    of dialogue structure (who speaks after whom). Per-block lag after
    the conv exchange, then partial counts + tiny final combine; the
    conversation-first turn (no predecessor) is excluded, exactly like
    SQL LAG's null."""
    import pandas as pd

    def feats(t: pa.Table) -> pa.Table:
        starts = W.segment_starts_from_arrow(t["conv_id"])
        role = as_array(t["role"])
        prev = W.take_with_null(role, W.lag_indices(starts, 1))
        keep = pc.is_valid(prev)
        return pa.table(
            {
                "prev_role": as_array(prev).filter(keep),
                "role": role.filter(keep),
            }
        )

    from turboxsl_ray.stages.aggregate import groupby_small

    ds = transcripts_pipeline(
        sf_dir, feats, columns=["event_id", "ts", "user_id", "event_type"]
    )
    agg = groupby_small(
        ds, keys=["prev_role", "role"], specs={"n": (None, "count")}, int_cols=("n",)
    )
    return (
        pd.DataFrame(agg)
        .sort_values(["prev_role", "role"])
        .reset_index(drop=True)
    )


def q_response_latency(sf_dir: str) -> "pd.DataFrame":
    """Response-latency features: per conversation, how many turns
    answer a 'view'-role turn and their total/mean latency (the gap to
    the preceding turn) — the turn-timing feature a dialogue-quality
    pipeline derives. Sums are exact int64 microseconds; the mean is
    one division of identical integers on both sides, so float drift
    vs the oracle is impossible."""
    import pandas as pd

    def feats(t: pa.Table) -> pa.Table:
        starts = W.segment_starts_from_arrow(t["conv_id"])
        role = as_array(t["role"])
        prev = W.take_with_null(role, W.lag_indices(starts, 1))
        ts_us = as_array(t["ts"].cast(pa.int64())).to_numpy()
        gaps, gvalid = W.gap_us(starts, ts_us)
        is_resp = pc.fill_null(
            pc.and_(pc.equal(prev, "view"), pa.array(gvalid)), False
        ).to_numpy(zero_copy_only=False).astype(bool)
        keep = pa.array(is_resp)
        return pa.table(
            {
                "conv_id": as_array(t["conv_id"]).filter(keep),
                "gap": pa.array(gaps[is_resp], type=pa.int64()),
            }
        )

    from turboxsl_ray.stages.aggregate import groupby_small

    ds = transcripts_pipeline(
        sf_dir, feats, columns=["event_id", "ts", "user_id", "event_type"]
    )
    agg = groupby_small(
        ds,
        keys=["conv_id"],
        specs={"n_resp": (None, "count"), "sum_gap_us": ("gap", "sum")},
        int_cols=("n_resp", "sum_gap_us"),
    )
    df = pd.DataFrame(agg)
    # integer floor-division mean: exact on both sides (a float mean
    # rounds half-even here but half-away in SQL — ties WILL bite)
    df["avg_gap_us"] = df["sum_gap_us"] // df["n_resp"]
    return df.sort_values("conv_id").reset_index(drop=True)


def q_conv_stats(sf_dir: str) -> Dataset:
    """Per-conversation rollup: the conv→turn hierarchy aggregate
    (ancestor-axis analog, SURVEY.md §2.3)."""

    def feats(t: pa.Table) -> pa.Table:
        starts, ts_us, _g, _gv, new_s, session_idx = _session_arrays(t)
        v = as_array(t["value"]).to_numpy(zero_copy_only=False)
        tool_valid = pc.is_valid(as_array(t["tool"])).to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(starts)
        n = len(ts_us)
        sizes = np.diff(np.append(bounds, n))
        last = np.append(bounds[1:], n) - 1
        return pa.table(
            {
                "conv_id": as_array(t["conv_id"]).take(pa.array(bounds)),
                "n_turns": pa.array(sizes, type=pa.int64()),
                "n_sessions": pa.array(session_idx[last] + 1, type=pa.int64()),
                "ts_min": as_array(t["ts"]).take(pa.array(bounds)),
                "ts_max": as_array(t["ts"]).take(pa.array(last)),
                "sum_value": pa.array(
                    np.round(_reduceat(v, bounds), 3), type=pa.float64()
                ),
                "n_tool_turns": pa.array(
                    _reduceat(tool_valid.astype(np.int64), bounds),
                    type=pa.int64(),
                ),
            }
        )

    return transcripts_pipeline(
        sf_dir, feats, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )


def q_rule_dispatch(sf_dir: str) -> Dataset:
    """Prioritized per-row rule routing (stages/dispatch.py) — the
    apply-templates/template-match analog (instructions.c:69-145,
    templates.c:435-487). Oracle = the equivalent CASE cascade."""
    from turboxsl_ray.stages.dispatch import RuleSet

    rules = (
        RuleSet(default_action=lambda t: np.zeros(t.num_rows))
        .add(
            "big_purchase",
            lambda t: pc.and_(pc.equal(t["role"], "purchase"),
                              pc.greater(t["value"], 60.0)),
            lambda t: pc.multiply(as_array(t["value"]), 2.0),
            priority=10,
        )
        .add(
            "purchase",
            lambda t: pc.equal(t["role"], "purchase"),
            lambda t: as_array(t["value"]),
            priority=5,
        )
        .add(
            "error",
            lambda t: pc.equal(t["role"], "error"),
            lambda t: np.full(t.num_rows, -1.0),
            priority=5,
        )
    )

    def feats(t: pa.Table) -> pa.Table:
        out = rules.apply(t, out_col="rule", value_col="score")
        return out.select(["conv_id", "turn_idx", "rule", "score"])

    return transcripts_pipeline(
        sf_dir, feats, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )


def q_streaming_window(sf_dir: str) -> Dataset:
    """Past-only window features through the STATEFUL actor-pool stage
    (stages/streaming_window.py): per-conversation ring buffers carry
    lag/gap/session/backfill state across small batch boundaries.
    Results must equal the block-local path — the oracle is the same
    SQL as the stateless window queries."""
    from turboxsl_ray.stages.streaming_window import StreamingWindowStage
    from turboxsl_ray.stages.window_stage import WindowSpec

    spec = WindowSpec(
        lags=(("value", 1), ("value", 2), ("role", 1)),
        gap=True,
        session_gap_us=SESSION_GAP_US,
        ffill_cols=("tool",),
    )
    parts = transcripts_pipeline(sf_dir)  # sorted whole-conv blocks
    out = parts.map_batches(
        StreamingWindowStage,
        fn_constructor_kwargs={"spec": spec},
        batch_size=512,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=2,
    )
    return out


def q_conv_text(sf_dir: str) -> Dataset:
    """Order-sensitive aggregation: concatenate every conversation's
    turn texts IN TURN ORDER into one training-example string (the
    string_agg(... ORDER BY) operator class — the reference's
    document-order serialization of a subtree, output.c:66-140, as a
    per-group aggregate). Fully vectorized: the sorted block's segment
    offsets become a zero-copy Arrow ListArray over the text column,
    one ``binary_join`` emits every conversation's string."""

    def feats(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "n_turns": pa.array([], pa.int64()),
                "conv_text": pa.array([], pa.string()),
            }
        )
        if t.num_rows == 0:
            return empty
        starts = np.flatnonzero(W.segment_starts_from_arrow(t["conv_id"]))
        offsets = np.append(starts, t.num_rows).astype(np.int32)
        text = as_array(t["text"])
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), text)
        return pa.table(
            {
                "conv_id": as_array(t["conv_id"]).take(pa.array(starts)),
                "n_turns": pa.array(np.diff(offsets).astype(np.int64)),
                "conv_text": as_array(pc.binary_join(lists, " ")),
            }
        )

    return transcripts_pipeline(
        sf_dir, feats, columns=["event_id", "ts", "user_id", "event_type", "props"]
    )
