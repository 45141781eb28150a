"""The flagship pipeline: point-in-time feature engineering over
transcripts — as-of join + lag/lead + gap sessionization + backfill —
with Zipf-skew salting, per-partition lineage, and checkpoint resume.

Physical plan (ONE all-to-all exchange)::

    read left (+right) ──align/salt/part_id──┐
                                             ├─ union ─ filter(done)
    read right ──replicate-to-buckets────────┘        │
                                     HASH SHUFFLE by part_id
                                              │
               one fused block fn per partition:
                 sort (conv,salt,ts,src,turn) → as-of ffill merge →
                 window features → session offset fix → drop replicas
                 → write part=NNNNN.parquet + lineage manifest
                                              │
                               tiny summary rows (one per partition)

Everything after the shuffle happens inside a single ``map_batches``
call on whole partition blocks, so no intermediate re-blocking can
split a conversation.

Skew: conversations over ``salt_threshold_rows`` are split into
turn-range buckets (stages/salting.py) with backward replicas
(``salt_lookback`` turns, for lag/gap/rolling/ffill) and forward
replicas (``salt_lookahead`` turns, for leads); right-side feature
rows of salted conversations are replicated to every bucket (the
right side is small — the broadcast-small-side trade). Global
``session_idx`` over salted conversations is restored by adding a
per-(conv, salt) offset computed in a tiny projected pre-pass.

Resume: completed partition ids (state/lineage.py manifests) are
filtered out right after the read — a resumed run never shuffles or
recomputes finished partitions, and partition files are deterministic
and idempotent under retry.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from turboxsl_ray.kernels import windows as W
from turboxsl_ray.kernels.arrays import as_array
from turboxsl_ray.kernels.hashing import stable_hash64
from turboxsl_ray.stages.partitioning import map_partitions, partition_by_conv
from turboxsl_ray.stages.salting import OWNED_COL, SALT_COL, conv_counts
from turboxsl_ray.state import lineage

SRC_COL = "__src"
PART_COL = "part_id"
_SALT_MIX = np.uint64(0x9E3779B97F4A7C15)


@dataclass(frozen=True)
class FlagshipConfig:
    num_partitions: int = 32
    session_gap_us: int = 15 * 60 * 1_000_000
    lags: tuple = (("value", 1), ("value", 2), ("role", 1))
    leads: tuple = (("value", 1),)
    rolling: tuple = (("value", 10, "mean"),)
    ffill_cols: tuple = ("tool",)
    salt_threshold_rows: int = 100_000
    salt_bucket_rows: int = 0  # 0 -> same as threshold
    salt_lookback: int = 64
    salt_lookahead: int = 8

    def fingerprint(self) -> str:
        return hashlib.md5(repr(self).encode()).hexdigest()[:12]

    @property
    def bucket_rows(self) -> int:
        return self.salt_bucket_rows or self.salt_threshold_rows

    def max_lag(self) -> int:
        ks = [k for _, k in self.lags] + [k for _, k, _ in self.rolling]
        return max(ks, default=1)

    def max_lead(self) -> int:
        return max((k for _, k in self.leads), default=0)


def _blocks_hint(ds: Dataset) -> int:
    """Upper-bound estimate of how many blocks the read will produce,
    used to scale the skew pre-pass pigeonhole floor (a file can split
    into a few blocks, never hundreds)."""
    try:
        n_files = len(ds.input_files())
    except Exception:
        n_files = 0
    return max(1024, 4 * n_files)


def _claim_attempt_slot(out_dir: str) -> int:
    """Atomically claim the next global attempt slot (test hook for
    deterministic worker-side failure injection; single-node FS)."""
    import os

    adir = os.path.join(out_dir, "_attempts")
    os.makedirs(adir, exist_ok=True)
    i = 0
    while True:
        try:
            fd = os.open(
                os.path.join(adir, f"slot-{i:05d}"),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
            os.close(fd)
            return i
        except FileExistsError:
            i += 1


def _part_ids(conv_hash: np.ndarray, salt: np.ndarray, num_partitions: int) -> np.ndarray:
    mixed = conv_hash + salt.astype(np.uint64) * _SALT_MIX
    return (mixed % np.uint64(num_partitions)).astype(np.int64)


def _map_plan(conv: np.ndarray, plan: dict, default: int = 0) -> np.ndarray:
    """Per-row plan lookup. The plan holds only mega conversations, so
    it is almost always tiny — a few vectorized equality scans beat a
    per-row hash lookup; large plans fall back to pandas map."""
    out = np.full(len(conv), default, dtype=np.int64)
    if not plan:
        return out
    if len(plan) <= 16:
        for c, v in plan.items():
            out[conv == c] = v
        return out
    import pandas as pd

    return pd.Series(conv).map(plan).fillna(default).to_numpy(np.int64)


def _salt_left(tbl: pa.Table, plan: dict[str, int], lookback: int, lookahead: int, P: int) -> pa.Table:
    """salt + owned + part_id for transcript rows, with backward
    (lag context) and forward (lead context) boundary replicas."""
    n = tbl.num_rows
    conv = as_array(tbl["conv_id"]).to_pandas().to_numpy()
    turn = as_array(tbl["turn_idx"]).to_numpy().astype(np.int64)
    h = stable_hash64(tbl["conv_id"])

    bucket_size = _map_plan(conv, plan)
    salted = bucket_size > 0
    salt = np.zeros(n, dtype=np.int64)
    pos = np.zeros(n, dtype=np.int64)
    if salted.any():
        salt[salted] = turn[salted] // bucket_size[salted]
        pos[salted] = turn[salted] % bucket_size[salted]

    pieces = []

    def emit(mask: np.ndarray, salt_vals: np.ndarray, owned: bool):
        sub = tbl.filter(pa.array(mask)) if not mask.all() else tbl
        sub = sub.append_column(SALT_COL, pa.array(salt_vals, type=pa.int32()))
        sub = sub.append_column(
            OWNED_COL, pa.array(np.full(len(salt_vals), owned, dtype=bool))
        )
        pid = _part_ids(h[mask], salt_vals.astype(np.int64), P)
        sub = sub.append_column(PART_COL, pa.array(pid, type=pa.int64()))
        pieces.append(sub)

    emit(np.ones(n, dtype=bool), salt.astype(np.int32), True)
    if salted.any():
        back = salted & (pos >= (bucket_size - lookback))
        if back.any():
            emit(back, (salt[back] + 1).astype(np.int32), False)
        if lookahead > 0:
            fwd = salted & (pos < lookahead) & (salt > 0)
            if fwd.any():
                emit(fwd, (salt[fwd] - 1).astype(np.int32), False)
    return pa.concat_tables(pieces) if len(pieces) > 1 else pieces[0]


def _salt_right(tbl: pa.Table, plan_buckets: dict[str, int], P: int) -> pa.Table:
    """salt + part_id for feature rows; rows of salted conversations
    are replicated to every bucket (right side is small)."""
    n = tbl.num_rows
    conv = as_array(tbl["conv_id"]).to_pandas().to_numpy()
    h = stable_hash64(tbl["conv_id"])
    nb = _map_plan(conv, plan_buckets, default=1)
    reps = np.repeat(np.arange(n, dtype=np.int64), nb)
    offsets = np.repeat(np.cumsum(nb) - nb, nb)
    salt = (np.arange(len(reps), dtype=np.int64) - offsets).astype(np.int32)
    out = tbl.take(pa.array(reps)) if (nb > 1).any() else tbl
    out = out.append_column(SALT_COL, pa.array(salt, type=pa.int32()))
    out = out.append_column(OWNED_COL, pa.array(np.zeros(len(reps), dtype=bool)))
    pid = _part_ids(h[reps], salt.astype(np.int64), P)
    out = out.append_column(PART_COL, pa.array(pid, type=pa.int64()))
    return out


def _align(tbl: pa.Table, out_names: list[str], out_types: dict, src: int) -> pa.Table:
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


def _arrow_schema(ds: Dataset) -> pa.Schema:
    s = ds.schema()
    base = getattr(s, "base_schema", s)
    if not isinstance(base, pa.Schema):
        base = pa.schema(list(zip(s.names, s.types)))
    return base


# Above this many (approximate) selected rows, session_offsets splits
# even the 3-column count pass by (conv, salt-bucket) instead of
# landing each salted conversation whole on one worker. 16M rows of
# (string, ts, int) is well under 1 GiB per worker; beyond it, a single
# pathological conversation would serialize the pre-pass.
SESSION_OFFSETS_BUCKET_ROWS = 16_000_000


def session_offsets(
    left: Dataset,
    plan: dict[str, int],
    session_gap_us: int,
    num_partitions: int,
    *,
    approx_rows: int | None = None,
    bucket_pass_rows: int = SESSION_OFFSETS_BUCKET_ROWS,
) -> tuple[dict[tuple[str, int], int], dict[str, int]]:
    """Exclusive prefix sums of per-(conv, salt-bucket) new-session
    counts — the tiny pre-pass that makes bucket-local session ordinals
    globally exact — plus the EXACT per-conversation bucket count
    (max salt + 1) for right-side replication.

    Unlike the floored skew pre-pass (salting.conv_counts, which only
    SELECTS which conversations to salt and may undercount), this pass
    scans every row of the selected conversations with no floor, so the
    returned bucket counts are exact: the right side is replicated to
    precisely the buckets the left side will occupy, and no top bucket
    can be left without its as-of feature rows.

    Scans the RAW left side filter-first (only rows of salted
    conversations survive the projection — 3 columns), computes global
    gap-based new-session flags per conversation, and sums them per
    salt bucket (``turn_idx // bucket_rows``, the same formula
    ``_salt_left`` uses). This equals the count the main pass sees over
    owned rows: a bucket's first owned row gets its gap from the
    replicated predecessor turn, which is exactly its global
    predecessor (lookback >= 1), so the flags agree row-for-row.

    Each salted conversation lands whole on one worker by default —
    fine for a 3-column count pass. When ``approx_rows`` (the floored
    selected-set estimate from conv_counts) exceeds
    ``bucket_pass_rows``, the pass shuffles by (conv, SALT) instead:
    each row goes to its own bucket and every bucket-boundary row
    (``(turn_idx+1) % bucket_rows == 0`` — turn_idx is dense per conv,
    the same contract _salt_left's replication uses) is replicated
    unowned to bucket+1, so a bucket's first owned row still gets its
    gap from its true global predecessor and no conversation — however
    pathological — serializes even the counting. Both paths produce
    identical (offsets, plan_buckets); parity is pinned by pytest."""
    convs = set(plan)
    if not convs:
        return {}, {}

    conv_set = pa.array(sorted(convs))

    def project(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(tbl["conv_id"], value_set=conv_set)
        return tbl.filter(mask)

    # select_columns FIRST: the projection pushes into the parquet
    # read, so this pass never touches the fat text column
    small = map_partitions(
        left.select_columns(["conv_id", "ts", "turn_idx"]), project
    )
    _EMPTY = pa.table(
        {"conv_id": pa.array([], pa.string()),
         SALT_COL: pa.array([], pa.int32()),
         "n_sessions": pa.array([], pa.int64())}
    )

    if approx_rows is not None and approx_rows > bucket_pass_rows:

        def add_salt(tbl: pa.Table) -> pa.Table:
            n = tbl.num_rows
            out_salt = pa.field(SALT_COL, pa.int32())
            if n == 0:
                return tbl.append_column(out_salt, pa.array([], pa.int32())) \
                          .append_column(OWNED_COL, pa.array([], pa.bool_()))
            conv_np = as_array(tbl["conv_id"]).to_pandas().to_numpy()
            turn = as_array(tbl["turn_idx"]).to_numpy().astype(np.int64)
            br = _map_plan(conv_np, plan)  # >0: only selected convs here
            salt = (turn // br).astype(np.int32)
            owned = tbl.append_column(out_salt, pa.array(salt)) \
                       .append_column(OWNED_COL,
                                      pa.array(np.ones(n, dtype=bool)))
            boundary = (turn + 1) % br == 0
            if not boundary.any():
                return owned
            rep = tbl.filter(pa.array(boundary))
            rep = rep.append_column(
                out_salt, pa.array((salt[boundary] + 1).astype(np.int32))
            ).append_column(
                OWNED_COL, pa.array(np.zeros(rep.num_rows, dtype=bool))
            )
            return pa.concat_tables([owned, rep])

        parts = partition_by_conv(
            map_partitions(small, add_salt),
            min(64, num_partitions),
            keys=["conv_id", SALT_COL],
        )

        def per_block(tbl: pa.Table) -> pa.Table:
            if tbl.num_rows == 0:
                return _EMPTY
            tbl = tbl.sort_by(
                [("conv_id", "ascending"), (SALT_COL, "ascending"),
                 ("ts", "ascending"), ("turn_idx", "ascending")]
            )
            starts = W.segment_starts_from_arrow(tbl["conv_id"])
            salt = as_array(tbl[SALT_COL]).to_numpy()
            starts[1:] |= salt[1:] != salt[:-1]
            ts_us = as_array(tbl["ts"].cast(pa.int64())).to_numpy()
            # a (conv, salt) segment's first row is the unowned
            # replica (true global predecessor) except at salt 0,
            # whose first row is the conversation's turn 0 — either
            # way new_s over OWNED rows equals the conv-whole flags
            new_s, _ = W.session_index(starts, ts_us, session_gap_us)
            owned = as_array(tbl[OWNED_COL]).to_numpy(zero_copy_only=False)
            seg_id = np.cumsum(starts) - 1
            sums = np.bincount(seg_id, weights=new_s & owned).astype(np.int64)
            n_owned = np.bincount(seg_id, weights=owned).astype(np.int64)
            first_rows = np.flatnonzero(starts)
            keep = n_owned > 0  # replica-only segments are not buckets
            return pa.table(
                {
                    "conv_id": as_array(tbl["conv_id"]).take(
                        pa.array(first_rows[keep])
                    ),
                    SALT_COL: pa.array(salt[first_rows[keep]].astype(np.int32)),
                    "n_sessions": pa.array(sums[keep], type=pa.int64()),
                }
            )

    else:
        # tiny pre-pass: few shuffle partitions keep fixed startup cost
        # down; whole conversations co-locate per worker
        parts = partition_by_conv(small, min(8, num_partitions), keys=["conv_id"])

        def per_block(tbl: pa.Table) -> pa.Table:
            if tbl.num_rows == 0:
                return _EMPTY
            tbl = tbl.sort_by(
                [("conv_id", "ascending"), ("ts", "ascending"),
                 ("turn_idx", "ascending")]
            )
            starts = W.segment_starts_from_arrow(tbl["conv_id"])
            ts_us = as_array(tbl["ts"].cast(pa.int64())).to_numpy()
            new_s, _ = W.session_index(starts, ts_us, session_gap_us)
            conv_np = as_array(tbl["conv_id"]).to_pandas().to_numpy()
            turn = as_array(tbl["turn_idx"]).to_numpy().astype(np.int64)
            bucket_rows = _map_plan(conv_np, plan)
            bucket = turn // bucket_rows
            seg_change = starts.copy()
            seg_change[1:] |= bucket[1:] != bucket[:-1]
            seg_id = np.cumsum(seg_change) - 1
            sums = np.bincount(seg_id, weights=new_s).astype(np.int64)
            first_rows = np.flatnonzero(seg_change)
            return pa.table(
                {
                    "conv_id": as_array(tbl["conv_id"]).take(pa.array(first_rows)),
                    SALT_COL: pa.array(bucket[first_rows].astype(np.int32)),
                    "n_sessions": pa.array(sums, type=pa.int64()),
                }
            )

    rows = map_partitions(parts, per_block).take_all()
    per_conv: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        per_conv.setdefault(r["conv_id"], []).append((r[SALT_COL], r["n_sessions"]))
    offsets: dict[tuple[str, int], int] = {}
    plan_buckets: dict[str, int] = {}
    for conv, pairs in per_conv.items():
        acc = 0
        for salt, cnt in sorted(pairs):
            offsets[(conv, salt)] = acc
            acc += int(cnt)
        plan_buckets[conv] = max(s for s, _ in pairs) + 1
    return offsets, plan_buckets


def run_flagship(
    left: Dataset,
    right: Dataset | None,
    out_dir: str,
    cfg: FlagshipConfig = FlagshipConfig(),
    *,
    input_id: str = "",
    resume: bool = True,
    fail_after_parts: int | None = None,
) -> dict:
    """Run the flagship pipeline; returns run metrics + manifest.

    ``fail_after_parts`` is a test hook: raise after N partitions have
    been written, to exercise checkpoint resume (FIXTURES.md F6).
    """
    import time

    P = cfg.num_partitions
    lineage.prepare_output_dir(out_dir)
    # resume skips only partitions written under the SAME config and
    # input — a changed config/input purges stale files and recomputes
    # instead of silently mixing feature definitions across runs. The
    # purge runs on resume=False too: a fresh run overwrites matching
    # partition ids anyway, but ids beyond a reduced partition count
    # would otherwise linger and pollute whole-directory readers.
    purged = lineage.purge_mismatched(out_dir, cfg.fingerprint(), input_id)
    done = (
        lineage.load_done(
            out_dir, config_fingerprint=cfg.fingerprint(), input_id=input_id
        )
        if resume
        else set()
    )
    t0 = time.perf_counter()

    # --- skew pre-pass: which conversations need salting? The floored
    # counts only SELECT the (tiny) set of mega conversations; every
    # number that affects feature values (bucket count, session
    # offsets) comes from the exact session_offsets pass below.
    counts = conv_counts(
        left, min_total=cfg.salt_threshold_rows, blocks_hint=_blocks_hint(left)
    )
    plan = {c: cfg.bucket_rows for c in counts}

    lookback = max(cfg.salt_lookback, cfg.max_lag())
    lookahead = max(cfg.salt_lookahead, cfg.max_lead())

    t_counts = time.perf_counter() - t0

    # exact pass over the selected conversations: session-ordinal
    # offsets AND the exact bucket count per conversation (so the right
    # side is replicated to every bucket the left side occupies)
    offsets, plan_buckets = session_offsets(
        left, plan, cfg.session_gap_us, P,
        # floored estimate: only ever an undercount, so the bucketed
        # pass can only kick in later than a perfect count would — the
        # conv-whole pass stays correct at any size, just slower
        approx_rows=sum(counts.values()),
    )
    t_offsets = time.perf_counter() - t0 - t_counts

    left_salted = map_partitions(
        left, lambda t: _salt_left(t, plan, lookback, lookahead, P)
    )

    # --- align schemas and union the two sides
    lschema = _arrow_schema(left)
    lnames = list(lschema.names)
    rvalue_names: list[str] = []
    out_types: dict[str, pa.DataType] = {n: lschema.field(n).type for n in lnames}
    if right is not None:
        rschema = _arrow_schema(right)
        rvalue_names = [n for n in rschema.names if n not in ("conv_id", "ts")]
        for n in rvalue_names:
            out_types[n] = rschema.field(n).type
    for extra, t in ((SALT_COL, pa.int32()), (OWNED_COL, pa.bool_()),
                     (PART_COL, pa.int64()), (SRC_COL, pa.int8())):
        out_types[extra] = t
    out_names = lnames + rvalue_names + [SALT_COL, OWNED_COL, PART_COL, SRC_COL]

    combined = left_salted.map_batches(
        lambda t: _align(t, out_names, out_types, 1),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    if right is not None:
        right_salted = map_partitions(
            right, lambda t: _salt_right(t, plan_buckets, P)
        )
        ral = right_salted.map_batches(
            lambda t: _align(t, out_names, out_types, 0),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        combined = combined.union(ral)

    if done:
        done_arr = np.array(sorted(done), dtype=np.int64)

        def drop_done(tbl: pa.Table) -> pa.Table:
            pid = as_array(tbl[PART_COL]).to_numpy()
            keep = ~np.isin(pid, done_arr)
            return tbl.filter(pa.array(keep))

        combined = map_partitions(combined, drop_done)

    shuffled = partition_by_conv(combined, P, keys=[PART_COL])

    fp = cfg.fingerprint()
    session_gap = cfg.session_gap_us
    lags, leads, rolling, ffills = cfg.lags, cfg.leads, cfg.rolling, cfg.ffill_cols

    def block_fn(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {PART_COL: pa.array([], pa.int64()),
             "rows_written": pa.array([], pa.int64()),
             "convs": pa.array([], pa.int64())}
        )
        if tbl.num_rows == 0:
            return empty
        tbl = tbl.sort_by(
            [("conv_id", "ascending"), (SALT_COL, "ascending"),
             ("ts", "ascending"), (SRC_COL, "ascending"),
             ("turn_idx", "ascending")]
        )
        starts = W.segment_starts_from_arrow(tbl["conv_id"])
        starts |= W.segment_starts_from_arrow(tbl[SALT_COL])
        src = as_array(tbl[SRC_COL]).to_numpy(zero_copy_only=False)
        is_right = src == 0

        # as-of merge: forward-fill latest right row index within segment
        gathered: dict[str, pa.Array] = {}
        if rvalue_names:
            ffi = W.ffill_indices(starts, is_right)
            for name in rvalue_names:
                gathered[name] = W.take_with_null(as_array(tbl[name]), ffi)

        left_mask = ~is_right
        lm = pa.array(left_mask)
        cols = {n: as_array(tbl[n]).filter(lm) for n in lnames}
        for n in rvalue_names:
            cols[n] = gathered[n].filter(lm)
        cols[SALT_COL] = as_array(tbl[SALT_COL]).filter(lm)
        cols[OWNED_COL] = as_array(tbl[OWNED_COL]).filter(lm)
        cols[PART_COL] = as_array(tbl[PART_COL]).filter(lm)
        lt = pa.table(cols)
        if lt.num_rows == 0:
            return empty

        # window features over left rows (still sorted: filter preserves order)
        starts = W.segment_starts_from_arrow(lt["conv_id"])
        starts |= W.segment_starts_from_arrow(lt[SALT_COL])
        ts_us = as_array(lt["ts"].cast(pa.int64())).to_numpy()
        feat: dict[str, pa.Array] = {}
        for col, k in lags:
            feat[f"lag_{col}_{k}"] = W.take_with_null(
                as_array(lt[col]), W.lag_indices(starts, k)
            )
        for col, k in leads:
            feat[f"lead_{col}_{k}"] = W.take_with_null(
                as_array(lt[col]), W.lead_indices(starts, k)
            )
        gaps, gvalid = W.gap_us(starts, ts_us)
        feat["gap_us"] = pa.array(gaps, type=pa.int64(), mask=~gvalid)
        for col, k, agg in rolling:
            v = as_array(lt[col]).to_numpy(zero_copy_only=False).astype(np.float64)
            if agg == "sum":
                feat[f"roll_sum_{k}_{col}"] = pa.array(W.rolling_sum(starts, v, k))
            elif agg == "mean":
                feat[f"roll_mean_{k}_{col}"] = pa.array(W.rolling_mean(starts, v, k))
            elif agg == "count":
                feat[f"roll_count_{k}_{col}"] = pa.array(
                    W.rolling_count(starts, ~np.isnan(v), k)
                )
        for col in ffills:
            arr = as_array(lt[col])
            valid = np.asarray(pc_is_valid(arr))
            feat[f"{col}_ffill"] = W.take_with_null(
                arr, W.ffill_indices(starts, valid)
            )

        # sessionization with salt-bucket offset correction
        owned = as_array(lt[OWNED_COL]).to_numpy(zero_copy_only=False)
        new_s = starts | (gvalid & (gaps > session_gap))
        x = (new_s & owned).astype(np.int64)
        csp = np.concatenate(([0], np.cumsum(x)))
        seg_first = W.segment_first_index(starts)
        local = csp[np.arange(len(x)) + 1] - csp[seg_first]
        if offsets:
            conv_np = as_array(lt["conv_id"]).to_pandas().to_numpy()
            salt_np = as_array(lt[SALT_COL]).to_numpy(zero_copy_only=False)
            off = np.zeros(len(x), dtype=np.int64)
            need = salt_np > 0
            seg_rows = np.flatnonzero(starts)
            # per-row offset via dict lookup only at segment firsts
            seg_off = np.array(
                [offsets.get((conv_np[i], int(salt_np[i])), 0) for i in seg_rows],
                dtype=np.int64,
            )
            off = seg_off[np.cumsum(starts) - 1]
            feat["session_idx"] = pa.array(off + local - 1, type=pa.int64())
        else:
            feat["session_idx"] = pa.array(local - 1, type=pa.int64())
        feat["session_new"] = pa.array(new_s & owned)

        for name, arr in feat.items():
            lt = lt.append_column(name, arr)

        # drop replicas + helper cols; write one file per part id
        owned_mask = as_array(lt[OWNED_COL])
        salted_row = pc_gt0(as_array(lt[SALT_COL]).filter(owned_mask))
        lt = lt.filter(owned_mask).drop_columns([SALT_COL, OWNED_COL])
        pids = as_array(lt[PART_COL]).to_numpy()
        summary_rows = []
        import pyarrow.compute as pc

        for pid in np.unique(pids):
            if fail_after_parts is not None:
                # deterministic worker-side crash: exactly
                # `fail_after_parts` partitions get written globally
                # (atomic slot claim BEFORE the write), every later
                # writer raises before touching its partition.
                slot = _claim_attempt_slot(out_dir)
                if slot >= fail_after_parts:
                    raise RuntimeError(
                        f"injected failure after {fail_after_parts} partitions"
                    )
            sel = pids == pid
            sub = lt.filter(pa.array(sel))
            rec = lineage.write_partition(
                out_dir, int(pid), sub, input_id=input_id, config_fingerprint=fp,
                extra={
                    "byte_size": sub.nbytes,
                    "salted_rows": int(salted_row[sel].sum()),
                },
                # out-of-band comment/PI analog: provenance rides the
                # parquet footer, not the row data (instructions.c:467-478)
                annotations={
                    "comment:0": "generated by turboxsl_ray flagship",
                    "pi:config": fp,
                },
            )
            summary_rows.append(
                {PART_COL: int(pid), "rows_written": rec["row_count"],
                 "convs": rec["conv_count"]}
            )
        return pa.table(
            {PART_COL: pa.array([r[PART_COL] for r in summary_rows], pa.int64()),
             "rows_written": pa.array(
                 [r["rows_written"] for r in summary_rows], pa.int64()),
             "convs": pa.array([r["convs"] for r in summary_rows], pa.int64())}
        )

    summary_ds = map_partitions(shuffled, block_fn)
    summaries = summary_ds.take_all()

    phase_sec = {
        "prepass_counts": round(t_counts, 3),
        "prepass_offsets": round(t_offsets, 3),
        "main": round(time.perf_counter() - t0 - t_counts - t_offsets, 3),
    }
    # run-level plan/decision record (salting decisions, phase times —
    # the reference's task-graph-dump observability analog)
    lineage.write_run_record(
        out_dir,
        {
            "input_id": input_id,
            "config_fingerprint": fp,
            "num_partitions": P,
            "salted_convs": sorted(plan)[:1000],
            "plan_buckets": {k: plan_buckets[k] for k in sorted(plan_buckets)[:1000]},
            "lookback": lookback,
            "lookahead": lookahead,
            "phase_sec": phase_sec,
            "partitions_written": len(summaries),
            "partitions_skipped": len(done),
            "partitions_purged_stale": sorted(purged),
        },
    )

    return {
        "partitions_written": len(summaries),
        "partitions_skipped": len(done),
        "rows_written": int(sum(r["rows_written"] for r in summaries)),
        "salted_convs": len(plan),
        "config_fingerprint": fp,
        "manifest": lineage.load_manifest(out_dir),
        "stats": summary_ds.stats(),
        "phase_sec": phase_sec,
    }


def pc_is_valid(arr: pa.Array) -> np.ndarray:
    import pyarrow.compute as pc

    return pc.is_valid(arr).to_numpy(zero_copy_only=False)


def pc_gt0(arr: pa.Array) -> np.ndarray:
    return arr.to_numpy(zero_copy_only=False) > 0
