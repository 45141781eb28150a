"""Skew handling: salt mega-conversations into turn-range sub-buckets
with boundary-turn replication.

The reference has NO skew story — a mega-subtree serializes on one
pool thread (/root/reference/src/template_task.c:24-99; SURVEY.md
§4.1). Here Zipf-skewed ``conv_id`` is the north_rule's explicit
requirement: no single actor may own a hot key.

Scheme
------
- A cheap pre-pass counts turns per conversation (partial counts per
  block, then a tiny groupby — the full rows never shuffle).
- Conversations over ``threshold_rows`` get ``salt = turn_idx //
  bucket_size`` (time-contiguous because ``ts`` is monotone in
  ``turn_idx`` within a conversation — the transcript invariant from
  BASELINE.json input_hint).
- Each bucket is also fed a REPLICA of the last ``lookback`` turns of
  its predecessor bucket (``owned = False``), so every trailing window
  of span <= lookback (lag-k, gap, rolling-k, ffill-within-k) is exact
  without cross-worker communication. Replicas are dropped after
  feature computation; exact dedup by construction (each owned row is
  emitted exactly once).
- Features with unbounded lookback (global ``session_idx``) get a
  per-(conv, salt) offset correction: local new-session flags are
  exact everywhere (they only need lag-1 context), so bucket-local
  session ordinals plus an exclusive prefix sum of per-bucket
  new-session counts (tiny, driver-side) reconstruct the global
  ordinal. See pipelines/flagship.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from turboxsl_ray.stages.partitioning import map_partitions

SALT_COL = "salt"
OWNED_COL = "owned"


# default upper bound on blocks a single conversation's rows can be
# spread over; used for the pigeonhole floor below. Callers that know
# the real block count (e.g. from the read op's file list) should pass
# ``blocks_hint`` instead of relying on this constant.
_MAX_BLOCKS_PER_CONV = 1024


def conv_counts(
    ds: Dataset,
    key: str = "conv_id",
    min_total: int | None = None,
    blocks_hint: int = _MAX_BLOCKS_PER_CONV,
) -> dict[str, int]:
    """Turns per conversation via partial per-block counts + tiny
    driver-side combine — NO shuffle (the full rows never move, and
    neither do full per-conv dictionaries).

    With ``min_total`` set, each block drops conversations it sees
    fewer than ``min_total / blocks_hint`` times before emitting: by
    pigeonhole, any conversation with a true total > ``min_total``
    spread over <= ``blocks_hint`` blocks must clear that floor in at
    least one block, so no such conversation is ever missed. Totals
    for the survivors are undercounted by at most floor x blocks, so
    the result is only safe for SELECTING which conversations to treat
    as mega — any quantity that affects feature values (bucket counts,
    session offsets) must come from an exact follow-up pass over the
    selected set (see pipelines/flagship.session_offsets).

    ``blocks_hint`` should be an upper bound on the number of blocks
    the scan produces; passing a larger value lowers the floor (more
    per-block state, never wrong), an underestimate can miss a mega
    conversation spread thinly over more blocks than the hint.
    """
    floor = 0
    if min_total is not None:
        floor = max(1, int(min_total) // max(1, int(blocks_hint)))
    if floor <= 1:
        floor = 0  # keep-all: filtering below floor 1 is a no-op

    def partial(tbl: pa.Table) -> pa.Table:
        g = tbl.group_by(key).aggregate([(key, "count")])
        g = g.rename_columns([key, "n"])
        if floor:
            import pyarrow.compute as pc

            g = g.filter(pc.greater_equal(g["n"], floor))
        return g

    partials = ds.select_columns([key]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    from turboxsl_ray.stages.aggregate import collect_tables

    tables = collect_tables(partials)
    acc: dict[str, int] = {}
    for t in tables:
        for k, n in zip(t[key].to_pylist(), t["n"].to_pylist()):
            acc[k] = acc.get(k, 0) + int(n)
    if min_total is not None:
        thr = int(min_total)
        acc = {k: n for k, n in acc.items() if n > thr}
    return acc


def plan_salting(
    counts: dict[str, int],
    threshold_rows: int,
    bucket_rows: int | None = None,
) -> dict[str, int]:
    """conv_id -> bucket_size for conversations that need salting.

    ``bucket_rows`` defaults to ``threshold_rows`` (each sub-bucket at
    most one threshold's worth of turns).
    """
    bucket_rows = bucket_rows or threshold_rows
    return {c: bucket_rows for c, n in counts.items() if n > threshold_rows}


def apply_salt(
    ds: Dataset,
    plan: dict[str, int],
    lookback: int,
) -> Dataset:
    """Add ``salt`` + ``owned`` columns; emit boundary replicas.

    Unsalted conversations get salt=0, owned=True, no replicas. The
    plan is tiny (mega conversations only) and ships once per task via
    closure capture (Ray serializes it into the task spec — the
    broadcast-small-side pattern).
    """
    if lookback < 1:
        raise ValueError("lookback must be >= 1")

    def fn(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        conv = tbl["conv_id"].to_pandas().to_numpy()
        turn = tbl["turn_idx"].to_numpy()
        bucket_size = np.zeros(n, dtype=np.int64)
        if plan:
            import pandas as pd

            bs = pd.Series(conv).map(plan).fillna(0).to_numpy(np.int64)
            bucket_size = bs
        salted = bucket_size > 0
        salt = np.zeros(n, dtype=np.int32)
        if salted.any():
            salt[salted] = (turn[salted] // bucket_size[salted]).astype(np.int32)
        out = tbl.append_column(SALT_COL, pa.array(salt, type=pa.int32()))
        out = out.append_column(OWNED_COL, pa.array(np.ones(n, dtype=bool)))

        # replicas: last `lookback` turns of each bucket also go to the
        # next bucket (owned=False). pos_in_bucket >= bucket_size-lookback
        if salted.any():
            pos = np.zeros(n, dtype=np.int64)
            pos[salted] = turn[salted] % bucket_size[salted]
            rep_mask = salted & (pos >= (bucket_size - lookback))
            if rep_mask.any():
                rep = tbl.filter(pa.array(rep_mask))
                rep_salt = (salt[rep_mask] + 1).astype(np.int32)
                rep = rep.append_column(SALT_COL, pa.array(rep_salt, type=pa.int32()))
                rep = rep.append_column(
                    OWNED_COL, pa.array(np.zeros(int(rep_mask.sum()), dtype=bool))
                )
                out = pa.concat_tables([out, rep])
        return out

    return map_partitions(ds, fn)


def drop_replicas(tbl: pa.Table) -> pa.Table:
    """Drop replica rows and the salting helper columns after feature
    computation (exact dedup by (conv_id, turn_idx): every owned row
    exists exactly once across buckets)."""
    out = tbl.filter(tbl[OWNED_COL])
    return out.drop_columns([SALT_COL, OWNED_COL])
