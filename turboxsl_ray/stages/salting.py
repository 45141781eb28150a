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


def conv_counts(
    ds: Dataset, key: str = "conv_id", min_total: int | None = None
) -> dict[str, int]:
    """Turns per conversation via partial per-block counts + tiny final
    groupby (pre-aggregation pattern — the full rows never shuffle).

    ``min_total`` keeps only conversations with MORE than that many
    rows — at 10^12-turn scale only the mega conversations come back
    to the driver, never the full conv dictionary.
    """

    def partial(tbl: pa.Table) -> pa.Table:
        g = tbl.group_by(key).aggregate([(key, "count")])
        return g.rename_columns([key, "n"])

    partials = ds.select_columns([key]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    from ray.data.aggregate import Sum

    agg = partials.groupby(key).aggregate(Sum("n", alias_name="n"))
    if min_total is not None:
        thr = int(min_total)
        def keep_big(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.greater(t["n"], thr))

        agg = agg.map_batches(keep_big, batch_format="pyarrow")
    out = agg.take_all()
    return {r[key]: int(r["n"]) for r in out}


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
