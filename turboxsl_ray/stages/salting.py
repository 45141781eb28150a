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

import pyarrow as pa

from ray.data import Dataset

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

    if floor == 0 and min_total is not None:
        # keep-all mode (floor degenerated because the scan spans more
        # blocks than min_total): the per-block partials now carry
        # EVERY conversation, so a driver-side concat would receive
        # distinct-convs x blocks rows — the 100 TB failure mode. Push
        # the combine through ONE hash exchange of the partial counts
        # (never the full rows); only the mega survivors reach the
        # driver.
        import pyarrow.compute as pc

        from turboxsl_ray.stages.partitioning import (
            map_partitions,
            partition_by_conv,
        )

        shuffled = partition_by_conv(partials, 16, keys=[key])

        def combine(t: pa.Table) -> pa.Table:
            # key type comes from the partials' own schema (present
            # even on empty exchange partitions) — hardcoding a type
            # here would silently cast non-string keys in this branch
            # only, diverging from the exact-type non-keep-all path
            out_schema = pa.schema(
                [(key, t.schema.field(key).type), ("n_sum", pa.int64())]
            )
            if t.num_rows == 0:
                # keep one schema across blocks: empty partitions must
                # emit (key, n_sum), not the input's (key, n)
                return out_schema.empty_table()
            g = t.group_by(key).aggregate([("n", "sum")])
            g = g.filter(pc.greater(g["n_sum"], int(min_total)))
            return g.select([key, "n_sum"]).cast(out_schema)

        rows = map_partitions(shuffled, combine).take_all()
        return {r[key]: int(r["n_sum"]) for r in rows}

    from turboxsl_ray.stages.aggregate import collect_tables

    tables = [t for t in collect_tables(partials) if t.num_rows]
    if not tables:
        return {}
    # Arrow hash-aggregate combine (vectorized), not a Python dict loop:
    # with a floor the partials hold only mega-candidate convs, so this
    # is tiny (mega candidates x blocks worst case, never full rows).
    g = pa.concat_tables(tables).group_by(key).aggregate([("n", "sum")])
    if min_total is not None:
        import pyarrow.compute as pc

        g = g.filter(pc.greater(g["n_sum"], int(min_total)))
    return dict(
        zip(g[key].to_pylist(), (int(n) for n in g["n_sum"].to_pylist()))
    )


# The salt/replica application itself lives in pipelines/flagship.py
# (_salt_left/_salt_right) where it is fused with part-id assignment —
# this module owns the selection pre-pass and the column contract.
