"""Large-large equi-join: co-partition both sides by the key, join
per block.

The broadcast path (stages/aggregate.broadcast) covers small
dimensions — the reference's ``document()`` lookup. When BOTH sides
are large, neither fits a broadcast: align schemas, tag rows with
``__src``, union the two streaming Datasets, hash-repartition ONCE by
the join key, and run a C-speed hash join inside each block (both
sides of every key are now co-located). Same single-exchange shape as
the as-of join (stages/asof_join.py), with equality instead of
backward-nearest semantics.

Reference analog: ``key(name, value)`` over a large secondary document
— which the reference re-scans linearly per call
(/root/reference/src/functions.c:1115-1165, admitted in TODO:15).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from turboxsl_ray.kernels.arrays import as_array
from turboxsl_ray.stages.partitioning import map_partitions, partition_by_conv

SRC_COL = "__src"
SALT_COL = "__salt"


def copartition_join(
    left: Dataset,
    right: Dataset,
    *,
    on: str,
    how: str = "inner",
    num_partitions: int = 16,
    left_block_prep=None,
    left_schema: "pa.Schema | None" = None,
    right_schema: "pa.Schema | None" = None,
    hot_keys: "dict | None" = None,
    bloom_prune_right: bool = False,
) -> Dataset:
    """Equi-join two large Datasets on ``on`` (non-key column names
    must be disjoint). ``how`` in {"inner", "left"}.

    ``left_block_prep``: optional ``pa.Table -> pa.Table`` applied to
    each co-partitioned LEFT block before the join — lets callers fuse
    a key-partitioned operation (e.g. a distinct whose key includes
    ``on``) into the join's exchange instead of paying a shuffle of
    their own.

    ``left_schema``/``right_schema``: pass when the caller knows its
    side's schema (prepped blocks usually declare one) — probing the
    schema of a map_batches Dataset executes a limit-1 plan, a
    measurable per-query fixed cost.

    ``hot_keys``: skew plan ``{key value -> bucket count}`` from the
    caller's count pre-pass (stages/salting.conv_counts shape). A hot
    key's LEFT rows spread uniformly over its buckets (deterministic
    per-block cumcount % nb — retry-idempotent), its RIGHT rows
    replicate to every bucket, and the exchange keys on
    ``(on, salt)`` — so one Zipf-hot key no longer pins its whole
    probe side to a single reducer. Results are identical to the
    unsalted plan (each left row meets the full right side of its key
    exactly once); replication cost = hot right rows x buckets, which
    the caller bounds by only salting keys above its threshold."""
    if how not in ("inner", "left", "full"):
        raise ValueError(f"unsupported join type {how!r}")
    if hot_keys and left_block_prep is not None:
        # a fused left-block op (e.g. block-local distinct keyed on
        # ``on``) assumes a block holds ALL left rows of its keys;
        # salting spreads a hot key's rows across buckets and silently
        # breaks that assumption — refuse instead
        raise ValueError("hot_keys salting cannot be combined with left_block_prep")
    if how == "full" and bloom_prune_right:
        raise ValueError("bloom_prune_right would drop full-outer right rows")
    if how == "full" and hot_keys:
        # replicated right rows of a hot key would each emit their own
        # unmatched row when nothing joins; a full-outer plan must salt
        # the LEFT side only (not needed yet — fail loudly instead)
        raise ValueError("hot_keys salting is not supported for full outer joins")

    def _schema(ds: Dataset) -> "pa.Schema | None":
        s = ds.schema()
        if s is None:  # fully empty dataset (zero blocks)
            return None
        base = getattr(s, "base_schema", s)
        if not isinstance(base, pa.Schema):
            base = pa.schema(list(zip(s.names, s.types)))
        return base

    lschema = left_schema if left_schema is not None else _schema(left)
    rschema = right_schema if right_schema is not None else _schema(right)
    if rschema is None and how in ("left", "full") and lschema is not None:
        # left/full join must KEEP left rows even when the right side
        # is empty — but a schema-less right gives no types for the
        # null columns. Silently returning empty would drop left rows.
        raise ValueError(
            "right side is schema-less (zero blocks); pass right_schema= "
            "so the left/full join can emit typed null columns"
        )
    if lschema is None or rschema is None:
        # a fully empty required side surfaces as schema-less (zero
        # blocks); an inner join of nothing is nothing — callers' block
        # fns must (and do) tolerate a zero-column empty block
        import ray.data as rd

        return rd.from_arrow(pa.table({}))
    lnames = list(lschema.names)
    rnames = [n for n in rschema.names if n != on]
    overlap = set(lnames) & set(rnames)
    if overlap:
        raise ValueError(f"overlapping non-key columns: {sorted(overlap)}")

    out_names = lnames + rnames + [SRC_COL]
    out_types = {n: lschema.field(n).type for n in lnames}
    for n in rnames:
        out_types[n] = rschema.field(n).type
    out_types[SRC_COL] = pa.int8()
    if hot_keys:
        out_names = out_names + [SALT_COL]
        out_types[SALT_COL] = pa.int64()
        hot_vals = pa.array(list(hot_keys)).cast(out_types[on])
        hot_nb = np.asarray(list(hot_keys.values()), dtype=np.int64)

    def _bucket_counts(key_col) -> np.ndarray:
        """Per-row bucket count: hot_keys[k] for hot keys, 1 otherwise."""
        import pyarrow.compute as pc

        idx = pc.index_in(as_array(key_col), value_set=hot_vals)
        nb = np.ones(len(idx), dtype=np.int64)
        valid = idx.is_valid().to_numpy(zero_copy_only=False)
        if valid.any():
            nb[valid] = hot_nb[
                idx.to_numpy(zero_copy_only=False)[valid].astype(np.int64)
            ]
        return nb

    def _cumcount_mod(key_col, nb: np.ndarray) -> np.ndarray:
        """Deterministic per-block occurrence counter per key, mod nb —
        spreads a hot key's left rows uniformly over its buckets
        without RNG (identical on task retry)."""
        codes = (
            as_array(key_col).dictionary_encode()
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        )
        n = len(codes)
        order = np.argsort(codes, kind="stable")
        seg_start = np.concatenate(([True], codes[order][1:] != codes[order][:-1]))
        pos = np.arange(n) - np.maximum.accumulate(
            np.where(seg_start, np.arange(n), 0)
        )
        cum = np.empty(n, dtype=np.int64)
        cum[order] = pos
        return cum % np.maximum(nb, 1)

    def align(src: int):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = []
            for name in out_names:
                if name == SRC_COL:
                    cols.append(pa.array(np.full(n, src, dtype=np.int8)))
                elif name == SALT_COL:
                    cols.append(pa.array(np.zeros(n, dtype=np.int64)))
                elif name in t.column_names:
                    cols.append(t[name].cast(out_types[name]))
                else:
                    cols.append(pa.nulls(n, type=out_types[name]))
            base = pa.table(dict(zip(out_names, cols)))
            if not hot_keys or n == 0:
                return base
            nb = _bucket_counts(base[on])
            if src == 0:
                salt = _cumcount_mod(base[on], nb)
                return base.set_column(
                    base.column_names.index(SALT_COL),
                    SALT_COL,
                    pa.array(salt, type=pa.int64()),
                )
            if not (nb > 1).any():
                return base
            take_idx = np.repeat(np.arange(n), nb)
            starts = np.concatenate(([0], np.cumsum(nb[:-1])))
            salt = np.arange(int(nb.sum()), dtype=np.int64) - np.repeat(starts, nb)
            rep = base.take(pa.array(take_idx))
            return rep.set_column(
                rep.column_names.index(SALT_COL),
                SALT_COL,
                pa.array(salt, type=pa.int64()),
            )

        return fn

    if bloom_prune_right:
        import ray

        from turboxsl_ray.stages.aggregate import broadcast
        from turboxsl_ray.stages.bloom import bloom_mask, build_bloom

        bloom_ref = broadcast(build_bloom(left, on))
        align_r = align(1)

        def right_fn(t: pa.Table) -> pa.Table:
            if t.num_rows:
                t = t.filter(pa.array(bloom_mask(t[on], ray.get(bloom_ref))))
            return align_r(t)
    else:
        right_fn = align(1)

    combined = map_partitions(left, align(0)).union(map_partitions(right, right_fn))
    shuffle_keys = [on, SALT_COL] if hot_keys else [on]
    parts = partition_by_conv(combined, num_partitions, keys=shuffle_keys)

    join_type = {"inner": "inner", "left": "left outer", "full": "full outer"}[how]

    def block_join(t: pa.Table) -> pa.Table:
        src = as_array(t[SRC_COL]).to_numpy(zero_copy_only=False)
        lmask = pa.array(src == 0)
        rmask = pa.array(src == 1)
        if hot_keys:
            # the shuffle can co-locate SEVERAL salt buckets of one hot
            # key in one partition; joining on the key alone would match
            # a left row against every co-located right replica (one per
            # bucket) and emit duplicates — the salt must stay a join key
            lt = t.filter(lmask).select([*lnames, SALT_COL])
            rt = t.filter(rmask).select([on, *rnames, SALT_COL])
            out = lt.join(rt, keys=[on, SALT_COL], join_type=join_type)
            return out.drop_columns([SALT_COL])
        lt = t.filter(lmask).select([*lnames])
        if left_block_prep is not None:
            lt = left_block_prep(lt)
        rt = t.filter(rmask).select([on, *rnames])
        # Arrow's C++ hash join, block-local (both sides co-located)
        return lt.join(rt, keys=on, join_type=join_type)

    return map_partitions(parts, block_join)
