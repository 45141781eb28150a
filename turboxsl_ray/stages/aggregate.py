"""Distributed aggregation / join / top-k building blocks.

Patterns (SURVEY.md §2.5-2.6), designed for the 100 TB shape:

- ``groupby_small``: partial aggregation inside ``map_batches`` (one
  tiny pre-aggregated table per block) + a driver-side final combine of
  the tiny partials. This is the shuffle-free path for low-cardinality
  keys (the reference's ``sum()``/``count()`` over a selection,
  /root/reference/src/functions.c:284-304,372-393). The data crossing
  the wire is O(blocks x groups), never O(rows).
- ``broadcast``: put a small side in the object store ONCE
  (``ray.put``) and read it zero-copy in every task — the reference's
  ``document(url)``/``key()`` lookup re-expressed as a broadcast hash
  join (functions.c:806-836, 1115-1165; its linear re-scan per call is
  the anti-pattern, TODO:15).
- ``topk``: per-block local prune (k rows max leave each block) before
  the tiny global sort — never a full ``ds.sort`` of the input.
- ``distinct_small``: per-block unique → tiny final unique, for
  low-cardinality distinct. High-cardinality dedup goes through
  hash-partition + per-group first (pipelines/text.py dedup_exact).
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from turboxsl_ray.stages.partitioning import map_partitions

# kind -> (partial columns needed)
_KINDS = ("sum", "count", "count_valid", "min", "max", "mean")



def collect_tables(ds: Dataset) -> list[pa.Table]:
    """Materialize a (tiny) dataset as Arrow tables, zero-copy from the
    object store. Only ever called on partial-aggregate outputs whose
    size is O(blocks x groups)."""
    return [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]

def _partial_block(tbl: pa.Table, keys: list[str], specs: dict[str, tuple]) -> pa.Table:
    """Per-block partial aggregate: one output row per key combo.

    Arrow's C++ group_by does the per-block work (the hot path runs
    over full input blocks); only renaming happens in Python."""
    need = set(keys)
    agg_list: list[tuple] = []  # unique (col|[], fn) requests

    def want(col, fn) -> str:
        """Request an aggregation; return Arrow's produced column name
        (dedup: two specs over the same (col, fn) share one column)."""
        req = (col if col is not None else [], fn)
        if req not in agg_list:
            agg_list.append(req)
        return f"{col}_{fn}" if col is not None else "count_all"

    out_cols: list[tuple[str, str]] = []  # (out_name, produced_name)
    for name, (col, kind) in specs.items():
        if kind not in _KINDS:
            raise ValueError(f"unknown agg kind {kind!r} (want one of {_KINDS})")
        if col is not None:
            need.add(col)
        if kind == "sum":
            out_cols.append((f"__s_{name}", want(col, "sum")))
        elif kind == "count":
            # count_all counts rows (null group keys included), matching
            # the pandas size() semantics the final combine expects
            out_cols.append((f"__c_{name}", want(None, "count_all")))
        elif kind == "count_valid":
            out_cols.append((f"__c_{name}", want(col, "count")))
        elif kind == "min":
            out_cols.append((f"__mn_{name}", want(col, "min")))
        elif kind == "max":
            out_cols.append((f"__mx_{name}", want(col, "max")))
        elif kind == "mean":
            out_cols.append((f"__s_{name}", want(col, "sum")))
            out_cols.append((f"__c_{name}", want(col, "count")))
    g = tbl.select(sorted(need)).group_by(keys, use_threads=False).aggregate(agg_list)
    cols = {k: g[k] for k in keys}
    for out_name, produced in out_cols:
        cols[out_name] = g[produced]
    return pa.table(cols)


def groupby_small(
    ds: Dataset,
    keys: list[str],
    specs: dict[str, tuple],
    round_digits: dict[str, int] | None = None,
    int_cols: tuple[str, ...] = (),
) -> pd.DataFrame:
    """Low-cardinality group-by: partial per block, tiny final on driver.

    ``specs``: out_name -> (column | None, kind) with kind in
    sum/count/count_valid/min/max/mean. ``round_digits`` rounds float
    outputs at the very end (oracle-hash stability); ``int_cols`` are
    cast to int64 (count-like outputs).
    """
    partials_ds = map_partitions(ds, lambda t: _partial_block(t, keys, specs))
    # the partials are tiny (blocks x groups); materializing them on the
    # driver is the final-combine step, not a data-scale collect.
    parts = collect_tables(partials_ds)
    if not parts:
        return pd.DataFrame(columns=keys + list(specs))
    allp = pa.concat_tables(parts, promote_options="permissive").to_pandas()
    g = allp.groupby(keys, sort=False, dropna=False)
    out: dict[str, Any] = {}
    for name, (_col, kind) in specs.items():
        if kind in ("sum",):
            out[name] = g[f"__s_{name}"].sum()
        elif kind in ("count", "count_valid"):
            out[name] = g[f"__c_{name}"].sum()
        elif kind == "min":
            out[name] = g[f"__mn_{name}"].min()
        elif kind == "max":
            out[name] = g[f"__mx_{name}"].max()
        elif kind == "mean":
            out[name] = g[f"__s_{name}"].sum() / g[f"__c_{name}"].sum()
    res = pd.DataFrame(out).reset_index()
    for name, nd in (round_digits or {}).items():
        res[name] = res[name].round(nd)
    for name in int_cols:
        res[name] = res[name].astype(np.int64)
    return res


def broadcast(obj: Any) -> "ray.ObjectRef":
    """Put a small side in the object store once; workers ``ray.get`` it
    (numpy payloads come back zero-copy). NEVER capture the object
    itself in a map_batches closure — that re-ships it per task."""
    return ray.put(obj)


def fetch(ref: Any) -> Any:
    """ray.get that tolerates being handed a plain object (tests)."""
    if isinstance(ref, ray.ObjectRef):
        return ray.get(ref)
    return ref


def probe_sorted(table_keys: np.ndarray, probe: np.ndarray):
    """The broadcast-lookup probe shared by every key()-style stage:
    searchsorted over the SORTED broadcast keys (any sortable dtype),
    clipped, plus the exact-match mask. Returns (pos, found); with an
    empty table every probe is not-found and pos is all zeros (safe to
    index any same-length payload after masking)."""
    import numpy as np

    if len(table_keys) == 0:
        return (
            np.zeros(len(probe), dtype=np.int64),
            np.zeros(len(probe), dtype=bool),
        )
    pos = np.clip(np.searchsorted(table_keys, probe), 0, len(table_keys) - 1)
    return pos, table_keys[pos] == probe


def lookup_int_keys(keys: np.ndarray, table_keys: np.ndarray, table_vals: np.ndarray,
                    default: Any = None):
    """Vectorized dict-style lookup via ``probe_sorted``. Returns
    (values, found_mask); an empty table yields all-not-found."""
    import numpy as np

    pos, found = probe_sorted(table_keys, keys)
    if len(table_keys) == 0:
        # an empty numpy array still carries its dtype — keep the
        # placeholder values type-identical to the non-empty path so
        # callers doing arithmetic before masking never see a dtype flip
        return np.zeros(len(keys), dtype=table_vals.dtype), found
    return table_vals[pos], found


def topk(
    ds: Dataset,
    keys: list[str],
    descending: list[bool],
    k: int,
    collations: list[str] | None = None,
    nulls: str = "last",
) -> pd.DataFrame:
    """Global top-k: per-block local prune, then a tiny driver-side sort.

    Analog of the reference's ``[position() <= k]`` after ``xsl:sort``
    (xpath.c:178-188, 484-576) — but at most k rows leave each block.

    ``collations`` (per key): "binary" (default byte order) or "ci"
    (case-insensitive — the reference's ``xml_strcasecmp`` path,
    xpath.c:547) via a derived lowercased sort key. ``nulls``:
    "last" | "first" — the missing-key sentinel policy (the reference
    coerces missing numeric keys to a sentinel, xpath.c:520-523)."""
    import pyarrow.compute as pc

    collations = collations or ["binary"] * len(keys)
    null_placement = "at_end" if nulls == "last" else "at_start"
    derived = [
        (f"__ci_{c}" if coll == "ci" else c)
        for c, coll in zip(keys, collations)
    ]
    sort_by = [
        (c, "descending" if d else "ascending")
        for c, d in zip(derived, descending)
    ]

    def add_ci(tbl: pa.Table) -> pa.Table:
        for c, coll in zip(keys, collations):
            if coll == "ci":
                tbl = tbl.append_column(f"__ci_{c}", pc.utf8_lower(tbl[c]))
        return tbl

    def local_prune(tbl: pa.Table) -> pa.Table:
        tbl = add_ci(tbl)
        if tbl.num_rows <= k:
            return tbl
        return tbl.sort_by(sort_by, null_placement=null_placement).slice(0, k)

    pruned = map_partitions(ds, local_prune)
    parts = collect_tables(pruned)
    if not parts:
        return pa.table({}).to_pandas()
    final = (
        pa.concat_tables(parts, promote_options="permissive")
        .sort_by(sort_by, null_placement=null_placement)
        .slice(0, k)
    )
    final = final.drop_columns([c for c in final.column_names if c.startswith("__ci_")])
    return final.to_pandas()


def distinct_small(ds: Dataset, cols: list[str]) -> pd.DataFrame:
    """Distinct over low-cardinality columns: per-block unique → tiny
    final unique."""

    def local(tbl: pa.Table) -> pa.Table:
        return tbl.select(cols).group_by(cols).aggregate([])

    pruned = map_partitions(ds, local)
    parts = collect_tables(pruned)
    if not parts:
        return pd.DataFrame(columns=cols)
    allp = pa.concat_tables(parts, promote_options="permissive")
    return allp.group_by(cols).aggregate([]).to_pandas()
