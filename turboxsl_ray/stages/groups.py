"""Per-conversation user functions: the ``xsl:for-each`` /
apply-templates-per-subtree surface (reference: a template applied per
selected node's subtree, /root/reference/src/instructions.c:302-336).

``map_conversations`` gives users the reference's unit of work — one
whole, sorted conversation — without paying Ray's per-group task
overhead: conversations are hash-co-partitioned once, each block is
segmented vectorized, and the user fn runs per contiguous slice. This
is the escape hatch for logic the vectorized kernels can't express;
the kernels remain the hot path.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from turboxsl_ray.kernels import windows as W
from turboxsl_ray.stages.partitioning import map_partitions, partition_by_conv, sort_block


def map_conversations(
    ds: Dataset,
    fn: Callable[[pa.Table], pa.Table],
    *,
    key: str = "conv_id",
    num_partitions: int = 16,
    sort_keys: tuple = ("ts", "turn_idx"),
) -> Dataset:
    """Apply ``fn`` to each whole conversation (a sorted ``pa.Table``
    slice); outputs are concatenated per block. ONE shuffle total."""
    parts = partition_by_conv(ds, num_partitions, keys=[key])

    def per_block(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl
        tbl = sort_block(tbl, keys=[key, *sort_keys])
        starts = W.segment_starts_from_arrow(tbl[key])
        bounds = np.flatnonzero(starts)
        ends = np.append(bounds[1:], tbl.num_rows)
        outs = []
        for s, e in zip(bounds, ends):
            outs.append(fn(tbl.slice(s, e - s)))
        return pa.concat_tables(outs, promote_options="permissive")

    return map_partitions(parts, per_block)
