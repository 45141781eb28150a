"""``chk:check_rights`` analog: row-key membership in a broadcast
rights set.

The reference parses a comma-separated rights string once per
transform into a lookup structure and then tests membership per call
(/root/reference/src/functions.c:859-878, group_rights.c:12-67; one of
its hottest functions — 202 production calls, functions.c:1349).

Here the rights set is distilled once (distinct, driver-side tiny),
``ray.put`` into the object store, and every batch answers membership
with ONE vectorized searchsorted over the sorted set — the
broadcast-small-side pattern, never a per-row registry probe and never
a shuffle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from turboxsl_ray.stages.aggregate import broadcast


def build_rights(values) -> "ray.ObjectRef":
    """Distill + broadcast a rights set (any int-keyed entitlement
    universe). Returns an object-store ref workers read zero-copy."""
    arr = np.unique(np.asarray(values, dtype=np.int64))
    return broadcast(arr)


def check_rights(arr: "pa.Array | pa.ChunkedArray", rights_ref) -> pa.Array:
    """Boolean membership mask for ``arr`` against the broadcast set."""
    from turboxsl_ray.kernels.arrays import as_array

    from turboxsl_ray.stages.aggregate import lookup_int_keys

    keys = ray.get(rights_ref) if isinstance(rights_ref, ray.ObjectRef) else rights_ref
    vals = as_array(arr).to_numpy(zero_copy_only=False).astype(np.int64)
    _, found = lookup_int_keys(vals, keys, keys)
    return pa.array(found)


from turboxsl_ray.functions.registry import register  # noqa: E402

register("chk:check_rights", check_rights, builtin=True)
