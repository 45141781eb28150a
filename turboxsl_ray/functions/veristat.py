"""``ltr:veristat`` / ``ltr:veristat_local`` analog: per-key scalar
config/statistics lookup against a job-level table loaded once.

In the reference this is the second-hottest production function (642
calls, /root/reference/src/functions.c:1346): it reads a per-partner
statistic from configuration state initialized at transform setup.
Here the config is a small dict distilled to sorted arrays, put in the
object store ONCE (``ray.put``), and every batch answers lookups with
one vectorized searchsorted — the broadcast-small-side pattern (never
re-shipped per batch, never a shuffle)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from turboxsl_ray.stages.aggregate import broadcast


def load_veristat(config: dict[str, float]) -> "ray.ObjectRef":
    keys = np.array(sorted(config), dtype=object).astype(str)
    vals = np.array([float(config[k]) for k in sorted(config)], dtype=np.float64)
    return broadcast({"keys": keys, "vals": vals})


def veristat(arr: "pa.Array | pa.ChunkedArray", ref, default: float = 1.0) -> pa.Array:
    """float64 config value per row; ``default`` for unknown keys."""
    from turboxsl_ray.kernels.arrays import as_array

    from turboxsl_ray.stages.aggregate import probe_sorted

    side = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
    keys, vals = side["keys"], side["vals"]
    probe = as_array(arr).to_numpy(zero_copy_only=False).astype(str)
    pos, found = probe_sorted(keys, probe)
    if len(keys) == 0:
        return pa.array(np.full(len(probe), default, dtype=np.float64))
    out = np.where(found, vals[pos], default)
    return pa.array(out, type=pa.float64())


from turboxsl_ray.functions.registry import register  # noqa: E402

register("ltr:veristat", veristat, builtin=True)
register("ltr:veristat_local", veristat, builtin=True)
