"""HyperLogLog sketch: error bound + merge associativity + the
distributed approx-distinct query vs the exact count."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_hll_error_bound():
    from turboxsl_ray.kernels.sketches import hll_estimate, hll_partial

    for n in (100, 5000, 200_000):
        vals = pa.array([f"v{i}" for i in range(n)])
        est = hll_estimate(hll_partial(vals))
        assert abs(est - n) / n < 0.05, (n, est)


def test_hll_merge_equals_single_pass():
    from turboxsl_ray.kernels.sketches import hll_estimate, hll_merge, hll_partial

    vals = [f"x{i}" for i in range(30_000)]
    whole = hll_partial(pa.array(vals))
    parts = [hll_partial(pa.array(vals[i::7])) for i in range(7)]  # overlapping-free split
    merged = hll_merge(parts)
    np.testing.assert_array_equal(whole, merged)
    assert hll_estimate(merged) == hll_estimate(whole)


def test_approx_distinct_query_close_to_exact(ray_session):
    import duckdb

    from turboxsl_ray.pipelines.relational import q_approx_distinct_parts

    sf = "/root/testdata/sf0.01"
    est = int(q_approx_distinct_parts(sf)["approx_n_parts"].iloc[0])
    exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT l_partkey) FROM read_parquet('{sf}/lineitem.parquet')"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.05, (est, exact)
