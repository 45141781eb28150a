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


def test_hist_quantile_error_bound():
    """Merged-histogram quantiles are within one bin width of exact."""
    import numpy as np

    from turboxsl_ray.kernels.sketches import hist_partial, hist_quantiles

    rng = np.random.default_rng(3)
    data = rng.lognormal(3.0, 1.0, size=50_000)
    lo, hi = float(data.min()), float(data.max())
    bins = 512
    # partials over arbitrary chunking merge by ADD
    merged = np.zeros(bins, dtype=np.int64)
    for chunk in np.array_split(data, 17):
        merged += hist_partial(chunk, lo, hi, bins)
    qs = [0.25, 0.5, 0.9, 0.99]
    est = hist_quantiles(merged, lo, hi, qs)
    exact = np.quantile(data, qs)
    width = (hi - lo) / bins
    assert (np.abs(est - exact) <= width + 1e-9).all()


def test_cms_overcounts_and_recovers_heavy_hitters():
    import numpy as np
    import pyarrow as pa

    from turboxsl_ray.kernels.sketches import cms_estimate, cms_partial

    rng = np.random.default_rng(4)
    vals = rng.zipf(1.3, size=30_000).astype(np.int64) % 5000
    arr = pa.array(vals, pa.int64())
    # partials over chunks merge by ADD
    sketch = None
    for chunk in np.array_split(vals, 9):
        part = cms_partial(pa.array(chunk, pa.int64()))
        sketch = part if sketch is None else sketch + part
    uniq, true_counts = np.unique(vals, return_counts=True)
    est = cms_estimate(sketch, pa.array(uniq, pa.int64()))
    assert (est >= true_counts).all()  # CMS never undercounts
    # top-10 by estimate contains the true top-10
    true_top = set(uniq[np.argsort(-true_counts, kind="stable")[:10]])
    est_top = set(uniq[np.argsort(-est, kind="stable")[:20]])
    assert true_top <= est_top


def test_q_heavy_hitters_matches_exact_topk(ray_session):
    import duckdb
    import numpy as np

    from turboxsl_ray.pipelines.relational import q_heavy_hitters

    sf = "/root/testdata/sf0.001"
    df = q_heavy_hitters(sf, k=10)
    con = duckdb.connect()
    exact = con.execute(
        f"""SELECT user_id, COUNT(*) AS n
            FROM read_parquet('{sf}/events.parquet')
            GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10"""
    ).df()
    # estimated counts never undercount the true counts
    true_map = dict(zip(exact["user_id"], exact["n"]))
    got = set(df["user_id"].astype(int))
    # at least 8 of the exact top-10 recovered (CMS collisions may
    # promote a near-tie), and every overlap obeys est >= true
    assert len(got & set(true_map)) >= 8
    for u, est in zip(df["user_id"].astype(int), df["est_count"]):
        if u in true_map:
            assert est >= true_map[u]


def test_q_approx_quantiles_bound(ray_session):
    import duckdb
    import numpy as np

    from turboxsl_ray.pipelines.relational import QUANTILE_QS, q_approx_quantiles

    sf = "/root/testdata/sf0.001"
    df = q_approx_quantiles(sf)
    con = duckdb.connect()
    exact = con.execute(
        f"""SELECT quantile_cont(l_extendedprice, {list(QUANTILE_QS)}) AS q,
                   MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
            FROM read_parquet('{sf}/lineitem.parquet')"""
    ).fetchone()
    exact_q, lo, hi = np.array(exact[0]), exact[1], exact[2]
    width = (hi - lo) / 512
    assert (np.abs(df["value_est"].to_numpy() - exact_q) <= width + 1e-6).all()


def test_approx_quantiles_tolerates_empty_shard_mix(ray_session, tmp_path):
    """A lineitem directory mixing an EMPTY parquet shard with real
    ones (the shape a resumed/filtered input produces) must not crash
    the min/max pre-pass (review regression: np.min of empty block)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from turboxsl_ray.pipelines.relational import q_approx_quantiles

    d = tmp_path / "sf"
    d.mkdir()
    (d / "lineitem.parquet").mkdir()
    vals = np.linspace(1.0, 100.0, 500)
    tbl = pa.table({"l_extendedprice": pa.array(vals)})
    pq.write_table(tbl, str(d / "lineitem.parquet" / "a.parquet"))
    pq.write_table(tbl.slice(0, 0), str(d / "lineitem.parquet" / "b.parquet"))

    out = q_approx_quantiles(str(d))
    assert len(out) > 0
    # sanity: the median estimate lands inside the value range
    q50 = float(out[out["q"] == 0.5]["value_est"].iloc[0])
    assert 1.0 <= q50 <= 100.0
