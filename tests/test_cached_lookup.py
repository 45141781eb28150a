"""Read-through cached-lookup stage: correctness + cache behavior."""

from __future__ import annotations

import pyarrow as pa


def _code(keys):
    return [f"code-{k}" for k in keys]


def test_cached_lookup_correct_and_caches(ray_session):
    from turboxsl_ray.stages.cached_lookup import CachedLookupStage

    stage = CachedLookupStage(
        key_col="k", out_col="code", compute_fn=_code, capacity=100
    )
    b1 = pa.table({"k": pa.array(["a", "b", "a", "c"])})
    out1 = stage(b1)
    assert out1["code"].to_pylist() == ["code-a", "code-b", "code-a", "code-c"]
    assert stage.stats()["misses"] == 3 and stage.stats()["hits"] == 0
    # second batch: all keys resolve from the per-actor LRU
    out2 = stage(pa.table({"k": pa.array(["b", "c", "a"])}))
    assert out2["code"].to_pylist() == ["code-b", "code-c", "code-a"]
    assert stage.stats()["misses"] == 3 and stage.stats()["hits"] == 3


def test_cached_lookup_shared_store(ray_session):
    from turboxsl_ray.stages.cached_lookup import CachedLookupStage, SharedStore

    store = SharedStore.remote()
    s1 = CachedLookupStage("k", "code", _code, store=store)
    s1(pa.table({"k": pa.array(["x", "y"])}))
    import ray

    ray.get(store.put_many.remote([], []))  # flush ordering barrier
    # a DIFFERENT actor instance hits the shared store, not compute
    s2 = CachedLookupStage("k", "code", _code, store=store)
    out = s2(pa.table({"k": pa.array(["x", "y", "z"])}))
    assert out["code"].to_pylist() == ["code-x", "code-y", "code-z"]
    assert s2.stats()["store_hits"] == 2 and s2.stats()["misses"] == 1


def test_cached_lookup_sharded_store(ray_session):
    """Level-2 sharding: keys route by crc32 across a pool of store
    actors; a fresh stage instance resolves every key from the shards
    (no recompute), and both shards hold a share of the key space."""
    import ray

    from turboxsl_ray.stages.cached_lookup import (
        CachedLookupStage,
        _shard_key,
        get_store_pool,
        release_store_pool,
    )

    release_store_pool()
    pool = get_store_pool(2)
    assert get_store_pool(2) == pool  # memoized — no actor per plan
    keys = [f"k{i}" for i in range(40)]
    s1 = CachedLookupStage("k", "code", _code, store=pool)
    s1(pa.table({"k": pa.array(keys)}))
    ray.get([a.put_many.remote([], []) for a in pool])  # flush barrier
    sizes = ray.get([a.size.remote() for a in pool])
    assert sum(sizes) == 40
    expect = [sum(_shard_key(k) % 2 == s for k in keys) for s in (0, 1)]
    assert sizes == expect and min(sizes) > 0
    s2 = CachedLookupStage("k", "code", _code, store=pool)
    out = s2(pa.table({"k": pa.array(keys)}))
    assert out["code"].to_pylist() == [f"code-{k}" for k in keys]
    assert s2.stats()["store_hits"] == 40 and s2.stats()["misses"] == 0
    release_store_pool()
    assert get_store_pool(2) != pool  # killed pool is not handed back


def test_cached_lookup_in_pipeline(ray_session):
    import ray.data

    from turboxsl_ray.stages.cached_lookup import CachedLookupStage

    # compute_fn must pickle BY VALUE (a local closure): a module-level
    # function from a test file pickles by reference and Ray workers
    # cannot import the pytest module
    def code_local(keys):
        return [f"code-{k}" for k in keys]

    ds = ray.data.from_arrow(pa.table({"k": pa.array(["a", "b"] * 500)}))
    out = ds.map_batches(
        CachedLookupStage,
        fn_constructor_kwargs=dict(key_col="k", out_col="code", compute_fn=code_local),
        batch_size=128,
        batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    assert (out["code"] == "code-" + out["k"]).all()


def test_lru_eviction():
    from turboxsl_ray.stages.cached_lookup import CachedLookupStage

    stage = CachedLookupStage("k", "c", _code, capacity=2)
    stage(pa.table({"k": pa.array(["a", "b", "c"])}))  # evicts 'a'
    assert list(stage.lru) == ["b", "c"]
    stage(pa.table({"k": pa.array(["a"])}))
    assert stage.stats()["misses"] == 4  # 'a' recomputed after eviction
