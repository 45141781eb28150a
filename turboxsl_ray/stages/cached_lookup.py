"""Read-through cached lookup: the reference's hottest pattern.

``ltr:url_code`` (2132 production calls — the call-frequency comment
at /root/reference/src/functions.c:1345) resolves through a 3-level
read-through cache: in-process concurrent dict → memcached (20-min
TTL, external_cache.c:112,128-172) → a Perl callback under a global
lock (functions.c:23-37, 919-990).

Here the same shape is an actor-pool ``map_batches`` stage: a per-actor
LRU (level 1, survives across batches — the analog of the per-worker
concurrent dict), an optional SHARDED shared store (level 2 — the
memcached analog, which in the reference is itself a sharded cache
tier), and the user's compute function (level 3) called ONCE per
distinct missing key per batch, vectorized over the batch's unique
keys. No global lock anywhere — each actor owns its LRU, and each
store shard is an actor mailbox, not a mutex. Keys route to shards by
a deterministic crc32 (stable across processes — Python's builtin
``hash`` is per-process salted), so at 100× key cardinality no single
actor mailbox serializes the miss traffic.
"""

from __future__ import annotations

import zlib
from collections import OrderedDict
from typing import Callable

import numpy as np
import pyarrow as pa

import ray

from turboxsl_ray.kernels.arrays import as_array


@ray.remote(num_cpus=0)
class SharedStore:
    """One level-2 cache shard: a tiny dict-holding actor. Values are
    plain Python objects; no TTL at sandbox scale (the reference's
    memcached tier uses a 20-min TTL, external_cache.c:112)."""

    def __init__(self):
        self._d: dict = {}

    def get_many(self, keys: list):
        return [self._d.get(k) for k in keys]

    def put_many(self, keys: list, values: list) -> None:
        self._d.update(zip(keys, values))

    def size(self) -> int:
        return len(self._d)


def _shard_key(k) -> int:
    return zlib.crc32(str(k).encode())


# Lazily-created per-process store pool, shared by every cached-lookup
# plan built in this driver process. LIFETIME: the pool is created on
# the first get_store_pool() call after Ray is up and the SAME handles
# are reused by later plans (bench loops, pytest sessions build many
# q_url_code datasets — without the memoization each plan would strand
# one more actor for as long as its Dataset object lives). The actors
# are owned by this process and die with it; release_store_pool()
# kills them explicitly (test teardown).
_POOL: list = []


def get_store_pool(n_shards: int = 2) -> list:
    if len(_POOL) != n_shards:
        release_store_pool()
        _POOL.extend(SharedStore.remote() for _ in range(n_shards))
    return list(_POOL)


def release_store_pool() -> None:
    for a in _POOL:
        ray.kill(a)
    _POOL.clear()


class CachedLookupStage:
    """Actor-pool callable: appends ``out_col`` computed by
    ``compute_fn(list_of_keys) -> list_of_values`` with per-actor LRU
    + optional sharded shared store in front of it.

    Usage::

        store = get_store_pool(2)   # or a single actor, or None
        ds.map_batches(
            CachedLookupStage,
            fn_constructor_kwargs=dict(key_col="conv_id",
                                       out_col="url_code",
                                       compute_fn=my_fn,
                                       store=store),
            batch_format="pyarrow", concurrency=4)

    ``store`` may be None (2-level path), one SharedStore handle, or a
    list of handles — keys route to ``shards[crc32(key) % n]``, and the
    per-shard get/put round-trips of one batch are issued concurrently
    (one ray.get over all shard futures).
    """

    def __init__(
        self,
        key_col: str,
        out_col: str,
        compute_fn: Callable[[list], list],
        store=None,
        capacity: int = 100_000,
    ):
        self.key_col = key_col
        self.out_col = out_col
        self.compute = compute_fn
        self.shards = (
            [] if store is None else store if isinstance(store, list) else [store]
        )
        self.capacity = capacity
        self.lru: OrderedDict = OrderedDict()
        self.hits = 0
        self.store_hits = 0
        self.misses = 0

    def _lru_put(self, k, v) -> None:
        self.lru[k] = v
        self.lru.move_to_end(k)
        if len(self.lru) > self.capacity:
            self.lru.popitem(last=False)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        keys = as_array(tbl[self.key_col]).to_pylist()
        uniq = list(dict.fromkeys(keys))  # order-stable distinct
        resolved: dict = {}
        missing = []
        for k in uniq:
            if k in self.lru:
                self.lru.move_to_end(k)
                resolved[k] = self.lru[k]
                self.hits += 1
            else:
                missing.append(k)
        if missing and self.shards:
            n = len(self.shards)
            by_shard: dict[int, list] = {}
            for k in missing:
                by_shard.setdefault(_shard_key(k) % n, []).append(k)
            order = list(by_shard)
            replies = ray.get(
                [self.shards[s].get_many.remote(by_shard[s]) for s in order]
            )  # ONE gather over every shard future — round-trips overlap
            still = []
            for s, vals in zip(order, replies):
                for k, v in zip(by_shard[s], vals):
                    if v is not None:
                        resolved[k] = v
                        self._lru_put(k, v)
                        self.store_hits += 1
                    else:
                        still.append(k)
            missing = still
        if missing:
            computed = self.compute(missing)
            for k, v in zip(missing, computed):
                resolved[k] = v
                self._lru_put(k, v)
            self.misses += len(missing)
            if self.shards:
                n = len(self.shards)
                by_shard2: dict[int, tuple[list, list]] = {}
                for k, v in zip(missing, computed):
                    ks, vs = by_shard2.setdefault(_shard_key(k) % n, ([], []))
                    ks.append(k)
                    vs.append(v)
                for s, (ks, vs) in by_shard2.items():
                    self.shards[s].put_many.remote(ks, vs)
        out = [resolved[k] for k in keys]
        return tbl.append_column(self.out_col, pa.array(out))

    def stats(self) -> dict:
        return {
            "hits": self.hits,
            "store_hits": self.store_hits,
            "misses": self.misses,
        }
