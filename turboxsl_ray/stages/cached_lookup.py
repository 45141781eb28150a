"""Read-through cached lookup: the reference's hottest pattern.

``ltr:url_code`` (2132 production calls — the call-frequency comment
at /root/reference/src/functions.c:1345) resolves through a 3-level
read-through cache: in-process concurrent dict → memcached (20-min
TTL, external_cache.c:112,128-172) → a Perl callback under a global
lock (functions.c:23-37, 919-990).

Here the same shape is an actor-pool ``map_batches`` stage: a per-actor
LRU (level 1, survives across batches — the analog of the per-worker
concurrent dict), an optional shared store actor (level 2, one per
job — the memcached analog), and the user's compute function (level
3) called ONCE per distinct missing key per batch, vectorized over the
batch's unique keys. No global lock anywhere — each actor owns its
LRU, and the shared store is an actor mailbox, not a mutex.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable

import numpy as np
import pyarrow as pa

import ray

from turboxsl_ray.kernels.arrays import as_array


@ray.remote(num_cpus=0)
class SharedStore:
    """Level-2 cache: one tiny actor per job (the memcached analog).
    Values are plain Python objects; no TTL at sandbox scale."""

    def __init__(self):
        self._d: dict = {}

    def get_many(self, keys: list):
        return [self._d.get(k) for k in keys]

    def put_many(self, keys: list, values: list) -> None:
        self._d.update(zip(keys, values))

    def size(self) -> int:
        return len(self._d)


class CachedLookupStage:
    """Actor-pool callable: appends ``out_col`` computed by
    ``compute_fn(list_of_keys) -> list_of_values`` with per-actor LRU
    + optional shared store in front of it.

    Usage::

        store = SharedStore.remote()   # or None for 2-level
        ds.map_batches(
            CachedLookupStage,
            fn_constructor_kwargs=dict(key_col="conv_id",
                                       out_col="url_code",
                                       compute_fn=my_fn,
                                       store=store),
            batch_format="pyarrow", concurrency=4)
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
        self.store = store
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
        if missing and self.store is not None:
            vals = ray.get(self.store.get_many.remote(missing))
            still = []
            for k, v in zip(missing, vals):
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
            if self.store is not None:
                self.store.put_many.remote(missing, computed)
        out = [resolved[k] for k in keys]
        return tbl.append_column(self.out_col, pa.array(out))

    def stats(self) -> dict:
        return {
            "hits": self.hits,
            "store_hits": self.store_hits,
            "misses": self.misses,
        }
