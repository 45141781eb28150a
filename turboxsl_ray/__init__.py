"""turboxsl_ray — a from-scratch Ray-Data-native point-in-time
feature-engineering engine over Parquet transcript tables.

Re-expresses the *capabilities* of Litres/turboxsl (a multithreaded
XML+XSLT transformation library, see /root/reference) as idiomatic
streaming ``ray.data.Dataset`` stages:

- per-record rule dispatch (ref: templates.c:435-487)  → vectorized
  masked projections (:mod:`turboxsl_ray.stages.dispatch`)
- sibling-axis window navigation (ref: xpath.c:359-428) → segment-
  vectorized lag/lead/gap/session kernels
  (:mod:`turboxsl_ray.kernels.windows`)
- keyed lookups ``key()`` (ref: functions.c:1115-1165) → broadcast /
  hash joins and a sort-merge **as-of join**
  (:mod:`turboxsl_ray.stages.asof_join`)
- fork/join subtree parallelism (ref: template_task.c:24-99) → Ray
  Data streaming executor over hash-partitioned blocks
- per-thread arenas + expression caches (ref: allocator.c, xpath.c:37-51)
  → actor-pool stages with one-time ``__init__`` state

Everything here is public-API-only: ray.data, pyarrow, numpy, pandas.
"""

__version__ = "0.1.0"

from turboxsl_ray.context import ensure_hash_shuffle, tune_context  # noqa: F401

TRANSCRIPT_COLUMNS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")


def __getattr__(name):
    # lazy top-level conveniences (avoid importing ray.data at package
    # import time — the __ray_entry__ contract loads this module early)
    if name == "Engine":
        from turboxsl_ray.engine import Engine

        return Engine
    if name == "EngineConfig":
        from turboxsl_ray.engine import EngineConfig

        return EngineConfig
    raise AttributeError(name)
