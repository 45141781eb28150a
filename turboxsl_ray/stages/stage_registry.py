"""Pluggable stage registry: name → stage factory.

The reference registers every instruction handler by name into one
dispatch table at init — ``instruction_add``
(/root/reference/src/instructions.c:480-520) — and plugins extend the
same table. This is that surface for Ray stages: a factory registered
under a name can be referenced from a declarative spec or the CLI,
and user registrations shadow builtins (the same dispatcher-order
contract as functions/registry.py).

A *stage factory* returns something usable with the engine's stage
conventions: either a callable class for
``map_batches(Cls, fn_constructor_kwargs=..., concurrency=N)``
(stateful, actor-pool) or a plain ``pa.Table -> pa.Table`` function
for ``map_partitions``.
"""

from __future__ import annotations

from typing import Any, Callable

_BUILTINS: dict[str, Callable[..., Any]] = {}
_USER: dict[str, Callable[..., Any]] = {}


def register_stage(name: str, factory: Callable[..., Any], *, builtin: bool = False) -> None:
    (_BUILTINS if builtin else _USER)[name] = factory


def make_stage(name: str, **kwargs: Any) -> Any:
    """Instantiate the stage registered under ``name``."""
    factory = _USER.get(name) or _BUILTINS.get(name)
    if factory is None:
        raise KeyError(
            f"no stage registered under {name!r} "
            f"(available: {sorted(available_stages())})"
        )
    return factory(**kwargs)


def available_stages() -> dict[str, Callable[..., Any]]:
    out = dict(_BUILTINS)
    out.update(_USER)
    return out


def _register_builtins() -> None:
    from turboxsl_ray.stages.cached_lookup import CachedLookupStage
    from turboxsl_ray.stages.streaming_window import StreamingWindowStage
    from turboxsl_ray.stages.window_stage import WindowSpec, make_window_fn

    register_stage("streaming_window", StreamingWindowStage, builtin=True)
    register_stage("cached_lookup", CachedLookupStage, builtin=True)
    register_stage(
        "window",
        lambda spec=None, **kw: make_window_fn(spec or WindowSpec(**kw)),
        builtin=True,
    )


_register_builtins()
