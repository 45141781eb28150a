"""UDF registry: named vectorized functions usable in feature specs.

Reference analog: ``register_function`` + ``xpath_call_dispatcher``
(/root/reference/src/functions.c:1420-1438, 1395-1417) — externally
registered functions are tried BEFORE builtins, so a user registration
overrides a builtin of the same name. Unlike the reference's
global-lock Perl bridge (functions.c:23-37), these are plain Python
callables over Arrow arrays, vectorized per batch and shipped to
workers inside the task closure.
"""

from __future__ import annotations

from typing import Any, Callable

_BUILTINS: dict[str, Callable[..., Any]] = {}
_USER: dict[str, Callable[..., Any]] = {}


def register(name: str, fn: Callable[..., Any], *, builtin: bool = False) -> None:
    """Register a vectorized function under ``name``. User
    registrations shadow builtins (dispatcher-order contract)."""
    (_BUILTINS if builtin else _USER)[name] = fn


def call(name: str, *args: Any, **kwargs: Any) -> Any:
    fn = _USER.get(name) or _BUILTINS.get(name)
    if fn is None:
        raise KeyError(f"no function registered under {name!r}")
    return fn(*args, **kwargs)


def registered() -> dict[str, Callable[..., Any]]:
    out = dict(_BUILTINS)
    out.update(_USER)
    return out
