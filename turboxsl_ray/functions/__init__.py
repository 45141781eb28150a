"""Scalar function library + UDF registry (reference: functions.c)."""

from turboxsl_ray.functions.registry import call, register, registered
from turboxsl_ray.functions import strings  # noqa: F401  (registers builtins)

__all__ = ["call", "register", "registered", "strings"]
