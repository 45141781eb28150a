"""Declarative pipeline spec → compiled processor.

The reference compiles a stylesheet *document* into a reusable
processor before any input is seen — ``XSLTNewProcessor``
preprocesses, resolves ``xsl:import``/``xsl:include``, and indexes
templates (/root/reference/src/transform.c:507-557). This module is
that compile phase for the Ray engine: a JSON/dict spec becomes an
:class:`~turboxsl_ray.engine.EngineConfig` (+ optional
:class:`~turboxsl_ray.stages.window_stage.WindowSpec` and
:class:`~turboxsl_ray.stages.dispatch.RuleSet`), validated up front
so a malformed spec fails before any data moves.

Spec document::

    {
      "version": 1,
      "include": ["base.json"],          # xsl:include analog: later
                                         # documents override earlier
      "engine": {
        "num_partitions": 64,
        "session_gap_minutes": 15,
        "salt_threshold_rows": 100000
      },
      "features": {
        "lags":    [["value", 1], ["role", 1]],
        "leads":   [["value", 1]],
        "rolling": [["value", 10, "mean"]],
        "ffill":   ["tool"]
      },
      "rules": {                          # xsl:apply-templates rule set
        "default": "default",
        "entries": [
          {"name": "big_purchase", "priority": 2,
           "when":  {"all": [{"col": "role", "op": "==", "value": "purchase"},
                              {"col": "value", "op": ">", "value": 60}]},
           "emit":  {"scale": ["value", 2.0]}},
          {"name": "error", "when": {"col": "role", "op": "==", "value": "error"},
           "emit": {"const": -1.0}}
        ]
      }
    }

``include`` resolves paths relative to the including file and merges
shallowly per top-level section (later wins), mirroring the
import-precedence the reference implements for stylesheets.
"""

from __future__ import annotations

import json
import os
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from turboxsl_ray.engine import EngineConfig
from turboxsl_ray.stages.dispatch import RuleSet
from turboxsl_ray.stages.window_stage import WindowSpec

_KNOWN_SECTIONS = {"version", "include", "engine", "features", "rules"}
_OPS = {
    "==": pc.equal,
    "!=": pc.not_equal,
    ">": pc.greater,
    ">=": pc.greater_equal,
    "<": pc.less,
    "<=": pc.less_equal,
    "contains": lambda col, v: pc.match_substring(col, v),
}


class SpecError(ValueError):
    """Malformed spec — raised at compile time, never mid-pipeline."""


def load_spec(source: "str | dict") -> dict:
    """Load a spec document from a path (or pass a dict through),
    resolving ``include`` chains depth-first with later-wins merge."""
    if isinstance(source, dict):
        doc, base_dir = dict(source), os.getcwd()
    else:
        with open(source) as f:
            doc = json.load(f)
        base_dir = os.path.dirname(os.path.abspath(source))

    unknown = set(doc) - _KNOWN_SECTIONS
    if unknown:
        raise SpecError(f"unknown spec sections: {sorted(unknown)}")

    merged: dict[str, Any] = {}
    for inc in doc.get("include", []):
        path = inc if os.path.isabs(inc) else os.path.join(base_dir, inc)
        sub = load_spec(path)
        for k, v in sub.items():
            if k in ("include", "version"):
                continue
            merged[k] = {**merged.get(k, {}), **v} if isinstance(v, dict) else v
    for k, v in doc.items():
        if k == "include":
            continue
        if isinstance(v, dict) and isinstance(merged.get(k), dict):
            merged[k] = {**merged[k], **v}
        else:
            merged[k] = v
    return merged


def compile_engine_config(spec: dict) -> EngineConfig:
    """The XSLTNewProcessor analog: spec → immutable EngineConfig."""
    eng = dict(spec.get("engine", {}))
    feats = dict(spec.get("features", {}))
    kwargs: dict[str, Any] = {}
    allowed = {"num_partitions", "session_gap_minutes", "salt_threshold_rows"}
    bad = set(eng) - allowed
    if bad:
        raise SpecError(f"unknown engine keys: {sorted(bad)}")
    kwargs.update(eng)
    if "lags" in feats:
        kwargs["lags"] = tuple((c, int(k)) for c, k in feats["lags"])
    if "leads" in feats:
        kwargs["leads"] = tuple((c, int(k)) for c, k in feats["leads"])
    if "rolling" in feats:
        for item in feats["rolling"]:
            if len(item) != 3 or item[2] not in ("sum", "mean", "count"):
                raise SpecError(f"bad rolling entry {item!r}")
        kwargs["rolling"] = tuple((c, int(k), agg) for c, k, agg in feats["rolling"])
    if "ffill" in feats:
        kwargs["ffill_cols"] = tuple(feats["ffill"])
    bad = set(feats) - {"lags", "leads", "rolling", "ffill"}
    if bad:
        raise SpecError(f"unknown features keys: {sorted(bad)}")
    return EngineConfig(**kwargs)


def compile_window_spec(spec: dict, session: bool = True) -> WindowSpec:
    cfg = compile_engine_config(spec)
    return WindowSpec(
        lags=cfg.lags,
        leads=cfg.leads,
        session_gap_us=cfg.session_gap_minutes * 60 * 1_000_000 if session else None,
        ffill_cols=cfg.ffill_cols,
        rolling=cfg.rolling,
    )


def _compile_predicate(when: dict):
    if "all" in when:
        subs = [_compile_predicate(w) for w in when["all"]]

        def pred_all(t: pa.Table):
            m = subs[0](t)
            for s in subs[1:]:
                m = pc.and_kleene(m, s(t))
            return m

        return pred_all
    if "any" in when:
        subs = [_compile_predicate(w) for w in when["any"]]

        def pred_any(t: pa.Table):
            m = subs[0](t)
            for s in subs[1:]:
                m = pc.or_kleene(m, s(t))
            return m

        return pred_any
    try:
        col, op, value = when["col"], when["op"], when["value"]
    except KeyError as e:
        raise SpecError(f"predicate needs col/op/value (or all/any): {when!r}") from e
    if op not in _OPS:
        raise SpecError(f"unknown predicate op {op!r} (have {sorted(_OPS)})")
    fn = _OPS[op]
    return lambda t: fn(t[col], value)


def _compile_action(emit: dict):
    if "const" in emit:
        v = emit["const"]
        return lambda t: pa.array([v] * t.num_rows)
    if "col" in emit:
        c = emit["col"]
        return lambda t: t[c].combine_chunks()
    if "scale" in emit:
        c, f = emit["scale"]
        return lambda t: pc.multiply(pc.cast(t[c], pa.float64()), float(f))
    raise SpecError(f"action needs const/col/scale: {emit!r}")


def compile_rule_modes(spec: dict):
    """``rules.modes`` section → RuleSetRegistry (xsl:apply-templates
    mode= namespacing; one compiled rule table per pass)."""
    from turboxsl_ray.stages.dispatch import RuleSetRegistry

    rules = spec.get("rules") or {}
    modes = rules.get("modes")
    if not modes:
        reg = RuleSetRegistry()
        rs = compile_rules(spec)
        if rs is not None:
            reg.add_mode("", rs)
        return reg
    reg = RuleSetRegistry()
    for mode, sub in modes.items():
        reg.add_mode(mode, compile_rules({"rules": sub}))
    return reg


def compile_rules(spec: dict) -> RuleSet | None:
    """Rule section → vectorized RuleSet (the template-index analog,
    ref templates.c:221-227 mode-named rule sets)."""
    rules = spec.get("rules")
    if not rules:
        return None
    rs = RuleSet(default_name=rules.get("default", "default"))
    if "default_emit" in rules:
        rs.default_action = _compile_action(rules["default_emit"])
    for ent in rules.get("entries", []):
        rs.add(
            ent["name"],
            _compile_predicate(ent["when"]),
            _compile_action(ent.get("emit", {"const": None})),
            priority=int(ent.get("priority", 0)),
        )
    return rs
