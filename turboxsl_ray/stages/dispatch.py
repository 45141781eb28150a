"""Rule dispatch: per-row predicate → feature-fn routing, vectorized.

This is the reference's central transform semantic —
``xsl:apply-templates`` finds the single best-matching template per
node by predicate + specificity weight and applies it
(/root/reference/src/instructions.c:69-145, templates.c:435-487, weight
at templates.c:174-179); unmatched nodes fall through to the built-in
default template (transform.c:130-158). ``xsl:choose`` is the
first-match special case (instructions.c:234-286).

Here: each rule is (name, priority, vectorized predicate, vectorized
action). Per batch, every predicate is evaluated ONCE as a boolean
mask; the winning rule per row is the highest priority (ties →
registration order, matching the reference's first-match-in-tier scan,
templates.c:459-469). Actions run once per rule over the whole batch
and are blended by mask — no per-row Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from turboxsl_ray.kernels.arrays import as_array

Predicate = Callable[[pa.Table], "pa.Array | np.ndarray"]
Action = Callable[[pa.Table], "pa.Array | np.ndarray"]


@dataclass(frozen=True)
class Rule:
    name: str
    predicate: Predicate          # tbl -> bool mask (all rows)
    action: Action                # tbl -> value array (all rows)
    priority: int = 0             # higher wins (specificity weight)


@dataclass
class RuleSet:
    """An ordered, prioritized rule table with a default action."""

    rules: list[Rule] = field(default_factory=list)
    default_name: str = "default"
    default_action: Action | None = None

    def add(self, name: str, predicate: Predicate, action: Action,
            priority: int = 0) -> "RuleSet":
        self.rules.append(Rule(name, predicate, action, priority))
        return self

    def _masks(self, tbl: pa.Table) -> tuple[np.ndarray, list[Rule]]:
        """winner[i] = index into ordered rules, or -1 (default).

        Rules sorted by (-priority, registration order); first match in
        that order wins — evaluated as a reverse-priority overwrite so
        each predicate runs exactly once per batch.
        """
        order = sorted(
            range(len(self.rules)), key=lambda i: (-self.rules[i].priority, i)
        )
        ordered = [self.rules[i] for i in order]
        n = tbl.num_rows
        winner = np.full(n, -1, dtype=np.int64)
        for idx in range(len(ordered) - 1, -1, -1):
            m = ordered[idx].predicate(tbl)
            if isinstance(m, (pa.Array, pa.ChunkedArray)):
                m = pc.fill_null(m, False).to_numpy(zero_copy_only=False)
            winner[np.asarray(m, dtype=bool)] = idx
        return winner, ordered

    def apply(self, tbl: pa.Table, out_col: str = "rule",
              value_col: str | None = None) -> pa.Table:
        """Append ``out_col`` (winning rule name) and optionally
        ``value_col`` (winning rule's action output) to the batch."""
        winner, ordered = self._masks(tbl)
        names = np.array([r.name for r in ordered] + [self.default_name], dtype=object)
        tbl = tbl.append_column(
            out_col, pa.array(names[winner], type=pa.string())
        )
        if value_col is not None:
            # evaluate every action once, then unify output types UP
            # FRONT (mixed numeric promotes; anything else is a clear
            # error instead of a mid-blend if_else failure)
            arrs = [_to_arrow(rule.action(tbl)) for rule in ordered]
            labels = [r.name for r in ordered]
            if self.default_action is not None:
                arrs.append(_to_arrow(self.default_action(tbl)))
                labels.append(self.default_name)
            ct = _common_type([a.type for a in arrs], labels)
            arrs = [a if a.type == ct else as_array(a.cast(ct)) for a in arrs]
            if self.default_action is not None:
                out = arrs.pop()
            else:
                # unmatched rows stay null when there is no default
                out = as_array(pa.nulls(tbl.num_rows, type=ct))
            for idx, vals in enumerate(arrs):
                mask = pa.array(winner == idx)
                out = as_array(pc.if_else(mask, vals, out))
            tbl = tbl.append_column(value_col, out)
        return tbl


@dataclass
class RuleSetRegistry:
    """Mode-namespaced rule sets — ``xsl:apply-templates mode=``
    selects a whole rule table per pass (ref instructions.c:85-95,
    template index per mode at templates.c:221-227). The unnamed mode
    ``""`` is the default pass."""

    modes: dict[str, RuleSet] = field(default_factory=dict)

    def add_mode(self, mode: str, ruleset: RuleSet) -> "RuleSetRegistry":
        self.modes[mode] = ruleset
        return self

    def get(self, mode: str = "") -> RuleSet:
        try:
            return self.modes[mode]
        except KeyError:
            raise KeyError(
                f"no rule set for mode {mode!r} (have {sorted(self.modes)})"
            ) from None

    def apply(self, tbl: pa.Table, mode: str = "", **kwargs) -> pa.Table:
        return self.get(mode).apply(tbl, **kwargs)


def _to_arrow(x) -> pa.Array:
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return as_array(x)
    return pa.array(np.asarray(x))


def _common_type(types: list[pa.DataType], labels: list[str]) -> pa.DataType:
    """One output type for all rule actions: equal types pass through,
    null-typed actions (a rule that only emits None, e.g. a spec rule
    without 'emit') promote to any other type, mixed numeric/bool
    promotes (float64 > int64), anything else raises with the
    offending rule names."""
    uniq = {t for t in types if not pa.types.is_null(t)}
    if not uniq:
        return pa.null()
    if len(uniq) == 1:
        return next(iter(uniq))
    def numericish(t):
        return pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_boolean(t)
    if all(numericish(t) for t in uniq):
        return pa.float64() if any(pa.types.is_floating(t) for t in uniq) else pa.int64()
    detail = ", ".join(f"{n}: {t}" for n, t in zip(labels, types))
    raise ValueError(
        f"rule actions produce incompatible output types ({detail}); "
        "declare a single value type across the rule set"
    )
