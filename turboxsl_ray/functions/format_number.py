"""XSLT 1.0 ``format-number`` with the full pattern grammar and an
``xsl:decimal-format`` symbol registry.

Reference: the largest single scalar function in turboxsl —
``xf_format`` (/root/reference/src/functions.c:449-709) implements the
``#,##0.00;(#)`` picture grammar, and per-stylesheet
``<xsl:decimal-format>`` elements register symbol overrides
(/root/reference/src/transform.c:363-369). Semantics re-derived from
the XSLT 1.0 / JDK DecimalFormat spec the reference follows:

- pattern = positive-subpattern [; negative-subpattern]; the negative
  subpattern contributes ONLY its prefix/suffix (digits come from the
  positive one); absent => minus-sign + positive pattern;
- integer part: ``0`` counts set the minimum digit count, the
  rightmost grouping separator's distance to the decimal point sets
  the grouping size;
- fraction part: ``0``s = minimum digits, ``0``+``#``s = maximum
  digits (rounded like C printf — half-even on the binary double, the
  reference's own snprintf path);
- ``%`` / ``‰`` anywhere in prefix/suffix multiply by 100 / 1000;
- NaN formats as the decimal-format's NaN symbol (no prefix/suffix);
  infinities keep prefix/suffix around the infinity symbol.

The pattern is compiled ONCE per call (the compile-once discipline of
stages/window_stage.py); per-row work is plain C-speed str ops.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

from turboxsl_ray.kernels.arrays import as_array


@dataclass(frozen=True)
class DecimalFormat:
    """Symbol set of one ``<xsl:decimal-format>`` element."""

    decimal_separator: str = "."
    grouping_separator: str = ","
    minus_sign: str = "-"
    percent: str = "%"
    per_mille: str = "‰"
    zero_digit: str = "0"
    digit: str = "#"
    pattern_separator: str = ";"
    infinity: str = "Infinity"
    nan: str = "NaN"


# name -> DecimalFormat; "" is the default (unnamed) format, like the
# reference's per-stylesheet table (transform.c:363-369)
_DECIMAL_FORMATS: dict[str, DecimalFormat] = {"": DecimalFormat()}


def register_decimal_format(name: str, **attrs) -> DecimalFormat:
    fmt = DecimalFormat(**attrs)
    _DECIMAL_FORMATS[name] = fmt
    return fmt


def get_decimal_format(name: str = "") -> DecimalFormat:
    try:
        return _DECIMAL_FORMATS[name]
    except KeyError:
        raise KeyError(f"no xsl:decimal-format named {name!r} registered") from None


@dataclass(frozen=True)
class _Sub:
    prefix: str
    suffix: str
    min_int: int
    grouping: int | None
    min_frac: int
    max_frac: int
    multiplier: int


@dataclass(frozen=True)
class CompiledPattern:
    positive: _Sub
    negative: _Sub | None  # None => minus_sign + positive
    fmt: DecimalFormat


def _parse_sub(s: str, fmt: DecimalFormat) -> _Sub:
    digits = (fmt.zero_digit, fmt.digit)
    first = last = None
    for i, ch in enumerate(s):
        if ch in digits:
            if first is None:
                first = i
            last = i
    if first is None:
        # no digit placeholders: whole thing is a literal prefix
        first, last = len(s), len(s) - 1
    prefix, body, suffix = s[:first], s[first : last + 1], s[last + 1 :]
    multiplier = 1
    if fmt.percent in prefix or fmt.percent in suffix:
        multiplier = 100
    elif fmt.per_mille in prefix or fmt.per_mille in suffix:
        multiplier = 1000
    int_part, sep, frac_part = body.partition(fmt.decimal_separator)
    grouping = None
    gpos = int_part.rfind(fmt.grouping_separator)
    if gpos != -1:
        grouping = len(int_part) - gpos - 1
    min_int = int_part.count(fmt.zero_digit)
    min_frac = frac_part.count(fmt.zero_digit)
    max_frac = min_frac + frac_part.count(fmt.digit)
    if not sep and not body:
        min_int = max(min_int, 0)
    return _Sub(prefix, suffix, min_int, grouping, min_frac, max_frac, multiplier)


def compile_pattern(pattern: str, format_name: str = "") -> CompiledPattern:
    fmt = get_decimal_format(format_name)
    pos, sep, neg = pattern.partition(fmt.pattern_separator)
    return CompiledPattern(
        positive=_parse_sub(pos, fmt),
        negative=_parse_sub(neg, fmt) if sep else None,
        fmt=fmt,
    )


def _format_abs(v: float, sub: _Sub, fmt: DecimalFormat) -> str:
    s = f"{v:.{sub.max_frac}f}"  # half-even, identical to C printf / fmt
    int_s, _, frac_s = s.partition(".")
    # trim trailing optional fraction digits down to the minimum
    if len(frac_s) > sub.min_frac:
        frac_s = frac_s[: sub.min_frac] + frac_s[sub.min_frac :].rstrip("0")
    int_s = int_s.lstrip("0")
    if len(int_s) < sub.min_int:
        int_s = "0" * (sub.min_int - len(int_s)) + int_s
    if sub.grouping:
        g, out = sub.grouping, []
        while len(int_s) > g:
            out.append(int_s[-g:])
            int_s = int_s[:-g]
        out.append(int_s)
        int_s = fmt.grouping_separator.join(reversed(out))
    if fmt.zero_digit != "0":
        delta = ord(fmt.zero_digit) - ord("0")
        int_s = "".join(chr(ord(c) + delta) if c.isdigit() else c for c in int_s)
        frac_s = "".join(chr(ord(c) + delta) for c in frac_s)
    return int_s + (fmt.decimal_separator + frac_s if frac_s else "")


def format_value(x: float, cp: CompiledPattern) -> str:
    fmt = cp.fmt
    if math.isnan(x):
        return fmt.nan
    # sign BIT, not x<0: -0.0 formats with the negative affix, like
    # printf and Java DecimalFormat (the reference's snprintf path)
    negative = math.copysign(1.0, x) < 0
    if negative and cp.negative is not None:
        sub = cp.negative
        # digits always come from the positive subpattern (XSLT 1.0)
        body = cp.positive
        sub = _Sub(sub.prefix, sub.suffix, body.min_int, body.grouping,
                   body.min_frac, body.max_frac, body.multiplier)
        sign = ""
    elif negative:
        sub, sign = cp.positive, fmt.minus_sign
    else:
        sub, sign = cp.positive, ""
    if math.isinf(x):
        return sub.prefix + sign + fmt.infinity + sub.suffix
    body_s = _format_abs(abs(x) * sub.multiplier, sub, fmt)
    return sub.prefix + sign + body_s + sub.suffix


def format_number(arr, pattern: str = "0.###", format_name: str = "") -> pa.Array:
    """Batch kernel: compile the pattern once, format every value.

    Matches ``functions.c:449-709``'s picture handling; null in, null
    out (the reference emits '' for missing — callers coalesce)."""
    cp = compile_pattern(pattern, format_name)
    v = as_array(pc.cast(as_array(arr), pa.float64()))
    np_v = v.to_numpy(zero_copy_only=False)
    valid = pc.is_valid(v).to_numpy(zero_copy_only=False)
    out = [format_value(float(x), cp) if ok else None
           for x, ok in zip(np_v, valid)]
    return pa.array(out, type=pa.string())
