"""The reference's scalar function library, vectorized over Arrow.

Each function mirrors the XPath/ltr semantics of
/root/reference/src/functions.c (cites inline) as a batch-level kernel
over ``pa.Array``/``pa.ChunkedArray`` — never a Python loop per row in
the hot path (hashing functions call C digest code per row, like the
reference does).

XPath quirks preserved on purpose:
- ``substring`` is 1-BASED and counts CODEPOINTS (functions.c:184-222
  via utf2ws, strings.c:194-220);
- ``xpath_round`` is floor(x + 0.5), NOT banker's rounding
  (functions.c:261);
- ``number()`` of a non-numeric string is NaN (rvalue.c:125-177);
- ``boolean()`` of a string tests non-emptiness (rvalue.c:37-71);
- ``translate`` deletes characters with no counterpart
  (functions.c:711-751).
"""

from __future__ import annotations

import hashlib
import urllib.parse

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from turboxsl_ray.functions.registry import register
from turboxsl_ray.kernels.arrays import as_array

ArrayLike = "pa.Array | pa.ChunkedArray"


def concat(*arrays) -> pa.Array:
    """functions.c:160-182 — N-ary string concatenation."""
    return pc.binary_join_element_wise(*arrays, "")


def substring(arr, start: int, length: int | None = None) -> pa.Array:
    """1-based codepoint substring (functions.c:184-222)."""
    off = max(start - 1, 0)
    stop = None if length is None else off + max(length, 0)
    return pc.utf8_slice_codeunits(arr, off, stop)


def substring_before(arr, sep: str) -> pa.Array:
    """functions.c:334-352 — '' when separator absent."""
    parts = pc.split_pattern(arr, sep, max_splits=1)
    first = pc.list_element(parts, 0)
    found = pc.greater(pc.list_value_length(parts), 1)
    return as_array(pc.if_else(found, first, ""))


def substring_after(arr, sep: str) -> pa.Array:
    """functions.c:354-370 — '' when separator absent. With
    ``max_splits=1`` the second split element IS the remainder, so
    joining the [1:2] list slice yields it — or '' when the separator
    never matched (empty list joins to '')."""
    parts = pc.split_pattern(arr, sep, max_splits=1)
    rest = pc.list_slice(parts, 1, 2)
    return as_array(pc.binary_join(rest, ""))


def contains(arr, needle: str) -> pa.Array:
    """functions.c:306-319."""
    return pc.match_substring(arr, needle)


def starts_with(arr, prefix: str) -> pa.Array:
    """functions.c:321-332."""
    return pc.starts_with(arr, prefix)


def normalize_space(arr) -> pa.Array:
    """functions.c:395-424 — trim + collapse internal whitespace runs."""
    return as_array(
        pc.replace_substring_regex(pc.utf8_trim_whitespace(arr), r"\s+", " ")
    )


def string_length(arr) -> pa.Array:
    """Codepoint count (functions.c:426-445)."""
    return as_array(pc.cast(pc.utf8_length(arr), pa.int64()))


def translate(arr, src: str, dst: str) -> pa.Array:
    """Char map; chars beyond len(dst) are DELETED (functions.c:711-751).

    str.translate is a SIMULTANEOUS map (translate('ab','ba') swaps),
    so chained Arrow replaces would be wrong; instead dictionary-encode
    so the Python map touches only the block's DISTINCT values and
    rows fan back out through a vectorized take."""
    table = str.maketrans(src[: len(dst)], dst, src[len(dst):])
    enc = as_array(arr).dictionary_encode()
    mapped = pa.array(
        [v.translate(table) for v in enc.dictionary.to_pylist()], type=pa.string()
    )
    return as_array(pc.take(mapped, enc.indices))


def upper(arr) -> pa.Array:
    return as_array(pc.utf8_upper(arr))


def lower(arr) -> pa.Array:
    return as_array(pc.utf8_lower(arr))


def xpath_round(arr) -> pa.Array:
    """XPath round = floor(x + 0.5) — functions.c:261."""
    return as_array(pc.floor(pc.add(pc.cast(arr, pa.float64()), 0.5)))


def floor_(arr) -> pa.Array:
    return as_array(pc.floor(pc.cast(arr, pa.float64())))


def ceiling(arr) -> pa.Array:
    return as_array(pc.ceil(pc.cast(arr, pa.float64())))


def number(arr) -> pa.Array:
    """String → double with NaN for non-numeric (rvalue.c:125-177)."""
    v = as_array(arr)
    if pa.types.is_floating(v.type) or pa.types.is_integer(v.type):
        return as_array(pc.cast(v, pa.float64()))
    trimmed = pc.utf8_trim_whitespace(v)
    ok = pc.match_substring_regex(trimmed, r"^-?(\d+\.?\d*|\.\d+)$")
    safe = pc.if_else(ok, trimmed, "0")
    out = pc.cast(safe, pa.float64())
    nan = pa.scalar(float("nan"), pa.float64())
    return as_array(pc.if_else(pc.fill_null(ok, False), out, nan))


def boolean(arr) -> pa.Array:
    """Truthiness per RVALUE coercion (rvalue.c:37-71): non-empty
    string / nonzero number → true; null → false."""
    v = as_array(arr)
    if pa.types.is_boolean(v.type):
        return as_array(pc.fill_null(v, False))
    if pa.types.is_floating(v.type) or pa.types.is_integer(v.type):
        return as_array(pc.fill_null(pc.not_equal(pc.cast(v, pa.float64()), 0.0), False))
    return as_array(pc.fill_null(pc.greater(pc.utf8_length(v), 0), False))


def string_(arr) -> pa.Array:
    """Value → string (rvalue.c:75-120); null → ''."""
    return as_array(pc.fill_null(pc.cast(as_array(arr), pa.string()), ""))


def url_encode(arr) -> pa.Array:
    """ltr:url_encode (functions.c:39-52): percent-encode non-safe.
    Dictionary-encoded: quote() runs once per DISTINCT value."""
    enc = as_array(arr).dictionary_encode()
    mapped = pa.array(
        [urllib.parse.quote(v, safe="") for v in enc.dictionary.to_pylist()],
        type=pa.string(),
    )
    return as_array(pc.take(mapped, enc.indices))


def str_escape_js(arr) -> pa.Array:
    """ltr:str_escape mode=js (functions.c:54-102): backslash-escape
    quotes/backslashes/newlines. Chained literal Arrow replaces — the
    backslash pass runs FIRST, exactly like the reference's order, so
    later passes never double-escape."""
    out = as_array(arr)
    for lit, esc in (("\\", "\\\\"), ("'", "\\'"), ('"', '\\"'),
                     ("\n", "\\n"), ("\r", "\\r")):
        out = pc.replace_substring(out, lit, esc)
    return as_array(out)


def md5_hex(arr) -> pa.Array:
    """ltr:md5_hex (functions.c:886-906 + md5.c)."""
    vals = as_array(arr).to_pylist()
    return pa.array(
        [None if v is None else hashlib.md5(v.encode("utf-8")).hexdigest() for v in vals],
        type=pa.string(),
    )


def format_number(arr, decimals: int | None = None, pattern: str | None = None,
                  format_name: str = "") -> pa.Array:
    """format-number (functions.c:449-709). Full pattern grammar +
    xsl:decimal-format registry live in functions/format_number.py;
    ``decimals=N`` is sugar for the fixed pattern ``0.00...``."""
    from turboxsl_ray.functions.format_number import format_number as _fmt

    if pattern is None:
        if decimals is not None:
            pattern = "0" if decimals == 0 else "0." + "0" * decimals
        else:
            pattern = "0.###"
    return _fmt(arr, pattern, format_name)


for _name, _fn in {
    "concat": concat,
    "substring": substring,
    "substring-before": substring_before,
    "substring-after": substring_after,
    "contains": contains,
    "starts-with": starts_with,
    "normalize-space": normalize_space,
    "string-length": string_length,
    "translate": translate,
    "upper": upper,
    "lower": lower,
    "round": xpath_round,
    "floor": floor_,
    "ceiling": ceiling,
    "number": number,
    "boolean": boolean,
    "string": string_,
    "ltr:url_encode": url_encode,
    "ltr:str_escape": str_escape_js,
    "ltr:md5_hex": md5_hex,
    "format-number": format_number,
}.items():
    register(_name, _fn, builtin=True)
