"""Nested-data functions: the ``exsl:node-set`` analog.

The reference's ``exsl:node-set`` turns a string into a parsed tree
that later XPath steps navigate (/root/reference/src/functions.c:
1084-1099 — it re-parses the string as an XML fragment and returns a
nodeset). The Ray-Data-native analog is parsing a serialized payload
column (JSON here — the typed-columnar world's fragment format) into a
genuine Arrow **struct** column whose fields downstream stages access
with ``pc.struct_field`` (= child-axis steps) and ``pc.list_flatten``
(= descendant iteration over repeated children).

Parsing uses Arrow's C++ JSON reader over a newline-delimited batch
buffer — one vectorized parse per block, NOT a per-row ``json.loads``
loop. Valid single-line JSON cannot contain a raw newline (newlines
inside JSON strings must be escaped), so newline-joining the batch is
lossless; rows that are null (or fail to parse, with
``on_error="null"``) come back as null structs.
"""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.compute as pc
from pyarrow import json as pa_json

from turboxsl_ray.kernels.arrays import as_array


def parse_json_struct(
    arr: pa.Array | pa.ChunkedArray,
    explicit_schema: pa.Schema | None = None,
    on_error: str = "raise",
) -> pa.Array:
    """Parse a string column of single-line JSON objects into one
    struct array (schema inferred across the batch unless
    ``explicit_schema`` is given). Nulls stay null. Keys must be
    TYPE-STABLE across the batch (a key that flips e.g. number→string
    mid-batch raises — columnar data has one type per field; pass
    ``explicit_schema`` to coerce).

    ``on_error="null"`` turns unparseable rows into null structs by
    retrying row-by-row only when the batch-level parse fails — the
    happy path stays a single vectorized C++ parse.

    Row alignment is guaranteed by construction, never by a row-count
    coincidence: rows that would break the NDJSON framing (blank /
    whitespace-only strings, which collapse to zero lines, or strings
    containing a raw newline, which expand to several) are excluded
    from the vectorized parse up front and handled per-row — a blank
    row can NEVER silently receive its neighbor's payload.
    """
    arr = as_array(arr)
    n = len(arr)
    if n == 0:
        empty_schema = explicit_schema or pa.schema([])
        return pa.array([], type=pa.struct(list(empty_schema)))
    valid = pc.is_valid(arr)
    filled = pc.fill_null(arr, "{}")
    # frame-safe rows: exactly one NDJSON line each
    blank = pc.equal(pc.utf8_trim_whitespace(filled), "")
    multiline = pc.match_substring(filled, "\n")
    framed = pc.and_not(pc.and_not(pc.is_valid(filled), blank), multiline)
    clean = filled.filter(framed)
    payload = _join_lines(clean)
    parse_opts = pa_json.ParseOptions(explicit_schema=explicit_schema)
    try:
        tbl = pa_json.read_json(io.BytesIO(payload), parse_options=parse_opts)
    except pa.ArrowInvalid:
        if on_error != "null":
            raise
        return _parse_rows_salvage(filled, valid, explicit_schema)
    if tbl.num_rows != len(clean):  # defensive; framing makes this exact
        if on_error != "null":
            raise pa.ArrowInvalid(
                f"JSON parse produced {tbl.num_rows} rows for {len(clean)} inputs"
            )
        return _parse_rows_salvage(filled, valid, explicit_schema)
    st = tbl.to_struct_array().combine_chunks()
    framed_np = framed.to_numpy(zero_copy_only=False)
    if framed_np.all():
        out = st
    else:
        # rows excluded from the frame are malformed single-line JSON
        # by definition (blank or embedded raw newline)
        if on_error != "null" and bool(
            (framed_np < valid.to_numpy(zero_copy_only=False)).any()
        ):
            raise pa.ArrowInvalid(
                "blank or multi-line rows cannot be single-line JSON "
                "(use on_error='null' to null them)"
            )
        import numpy as np

        # unframed rows point at slot 0 as a placeholder; they are
        # masked to null below (keep = valid AND framed)
        idx = np.zeros(n, dtype=np.int64)
        idx[framed_np] = np.arange(len(clean))
        out = st.take(pa.array(idx))
    if valid.null_count == 0 and pc.all(valid).as_py() and framed_np.all():
        return out
    keep = pc.and_(valid, pa.array(framed_np))
    return pc.if_else(keep, out, pa.scalar(None, type=out.type))


def _join_lines(clean: pa.Array) -> bytes:
    """Newline-join a string column into one buffer WITHOUT per-row
    Python strings: wrap the column as a single list element and let
    Arrow's binary_join do the concatenation in C++.

    64-bit (large_string / large_list) offsets throughout, so a block
    whose joined payload exceeds 2 GiB works; the result bytes come
    straight off the joined array's data buffer — no Python-str
    round trip (which would decode + re-encode the whole payload)."""
    import numpy as np

    if len(clean) == 0:
        return b""
    big = pc.cast(clean, pa.large_string())
    if isinstance(big, pa.ChunkedArray):
        big = big.combine_chunks()
    lst = pa.LargeListArray.from_arrays(
        pa.array([0, len(big)], type=pa.int64()), big
    )
    joined = pc.binary_join(lst, pa.scalar("\n", type=pa.large_string()))
    if isinstance(joined, pa.ChunkedArray):
        joined = joined.combine_chunks()
    offs = np.frombuffer(
        joined.buffers()[1], dtype=np.int64, count=joined.offset + 2
    )
    start, end = int(offs[joined.offset]), int(offs[joined.offset + 1])
    return joined.buffers()[2].slice(start, end - start).to_pybytes()


def _parse_rows_salvage(
    filled: pa.Array, valid: pa.BooleanArray, explicit_schema: pa.Schema | None
) -> pa.Array:
    """Slow path for batches containing malformed rows: per-row parse
    (stdlib C-accelerated json), malformed -> null. Only reached when
    the vectorized parse raised."""
    import json as _json

    vals = []
    for s, ok in zip(filled.to_pylist(), valid.to_pylist()):
        if not ok:
            vals.append(None)
            continue
        try:
            v = _json.loads(s)
            vals.append(v if isinstance(v, dict) else None)
        except ValueError:
            vals.append(None)
    typ = pa.struct(list(explicit_schema)) if explicit_schema is not None else None
    return pa.array(vals, type=typ)


def struct_paths(arr: pa.Array, *path: str) -> pa.Array:
    """Navigate nested struct fields (``a.b.c`` = child-axis chain)."""
    out = arr
    for p in path:
        out = pc.struct_field(out, p)
    return out


def unnest(tbl: pa.Table, list_col: str, value_name: str | None = None) -> pa.Table:
    """Explode a list column: one output row per element, other columns
    replicated via vectorized parent-index take (the descendant-axis
    ``for-each`` over repeated children)."""
    lst = as_array(tbl[list_col])
    parents = pc.list_parent_indices(lst)
    flat = pc.list_flatten(lst)
    out = tbl.drop_columns([list_col]).take(parents)
    return out.append_column(value_name or list_col, flat)
