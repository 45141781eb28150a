"""Deterministic synthetic transcript tables (FIXTURES.md F1-F5).

All generators are seeded and pure — same arguments, same bytes — the
analog of the reference's golden corpus discipline
(/root/reference/tests/general/Makefile.am:202-222). No external data.

Schema (BASELINE.json ``input_hint``)::

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string (nullable), ts:timestamp[us], value:float64

``value`` is an extra numeric column so window math has something to
chew on (the reference's string->number coercion surface,
rvalue.c:125-177).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["search", "python", "browser", "calculator", "editor"])

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
        ("value", pa.float64()),
    ]
)

BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds


def synth_transcripts(
    n_convs: int = 100,
    mean_turns: int = 10,
    seed: int = 42,
    zipf_a: float = 1.2,
    max_turns: int = 2000,
    idle_threshold_us: int = 15 * 60 * 1_000_000,
    mega_frac: float = 0.0,
) -> pa.Table:
    """Generate a transcript table with Zipf-skewed conversation sizes.

    - per-conv gaps are log-normal; some exceed the idle threshold (to
      exercise sessionization), a few are exactly equal to it (edge),
      and occasional gaps are 0 (duplicate ts tie-break test).
    - ``text`` embeds conv/turn identity + multibyte UTF-8 + empty
      strings, the byte-equality stressors of FIXTURES.md F1.
    - ``mega_frac`` > 0 appends one mega-conversation holding that
      fraction of all turns (FIXTURES.md F4 skew fixture).

    Rows are emitted SHUFFLED (not grouped/ordered) so pipelines must
    do their own partition + sort.
    """
    rng = np.random.default_rng(seed)
    sizes = np.minimum(
        rng.zipf(zipf_a, size=n_convs) * max(1, mean_turns // 3), max_turns
    ).astype(np.int64)
    sizes = np.maximum(sizes, 1)
    # a deterministic handful of single-turn convs (lag/lead null edge)
    sizes[:: max(1, n_convs // 10)] = 1
    if mega_frac > 0.0:
        total = int(sizes.sum())
        mega = int(mega_frac / (1.0 - mega_frac) * total)
        sizes = np.append(sizes, max(mega, max_turns))
        n_convs += 1

    n = int(sizes.sum())
    conv_ord = np.repeat(np.arange(n_convs), sizes)
    turn_idx = np.arange(n, dtype=np.int64) - np.repeat(
        np.cumsum(sizes) - sizes, sizes
    )

    conv_ids = np.array([f"c{i:08d}" for i in range(n_convs)])
    conv_col = conv_ids[conv_ord]

    # per-conv monotone ts: base + per-conv offset + cumsum of gaps
    gaps = (rng.lognormal(mean=10.0, sigma=2.0, size=n)).astype(np.int64)  # ~e^10 us ≈ 22ms median, heavy tail
    gaps = gaps * 1000  # push a real fraction past a 15-min idle threshold
    # deterministic edge cases: exact-threshold gaps and zero gaps (dup ts)
    gaps[:: 997] = idle_threshold_us
    gaps[:: 499] = 0
    gaps[turn_idx == 0] = 0
    seg_first = np.repeat(np.cumsum(sizes) - sizes, sizes)
    cg = np.cumsum(gaps)
    ts_us = BASE_TS_US + (conv_ord * 86_400_000_000) + (cg - cg[seg_first])

    role = ROLES[(turn_idx + conv_ord) % len(ROLES)]
    is_tool_turn = role == "tool"
    tool_vals = TOOLS[(turn_idx + conv_ord) % len(TOOLS)]
    junk = rng.integers(0, 1_000_000, size=n)
    value = np.round(rng.normal(50.0, 15.0, size=n), 4)

    # Shuffle rows so nothing downstream can rely on generation order —
    # permute the NUMPY inputs before any Arrow array exists. A
    # whole-table Arrow take() (or a take from a chunked source, which
    # concatenates first) overflows 32-bit utf8 offsets past ~2 GiB of
    # text, seen at the 165M-turn scaling size. The rng draw order is
    # unchanged (sizes, gaps, junk, value, perm), so the output is the
    # same logical table earlier revisions produced.
    perm = rng.permutation(n)
    conv_col = conv_col[perm]
    turn_idx = turn_idx[perm]
    role = role[perm]
    is_tool_turn = is_tool_turn[perm]
    tool_vals = tool_vals[perm]
    ts_us = ts_us[perm]
    junk = junk[perm]
    value = value[perm]
    # text = "" where j % 17 == 0 else f"t-{conv}-{turn}-é中{j:06d}",
    # built with Arrow kernels — the per-row f-string loop took ~20 min
    # at the 83M-turn scaling size and dominated cold-cache bench setup
    import pyarrow.compute as pc

    # EVERY string column is built chunked: one contiguous 32-bit utf8
    # array overflows its 2 GiB offset limit past ~238M rows of 9-byte
    # conv_ids (text hits it far sooner) — seen at the 83M/165M-turn
    # scaling inputs; chunking removes the ceiling for any future
    # input-size doubling
    chunk = 8_000_000
    conv_chunks, role_chunks, tool_chunks, text_chunks = [], [], [], []
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        conv_c = pa.array(conv_col[lo:hi], type=pa.string())
        conv_chunks.append(conv_c)
        role_chunks.append(pa.array(role[lo:hi], type=pa.string()))
        tool_chunks.append(
            pc.if_else(
                pa.array(is_tool_turn[lo:hi]),
                pa.array(tool_vals[lo:hi], type=pa.string()),
                pa.scalar(None, pa.string()),
            )
        )
        joined = pc.binary_join_element_wise(
            "t-",
            conv_c,
            "-",
            pc.cast(pa.array(turn_idx[lo:hi]), pa.string()),
            "-é中",
            pc.utf8_lpad(pc.cast(pa.array(junk[lo:hi]), pa.string()), 6, "0"),
            "",
        )
        text_chunks.append(pc.if_else(pa.array(junk[lo:hi] % 17 == 0), "", joined))
    conv_arr = pa.chunked_array(conv_chunks)
    text_arr = pa.chunked_array(text_chunks)

    tbl = pa.table(
        {
            "conv_id": conv_arr,
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.chunked_array(role_chunks),
            "text": text_arr,
            "tool": pa.chunked_array(tool_chunks),
            "ts": pa.array(ts_us, type=pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(value, type=pa.float64()),
        }
    )
    return tbl


def synth_asof_side(
    transcripts: pa.Table,
    seed: int = 43,
    rows_per_conv: int = 5,
    absent_frac: float = 0.2,
) -> pa.Table:
    """Right side of the point-in-time join (FIXTURES.md F2).

    Timestamps interleave with / precede / follow the transcript range;
    some conv_ids are absent (no-match rows); duplicate ts included.
    One row per (conv_id, ts) after dedup-by-max is NOT enforced here —
    tie semantics are part of what tests cover.
    """
    import pyarrow.compute as pc

    rng = np.random.default_rng(seed)
    # vectorized distinct+sort (a to_pylist over the 83M-turn bench
    # table took minutes); np.sort on the ASCII conv ids matches the
    # original sorted(set(...)) ordering exactly
    convs = np.sort(
        pc.unique(transcripts["conv_id"]).to_numpy(zero_copy_only=False)
    )
    keep = rng.random(len(convs)) >= absent_frac
    convs = convs[keep]
    ts_all = transcripts["ts"].cast(pa.int64()).to_numpy()
    lo, hi = int(ts_all.min()), int(ts_all.max())
    span = max(hi - lo, 1)

    n = len(convs) * rows_per_conv
    conv_col = np.repeat(convs, rows_per_conv)
    ts = lo - span // 10 + rng.integers(0, span + span // 5, size=n)
    ts[:: 13] = ts[(np.arange(n)[::13] + 1) % n]  # inject duplicate ts values
    feature_a = np.round(np.cumsum(rng.normal(0, 1, size=n)), 6)
    feature_b = rng.integers(0, 10, size=n)

    tbl = pa.table(
        {
            "conv_id": pa.array(conv_col, type=pa.string()),
            "ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
            "feature_a": pa.array(feature_a, type=pa.float64()),
            "feature_b": pa.array(feature_b, type=pa.int64()),
        }
    )
    perm = rng.permutation(n)
    return tbl.take(pa.array(perm))


def events_to_transcripts_sql() -> str:
    """The DuckDB-side derivation of a transcript table from the driver's
    ``events`` table — MUST stay semantically identical to
    :func:`events_to_transcripts_ray` (oracle gate contract)."""
    return """
        SELECT CAST(user_id AS VARCHAR) AS conv_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
               event_type AS role,
               props AS text,
               CASE WHEN event_type IN ('click', 'purchase') THEN event_type END AS tool,
               ts,
               value
        FROM events
    """
