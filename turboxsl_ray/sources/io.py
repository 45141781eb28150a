"""Source/sink parity beyond Parquet: CSV and JSON-lines.

The reference reads exactly one wire format (XML files,
/root/reference/src/parse.c:334-423) and serializes three output modes
(XML/HTML/TEXT, output.c:66-191). Here Parquet is the canonical format
(TESTDATA.md) and these wrappers give the engine the same
"other-format" reach through Ray Data's native readers/writers —
streaming, parallel per file, no driver materialization.

Write layout contract (resumable-output rule): every writer emits a
DIRECTORY of per-block files, never one giant file — the unit of retry
and of read parallelism.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset

import ray.data


def validate_schema(
    found: pa.Schema, expected: pa.Schema, *, where: str = "input"
) -> None:
    """Fail FAST (before any cluster read is launched) when an input
    doesn't match a declared column contract: names missing or typed
    differently are reported all at once, with the found schema — the
    alternative is a mid-pipeline worker error after minutes of scan.
    Extra columns are allowed (they are pruned by projection)."""
    problems = []
    for field in expected:
        idx = found.get_field_index(field.name)
        if idx == -1:
            problems.append(f"missing column {field.name!r} ({field.type})")
        elif found.field(idx).type != field.type:
            problems.append(
                f"column {field.name!r}: expected {field.type}, "
                f"found {found.field(idx).type}"
            )
    if problems:
        raise ValueError(
            f"{where} does not satisfy the declared schema contract:\n  "
            + "\n  ".join(problems)
            + f"\nfound schema: {found}"
        )


def read_parquet(
    paths,
    columns: list[str] | None = None,
    expect: pa.Schema | None = None,
    **kw,
) -> Dataset:
    """``expect=`` declares a column contract, checked against the
    parquet footer on the driver (metadata-only — no data read)."""
    if expect is not None:
        import pyarrow.parquet as pq

        first = paths[0] if isinstance(paths, (list, tuple)) else paths
        validate_schema(pq.read_schema(_first_file(first)), expect, where=str(first))
    return ray.data.read_parquet(paths, columns=columns, **kw)


def _first_file(path: str) -> str:
    """A directory input is validated by its first parquet member —
    searched recursively, so hive-partitioned layouts (``key=value/``
    subdirectories) validate too. A directory with no parquet member
    at all gets a clear error instead of an opaque reader failure."""
    import os

    if os.path.isdir(path):
        for root, dirs, files in os.walk(path):
            dirs.sort()
            for name in sorted(files):
                if name.endswith(".parquet"):
                    return os.path.join(root, name)
        raise ValueError(
            f"cannot validate schema contract: no .parquet file under {path!r}"
        )
    return path


def read_transcripts(paths, columns: list[str] | None = None, **kw) -> Dataset:
    """Read a transcript table, enforcing the engine's input contract
    (conv_id:string, turn_idx:int32, role/text/tool:string,
    ts:timestamp[us] — BASELINE.json input_hint) before the scan."""
    from turboxsl_ray.sources.transcripts import TRANSCRIPT_SCHEMA

    return read_parquet(paths, columns=columns, expect=TRANSCRIPT_SCHEMA, **kw)


def read_csv(paths, **kw) -> Dataset:
    return ray.data.read_csv(paths, **kw)


def read_json(paths, **kw) -> Dataset:
    """JSON-lines (one object per line)."""
    return ray.data.read_json(paths, **kw)


def write_parquet(ds: Dataset, out_dir: str, **kw) -> None:
    ds.write_parquet(out_dir, **kw)


def write_csv(ds: Dataset, out_dir: str, **kw) -> None:
    ds.write_csv(out_dir, **kw)


def write_json(ds: Dataset, out_dir: str, **kw) -> None:
    ds.write_json(out_dir, **kw)
