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

from ray.data import Dataset

import ray.data


def read_parquet(paths, columns: list[str] | None = None, **kw) -> Dataset:
    return ray.data.read_parquet(paths, columns=columns, **kw)


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
