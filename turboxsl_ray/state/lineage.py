"""Per-partition lineage records + resumable partitioned output.

Layout under ``out_dir``::

    part=00042.parquet          # one file per stable partition id
    _manifest/part-00042.json   # written AFTER the data file (atomic
                                # rename) -> presence == completed

A manifest record carries: partition id, row count, conversation
count, ts watermark (min/max), output file, input identifier, and the
engine config fingerprint. ``load_done`` returns completed partition
ids; the pipeline filters those rows out right after the read, so a
resumed run never shuffles or recomputes finished partitions
(north_rule "resumable from checkpoint without recomputation").
Resume is config/input-gated: partitions written under a different
config fingerprint or input id are purged and recomputed
(``purge_mismatched``) — a reconfigured run can never silently mix
feature definitions in one output directory.

Writes are idempotent: a retried/duplicate partition task overwrites
the same deterministic filename, so retries cannot double rows.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_DIR = "_manifest"


def _manifest_path(out_dir: str, part_id: int) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"part-{part_id:05d}.json")


def data_path(out_dir: str, part_id: int) -> str:
    return os.path.join(out_dir, f"part={part_id:05d}.parquet")


def prepare_output_dir(out_dir: str) -> None:
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)


def write_partition(
    out_dir: str,
    part_id: int,
    tbl: pa.Table,
    *,
    input_id: str = "",
    config_fingerprint: str = "",
    extra: dict[str, Any] | None = None,
    annotations: dict[str, str] | None = None,
) -> dict[str, Any]:
    """Write one partition's rows + its lineage record (atomically:
    data file first, then manifest via tmp+rename). Returns the record.

    ``annotations`` is the ``xsl:comment`` / ``xsl:processing-
    instruction`` analog (ref instructions.c:467-478): out-of-band
    key→value strings that ride the parquet file's key-value metadata
    — part of the output artifact, never part of the row data. Any
    parquet reader (including DuckDB's ``parquet_kv_metadata``) can
    surface them; see ``read_annotations``.
    """
    dpath = data_path(out_dir, part_id)
    tmp = dpath + ".tmp"
    if annotations:
        meta = dict(tbl.schema.metadata or {})
        meta.update({k.encode(): v.encode() for k, v in annotations.items()})
        tbl = tbl.replace_schema_metadata(meta)
    pq.write_table(tbl, tmp)
    os.replace(tmp, dpath)

    ts_col = tbl["ts"].cast(pa.int64()) if "ts" in tbl.column_names else None
    import pyarrow.compute as pc

    record = {
        "part_id": part_id,
        "row_count": tbl.num_rows,
        "conv_count": (
            pc.count_distinct(tbl["conv_id"]).as_py()
            if "conv_id" in tbl.column_names
            else None
        ),
        "min_ts_us": pc.min(ts_col).as_py() if ts_col is not None and tbl.num_rows else None,
        "max_ts_watermark_us": pc.max(ts_col).as_py() if ts_col is not None and tbl.num_rows else None,
        "output_file": dpath,
        "input_id": input_id,
        "config_fingerprint": config_fingerprint,
        **(extra or {}),
    }
    mpath = _manifest_path(out_dir, part_id)
    fd, tmpm = tempfile.mkstemp(dir=os.path.dirname(mpath), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(record, f)
    os.replace(tmpm, mpath)
    return record


def read_annotations(path: str) -> dict[str, str]:
    """Read back the out-of-band comment/PI annotations from a parquet
    file's key-value metadata (footer only — no row data is read)."""
    meta = pq.read_schema(path).metadata or {}
    out: dict[str, str] = {}
    for k, v in meta.items():
        ks = k.decode(errors="replace")
        if ks.startswith(("comment:", "pi:")):
            out[ks] = v.decode(errors="replace")
    return out


def purge_mismatched(
    out_dir: str, config_fingerprint: str, input_id: str
) -> list[int]:
    """Remove partitions (manifest + data file) written under a
    DIFFERENT config or input, so a reconfigured run's output directory
    never contains stale files from the previous definition (e.g. a
    part id beyond the new partition count). Returns purged ids."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    purged: list[int] = []
    if not os.path.isdir(mdir):
        return purged
    for name in os.listdir(mdir):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        mpath = os.path.join(mdir, name)
        try:
            with open(mpath) as f:
                rec = json.load(f)
            ok = (
                rec.get("config_fingerprint") == config_fingerprint
                and rec.get("input_id") == input_id
            )
        except (json.JSONDecodeError, OSError):
            ok = False  # torn record: drop it (and any file it names)
            rec = {}
        if ok:
            continue
        # the part id is recoverable from the manifest filename even
        # when the record itself is torn, so the orphan data file of a
        # crashed write never survives a reconfigured run
        try:
            pid = int(rec.get("part_id", name[len("part-"):-len(".json")]))
        except ValueError:
            pid = None
        out_file = rec.get("output_file") or (
            data_path(out_dir, pid) if pid is not None else None
        )
        # never follow a manifest-supplied path outside out_dir: a
        # corrupted (or foreign) manifest naming /etc/... must not turn
        # the purge into an arbitrary-file delete
        if out_file:
            root = os.path.realpath(out_dir)
            if os.path.commonpath([os.path.realpath(out_file), root]) != root:
                out_file = data_path(out_dir, pid) if pid is not None else None
        if out_file and os.path.exists(out_file):
            os.remove(out_file)
        os.remove(mpath)
        if pid is not None:
            purged.append(pid)
    return purged


def write_run_record(out_dir: str, record: dict[str, Any]) -> None:
    """Run-level plan/decision record (which conversations were
    salted, bucket plan, phase timings) — the observability analog of
    the reference's task-graph dump (template_task_graph.c:145-373)."""
    path = os.path.join(out_dir, MANIFEST_DIR, "run.json")
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(record, f)
    os.replace(tmp, path)


def load_run_record(out_dir: str) -> dict[str, Any] | None:
    path = os.path.join(out_dir, MANIFEST_DIR, "run.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def load_done(
    out_dir: str,
    config_fingerprint: str | None = None,
    input_id: str | None = None,
) -> set[int]:
    """Partition ids with a manifest record AND an intact data file.

    When ``config_fingerprint`` / ``input_id`` are given, a partition
    only counts as done if its manifest was written under the SAME
    config and input — resuming after a config or input change must
    recompute, never silently mix outputs from two different runs.
    """
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    done: set[int] = set()
    if not os.path.isdir(mdir):
        return done
    for name in os.listdir(mdir):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                rec = json.load(f)
            if config_fingerprint is not None and rec.get(
                "config_fingerprint"
            ) != config_fingerprint:
                continue
            if input_id is not None and rec.get("input_id") != input_id:
                continue
            if os.path.exists(rec["output_file"]):
                done.add(int(rec["part_id"]))
        except (json.JSONDecodeError, KeyError, OSError):
            continue  # torn record -> treat as not done, recompute
    return done


def load_manifest(out_dir: str) -> list[dict[str, Any]]:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    out = []
    if os.path.isdir(mdir):
        for name in sorted(os.listdir(mdir)):
            if name.startswith("part-") and name.endswith(".json"):
                with open(os.path.join(mdir, name)) as f:
                    out.append(json.load(f))
    return out
