"""Engine facade, CLI entry, and map_conversations API."""

from __future__ import annotations

import json
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def transcript_dir(tmp_path_factory):
    from turboxsl_ray.sources.transcripts import synth_asof_side, synth_transcripts

    d = tmp_path_factory.mktemp("engine_in")
    left = synth_transcripts(n_convs=40, mean_turns=10, seed=31)
    right = synth_asof_side(left, seed=32)
    pq.write_table(left, str(d / "transcripts.parquet"))
    pq.write_table(right, str(d / "features.parquet"))
    return d


def test_engine_run_and_read(ray_session, transcript_dir, tmp_path):
    from turboxsl_ray.engine import Engine, EngineConfig

    eng = Engine(EngineConfig(num_partitions=8, salt_threshold_rows=1000))
    out = str(tmp_path / "out")
    metrics = eng.run(
        str(transcript_dir / "transcripts.parquet"),
        str(transcript_dir / "features.parquet"),
        out,
        resume=False,
    )
    assert metrics["rows_written"] > 0
    back = eng.read_output(out)
    cols = set(back.schema().names)
    assert {"conv_id", "turn_idx", "session_idx", "feature_a", "lag_value_1"} <= cols
    assert back.count() == metrics["rows_written"]


def test_cli_runs_standalone(transcript_dir, tmp_path):
    """The turboxsltproc-analog CLI owns its own Ray session."""
    out = str(tmp_path / "cli_out")
    proc = subprocess.run(
        [sys.executable, "-m", "turboxsl_ray", "run",
         "--input", str(transcript_dir / "transcripts.parquet"),
         "--features", str(transcript_dir / "features.parquet"),
         "--output", out, "--num-partitions", "8", "--num-cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    metrics = json.loads(proc.stdout.strip().splitlines()[-1])
    assert metrics["rows_written"] > 0


def test_map_conversations(ray_session, transcript_dir):
    import ray.data

    from turboxsl_ray.stages.groups import map_conversations

    ds = ray.data.read_parquet(str(transcript_dir / "transcripts.parquet"))

    def summarize(conv: pa.Table) -> pa.Table:
        ts = conv["ts"].cast(pa.int64()).to_numpy()
        assert (np.diff(ts) >= 0).all()  # sorted within conversation
        return pa.table(
            {
                "conv_id": conv["conv_id"].slice(0, 1),
                "n_turns": pa.array([conv.num_rows], pa.int64()),
                "span_us": pa.array([int(ts[-1] - ts[0])], pa.int64()),
            }
        )

    out = map_conversations(ds, summarize, num_partitions=8).to_pandas()
    src = pq.read_table(str(transcript_dir / "transcripts.parquet")).to_pandas()
    expect = src.groupby("conv_id").size()
    got = out.set_index("conv_id")["n_turns"]
    assert got.sort_index().tolist() == expect.sort_index().tolist()


def test_cli_queries_listing(capsys):
    from turboxsl_ray.__main__ import main

    assert main(["queries"]) == 0
    out = capsys.readouterr().out
    assert "asof_join\toracle" in out
    assert "minhash_lsh\toracle" in out
    assert "ann_ivf\trows-only" in out


def test_cli_query_subcommand(ray_session, tmp_path, capsys):
    import glob
    import json

    import pyarrow.parquet as pq

    from turboxsl_ray.__main__ import main

    # unknown name → exit 2
    assert main(["query", "nope", "--sf", "/root/testdata/sf0.001"]) == 2
    capsys.readouterr()

    # count mode
    assert main(["query", "event_counts", "--sf", "/root/testdata/sf0.001"]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["rows"] == 5

    # write mode (Dataset result)
    out = str(tmp_path / "tok")
    assert main(["query", "token_stats", "--sf", "/root/testdata/sf0.001",
                 "--out", out]) == 0
    files = glob.glob(out + "/*.parquet")
    assert files
    n = sum(pq.read_table(f).num_rows for f in files)
    assert n == 500


def test_map_partitions_serial_override(ray_session):
    """serial=True (the fork="no" analog) collapses the stage to ONE
    task over ONE block: fn sees every row in a single call, in input
    order; without it a multi-block input is seen in pieces."""
    import ray

    from turboxsl_ray.stages.partitioning import map_partitions

    src = pa.table({"i": pa.array(range(100), pa.int64())})
    ds = ray.data.from_arrow(src).repartition(8)

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "block_rows", pa.array([t.num_rows] * t.num_rows, pa.int64())
        )

    serial = map_partitions(ds, tag, serial=True).to_pandas()
    assert (serial["block_rows"] == 100).all()        # one call saw it all
    assert list(serial["i"]) == list(range(100))      # input order preserved
    parallel = map_partitions(ds, tag).to_pandas()
    assert (parallel["block_rows"] < 100).any()       # control: blocks stay split
