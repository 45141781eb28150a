"""Flagship pipeline end-to-end: pandas oracle equality, salting
equivalence (F4), temporal leakage (F3), checkpoint resume (F6)."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from turboxsl_ray.pipelines.flagship import FlagshipConfig, run_flagship
from turboxsl_ray.sources.transcripts import synth_asof_side, synth_transcripts

GAP = 15 * 60 * 1_000_000


def _read_out(out_dir: str) -> pd.DataFrame:
    files = sorted(glob.glob(os.path.join(out_dir, "part=*.parquet")))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)


def _oracle(left_tbl: pa.Table, right_tbl: pa.Table | None) -> pd.DataFrame:
    ldf = left_tbl.to_pandas()
    if right_tbl is not None:
        ldf = ldf.sort_values("ts", kind="stable").reset_index(drop=True)
        rdf = right_tbl.to_pandas().sort_values("ts", kind="stable").reset_index(drop=True)
        ldf = pd.merge_asof(ldf, rdf, by="conv_id", on="ts", direction="backward")
    df = ldf.sort_values(["conv_id", "ts", "turn_idx"], kind="stable").reset_index(drop=True)
    g = df.groupby("conv_id", sort=False)
    df["lag_value_1"] = g["value"].shift(1)
    df["lag_value_2"] = g["value"].shift(2)
    df["lag_role_1"] = g["role"].shift(1)
    df["lead_value_1"] = g["value"].shift(-1)
    df["gap_us"] = (g["ts"].diff().dt.total_seconds() * 1e6).round()
    df["roll_mean_10_value"] = (
        g["value"].rolling(10, min_periods=1).mean().reset_index(drop=True).to_numpy()
    )
    df["tool_ffill"] = g["tool"].ffill()
    new_s = df["gap_us"].isna() | (df["gap_us"] > GAP)
    df["session_idx"] = new_s.groupby(df["conv_id"], sort=False).cumsum() - 1
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)


def _compare(out: pd.DataFrame, want: pd.DataFrame):
    assert len(out) == len(want)
    for col in ["lag_value_1", "lag_value_2", "lead_value_1", "roll_mean_10_value",
                "feature_a", "gap_us"]:
        if col in want.columns:
            np.testing.assert_allclose(
                out[col].astype(float).to_numpy(),
                want[col].astype(float).to_numpy(),
                rtol=1e-9, atol=1e-9, equal_nan=True, err_msg=col,
            )
    np.testing.assert_array_equal(
        out["session_idx"].to_numpy(), want["session_idx"].to_numpy()
    )
    for col in ["lag_role_1", "tool_ffill"]:
        assert out[col].fillna("∅").tolist() == want[col].fillna("∅").tolist(), col
    assert out["text"].tolist() == want["text"].tolist(), "text byte-equality violated"


@pytest.fixture(scope="module")
def small_tables():
    left = synth_transcripts(n_convs=40, mean_turns=15, seed=31)
    right = synth_asof_side(left, seed=32, rows_per_conv=5)
    return left, right


def test_flagship_matches_oracle(ray_session, small_tables, tmp_path_factory):
    import ray.data as rd

    left_tbl, right_tbl = small_tables
    out_dir = str(tmp_path_factory.mktemp("flag"))
    cfg = FlagshipConfig(num_partitions=8, salt_threshold_rows=10**9)
    m = run_flagship(
        rd.from_arrow(left_tbl).repartition(5),
        rd.from_arrow(right_tbl).repartition(3),
        out_dir, cfg,
    )
    assert m["rows_written"] == left_tbl.num_rows
    assert m["salted_convs"] == 0
    out = _read_out(out_dir)
    want = _oracle(left_tbl, right_tbl)
    _compare(out, want)
    # lineage records cover all partitions and rows
    total = sum(r["row_count"] for r in m["manifest"])
    assert total == left_tbl.num_rows
    assert all(r["max_ts_watermark_us"] is not None for r in m["manifest"])


def test_flagship_salted_equals_unsalted(ray_session, tmp_path_factory):
    """F4: one mega conversation; salting on vs off must be identical."""
    import ray.data as rd

    left_tbl = synth_transcripts(
        n_convs=25, mean_turns=12, seed=41, mega_frac=0.5, max_turns=400
    )
    right_tbl = synth_asof_side(left_tbl, seed=42, rows_per_conv=4)

    out_a = str(tmp_path_factory.mktemp("unsalted"))
    out_b = str(tmp_path_factory.mktemp("salted"))
    base = dict(num_partitions=8)
    m_a = run_flagship(
        rd.from_arrow(left_tbl), rd.from_arrow(right_tbl), out_a,
        FlagshipConfig(**base, salt_threshold_rows=10**9),
    )
    m_b = run_flagship(
        rd.from_arrow(left_tbl), rd.from_arrow(right_tbl), out_b,
        FlagshipConfig(**base, salt_threshold_rows=100, salt_bucket_rows=150),
    )
    assert m_a["salted_convs"] == 0
    assert m_b["salted_convs"] >= 1
    a, b = _read_out(out_a), _read_out(out_b)
    assert len(a) == len(b) == left_tbl.num_rows  # replica dedup exact
    # every feature identical
    for col in a.columns:
        if col in ("part_id",):
            continue
        av, bv = a[col], b[col]
        if av.dtype.kind == "f":
            np.testing.assert_allclose(
                av.to_numpy(), bv.to_numpy(), rtol=1e-9, atol=1e-9,
                equal_nan=True, err_msg=col,
            )
        else:
            assert av.fillna("∅").tolist() == bv.fillna("∅").tolist(), col
    # and both equal the pandas oracle
    _compare(b, _oracle(left_tbl, right_tbl))

    # manifest observability: per-partition byte/salt stats + the
    # run-level plan record name the salted conversation and buckets
    from turboxsl_ray.state import lineage

    for rec in m_b["manifest"]:
        assert rec["byte_size"] > 0
        assert rec["salted_rows"] >= 0
    assert sum(r["salted_rows"] for r in m_b["manifest"]) > 0
    run_rec = lineage.load_run_record(out_b)
    assert run_rec is not None
    assert len(run_rec["salted_convs"]) >= 1
    mega = run_rec["salted_convs"][0]
    assert run_rec["plan_buckets"][mega] >= 2
    assert set(run_rec["phase_sec"]) == {
        "prepass_counts", "prepass_offsets", "main"}


def test_session_offsets_bucketed_pass_parity(ray_session):
    """The per-bucket count pass (shuffle by (conv, salt) with boundary
    replicas) must produce EXACTLY the conv-whole pass's offsets and
    bucket counts — including duplicate-ts tie-breaks and
    exact-threshold gaps (the generator plants both)."""
    import ray.data as rd

    from turboxsl_ray.pipelines.flagship import session_offsets

    left_tbl = synth_transcripts(
        n_convs=40, mean_turns=12, seed=43, mega_frac=0.6, max_turns=500
    )
    left = rd.from_arrow(left_tbl)
    # salt the mega conversation AND a few ordinary ones: buckets of 97
    # rows don't align with session boundaries
    cnt = left_tbl.to_pandas().groupby("conv_id").size()
    plan = {c: 97 for c in cnt[cnt > 120].index}
    assert len(plan) >= 2
    whole = session_offsets(left, plan, GAP, 8)
    bucketed = session_offsets(left, plan, GAP, 8, approx_rows=10**9)
    assert bucketed == whole
    # and the threshold gate itself: small approx_rows keeps conv-whole
    assert session_offsets(left, plan, GAP, 8, approx_rows=5) == whole


def test_no_temporal_leakage(ray_session, tmp_path_factory):
    """F3: poison every right-side row that is in the left row's future;
    no poison may surface in any feature."""
    import ray.data as rd

    left_tbl = synth_transcripts(n_convs=20, mean_turns=10, seed=51)
    right_tbl = synth_asof_side(left_tbl, seed=52, rows_per_conv=6)
    # make feature_a strictly equal to its own ts (us) -> a feature value
    # from the future would be > the row's own ts
    rts = right_tbl["ts"].cast(pa.int64())
    right_tbl = right_tbl.set_column(
        right_tbl.column_names.index("feature_a"),
        "feature_a",
        rts.cast(pa.float64()),
    )
    out_dir = str(tmp_path_factory.mktemp("leak"))
    run_flagship(
        rd.from_arrow(left_tbl), rd.from_arrow(right_tbl), out_dir,
        FlagshipConfig(num_partitions=6, salt_threshold_rows=10**9),
    )
    out = _read_out(out_dir)
    got = out["feature_a"].to_numpy()
    own_ts = out["ts"].astype("int64").to_numpy().astype(float)
    ok = np.isnan(got) | (got <= own_ts)
    assert ok.all(), "feature read a right-side row with ts' > ts (leakage)"


def test_salting_bucket_plan_exact_despite_undercount(
    ray_session, tmp_path_factory, monkeypatch
):
    """ADVICE r1 (medium): the floored skew pre-pass may undercount a
    mega conversation; the right-side replication plan must still come
    from the exact session_offsets pass, so no salt bucket is ever
    starved of its as-of feature rows."""
    import ray.data as rd

    from turboxsl_ray.pipelines import flagship as F

    left_tbl = synth_transcripts(
        n_convs=25, mean_turns=12, seed=61, mega_frac=0.5, max_turns=400
    )
    right_tbl = synth_asof_side(left_tbl, seed=62, rows_per_conv=4)

    real = F.conv_counts

    def undercount(ds, key="conv_id", min_total=None, blocks_hint=1024):
        counts = real(ds, key=key, min_total=min_total, blocks_hint=blocks_hint)
        # report barely-over-threshold totals: a count-derived bucket
        # plan would collapse to ceil(101/150)=1 bucket and leave salt
        # buckets >= 1 without right-side rows (null features)
        return {c: 101 for c in counts}

    monkeypatch.setattr(F, "conv_counts", undercount)

    out_dir = str(tmp_path_factory.mktemp("undercount"))
    m = F.run_flagship(
        rd.from_arrow(left_tbl), rd.from_arrow(right_tbl), out_dir,
        FlagshipConfig(
            num_partitions=8, salt_threshold_rows=100, salt_bucket_rows=150
        ),
    )
    assert m["salted_convs"] >= 1
    out = _read_out(out_dir)
    _compare(out, _oracle(left_tbl, right_tbl))
    # as-of features actually present beyond the first salt bucket
    mega = out.groupby("conv_id").size().idxmax()
    sub = out[out["conv_id"] == mega].sort_values("turn_idx")
    assert len(sub) > 150 and sub["feature_a"].iloc[150:].notna().any()


def test_flagship_no_right_side(ray_session, small_tables, tmp_path_factory):
    """right=None: window features only, oracle-equal, no as-of cols."""
    import ray.data as rd

    left_tbl, _ = small_tables
    out_dir = str(tmp_path_factory.mktemp("noright"))
    m = run_flagship(
        rd.from_arrow(left_tbl), None, out_dir,
        FlagshipConfig(num_partitions=6, salt_threshold_rows=10**9),
    )
    assert m["rows_written"] == left_tbl.num_rows
    out = _read_out(out_dir)
    assert "feature_a" not in out.columns
    _compare(out, _oracle(left_tbl, None))


def test_flagship_single_mega_conversation(ray_session, tmp_path_factory):
    """The ultimate skew: EVERY row belongs to one conversation; the
    whole input must be salted into buckets and still match the
    oracle."""
    import ray.data as rd

    # mega_frac=0.99 + tiny base convs => one conversation holds ~99%
    # of all turns (the generator pins tiny convs to 1 turn each)
    left_tbl = synth_transcripts(
        n_convs=3, mean_turns=5, seed=81, mega_frac=0.99, max_turns=200
    )
    right_tbl = synth_asof_side(left_tbl, seed=82, rows_per_conv=6,
                                absent_frac=0.0)
    counts = pd.Series(left_tbl["conv_id"].to_pylist()).value_counts()
    assert counts.iloc[0] / len(left_tbl) > 0.9
    out_dir = str(tmp_path_factory.mktemp("onemega"))
    m = run_flagship(
        rd.from_arrow(left_tbl).repartition(6), rd.from_arrow(right_tbl),
        out_dir,
        FlagshipConfig(num_partitions=8, salt_threshold_rows=100,
                       salt_bucket_rows=64),
    )
    assert m["salted_convs"] == 1
    out = _read_out(out_dir)
    assert len(out) == left_tbl.num_rows
    _compare(out, _oracle(left_tbl, right_tbl))
    # the mega conversation really was spread over several partitions
    assert len({r["part_id"] for r in m["manifest"] if r["row_count"]}) >= 2


def test_flagship_empty_left(ray_session, tmp_path_factory):
    import pyarrow as pa
    import ray.data as rd

    from turboxsl_ray.sources.transcripts import TRANSCRIPT_SCHEMA

    empty = TRANSCRIPT_SCHEMA.empty_table()
    out_dir = str(tmp_path_factory.mktemp("emptyleft"))
    m = run_flagship(
        rd.from_arrow(empty), None, out_dir,
        FlagshipConfig(num_partitions=4, salt_threshold_rows=10**9),
    )
    assert m["rows_written"] == 0 and m["salted_convs"] == 0


def test_resume_skips_done_and_is_identical(ray_session, small_tables, tmp_path_factory):
    """F6: kill after k partitions; resume completes; bytes identical."""
    import ray.data as rd

    left_tbl, right_tbl = small_tables
    cfg = FlagshipConfig(num_partitions=8, salt_threshold_rows=10**9)

    full_dir = str(tmp_path_factory.mktemp("full"))
    run_flagship(rd.from_arrow(left_tbl), rd.from_arrow(right_tbl), full_dir, cfg)

    part_dir = str(tmp_path_factory.mktemp("partial"))
    # Ray Data wraps worker exceptions (RayTaskError(UserCodeException)),
    # so match on the message rather than the concrete type
    with pytest.raises(Exception, match="injected failure"):
        run_flagship(
            rd.from_arrow(left_tbl), rd.from_arrow(right_tbl), part_dir, cfg,
            fail_after_parts=3,
        )
    from turboxsl_ray.state import lineage

    done_before = lineage.load_done(part_dir)
    # worker-side atomic slot claim => exactly 3 partitions completed
    assert len(done_before) == 3

    m = run_flagship(rd.from_arrow(left_tbl), rd.from_arrow(right_tbl), part_dir, cfg)
    assert m["partitions_skipped"] == len(done_before)
    # written partitions in resume run exclude the done ones
    assert m["partitions_written"] <= cfg.num_partitions - len(done_before) + 1

    a, b = _read_out(full_dir), _read_out(part_dir)
    pd.testing.assert_frame_equal(a, b)


def test_conv_counts_distributed_combine_matches_driver_combine(ray_session):
    """When the pigeonhole floor degenerates to 0 (scan spans more
    blocks than min_total — the 100 TB shape), conv_counts must switch
    to the hash-exchange combine of partial counts and return exactly
    the same mega set + totals as exact per-conv counting."""
    import ray.data as rd

    from turboxsl_ray.stages.salting import conv_counts

    left_tbl = synth_transcripts(
        n_convs=30, mean_turns=10, seed=71, mega_frac=0.4, max_turns=300
    )
    ds = rd.from_arrow(left_tbl).repartition(8)

    # exact ground truth on the driver
    import collections

    true_counts = collections.Counter(left_tbl["conv_id"].to_pylist())
    min_total = 50
    expected = {c: n for c, n in true_counts.items() if n > min_total}

    # blocks_hint >> min_total forces floor == 0 -> distributed path
    got = conv_counts(ds, min_total=min_total, blocks_hint=10**6)
    assert got == expected

    # the floored driver path selects a SUBSET (undercount may drop
    # barely-over-threshold convs — documented selection-only
    # contract); anything comfortably over the threshold must survive
    got_floored = conv_counts(ds, min_total=min_total, blocks_hint=8)
    assert set(got_floored) <= set(expected)
    floor = min_total // 8
    comfortably = {
        c for c, n in true_counts.items() if n > min_total + floor * 8
    }
    assert comfortably <= set(got_floored)


def test_resume_after_config_change_recomputes_and_purges(
    ray_session, small_tables, tmp_path_factory
):
    """Resuming into an output dir written under a DIFFERENT config
    must not skip (stale features would silently mix); stale partition
    files beyond the new partition count must be purged."""
    import os

    import ray.data as rd

    left_tbl, right_tbl = small_tables
    out_dir = str(tmp_path_factory.mktemp("reconf"))

    cfg_a = FlagshipConfig(num_partitions=8, salt_threshold_rows=10**9)
    run_flagship(
        rd.from_arrow(left_tbl).repartition(5),
        rd.from_arrow(right_tbl).repartition(3),
        out_dir, cfg_a,
    )
    files_a = {f for f in os.listdir(out_dir) if f.endswith(".parquet")}
    assert len(files_a) == 8

    # fewer partitions + different lags: every partition must recompute
    cfg_b = FlagshipConfig(
        num_partitions=4, salt_threshold_rows=10**9, lags=(("value", 3),)
    )
    m = run_flagship(
        rd.from_arrow(left_tbl).repartition(5),
        rd.from_arrow(right_tbl).repartition(3),
        out_dir, cfg_b,
    )
    assert m["partitions_skipped"] == 0
    assert m["partitions_written"] == 4
    files_b = {f for f in os.listdir(out_dir) if f.endswith(".parquet")}
    assert len(files_b) == 4  # stale part=0004..0007 purged

    out = _read_out(out_dir)
    assert len(out) == left_tbl.num_rows
    assert "lag_value_3" in out.columns and "lag_value_1" not in out.columns

    # a third run with cfg_b (unchanged) skips everything
    m3 = run_flagship(
        rd.from_arrow(left_tbl).repartition(5),
        rd.from_arrow(right_tbl).repartition(3),
        out_dir, cfg_b,
    )
    assert m3["partitions_skipped"] == 4
    assert m3["partitions_written"] == 0


def test_purge_removes_torn_manifest_orphan(tmp_path):
    """A crash that tears a manifest mid-write must not leave its data
    file behind when a reconfigured run purges: the part id is
    recoverable from the manifest FILENAME."""
    from turboxsl_ray.state import lineage

    out = str(tmp_path / "out")
    lineage.prepare_output_dir(out)
    tbl = pa.table({"conv_id": ["a"], "v": [1]})
    lineage.write_partition(out, 7, tbl, config_fingerprint="OLD", input_id="i")
    # tear the manifest (truncated JSON), data file intact
    mpath = os.path.join(out, lineage.MANIFEST_DIR, "part-00007.json")
    with open(mpath, "w") as f:
        f.write('{"part_id": 7, "outp')
    dpath = lineage.data_path(out, 7)
    assert os.path.exists(dpath)

    purged = lineage.purge_mismatched(out, "NEW", "i")
    assert purged == [7]
    assert not os.path.exists(dpath)
    assert not os.path.exists(mpath)
    # matching partitions survive a purge untouched
    lineage.write_partition(out, 1, tbl, config_fingerprint="NEW", input_id="i")
    assert lineage.purge_mismatched(out, "NEW", "i") == []
    assert os.path.exists(lineage.data_path(out, 1))


def test_purge_never_follows_manifest_path_outside_out_dir(tmp_path):
    """A corrupted/foreign manifest naming a path outside out_dir must
    not turn the purge into an arbitrary-file delete: the purge falls
    back to the canonical rebuilt path and leaves the foreign file."""
    import json

    from turboxsl_ray.state import lineage

    out = str(tmp_path / "out")
    lineage.prepare_output_dir(out)
    victim = tmp_path / "unrelated.parquet"
    victim.write_bytes(b"precious")
    tbl = pa.table({"conv_id": ["a"], "v": [1]})
    lineage.write_partition(out, 3, tbl, config_fingerprint="OLD", input_id="i")
    mpath = os.path.join(out, lineage.MANIFEST_DIR, "part-00003.json")
    rec = json.load(open(mpath))
    rec["output_file"] = str(victim)  # hostile/corrupt manifest
    with open(mpath, "w") as f:
        json.dump(rec, f)

    purged = lineage.purge_mismatched(out, "NEW", "i")
    assert purged == [3]
    assert victim.exists()                              # foreign file untouched
    assert not os.path.exists(lineage.data_path(out, 3))  # canonical orphan gone
    assert not os.path.exists(mpath)


def test_streaming_window_unbounded_guard(ray_session):
    """finished_cap=None keeps the reappearance guard deterministic:
    a conversation resurfacing after ANY number of closed conversations
    raises instead of silently producing wrong state-carried values."""
    from turboxsl_ray.stages.window_stage import WindowSpec
    from turboxsl_ray.stages.streaming_window import StreamingWindowStage

    spec = WindowSpec(lags=[("value", 1)])
    stage = StreamingWindowStage(spec, finished_cap=None)

    def batch(conv, vals):
        return pa.table(
            {
                "conv_id": pa.array([conv] * len(vals)),
                "turn_idx": pa.array(range(len(vals)), pa.int32()),
                "ts": pa.array([1000 * (i + 1) for i in range(len(vals))], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "value": pa.array([float(v) for v in vals]),
            }
        )

    stage(batch("c0", [1, 2]))
    for i in range(1, 300):  # far past any would-be LRU window
        stage(batch(f"c{i}", [1.0]))
    with pytest.raises(ValueError, match="reappeared"):
        stage(batch("c0", [3]))
