"""Window kernels vs pandas groupby oracle (FIXTURES.md F1/F5)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from turboxsl_ray.kernels import windows as W
from turboxsl_ray.sources.transcripts import synth_transcripts


@pytest.fixture(scope="module")
def sorted_df():
    tbl = synth_transcripts(n_convs=60, mean_turns=12, seed=7)
    df = tbl.to_pandas()
    df = df.sort_values(["conv_id", "ts", "turn_idx"], kind="stable").reset_index(
        drop=True
    )
    return df


def _starts(df):
    return W.segment_starts(df["conv_id"].to_numpy())


def test_segment_starts_matches_groupby(sorted_df):
    starts = _starts(sorted_df)
    assert starts.sum() == sorted_df["conv_id"].nunique()
    # first row of every group is a start
    firsts = sorted_df.groupby("conv_id", sort=False).head(1).index.to_numpy()
    assert np.array_equal(np.flatnonzero(starts), firsts)


def test_segment_starts_from_arrow_equals_numpy(sorted_df):
    arr = pa.array(sorted_df["conv_id"].to_numpy(), type=pa.string())
    np.testing.assert_array_equal(
        W.segment_starts_from_arrow(arr), _starts(sorted_df)
    )


@pytest.mark.parametrize("k", [1, 2, 5])
def test_lag_matches_pandas_shift(sorted_df, k):
    starts = _starts(sorted_df)
    idx = W.lag_indices(starts, k)
    got = W.take_with_null(sorted_df["value"].to_numpy(), idx).to_pandas()
    want = sorted_df.groupby("conv_id", sort=False)["value"].shift(k)
    pd.testing.assert_series_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_names=False
    )


@pytest.mark.parametrize("k", [1, 3])
def test_lead_matches_pandas_shift(sorted_df, k):
    starts = _starts(sorted_df)
    idx = W.lead_indices(starts, k)
    got = W.take_with_null(sorted_df["value"].to_numpy(), idx).to_pandas()
    want = sorted_df.groupby("conv_id", sort=False)["value"].shift(-k)
    pd.testing.assert_series_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_names=False
    )


def test_gap_matches_pandas_diff(sorted_df):
    starts = _starts(sorted_df)
    ts_us = sorted_df["ts"].astype("int64").to_numpy()
    gaps, valid = W.gap_us(starts, ts_us)
    want = sorted_df.groupby("conv_id", sort=False)["ts"].diff().dt.total_seconds() * 1e6
    got = np.where(valid, gaps.astype(float), np.nan)
    np.testing.assert_allclose(got, want.to_numpy(), equal_nan=True)


def test_ffill_matches_pandas_ffill(sorted_df):
    starts = _starts(sorted_df)
    tool = sorted_df["tool"]
    valid = tool.notna().to_numpy()
    idx = W.ffill_indices(starts, valid)
    got = W.take_with_null(pa.array(tool, type=pa.string()), idx).to_pandas()
    want = sorted_df.groupby("conv_id", sort=False)["tool"].ffill()
    pd.testing.assert_series_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_names=False
    )


def test_session_index_matches_pandas(sorted_df):
    thr = 15 * 60 * 1_000_000
    starts = _starts(sorted_df)
    ts_us = sorted_df["ts"].astype("int64").to_numpy()
    new_s, sess = W.session_index(starts, ts_us, thr)
    g = sorted_df.groupby("conv_id", sort=False)
    gap = g["ts"].diff().dt.total_seconds() * 1e6
    want_new = gap.isna() | (gap > thr)
    want_sess = want_new.groupby(sorted_df["conv_id"], sort=False).cumsum() - 1
    np.testing.assert_array_equal(new_s, want_new.to_numpy())
    np.testing.assert_array_equal(sess, want_sess.to_numpy())


def test_session_gap_exactly_threshold_stays(sorted_df):
    """gap == threshold must NOT break the session (F5 edge)."""
    ts = np.array([0, 100, 200], dtype=np.int64)
    starts = np.array([True, False, False])
    _, sess = W.session_index(starts, ts, gap_threshold_us=100)
    np.testing.assert_array_equal(sess, [0, 0, 0])
    _, sess2 = W.session_index(starts, ts, gap_threshold_us=99)
    np.testing.assert_array_equal(sess2, [0, 1, 2])


@pytest.mark.parametrize("k", [1, 3, 7])
def test_rolling_sum_mean_count_match_pandas(sorted_df, k):
    starts = _starts(sorted_df)
    v = sorted_df["value"].to_numpy()
    g = sorted_df.groupby("conv_id", sort=False)["value"]
    # cumsum-based windows differ from pandas' per-window re-sum by
    # O(n*eps) — the engine's allclose bar is rtol=1e-9 (FIXTURES.md)
    np.testing.assert_allclose(
        W.rolling_sum(starts, v, k),
        g.rolling(k, min_periods=1).sum().reset_index(drop=True).to_numpy(),
        rtol=1e-9,
        atol=1e-9,
    )
    np.testing.assert_allclose(
        W.rolling_mean(starts, v, k),
        g.rolling(k, min_periods=1).mean().reset_index(drop=True).to_numpy(),
        rtol=1e-9,
        atol=1e-9,
    )
    np.testing.assert_array_equal(
        W.rolling_count(starts, ~np.isnan(v), k),
        g.rolling(k, min_periods=1).count().reset_index(drop=True).to_numpy().astype(int),
    )


def test_single_turn_convs_all_null_lags():
    tbl = synth_transcripts(n_convs=10, mean_turns=1, seed=3)
    df = tbl.to_pandas().sort_values(["conv_id", "ts", "turn_idx"]).reset_index(drop=True)
    sizes = df.groupby("conv_id").size()
    singles = sizes[sizes == 1].index
    assert len(singles) > 0
    starts = W.segment_starts(df["conv_id"].to_numpy())
    lag = W.take_with_null(df["value"].to_numpy(), W.lag_indices(starts, 1)).to_pandas()
    assert lag[df["conv_id"].isin(singles)].isna().all()


def test_empty_input():
    starts = W.segment_starts(np.array([], dtype=object))
    assert len(W.lag_indices(starts, 1)) == 0
    assert len(W.ffill_indices(starts, np.array([], dtype=bool))) == 0


def test_rank_ntile_kernels_match_duckdb_windows():
    """Fuzz RANK/PERCENT_RANK/CUME_DIST/NTILE vs DuckDB's window
    functions on random segmentations with heavy ties."""
    import duckdb
    import numpy as np
    import pandas as pd

    from turboxsl_ray.kernels.windows import (
        ntile_in_segments,
        rank_in_segments,
        segment_starts,
    )

    rng = np.random.default_rng(3)
    for trial in range(25):
        segs = rng.integers(1, 9, size=rng.integers(1, 7))
        conv = np.repeat(np.arange(len(segs)), segs)
        vals = rng.integers(0, 4, size=conv.size).astype(np.float64)
        starts = segment_starts(conv)
        r, d, p, c = rank_in_segments(starts, vals)
        nt = ntile_in_segments(starts, 4)
        df = pd.DataFrame({"g": conv, "v": vals, "i": np.arange(conv.size)})
        o = duckdb.sql(
            """SELECT RANK() OVER w r, DENSE_RANK() OVER w d,
                      PERCENT_RANK() OVER w p,
                      CUME_DIST() OVER w c,
                      NTILE(4) OVER (PARTITION BY g ORDER BY i) nt
               FROM df WINDOW w AS (PARTITION BY g ORDER BY v) ORDER BY i"""
        ).df()
        assert (o["r"].to_numpy() == r).all(), trial
        assert (o["d"].to_numpy() == d).all(), trial
        assert np.allclose(o["p"].to_numpy(), p), trial
        assert np.allclose(o["c"].to_numpy(), c), trial
        assert (o["nt"].to_numpy() == nt).all(), trial


def test_rolling_range_matches_brute_force():
    """Time-window bounds vs per-row brute force, with ts ties (RANGE
    peers must be included) and multiple segments; fast composite-key
    path and the overflow per-segment fallback must agree."""
    from turboxsl_ray.kernels import windows as W

    rng = np.random.default_rng(5)
    segs = []
    ts = []
    for s in range(12):
        n = int(rng.integers(1, 40))
        # coarse grid -> plenty of exact ties within a segment
        t = np.sort(rng.integers(0, 50, size=n)) * 10
        segs += [s] * n
        ts.append(t)
    seg = np.array(segs)
    ts_us = np.concatenate(ts).astype(np.int64)
    starts = W.segment_starts(seg)
    vals = rng.normal(size=len(seg))
    window = 70

    lo, hi = W.rolling_range_bounds(starts, ts_us, window)
    sums, counts = W.rolling_range_sum_count(starts, ts_us, vals, window)

    seg_first = W.segment_first_index(starts)
    for i in range(len(seg)):
        in_win = (
            (seg == seg[i])
            & (ts_us >= ts_us[i] - window)
            & (ts_us <= ts_us[i])  # peers AFTER row i included (RANGE)
        )
        assert counts[i] == in_win.sum()
        np.testing.assert_allclose(sums[i], vals[in_win].sum(), rtol=1e-12)
        assert lo[i] >= seg_first[i]

    # the overflow fallback (per-segment loop) must agree with the
    # composite-key path: a 2**61 window overflows n_segs * stride
    lo2, hi2 = W.rolling_range_bounds(starts, ts_us, 2**61)
    assert (lo2 == seg_first).all()  # whole segment is always in-window
    s2, c2 = W.rolling_range_sum_count(starts, ts_us, vals, 2**61)
    # hi2 must include all peers; counts equal rows up to last peer
    for i in range(len(seg)):
        in_win = (seg == seg[i]) & (ts_us <= ts_us[i])
        assert c2[i] == in_win.sum()
        np.testing.assert_allclose(s2[i], vals[in_win].sum(), rtol=1e-12)


def test_materialized_derive_matches_fresh(ray_session, tmp_path):
    """transcripts_pipeline over a registered pre-derived table must be
    row-identical to the fused derive path (bench hygiene must never
    change results)."""
    from turboxsl_ray.pipelines import transcript_features as tf

    sf = "/root/testdata/sf0.001"

    def canon(ds):
        df = ds.to_pandas()
        return (
            df[sorted(df.columns)]
            .sort_values(sorted(df.columns), kind="stable")
            .reset_index(drop=True)
        )

    names = ["q_transcripts", "q_lag_lead", "q_sessionize", "q_conv_text"]
    fresh = {n: canon(getattr(tf, n)(sf)) for n in names}
    tf.materialize_derived(sf, str(tmp_path / "derived"))
    try:
        for n in names:
            cached = canon(getattr(tf, n)(sf))
            assert cached.equals(fresh[n]), n
    finally:
        tf.clear_derived_cache()


def test_derived_cache_rejects_straddling_conversation(ray_session, tmp_path):
    """The cache fast path must fail LOUDLY when a conversation
    straddles read-back blocks (Ray treats override_num_blocks as a
    hint, so file alignment alone is not proof) — a straddle would
    silently corrupt every lag/sessionize feature computed from the
    cache."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from turboxsl_ray.pipelines import transcript_features as tf

    bad = tmp_path / "bad_cache"
    bad.mkdir()
    # conv "c1" deliberately split across two files (= two read blocks)
    pq.write_table(
        pa.table({"conv_id": ["c0", "c1"], "turn_idx": [0, 0]}),
        bad / "part-0.parquet",
    )
    pq.write_table(
        pa.table({"conv_id": ["c1", "c2"], "turn_idx": [1, 0]}),
        bad / "part-1.parquet",
    )
    with pytest.raises(ValueError, match="straddle"):
        tf._validate_conv_alignment(str(bad))

    ok = tmp_path / "ok_cache"
    ok.mkdir()
    pq.write_table(
        pa.table({"conv_id": ["c0", "c1", "c1"], "turn_idx": [0, 0, 1]}),
        ok / "part-0.parquet",
    )
    pq.write_table(
        pa.table({"conv_id": ["c2"], "turn_idx": [0]}),
        ok / "part-1.parquet",
    )
    tf._validate_conv_alignment(str(ok))  # disjoint: no raise


def test_cached_read_sees_whole_files_not_reader_chunks(ray_session, tmp_path):
    """The cached fast path must hand block fns WHOLE cache files. A
    fused ReadParquet→MapBatches hands the fn the parquet reader's
    internal ~10k-row yield chunks instead (measured at sf0.1/32 CPUs;
    it crashed BENCH_r04) — the per-file loader must be immune."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from turboxsl_ray.pipelines import transcript_features as tf

    cache = tmp_path / "cache"
    cache.mkdir()
    n = 25_000  # >> the 10k reader chunk that caused the r4 straddles
    pq.write_table(
        pa.table({
            "conv_id": np.repeat([f"c{i}" for i in range(5)], n // 5),
            "turn_idx": np.tile(np.arange(n // 5, dtype=np.int32), 5),
        }),
        cache / "part-0.parquet",
    )
    pq.write_table(
        pa.table({"conv_id": ["z"] * 3, "turn_idx": [0, 1, 2]}),
        cache / "part-1.parquet",
    )

    def block_rows(t: pa.Table) -> pa.Table:
        return pa.table({"rows": [t.num_rows]})

    sizes = sorted(
        r["rows"] for r in tf._read_derived(str(cache), block_rows).take_all()
    )
    assert sizes == [3, n]
    tf._validate_conv_alignment(str(cache))  # and it validates green


def test_materialize_derived_self_heals(ray_session, tmp_path, monkeypatch):
    """A misaligned first write must be REWRITTEN with more partitions
    and re-validated — never raised through to the caller (round 4's
    fail-loud path zeroed out the whole driver bench)."""
    from turboxsl_ray.pipelines import transcript_features as tf

    sf = "/root/testdata/sf0.001"
    real_validate = tf._validate_conv_alignment
    calls = []

    def flaky(cached):
        calls.append(cached)
        if len(calls) == 1:
            raise ValueError("planted misalignment (test)")
        real_validate(cached)

    monkeypatch.setattr(tf, "_validate_conv_alignment", flaky)
    out = str(tmp_path / "derived")
    try:
        res = tf.materialize_derived(sf, out, num_partitions=1)
        assert res == out and len(calls) == 2
        assert tf._DERIVED_DIRS.get(sf) == out
        # the healed cache serves correct features
        cached = tf.q_lag_lead(sf).to_pandas()
        cached = cached.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    finally:
        tf.clear_derived_cache()
    fresh = tf.q_lag_lead(sf).to_pandas()
    fresh = fresh.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert cached.equals(fresh)


def test_materialize_derived_gives_up_without_raising(
    ray_session, tmp_path, monkeypatch
):
    """If no rewrite can align the cache, materialize_derived must skip
    registration and return None — queries keep using the derive path."""
    import warnings

    from turboxsl_ray.pipelines import transcript_features as tf

    monkeypatch.setattr(
        tf, "_validate_conv_alignment",
        lambda cached: (_ for _ in ()).throw(ValueError("always misaligned")),
    )
    sf = "/root/testdata/sf0.001"
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        res = tf.materialize_derived(sf, str(tmp_path / "derived"))
    assert res is None
    assert sf not in tf._DERIVED_DIRS
    assert tf.q_conv_stats(sf).count() > 0  # derive path still serves
