"""Registry queries vs DuckDB oracles at sf0.001 — the in-repo version
of the driver's correctness gate (same canonicalization: columns
sorted by name, rows sorted by all columns, dtype-normalized)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def oracle_checked_names():
    from turboxsl_ray import registry

    return sorted(registry.oracle_sql())


@pytest.mark.parametrize("name", oracle_checked_names())
def test_query_matches_oracle(ray_session, duck, name):
    from turboxsl_ray import registry

    fn = registry.queries()[name]
    ours = canon(to_pandas(fn(SF_DIR)))
    theirs = canon(duck.execute(registry.oracle_sql()[name]).df())
    assert list(ours.columns) == list(theirs.columns)
    assert len(ours) == len(theirs)
    for c in ours.columns:
        a, b = ours[c], theirs[c]
        if a.dtype.kind == "f":
            np.testing.assert_allclose(
                a.to_numpy(), b.to_numpy(), rtol=0, atol=0, equal_nan=True,
                err_msg=f"{name}.{c}")
        else:
            same = (a.astype(str) == b.astype(str)) | (a.isna() & b.isna())
            assert same.all(), f"{name}.{c}: first diff at row {int(np.flatnonzero(~same)[0])}"


def test_rows_only_queries_run(ray_session):
    """Non-SQL-expressible queries: run + schema/determinism checks."""
    from turboxsl_ray import registry

    qs = registry.queries()
    sqls = registry.oracle_sql()
    rows_only = [n for n in qs if n not in sqls]
    assert set(rows_only) == {
        "ann_lsh_buckets", "ann_ivf", "image_stats",
        "approx_quantiles", "heavy_hitters", "audio_stats",
    }
    for name in rows_only:
        df = to_pandas(qs[name](SF_DIR))
        assert df is not None
        df2 = to_pandas(qs[name](SF_DIR))
        pd.testing.assert_frame_equal(
            canon(df), canon(df2), check_dtype=False
        ), f"{name} not deterministic"


def test_entry_contract(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    n = res.count()
    assert n > 0
    cols = set(res.schema().names)
    assert {"conv_id", "turn_idx", "text", "session_idx", "gap_us"} <= cols
    assert set(e.oracle_sql()) <= set(e.queries())


def test_sample_dataset_seeded_fraction(ray_session):
    from turboxsl_ray.pipelines.relational import read_table, sample_dataset

    ds = read_table(SF_DIR, "events", columns=["event_id"])
    total = ds.count()
    n = sample_dataset(ds, 0.3, seed=7).count()
    # seeded Bernoulli sample: well within loose binomial bounds
    assert 0.15 * total < n < 0.45 * total


def test_sample_hash_fast_variant_parity(ray_session):
    """The vectorized 100 TB sampling path (hash_sample_mask) must hold
    the same contract the md5 default is oracle-checked for: the keep
    set is a pure function of event_id — identical across block splits
    — and the rate lands at ~2/16."""
    import numpy as np

    from turboxsl_ray.kernels.hashing import hash_sample_mask
    from turboxsl_ray.pipelines.relational import q_sample_hash, read_table

    total = read_table(SF_DIR, "events", columns=["event_id"]).count()
    fast = to_pandas(q_sample_hash(SF_DIR, method="fast"))
    # block-split independence: recompute the mask over the ids in one
    # numpy pass and in many small slices — identical keep set
    ids = to_pandas(read_table(SF_DIR, "events", columns=["event_id"]))[
        "event_id"
    ].to_numpy()
    whole = set(ids[hash_sample_mask(ids, 2, 16)])
    sliced: set = set()
    for lo in range(0, len(ids), 997):
        s = ids[lo : lo + 997]
        sliced.update(s[hash_sample_mask(s, 2, 16)])
    assert whole == sliced == set(fast["event_id"])
    # rate ~ 2/16 with loose binomial bounds
    assert 0.06 * total < len(fast) < 0.20 * total
    # and rerunning the distributed pipeline reproduces it exactly
    again = to_pandas(q_sample_hash(SF_DIR, method="fast"))
    assert set(again["event_id"]) == whole


def test_funnel_strict_ordering(ray_session, tmp_path):
    """Stage k+1 must be STRICTLY after stage k: a click before the
    first view doesn't count, a purchase between view and click doesn't
    count, and users without a view are outside the funnel."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from turboxsl_ray.pipelines.relational import q_funnel

    us = 1_000_000
    rows = [
        # u1: click@1 BEFORE view@2, click@3, purchase@4 -> full funnel via 3,4
        (1, 1, "click"), (1, 2, "view"), (1, 3, "click"), (1, 4, "purchase"),
        # u2: purchase@2 between view@1 and click@3 -> stage 2 only
        (2, 1, "view"), (2, 3, "click"), (2, 2, "purchase"),
        # u3: no view at all -> absent
        (3, 1, "click"), (3, 2, "purchase"),
        # u4: view only -> stage 1
        (4, 9, "view"),
        # u5: simultaneous view/click (equal ts) -> click NOT strictly after
        (5, 7, "view"), (5, 7, "click"),
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * us for r in rows], pa.int64()).cast(pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = q_funnel(str(tmp_path)).to_pandas().sort_values("user_id").reset_index(drop=True)
    assert got["user_id"].tolist() == [1, 2, 4, 5]
    assert got["stage"].tolist() == [3, 2, 1, 1]
    assert got.loc[0, "click_ts"] == pd.Timestamp("1970-01-01 00:00:03")
    assert pd.isna(got.loc[2, "click_ts"]) and pd.isna(got.loc[3, "click_ts"])
