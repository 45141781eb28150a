"""As-of kernels vs pandas.merge_asof oracle (FIXTURES.md F2)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from turboxsl_ray.kernels.asof import asof_backward_indices
from turboxsl_ray.stages.asof_join import asof_join_tables
from turboxsl_ray.sources.transcripts import synth_asof_side, synth_transcripts


@pytest.fixture(scope="module")
def tables():
    left = synth_transcripts(n_convs=50, mean_turns=15, seed=11)
    right = synth_asof_side(left, seed=12, rows_per_conv=8)
    return left, right


def _pandas_oracle(left: pa.Table, right: pa.Table) -> pd.DataFrame:
    ldf = left.to_pandas().sort_values("ts", kind="stable").reset_index(drop=True)
    rdf = right.to_pandas().sort_values("ts", kind="stable").reset_index(drop=True)
    return pd.merge_asof(ldf, rdf, by="conv_id", on="ts", direction="backward")


def test_kernel_matches_merge_asof(tables):
    left, right = tables
    ldf = left.to_pandas().sort_values(["conv_id", "ts"], kind="stable")
    rdf = right.to_pandas().sort_values(["conv_id", "ts"], kind="stable")
    keys = pd.concat([ldf["conv_id"], rdf["conv_id"]]).astype("category").cat.codes
    lk = keys[: len(ldf)].to_numpy(np.int64)
    rk = keys[len(ldf):].to_numpy(np.int64)
    # codes follow category (sorted) order so (code, ts) is still sorted
    lts = ldf["ts"].astype("int64").to_numpy()
    rts = rdf["ts"].astype("int64").to_numpy()
    idx = asof_backward_indices(lk, lts, rk, rts)

    got = ldf[["conv_id", "turn_idx"]].copy()
    got["feature_a"] = np.where(
        idx >= 0, rdf["feature_a"].to_numpy()[np.maximum(idx, 0)], np.nan
    )
    want = _pandas_oracle(left, right)
    key = ["conv_id", "turn_idx"]
    got = got.sort_values(key, kind="stable").reset_index(drop=True)
    want = want.sort_values(key, kind="stable").reset_index(drop=True)
    np.testing.assert_allclose(
        got["feature_a"].to_numpy(), want["feature_a"].to_numpy(), equal_nan=True
    )


def test_asof_join_tables_matches_merge_asof(tables):
    left, right = tables
    out = asof_join_tables(left, right).to_pandas()
    want = _pandas_oracle(left, right)
    key = ["conv_id", "turn_idx"]
    out = out.sort_values(key, kind="stable").reset_index(drop=True)
    want = want.sort_values(key, kind="stable").reset_index(drop=True)
    np.testing.assert_allclose(
        out["feature_a"].to_numpy(), want["feature_a"].to_numpy(), equal_nan=True
    )
    np.testing.assert_allclose(
        out["feature_b"].astype("float").to_numpy(),
        want["feature_b"].astype("float").to_numpy(),
        equal_nan=True,
    )
    # text byte-equality through the join (input_hint invariant)
    assert out["text"].tolist() == want["text"].tolist()


def test_tolerance(tables):
    left, right = tables
    tol = 3_600_000_000  # 1h
    out = asof_join_tables(left, right, tolerance_us=tol).to_pandas()
    want = pd.merge_asof(
        left.to_pandas().sort_values("ts", kind="stable").reset_index(drop=True),
        right.to_pandas().sort_values("ts", kind="stable").reset_index(drop=True),
        by="conv_id",
        on="ts",
        direction="backward",
        tolerance=pd.Timedelta(microseconds=tol),
    )
    key = ["conv_id", "turn_idx"]
    out = out.sort_values(key, kind="stable").reset_index(drop=True)
    want = want.sort_values(key, kind="stable").reset_index(drop=True)
    np.testing.assert_allclose(
        out["feature_a"].to_numpy(), want["feature_a"].to_numpy(), equal_nan=True
    )


def test_duplicate_right_ts_last_wins():
    left = pa.table(
        {
            "conv_id": ["a", "a"],
            "turn_idx": pa.array([0, 1], type=pa.int32()),
            "ts": pa.array([100, 200], type=pa.int64()).cast(pa.timestamp("us")),
        }
    )
    right = pa.table(
        {
            "conv_id": ["a", "a", "a"],
            "ts": pa.array([100, 100, 150], type=pa.int64()).cast(pa.timestamp("us")),
            "feature_a": [1.0, 2.0, 3.0],
        }
    )
    out = asof_join_tables(left, right).to_pandas().sort_values("turn_idx")
    # backward-inclusive: ts=100 sees the LAST right row at ts=100 (2.0)
    assert out["feature_a"].tolist() == [2.0, 3.0]


def test_absent_key_yields_null():
    left = pa.table(
        {
            "conv_id": ["zz"],
            "turn_idx": pa.array([0], type=pa.int32()),
            "ts": pa.array([100], type=pa.int64()).cast(pa.timestamp("us")),
        }
    )
    right = pa.table(
        {
            "conv_id": ["a"],
            "ts": pa.array([50], type=pa.int64()).cast(pa.timestamp("us")),
            "feature_a": [1.0],
        }
    )
    out = asof_join_tables(left, right).to_pandas()
    assert out["feature_a"].isna().all()
