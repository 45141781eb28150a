"""End-to-end drive of turboxsl_ray's distributed path vs pandas oracles."""
import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")

from turboxsl_ray import ensure_hash_shuffle  # noqa: E402

ensure_hash_shuffle()

from turboxsl_ray.sources.transcripts import synth_asof_side, synth_transcripts  # noqa: E402
from turboxsl_ray.stages.asof_join import asof_join_datasets  # noqa: E402
from turboxsl_ray.stages.partitioning import map_partitions, partition_by_conv  # noqa: E402
from turboxsl_ray.stages.window_stage import WindowSpec, make_window_fn  # noqa: E402

left_tbl = synth_transcripts(n_convs=60, mean_turns=12, seed=11)
right_tbl = synth_asof_side(left_tbl, seed=12)

left = ray.data.from_arrow(left_tbl)
right = ray.data.from_arrow(right_tbl)

joined = asof_join_datasets(left, right, num_partitions=8)
spec = WindowSpec(
    lags=(("value", 1), ("value", 2)),
    leads=(("value", 1),),
    session_gap_us=15 * 60 * 1_000_000,
    ffill_cols=("tool",),
    rolling=(("value", 5, "mean"),),
)
feat = map_partitions(partition_by_conv(joined, 8), make_window_fn(spec))
got = feat.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

# ---- pandas oracle
l = left_tbl.to_pandas().sort_values(["ts", "turn_idx"]).reset_index(drop=True)
r = right_tbl.to_pandas().sort_values(["ts"], kind="stable").reset_index(drop=True)
oracle = pd.merge_asof(l.sort_values("ts", kind="stable"), r, by="conv_id", on="ts",
                       direction="backward")
oracle = oracle.sort_values(["conv_id", "ts", "turn_idx"], kind="stable").reset_index(drop=True)
g = oracle.groupby("conv_id", sort=False)
oracle["lag_value_1"] = g["value"].shift(1)
oracle["lag_value_2"] = g["value"].shift(2)
oracle["lead_value_1"] = g["value"].shift(-1)
oracle["tool_ffill"] = g["tool"].ffill()
oracle["roll_mean_5_value"] = g["value"].rolling(5, min_periods=1).mean().reset_index(level=0, drop=True)
gap = g["ts"].diff().dt.total_seconds() * 1e6
oracle["session_idx"] = (
    ((gap > 15 * 60 * 1e6) | gap.isna()).groupby(oracle["conv_id"]).cumsum() - 1
).astype(np.int64)

got2 = got.sort_values(["conv_id", "ts", "turn_idx"], kind="stable").reset_index(drop=True)
assert len(got2) == len(oracle), (len(got2), len(oracle))
for col in ["feature_a", "feature_b", "lag_value_1", "lag_value_2", "lead_value_1",
            "roll_mean_5_value"]:
    np.testing.assert_allclose(
        got2[col].to_numpy(np.float64), oracle[col].to_numpy(np.float64),
        equal_nan=True, err_msg=col)
assert (got2["session_idx"].to_numpy() == oracle["session_idx"].to_numpy()).all()
tf_a = got2["tool_ffill"].fillna("∅")
tf_b = oracle["tool_ffill"].fillna("∅")
assert (tf_a == tf_b).all()
# text byte-equality under stable (conv_id, turn_idx) ordering
a = got.sort_values(["conv_id", "turn_idx"])["text"].tolist()
b = l.sort_values(["conv_id", "turn_idx"])["text"].tolist()
assert a == b, "text mismatch"
print("ALLCLOSE OK")
ray.shutdown()
