"""CSV / JSON-lines source-sink round trips (sources/io.py)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture()
def small_tbl():
    return pa.table(
        {
            "a": pa.array([1, 2, 3], pa.int64()),
            "b": pa.array(["x", "y", "z"]),
            "c": pa.array([1.5, 2.5, 3.5]),
        }
    )


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("a").reset_index(drop=True)[["a", "b", "c"]]


def test_csv_roundtrip(ray_session, small_tbl, tmp_path):
    import ray.data

    from turboxsl_ray.sources import io

    d = str(tmp_path / "csv_out")
    io.write_csv(ray.data.from_arrow(small_tbl), d)
    back = io.read_csv(d).to_pandas()
    pd.testing.assert_frame_equal(_canon(back), _canon(small_tbl.to_pandas()))


def test_json_roundtrip(ray_session, small_tbl, tmp_path):
    import ray.data

    from turboxsl_ray.sources import io

    d = str(tmp_path / "json_out")
    io.write_json(ray.data.from_arrow(small_tbl), d)
    back = io.read_json(d).to_pandas()
    pd.testing.assert_frame_equal(_canon(back), _canon(small_tbl.to_pandas()))


def test_parquet_roundtrip_through_pipeline(ray_session, small_tbl, tmp_path):
    import pyarrow.compute as pc

    import ray.data

    from turboxsl_ray.sources import io
    from turboxsl_ray.stages.partitioning import map_partitions

    d = str(tmp_path / "pq_out")
    ds = ray.data.from_arrow(small_tbl)
    ds = map_partitions(ds, lambda t: t.append_column("d", pc.multiply(t["c"], 2.0)))
    io.write_parquet(ds, d)
    back = io.read_parquet(d).to_pandas()
    assert (back.sort_values("a")["d"].to_numpy() == [3.0, 5.0, 7.0]).all()
