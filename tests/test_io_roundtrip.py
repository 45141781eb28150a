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


def test_schema_contract_validation(tmp_path):
    """read_parquet(expect=) fails fast on the driver — naming every
    missing/mistyped column — before any cluster read launches."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from turboxsl_ray.sources.io import read_parquet, validate_schema
    from turboxsl_ray.sources.transcripts import TRANSCRIPT_SCHEMA, synth_transcripts

    good = tmp_path / "good.parquet"
    pq.write_table(synth_transcripts(n_convs=3, mean_turns=4, seed=7), str(good))
    ds = read_parquet(str(good), expect=TRANSCRIPT_SCHEMA)
    assert ds.count() > 0

    bad = tmp_path / "bad.parquet"
    pq.write_table(
        pa.table({"conv_id": pa.array([1, 2], pa.int64()),  # wrong type
                  "role": pa.array(["u", "a"])}),            # missing the rest
        str(bad),
    )
    with pytest.raises(ValueError) as ei:
        read_parquet(str(bad), expect=TRANSCRIPT_SCHEMA)
    msg = str(ei.value)
    assert "conv_id" in msg and "turn_idx" in msg and "expected string" in msg

    # extra columns are fine (projection prunes them)
    extra = pa.schema([("conv_id", pa.string())])
    validate_schema(TRANSCRIPT_SCHEMA, extra)


def test_hive_partitioned_write_and_pruned_readback(ray_session, tmp_path):
    """Recommended multi-tenant output layout: hive-partitioned write
    (one directory per key value) + partition-pruned read-back — the
    resumable-output rule applied to a categorical key."""
    import os

    import pyarrow as pa
    import ray.data

    tbl = pa.table(
        {
            "lang": pa.array(["en", "es", "en", "zh", "es", "en"]),
            "doc_id": pa.array(range(6), pa.int64()),
            "score": pa.array([0.1, 0.2, 0.3, 0.4, 0.5, 0.6]),
        }
    )
    out = str(tmp_path / "by_lang")
    ray.data.from_arrow(tbl).repartition(2).write_parquet(
        out, partition_cols=["lang"]
    )
    dirs = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert dirs == ["lang=en", "lang=es", "lang=zh"]

    # pruned read: only the lang=es directory's files are scanned
    es = ray.data.read_parquet(os.path.join(out, "lang=es"))
    got = sorted(r["doc_id"] for r in es.take_all())
    assert got == [1, 4]

    # full read restores the partition column from the path
    full = ray.data.read_parquet(out)
    assert full.count() == 6
    assert sorted(set(r["lang"] for r in full.take_all())) == ["en", "es", "zh"]
