"""Degenerate-input sweep: every registry query must run (not crash)
over a dataset where every table has ZERO rows — the shape a resumed
run, an aggressive filter, or an empty partition hands every operator
at 100 TB all the time."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("sf_empty")
    for name in TABLES:
        t = pq.read_table(os.path.join(src, f"{name}.parquet")).slice(0, 0)
        pq.write_table(t, str(d / f"{name}.parquet"))
    return str(d)


def test_all_queries_tolerate_empty_tables(ray_session, empty_sf):
    import ray.data

    from turboxsl_ray import registry

    failures = {}
    for name, fn in registry.queries().items():
        try:
            res = fn(empty_sf)
            n = res.count() if isinstance(res, ray.data.Dataset) else len(res)
            # sketches legitimately emit a few summary rows (one per
            # sketch / per requested quantile) even on empty input
            assert n <= 4, f"{name} emitted {n} rows from empty input"
        except Exception as e:  # noqa: BLE001 - collecting a report
            failures[name] = f"{type(e).__name__}: {e}"
    assert not failures, failures
