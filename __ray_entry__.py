"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` / ``ray.shutdown`` here or anywhere these callables reach.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable
from typing import Any

from turboxsl_ray import registry
from turboxsl_ray.context import tune_context

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on sf0.001: derive transcripts from events,
    run the fused as-of + window + sessionize + salting pass, return
    the feature table (reads back the partitioned parquet output)."""
    import pyarrow as pa

    import ray
    import ray.data

    from turboxsl_ray.pipelines.flagship import FlagshipConfig, run_flagship
    from turboxsl_ray.pipelines.transcript_features import transcripts_pipeline
    from turboxsl_ray.sources.transcripts import synth_asof_side

    tune_context()
    left = transcripts_pipeline(SMOKE_SF_DIR)
    # deterministic small right side derived from the (tiny) left table
    left_tbl = pa.concat_tables(
        [ray.get(r) for r in left.to_arrow_refs()], promote_options="permissive"
    )
    right = ray.data.from_arrow(synth_asof_side(left_tbl))
    left = ray.data.from_arrow(left_tbl)
    out_dir = tempfile.mkdtemp(prefix="turboxsl_ray_entry_")
    cfg = FlagshipConfig(num_partitions=8, salt_threshold_rows=500)
    run_flagship(left, right, out_dir, cfg, input_id="sf0.001", resume=False)
    return ray.data.read_parquet(out_dir, file_extensions=["parquet"])


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline (SURVEY.md §2)."""
    tune_context()
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return registry.oracle_sql()
