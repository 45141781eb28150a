"""End-user facade: the analog of the reference's 4-call C API
(XSLTInit → XSLTNewProcessor → XSLTProcess → XMLOutputFile,
/root/reference/turboxsl.h:13-53) and its CLI
(xsltproc/turboxsltproc.c:6-50).

Build phase (driver-side, once — the XSLTNewProcessor analog): an
:class:`EngineConfig` is compiled into the flagship plan (feature
spec, salting thresholds, partitioning). Run phase (the XSLTProcess
analog): ``Engine.run(left, right, out_dir)`` executes the fused
as-of + window + sessionize pass with lineage/resume.

Never calls ``ray.init`` — the caller owns the session
(__ray_entry__ contract). The CLI (``python -m turboxsl_ray``) and
``scripts/submit_job.py`` own sessions for standalone use.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ray.data import Dataset

import ray.data

from turboxsl_ray.context import tune_context
from turboxsl_ray.pipelines.flagship import FlagshipConfig, run_flagship


@dataclass(frozen=True)
class EngineConfig:
    """User-facing knobs; compiled to a FlagshipConfig."""

    num_partitions: int = 64
    session_gap_minutes: int = 15
    lags: tuple = (("value", 1), ("value", 2), ("role", 1))
    leads: tuple = (("value", 1),)
    rolling: tuple = (("value", 10, "mean"),)
    ffill_cols: tuple = ("tool",)
    salt_threshold_rows: int = 100_000

    def compile(self) -> FlagshipConfig:
        return FlagshipConfig(
            num_partitions=self.num_partitions,
            session_gap_us=self.session_gap_minutes * 60 * 1_000_000,
            lags=self.lags,
            leads=self.leads,
            rolling=self.rolling,
            ffill_cols=self.ffill_cols,
            salt_threshold_rows=self.salt_threshold_rows,
        )


class Engine:
    def __init__(self, config: EngineConfig | None = None):
        self.config = config or EngineConfig()
        self._compiled = self.config.compile()
        tune_context()

    def run(
        self,
        transcripts: "Dataset | str",
        features: "Dataset | str | None",
        out_dir: str,
        *,
        resume: bool = True,
        input_id: str = "",
    ) -> dict:
        """Run the point-in-time feature pass. ``transcripts`` /
        ``features`` may be Datasets or parquet paths. Returns run
        metrics incl. the lineage manifest; output is partitioned
        parquet under ``out_dir`` (resumable)."""
        # re-apply context knobs now that Ray is certainly initialized
        # (construction may have happened before the session existed)
        tune_context()
        left = (
            ray.data.read_parquet(transcripts)
            if isinstance(transcripts, str)
            else transcripts
        )
        right = (
            ray.data.read_parquet(features) if isinstance(features, str) else features
        )
        return run_flagship(
            left, right, out_dir, self._compiled, resume=resume, input_id=input_id
        )

    def read_output(self, out_dir: str) -> Dataset:
        return ray.data.read_parquet(out_dir, file_extensions=["parquet"])
