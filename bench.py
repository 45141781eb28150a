"""Benchmark driver.

Headline: the flagship fused as-of-join + window-feature pass
(pipelines/flagship.py) over a deterministic Zipf-skewed synthetic
transcript table (BASELINE.json input_hint shape; ~2M turns incl. one
mega-conversation), reported as turns/sec. Plus per-query wall times
for every registry pipeline over $GRAFT_SF_DIR (default
/root/testdata/sf0.1).

Prints ONE JSON line:
    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

--scaling: runs the headline twice in FRESH processes at
RAY_GRAFT_CPUS=8 and =32 over the same input and reports both
throughputs + scaling efficiency (the sandbox stand-in for the
N-vs-4N-node cluster criterion).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

SYNTH_CONVS = 15_000
SYNTH_MEAN_TURNS = 12
SYNTH_MEGA_FRAC = 0.05
SYNTH_MAX_TURNS = 600
SYNTH_SEED = 42


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from turboxsl_ray.context import tune_context

    tune_context()


def synth_input_path() -> tuple[str, str]:
    """Deterministic synthetic transcript + as-of side parquet, cached in
    /tmp (generation excluded from timings)."""
    import pyarrow.parquet as pq

    tag = f"{SYNTH_CONVS}_{SYNTH_MEAN_TURNS}_{SYNTH_MAX_TURNS}_{SYNTH_MEGA_FRAC}_{SYNTH_SEED}"
    left_p = f"/tmp/turboxsl_bench_left_{tag}.parquet"
    right_p = f"/tmp/turboxsl_bench_right_{tag}.parquet"
    if not (os.path.exists(left_p) and os.path.exists(right_p)):
        from turboxsl_ray.sources.transcripts import synth_asof_side, synth_transcripts

        left = synth_transcripts(
            n_convs=SYNTH_CONVS,
            mean_turns=SYNTH_MEAN_TURNS,
            seed=SYNTH_SEED,
            max_turns=SYNTH_MAX_TURNS,
            mega_frac=SYNTH_MEGA_FRAC,
        )
        right = synth_asof_side(left, rows_per_conv=3)
        pq.write_table(left, left_p + ".tmp")
        os.replace(left_p + ".tmp", left_p)
        pq.write_table(right, right_p + ".tmp")
        os.replace(right_p + ".tmp", right_p)
    return left_p, right_p


def run_headline(num_cpus: int) -> dict:
    import ray.data

    from turboxsl_ray.pipelines.flagship import FlagshipConfig, run_flagship

    left_p, right_p = synth_input_path()
    _init_ray(num_cpus)
    left = ray.data.read_parquet(left_p)
    right = ray.data.read_parquet(right_p)
    n_rows = left.count()
    out_dir = tempfile.mkdtemp(prefix="turboxsl_bench_")
    cfg = FlagshipConfig(
        num_partitions=max(num_cpus * 2, 16),
        salt_threshold_rows=50_000,
    )
    t0 = time.time()
    metrics = run_flagship(left, right, out_dir, cfg, input_id="bench", resume=False)
    dt = time.time() - t0
    return {
        "headline_sec": round(dt, 3),
        "rows": n_rows,
        "rows_written": metrics["rows_written"],
        "throughput_turns_per_s": round(n_rows / dt, 1),
        "salted_convs": metrics["salted_convs"],
    }


def run_queries(sf_dir: str) -> dict[str, float]:
    from turboxsl_ray import registry

    import ray.data
    import pandas as pd

    out: dict[str, float] = {}
    for name, fn in registry.queries().items():
        t0 = time.time()
        res = fn(sf_dir)
        if isinstance(res, ray.data.Dataset):
            # consume the stream without materializing on the driver
            for _ in res.iter_batches(batch_size=8192, batch_format="pyarrow"):
                pass
        out[name] = round(time.time() - t0, 3)
    return out


def scaling_report() -> dict:
    """Same headline job at 8 and 32 CPUs, fresh process each."""
    synth_input_path()  # warm the cache so neither run pays generation
    results = {}
    for n in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only"],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = proc.stdout.strip().splitlines()[-1]
        results[n] = json.loads(line)
    t8 = results[8]["headline"]["throughput_turns_per_s"]
    t32 = results[32]["headline"]["throughput_turns_per_s"]
    # efficiency of scaling 8 -> 32 cpus (ratio of speedup to cpu ratio)
    eff = (t32 / t8) / (32 / 8)
    return {
        "metric": "scaling efficiency 8->32 cpus, flagship as-of+window over synthetic Zipf transcripts",
        "value": round(eff, 3),
        "unit": "efficiency",
        "throughput_8cpu": t8,
        "throughput_32cpu": t32,
        "rows": results[32]["headline"]["rows"],
        "speedup": round(t32 / t8, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--headline-only", action="store_true")
    ap.add_argument("--skip-queries", action="store_true")
    args = ap.parse_args()

    if args.scaling:
        print(json.dumps(scaling_report()))
        return

    import ray

    headline = run_headline(NUM_CPUS)
    queries = {} if (args.headline_only or args.skip_queries) else run_queries(SF_DIR)
    out = {
        "metric": "flagship as-of-join + window-feature throughput (turns/sec) over synthetic Zipf transcripts",
        "value": headline["headline_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "headline": headline,
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
