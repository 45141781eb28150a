"""The bench contract: ``bench.py`` must ALWAYS print one parseable
JSON line and exit 0 — a fail-loud addition anywhere in the query loop
(round 4: the derived-cache validator) must degrade a timing, never
zero out a round's numbers. Runs the real script in a fresh process,
exactly as the external driver does."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_smoke_prints_json_and_exits_zero():
    env = dict(os.environ, RAY_GRAFT_CPUS="8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--smoke"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = proc.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["headline"]["throughput_turns_per_s"] > 0
    # the exact family whose shared-cache setup crashed BENCH_r04
    for q in ("transcripts", "lag_lead", "sessionize", "conv_text",
              "streaming_window"):
        assert q in out["queries"], q
