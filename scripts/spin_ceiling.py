"""Pure-compute scaling ceiling for the CURRENT boot.

A multiprocessing pool of spin workers — no shared state, no Ray, no
syscalls in the hot loop — runs a fixed total amount of work at 4, 8,
16 and 32 processes. The N->4N throughput ratios bound what ANY engine
can show on this VM at those widths: hypervisor CPU quota, SMT
sharing, and scheduler placement all land here exactly as they land on
Ray workers, with zero engine machinery in the way. BASELINE.md reads
the flagship scaling pairs against these ceilings (methodology first
used round 1: 8->32 = 0.86; re-measured round 4: 4->16 = 0.95,
8->32 = 0.82 — the ceilings move with host conditions, so they are
only comparable to engine pairs from the SAME boot and window).

Prints ONE JSON line. Run it immediately after `bench.py --scaling`
on an otherwise idle machine.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

# one chunk ~ 0.2 s of pure-python arithmetic on this VM; 256 chunks
# give each width >= 1.6 s of wall even at 32 procs, amortizing pool
# startup without letting the whole measure exceed ~1 min
CHUNKS = 256
CHUNK_ITERS = 2_000_000


def _spin(_: int) -> int:
    x = 0
    for i in range(CHUNK_ITERS):
        x = (x * 1099511628211 + i) & 0xFFFFFFFFFFFFFFFF
    return x & 1


def throughput(width: int) -> float:
    with mp.Pool(width) as pool:
        pool.map(_spin, range(width))  # warm the pool, not billed
        t0 = time.perf_counter()
        pool.map(_spin, range(CHUNKS), chunksize=1)
        dt = time.perf_counter() - t0
    return CHUNKS / dt


def main() -> None:
    thr = {w: throughput(w) for w in (4, 8, 16, 32)}
    out = {
        "metric": "pure-compute spin-worker scaling ceiling (this boot)",
        "value": round((thr[16] / thr[4]) / 4, 3),
        "unit": "efficiency",
        "pairs": {
            "4->16": round((thr[16] / thr[4]) / 4, 3),
            "8->32": round((thr[32] / thr[8]) / 4, 3),
        },
        "chunks_per_sec_by_width": {str(w): round(v, 2) for w, v in thr.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
