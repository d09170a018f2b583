"""A/B the jemalloc decay lever (KGRAY_JEMALLOC_DECAY_MS) on the scaling leg.

The round-5 campaign's fault-path control showed fresh-anonymous-page
allocation scales 0.364-0.432 from 8->32 workers on this VM while
warm-memory streaming scales 0.86 (BASELINE.md).  Arrow's jemalloc pool
purges dirty pages after ~1 s, so each map_batches batch build re-faults
its buffers.  This script measures whether retaining dirty pages
(decay_ms=10000 inside every Ray worker) moves the t32 leg, ABBA order so
host drift cancels: base, decay, decay, base.

Usage: python scripts/jemalloc_ab.py [pages] [cpus] [decay_ms] [out.jsonl]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def leg(num_cpus: int, pages: int, decay_ms: int | None) -> dict:
    if decay_ms is None:
        os.environ.pop("KGRAY_JEMALLOC_DECAY_MS", None)
    else:
        os.environ["KGRAY_JEMALLOC_DECAY_MS"] = str(decay_ms)
    spin_pre = bench._spin_throughput(num_cpus)
    membw = bench._membw_gbps()
    run = bench._single_run(num_cpus, pages, 8)
    spin_post = bench._spin_throughput(num_cpus)
    return {
        "decay_ms": decay_ms,
        "num_cpus": num_cpus,
        "docs": run["docs"],
        "sec": run["sec"],
        "rows_per_sec": round(run["rows"] / run["sec"], 1),
        "spin_pre": round(spin_pre / 1e6, 2),
        "spin_post": round(spin_post / 1e6, 2),
        "membw_gbps": membw,
    }


def main() -> None:
    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    decay = int(sys.argv[3]) if len(sys.argv) > 3 else 10000
    out = sys.argv[4] if len(sys.argv) > 4 else "/tmp/jemalloc_ab.jsonl"
    for arm in (None, decay, decay, None):  # ABBA
        t0 = time.time()
        rec = leg(cpus, pages, arm)
        rec["leg_wall_sec"] = round(time.time() - t0, 1)
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
