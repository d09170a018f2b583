"""Anonymous-page-fault / allocation scaling control for the kgray box.

The spin control (pure CPU) scales ~1.0 from 8 to 32 workers and the
streaming-memcpy control scales 0.86 — but the kgray pipeline is
ALLOCATION-heavy (fresh Arrow buffers, object-store copies, numpy temps),
and in this Firecracker VM a first touch of a fresh anonymous page goes
through the kernel fault path.  This control measures how aggregate
fresh-allocation+first-touch throughput scales 8 -> 32 concurrent
workers: each worker repeatedly mmaps a fresh 64 MiB anonymous region,
touches every page (write), and unmaps.  If THIS ratio sits near the
pipeline's observed 8->32 efficiency (~0.5), the width-resistant cost is
the VM's page-fault path, not the engine.
"""
import json
import multiprocessing as mp
import os
import sys
import time

CHUNK_MB = 64
SECONDS = 12.0


def worker(q):
    import numpy as np
    n = CHUNK_MB * 1024 * 1024
    step = 4096
    end = time.perf_counter() + SECONDS
    touched = 0
    while time.perf_counter() < end:
        buf = np.empty(n, dtype=np.uint8)   # fresh anonymous pages
        buf[::step] = 1                     # first-touch every page
        touched += n
        del buf                             # munmap (>MMAP_THRESHOLD)
    q.put(touched)


def measure(nproc: int) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=worker, args=(q,)) for _ in range(nproc)]
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    totals = [q.get() for _ in procs]
    for p in procs:
        p.join()
    dt = time.perf_counter() - t0
    return sum(totals) / dt / 1e9  # GB/s of fresh pages faulted+touched


if __name__ == "__main__":
    mp.set_start_method("spawn")
    out = {}
    for n in (8, 32, 8, 32):  # ABBA
        key = f"n{n}"
        out.setdefault(key, []).append(round(measure(n), 2))
    best8 = max(out["n8"])
    best32 = max(out["n32"])
    out["scaling_8_to_32"] = round((best32 / best8) / 4.0, 3)
    print(json.dumps(out))
