"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "num_cpus": N, ...}

``--scaling`` runs the flagship KG pipeline twice in FRESH processes at two
parallelism levels (num_cpus and 4x fewer) on the same input and reports
both throughputs + scaling efficiency (the sandbox stand-in for the
north-rule N vs 4N cluster-size criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# headline set: flagship KG pipeline + one representative per operator family
HEADLINE = [
    "kg_triples",
    "groupby_sum",
    "hash_join_agg",
    "topk_orders",
    "salted_groupby",
    "sessionize",
    "dedup_normalized",
    "minhash_lsh",
    "knn_brute",
]


def _consume(res) -> int:
    """Drive a lazy result to completion; returns the row count.

    Uses ``materialize()`` + metadata count — iterating batches on the
    driver serializes the consume path, and ``count()`` on a lazy multi-map
    pipeline measurably adds a serial consumption phase (~37 s at 160k
    pages); materialize executes the streaming DAG at full width."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.materialize().count()
    if isinstance(res, (pa.Table, pd.DataFrame)):
        return len(res)
    return 0


def run_queries(names: list[str], sf_dir: str) -> tuple[dict, dict]:
    import __ray_entry__ as e

    qs = e.queries()
    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in names:
        t0 = time.perf_counter()
        rows[name] = _consume(qs[name](sf_dir))
        times[name] = round(time.perf_counter() - t0, 3)
    return times, rows


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # Default 128 MiB block targets cap mid-pipeline parallelism below the
    # core count on benchmark-scale inputs (measured: 19-task reduces on 32
    # cpus).  32 MiB keeps every stage at least cluster-wide here; at real
    # cluster scale the data volume makes this moot.
    ctx.target_max_block_size = 32 * 1024 * 1024


# in-bench scaling corpus: heavy enough that per-page compute dominates
# fixed session windows, light enough to keep the round bench bounded
BENCH_SCALING_PAGES = int(os.environ.get("KGRAY_BENCH_SCALING_PAGES", "20000"))
BENCH_SCALING_RICHNESS = int(os.environ.get("KGRAY_BENCH_SCALING_RICHNESS", "8"))


def _single_run(num_cpus: int, pages: int | None = None,
                richness: int | None = None) -> dict:
    """One fresh-process flagship run over the scaling corpus."""
    env = dict(os.environ)
    if pages is not None:
        env["KGRAY_SCALING_PAGES"] = str(pages)
    if richness is not None:
        env["KGRAY_SCALING_RICHNESS"] = str(richness)
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--single", str(num_cpus)],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"--single {num_cpus} produced no result (rc={out.returncode}); "
            f"stderr tail: {out.stderr.strip()[-500:]!r}")
    return json.loads(lines[-1])


def _scaling_sample() -> dict:
    """Single-sample two-level scaling with an interleaved pure-CPU control
    (the north-rule N-vs-4N criterion tracked per round; BASELINE.md holds
    the best-of-N methodology and numbers).  Host capacity on this shared
    box swings ~2x between runs, so the raw number only means something
    next to the spin ceiling measured at the same moments."""
    lo, hi = max(1, NUM_CPUS // 4), NUM_CPUS
    spin = {n: [] for n in (lo, hi)}
    spin[lo].append(_spin_throughput(lo))
    r_lo = _single_run(lo, BENCH_SCALING_PAGES, BENCH_SCALING_RICHNESS)
    spin[hi].append(_spin_throughput(hi))
    r_hi = _single_run(hi, BENCH_SCALING_PAGES, BENCH_SCALING_RICHNESS)
    spin[lo].append(_spin_throughput(lo))
    spin[hi].append(_spin_throughput(hi))
    thr = {n: r["rows"] / r["sec"] for n, r in ((lo, r_lo), (hi, r_hi))}
    eff = (thr[hi] / thr[lo]) / (hi / lo)
    spin_avg = {n: sum(v) / len(v) for n, v in spin.items()}
    spin_eff = (spin_avg[hi] / spin_avg[lo]) / (hi / lo)
    return {
        "docs": r_hi["docs"],
        "sec": {str(lo): r_lo["sec"], str(hi): r_hi["sec"]},
        "throughput_rows_per_sec": {str(n): round(thr[n], 1) for n in thr},
        "efficiency": round(eff, 3),
        "cpu_spin_ceiling_efficiency": round(spin_eff, 3),
        "normalized_efficiency": round(min(1.0, eff / spin_eff), 3) if spin_eff else None,
        "note": "single sample; see BASELINE.md for best-of-N methodology",
    }


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    _init_ray(NUM_CPUS)
    t0 = time.perf_counter()
    times, rows = run_queries(HEADLINE, SF_DIR)
    total = round(time.perf_counter() - t0, 3)
    kg_rows = rows.get("kg_triples", 0)
    kg_sec = times.get("kg_triples", 0.0) or 1e-9
    result = {
        "metric": "headline pipelines wall-clock (kg construction + operator suite)",
        "value": total,
        "unit": "sec",
        "queries": times,
        "rows": rows,
        "kg_triples_per_sec": round(kg_rows / kg_sec, 1),
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }
    import ray

    ray.shutdown()  # the scaling subprocesses own their own sessions
    if os.environ.get("KGRAY_BENCH_SCALING", "1") != "0":
        # crash-safety: emit the headline record FIRST so a harness timeout
        # during the multi-minute scaling sample still leaves a parseable
        # result line; on normal completion the LAST line is the full
        # record including the scaling block
        print(json.dumps(result), flush=True)
        result["scaling"] = _scaling_sample()
    print(json.dumps(result))


SCALING_PAGES = int(os.environ.get("KGRAY_SCALING_PAGES", "40000"))
# realistic Common-Crawl page weight (~26 KB html vs the 3 KB unit fixture):
# per-page compute must dominate fixed session windows for the efficiency
# number to measure scaling rather than overhead
SCALING_RICHNESS = int(os.environ.get("KGRAY_SCALING_RICHNESS", "16"))


def _scaling_corpus() -> list[str]:
    """Dedicated larger corpus for the scaling criterion: at sf0.1 size the
    run is dominated by fixed windows (read-task scheduling, shuffle
    barriers) that measure overhead, not scaling.  Generated once by Ray
    tasks, cached in /tmp; generation is excluded from timing (shared input
    for both levels)."""
    from kgray.fixtures import FIXTURE_VERSION, write_pages_corpus

    out = os.path.join(
        "/tmp/kgray_corpus",
        f"scaling-{SCALING_PAGES}-r{SCALING_RICHNESS}-{FIXTURE_VERSION}")
    return write_pages_corpus(out, SCALING_PAGES,
                              shard_rows=SCALING_PAGES // 64,
                              richness=SCALING_RICHNESS)


def _single(num_cpus: int) -> None:
    """One fresh-process flagship run (invoked by --scaling)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    _init_ray(num_cpus)
    paths = _scaling_corpus()  # cached after first call; excluded from timing
    from kgray.pipelines.kg import kg_triples, read_pages

    t0 = time.perf_counter()
    ds = kg_triples(read_pages(paths))
    n = _consume(ds)
    sec = time.perf_counter() - t0
    print(json.dumps({"num_cpus": num_cpus, "sec": round(sec, 3), "rows": n,
                      "docs": SCALING_PAGES}))
    import ray

    ray.shutdown()


def _spin_throughput(nprocs: int, seconds: float = 2.0) -> float:
    """Pure-CPU control: total spin iterations/s across nprocs processes.
    Measures the BOX's parallel ceiling at this moment — on this shared
    sandbox even perfectly-parallel work tops out below 1.0 efficiency and
    total capacity swings ~2x between runs, so the control contextualizes
    the pipeline number."""
    import multiprocessing as mp

    def spin(q):
        import time as _t

        t0 = _t.perf_counter()
        x = 0
        while _t.perf_counter() - t0 < seconds:
            x += 1
        q.put(x)

    q = mp.Queue()
    ps = [mp.Process(target=spin, args=(q,)) for _ in range(nprocs)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / seconds


def scaling(repeats: int = 2) -> None:
    """Best-of-N per level (fresh processes, same cached input), interleaved
    so host-capacity swings hit both levels comparably."""
    lo, hi = max(1, NUM_CPUS // 4), NUM_CPUS
    results: dict[int, dict] = {}
    for _ in range(repeats):
        for n in (lo, hi):
            r = _single_run(n)
            if n not in results or r["sec"] < results[n]["sec"]:
                results[n] = r
    thr = {n: results[n]["rows"] / results[n]["sec"] for n in results}
    eff = (thr[hi] / thr[lo]) / (hi / lo)
    spin = {n: _spin_throughput(n) for n in (lo, hi)}
    spin_eff = (spin[hi] / spin[lo]) / (hi / lo)
    print(json.dumps({
        "metric": "kg pipeline scaling efficiency (fresh processes, same input)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "queries": {f"cpus_{n}": round(results[n]["sec"], 3) for n in results},
        "throughput_rows_per_sec": {str(n): round(thr[n], 1) for n in results},
        "cpu_spin_ceiling_efficiency": round(spin_eff, 3),
        "normalized_efficiency": round(min(1.0, eff / spin_eff), 3) if spin_eff else None,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "note": ("single shared node; parallelism levels emulate N vs 4N cluster "
                 "sizes; spin ceiling = what perfectly-parallel pure-CPU work "
                 "achieves on this box at the same moment"),
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        scaling()
    elif len(sys.argv) > 1 and sys.argv[1] == "--single":
        _single(int(sys.argv[2]))
    else:
        main()
