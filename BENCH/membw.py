#!/usr/bin/env python
"""Memory-bandwidth ceiling profile for the scaling-bar analysis.

No `perf` binary exists in this container, so this measures the hardware
share of the 8→32-cpu scaling gap directly: a STREAM-triad-like numpy
kernel (2 reads + 1 write per element over arrays far larger than LLC)
runs in N concurrently pinned processes, and the aggregate bandwidth at
N=1, 8, 32 shows how much of the memory subsystem is already saturated
by 8 cores. For a workload whose throughput is a mix of compute-bound
(scales with cores) and bandwidth-bound (scales with agg_bw) stages, the
achievable 8→32-cpu efficiency ceiling is:

    eff(f_bw) = 1 / (4 * ((1 - f_bw) / 4 + f_bw / (agg32 / agg8)))

where f_bw is the bandwidth-bound fraction of 8-cpu wall time. Run:

    python BENCH/membw.py            # prints one JSON line

Results are recorded in BENCH/BASELINE.md next to the scaling rows.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

N_ELEMS = 2**25  # 256 MiB per float64 array, 3 arrays per worker (~0.75 GiB)
REPS = 8


def _triad(q, core: int, barrier):
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        barrier.wait(timeout=120)
        q.put(0.0)
        return
    import numpy as np

    a = np.ones(N_ELEMS)
    b = np.full(N_ELEMS, 2.0)
    c = np.zeros(N_ELEMS)
    # warm
    np.multiply(b, 0.5, out=c)
    # all workers start their timed window together: without the barrier
    # the windows are staggered (allocation time varies), early finishers
    # lower contention for late ones, and summing per-window rates
    # OVERSTATES the true concurrent aggregate
    barrier.wait(timeout=120)
    t0 = time.perf_counter()
    for _ in range(REPS):
        np.add(a, b, out=c)  # 2 reads + 1 write
    dt = time.perf_counter() - t0
    bytes_moved = REPS * 3 * 8 * N_ELEMS
    q.put(bytes_moved / dt / 1e9)


def aggregate_bw(n_procs: int) -> dict:
    n_cores = os.cpu_count() or 1
    if n_procs > n_cores:
        raise SystemExit(
            f"membw: {n_procs} pinned processes need {n_procs} cores, "
            f"machine has {n_cores}"
        )
    q = mp.Queue()
    barrier = mp.Barrier(n_procs)
    procs = [mp.Process(target=_triad, args=(q, i, barrier)) for i in range(n_procs)]
    for p in procs:
        p.start()
    rates = []
    for _ in procs:
        try:
            # a worker that dies pre-put (OOM kill at ~0.75 GiB each) must
            # not hang the whole benchmark on a bare q.get()
            rates.append(q.get(timeout=300))
        except Exception:
            raise SystemExit(
                f"membw: worker died before reporting at n_procs={n_procs} "
                f"(likely OOM — needs ~{0.75 * n_procs:.0f} GiB free)"
            )
    for p in procs:
        p.join()
    return {
        "n_procs": n_procs,
        "aggregate_gb_s": round(sum(rates), 2),
        "per_core_gb_s": round(sum(rates) / n_procs, 2),
        "min_core_gb_s": round(min(rates), 2),
    }


def main():
    out = {"metric": "STREAM-triad aggregate memory bandwidth", "arms": []}
    for n in (1, 8, 32):
        out["arms"].append(aggregate_bw(n))
        time.sleep(1.0)
    agg = {a["n_procs"]: a["aggregate_gb_s"] for a in out["arms"]}
    out["agg32_over_agg8"] = round(agg[32] / agg[8], 3)
    out["bw_bound_eff_ceiling"] = round(agg[32] / agg[8] / 4, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
