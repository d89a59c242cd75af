"""Hardware evidence for the fat-payload scaling ceiling on this host.

Two probes, run back to back:

1. steady-state copy: N processes each copying a 200 MB resident buffer
   (no new pages) — measures memory BANDWIDTH scaling.
2. fresh-allocation: N processes each allocating and first-touching fresh
   100 MB buffers — measures the page-fault/zeroing path scaling.

On this sandbox VM (measured 2026-08-17):

    copy:   1 → 21 GB/s   8 → 154 GB/s   32 → 483 GB/s   (scales, eff 0.78)
    fault:  1 → 2.7 GB/s  8 → 4.0 GB/s   32 → 2.4 GB/s   (NEGATIVE scaling)

The engine's fat-payload profile materializes ~GBs of fresh string/arrow
buffers per run, so its scarce resource is the fault path — which gets
SLOWER with more CPUs on this box. No engine change can scale a
fault-bound stage here; on a real N→4N node cluster each node owns its
own fault path. The iot-row profile (~5× fewer bytes faulted per event)
is CPU-bound and clears 0.8 on this same box — consistent with this
explanation. Usage:  python tools/probe_memory_scaling.py
"""

import json
import multiprocessing as mp
import time

import numpy as np

COPY_SZ = 200 * 1024 * 1024
ALLOC_SZ = 100 * 1024 * 1024
REPS = 5


def copy_worker(q):
    src = np.ones(COPY_SZ // 8, dtype=np.float64)
    dst = np.empty_like(src)
    dst[:] = src                      # fault both buffers in
    t0 = time.time()
    for _ in range(REPS):
        dst[:] = src                  # 2×SZ bytes steady-state traffic
    q.put(2 * COPY_SZ * REPS / (time.time() - t0))


def alloc_worker(q):
    t0 = time.time()
    for _ in range(REPS):
        a = np.empty(ALLOC_SZ // 8, dtype=np.float64)   # fresh pages
        a[::512] = 1.0                                  # touch every page
        del a
    q.put(ALLOC_SZ * REPS / (time.time() - t0))


def run(worker, label):
    for n in (1, 8, 32):
        q = mp.Queue()
        ps = [mp.Process(target=worker, args=(q,)) for _ in range(n)]
        [p.start() for p in ps]
        rates = [q.get() for _ in ps]
        [p.join() for p in ps]
        agg = sum(rates) / 1e9
        print(json.dumps({"probe": label, "streams": n,
                          "aggregate_GBps": round(agg, 2),
                          "per_stream_GBps": round(agg / n, 3)}))


if __name__ == "__main__":
    run(copy_worker, "steady_state_copy")
    run(alloc_worker, "fresh_allocation_fault")
