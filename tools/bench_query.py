"""Per-query A/B timing harness (development tool).

Times named `queries()` entries best-of-N in one Ray session, bracketed
by the FROZEN drift canary (bench._canary_token_counts) so a reading can
be normalized against box drift. Usage:

    python tools/bench_query.py [--repeat N] [--sf DIR] q1 [q2 ...]

Prints one JSON line: {"canary": best, "canary_runs": [...],
"queries": {name: {"best": s, "runs": [...]}}}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = sys.argv[1:]
    repeat = 3
    sf = "/root/testdata/sf0.1"
    names = []
    it = iter(argv)
    for a in it:
        if a == "--repeat":
            repeat = int(next(it))
        elif a == "--sf":
            sf = next(it)
        else:
            names.append(a)

    import bench

    import ray
    ray.init(**bench._ray_init_kwargs())
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry
    qs = entry.queries()
    for n in names:
        if n not in qs:
            sys.exit(f"unknown query {n!r}; known: {sorted(qs)}")

    def consume(ds):
        return len(ds.to_pandas()) if hasattr(ds, "to_pandas") else len(ds)

    def time_fn(fn, reps):
        runs = []
        for _ in range(reps):
            t0 = time.time()
            consume(fn())
            runs.append(round(time.time() - t0, 2))
        return runs

    consume(qs[names[0]](sf))  # untimed pool/reader warm-up
    canary_runs = time_fn(lambda: bench._canary_token_counts(sf), 3)
    out = {}
    for n in names:
        runs = time_fn(lambda: qs[n](sf), repeat)
        out[n] = {"best": min(runs), "runs": runs}
    canary2 = time_fn(lambda: bench._canary_token_counts(sf), 1)
    ray.shutdown()
    print(json.dumps({"canary": min(canary_runs), "canary_runs": canary_runs,
                      "canary_after": canary2[0], "queries": out, "sf": sf}))


if __name__ == "__main__":
    main()
