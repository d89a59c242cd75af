"""10^9-event demonstration run with a mid-run kill/resume (SCALE.md §4).

Cements the 10^10 extrapolation one decade above the existing 10^8 run:
~1.0e9 change events (2.22e8 keys x <=8 versions, iot-row profile),
64 partitions, ~10 pipelined windows (~1e8 events each), rolling
compaction every 4 windows, full engine semantics (two-phase commits,
staged-fragment publish). The run is KILLED (SIGKILL) mid-stream after
a few committed windows and resumed in a fresh process — the resumed
lake must converge to the same exactly-once state.

Reports one JSON line: events, wall seconds (kill leg + resume leg),
sustained events/s, fragment count (bounded by rolling compaction),
partition balance (events max/mean), and a spot-check of ~200 sampled
keys against the pure-function oracle
(`expected_final_state(cfg, keys=...)`).

Usage:  python tools/run_1e9_demo.py [--keys N] [--lake DIR]
        (defaults: 222M keys ≈ 1.0e9 events, /tmp/cdc_1e9_lake)
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

NUM_PARTITIONS = 64
WINDOWS_TARGET = 10
KILL_AFTER_WINDOWS = 3


def make_cfg(lake: str, num_keys: int, row_profile: str = "iot"):
    from cdcsdk_server_ray.config import EngineConfig, SynthConfig
    # iot: ~100 B rows (the reference's perf workload shape); fat: the
    # default ~500 B content rows — the payload-bandwidth decade the
    # SCALE.md extrapolation leans on (VERDICT r4 item 8)
    lines = {"iot": (1, 4), "fat": (3, 40)}[row_profile]
    synth = SynthConfig(num_keys=num_keys, max_versions=8,
                        content_lines_min=lines[0],
                        content_lines_max=lines[1])
    window = ((synth.max_lsn // WINDOWS_TARGET) // 1_000_000 + 1) * 1_000_000
    return EngineConfig(lake_dir=lake, num_partitions=NUM_PARTITIONS,
                        window_lsns=window, synth=synth,
                        compact_every_windows=4)


def total_expected_events(num_keys: int, max_versions: int, seed: int) -> int:
    """Exact total event count = sum over keys of n_k, chunked-vectorized."""
    from cdcsdk_server_ray.sources.changelog import _U64, _h
    total = 0
    for lo in range(0, num_keys, 20_000_000):
        k = np.arange(lo, min(lo + 20_000_000, num_keys), dtype=np.int64)
        total += int((1 + (_h(seed, 1, k) % _U64(max_versions))).sum())
    return total


def run_leg(lake: str, num_keys: int, kill_after: int | None,
            row_profile: str = "iot") -> float:
    """One engine process; with kill_after, SIGKILL it once the heartbeat
    shows that many committed windows. Returns the leg's wall seconds."""
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import ray\n"
        "ray.init(address='local', num_cpus=32, include_dashboard=False,"
        " logging_level='ERROR')\n"
        "import ray.data\n"
        "ray.data.DataContext.get_current().enable_progress_bars = False\n"
        "from tools.run_1e9_demo import make_cfg\n"
        "from cdcsdk_server_ray.engine import CdcEngine\n"
        "CdcEngine(make_cfg(%r, %d, %r)).run()\n"
        "ray.shutdown()\n"
    ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         lake, num_keys, row_profile)
    t0 = time.time()
    proc = subprocess.Popen([sys.executable, "-c", code])
    if kill_after is None:
        proc.wait()
        if proc.returncode != 0:
            raise RuntimeError(f"engine leg failed rc={proc.returncode}")
        return time.time() - t0
    from cdcsdk_server_ray.health import read_heartbeat
    while proc.poll() is None:
        hb = read_heartbeat(lake)
        if hb and hb.get("windows_done", 0) >= kill_after:
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            break
        time.sleep(2.0)
    return time.time() - t0


def spot_check(lake: str, num_keys: int, n_samples: int = 200,
               row_profile: str = "iot") -> int:
    """Compare sampled keys' final lake rows against the subset oracle.
    Returns the number of verified rows; raises on any mismatch."""
    import ray

    from cdcsdk_server_ray.engine import CdcEngine
    from cdcsdk_server_ray.sources.changelog import expected_final_state

    cfg = make_cfg(lake, num_keys, row_profile)
    keys = np.arange(0, num_keys, max(1, num_keys // n_samples),
                     dtype=np.int64)[:n_samples]
    exp = expected_final_state(cfg.synth, keys=keys).to_pandas()
    want = {f"{r.repo}\x1f{r.path}": (r.commit, r.content)
            for r in exp.itertuples()}
    want_ref = ray.put(frozenset(want))

    def pick(df):
        ws = ray.get(want_ref)
        return df[(df["repo"] + "\x1f" + df["path"]).isin(ws)]

    got = (CdcEngine(cfg).current_state()
           .map_batches(pick, batch_format="pandas").to_pandas())
    assert len(got) == len(exp), (len(got), len(exp))
    gmap = {f"{r.repo}\x1f{r.path}": (r.commit, r.content)
            for r in got.itertuples()}
    for k_, v in want.items():
        assert gmap[k_] == v, f"mismatch at {k_}"
    return len(got)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=222_000_000)
    ap.add_argument("--lake", default="/tmp/cdc_1e9_lake")
    ap.add_argument("--skip-check", action="store_true")
    ap.add_argument("--row-profile", choices=["iot", "fat"], default="iot")
    args = ap.parse_args()

    import shutil
    shutil.rmtree(args.lake, ignore_errors=True)

    wall_kill_leg = run_leg(args.lake, args.keys,
                            kill_after=KILL_AFTER_WINDOWS,
                            row_profile=args.row_profile)
    wall_resume_leg = run_leg(args.lake, args.keys, kill_after=None,
                              row_profile=args.row_profile)
    wall = wall_kill_leg + wall_resume_leg

    from cdcsdk_server_ray.state.manifest import load_current_manifest
    m = load_current_manifest(args.lake)
    assert m is not None
    events = sum(p.events_applied for p in m.partitions.values())
    per_part = np.array([m.partition(p).events_applied
                         for p in range(NUM_PARTITIONS)], dtype=np.float64)
    cfg = make_cfg(args.lake, args.keys, args.row_profile)
    assert m.committed_lsn == cfg.synth.max_lsn - 1, "did not converge"
    expected = total_expected_events(args.keys, 8, cfg.synth.seed)
    # exactly-once accounting: a duplicate apply across the kill/resume
    # boundary inflates the counters even when final LWW content is
    # right — equality with the closed-form total must be a HARD gate,
    # not a reported-next-to number
    assert events == expected, (events, expected)
    lake_bytes = sum(os.path.getsize(os.path.join(r, f))
                     for r, _, fs in os.walk(os.path.join(args.lake,
                                                          "fragments"))
                     for f in fs)

    checked = 0
    if not args.skip_check:
        import ray
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
        import ray.data
        ray.data.DataContext.get_current().enable_progress_bars = False
        checked = spot_check(args.lake, args.keys,
                             row_profile=args.row_profile)
        ray.shutdown()

    print(json.dumps({
        "metric": "cdc_1e9_demo",
        "row_profile": args.row_profile,
        "events": events,
        "events_expected": expected,
        "wall_sec": round(wall, 1),
        "wall_kill_leg_sec": round(wall_kill_leg, 1),
        "wall_resume_leg_sec": round(wall_resume_leg, 1),
        "events_per_sec": round(events / wall),
        "fragments": len(m.all_fragments()),
        "epoch": m.epoch,
        "partition_balance_max_over_mean": round(
            float(per_part.max() / per_part.mean()), 4),
        "spot_checked_rows": checked,
        "lake_bytes": lake_bytes,
    }))


if __name__ == "__main__":
    main()
