"""Snapshot-bootstrap throughput probe (scale evidence for
EngineConfig.snapshot_mode='initial', engine.py:bootstrap_snapshot).

Synthesizes a documents-shaped table (deterministic: rows are tiled
copies of /root/testdata/sf0.1/documents.parquet with re-keyed doc_ids
and a tile suffix) at ~N rows, then times the zero-shuffle bulk load in
a FRESH Ray session at the given parallelism. Run twice (8 and 32 CPUs)
in fresh processes for the two-parallelism scaling pair:

    python tools/probe_snapshot_bootstrap.py 8
    python tools/probe_snapshot_bootstrap.py 32

Prints one JSON line: rows, seconds, rows/s, MB/s (input bytes).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TILE_SRC = "/root/testdata/sf0.1/documents.parquet"
TABLE = "/tmp/snapshot_probe/documents_big"   # DIRECTORY of parquet files
LAKE = "/tmp/snapshot_probe/lake"
TILES = 100  # 5k rows/tile -> 500k rows (text-heavy; ~0.9 GB decoded)


def build_table() -> None:
    """One file per tile — a 100 TB snapshot source is always a file
    forest, never one object; per-file read tasks are the parallelism."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.isdir(TABLE) and len(os.listdir(TABLE)) == TILES:
        return
    shutil.rmtree(TABLE, ignore_errors=True)
    os.makedirs(TABLE, exist_ok=True)
    src = pq.read_table(TILE_SRC)
    n = src.num_rows
    for t in range(TILES):
        ids = pa.array([t * n + i for i in src["doc_id"].to_pylist()],
                       pa.int64())
        texts = pa.array([f"{s} tile{t}" for s in src["text"].to_pylist()])
        tile = src.set_column(src.column_names.index("doc_id"), "doc_id", ids)
        tile = tile.set_column(tile.column_names.index("text"), "text", texts)
        pq.write_table(tile, os.path.join(TABLE, f"tile-{t:04d}.parquet"))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    build_table()
    import ray
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    from cdcsdk_server_ray.config import EngineConfig
    from cdcsdk_server_ray.engine import CdcEngine

    shutil.rmtree(LAKE, ignore_errors=True)
    cfg = EngineConfig(lake_dir=LAKE, num_partitions=32, source="table",
                       snapshot_mode="initial", source_table=TABLE)
    t0 = time.time()
    m = CdcEngine(cfg).bootstrap_snapshot()
    dt = time.time() - t0
    rows = sum(p.events_applied for p in m.partitions.values())
    nbytes = sum(os.path.getsize(os.path.join(TABLE, f))
                 for f in os.listdir(TABLE))
    print(json.dumps({
        "probe": "snapshot_bootstrap", "num_cpus": cpus, "rows": rows,
        "sec": round(dt, 2), "rows_per_sec": int(rows / dt),
        "input_mb_per_sec": round(nbytes / 1e6 / dt, 1)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
