"""Per-partition lineage records — the Metrics analogue, made a table.

Reference: global Micrometer counters ``cdcsdk.sink.total.recordsWritten``
/ ``bytesWritten`` incremented per record in every sink (Metrics.java:14-24,
S3ChangeConsumer.java:141-142). Rebuilt as structured per-(partition,
window) lineage rows (FIXTURES.md F7) appended to
``<lake_dir>/_lineage/`` at each checkpoint — queryable with the same
engine instead of scraped.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

LINEAGE_SCHEMA = pa.schema([
    ("partition_id", pa.int32()),
    ("window_id", pa.int64()),
    ("window_lo_lsn", pa.int64()),
    ("window_hi_lsn", pa.int64()),
    ("events_applied", pa.int64()),
    ("dedup_drops", pa.int64()),
    ("bytes_written", pa.int64()),
    ("keys_touched", pa.int64()),
    ("fragment", pa.string()),
    # dead-letter routing (nullable — absent unless a validator is
    # configured): poison events routed per window, and the staged DLQ
    # fragment they landed in (≙ Kafka Connect errors.deadletterqueue;
    # the reference's closest analogue is the http sink's skip-on-fail,
    # HttpChangeConsumer.java:96-124, which DROPS instead of routing)
    ("dlq_drops", pa.int64()),
    ("dlq_fragment", pa.string()),
])


def lineage_row(**kwargs) -> dict:
    return {f.name: kwargs.get(f.name) for f in LINEAGE_SCHEMA}


def append_lineage(lake_dir: str, window_id: int, lo: int,
                   rows: list[dict]) -> str | None:
    """One small parquet per window attempt under _lineage/ (deterministic
    name — idempotent on replay, like fragments; the name carries the
    window's start LSN so the continuation of a truncated window never
    clobbers the committed attempt's lineage)."""
    if not rows:
        return None
    path = os.path.join(lake_dir, "_lineage",
                        f"window-{window_id:09d}-{lo}.parquet")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    table = pa.Table.from_pylist(rows, schema=LINEAGE_SCHEMA)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def read_lineage(lake_dir: str):
    """All lineage rows as a ray.data.Dataset (tiny; driver-side ok too)."""
    import ray.data
    d = os.path.join(lake_dir, "_lineage")
    if not os.path.isdir(d) or not os.listdir(d):
        return ray.data.from_arrow(LINEAGE_SCHEMA.empty_table())
    return ray.data.read_parquet(d)
