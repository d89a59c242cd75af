"""Per-key last-write-wins (LWW) reduction — vectorized, associative.

The reference's sinks deliver per-key-ordered streams (Kinesis partition
key = record key, KinesisChangeConsumer.java:108-112; Pub/Sub orderingKey,
PubSubChangeConsumer.java:124-135) and its S3 sink is insert-only
(README.md:180-183) — downstream compaction to "current state" is implied
by the key/LSN contract. Here LWW by max ``lsn`` per ``(repo, path)`` IS
the lake-upsert merge operator (SURVEY.md §2.5).

LWW is associative and commutative over event sets, so it can run as:
batch-local partial reduce (inside map_batches, before any shuffle) →
group reduce (after the partition shuffle) → merge-on-read reduce
(across lake fragments). Each level uses the same kernel below.

Tombstones (``op == 'd'``) are *kept* by the reduce — a delete must win
over earlier versions — and dropped only at the final read
(``drop_deleted``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from cdcsdk_server_ray.stages.schema_evolution import concat_unified

KEY_COLS = ("repo", "path")
ORDER_COL = "lsn"


def _combined_key(batch: pa.Table, key_cols=KEY_COLS) -> pa.Array:
    from cdcsdk_server_ray.stages.partition import escape_key_cols

    cols = [pc.cast(batch[c], pa.string()) for c in key_cols]
    if len(cols) == 1:
        arr = cols[0]
    else:
        # same escaping as partition.key_hash: distinct keys whose
        # components contain \x1f must not join to the same string
        arr = pc.binary_join_element_wise(*escape_key_cols(cols), "\x1f")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


def lww_reduce(batch: pa.Table, key_cols=KEY_COLS, order_col=ORDER_COL,
               count_col: str | None = None) -> pa.Table:
    """Keep, per key, only the row with the max ``order_col``.

    Vectorized: one sort by (key, lsn) + a shifted run-boundary compare.
    No Python per-row work; ~O(n log n) in Arrow kernels.

    With ``count_col``, the winner row carries the total number of raw
    events it absorbed (segmented sum) — this is what lets lineage count
    every event even though LWW runs as a multi-level combiner: if the
    column already exists (output of a previous reduce level) its values
    are summed, otherwise each input row counts 1.
    """
    import numpy as np

    if count_col is not None and count_col not in batch.column_names:
        batch = batch.append_column(
            count_col, pa.array(np.ones(batch.num_rows, dtype=np.int64)))
    if batch.num_rows <= 1:
        return batch
    # sort KEY+ORDER columns only — never the payload. The old plan
    # (sort_indices + full batch.take + filter) gathered every payload
    # byte into a fresh sorted copy just to throw ~80% of it away; on
    # the fault-path-bound host (BASELINE.md "fat-payload scaling") that
    # full-width gather was the merge stage's dominant fresh-allocation
    # term. Here only (key, lsn) sort and the WINNER rows gather.
    key = _combined_key(batch, key_cols)
    order = batch[order_col]
    if isinstance(order, pa.ChunkedArray):
        order = order.combine_chunks()
    tmp = pa.table({"k": key, "o": order})
    idx = pc.sort_indices(tmp, sort_keys=[("k", "ascending"),
                                          ("o", "ascending")])
    idx_np = idx.to_numpy(zero_copy_only=False)
    key_sorted = key.take(idx)
    n = len(key_sorted)
    # sorted row i wins iff it is the last row of its key run
    boundary = pc.not_equal(key_sorted.slice(0, n - 1), key_sorted.slice(1, n))
    if isinstance(boundary, pa.ChunkedArray):
        boundary = boundary.combine_chunks()
    win_pos = np.concatenate(
        [np.flatnonzero(boundary.to_numpy(zero_copy_only=False)), [n - 1]])
    winners = batch.take(pa.array(idx_np[win_pos]))
    if count_col is not None:
        counts_sorted = batch[count_col].to_numpy(zero_copy_only=False)[idx_np]
        cum = np.cumsum(counts_sorted)
        seg = cum[win_pos] - np.concatenate(([0], cum[win_pos[:-1]]))
        winners = winners.set_column(
            winners.column_names.index(count_col), count_col,
            pa.array(seg.astype(np.int64)))
    return winners


def drop_deleted(batch: pa.Table, op_col: str = "op") -> pa.Table:
    """Final-state view: a winning tombstone removes the key."""
    return batch.filter(pc.not_equal(batch[op_col], "d"))


def merge_tables_lww(tables: list[pa.Table], key_cols=KEY_COLS,
                     order_col=ORDER_COL) -> pa.Table:
    """LWW-merge several (fragment) tables, unifying evolved schemas."""
    if not tables:
        return pa.table({})
    merged = concat_unified(tables)
    return lww_reduce(merged, key_cols, order_col)
