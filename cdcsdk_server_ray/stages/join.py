"""Joins: broadcast (small side) and bucketed hash join (both sides large).

The reference is a message forwarder with no joins (SURVEY.md §2.5); these
fill the gap Ray-Data-first:

- ``broadcast_join``: the small side is ``ray.put`` ONCE and merged into
  each batch inside ``map_batches`` — a dimension-table lookup with no
  shuffle. This is the right plan whenever one side fits in a worker heap
  (nation/region/customer-style tables).
- ``bucket_join``: both sides get a ``bucket = hash(key) % B`` column,
  are grouped per bucket, and matching buckets join pairwise — an
  explicit partitioned hash join; B and skew handling are the caller's
  declared partitioning assumption.
- ``join_parquet_dim``: the ONE entry callers should use when the right
  side is a parquet table — estimates its in-memory size from parquet
  METADATA (O(footer), no data read) and picks broadcast vs bucket by a
  byte bound, so "broadcast only sketch-sized sets" is enforced by the
  API instead of by every call site's judgment.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

# per-worker-process cache of ray.get'd broadcast sides, keyed by object
# ref. Worker processes outlive Dataset executions, so a dimension table
# is deserialized once per WORKER per query table — not once per batch,
# and with no actor pool to spin up per execution (the prior actor-pool
# version paid ~seconds of pool startup on every run and capped the join
# stage at 4 concurrent actors while 64 blocks queued behind it).
_BCAST_CACHE: dict[str, pd.DataFrame] = {}
_BCAST_CACHE_MAX = 8


def _bcast_get(ref) -> pd.DataFrame:
    import ray

    key = ref.hex()
    small = _BCAST_CACHE.get(key)
    if small is None:
        if len(_BCAST_CACHE) >= _BCAST_CACHE_MAX:
            _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
        small = _BCAST_CACHE.setdefault(key, ray.get(ref))
    return small


def broadcast_join(ds, small_df: pd.DataFrame, on, how: str = "inner",
                   small_side_ref=None):
    """Merge a small pandas table into every batch. ``small_df`` is put in
    the object store once; each map task reads the shared copy (zero per-
    batch reshipping, worker-local deserialize cache)."""
    import ray

    ref = small_side_ref or ray.put(small_df)

    def join_batch(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(_bcast_get(ref), on=on, how=how)

    return ds.map_batches(join_batch, batch_format="pandas")


# default broadcast bound: a dimension side above this (uncompressed,
# metadata-estimated) bytes is NOT "sketch-sized" — it bucket-joins.
# 64 MiB × join-stage concurrency fits comfortably in a worker heap while
# covering every TPC-H dimension table (customer at sf100 ≈ 2.4 GB would
# correctly flip to the bucket plan; nation/region/sf0.1 customer stay
# broadcast).
BROADCAST_BOUND_BYTES = 64 * 2**20


def parquet_table_bytes(path: str, columns=None) -> int:
    """Uncompressed-size estimate of selected columns from parquet
    FOOTERS only — O(metadata), no data pages read. ``path`` may be one
    file or a directory of ``*.parquet`` fragments."""
    import glob
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                                 recursive=True))
    else:
        files = [path]
    want = set(columns) if columns is not None else None
    total = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                root = col.path_in_schema.split(".", 1)[0]
                if want is None or root in want:
                    total += col.total_uncompressed_size
    return total


def choose_join_plan(right_path: str, right_columns=None,
                     broadcast_bound: int = BROADCAST_BOUND_BYTES) -> str:
    """'broadcast' when the right side's metadata-estimated bytes fit the
    bound, else 'bucket'. Split out so tests (and callers that need the
    decision up front) can interrogate the guard directly."""
    return ("broadcast"
            if parquet_table_bytes(right_path, right_columns)
            <= broadcast_bound else "bucket")


def join_parquet_dim(left, right_path: str, on, right_columns=None,
                     how: str = "inner", rename: dict | None = None,
                     broadcast_bound: int = BROADCAST_BOUND_BYTES,
                     num_buckets: int = 32):
    """Size-guarded join of Dataset ``left`` with a parquet table.

    One entry, two plans: below ``broadcast_bound`` (metadata-estimated
    uncompressed bytes of the PRUNED columns) the right side is read to
    the driver once and broadcast (``ray.put`` + per-worker cache — zero
    shuffle); above it, both sides go through the partitioned hash join
    (one shuffle, bounded per-task memory). The driver-side ``to_pandas``
    on the broadcast path is therefore bound-limited by construction —
    never corpus-sized."""
    import ray.data

    plan = choose_join_plan(right_path, right_columns, broadcast_bound)
    if plan == "broadcast":
        small = ray.data.read_parquet(
            right_path, columns=right_columns).to_pandas()
        if rename:
            small = small.rename(columns=rename)
        return broadcast_join(left, small, on=on, how=how)
    right = ray.data.read_parquet(right_path, columns=right_columns)
    if rename:
        ren = dict(rename)
        right = right.map_batches(lambda df: df.rename(columns=ren),
                                  batch_format="pandas")
    return bucket_join(left, right, on=on, num_buckets=num_buckets, how=how)


def bucket_join(left, right, on: list[str] | str, num_buckets: int = 32,
                how: str = "inner",
                left_dtypes: dict | None = None,
                right_dtypes: dict | None = None,
                post_join=None):
    """Partitioned hash join of two Datasets on equality keys.

    Plan: add bucket col to both → union with a side tag → groupby(bucket)
    → pandas merge inside each group. One shuffle total (the groupby);
    bucket count bounds peak per-task memory. Hot buckets should be salted
    by the caller if a key dominates (same policy as the CDC merge).

    ``left_dtypes`` / ``right_dtypes``: optional ordered ``{col: pandas
    dtype}`` mappings. When a side's columns are statically known, pass
    them — ``Dataset.schema()`` on an UNmaterialized side executes its
    whole upstream plan under a limit-1 probe, which for a side built
    from AllToAll stages silently doubles the pipeline's wide work (the
    exact-substring query paid a full extra windows→mark→union pass
    per run before this knob).
    """
    on = [on] if isinstance(on, str) else list(on)

    def _pd_dtypes(schema) -> dict:
        out = {}
        for name, t in zip(schema.names, schema.types):
            out[name] = t.to_pandas_dtype() if hasattr(t, "to_pandas_dtype") else t
        return out

    # align both sides to the union of columns BEFORE the union — Ray
    # unions block-wise, so a group could otherwise see only one side's
    # schema and lose the other side's columns entirely
    l_dtypes = dict(left_dtypes) if left_dtypes is not None \
        else _pd_dtypes(left.schema())
    r_dtypes = dict(right_dtypes) if right_dtypes is not None \
        else _pd_dtypes(right.schema())
    l_cols, r_cols = list(l_dtypes), list(r_dtypes)
    all_cols = l_cols + [c for c in r_cols if c not in l_cols]

    def add_bucket(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            # hash the keys BEFORE reindexing: reindex's NaN fill upcasts
            # and a float key would stringify differently ("42.0" vs "42")
            h = pd.util.hash_pandas_object(
                df[on].astype(str).agg("\x1f".join, axis=1), index=False,
                hash_key="cdcsdk-ray-hash0")
            df = df.reindex(columns=all_cols)
            df["__bucket"] = (h % num_buckets).astype("int32")
            df["__side"] = side
            return df
        return fn

    tagged = left.map_batches(add_bucket("L"), batch_format="pandas").union(
        right.map_batches(add_bucket("R"), batch_format="pandas"))

    def _restore(df: pd.DataFrame, dtypes: dict) -> pd.DataFrame:
        # the union's NaN fill upcast the OTHER side's columns; selecting
        # one side back out leaves this side's columns as float64 — cast
        # back so downstream joins/hashes see the original dtypes
        for c, t in dtypes.items():
            if c in df.columns and df[c].dtype != t:
                try:
                    df[c] = df[c].astype(t)
                except (ValueError, TypeError):
                    pass
        return df

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        lg = _restore(g.loc[g["__side"] == "L", l_cols].copy(), l_dtypes)
        rg = _restore(g.loc[g["__side"] == "R", r_cols].copy(), r_dtypes)
        out = lg.merge(rg, on=on, how=how)
        # post_join runs INSIDE the group task, where every row of a join
        # key is guaranteed present (fuse-the-map-side rule): aggregates /
        # prunes keyed on the join key are complete here, whereas the
        # returned Dataset's blocks may later split a hot key across
        # batches. Must handle an empty frame.
        return post_join(out) if post_join is not None else out

    return tagged.groupby("__bucket").map_groups(join_group, batch_format="pandas")
