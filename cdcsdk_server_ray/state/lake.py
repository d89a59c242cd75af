"""Parquet lake layout: staged fragments, merge-on-read, compaction.

Reference analogue: the S3 sink's object layout — rolling JSONL objects
under a time/UUID path template (S3ChangeConsumer.java:84-150,
NamePatternResolver.java:19-35, roll thresholds Roller.java:21-49) —
rebuilt as a *keyed, partitioned Parquet lake*:

    <lake_dir>/fragments/p{pid:05d}/delta-w{window:09d}.parquet
    <lake_dir>/fragments/p{pid:05d}/base-e{epoch:06d}.parquet

Differences by design (SURVEY.md §2.4 K3, §7.5):
- fragment names are DETERMINISTIC functions of (partition, window) — a
  replayed window overwrites identical bytes, making retries idempotent
  (the reference's UUID/now() names are precisely what prevents that);
- fragments are invisible until the manifest commit (two-phase commit,
  state/manifest.py) — the insert-only S3 sink has no such gate;
- content is the LWW-reduced delta (one row per key per window incl.
  tombstones), not raw events — merge-on-read resolves across fragments.

At 100 TB, ``lake_dir`` is an S3/HDFS URI via ``pyarrow.fs``; per-partition
directories keep reads, compaction and resume partition-parallel.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def fragment_dir(lake_dir: str, pid: int) -> str:
    return os.path.join(lake_dir, "fragments", f"p{pid:05d}")


def delta_path(lake_dir: str, pid: int, window_id: int, lo: int,
               salt: int | None = None) -> str:
    """Deterministic delta name; hot partitions split into per-salt
    fragments (same key ⇒ same salt, so salt fragments never overlap on
    keys — merge-on-read needs no special handling).

    The name includes the window's start LSN ``lo``: a window truncated by
    ``--until-lsn`` (or a growing table source) and later *continued* gets
    a DIFFERENT fragment name for the continuation (lo = committed+1 ≠
    original lo), so the committed fragment is never overwritten. Replay
    of an *uncommitted* attempt always recomputes the same lo
    (committed_lsn+1), so idempotent byte-identical overwrite is preserved.
    """
    suffix = f"-s{salt:03d}" if salt is not None else ""
    return os.path.join(fragment_dir(lake_dir, pid),
                        f"delta-w{window_id:09d}-{lo}{suffix}.parquet")


def base_path(lake_dir: str, pid: int, epoch: int) -> str:
    return os.path.join(fragment_dir(lake_dir, pid), f"base-e{epoch:06d}.parquet")


def dlq_path(lake_dir: str, pid: int, window_id: int, lo: int,
             salt: int | None = None) -> str:
    """Deterministic dead-letter fragment name — same (window_id, lo)
    continuation/replay semantics as delta_path, kept under dlq/ so the
    merge-on-read state view (which globs nothing — it reads the
    manifest's fragment lists) and directory-level tooling both see the
    poison stream as a separate table."""
    suffix = f"-s{salt:03d}" if salt is not None else ""
    return os.path.join(lake_dir, "dlq", f"p{pid:05d}",
                        f"dlq-w{window_id:09d}-{lo}{suffix}.parquet")


def write_fragment(table: pa.Table, path: str, *, staged: bool = False,
                   fsync: bool = True) -> int:
    """Atomic fragment write (tmp + rename): a crashed writer never leaves
    a torn file (≙ multipart complete-or-abort, S3OutputStream.java:146-152).
    With ``staged=True`` the bytes land at ``path + '.staged'`` and become
    visible at ``path`` only when :func:`publish_fragments` runs (inside
    the manifest commit, after the stale-writer fence) — so a writer that
    loses the epoch race never touches committed files. Returns bytes
    written.

    ``fsync=False`` is for BULK writers (snapshot bootstrap) that emit
    thousands of fragments before ONE commit: per-file fsync serializes
    on the journal regardless of task parallelism (measured: the 6400-
    file bootstrap spent its whole wall in fsync), so the bulk path
    skips it and the caller issues a single ``os.sync()`` BEFORE the
    manifest commit — same guarantee (no durably-referenced fragment
    with unflushed bytes), one journal flush instead of thousands."""
    final = path + ".staged" if staged else path
    os.makedirs(os.path.dirname(final), exist_ok=True)
    tmp = final + ".tmp"
    pq.write_table(table, tmp, compression="zstd")
    # fsync the DATA before the rename: publish/commit fsync only
    # directories, so without this a power loss after commit could leave
    # a durably-referenced fragment with unflushed (empty/partial)
    # contents — data loss behind a valid manifest
    if fsync:
        with open(tmp, "rb") as f:
            os.fsync(f.fileno())
    os.replace(tmp, final)
    return os.path.getsize(final)


def publish_fragments(lake_dir: str, relpaths: list[str]) -> None:
    """Rename ``<frag>.staged`` → ``<frag>`` for each pending fragment and
    fsync the touched directories. Idempotent: a fragment already published
    by a crashed earlier attempt (staged file gone, final present) is
    skipped; replay rewrites the staged file and republishes."""
    dirs = set()
    for rel in relpaths:
        final = os.path.join(lake_dir, rel)
        staged = final + ".staged"
        if os.path.exists(staged):
            os.replace(staged, final)
            dirs.add(os.path.dirname(final))
        elif not os.path.exists(final):
            raise FileNotFoundError(f"fragment {rel}: neither staged nor final")
    from cdcsdk_server_ray.state.manifest import _fsync_dir
    for d in dirs:
        _fsync_dir(d)


def resolve_fragment(path: str) -> str:
    """Committed fragments live at their final name; in stateless mode
    (checkpointing=False — nothing ever publishes) they remain staged."""
    return path if os.path.exists(path) else path + ".staged"


def read_fragment(lake_dir: str, rel_or_abs: str) -> pa.Table:
    path = rel_or_abs if os.path.isabs(rel_or_abs) else os.path.join(lake_dir, rel_or_abs)
    return pq.read_table(resolve_fragment(path))


def relpath(lake_dir: str, path: str) -> str:
    return os.path.relpath(path, lake_dir)


def partition_fragments(manifest, lake_dir: str) -> dict[int, list[str]]:
    """pid → absolute fragment paths, committed only (manifest is truth)."""
    out: dict[int, list[str]] = {}
    for pid, ps in manifest.partitions.items():
        out[pid] = [os.path.join(lake_dir, f) for f in ps.fragments]
    return out


def read_current_state(lake_dir: str, manifest, *, drop_tombstones: bool = True):
    """The lake's "current state" view as a ``ray.data.Dataset``.

    Merge-on-read: each partition's fragments (already co-partitioned by
    key hash) are LWW-merged independently — one task per partition, NO
    cross-partition shuffle. Tombstone winners are dropped.
    """
    import ray.data

    from cdcsdk_server_ray.stages.lww import drop_deleted, merge_tables_lww

    frags = partition_fragments(manifest, lake_dir)
    items = [{"pid": pid, "paths": paths} for pid, paths in sorted(frags.items()) if paths]
    if not items:
        # empty lake: SAME schema as a populated one (the changelog event
        # schema every fragment carries) so callers touching op/lsn/
        # content don't crash only on the fresh-lake path
        return ray.data.from_arrow(pa.table({
            "lsn": pa.array([], pa.int64()),
            "tx_id": pa.array([], pa.int64()),
            "op": pa.array([], pa.string()),
            "ts_ms": pa.array([], pa.timestamp("ms")),
            "repo": pa.array([], pa.string()),
            "path": pa.array([], pa.string()),
            "commit": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
            "content": pa.array([], pa.string()),
        }))

    def merge_partition(batch: pa.Table) -> pa.Table:
        tables = []
        for paths in batch["paths"].to_pylist():
            tables.extend(pq.read_table(resolve_fragment(p)) for p in paths)
        merged = merge_tables_lww(tables)
        if drop_tombstones:
            merged = drop_deleted(merged)
        return merged

    # one merge task per partition (batch_size=1 over the descriptor rows);
    # fragments are co-partitioned by key hash, so NO cross-partition shuffle
    return ray.data.from_items(items).map_batches(
        merge_partition, batch_format="pyarrow", batch_size=1)
