"""The windowed CDC engine — MTEngine's poll loop, Ray-Data-first.

Reference analogue, stage by stage (MTEngine.java:879-934):

    task.poll()                 → a lazy Dataset over one LSN window
                                  (sources/changelog.py — synthesis is a
                                  pure function of (seed, lsn))
    transformations.transform   → map_batches envelope chain
                                  (stages/envelope.py: unwrap → flatten)
    handler.handleBatch         → partial LWW + hash-partition shuffle +
                                  per-partition apply/stage
                                  (stages/lww.py, stages/partition.py)
    committer.markProcessed /   → manifest update + two-phase commit
    commitOffsets                 (state/manifest.py), policy-gated
                                  (commit_every_windows ≙ OffsetCommitPolicy)

Delivery guarantee: the reference is at-least-once (offsets commit after
sink write, MTEngine.java:1012-1016). This engine is exactly-once:
deterministic synthesis + deterministic fragment names + manifest-gated
visibility make replay of any uncommitted window byte-idempotent; the
replay-convergence test (tests/test_engine_replay.py) proves it by
sha256(content) equality.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

from cdcsdk_server_ray.config import EngineConfig
from cdcsdk_server_ray.memtune import tune_process_memory
from cdcsdk_server_ray.sources.changelog import changelog_dataset
from cdcsdk_server_ray.stages.envelope import flatten_chain
from cdcsdk_server_ray.stages.lww import (drop_deleted, lww_reduce,
                                          merge_tables_lww)
from cdcsdk_server_ray.state import lake as lake_mod
from cdcsdk_server_ray.state.lineage import (LINEAGE_SCHEMA, append_lineage,
                                             lineage_row)
from cdcsdk_server_ray.state.manifest import (Manifest, commit_manifest,
                                              load_current_manifest)

# staged/tmp fragment files older than this are orphans from crashed or
# fenced-out attempts — safe for GC; younger ones may be in-flight
# (pipelined window writing while an earlier window's commit compacts)
_GC_STAGED_AGE_S = 3600.0


class RetriableError(RuntimeError):
    """Transient source/sink failure — Ray retries the task (≙ the engine
    swallowing RetriableException and re-polling, MTEngine.java:900-905).
    Any other exception is fatal and aborts the run, like a non-retriable
    handler error (MTEngine.java:929-933)."""


def _content_salt(sub: pa.Table) -> int:
    """Deterministic discriminator for snapshot fragment names: crc32 of
    the sub-block's lsn vector. Two blocks can only share (min lsn, salt)
    if their lsn sets are identical — i.e. duplicate doc_ids carrying the
    same rows, where an overwrite is byte-idempotent anyway."""
    import zlib
    lsn = sub["lsn"]
    if isinstance(lsn, pa.ChunkedArray):
        lsn = lsn.combine_chunks()
    return int(zlib.crc32(lsn.to_numpy().tobytes()))


def _make_apply_fn(lake_dir: str, window_id: int, window_lo: int,
                   window_hi: int, watermarks: dict[int, int],
                   staged: bool = True):
    """Per-partition apply: fence → final LWW → stage fragment → lineage.

    ≙ a sink consumer's handleBatch + the Roller's flush
    (S3ChangeConsumer.java:123-150) — but writing an LWW-reduced Parquet
    delta to a deterministic path instead of appending JSONL to a
    UUID-named object. Runs as a `groupby(partition_id).map_groups` task;
    the watermark fence makes redelivered events no-ops (exact dedup of
    at-least-once replay — SURVEY.md §2.5 "exact dedup").
    """

    def apply(group: pa.Table, salt: int | None = None) -> pa.Table:
        pid = int(group["partition_id"][0].as_py())
        wm = watermarks.get(pid, 0)
        n_in = int(pc.sum(group["n_events"]).as_py() or 0)
        if wm:
            # the fence: redelivered (≤ watermark) events are no-ops; the
            # reference's at-least-once redelivery reaches the sink instead
            group = group.filter(pc.greater(group["lsn"], wm))
        applied = int(pc.sum(group["n_events"]).as_py() or 0)
        dedup_drops = n_in - applied
        dlq_drops, dlq_rel = 0, None
        if "__dlq_reason" in group.column_names:
            # dead-letter split AFTER the fence (replayed poison ≤
            # watermark is a no-op → exactly-once DLQ) and BEFORE the
            # LWW (a poison event must never be absorbed by a newer
            # clean version — it is routed, not merged)
            is_p = pc.is_valid(group["__dlq_reason"])
            poison = group.filter(is_p)
            group = group.filter(pc.invert(is_p))
            applied = int(pc.sum(group["n_events"]).as_py() or 0)
            dlq_drops = poison.num_rows
            if poison.num_rows:
                dfrag = lake_mod.dlq_path(lake_dir, pid, window_id,
                                          window_lo, salt=salt)
                dpayload = poison.drop_columns(
                    [c for c in ("partition_id", "salt", "n_events")
                     if c in poison.column_names])
                dpayload = dpayload.rename_columns(
                    ["dlq_reason" if c == "__dlq_reason" else c
                     for c in dpayload.column_names])
                # lsn order: replay (and either exchange) regenerates
                # byte-identical dlq fragments, same as the deltas
                dpayload = dpayload.sort_by("lsn")
                lake_mod.write_fragment(dpayload, dfrag, staged=staged)
                dlq_rel = lake_mod.relpath(lake_dir, dfrag)
        winners = lww_reduce(group, count_col="n_events")
        # fragment name carries (window_id, lo): a continuation of a window
        # truncated by an earlier --until-lsn gets a fresh name instead of
        # clobbering the committed fragment (replay of an UNCOMMITTED
        # attempt recomputes the same lo, keeping overwrites idempotent)
        frag = lake_mod.delta_path(lake_dir, pid, window_id, window_lo,
                                   salt=salt)
        drop = [c for c in ("partition_id", "salt", "n_events",
                            "__dlq_reason")
                if c in winners.column_names]
        payload = winners.drop_columns(drop)
        nbytes = lake_mod.write_fragment(payload, frag, staged=staged) \
            if payload.num_rows else 0
        row = lineage_row(
            partition_id=pid, window_id=window_id,
            window_lo_lsn=window_lo, window_hi_lsn=window_hi,
            events_applied=applied, dedup_drops=dedup_drops,
            bytes_written=nbytes, keys_touched=winners.num_rows,
            fragment=lake_mod.relpath(lake_dir, frag) if payload.num_rows else None,
            dlq_drops=dlq_drops, dlq_fragment=dlq_rel,
        )
        return pa.Table.from_pylist([row], schema=LINEAGE_SCHEMA)

    return apply


class CdcEngine:
    """Windowed driver loop (≙ MTEngine.run, ServerApp engine threads)."""

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        self._snap_geom: tuple[int, int] | None = None
        os.makedirs(cfg.lake_dir, exist_ok=True)

    # ---- resume ----------------------------------------------------------
    def manifest(self) -> Manifest:
        m = load_current_manifest(self.cfg.lake_dir,
                                  backend=self.cfg.offset_backend)
        if m is None:
            # backend fence: a lake committed under the OTHER backend loads
            # as None here and would silently look fresh — a replay would
            # fork history and compact()+GC would delete committed
            # fragments. Refuse instead (backend is pinned per lake, like
            # num_partitions / window_lsns).
            from cdcsdk_server_ray.state.manifest import detect_backend
            on_disk = detect_backend(self.cfg.lake_dir)
            if on_disk is not None and on_disk != self.cfg.offset_backend:
                raise ValueError(
                    f"lake at {self.cfg.lake_dir} has committed state under "
                    f"offset_backend={on_disk!r}; config says "
                    f"{self.cfg.offset_backend!r} — the backend is fixed "
                    "per lake")
            m = Manifest(num_partitions=self.cfg.num_partitions,
                         window_lsns=self.cfg.window_lsns,
                         offset_backend=self.cfg.offset_backend)
            if self.cfg.start_lsn:
                # FRESH lake attached mid-stream: events ≤ start_lsn are
                # out of scope by declaration (the incremental snapshot
                # is the mechanism that backfills their state). Ignored
                # on resume — the committed watermark rules there.
                m.committed_lsn = self.cfg.start_lsn
                for pid in range(self.cfg.num_partitions):
                    m.partition(pid).committed_lsn = self.cfg.start_lsn
        elif m.offset_backend and m.offset_backend != self.cfg.offset_backend:
            raise ValueError(
                f"lake was committed with offset_backend="
                f"{m.offset_backend!r}; config says "
                f"{self.cfg.offset_backend!r} — the backend is fixed per lake")
        elif m.num_partitions != self.cfg.num_partitions:
            raise ValueError(
                f"lake has {m.num_partitions} partitions; config says "
                f"{self.cfg.num_partitions} — P is fixed per lake (SURVEY.md §4)")
        elif m.window_lsns and m.window_lsns != self.cfg.window_lsns:
            # window ids derive from (lo-1)//w — a different width would
            # remap ids onto existing committed fragment names
            raise ValueError(
                f"lake was built with window_lsns={m.window_lsns}; config "
                f"says {self.cfg.window_lsns} — windowing is fixed per lake")
        if not m.window_lsns:
            m.window_lsns = self.cfg.window_lsns  # adopt on legacy manifests
        if not m.offset_backend:
            m.offset_backend = self.cfg.offset_backend
        return m

    # ---- one window ------------------------------------------------------
    def window_dataset(self, lo: int, hi: int, spill_fn=None):
        """events for lsn ∈ [lo, hi): synth (enveloped, YB-wrapped) →
        unwrap → flatten → batch-local partial LWW → partition column.

        ``spill_fn`` FUSES the exchange's map side into the same task:
        source → transform → spill run as ONE map_batches, so the
        window's payload never crosses the object store at all (only
        range ids in, 1-row spill counts out). Unfused, the three stages
        moved ~2× the window's bytes through plasma — memcpy plus fresh
        page faults, the measured anti-scaling resource on shared-memory
        hosts (BASELINE.md round-5 scaling section). Without ``spill_fn``
        the plan is unchanged (the groupby exchange and ad-hoc consumers
        need the event Dataset itself)."""
        cfg = self.cfg
        if cfg.source == "table":
            from cdcsdk_server_ray.sources.source_table import \
                table_changelog_dataset
            ds = table_changelog_dataset(cfg.source_table, lo, hi,
                                         batch_size=cfg.batch_size)
            chain = lambda b: b  # table source emits the flat event form
        elif cfg.source == "parquet_changelog":
            from cdcsdk_server_ray.sources.parquet_changelog import \
                parquet_changelog_dataset
            ds = parquet_changelog_dataset(cfg.source_table, lo, hi,
                                           batch_size=cfg.batch_size)
            chain = lambda b: b  # already the flat event form
        else:
            # the fused spill path builds its own range source below —
            # don't construct the unfused plan it would never execute
            ds = None if spill_fn is not None else \
                changelog_dataset(cfg.synth, lo, hi, mode="envelope",
                                  yb_wrap=True, batch_size=cfg.batch_size)
            chain = flatten_chain(yb=True)

        import numpy as np

        from cdcsdk_server_ray.stages.partition import key_hash

        fault_lsn = cfg.fault_inject_lsn
        fault_marker = os.path.join(cfg.lake_dir, "_fault_injected") \
            if fault_lsn else None

        # user SMT chain (T4 plug-in point): config specs → one composed
        # batch fn from the registry, applied after the envelope chain
        user_chain = None
        if cfg.transforms:
            from cdcsdk_server_ray.stages.envelope import build_chain
            user_chain = build_chain(list(cfg.transforms))

        dlq_bytes = cfg.dlq_max_content_bytes

        def transform(batch: pa.Table) -> pa.Table:
            tune_process_memory()
            flat = chain(batch)
            if user_chain is not None:
                flat = user_chain(flat)
                if flat.num_rows == 0:
                    # every record dropped (filter semantics) — emit an
                    # empty batch with bookkeeping columns intact
                    flat = flat.append_column("n_events",
                                              pa.array([], pa.int64()))
                    flat = flat.append_column("partition_id",
                                              pa.array([], pa.int32()))
                    return flat.append_column("salt", pa.array([], pa.int32()))
            if dlq_bytes is not None and \
                    "__dlq_reason" not in flat.column_names:
                # built-in size validator: oversized content is POISON —
                # routed, never applied and never silently dropped. One
                # Arrow kernel; null content (deletes) is clean.
                too_big = pc.fill_null(
                    pc.greater(pc.binary_length(flat["content"]),
                               pa.scalar(dlq_bytes, pa.int64())), False)
                reason = pc.if_else(
                    too_big, pa.scalar("content_too_large"),
                    pa.scalar(None, pa.string()))
                flat = flat.append_column("__dlq_reason", reason)
            if fault_lsn and flat.num_rows:
                import numpy as _np
                lsns = flat["lsn"].to_numpy()
                if (_np.asarray(lsns) == fault_lsn).any():
                    try:
                        fd = os.open(fault_marker,
                                     os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                        os.close(fd)
                        raise RetriableError(
                            f"injected retriable failure at lsn {fault_lsn}")
                    except FileExistsError:
                        pass  # already failed once; retry proceeds
            h = key_hash(flat["repo"], flat["path"])
            # ADAPTIVE combiner: batch-local partial LWW only pays when
            # keys actually repeat within the batch (update-heavy bursts).
            # When keys are mostly distinct the reduce is a full sort+copy
            # of the payload for nothing — measured as the second-largest
            # memory-traffic term. n_events carries absorbed raw counts.
            dup = flat.num_rows - np.unique(h).size
            if dup > 0.1 * flat.num_rows:
                if "__dlq_reason" in flat.column_names and \
                        flat["__dlq_reason"].null_count < flat.num_rows:
                    # poison rows must reach the DLQ one-for-one — the
                    # batch-local combiner may only absorb CLEAN rows
                    # (a later clean version would otherwise swallow a
                    # poison event before it could be routed)
                    is_p = pc.is_valid(flat["__dlq_reason"])
                    clean = lww_reduce(flat.filter(pc.invert(is_p)),
                                       count_col="n_events")
                    poison = flat.filter(is_p)
                    poison = poison.append_column(
                        "n_events",
                        pa.array(np.ones(poison.num_rows, np.int64)))
                    flat = pa.concat_tables([clean, poison])
                else:
                    flat = lww_reduce(flat, count_col="n_events")
                h = key_hash(flat["repo"], flat["path"])
            else:
                flat = flat.append_column(
                    "n_events", pa.array(np.ones(flat.num_rows, np.int64)))
            pid = (h % np.uint64(cfg.num_partitions)).astype(np.int32)
            # salt from higher hash bits: same key ⇒ same salt, so a hot
            # partition can be merged per-salt in parallel (two-level LWW
            # is exact because salt sub-groups never share keys)
            salt = ((h // np.uint64(cfg.num_partitions))
                    % np.uint64(cfg.salt_buckets)).astype(np.int32)
            flat = flat.append_column("partition_id", pa.array(pid))
            return flat.append_column("salt", pa.array(salt))

        if spill_fn is None:
            # retriable errors re-run the task; anything else is fatal
            return ds.map_batches(transform, batch_format="pyarrow",
                                  zero_copy_batch=True,
                                  retry_exceptions=[RetriableError])

        if cfg.source == "synth":
            # full fusion: synthesize + transform + spill inside one task.
            # Synthesis is chunked at cfg.batch_size (bounds string-build
            # memory for fat profiles) but the task spills ONCE over the
            # concatenated chunks, so the staged-run file geometry is
            # identical to the unfused plan's.
            from cdcsdk_server_ray.sources.changelog import (
                changelog_range_source, synth_envelope_batch)
            src = changelog_range_source(cfg.synth, lo, hi,
                                         batch_size=cfg.batch_size)
            synth_cfg, bs = cfg.synth, cfg.batch_size

            def fused(batch: pa.Table) -> pa.Table:
                tune_process_memory()
                lsns = batch["id"].to_numpy() + lo
                outs = []
                for i in range(0, len(lsns), bs):
                    ev = synth_envelope_batch(synth_cfg, lsns[i:i + bs],
                                              yb_wrap=True)
                    out = transform(ev)
                    if out.num_rows:
                        outs.append(out)
                if not outs:
                    # e.g. the range source's 1-row remainder block past
                    # max_lsn — unfused plans dropped empty blocks
                    # between operators; the fused task guards instead
                    return pa.table({"rows": pa.array([0], pa.int64())})
                return spill_fn(pa.concat_tables(outs))
        else:
            # partial fusion: the parquet read stays a read task; the
            # transform + spill pair runs fused on its output blocks
            src = ds

            def fused(batch: pa.Table) -> pa.Table:
                tune_process_memory()
                out = transform(batch)
                if not out.num_rows:
                    return pa.table({"rows": pa.array([0], pa.int64())})
                return spill_fn(out)

        return src.map_batches(fused, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None,
                               num_cpus=cfg.spill_num_cpus,
                               retry_exceptions=[RetriableError])

    def apply_window(self, manifest: Manifest, window_id: int,
                     lo: int, hi: int) -> list[dict]:
        """Run one window through the hash exchange + apply; returns
        lineage rows. Fragments are staged but NOT yet committed (phase 1).

        Two exchange implementations (cfg.exchange):

        - "staged" (default): map tasks spill their output split by
          partition_id into hive-partitioned parquet runs under
          ``_staging/w<window>/``; then ONE reader task per partition
          merges its runs (fence → final LWW → fragment). This is the
          physical shape of every production shuffle (map-side spill +
          reduce-side merge) and of the reference's own staging buffers
          (RollingOutputStream → S3 object, S3ChangeConsumer.java:123-150);
          on a cluster the staging dir is shared storage. Measured ~8x
          faster than the in-memory sort exchange on this workload
          (string-heavy payloads) and it never holds the window in the
          object store.
        - "groupby": ray.data ``groupby(partition_id).map_groups`` — the
          Dataset-native AllToAll (sort-based).

        Replay safety: the window's staging dir is wiped before the run,
        and final fragment bytes depend only on the event set (winners are
        key-sorted), so both paths produce byte-identical fragments.
        """
        if self.cfg.exchange == "groupby":
            ds = self.window_dataset(lo, hi)
            apply_fn = _make_apply_fn(self.cfg.lake_dir, window_id, lo, hi,
                                      manifest.watermarks(),
                                      staged=self.cfg.checkpointing)
            lineage = ds.groupby("partition_id").map_groups(
                apply_fn, batch_format="pyarrow")
            return lineage.take_all()  # one small row per touched partition
        staging = self._spill_window(window_id, lo, hi)
        return self._merge_window(manifest, window_id, lo, hi, staging)

    def _spill_dataset(self, window_id: int, lo: int, hi: int):
        """Lazy phase A — map-side spill: synth/read + transform +
        hash-split runs under _staging/w<window>/. Returns (staging_dir,
        unconsumed Dataset of per-task row counts)."""
        import shutil

        import pyarrow.dataset as pads

        root = self.cfg.staging_root or os.path.join(self.cfg.lake_dir, "_staging")
        staging = os.path.join(root, f"w{window_id:09d}")
        shutil.rmtree(staging, ignore_errors=True)
        os.makedirs(staging, exist_ok=True)
        # spill splits by partition only — salt stays a column. Hot
        # partitions are the exception; paying S× redundant decode on just
        # those beats 8× more (tiny) spill files on every partition.
        part_scheme = pads.partitioning(
            pa.schema([("partition_id", pa.int32())]), flavor="hive")
        compression = self.cfg.spill_compression

        def spill(batch: pa.Table) -> pa.Table:
            tune_process_memory()
            # run name keyed by the batch's min lsn: unique (lsns are
            # unique) and stable enough for staging, which is wiped on
            # replay anyway — truth lives in fragments + manifest
            # (write options built here: the options object isn't picklable)
            mn = int(pc.min(batch["lsn"]).as_py())
            pads.write_dataset(batch, staging, format="parquet",
                               partitioning=part_scheme,
                               basename_template=f"run-{mn}-{{i}}.parquet",
                               existing_data_behavior="overwrite_or_ignore",
                               file_options=pads.ParquetFileFormat()
                               .make_write_options(compression=compression))
            return pa.table({"rows": pa.array([batch.num_rows], pa.int64())})

        # FUSED map side: source → transform → spill in one task (see
        # window_dataset) — the window payload never enters the object
        # store; only the 1-row counts do
        return staging, self.window_dataset(lo, hi, spill_fn=spill)

    def _spill_window(self, window_id: int, lo: int, hi: int) -> str:
        staging, spilled = self._spill_dataset(window_id, lo, hi)
        # consume the 1-row-per-task counts with the cheapest barrier:
        # iterating ref bundles skips take_all's batch-iterator machinery
        # (~0.3s/execution measured) and .sum("rows") would be an AllToAll
        # Aggregate with seconds of fixed planner cost at tail-window scale
        for _ in spilled.iter_internal_ref_bundles():
            pass
        return staging

    def _plan_merge_tasks(self, staging: str) -> list[dict]:
        """Merge planning with hot-partition salting (bounded partition
        sizes, SURVEY.md §4): a partition whose staged bytes exceed the
        bound is merged per-salt — parallel tasks, one fragment per salt;
        same key ⇒ same salt makes the split exact for LWW."""
        def _dir_bytes(d):
            return sum(os.path.getsize(os.path.join(r, f))
                       for r, _, fs in os.walk(d) for f in fs)

        tasks = []
        for pid in range(self.cfg.num_partitions):
            pdir = os.path.join(staging, f"partition_id={pid}")
            if not os.path.isdir(pdir):
                continue
            if _dir_bytes(pdir) > self.cfg.hot_partition_bytes:
                for s in range(self.cfg.salt_buckets):
                    tasks.append({"pid": pid, "salt": s, "dirs": [pdir]})
            else:
                tasks.append({"pid": pid, "salt": -1, "dirs": [pdir]})
        return tasks

    def _make_merge_apply(self, apply_fn):
        import pyarrow.parquet as pq

        def merge_apply(batch: pa.Table) -> pa.Table:
            tune_process_memory()
            # single-threaded Arrow per task: the pool size is governed by
            # merge_num_cpus, not by nested arrow threads. Restored in the
            # finally so the long-lived worker's pool isn't left at 1 for
            # unrelated tasks scheduled onto it later.
            prev_cpus = pa.cpu_count()
            pa.set_cpu_count(1)
            try:
                outs = []
                for i in range(batch.num_rows):
                    pid = int(batch["pid"][i].as_py())
                    salt = int(batch["salt"][i].as_py())
                    runs = []
                    for d in batch["dirs"][i].as_py():
                        runs.extend(
                            pq.read_table(os.path.join(d, f), use_threads=False)
                            for f in sorted(os.listdir(d)))
                    t = pa.concat_tables(runs, promote_options="permissive")
                    if salt >= 0:
                        t = t.filter(pc.equal(t["salt"], salt))
                    if t.num_rows == 0:
                        continue
                    import numpy as _np
                    t = t.append_column(
                        "partition_id",
                        pa.array(_np.full(t.num_rows, pid, _np.int32())))
                    outs.append(apply_fn(t, salt=None if salt < 0 else salt))
                if not outs:
                    return LINEAGE_SCHEMA.empty_table()
                return pa.concat_tables(outs)
            finally:
                pa.set_cpu_count(prev_cpus)

        return merge_apply

    def _fused_window(self, watermarks: dict[int, int], window_id: int,
                      lo: int, hi: int):
        """One window = two MAP-ONLY Dataset executions: spill (consumed
        via take_all over its 1-row-per-task counts — the barrier) →
        driver-side merge planning (an O(partitions) staging listdir) →
        from_items merge/apply. Round 3 fused these into one execution
        with two Repartition exchanges as the barrier/fan-out; measured
        on the 250k-LSN tail geometry, the two AllToAll operators cost
        MORE fixed time than a second map-only execution (means 1.8-2.5 s
        vs 1.4-2.0 s per window) — all-to-alls carry planner overhead
        even over 8 tiny rows, while map-only plans don't.

        Returns a zero-arg callable that EXECUTES the window and returns
        lineage rows — spill construction (source path resolution, lazy
        fsspec imports) happens here on the calling thread; the merge
        dataset is built inside execute() (possibly on a pool thread),
        which is safe because its inputs are driver-local items and its
        parquet reads happen inside tasks, not via driver fsspec."""
        import shutil

        import ray as _ray

        staging, spilled = self._spill_dataset(window_id, lo, hi)
        apply_fn = _make_apply_fn(self.cfg.lake_dir, window_id, lo, hi,
                                  watermarks, staged=self.cfg.checkpointing)
        merge_apply = self._make_merge_apply(apply_fn)
        plan_fn = self._plan_merge_tasks
        total_cpus = int(_ray.cluster_resources().get("CPU", 1) or 1)
        merge_cpus = min(self.cfg.merge_num_cpus, total_cpus)

        def execute() -> list[dict]:
            import ray.data
            for _ in spilled.iter_internal_ref_bundles():
                pass                     # map-only spill leg + barrier
            tasks = plan_fn(staging)
            if not tasks:
                shutil.rmtree(staging, ignore_errors=True)
                return []
            rows = (ray.data.from_items(tasks)
                    .map_batches(merge_apply, batch_format="pyarrow",
                                 batch_size=1, num_cpus=merge_cpus)
                    .take_all())
            shutil.rmtree(staging, ignore_errors=True)
            return rows

        return execute

    def _merge_window(self, manifest: Manifest, window_id: int,
                      lo: int, hi: int, staging: str) -> list[dict]:
        """Phase B — reduce-side merge: per-partition (or per-salt) fence →
        final LWW → fragment staging; returns lineage rows."""
        import shutil

        import ray.data

        apply_fn = _make_apply_fn(self.cfg.lake_dir, window_id, lo, hi,
                                  manifest.watermarks(),
                                  staged=self.cfg.checkpointing)
        tasks = self._plan_merge_tasks(staging)
        if not tasks:
            return []
        merge_apply = self._make_merge_apply(apply_fn)

        import ray as _ray
        total_cpus = int(_ray.cluster_resources().get("CPU", 1) or 1)
        lineage = ray.data.from_items(tasks).map_batches(
            merge_apply, batch_format="pyarrow", batch_size=1,
            num_cpus=min(self.cfg.merge_num_cpus, total_cpus))
        rows = lineage.take_all()
        shutil.rmtree(staging, ignore_errors=True)
        return rows

    # ---- initial snapshot (≙ cdcsdk.source.snapshot.mode=initial) ---------
    def bootstrap_snapshot(self) -> Manifest:
        """Consistent initial snapshot before streaming (reference:
        ``cdcsdk.source.snapshot.mode`` README.md:138 — the Debezium
        snapshot-then-stream contract). Bulk-loads the source table
        straight into per-partition fragments in ONE embarrassingly-
        parallel pass: every read block hash-splits its rows and writes
        them as fragments directly — NO exchange, no envelope chain, no
        LWW (snapshot keys are distinct by construction), no per-event
        fence. Rows carry ``op='r'`` (Debezium's snapshot-read marker).
        The committed watermark is set to the snapshot LSN horizon, so
        ``run()`` streams only changelog events AFTER the snapshot and
        the fence makes any replayed snapshot-range event a no-op.

        At 100 TB this is the right bootstrap shape: the table scan is
        the whole cost; merge-on-read tolerates many small fragments and
        ``compact()`` (or rolling compaction) folds them into one base
        per partition afterwards.

        Refuses on a lake with committed state — a second snapshot would
        fork history (mirrors the reference running a snapshot at most
        once per stream id)."""
        import numpy as np
        import ray.data

        from cdcsdk_server_ray.sources.source_table import (OFFSET,
                                                            _round_events)
        from cdcsdk_server_ray.stages.partition import key_hash

        cfg = self.cfg
        if cfg.source != "table":
            raise ValueError("snapshot bootstrap requires source='table'")
        if not cfg.checkpointing:
            raise ValueError(
                "snapshot bootstrap requires checkpointing=True: the "
                "snapshot watermark must be durable or a restart would "
                "re-stream the snapshot range (stateless mode replays "
                "from scratch by design)")
        if load_current_manifest(cfg.lake_dir,
                                 backend=cfg.offset_backend) is not None:
            raise RuntimeError(
                f"bootstrap_snapshot refused: lake at {cfg.lake_dir} "
                "already has committed state (a snapshot runs at most "
                "once per lake)")

        lake_dir = cfg.lake_dir
        staged = True    # checkpointing=True is enforced above
        P = cfg.num_partitions

        ds = ray.data.read_parquet(
            cfg.source_table, columns=["doc_id", "text", "lang", "source"])

        def snap(batch: pa.Table) -> pa.Table:
            ev = _round_events(batch, 0)     # lsn = doc_id + 1
            n = ev.num_rows
            if n == 0:
                return LINEAGE_SCHEMA.empty_table()
            ev = ev.set_column(ev.column_names.index("op"), "op",
                               pa.array(["r"] * n))
            h = key_hash(ev["repo"], ev["path"])
            pid = (h % np.uint64(P)).astype(np.int32)
            mn = int(pc.min(ev["lsn"]).as_py())
            rows = []
            for p in np.unique(pid):
                sub = ev.filter(pa.array(pid == p))
                # name carries a content-derived salt as well as the
                # block-min lsn: block-min alone relies on blocks holding
                # disjoint doc_id sets — if the source table ever carries
                # duplicate doc_ids, two blocks can share a min and one
                # partition's staged fragment would silently overwrite
                # another's (rows lost). crc32 of the sub-block's lsn
                # vector is deterministic under replay (pure function of
                # content), so idempotent overwrite is preserved.
                csalt = _content_salt(sub)
                frag = lake_mod.delta_path(lake_dir, int(p), 0, mn,
                                           salt=csalt)
                # fsync=False: one os.sync() below replaces per-file
                # fsync (journal-serialized at this fan-out — see
                # write_fragment)
                nbytes = lake_mod.write_fragment(sub, frag, staged=staged,
                                                 fsync=False)
                rows.append(lineage_row(
                    partition_id=int(p), window_id=0, window_lo_lsn=1,
                    window_hi_lsn=OFFSET + 1,
                    events_applied=sub.num_rows, dedup_drops=0,
                    bytes_written=nbytes, keys_touched=sub.num_rows,
                    fragment=lake_mod.relpath(lake_dir, frag)))
            return pa.Table.from_pylist(rows, schema=LINEAGE_SCHEMA)

        # batch_size=None → one task per read block: snapshot parallelism
        # tracks the file forest (a fixed batch_size would BUNDLE small
        # blocks into few tasks and cap the load at batch-count tasks);
        # fragment granularity follows block size, and compact() folds
        # the per-block fragments into one base per partition
        lineage = ds.map_batches(snap, batch_format="pyarrow",
                                 batch_size=None).take_all()
        manifest = self.manifest()           # fresh (guard above)
        append_lineage(cfg.lake_dir, 0, 1, lineage)
        frags = []
        for r in lineage:
            ps = manifest.partition(int(r["partition_id"]))
            ps.events_applied += int(r["events_applied"])
            ps.bytes_written += int(r["bytes_written"])
            ps.keys_touched += int(r["keys_touched"])
            ps.fragments.append(r["fragment"])
            frags.append(r["fragment"])
        # watermark = the whole snapshot LSN range: streaming resumes at
        # OFFSET + 1 (round 1) and the fence no-ops any replayed
        # snapshot-range event
        manifest.committed_lsn = OFFSET
        for pid in range(P):
            manifest.partition(pid).committed_lsn = OFFSET
        # single bulk flush for every unsynced fragment written above —
        # must land before the manifest references them (checkpointing
        # is enforced True at entry, so the commit is unconditional)
        os.sync()
        prev = manifest.epoch
        manifest.epoch += 1
        commit_manifest(cfg.lake_dir, manifest,
                        expected_prev_epoch=prev, publish=frags,
                        backend=cfg.offset_backend)
        return manifest

    # ---- incremental (ad-hoc) snapshot — DBLog chunk interleave ----------
    # reserved window-id space for chunk fragments/lineage: far above any
    # real window id ((lo-1)//window_lsns ≤ max_lsn/window_lsns ≪ 1e9), so
    # chunk fragment names can never collide with stream-window deltas
    SNAPSHOT_WINDOW_BASE = 1_000_000_000

    def _incremental_geometry(self) -> tuple[int, int]:
        """(d_min, total_chunks) for the configured chunk width — planned
        from parquet row-group statistics (O(metadata), no data read)."""
        if self._snap_geom is None:
            from cdcsdk_server_ray.sources.source_table import \
                table_doc_id_bounds
            d_min, d_max = table_doc_id_bounds(self.cfg.source_table)
            c = self.cfg.snapshot_chunk_rows
            self._snap_geom = (d_min, (d_max - d_min) // c + 1)
        return self._snap_geom

    def _snapshot_chunk(self, chunk_id: int, d_min: int,
                        n_chunks: int = 1) -> list[dict]:
        """Read a bounded doc_id SPAN of the source table (predicate
        pushdown — only the span's row groups leave storage) and write it
        as staged per-partition op='r' fragments.

        ``n_chunks`` chunks are read in ONE Dataset execution (the ~0.2 s
        fixed cost per bounded execution dominated the drain phase at one
        chunk per execution — measured 9.73 s for 43 chunks at sf0.1).
        Fragment/lineage identity stays PER CHUNK: rows are grouped by
        their chunk id inside the batch, so each chunk still gets its own
        reserved window id, fragment names and lineage rows, and
        ``snapshot_chunks_done`` remains the only progress unit — a crash
        mid-span resumes at the committed chunk boundary with identical
        per-chunk semantics.

        DBLog's chunk/event dedup rule, expressed as pure LWW ordering:
        the snapshot-read row carries ``lsn = doc_id`` — one below the
        key's round-0 insert event (lsn = doc_id + 1) — so ANY streamed
        event for the key (before or after the chunk read) wins the
        merge-on-read LWW, while keys the stream never delivered backfill
        from the chunk. No watermark window bookkeeping is needed because
        the lake merge is order-insensitive: LWW over {chunk row, events}
        is associative, which is exactly why the chunk can interleave at
        any point of the stream. (Debezium incremental snapshots /
        Netflix DBLog; the reference inherits the Debezium engine.)

        Fragments are STAGED and become visible only inside the fenced
        manifest commit that also advances ``snapshot_chunks_done`` —
        chunk data and chunk progress are atomic together, so replay
        after a crash rewrites the same chunk byte-identically."""
        import numpy as np
        import pyarrow.dataset as pads
        import ray.data

        from cdcsdk_server_ray.sources.source_table import _round_events
        from cdcsdk_server_ray.stages.partition import key_hash

        cfg = self.cfg
        lake_dir = cfg.lake_dir
        P = cfg.num_partitions
        c = cfg.snapshot_chunk_rows
        lo_id = d_min + chunk_id * c
        hi_id = d_min + (chunk_id + n_chunks) * c
        base_win = self.SNAPSHOT_WINDOW_BASE
        filt = (pads.field("doc_id") >= lo_id) & (pads.field("doc_id") < hi_id)
        ds = ray.data.read_parquet(
            cfg.source_table, columns=["doc_id", "text", "lang", "source"],
            filter=filt)

        def snap(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return LINEAGE_SCHEMA.empty_table()
            ev = _round_events(batch, 0)          # lsn = doc_id + 1
            lsn = pc.subtract(ev["lsn"], 1)       # snapshot rank: doc_id
            names = ev.column_names
            ev = ev.set_column(names.index("lsn"), "lsn", lsn)
            ev = ev.set_column(names.index("tx_id"), "tx_id",
                               pc.divide(lsn, 64))
            ev = ev.set_column(names.index("op"), "op",
                               pa.array(["r"] * ev.num_rows))
            h = key_hash(ev["repo"], ev["path"])
            pid = (h % np.uint64(P)).astype(np.int32)
            # chunk identity per row (lsn == doc_id): one batch of a span
            # read may straddle chunk boundaries — fragments/lineage stay
            # per chunk so span width never changes on-disk identity
            lsn_np = ev["lsn"].to_numpy()
            ck = (lsn_np - d_min) // c
            rows = []
            for cid in np.unique(ck):
                cmask = ck == cid
                cev = ev.filter(pa.array(cmask))
                cpid = pid[cmask]
                win = base_win + int(cid)
                c_lo = d_min + int(cid) * c
                mn = int(pc.min(cev["lsn"]).as_py())
                for p in np.unique(cpid):
                    sub = cev.filter(pa.array(cpid == p))
                    # content-derived salt guards against duplicate doc_ids
                    # giving two blocks the same min lsn (see
                    # bootstrap_snapshot.snap) — deterministic under replay
                    csalt = _content_salt(sub)
                    frag = lake_mod.delta_path(lake_dir, int(p), win, mn,
                                               salt=csalt)
                    nbytes = lake_mod.write_fragment(sub, frag, staged=True)
                    rows.append(lineage_row(
                        partition_id=int(p), window_id=win,
                        window_lo_lsn=c_lo, window_hi_lsn=c_lo + c,
                        events_applied=sub.num_rows, dedup_drops=0,
                        bytes_written=nbytes, keys_touched=sub.num_rows,
                        fragment=lake_mod.relpath(lake_dir, frag)))
            return pa.Table.from_pylist(rows, schema=LINEAGE_SCHEMA)

        return ds.map_batches(snap, batch_format="pyarrow",
                              batch_size=None).take_all()

    def _maybe_snapshot_chunk(self, manifest: Manifest,
                              max_chunks: int = 1) -> bool:
        """Process up to ``max_chunks`` pending incremental-snapshot
        chunks in ONE bounded Dataset execution, riding the stream's
        commit cadence (one chunk per window while streaming,
        Debezium-style interleave; a wider span when the stream is idle —
        see cfg.snapshot_drain_chunks). Returns False when the snapshot
        is complete.

        Chunk geometry is a fenced per-lake invariant (like
        num_partitions / offset_backend): ``snapshot_chunks_done`` counts
        chunks of the ORIGINAL width, so resuming a mid-flight snapshot
        under a wider cfg.snapshot_chunk_rows would shrink ``total`` and
        silently declare the snapshot complete without backfilling the
        remaining keys. The first chunk's commit pins (width, d_min,
        total) in the manifest; a resume whose cfg disagrees REFUSES."""
        cfg = self.cfg
        if manifest.snapshot_complete:
            return False
        if manifest.snapshot_chunk_rows:
            if cfg.snapshot_chunk_rows != manifest.snapshot_chunk_rows:
                raise ValueError(
                    "lake's incremental snapshot was planned with "
                    f"snapshot_chunk_rows={manifest.snapshot_chunk_rows}; "
                    f"config says {cfg.snapshot_chunk_rows} — chunk "
                    "geometry is fixed per lake (chunk ids index ranges "
                    "of the original width)")
            d_min, total = (manifest.snapshot_d_min,
                            manifest.snapshot_total_chunks)
        else:
            if manifest.snapshot_chunks_done \
                    and not cfg.snapshot_resume_legacy_assume_cfg_width:
                # legacy manifest (progress without pinned geometry): the
                # original width is unknowable, so a differing cfg can't
                # be detected — refuse rather than risk silent data loss.
                # The migration path is a single operator-checkable fact:
                # assert that cfg.snapshot_chunk_rows IS the original
                # width (read it off the old deploy config). Geometry is
                # then pinned from cfg and the normal complete-or-
                # continue logic below takes over — a completed legacy
                # snapshot short-circuits, a mid-flight one RESUMES.
                # (A completeness INFERENCE from totals recomputed under
                # the current width is unsound: a wider cfg shrinks the
                # total and would declare a mid-flight backfill complete.
                # Under a false width assertion, a narrower-than-original
                # width re-emits rows — harmless, LWW is idempotent — but
                # a wider one skips rows; hence the explicit assertion.)
                raise ValueError(
                    "lake has incremental-snapshot progress "
                    f"({manifest.snapshot_chunks_done} chunks) but no "
                    "pinned chunk geometry (legacy manifest) — cannot "
                    "verify cfg.snapshot_chunk_rows matches the original "
                    "width; restore the original config and set "
                    "snapshot_resume_legacy_assume_cfg_width to adopt it")
            d_min, total = self._incremental_geometry()
            manifest.snapshot_chunk_rows = cfg.snapshot_chunk_rows
            manifest.snapshot_d_min = d_min
            manifest.snapshot_total_chunks = total
        chunk = manifest.snapshot_chunks_done
        if chunk >= total:
            # completion is recorded distinctly from progress so future
            # resumes (including after manifest-format migrations) need
            # no geometry re-derivation; forcing a pending commit makes
            # the flag durable (migrates pre-flag lakes on first resume)
            manifest.snapshot_complete = True
            self._pending_commits = max(self._pending_commits, 1)
            return False
        span = max(1, min(int(max_chunks), total - chunk))
        rows = self._snapshot_chunk(chunk, d_min, span)
        # lineage stays PER CHUNK regardless of span width — group the
        # span's rows back to their chunk's reserved window id
        by_win: dict[int, list[dict]] = {}
        for r in rows:
            by_win.setdefault(int(r["window_id"]), []).append(r)
        for win in sorted(by_win):
            append_lineage(cfg.lake_dir, win,
                           win - self.SNAPSHOT_WINDOW_BASE, by_win[win])
        for r in rows:
            ps = manifest.partition(int(r["partition_id"]))
            ps.events_applied += int(r["events_applied"])
            ps.bytes_written += int(r["bytes_written"])
            ps.keys_touched += int(r["keys_touched"])
            ps.fragments.append(r["fragment"])
            self._staged_frags.append(r["fragment"])
        manifest.snapshot_chunks_done = chunk + span
        if chunk + span >= total:
            # completion rides the SAME commit as the final chunk — no
            # extra epoch bump, and a resume short-circuits on the flag
            manifest.snapshot_complete = True
        # each chunk counts one window toward the periodic commit policy,
        # exactly as the one-chunk-per-execution path did
        self._pending_commits += span
        if self._pending_commits >= cfg.commit_every_windows:
            self._commit_pending(manifest)
        return True

    # ---- the loop --------------------------------------------------------
    def _window_view_deltas(self, lo: int, hi: int) -> dict:
        """Per-lang view deltas for lsn ∈ [lo, hi) — one bounded
        map-only Dataset execution (range → pure-function deltas →
        ≤ |langs| partial rows per block, folded here). Synth source:
        sources/changelog.synth_view_deltas (before-images, no-op
        deletes); table source: the REPLICA-IDENTITY-FULL changelog
        (sources/source_table.table_changelog_before_dataset) with the
        same f(after) − f(before) kernel the pipeline IVM uses."""
        if self.cfg.source == "table":
            from cdcsdk_server_ray.sources.source_table import                 table_changelog_before_dataset

            def tbl_partial(t: pa.Table) -> pa.Table:
                import numpy as np
                import pandas as pd
                df = t.to_pandas()
                a_len = (df["content"].str.len().fillna(0)
                         .astype("int64").to_numpy())
                b_len = (df["before_content"].str.len().fillna(0)
                         .astype("int64").to_numpy())
                op = df["op"].to_numpy()
                d_rows = np.where(op == "c", 1,
                                  np.where(op == "d", -1, 0))
                g = (pd.DataFrame({"lang": df["lang"].to_numpy(object),
                                   "d_rows": d_rows,
                                   "d_bytes": a_len - b_len})
                     .groupby("lang", sort=True).sum().reset_index())
                import numpy as _np
                return pa.table({
                    "lang": pa.array(g["lang"].to_numpy(object),
                                     pa.string()),
                    "d_rows": pa.array(
                        g["d_rows"].to_numpy(_np.int64)),
                    "d_bytes": pa.array(
                        g["d_bytes"].to_numpy(_np.int64))})

            ds = table_changelog_before_dataset(
                self.cfg.source_table, lo, hi,
                batch_size=self.cfg.batch_size)
            pf = ds.map_batches(tbl_partial,
                                batch_format="pyarrow").to_pandas()
            out: dict[str, list[int]] = {}
            if not pf.empty:
                for lang, g in pf.groupby("lang"):
                    out[str(lang)] = [int(g["d_rows"].sum()),
                                      int(g["d_bytes"].sum())]
            return out

        from cdcsdk_server_ray.sources.changelog import (
            changelog_range_source, synth_view_deltas)

        cfgs = self.cfg.synth

        def partial(t: pa.Table) -> pa.Table:
            # range source column is `id`; lsn = id + lo
            ids = t["id"].to_numpy()
            return synth_view_deltas(cfgs, ids + lo)

        ds = changelog_range_source(cfgs, lo, hi,
                                    batch_size=self.cfg.batch_size)
        pf = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        out: dict[str, list[int]] = {}
        for lang, g in pf.groupby("lang"):
            out[str(lang)] = [int(g["d_rows"].sum()),
                              int(g["d_bytes"].sum())]
        return out

    def current_view(self):
        """The incrementally-maintained per-lang view (committed windows
        only): DataFrame(lang, n_rows, content_bytes)."""
        import pandas as pd

        st = self.manifest().view_state()
        langs = sorted(st)
        return pd.DataFrame({
            "lang": langs,
            "n_rows": pd.Series([st[l][0] for l in langs], dtype="int64"),
            "content_bytes": pd.Series([st[l][1] for l in langs],
                                       dtype="int64")})

    def run(self, until_lsn: int | None = None,
            max_windows: int | None = None) -> Manifest:
        cfg = self.cfg
        if cfg.view_maintenance and cfg.source not in ("synth", "table"):
            # invalid combinations REFUSE, and BEFORE any source probe or
            # side effect (the repo-wide guards-first rule): the view's
            # before-images derive from a pure-function source (synth
            # generator or the documents-table changelog)
            raise ValueError("view_maintenance requires source='synth' "
                             f"or 'table'; got {cfg.source!r}")
        if until_lsn is not None:
            end = until_lsn
        elif cfg.source == "table":
            from cdcsdk_server_ray.sources.source_table import MAX_LSN
            end = MAX_LSN
        elif cfg.source == "parquet_changelog":
            from cdcsdk_server_ray.sources.parquet_changelog import \
                changelog_max_lsn
            end = changelog_max_lsn(cfg.source_table)
        else:
            end = cfg.synth.max_lsn
        # ALL config refusals fire BEFORE any side effect: the incremental-
        # snapshot guards used to run after bootstrap_snapshot(), so a fresh
        # lake configured with BOTH snapshot strategies got fully
        # bulk-loaded and committed before the 'mutually exclusive' error —
        # leaving behind exactly the forked-history state the guard exists
        # to prevent (a retry with incremental only would resume on top of
        # the bootstrap).
        if cfg.incremental_snapshot:
            # invalid combinations REFUSE (the repo-wide rule): a silent
            # no-snapshot stream would diverge from what the config asked
            if cfg.source != "table":
                raise ValueError("incremental_snapshot requires "
                                 f"source='table'; got {cfg.source!r}")
            if not cfg.checkpointing:
                raise ValueError(
                    "incremental_snapshot requires checkpointing=True: "
                    "chunk progress must be durable or a restart would "
                    "re-emit finished chunks")
            if cfg.snapshot_mode == "initial":
                raise ValueError(
                    "incremental_snapshot is mutually exclusive with "
                    "snapshot_mode='initial' — a lake gets ONE snapshot "
                    "strategy (both would double-load the table)")
        if cfg.snapshot_mode == "initial":
            if cfg.source != "table":
                # same refusal bootstrap_snapshot() itself makes — a
                # silent no-snapshot stream here would diverge from what
                # the config asked for (invalid combinations REFUSE)
                raise ValueError(
                    "snapshot_mode='initial' requires source='table'; "
                    f"got source={cfg.source!r}")
            if load_current_manifest(cfg.lake_dir,
                                     backend=cfg.offset_backend) is None:
                if until_lsn is not None and until_lsn <= end:
                    from cdcsdk_server_ray.sources.source_table import \
                        OFFSET as _SNAP_OFFSET
                    if until_lsn < _SNAP_OFFSET + 1:
                        # the snapshot is a CONSISTENT full-table copy;
                        # truncating it mid-range would commit a
                        # watermark past the requested bound
                        raise ValueError(
                            f"until_lsn={until_lsn} truncates the "
                            "initial snapshot (needs the full snapshot "
                            f"range, < {_SNAP_OFFSET + 1}); run without "
                            "snapshot_mode='initial' to stream a "
                            "truncated prefix")
                self.bootstrap_snapshot()
        manifest = self.manifest()
        w = cfg.window_lsns

        # plan the windows up front: resume from the first unapplied lsn;
        # windows align to lsn = 1 + k*w and the final one may be truncated
        # at `end`, so ids derive from `lo`, NOT committed_lsn // w (which
        # would replay a truncated window)
        windows: list[tuple[int, int, int]] = []
        lo = manifest.committed_lsn + 1
        while lo < end and (max_windows is None or len(windows) < max_windows):
            window_id = (lo - 1) // w
            hi = min((window_id + 1) * w + 1, end)
            windows.append((window_id, lo, hi))
            lo = hi

        self._pending_commits = 0
        self._windows_since_compact = 0
        self._staged_frags: list[str] = []
        self._windows_done = 0

        def finish(window_id: int, w_lo: int, w_hi: int, rows: list[dict]):
            if cfg.view_maintenance:
                # per-window view deltas: one bounded map-only execution
                # over the window's LSN range (pure function — immune to
                # the spill path's batch-local LWW collapse), stashed in
                # the manifest BEFORE the commit so the deltas ride the
                # same epoch fence as the offsets
                manifest.view_deltas[f"{window_id}:{w_lo}"] = \
                    self._window_view_deltas(w_lo, w_hi)
            append_lineage(cfg.lake_dir, window_id, w_lo, rows)
            for r in rows:
                ps = manifest.partition(int(r["partition_id"]))
                ps.events_applied += int(r["events_applied"])
                ps.dedup_drops += int(r["dedup_drops"])
                ps.bytes_written += int(r["bytes_written"])
                ps.keys_touched += int(r["keys_touched"])
                if r["fragment"]:
                    ps.fragments.append(r["fragment"])
                    self._staged_frags.append(r["fragment"])
                ps.dlq_drops += int(r.get("dlq_drops") or 0)
                if r.get("dlq_fragment"):
                    ps.dlq_fragments.append(r["dlq_fragment"])
                    self._staged_frags.append(r["dlq_fragment"])
            manifest.committed_lsn = w_hi - 1
            for pid in range(cfg.num_partitions):
                manifest.partition(pid).committed_lsn = w_hi - 1
            self._pending_commits += 1
            self._windows_done += 1
            # liveness marker for external probes (E10 — /q/health analogue)
            from cdcsdk_server_ray.health import write_heartbeat
            write_heartbeat(cfg.lake_dir, epoch=manifest.epoch,
                            committed_lsn=manifest.committed_lsn,
                            windows_done=self._windows_done)
            # ≙ OffsetCommitPolicy.periodic: commit every N windows;
            # checkpointing=False ≙ memory offset store ("stateless mode")
            if cfg.checkpointing and \
                    self._pending_commits >= cfg.commit_every_windows:
                self._commit_pending(manifest)
                self._windows_since_compact += 1
                # rolling auto-compaction keeps fragment counts (and thus
                # merge-on-read cost) bounded on long tails
                if cfg.compact_every_windows and \
                        self._windows_since_compact >= cfg.compact_every_windows:
                    compacted = self.compact()
                    manifest.epoch = compacted.epoch
                    manifest.partitions = compacted.partitions
                    self._windows_since_compact = 0
            # Debezium-style interleave: one snapshot chunk rides behind
            # each stream window, so backfill progresses WITHOUT stalling
            # the stream (leftover chunks drain after the window loop)
            if cfg.incremental_snapshot:
                self._maybe_snapshot_chunk(manifest)

        if cfg.exchange == "staged" and len(windows) > 1:
            # PIPELINED tail: each window is ONE fused Dataset execution
            # (spill → barrier → plan → merge); up to 2 windows run
            # concurrently so window w+1's spill overlaps window w's
            # bandwidth-throttled merge. Commits stay strictly ordered
            # (results consumed in window order on this thread). The
            # watermark snapshot taken at submit time is safe: forward
            # windows only carry LSNs above every watermark, and replayed
            # windows use the resume-time watermarks, which is exactly the
            # fence they need.
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor
            wm = manifest.watermarks()
            depth = max(1, cfg.pipeline_depth)
            with ThreadPoolExecutor(max_workers=depth) as pool:
                inflight: deque = deque()
                it = iter(windows)

                def submit(win):
                    # BUILD on this (main) thread, EXECUTE in the pool
                    execute = self._fused_window(wm, *win)
                    inflight.append((win, pool.submit(execute)))

                for _ in range(depth):
                    nxt = next(it, None)
                    if nxt:
                        submit(nxt)
                while inflight:
                    (w_id, w_lo, w_hi), fut = inflight.popleft()
                    rows = fut.result()
                    finish(w_id, w_lo, w_hi, rows)
                    nxt = next(it, None)
                    if nxt:
                        submit(nxt)
        else:
            for (window_id, w_lo, w_hi) in windows:
                rows = self.apply_window(manifest, window_id, w_lo, w_hi)
                finish(window_id, w_lo, w_hi, rows)

        if cfg.incremental_snapshot and max_windows is None:
            # stream idle → the snapshot keeps chunking to completion
            # (still committing on the periodic cadence inside). With
            # max_windows set (crash-simulation runs) we stop after the
            # interleaved chunks only, leaving the snapshot mid-flight —
            # exactly the resume point the chunk marker exists for.
            while self._maybe_snapshot_chunk(
                    manifest, max_chunks=cfg.snapshot_drain_chunks):
                pass
        if cfg.checkpointing and self._pending_commits:
            # final drain commit (≙ MTEngine.java:948-950)
            self._commit_pending(manifest)
        return manifest

    def _commit_pending(self, manifest: Manifest) -> None:
        """The ONE epoch-bump + fenced commit + staged-state reset used by
        both the periodic commit policy and the final drain."""
        prev_epoch = manifest.epoch
        manifest.epoch += 1
        commit_manifest(self.cfg.lake_dir, manifest,
                        expected_prev_epoch=prev_epoch,
                        publish=self._staged_frags,
                        backend=self.cfg.offset_backend)
        self._staged_frags = []
        self._pending_commits = 0

    # ---- views -----------------------------------------------------------
    def current_state(self, drop_tombstones: bool = True, manifest=None):
        """Merge-on-read current-state view of the lake (a Dataset).
        Pass ``manifest`` explicitly in stateless mode (nothing durable
        points at the fragments)."""
        return lake_mod.read_current_state(
            self.cfg.lake_dir, manifest or self.manifest(),
            drop_tombstones=drop_tombstones)

    def current_dlq(self, manifest=None):
        """The committed dead-letter stream as a Dataset (every poison
        event with its ``dlq_reason``, exactly once): reads only the
        dlq fragments the manifest has fenced-committed — a crashed
        uncommitted window's staged dlq files are invisible here and
        get overwritten byte-identically on replay."""
        import ray.data
        m = manifest or self.manifest()
        rels: list[str] = []
        for pid in sorted(m.partitions):
            rels.extend(m.partitions[pid].dlq_fragments)
        paths = [lake_mod.resolve_fragment(
            os.path.join(self.cfg.lake_dir, r)) for r in rels]
        if not paths:
            return ray.data.from_items([])
        return ray.data.read_parquet(paths)

    def compact(self) -> Manifest:
        """Merge each partition's fragments into a single base fragment and
        commit a new epoch referencing only the bases (≙ the downstream
        compaction the reference's insert-only S3 layout implies).

        Destructive-maintenance guards (compaction ends in fragment GC):
        - refuses when no COMMITTED manifest exists — a stateless lake
          (checkpointing=False) or one opened under the wrong
          offset_backend would otherwise present an empty manifest whose
          commit+GC deletes every fragment on disk;
        - the commit carries ``expected_prev_epoch`` so a concurrent
          writer's commit between our load and our commit fences us out
          (StaleWriterError) instead of being silently overwritten and
          then having its fresh fragments GC'd;
        - GC is skipped when the pre-compact manifest referenced zero
          fragments (nothing was compacted, so nothing can be orphaned).
        """
        import ray.data

        if load_current_manifest(self.cfg.lake_dir,
                                 backend=self.cfg.offset_backend) is None:
            raise RuntimeError(
                f"compact() refused: no committed manifest at "
                f"{self.cfg.lake_dir} (backend={self.cfg.offset_backend!r})"
                " — stateless lake or wrong offset_backend; compaction+GC"
                " here would delete unreferenced committed data")
        manifest = self.manifest()
        observed_epoch = manifest.epoch
        pre_compact_frags = bool(manifest.all_fragments())
        lake_dir = self.cfg.lake_dir
        new_epoch = manifest.epoch + 1
        frags = lake_mod.partition_fragments(manifest, lake_dir)
        items = [{"pid": pid, "paths": paths}
                 for pid, paths in sorted(frags.items()) if paths]
        if items:
            def compact_one(batch: pa.Table) -> pa.Table:
                import pyarrow.parquet as pq
                out = []
                for i in range(batch.num_rows):
                    pid = int(batch["pid"][i].as_py())
                    paths = batch["paths"][i].as_py()
                    merged = merge_tables_lww([pq.read_table(p) for p in paths])
                    # keep tombstones out of the base: a base is complete
                    # history-to-date, so a deleted key can simply vanish
                    merged = drop_deleted(merged)
                    if merged.num_rows == 0:
                        # fully-tombstoned partition: no base at all — a
                        # staged file here would never be published and
                        # would accumulate as permanent orphan garbage
                        out.append({"pid": pid, "rows": 0, "bytes": 0,
                                    "fragment": ""})
                        continue
                    path = lake_mod.base_path(lake_dir, pid, new_epoch)
                    nbytes = lake_mod.write_fragment(merged, path, staged=True)
                    out.append({"pid": pid, "rows": merged.num_rows,
                                "bytes": nbytes,
                                "fragment": lake_mod.relpath(lake_dir, path)})
                return pa.Table.from_pylist(out)

            results = ray.data.from_items(items).map_batches(
                compact_one, batch_format="pyarrow", batch_size=1).take_all()
            bases = []
            for r in results:
                ps = manifest.partition(int(r["pid"]))
                ps.fragments = [r["fragment"]] if r["rows"] else []
                bases.extend(ps.fragments)
        else:
            bases = []
        manifest.epoch = new_epoch
        commit_manifest(self.cfg.lake_dir, manifest, publish=bases,
                        expected_prev_epoch=observed_epoch,
                        backend=self.cfg.offset_backend)
        if pre_compact_frags:
            self._gc_orphan_fragments(manifest)
        return manifest

    def _gc_orphan_fragments(self, manifest: Manifest) -> int:
        """Delete fragment files the committed manifest no longer
        references (superseded deltas and old bases), plus orphaned
        ``.staged`` / ``.tmp`` leftovers. Runs AFTER the compaction
        commit, so a crash mid-GC only leaves harmless garbage, never
        dangling references.

        Staged/tmp cleanup is AGE-GATED (> ``_GC_STAGED_AGE_S``): in the
        pipelined tail, window w+1 may be writing staged fragments on a
        pool thread while this runs for window w's commit — fresh staged
        files are in-flight and must survive; ones older than the gate
        can only be crashed/fenced-out attempts (replay rewrites them
        byte-identically anyway), and without cleanup they accumulate
        forever (GC used to skip every non-.parquet name).
        ≙ the object-lifecycle cleanup the reference's insert-only S3
        layout delegates to bucket policies (README.md:196-197)."""
        import time
        live = set(manifest.all_fragments())
        removed = 0
        now = time.time()
        for pid in range(self.cfg.num_partitions):
            pdir = lake_mod.fragment_dir(self.cfg.lake_dir, pid)
            if not os.path.isdir(pdir):
                continue
            for name in os.listdir(pdir):
                full = os.path.join(pdir, name)
                if name.endswith((".staged", ".tmp")):
                    try:
                        if now - os.path.getmtime(full) > _GC_STAGED_AGE_S:
                            os.unlink(full)
                            removed += 1
                    except FileNotFoundError:
                        pass               # published/cleaned concurrently
                    continue
                if not name.endswith(".parquet"):
                    continue
                rel = lake_mod.relpath(self.cfg.lake_dir, full)
                if rel not in live:
                    os.unlink(full)
                    removed += 1
        return removed
