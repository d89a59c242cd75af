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

import pyarrow as pa
import pyarrow.compute as pc

from cdcsdk_server_ray.config import EngineConfig
from cdcsdk_server_ray.sources.changelog import changelog_dataset
from cdcsdk_server_ray.stages.envelope import flatten_chain
from cdcsdk_server_ray.stages.lww import (drop_deleted, lww_reduce,
                                          merge_tables_lww)
from cdcsdk_server_ray.stages.partition import add_partition_column
from cdcsdk_server_ray.state import lake as lake_mod
from cdcsdk_server_ray.state.lineage import (LINEAGE_SCHEMA, append_lineage,
                                             lineage_row)
from cdcsdk_server_ray.state.manifest import (Manifest, commit_manifest,
                                              load_current_manifest)


def _make_apply_fn(lake_dir: str, window_id: int, window_lo: int,
                   window_hi: int, watermarks: dict[int, int]):
    """Per-partition apply: fence → final LWW → stage fragment → lineage.

    ≙ a sink consumer's handleBatch + the Roller's flush
    (S3ChangeConsumer.java:123-150) — but writing an LWW-reduced Parquet
    delta to a deterministic path instead of appending JSONL to a
    UUID-named object. Runs as a `groupby(partition_id).map_groups` task;
    the watermark fence makes redelivered events no-ops (exact dedup of
    at-least-once replay — SURVEY.md §2.5 "exact dedup").
    """

    def apply(group: pa.Table) -> pa.Table:
        pid = int(group["partition_id"][0].as_py())
        wm = watermarks.get(pid, 0)
        n_in = int(pc.sum(group["n_events"]).as_py() or 0)
        if wm:
            # the fence: redelivered (≤ watermark) events are no-ops; the
            # reference's at-least-once redelivery reaches the sink instead
            group = group.filter(pc.greater(group["lsn"], wm))
        applied = int(pc.sum(group["n_events"]).as_py() or 0)
        dedup_drops = n_in - applied
        winners = lww_reduce(group, count_col="n_events")
        frag = lake_mod.delta_path(lake_dir, pid, window_id)
        payload = winners.drop_columns(["partition_id", "n_events"])
        nbytes = lake_mod.write_fragment(payload, frag) if payload.num_rows else 0
        row = lineage_row(
            partition_id=pid, window_id=window_id,
            window_lo_lsn=window_lo, window_hi_lsn=window_hi,
            events_applied=applied, dedup_drops=dedup_drops,
            bytes_written=nbytes, keys_touched=winners.num_rows,
            fragment=lake_mod.relpath(lake_dir, frag) if payload.num_rows else None,
        )
        return pa.Table.from_pylist([row], schema=LINEAGE_SCHEMA)

    return apply


class CdcEngine:
    """Windowed driver loop (≙ MTEngine.run, ServerApp engine threads)."""

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg

    # ---- resume ----------------------------------------------------------
    def manifest(self) -> Manifest:
        m = load_current_manifest(self.cfg.lake_dir)
        if m is None:
            m = Manifest(num_partitions=self.cfg.num_partitions)
        elif m.num_partitions != self.cfg.num_partitions:
            raise ValueError(
                f"lake has {m.num_partitions} partitions; config says "
                f"{self.cfg.num_partitions} — P is fixed per lake (SURVEY.md §4)")
        return m

    # ---- one window ------------------------------------------------------
    def window_dataset(self, lo: int, hi: int):
        """events for lsn ∈ [lo, hi): synth (enveloped, YB-wrapped) →
        unwrap → flatten → batch-local partial LWW → partition column."""
        cfg = self.cfg
        ds = changelog_dataset(cfg.synth, lo, hi, mode="envelope",
                               yb_wrap=True, batch_size=cfg.batch_size)
        chain = flatten_chain(yb=True)

        def transform(batch: pa.Table) -> pa.Table:
            flat = chain(batch)
            # batch-local partial LWW: shrink before the shuffle (the
            # pre-aggregate/combiner pattern — LWW is associative);
            # n_events carries the absorbed raw-event count for lineage
            winners = lww_reduce(flat, count_col="n_events")
            return add_partition_column(winners, cfg.num_partitions)

        return ds.map_batches(transform, batch_format="pyarrow",
                              zero_copy_batch=True)

    def apply_window(self, manifest: Manifest, window_id: int,
                     lo: int, hi: int) -> list[dict]:
        """Run one window through shuffle + apply; returns lineage rows.
        Fragments are staged but NOT yet committed (phase 1)."""
        ds = self.window_dataset(lo, hi)
        apply_fn = _make_apply_fn(self.cfg.lake_dir, window_id, lo, hi,
                                  manifest.watermarks())
        lineage = ds.groupby("partition_id").map_groups(
            apply_fn, batch_format="pyarrow")
        return lineage.take_all()  # one small row per touched partition

    # ---- the loop --------------------------------------------------------
    def run(self, until_lsn: int | None = None,
            max_windows: int | None = None) -> Manifest:
        cfg = self.cfg
        end = until_lsn if until_lsn is not None else cfg.synth.max_lsn
        manifest = self.manifest()
        w = cfg.window_lsns
        window_id = manifest.committed_lsn // w  # windows align to lsn=1 + k*w
        done = 0
        pending_windows = 0
        while True:
            lo = window_id * w + 1
            if lo >= end or (max_windows is not None and done >= max_windows):
                break
            hi = min(lo + w, end)
            rows = self.apply_window(manifest, window_id, lo, hi)
            append_lineage(cfg.lake_dir, window_id, rows)
            for r in rows:
                ps = manifest.partition(int(r["partition_id"]))
                ps.events_applied += int(r["events_applied"])
                ps.dedup_drops += int(r["dedup_drops"])
                ps.bytes_written += int(r["bytes_written"])
                ps.keys_touched += int(r["keys_touched"])
                if r["fragment"]:
                    ps.fragments.append(r["fragment"])
            manifest.committed_lsn = hi - 1
            for pid in range(cfg.num_partitions):
                manifest.partition(pid).committed_lsn = hi - 1
            pending_windows += 1
            # ≙ OffsetCommitPolicy.periodic: commit every N windows
            if pending_windows >= cfg.commit_every_windows:
                manifest.epoch += 1
                commit_manifest(cfg.lake_dir, manifest)
                pending_windows = 0
            window_id += 1
            done += 1
        if pending_windows:  # final drain commit (≙ MTEngine.java:948-950)
            manifest.epoch += 1
            commit_manifest(cfg.lake_dir, manifest)
        return manifest

    # ---- views -----------------------------------------------------------
    def current_state(self, drop_tombstones: bool = True):
        """Merge-on-read current-state view of the lake (a Dataset)."""
        return lake_mod.read_current_state(
            self.cfg.lake_dir, self.manifest(), drop_tombstones=drop_tombstones)

    def compact(self) -> Manifest:
        """Merge each partition's fragments into a single base fragment and
        commit a new epoch referencing only the bases (≙ the downstream
        compaction the reference's insert-only S3 layout implies)."""
        import ray.data

        manifest = self.manifest()
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
                    path = lake_mod.base_path(lake_dir, pid, new_epoch)
                    nbytes = lake_mod.write_fragment(merged, path)
                    out.append({"pid": pid, "rows": merged.num_rows,
                                "bytes": nbytes,
                                "fragment": lake_mod.relpath(lake_dir, path)})
                return pa.Table.from_pylist(out)

            results = ray.data.from_items(items).map_batches(
                compact_one, batch_format="pyarrow", batch_size=1).take_all()
            for r in results:
                ps = manifest.partition(int(r["pid"]))
                ps.fragments = [r["fragment"]] if r["rows"] else []
        manifest.epoch = new_epoch
        commit_manifest(self.cfg.lake_dir, manifest)
        return manifest
