"""Checkpoint manifest — the engine's offset store, made exactly-once.

Reference analogue: the offset machinery in
MTEngine.java — ``OffsetStorageWriter`` staging (``:1007-1039``), the
two-step flush ``beginFlush → doFlush → task.commit`` with
cancel-on-failure (``:1098-1138``), pluggable memory/file/Kafka backends
(``:128-183``), and commit policies (always / periodic,
spi/OffsetCommitPolicy.java:30-59).

The rebuild strengthens at-least-once to exactly-once with the classic
lake recipe (SURVEY.md §7.5):

1. fragments are written to deterministic paths (no UUID/now(), unlike
   NamePatternResolver.java:33) — a retried/replayed window overwrites
   byte-identical files;
2. a manifest (JSON) listing every committed fragment + per-partition
   watermark is written to ``_checkpoints/manifest-{epoch}.json`` and
   fsynced;
3. the ``CURRENT`` pointer file is swapped atomically (``os.replace``).

A crash at any byte leaves the previous checkpoint intact; uncommitted
fragments are invisible garbage, overwritten on replay. Resume = read
CURRENT → next window starts at ``committed_lsn + 1``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field


@dataclass
class PartitionState:
    """≙ one sourcePartition → sourceOffset entry (MTEngine.java:809-812).

    Lineage counters ≙ Metrics.java:14-24 (recordsWritten/bytesWritten)
    plus dedup_drops, which the reference cannot count (it has no fence).
    """
    partition_id: int
    committed_lsn: int = 0          # the watermark: events ≤ this are applied
    fragments: list[str] = field(default_factory=list)  # lake-relative paths
    events_applied: int = 0
    dedup_drops: int = 0
    bytes_written: int = 0
    keys_touched: int = 0
    # dead-letter routing: poison events fenced + routed exactly-once;
    # dlq fragments commit through the SAME epoch fence as the deltas
    # (missing keys on pre-DLQ manifests default here — no migration)
    dlq_drops: int = 0
    dlq_fragments: list[str] = field(default_factory=list)


@dataclass
class Manifest:
    epoch: int = 0
    committed_lsn: int = 0          # global window high-water mark
    num_partitions: int = 0
    # windowing geometry is pinned per lake, like num_partitions: window
    # ids derive from (lo-1)//window_lsns, so rerunning with a different
    # width would remap ids onto existing fragment names. 0 = legacy
    # manifest (pre-pin) — fence disabled.
    window_lsns: int = 0
    # the offset backend this lake speaks, pinned like num_partitions: a
    # 'log' lake opened as 'file' loads as None (looks fresh) and a
    # subsequent compact()+GC would destroy committed fragments. "" =
    # legacy manifest (pre-pin) — the on-disk detect_backend() fence in
    # CdcEngine.manifest() still applies.
    offset_backend: str = ""
    # incremental-snapshot progress (DBLog chunk counter): chunks
    # [0, snapshot_chunks_done) are published; committed through the same
    # epoch fence as window offsets so crash/resume never re-emits a
    # finished chunk. 0 = no incremental snapshot ran (legacy manifests
    # load as 0 via from_json's default).
    snapshot_chunks_done: int = 0
    # snapshot geometry is pinned per lake, like num_partitions:
    # snapshot_chunks_done counts chunks of the ORIGINAL width, so a
    # resume under a different cfg.snapshot_chunk_rows would recompute
    # total/ranges and could declare a mid-flight snapshot complete
    # (silent loss of every un-backfilled key). All three are written by
    # the commit that publishes the first chunk; 0 = legacy manifest or
    # no incremental snapshot (fence disabled).
    snapshot_chunk_rows: int = 0
    snapshot_d_min: int = 0
    snapshot_total_chunks: int = 0
    # set (and committed) the first time the engine observes
    # chunks_done >= total: records COMPLETION distinctly from progress,
    # so a finished snapshot resumes without re-deriving geometry — in
    # particular a legacy lake (progress but no pinned geometry) whose
    # snapshot already completed is not refused. False on legacy
    # manifests; see CdcEngine._maybe_snapshot_chunk for the migration
    # path (cfg.snapshot_resume_legacy_assume_cfg_width).
    snapshot_complete: bool = False
    # incremental-materialized-view deltas, committed through the SAME
    # epoch fence as offsets: key "windowid:lo" (lo keeps truncated-
    # window continuations distinct), value {lang: [d_rows, d_bytes]}.
    # Replay of an UNcommitted window overwrites its own key — exactly
    # once by construction. Empty on legacy manifests / flag off.
    view_deltas: dict[str, dict[str, list[int]]] = field(
        default_factory=dict)
    partitions: dict[int, PartitionState] = field(default_factory=dict)

    def view_state(self) -> dict[str, tuple[int, int]]:
        out: dict[str, list[int]] = {}
        for d in self.view_deltas.values():
            for lang, (dr, db) in d.items():
                s = out.setdefault(lang, [0, 0])
                s[0] += int(dr)
                s[1] += int(db)
        return {k: (v[0], v[1]) for k, v in out.items()}

    def partition(self, pid: int) -> PartitionState:
        if pid not in self.partitions:
            self.partitions[pid] = PartitionState(partition_id=pid)
        return self.partitions[pid]

    def watermarks(self) -> dict[int, int]:
        return {p.partition_id: p.committed_lsn for p in self.partitions.values()}

    def all_fragments(self) -> list[str]:
        out: list[str] = []
        for pid in sorted(self.partitions):
            out.extend(self.partitions[pid].fragments)
        return out

    def to_json(self, compact: bool = False) -> str:
        if compact:
            return json.dumps(json.loads(self.to_json()),
                              separators=(",", ":"))
        return json.dumps({
            "epoch": self.epoch,
            "committed_lsn": self.committed_lsn,
            "num_partitions": self.num_partitions,
            "window_lsns": self.window_lsns,
            "offset_backend": self.offset_backend,
            "snapshot_chunks_done": self.snapshot_chunks_done,
            "snapshot_chunk_rows": self.snapshot_chunk_rows,
            "snapshot_d_min": self.snapshot_d_min,
            "snapshot_total_chunks": self.snapshot_total_chunks,
            "snapshot_complete": self.snapshot_complete,
            "view_deltas": self.view_deltas,
            "partitions": {
                str(pid): vars(ps) for pid, ps in sorted(self.partitions.items())
            },
        }, indent=1)

    @staticmethod
    def from_json(text: str) -> "Manifest":
        d = json.loads(text)
        m = Manifest(epoch=d["epoch"], committed_lsn=d["committed_lsn"],
                     num_partitions=d["num_partitions"],
                     window_lsns=d.get("window_lsns", 0),
                     offset_backend=d.get("offset_backend", ""),
                     snapshot_chunks_done=d.get("snapshot_chunks_done", 0),
                     snapshot_chunk_rows=d.get("snapshot_chunk_rows", 0),
                     snapshot_d_min=d.get("snapshot_d_min", 0),
                     snapshot_total_chunks=d.get("snapshot_total_chunks", 0),
                     snapshot_complete=d.get("snapshot_complete", False),
                     view_deltas=d.get("view_deltas", {}))
        for pid, ps in d["partitions"].items():
            m.partitions[int(pid)] = PartitionState(**ps)
        return m


def _checkpoint_dir(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_checkpoints")


def detect_backend(lake_dir: str) -> str | None:
    """Which offset backend has committed state on disk, if any.

    The load-path fence: ``load_current_manifest(dir, backend='file')``
    on a lake written with backend='log' returns None — indistinguishable
    from a fresh lake — and destructive maintenance (compact + GC) on
    that "fresh" view would delete every committed fragment. Callers that
    are about to trust a None use this to tell "fresh" from "wrong
    backend". Returns "log", "file", or None (genuinely fresh)."""
    ck = _checkpoint_dir(lake_dir)
    if os.path.exists(os.path.join(ck, "offsets.log")):
        return "log"
    if os.path.exists(os.path.join(ck, "CURRENT")):
        return "file"
    return None


class StaleWriterError(RuntimeError):
    """Another writer advanced the lake's checkpoint since this engine
    loaded its manifest — committing would fork history. The optimistic
    fence the reference lacks (its offset stores assume one engine per
    task file, ServerApp.java:211)."""


def _fsync_dir(path: str) -> None:
    """fsync a directory so renames inside it survive power loss (an
    os.replace is only durable once its directory entry is)."""
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


class _CommitLock:
    """O_EXCL mutex around the commit critical section (fence-check →
    publish → CURRENT swap), closing the check-vs-swap race between two
    writers that both pass the epoch fence. Held for milliseconds.

    Stale-lock breaking requires BOTH staleness (mtime older than
    ``break_after_s``) and a dead holder (the pid written into the lock
    no longer exists) — a merely SLOW holder (VM pause, long fsync) is
    never broken; the waiter times out with StaleWriterError instead.
    The liveness probe assumes writers share a host/pid namespace, which
    is the single-node deployment; a multi-node lake needs a lease
    service here (see SCALE.md's commit row). Release verifies OWNERSHIP
    (the lock still carries our token) so a holder that WAS broken can
    never unlink the breaker's fresh lock."""

    def __init__(self, ckdir: str, timeout_s: float = 10.0,
                 break_after_s: float = 60.0):
        import uuid
        self.path = os.path.join(ckdir, "COMMIT_LOCK")
        self.timeout_s = timeout_s
        self.break_after_s = break_after_s
        self.token = f"{os.getpid()}:{uuid.uuid4().hex}"

    @staticmethod
    def _holder_alive(path: str) -> bool:
        try:
            with open(path) as f:
                pid = int(f.read().split(":", 1)[0])
            os.kill(pid, 0)
            return True
        except (FileNotFoundError, ValueError, ProcessLookupError):
            return False
        except PermissionError:
            return True                        # exists, owned by another uid

    def __enter__(self):
        import time
        deadline = time.monotonic() + self.timeout_s
        while True:
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, self.token.encode())
                os.close(fd)
                return self
            except FileExistsError:
                pass
            if time.monotonic() > deadline:
                raise StaleWriterError(
                    f"commit lock {self.path} held too long — another "
                    "writer is committing") from None
            try:
                st = os.stat(self.path)
                stale = time.time() - st.st_mtime > self.break_after_s
                if stale and not self._holder_alive(self.path):
                    self._try_break(st)
                    continue
            except FileNotFoundError:
                continue                       # raced the release — retry
            time.sleep(0.01)

    def _try_break(self, st: os.stat_result) -> None:
        """Break the stale dead-holder lock whose stat snapshot ``st``
        the caller just checked — under a break-intent sidecar mutex,
        re-verifying the lock is STILL that same file (inode) and still
        stale/dead immediately before taking it out of the namespace.

        The bare rename-then-unlink this replaces had a TOCTOU: waiter B
        stats the stale lock, stalls, waiter C meanwhile breaks it and
        acquires a FRESH lock at the same path, then B's pending rename
        steals C's fresh lock — two holders (seen in the threaded
        stale-break test under heavy load). With the sidecar mutex held,
        nobody else can remove the path (O_EXCL keeps creators out while
        it exists; other breakers are excluded by the sidecar), and the
        holder is verified dead — so the re-verified inode cannot change
        between the check and the rename."""
        import time
        bpath = self.path + ".break"
        try:
            bfd = os.open(bpath, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            # another breaker is in progress; clear its corpse only if
            # it is itself stale AND its pid is gone (a live breaker is
            # protected by _holder_alive, so two breakers never overlap)
            try:
                bst = os.stat(bpath)
                if (time.time() - bst.st_mtime > self.break_after_s
                        and not self._holder_alive(bpath)):
                    corpse = f"{bpath}.dead.{os.getpid()}" \
                             f".{time.monotonic_ns()}"
                    os.rename(bpath, corpse)
                    os.unlink(corpse)
            except FileNotFoundError:
                pass
            return
        try:
            os.write(bfd, str(os.getpid()).encode())
            os.close(bfd)
            try:
                st2 = os.stat(self.path)
                if (st2.st_ino == st.st_ino
                        and time.time() - st2.st_mtime > self.break_after_s
                        and not self._holder_alive(self.path)):
                    broken = f"{self.path}.broken.{os.getpid()}" \
                             f".{time.monotonic_ns()}"
                    os.rename(self.path, broken)   # verified crashed holder
                    os.unlink(broken)
            except FileNotFoundError:
                pass                           # released/broken meanwhile
        finally:
            try:
                os.unlink(bpath)
            except FileNotFoundError:
                pass                           # corpse-cleared by a waiter

    def __exit__(self, *exc):
        try:
            with open(self.path) as f:
                if f.read() != self.token:
                    return                     # broken + reclaimed: not ours
            os.unlink(self.path)
        except FileNotFoundError:
            pass


def commit_manifest(lake_dir: str, manifest: Manifest,
                    expected_prev_epoch: int | None = None,
                    publish: list[str] | None = None,
                    backend: str = "file") -> str:
    """Phase 2 of the two-phase commit: check the epoch fence, publish any
    staged fragments, durably write the manifest, then atomically advance
    the CURRENT pointer (≙ commitOffsets' confirm step,
    MTEngine.java:1124-1130).

    ``expected_prev_epoch``: optimistic concurrency check — refuse if
    CURRENT no longer points where this writer last saw it (a concurrent
    engine committed). Orphan manifest files from our own crashed attempts
    (manifest written, CURRENT not yet swapped) are overwritten safely.

    ``publish``: lake-relative fragment paths staged by this commit's
    windows (written as ``<name>.staged``). They are renamed to their
    final names only AFTER the fence passes, so a writer that lost the
    epoch race never overwrites committed fragment bytes. A crash between
    publish and the CURRENT swap is safe: replay regenerates byte-identical
    staged files and republishes.

    ``backend``: see :func:`load_current_manifest`.
    """
    if backend == "log":
        return _log_commit(lake_dir, manifest, expected_prev_epoch, publish)
    ckdir = _checkpoint_dir(lake_dir)
    os.makedirs(ckdir, exist_ok=True)
    with _CommitLock(ckdir):
        if expected_prev_epoch is not None:
            cur = os.path.join(ckdir, "CURRENT")
            actual = None
            if os.path.exists(cur):
                with open(cur) as f:
                    actual = int(f.read().strip())
            if actual is not None and actual != expected_prev_epoch:
                raise StaleWriterError(
                    f"CURRENT is at epoch {actual}, expected "
                    f"{expected_prev_epoch} — another writer owns this lake")
        if publish:
            from cdcsdk_server_ray.state.lake import publish_fragments
            publish_fragments(lake_dir, publish)
        mpath = os.path.join(ckdir, f"manifest-{manifest.epoch:06d}.json")
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            f.write(manifest.to_json())
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, mpath)
        cur_tmp = os.path.join(ckdir, "CURRENT.tmp")
        with open(cur_tmp, "w") as f:
            f.write(str(manifest.epoch))
            f.flush()
            os.fsync(f.fileno())
        os.replace(cur_tmp, os.path.join(ckdir, "CURRENT"))
        _fsync_dir(ckdir)
        # retention (≙ the log backend's 64-record compaction): only the
        # manifest CURRENT points at is ever read back; without pruning a
        # commit-per-window run accretes one file per window forever.
        # Keep a margin of recent epochs for post-mortems.
        keep_from = manifest.epoch - 8
        if keep_from > 0:
            for name in os.listdir(ckdir):
                if name.startswith("manifest-") and name.endswith(".json"):
                    try:
                        if int(name[9:-5]) < keep_from:
                            os.unlink(os.path.join(ckdir, name))
                    except ValueError:
                        pass
    return mpath


def load_current_manifest(lake_dir: str,
                          backend: str = "file") -> Manifest | None:
    """Resume entry point (≙ offset-resume, SimpleSourceConnector.java:143-157):
    read the backend's current record → manifest; None ⇒ fresh lake
    ("stateless mode", ServerApp.java:196-201).

    Backends (≙ the memory/file/Kafka offset-store plurality,
    MTEngine.java:128-183): "file" = manifest file + atomic CURRENT
    pointer swap; "log" = append-only record log (the Kafka-topic
    analogue — commits append, resume replays to the last intact record,
    a torn tail is ignored exactly like an uncommitted topic write).
    A lake speaks ONE backend; both satisfy the same two-phase contract.
    """
    if backend == "log":
        return _log_load(lake_dir)
    cur = os.path.join(_checkpoint_dir(lake_dir), "CURRENT")
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        epoch = int(f.read().strip())
    mpath = os.path.join(_checkpoint_dir(lake_dir), f"manifest-{epoch:06d}.json")
    with open(mpath) as f:
        return Manifest.from_json(f.read())


# ---- append-log backend (≙ Kafka-topic offset storage) -------------------

def _log_path(lake_dir: str) -> str:
    return os.path.join(_checkpoint_dir(lake_dir), "offsets.log")


def _log_load(lake_dir: str) -> Manifest | None:
    """Scan the log; the LAST record with a valid CRC and terminator wins.

    An unterminated final line is a torn tail (crash mid-append) —
    ignored, falling back to the previous record. A TERMINATED line that
    fails its CRC is a torn append that a later `_log_commit` repaired by
    terminating it (see there): records after it were durably
    acknowledged, so corrupt lines are SKIPPED, not treated as
    end-of-log — breaking there would permanently mask every commit
    appended after the crash."""
    import zlib
    path = _log_path(lake_dir)
    if not os.path.exists(path):
        return None
    last = None
    with open(path, "rb") as f:
        for raw in f:
            if not raw.endswith(b"\n"):
                break                      # torn tail — ignore
            try:
                crc_hex, payload = raw[:-1].split(b" ", 1)
                if int(crc_hex, 16) != zlib.crc32(payload):
                    continue               # repaired torn line — skip
                last = payload
            except ValueError:
                continue                   # repaired torn line — skip
    return Manifest.from_json(last.decode()) if last else None


def _log_commit(lake_dir: str, manifest: Manifest,
                expected_prev_epoch: int | None,
                publish: list[str] | None,
                compact_after_records: int = 64) -> str:
    import zlib
    ckdir = _checkpoint_dir(lake_dir)
    os.makedirs(ckdir, exist_ok=True)
    with _CommitLock(ckdir):
        if expected_prev_epoch is not None:
            cur = _log_load(lake_dir)
            if cur is not None and cur.epoch != expected_prev_epoch:
                raise StaleWriterError(
                    f"offset log is at epoch {cur.epoch}, expected "
                    f"{expected_prev_epoch} — another writer owns this lake")
        if publish:
            from cdcsdk_server_ray.state.lake import publish_fragments
            publish_fragments(lake_dir, publish)
        payload = manifest.to_json(compact=True).encode()
        rec = f"{zlib.crc32(payload):08x} ".encode() + payload + b"\n"
        path = _log_path(lake_dir)
        # torn-tail REPAIR before appending: if the previous writer died
        # mid-append the file ends without '\n'; appending directly would
        # merge this record into the torn line, corrupting it. Terminate
        # the torn line first — it becomes a CRC-invalid line the loader
        # skips, and this record stays intact.
        try:
            with open(path, "rb") as f:
                f.seek(-1, os.SEEK_END)
                torn = f.read(1) != b"\n"
        except (FileNotFoundError, OSError):
            torn = False                   # missing or empty file
        with open(path, "ab") as f:
            f.write((b"\n" if torn else b"") + rec)
            f.flush()
            os.fsync(f.fileno())
        # log compaction (≙ Kafka compacted-topic retention): only the
        # latest record matters — when the log grows past the bound,
        # atomically rewrite it as that single record
        with open(path, "rb") as f:
            n_recs = sum(1 for _ in f)
        if n_recs > compact_after_records:
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(rec)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)
        _fsync_dir(ckdir)
    return path
