"""Manifest two-phase commit: roundtrip, atomicity, resume semantics.

Reference behaviors: offset flush snapshot→write→confirm with
cancel-on-failure (MTEngine.java:1098-1138), file offset store roundtrip
(EmbeddedEngineTest.java:344-421).
"""

import json
import os

from cdcsdk_server_ray.state.manifest import (Manifest, commit_manifest,
                                              load_current_manifest)


def test_fresh_lake_has_no_manifest(tmp_path):
    assert load_current_manifest(str(tmp_path)) is None


def test_commit_and_load_roundtrip(tmp_path):
    lake = str(tmp_path)
    m = Manifest(epoch=1, committed_lsn=999, num_partitions=4,
                 snapshot_chunks_done=7)
    ps = m.partition(2)
    ps.committed_lsn = 999
    ps.fragments = ["fragments/p00002/delta-w000000001.parquet"]
    ps.events_applied = 123
    commit_manifest(lake, m)
    got = load_current_manifest(lake)
    assert got.epoch == 1
    assert got.committed_lsn == 999
    assert got.partition(2).fragments == ps.fragments
    assert got.partition(2).events_applied == 123
    # incremental-snapshot chunk marker survives the round trip (and
    # legacy manifests without the key load as 0 via from_json default)
    assert got.snapshot_chunks_done == 7
    assert Manifest.from_json('{"epoch":0,"committed_lsn":0,'
                              '"num_partitions":1,"partitions":{}}'
                              ).snapshot_chunks_done == 0


def test_current_pointer_advances_atomically(tmp_path):
    lake = str(tmp_path)
    m1 = Manifest(epoch=1, committed_lsn=100, num_partitions=2)
    commit_manifest(lake, m1)
    m2 = Manifest(epoch=2, committed_lsn=200, num_partitions=2)
    commit_manifest(lake, m2)
    assert load_current_manifest(lake).committed_lsn == 200
    # older manifest remains readable (time travel / audit)
    with open(os.path.join(lake, "_checkpoints", "manifest-000001.json")) as f:
        assert json.load(f)["committed_lsn"] == 100


def test_torn_manifest_write_leaves_previous_checkpoint(tmp_path):
    """A crash mid-write (tmp file left behind) must not corrupt CURRENT —
    the cancelFlush analogue (MTEngine.java:1130-1136)."""
    lake = str(tmp_path)
    commit_manifest(lake, Manifest(epoch=1, committed_lsn=100, num_partitions=2))
    # simulate a torn phase-2: garbage tmp files that never got renamed
    ck = os.path.join(lake, "_checkpoints")
    with open(os.path.join(ck, "manifest-000002.json.tmp"), "w") as f:
        f.write("{corrupt")
    with open(os.path.join(ck, "CURRENT.tmp"), "w") as f:
        f.write("2")
    got = load_current_manifest(lake)
    assert got.epoch == 1 and got.committed_lsn == 100


def test_watermarks_view(tmp_path):
    m = Manifest(num_partitions=3)
    m.partition(0).committed_lsn = 10
    m.partition(1).committed_lsn = 20
    assert m.watermarks() == {0: 10, 1: 20}


def test_log_backend_roundtrip_and_torn_tail(tmp_path):
    """Append-log offset backend (≙ Kafka-topic offset storage,
    MTEngine.java:128-183): commits append records; resume reads the last
    intact record; a torn tail (crash mid-append) is ignored."""
    from cdcsdk_server_ray.state.manifest import (Manifest, commit_manifest,
                                                  load_current_manifest)
    lake = str(tmp_path / "loglake")
    m1 = Manifest(epoch=1, committed_lsn=100, num_partitions=2, window_lsns=50)
    commit_manifest(lake, m1, backend="log")
    m2 = Manifest(epoch=2, committed_lsn=200, num_partitions=2, window_lsns=50)
    commit_manifest(lake, m2, backend="log")
    got = load_current_manifest(lake, backend="log")
    assert (got.epoch, got.committed_lsn) == (2, 200)
    # torn tail: append garbage without terminator — previous record wins
    import os
    with open(os.path.join(lake, "_checkpoints", "offsets.log"), "ab") as f:
        f.write(b"deadbeef {\"epoch\": 99, \"committed")
    got = load_current_manifest(lake, backend="log")
    assert (got.epoch, got.committed_lsn) == (2, 200)


def test_log_backend_stale_writer_fence(tmp_path):
    from cdcsdk_server_ray.state.manifest import (Manifest, StaleWriterError,
                                                  commit_manifest)
    lake = str(tmp_path / "loglake2")
    commit_manifest(lake, Manifest(epoch=1, num_partitions=2), backend="log")
    commit_manifest(lake, Manifest(epoch=2, num_partitions=2), backend="log")
    import pytest
    with pytest.raises(StaleWriterError):
        commit_manifest(lake, Manifest(epoch=2, num_partitions=2),
                        expected_prev_epoch=1, backend="log")


def test_log_backend_compacts(tmp_path):
    """The offset log rewrites to its latest record once it grows past
    the retention bound (Kafka compacted-topic analogue)."""
    import os

    from cdcsdk_server_ray.state.manifest import (Manifest, commit_manifest,
                                                  load_current_manifest)
    lake = str(tmp_path / "loglake3")
    for e in range(1, 71):
        commit_manifest(lake, Manifest(epoch=e, committed_lsn=e * 10,
                                       num_partitions=2), backend="log")
    path = os.path.join(lake, "_checkpoints", "offsets.log")
    with open(path, "rb") as f:
        n = sum(1 for _ in f)
    assert n <= 65                       # compacted at the bound
    got = load_current_manifest(lake, backend="log")
    assert (got.epoch, got.committed_lsn) == (70, 700)


def test_commit_lock_recovers_from_crashed_holder(tmp_path):
    """A stale COMMIT_LOCK (crashed writer) is broken; a fresh lock from
    a live committer makes a racing commit raise instead of corrupting."""
    import os
    import time

    from cdcsdk_server_ray.state.manifest import (Manifest, StaleWriterError,
                                                  commit_manifest)
    lake = str(tmp_path / "locklake")
    ck = os.path.join(lake, "_checkpoints")
    os.makedirs(ck)
    lock = os.path.join(ck, "COMMIT_LOCK")
    with open(lock, "w") as f:
        f.write("424242")
    old = time.time() - 3600
    os.utime(lock, (old, old))           # stale → broken, commit proceeds
    commit_manifest(lake, Manifest(epoch=1, num_partitions=2))
    assert not os.path.exists(lock)      # released
    with open(lock, "w") as f:           # fresh lock → timeout raises
        f.write("424242")
    import pytest
    with pytest.raises(StaleWriterError, match="commit lock"):
        commit_manifest(lake, Manifest(epoch=2, num_partitions=2))
    os.unlink(lock)


def test_detect_backend(tmp_path):
    from cdcsdk_server_ray.state.manifest import detect_backend
    lake = str(tmp_path)
    assert detect_backend(lake) is None
    commit_manifest(lake, Manifest(epoch=1, num_partitions=2), backend="log")
    assert detect_backend(lake) == "log"
    lake2 = str(tmp_path / "b")
    commit_manifest(lake2, Manifest(epoch=1, num_partitions=2))
    assert detect_backend(lake2) == "file"


def test_stale_lock_break_is_single_winner(tmp_path):
    """Two waiters racing to break the same stale lock: the rename-claim
    means exactly one breaks it; the loser retries instead of unlinking
    the winner's FRESH lock (the unlink-after-stat race, ADVICE r02)."""
    import threading
    import time as _time

    from cdcsdk_server_ray.state.manifest import _CommitLock

    ck = str(tmp_path)
    stale = os.path.join(ck, "COMMIT_LOCK")
    with open(stale, "w") as f:
        f.write("dead")
    old = _time.time() - 3600
    os.utime(stale, (old, old))

    inside = []
    lock_obj = threading.Lock()

    def contend():
        with _CommitLock(ck, timeout_s=5.0, break_after_s=1.0):
            with lock_obj:
                inside.append(threading.get_ident())
                assert len(inside) == 1      # mutual exclusion held
            _time.sleep(0.05)
            with lock_obj:
                inside.remove(threading.get_ident())

    threads = [threading.Thread(target=contend) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert inside == []
    assert not os.path.exists(stale)        # released cleanly


def test_log_backend_survives_torn_tail_then_recommit(tmp_path):
    """Crash mid-append tears the log's last line; the NEXT commit must
    repair (terminate) it so its own record parses, and the loader must
    SKIP the corrupt line rather than treat it as end-of-log — otherwise
    every commit after the crash is invisible and the lake wedges in a
    stale-writer loop."""
    lake = str(tmp_path / "tornlog")
    commit_manifest(lake, Manifest(epoch=1, committed_lsn=10,
                                   num_partitions=2), backend="log")
    commit_manifest(lake, Manifest(epoch=2, committed_lsn=20,
                                   num_partitions=2),
                    expected_prev_epoch=1, backend="log")
    path = os.path.join(lake, "_checkpoints", "offsets.log")
    with open(path, "rb") as f:
        data = f.read()
    with open(path, "wb") as f:          # tear epoch-2's record mid-bytes
        f.write(data[:-7])
    assert load_current_manifest(lake, backend="log").epoch == 1
    # restart replays window 2 and commits — ON TOP of the torn tail
    commit_manifest(lake, Manifest(epoch=2, committed_lsn=20,
                                   num_partitions=2),
                    expected_prev_epoch=1, backend="log")
    got = load_current_manifest(lake, backend="log")
    assert (got.epoch, got.committed_lsn) == (2, 20)
    # and the fence keeps working for the commit after that
    commit_manifest(lake, Manifest(epoch=3, committed_lsn=30,
                                   num_partitions=2),
                    expected_prev_epoch=2, backend="log")
    assert load_current_manifest(lake, backend="log").epoch == 3


def test_commit_lock_never_breaks_a_live_holder(tmp_path):
    """A SLOW holder (stale mtime but pid alive) must not be broken —
    breaking it would let two writers run the commit critical section
    concurrently. The waiter times out instead."""
    import time

    from cdcsdk_server_ray.state.manifest import _CommitLock

    ck = str(tmp_path)
    lock = os.path.join(ck, "COMMIT_LOCK")
    with open(lock, "w") as f:
        f.write(f"{os.getpid()}:sometoken")   # our own pid: alive
    old = time.time() - 3600
    os.utime(lock, (old, old))                # looks stale
    import pytest

    from cdcsdk_server_ray.state.manifest import StaleWriterError
    t0 = time.monotonic()
    with pytest.raises(StaleWriterError):
        _CommitLock(ck, timeout_s=0.3).__enter__()
    assert time.monotonic() - t0 < 5
    assert os.path.exists(lock)               # never broken
    # release verifies ownership: a foreign lock is left alone
    foreign = _CommitLock(ck, timeout_s=0.1)
    foreign.__exit__()
    assert os.path.exists(lock)
    os.unlink(lock)


def test_file_backend_prunes_old_manifests(tmp_path):
    """Commit-per-window runs must not accrete one manifest file per
    window forever; only a recent margin is kept (the file-backend
    analogue of the log backend's compaction)."""
    lake = str(tmp_path / "prune")
    for e in range(1, 15):
        commit_manifest(lake, Manifest(epoch=e, committed_lsn=e * 10,
                                       num_partitions=2),
                        expected_prev_epoch=e - 1 if e > 1 else None)
    ck = os.path.join(lake, "_checkpoints")
    manifests = sorted(f for f in os.listdir(ck)
                       if f.startswith("manifest-"))
    assert manifests[0] >= "manifest-000006.json"   # pruned below margin
    assert load_current_manifest(lake).epoch == 14  # latest intact


def test_stale_break_reverifies_inode_before_rename(tmp_path):
    """The TOCTOU the sidecar-mutex break closes: a waiter's staleness
    snapshot refers to a lock that was meanwhile broken and REPLACED by
    another waiter's fresh lock. ``_try_break`` must re-verify identity
    (inode) + staleness + holder-death under the break mutex and leave
    the fresh lock untouched."""
    import time

    from cdcsdk_server_ray.state.manifest import _CommitLock

    ck = str(tmp_path)
    path = os.path.join(ck, "COMMIT_LOCK")

    # the stale snapshot the slow waiter checked
    with open(path, "w") as f:
        f.write("dead")
    old = time.time() - 3600
    os.utime(path, (old, old))
    snapshot = os.stat(path)

    # meanwhile: another waiter broke it and acquired a FRESH lock
    # (new inode, live holder). Age its mtime so ONLY the inode guard
    # stands between the slow waiter and stealing it.
    os.unlink(path)
    with open(path, "w") as f:
        f.write(f"{os.getpid()}:sometoken")
    os.utime(path, (old, old))

    lock = _CommitLock(ck, timeout_s=1.0, break_after_s=1.0)
    lock._try_break(snapshot)
    assert os.path.exists(path)                  # fresh lock survived
    with open(path) as f:
        assert f.read() == f"{os.getpid()}:sometoken"

    # fresh mtime + dead-looking content (the O_EXCL-create→write window
    # of a new acquirer): not stale yet → must survive
    os.unlink(path)
    with open(path, "w") as f:
        f.write("dead")
    lock._try_break(os.stat(path))
    assert os.path.exists(path)

    # genuinely stale + dead + matching snapshot → breaks
    os.utime(path, (old, old))
    lock._try_break(os.stat(path))
    assert not os.path.exists(path)
    assert not os.path.exists(path + ".break")   # sidecar released
