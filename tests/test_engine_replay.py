"""Engine end-to-end: oracle convergence, crash/resume, replay idempotency,
fencing, compaction, schema evolution — the golden-replay strategy of the
reference (ConnectorOutputTest.java:76-110 record/replay harness;
EmbeddedEngineTest offset-resume tests), upgraded to sha256 equality per
BASELINE.json's correctness gate.
"""

import hashlib
import pathlib

import pandas as pd
import pytest

from cdcsdk_server_ray.config import EngineConfig, SynthConfig
from cdcsdk_server_ray.engine import CdcEngine
from cdcsdk_server_ray.sources.changelog import expected_final_state
from cdcsdk_server_ray.state.lineage import read_lineage
from cdcsdk_server_ray.state.manifest import (Manifest, commit_manifest,
                                              load_current_manifest)

SYNTH = SynthConfig(num_keys=400, max_versions=6)


def _cfg(lake, **kw):
    base = dict(lake_dir=lake, num_partitions=4, window_lsns=600, synth=SYNTH)
    base.update(kw)
    return EngineConfig(**base)


def _state_df(eng):
    return (eng.current_state().to_pandas()
            .sort_values(["repo", "path"]).reset_index(drop=True))


def _sha(df):
    return [hashlib.sha256(c.encode()).hexdigest() for c in df["content"]]


def test_full_run_matches_oracle(ray_session, tmp_lake):
    eng = CdcEngine(_cfg(tmp_lake))
    m = eng.run()
    assert m.committed_lsn == SYNTH.max_lsn - 1
    got = _state_df(eng)
    exp = expected_final_state(SYNTH).to_pandas().reset_index(drop=True)
    assert len(got) == len(exp)
    assert _sha(got) == _sha(exp)
    assert got["commit"].tolist() == exp["commit"].tolist()


def test_crash_resume_converges(ray_session, tmp_lake):
    CdcEngine(_cfg(tmp_lake)).run(max_windows=1)   # crash after 1 window
    CdcEngine(_cfg(tmp_lake)).run(max_windows=1)   # crash again
    eng = CdcEngine(_cfg(tmp_lake))
    eng.run()                                       # finish
    got = _state_df(eng)
    exp = expected_final_state(SYNTH).to_pandas().reset_index(drop=True)
    assert _sha(got) == _sha(exp)


def test_replay_is_noop_when_complete(ray_session, tmp_lake):
    eng = CdcEngine(_cfg(tmp_lake))
    m1 = eng.run()
    m2 = CdcEngine(_cfg(tmp_lake)).run()
    assert m2.committed_lsn == m1.committed_lsn
    assert m2.epoch == m1.epoch  # no new commits


def test_uncommitted_window_replays_identically(ray_session, tmp_lake):
    """commit_every_windows=3 ⇒ crash loses staged-but-uncommitted windows;
    replay regenerates byte-identical fragments (exactly-once)."""
    cfg = _cfg(tmp_lake, commit_every_windows=3)
    eng = CdcEngine(cfg)
    eng.run(max_windows=2)  # final drain commits — now simulate harder crash:
    # wind back CURRENT by hand? Instead: stage window 2 fragments by running
    # with a fresh engine that re-derives window ids from the manifest.
    before = {p: p.read_bytes() for p in pathlib.Path(tmp_lake).glob("fragments/**/*.parquet")}
    CdcEngine(cfg).run()
    after = {p: p.read_bytes() for p in pathlib.Path(tmp_lake).glob("fragments/**/*.parquet")}
    for p, b in before.items():
        assert after[p] == b  # earlier fragments untouched byte-for-byte


def test_fence_drops_redelivered_events(ray_session, tmp_lake):
    """Events at or below the committed watermark are dropped and counted
    (the reference cannot do this — its at-least-once redelivery reaches
    the sink, SURVEY.md §2.5 'exact dedup')."""
    cfg = _cfg(tmp_lake)
    eng = CdcEngine(cfg)
    eng.run(max_windows=2)
    manifest = eng.manifest()
    # redeliver window 0 (entirely below the watermark)
    rows = eng.apply_window(manifest, window_id=0, lo=1, hi=cfg.window_lsns + 1)
    assert sum(r["events_applied"] for r in rows) == 0
    assert sum(r["dedup_drops"] for r in rows) > 0


def test_compaction_preserves_state_and_prunes_fragments(ray_session, tmp_lake):
    eng = CdcEngine(_cfg(tmp_lake))
    eng.run()
    before = _state_df(eng)
    n_frags_before = len(eng.manifest().all_fragments())
    m = eng.compact()
    assert len(m.all_fragments()) <= eng.cfg.num_partitions < n_frags_before
    after = _state_df(eng)
    pd.testing.assert_frame_equal(
        before[["repo", "path", "commit", "content"]],
        after[["repo", "path", "commit", "content"]])


def test_lineage_accounts_every_event(ray_session, tmp_lake):
    eng = CdcEngine(_cfg(tmp_lake))
    eng.run()
    lin = read_lineage(tmp_lake).to_pandas()
    import numpy as np

    from cdcsdk_server_ray.sources.changelog import synth_flat_batch
    total = synth_flat_batch(SYNTH, np.arange(1, SYNTH.max_lsn)).num_rows
    assert lin["events_applied"].sum() == total
    assert (lin["bytes_written"] >= 0).all()


def test_schema_evolution_end_to_end(ray_session, tmp_lake):
    synth = SynthConfig(num_keys=300, max_versions=6,
                        stars_add_lsn=500, stars_widen_lsn=1200)
    cfg = EngineConfig(lake_dir=tmp_lake, num_partitions=4, window_lsns=400,
                       synth=synth)
    eng = CdcEngine(cfg)
    eng.run()
    got = _state_df(eng)
    assert "stars" in got.columns
    assert got["stars"].dtype == "float64"
    exp = expected_final_state(synth).to_pandas().reset_index(drop=True)
    assert _sha(got) == _sha(exp)
    # rows whose winner predates stars_add_lsn are null-filled
    assert got.loc[got.lsn < 500, "stars"].isna().all()
    assert got.loc[got.lsn >= 500, "stars"].notna().all()


def test_exchange_modes_produce_identical_fragments(ray_session, tmp_path):
    """staged (spill+merge) and groupby (sort AllToAll) exchanges must
    yield byte-identical lakes — the exchange is an implementation detail,
    the fragment bytes are the contract."""
    synth = SynthConfig(num_keys=300, max_versions=5)
    lakes = {}
    for mode in ("staged", "groupby"):
        lake = str(tmp_path / mode)
        cfg = EngineConfig(lake_dir=lake, num_partitions=4, window_lsns=500,
                           synth=synth, exchange=mode)
        CdcEngine(cfg).run()
        lakes[mode] = {
            p.relative_to(lake): p.read_bytes()
            for p in pathlib.Path(lake).glob("fragments/**/*.parquet")}
    assert set(lakes["staged"]) == set(lakes["groupby"])
    for rel, data in lakes["staged"].items():
        assert lakes["groupby"][rel] == data, f"fragment {rel} differs"


def test_hot_partition_salting(ray_session, tmp_path):
    """hot_partition_bytes=1 forces every partition through the per-salt
    parallel merge: fragments split by salt, state still exact, lineage
    still accounts every event."""
    import hashlib
    import numpy as np

    from cdcsdk_server_ray.sources.changelog import synth_flat_batch
    synth = SynthConfig(num_keys=400, max_versions=6)
    lake = str(tmp_path / "salted")
    cfg = EngineConfig(lake_dir=lake, num_partitions=4, window_lsns=600,
                       synth=synth, hot_partition_bytes=1, salt_buckets=4)
    eng = CdcEngine(cfg)
    eng.run()
    frags = eng.manifest().all_fragments()
    assert any("-s" in f for f in frags), frags
    got = _state_df(eng)
    exp = expected_final_state(synth).to_pandas().reset_index(drop=True)
    assert _sha(got) == _sha(exp)
    lin = read_lineage(lake).to_pandas()
    total = synth_flat_batch(synth, np.arange(1, synth.max_lsn)).num_rows
    assert lin["events_applied"].sum() == total


def test_retriable_fault_injection(ray_session, tmp_path):
    """A task-level failure mid-window is retried by Ray and the run still
    converges exactly-once (≙ SimpleSourceConnector's RetriableException
    injection + MTEngine swallowing it, SURVEY.md E6)."""
    import os
    lake = str(tmp_path / "faulty")
    cfg = _cfg(lake, fault_inject_lsn=700)
    eng = CdcEngine(cfg)
    m = eng.run()
    assert os.path.exists(os.path.join(lake, "_fault_injected"))  # it fired
    assert m.committed_lsn == SYNTH.max_lsn - 1
    got = _state_df(eng)
    exp = expected_final_state(SYNTH).to_pandas().reset_index(drop=True)
    assert _sha(got) == _sha(exp)
    lin = read_lineage(lake).to_pandas()
    import numpy as np

    from cdcsdk_server_ray.sources.changelog import synth_flat_batch
    total = synth_flat_batch(SYNTH, np.arange(1, SYNTH.max_lsn)).num_rows
    assert lin["events_applied"].sum() == total  # no double-count from retry


def test_stale_writer_fenced(ray_session, tmp_lake):
    """A second writer that loads an old manifest must be refused at
    commit time (optimistic fence; the reference has no such guard)."""
    from cdcsdk_server_ray.state.manifest import (StaleWriterError,
                                                  commit_manifest)
    eng = CdcEngine(_cfg(tmp_lake))
    eng.run(max_windows=1)
    stale = eng.manifest()          # loaded now…
    eng2 = CdcEngine(_cfg(tmp_lake))
    eng2.run(max_windows=1)         # …another writer commits meanwhile
    stale.epoch += 1
    with pytest.raises(StaleWriterError):
        commit_manifest(tmp_lake, stale, expected_prev_epoch=stale.epoch - 1)


def test_schema_evolution_survives_compaction(ray_session, tmp_lake):
    """Compacting fragments with heterogeneous schemas (pre/post column-add
    and type-widen) must keep the unified, widened state."""
    synth = SynthConfig(num_keys=300, max_versions=6,
                        stars_add_lsn=500, stars_widen_lsn=1200)
    cfg = EngineConfig(lake_dir=tmp_lake, num_partitions=4, window_lsns=400,
                       synth=synth)
    eng = CdcEngine(cfg)
    eng.run()
    before = _state_df(eng)
    eng.compact()
    after = _state_df(eng)
    assert after["stars"].dtype == "float64"
    pd.testing.assert_frame_equal(
        before[["repo", "path", "commit", "content", "stars"]],
        after[["repo", "path", "commit", "content", "stars"]])


def test_stateless_mode_no_checkpoint(ray_session, tmp_lake):
    """checkpointing=False ≙ memory offset store: nothing durable, a
    restart replays from scratch (ServerApp.java:196-201 'stateless')."""
    cfg = _cfg(tmp_lake, checkpointing=False)
    eng = CdcEngine(cfg)
    m = eng.run()
    assert load_current_manifest(tmp_lake) is None      # nothing committed
    got = (eng.current_state(manifest=m).to_pandas()
           .sort_values(["repo", "path"]).reset_index(drop=True))
    exp = expected_final_state(SYNTH).to_pandas().reset_index(drop=True)
    assert _sha(got) == _sha(exp)                       # state still exact
    m2 = CdcEngine(cfg).run(max_windows=1)              # restart: from lsn 1
    assert m2.committed_lsn == _cfg(tmp_lake).window_lsns


def test_auto_compaction_bounds_fragments(ray_session, tmp_lake):
    """compact_every_windows keeps the fragment count bounded while the
    tail runs, without disturbing convergence."""
    cfg = _cfg(tmp_lake, compact_every_windows=2)
    eng = CdcEngine(cfg)
    m = eng.run()
    # after rolling compaction the manifest holds ≤ P bases (+ ≤ cadence
    # deltas for windows since the last compaction)
    assert len(m.all_fragments()) <= eng.cfg.num_partitions * 3
    got = _state_df(eng)
    exp = expected_final_state(SYNTH).to_pandas().reset_index(drop=True)
    assert _sha(got) == _sha(exp)
    # resume after auto-compaction: still a clean no-op
    m2 = CdcEngine(cfg).run()
    assert m2.committed_lsn == m.committed_lsn


def test_truncated_window_resume_loses_nothing(ray_session, tmp_lake):
    """Stopping mid-window (--until-lsn) and resuming must NOT overwrite
    the committed partial-window fragment (fragment names carry the
    attempt's start LSN). Regression: keys last touched in the earlier
    portion of the window were silently lost (ADVICE r01, high)."""
    cfg = _cfg(tmp_lake)
    mid = cfg.window_lsns // 2 + 7            # truncates window 0
    CdcEngine(cfg).run(until_lsn=mid)
    m1 = load_current_manifest(tmp_lake)
    assert m1.committed_lsn == mid - 1
    eng = CdcEngine(cfg)
    eng.run()                                  # resume: continues window 0
    got = _state_df(eng)
    exp = expected_final_state(SYNTH).to_pandas().reset_index(drop=True)
    assert len(got) == len(exp)
    assert _sha(got) == _sha(exp)
    # both attempts of window 0 are present as distinct fragments
    frags = eng.manifest().all_fragments()
    w0 = [f for f in frags if "delta-w000000000-" in f]
    assert len({f.split("delta-w000000000-")[1] for f in w0}) > 1


def test_window_lsns_fenced_per_lake(ray_session, tmp_lake):
    """Rerunning with a different --window-lsns would remap window ids onto
    existing fragment names — the manifest pins the windowing geometry
    (ADVICE r01, medium)."""
    CdcEngine(_cfg(tmp_lake)).run(max_windows=1)
    with pytest.raises(ValueError, match="window_lsns"):
        CdcEngine(_cfg(tmp_lake, window_lsns=250)).manifest()


def test_fragments_invisible_until_commit(ray_session, tmp_lake):
    """Phase-1 fragments are staged (.staged suffix) and only published
    inside the manifest commit, after the epoch fence — a writer that
    loses the race never touches committed bytes (ADVICE r01)."""
    cfg = _cfg(tmp_lake, commit_every_windows=10_000)  # never auto-commits
    eng = CdcEngine(cfg)
    eng.run(max_windows=1)  # final drain DOES commit; check published now
    frag_dir = pathlib.Path(tmp_lake) / "fragments"
    finals = list(frag_dir.glob("**/*.parquet"))
    staged = list(frag_dir.glob("**/*.parquet.staged"))
    assert finals and not staged  # all published exactly at commit


def test_user_transform_chain_in_engine(ray_session, tmp_lake):
    """cfg.transforms plugs registry SMTs into the engine stream (T4):
    a filter transform dropping one repo's events keeps those keys out of
    the lake entirely."""
    cfg = _cfg(tmp_lake, transforms=(
        ("filter_regex", {"column": "repo", "pattern": "^org0/"}),))
    eng = CdcEngine(cfg)
    eng.run()
    got = _state_df(eng)
    assert len(got) > 0
    assert not got["repo"].str.startswith("org0/").any()
    exp = expected_final_state(SYNTH).to_pandas()
    exp = exp[~exp["repo"].str.startswith("org0/")].reset_index(drop=True)
    assert _sha(got) == _sha(exp)


def test_engine_identical_under_both_offset_backends(ray_session, tmp_path):
    """E5: the offset-storage seam is real — the engine produces a
    byte-identical lake and converged state under the file-pointer and
    append-log backends, including crash/resume."""
    states = {}
    for backend in ("file", "log"):
        lake = str(tmp_path / backend)
        cfg = _cfg(lake, offset_backend=backend)
        CdcEngine(cfg).run(max_windows=1)      # crash after one window
        eng = CdcEngine(cfg)
        eng.run()                              # resume under same backend
        states[backend] = {
            p.relative_to(lake): p.read_bytes()
            for p in pathlib.Path(lake).glob("fragments/**/*.parquet")}
        got = _state_df(eng)
        exp = expected_final_state(SYNTH).to_pandas().reset_index(drop=True)
        assert _sha(got) == _sha(exp), backend
    assert states["file"] == states["log"]     # fragment bytes identical


def test_crash_between_publish_and_pointer_swap(ray_session, tmp_lake):
    """Worst-case crash point: some fragments already renamed to their
    final names but CURRENT not yet swapped. Replay must regenerate
    byte-identical staged files, republish idempotently, and converge."""
    import os

    from cdcsdk_server_ray.state import lake as lake_mod

    cfg = _cfg(tmp_lake)
    eng = CdcEngine(cfg)
    manifest = eng.manifest()
    # stage window 0 without committing
    rows = eng.apply_window(manifest, 0, 1, cfg.window_lsns + 1)
    frags = [r["fragment"] for r in rows if r["fragment"]]
    assert frags
    staged = [os.path.join(tmp_lake, f + ".staged") for f in frags]
    assert all(os.path.exists(p) for p in staged)
    # simulate crash mid-publish: half the fragments made it to final
    half = frags[: len(frags) // 2]
    lake_mod.publish_fragments(tmp_lake, half)
    published_bytes = {
        f: open(os.path.join(tmp_lake, f), "rb").read() for f in half}
    # fresh engine resumes from scratch (no checkpoint exists)
    eng2 = CdcEngine(cfg)
    eng2.run()
    got = _state_df(eng2)
    exp = expected_final_state(SYNTH).to_pandas().reset_index(drop=True)
    assert _sha(got) == _sha(exp)
    for f, b in published_bytes.items():   # republished byte-identically
        assert open(os.path.join(tmp_lake, f), "rb").read() == b


def test_compaction_garbage_collects_superseded_fragments(ray_session, tmp_lake):
    """After compaction commits, delta files the manifest no longer
    references are deleted from disk; staged (in-flight) files survive."""
    import os

    eng = CdcEngine(_cfg(tmp_lake))
    eng.run()
    files_before = list(pathlib.Path(tmp_lake).glob("fragments/**/*.parquet"))
    assert len(files_before) > eng.cfg.num_partitions
    # plant a staged file: must survive GC (it represents an uncommitted window)
    staged = pathlib.Path(tmp_lake) / "fragments" / "p00000" / \
        "delta-w000000099-1.parquet.staged"
    staged.write_bytes(b"pending")
    m = eng.compact()
    files_after = {str(p.relative_to(tmp_lake))
                   for p in pathlib.Path(tmp_lake).glob("fragments/**/*.parquet")}
    assert files_after == set(m.all_fragments())   # only live bases remain
    assert staged.exists()
    got = _state_df(eng)
    exp = expected_final_state(SYNTH).to_pandas().reset_index(drop=True)
    assert _sha(got) == _sha(exp)


def test_compact_refuses_without_committed_manifest(ray_session, tmp_lake):
    """Destructive-maintenance guard (ADVICE r02): a stateless lake
    (checkpointing=False — fragments on disk, nothing committed) must NOT
    be compactable: the empty manifest compact() would otherwise build,
    commit, and GC against deletes every fragment on disk."""
    cfg = _cfg(tmp_lake, checkpointing=False)
    eng = CdcEngine(cfg)
    eng.run()
    frags_before = list(pathlib.Path(tmp_lake).glob("fragments/**/*.parquet*"))
    assert frags_before                      # unstaged fragments exist
    with pytest.raises(RuntimeError, match="no committed manifest"):
        eng.compact()
    frags_after = list(pathlib.Path(tmp_lake).glob("fragments/**/*.parquet*"))
    assert frags_after == frags_before       # nothing was deleted


def test_offset_backend_fenced_per_lake(ray_session, tmp_lake):
    """A lake committed under one offset backend refuses to open under
    the other (ADVICE r02): a 'log' lake read as 'file' loads as None —
    indistinguishable from fresh — and a replay would fork history while
    compact()+GC would delete every committed fragment."""
    CdcEngine(_cfg(tmp_lake, offset_backend="log")).run(max_windows=1)
    wrong = CdcEngine(_cfg(tmp_lake, offset_backend="file"))
    with pytest.raises(ValueError, match="offset_backend"):
        wrong.manifest()
    with pytest.raises((ValueError, RuntimeError)):
        wrong.compact()
    # the right backend still resumes fine
    m = CdcEngine(_cfg(tmp_lake, offset_backend="log")).run()
    assert m.committed_lsn == SYNTH.max_lsn - 1


def test_compact_respects_epoch_fence(ray_session, tmp_lake):
    """compact()'s commit carries expected_prev_epoch: if another writer
    commits between compact's manifest load and its commit, compact must
    fail the fence (StaleWriterError) instead of silently overwriting the
    other writer's commit and GC'ing its fragments (ADVICE r02)."""
    from cdcsdk_server_ray.state.manifest import StaleWriterError

    eng = CdcEngine(_cfg(tmp_lake))
    eng.run()
    orig_manifest = CdcEngine.manifest

    def racing_manifest(self):
        m = orig_manifest(self)
        # simulate a concurrent writer committing AFTER compact loaded
        other = orig_manifest(self)
        other.epoch += 1
        commit_manifest(self.cfg.lake_dir, other,
                        expected_prev_epoch=m.epoch)
        return m

    try:
        CdcEngine.manifest = racing_manifest
        with pytest.raises(StaleWriterError):
            eng.compact()
    finally:
        CdcEngine.manifest = orig_manifest
    # the racing writer's commit is intact (one epoch past compact's view)
    assert load_current_manifest(tmp_lake).epoch == \
        orig_manifest(eng).epoch


def test_gc_removes_only_AGED_staged_orphans(ray_session, tmp_lake):
    """Crashed attempts leave .staged/.tmp files that would otherwise
    accumulate forever; GC removes them once older than the in-flight
    age gate while FRESH staged files (a pipelined window mid-write)
    survive untouched."""
    import os
    import time

    eng = CdcEngine(_cfg(tmp_lake))
    eng.run()
    pdir = pathlib.Path(tmp_lake) / "fragments" / "p00000"
    fresh = pdir / "delta-w000000099-1.parquet.staged"
    fresh.write_bytes(b"in-flight")
    old = pdir / "delta-w000000098-1.parquet.staged"
    old.write_bytes(b"crashed attempt")
    oldtmp = pdir / "delta-w000000097-1.parquet.tmp"
    oldtmp.write_bytes(b"torn write")
    t = time.time() - 7200
    os.utime(old, (t, t))
    os.utime(oldtmp, (t, t))
    eng.compact()
    assert fresh.exists()                   # in-flight: kept
    assert not old.exists()                 # aged orphans: gone
    assert not oldtmp.exists()


def test_fresh_lake_current_state_has_full_schema(ray_session, tmp_lake):
    """An EMPTY lake's current_state must carry the same event schema as
    a populated one — fresh-lake-only KeyErrors on op/lsn/content are
    exactly the bug class this pins."""
    cfg = _cfg(tmp_lake)
    eng = CdcEngine(cfg)
    empty_ds = eng.current_state(manifest=Manifest(
        num_partitions=cfg.num_partitions))
    assert empty_ds.count() == 0
    # Dataset-level schema (to_pandas on an EMPTY dataset drops columns —
    # a Ray quirk the query layer pins separately with _cols)
    assert empty_ds.schema().names == ["lsn", "tx_id", "op", "ts_ms",
                                       "repo", "path", "commit", "lang",
                                       "content"]
    eng.run()
    assert eng.current_state().schema().names == empty_ds.schema().names


def test_fused_spill_handles_empty_remainder_block(ray_session, tmp_lake,
                                                   monkeypatch):
    """Regression (round 5): with a pinned block count the range source
    can emit a remainder block whose every lsn is past max_lsn; unfused
    plans dropped empty inter-operator blocks silently, but the FUSED
    source→transform→spill task must guard the empty batch itself
    (pc.min on it returned None and crashed the window)."""
    # 2401 lsns over 32 blocks → 75-row blocks + a 1-row remainder that
    # synthesizes to an empty event table (lsn > max_lsn)
    monkeypatch.setenv("GRAFT_SYNTH_BLOCKS", "32")
    eng = CdcEngine(_cfg(tmp_lake, window_lsns=SYNTH.max_lsn))
    m = eng.run()
    assert m.committed_lsn == SYNTH.max_lsn - 1
    got = _state_df(eng)
    exp = expected_final_state(SYNTH).to_pandas().reset_index(drop=True)
    assert _sha(got) == _sha(exp)


def test_engine_view_exactly_once_through_crash_resume(ray_session, tmp_path):
    """The engine-maintained view (manifest view_deltas) equals the
    pure-function expected aggregate after a kill/resume, is invariant
    to window width, and the flag refuses non-synth sources."""
    import pandas as pd
    import pytest

    from cdcsdk_server_ray.config import EngineConfig, SynthConfig
    from cdcsdk_server_ray.engine import CdcEngine
    from cdcsdk_server_ray.sources.changelog import expected_final_state

    synth = SynthConfig(num_keys=1500, max_versions=5)
    exp_t = expected_final_state(synth).to_pandas()
    exp = (exp_t.assign(blen=exp_t["content"].str.len())
           .groupby("lang")
           .agg(n_rows=("content", "count"), content_bytes=("blen", "sum"))
           .reset_index().sort_values("lang").reset_index(drop=True)
           .astype({"n_rows": "int64", "content_bytes": "int64"}))

    views = {}
    for w in (2000, 3500):
        lake = str(tmp_path / f"lake_w{w}")
        cfg = EngineConfig(lake_dir=lake, num_partitions=4,
                           window_lsns=w, view_maintenance=True,
                           synth=synth)
        CdcEngine(cfg).run(max_windows=1)   # crash after one window
        CdcEngine(cfg).run()                # resume
        views[w] = CdcEngine(cfg).current_view()
        pd.testing.assert_frame_equal(views[w], exp)
    pd.testing.assert_frame_equal(views[2000], views[3500])

    bad = EngineConfig(lake_dir=str(tmp_path / "bad"), num_partitions=4,
                       window_lsns=2000, view_maintenance=True,
                       source="parquet_changelog", source_table="x.parquet")
    with pytest.raises(ValueError, match="view_maintenance requires"):
        CdcEngine(bad).run()


def test_engine_view_table_source_through_crash_resume(ray_session, tmp_path):
    """The engine view also maintains over the TABLE source's
    before-image changelog, exactly-once through kill/resume."""
    import pandas as pd

    from cdcsdk_server_ray.config import EngineConfig
    from cdcsdk_server_ray.engine import CdcEngine

    sf = "/root/testdata/sf0.001"
    lake = str(tmp_path / "lake_view_table")
    cfg = EngineConfig(lake_dir=lake, num_partitions=8,
                       window_lsns=9_000_000, source="table",
                       source_table=f"{sf}/documents.parquet",
                       view_maintenance=True)
    CdcEngine(cfg).run(max_windows=2)
    CdcEngine(cfg).run()
    view = CdcEngine(cfg).current_view()

    docs = pd.read_parquet(f"{sf}/documents.parquet")
    live = docs[docs["doc_id"] % 7 != 0].copy()
    live["b"] = live["text"].str.len()         + (live["doc_id"] % 3 == 0).astype(int) * 5
    exp = (live.groupby("lang")
           .agg(n_rows=("doc_id", "count"), content_bytes=("b", "sum"))
           .reset_index().sort_values("lang").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        view, exp.astype({"n_rows": "int64", "content_bytes": "int64"}))
