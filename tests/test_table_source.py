"""Table-source changelog: the engine over a real Parquet table
(sources/source_table.py) — insert/update/delete rounds, windowed resume,
compaction mid-stream."""

import hashlib

import pandas as pd
import pyarrow.parquet as pq
import pytest

from cdcsdk_server_ray.config import EngineConfig
from cdcsdk_server_ray.engine import CdcEngine
from cdcsdk_server_ray.sources.source_table import MAX_LSN, OFFSET

SF = "/root/testdata/sf0.001"


def _cfg(lake, **kw):
    base = dict(lake_dir=lake, num_partitions=4, window_lsns=OFFSET,
                source="table", source_table=f"{SF}/documents.parquet")
    base.update(kw)
    return EngineConfig(**base)


def _expected():
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    docs = docs[docs.doc_id % 7 != 0].copy()
    upd = docs.doc_id % 3 == 0
    docs["content"] = docs["text"].where(~upd, docs["text"] + " [v2]")
    docs["repo"] = "corpus/" + docs["source"]
    docs["path"] = "docs/d" + docs["doc_id"].astype(str) + ".txt"
    docs["commit"] = docs["content"].map(
        lambda t: hashlib.md5(t.encode()).hexdigest())
    return (docs[["repo", "path", "commit", "lang", "content"]]
            .sort_values(["repo", "path"]).reset_index(drop=True))


def _state(eng):
    return (eng.current_state().to_pandas()
            .sort_values(["repo", "path"]).reset_index(drop=True))


def test_table_ingest_full(ray_session, tmp_lake):
    eng = CdcEngine(_cfg(tmp_lake))
    m = eng.run()
    assert m.committed_lsn == MAX_LSN - 1
    got = _state(eng)
    exp = _expected()
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(
        got[["repo", "path", "commit", "lang", "content"]], exp)


def test_table_ingest_window_resume(ray_session, tmp_lake):
    """Stop after the insert round, verify snapshot state, resume through
    updates+deletes — the windowed tail over a real table."""
    eng = CdcEngine(_cfg(tmp_lake))
    eng.run(max_windows=1)   # inserts only
    snap = _state(eng)
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    assert len(snap) == len(docs)          # every row inserted
    assert (snap["op"] == "c").all()
    CdcEngine(_cfg(tmp_lake)).run()        # resume: updates + deletes
    got = _state(CdcEngine(_cfg(tmp_lake)))
    pd.testing.assert_frame_equal(
        got[["repo", "path", "commit", "lang", "content"]], _expected())


def test_compact_mid_stream_then_continue(ray_session, tmp_lake):
    """Compaction between windows must not disturb subsequent ingestion
    (base fragments + later deltas merge-on-read correctly)."""
    eng = CdcEngine(_cfg(tmp_lake))
    eng.run(max_windows=2)   # inserts + updates
    eng.compact()            # deltas → per-partition base
    CdcEngine(_cfg(tmp_lake)).run()   # delete round lands on top of base
    got = _state(CdcEngine(_cfg(tmp_lake)))
    pd.testing.assert_frame_equal(
        got[["repo", "path", "commit", "lang", "content"]], _expected())


def test_scd2_history_semantics(ray_session):
    """SCD2 over the 3-round changelog: version chains, interval closure,
    and is_current flags all follow from doc_id arithmetic."""
    from cdcsdk_server_ray.pipelines.cdc_queries import scd2_history
    got = scd2_history(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    n = len(docs)
    n_upd = (docs["doc_id"] % 3 == 0).sum()
    # one v1 row per doc + one v2 row per updated doc; deletes emit none
    assert len(got) == n + n_upd
    per_key = got.groupby("path").size()
    assert set(per_key.unique()) <= {1, 2}
    for _, r in got.iterrows():
        doc_id = int(r["path"].split("d")[-1].split(".")[0])
        if r["op"] == "c":
            assert r["valid_from_lsn"] == doc_id + 1
            if doc_id % 3 == 0:            # closed by the update
                assert r["valid_to_lsn"] == 10_000_000 + doc_id + 1
                assert r["is_current"] == 0
            elif doc_id % 7 == 0:          # closed by the delete
                assert r["valid_to_lsn"] == 20_000_000 + doc_id + 1
                assert r["is_current"] == 0
            else:                          # open tail version
                assert r["valid_to_lsn"] == -1
                assert r["is_current"] == 1
        else:                              # v2 row
            assert r["valid_from_lsn"] == 10_000_000 + doc_id + 1
            expect_open = doc_id % 7 != 0
            assert (r["valid_to_lsn"] == -1) == expect_open
            assert bool(r["is_current"]) == expect_open


def test_snapshot_bootstrap_then_stream(ray_session, tmp_lake):
    """snapshot_mode='initial' (≙ cdcsdk.source.snapshot.mode,
    README.md:138): bulk snapshot + streamed rounds 1-2 must converge to
    the same state as the full 3-round ingest; never-updated rows carry
    the snapshot op 'r'."""
    eng = CdcEngine(_cfg(tmp_lake, snapshot_mode="initial"))
    m = eng.run()
    assert m.committed_lsn == MAX_LSN - 1
    got = _state(eng)
    exp = _expected()
    pd.testing.assert_frame_equal(
        got[["repo", "path", "commit", "lang", "content"]], exp)
    # op provenance: updated rows are 'u' (streamed), the rest 'r'
    doc_ids = got["path"].str.extract(r"d(\d+)\.txt")[0].astype(int)
    assert (got.loc[doc_ids % 3 == 0, "op"] == "u").all()
    assert (got.loc[doc_ids % 3 != 0, "op"] == "r").all()
    # the snapshot range is fenced: re-running is a no-op
    got2 = _state(CdcEngine(_cfg(tmp_lake, snapshot_mode="initial")))
    pd.testing.assert_frame_equal(got, got2)


def test_snapshot_bootstrap_guards(ray_session, tmp_lake):
    """A second snapshot on a committed lake must refuse; stateless mode
    must refuse (no durable watermark)."""
    eng = CdcEngine(_cfg(tmp_lake, snapshot_mode="initial"))
    eng.bootstrap_snapshot()
    with pytest.raises(RuntimeError, match="refused"):
        CdcEngine(_cfg(tmp_lake, snapshot_mode="initial")).bootstrap_snapshot()
    with pytest.raises(ValueError, match="checkpointing"):
        CdcEngine(_cfg("/tmp/lake_snap_stateless",
                       snapshot_mode="initial",
                       checkpointing=False)).bootstrap_snapshot()


def test_snapshot_plus_compact_equals_full_ingest_bytes(ray_session, tmp_lake):
    """After compaction, the snapshot-bootstrapped lake's CURRENT-STATE
    rows equal the streamed lake's (op codes aside) — the two paths
    converge on identical content."""
    eng = CdcEngine(_cfg(tmp_lake, snapshot_mode="initial"))
    eng.run()
    eng.compact()
    got = _state(CdcEngine(_cfg(tmp_lake, snapshot_mode="initial")))
    pd.testing.assert_frame_equal(
        got[["repo", "path", "commit", "lang", "content"]], _expected())


def test_snapshot_mode_guards_in_run(ray_session, tmp_lake):
    """run() refuses invalid snapshot combinations instead of silently
    diverging: non-table sources, and until_lsn bounds that would
    truncate the consistent snapshot."""
    with pytest.raises(ValueError, match="requires source='table'"):
        CdcEngine(EngineConfig(lake_dir=tmp_lake, snapshot_mode="initial",
                               source="synth")).run()
    with pytest.raises(ValueError, match="truncates the initial snapshot"):
        CdcEngine(_cfg(tmp_lake, snapshot_mode="initial")).run(
            until_lsn=100)


# ---- incremental (ad-hoc) snapshot — DBLog chunk interleave ---------------

def _inc_cfg(lake, **kw):
    base = dict(start_lsn=OFFSET, incremental_snapshot=True,
                snapshot_chunk_rows=150)
    base.update(kw)
    return _cfg(lake, **base)


def test_incremental_snapshot_backfills_late_stream(ray_session, tmp_lake):
    """A stream attached at start_lsn=OFFSET (rounds 1-2 only, no inserts)
    plus an interleaved incremental snapshot converges to the SAME final
    state as a full replay: streamed events win LWW over snapshot-read
    rows, untouched keys backfill from the chunks."""
    eng = CdcEngine(_inc_cfg(tmp_lake))
    m = eng.run()
    assert m.snapshot_chunks_done == 4          # 500 docs / 150-row chunks
    df = _state(eng)
    pd.testing.assert_frame_equal(
        df[["repo", "path", "commit", "lang", "content"]], _expected())
    # DBLog ordering semantics, row-level: updated keys carry the streamed
    # event (op='u', round-1 lsn); never-streamed keys carry the snapshot
    # read (op='r', lsn = doc_id — one BELOW the skipped insert event)
    doc_id = df["path"].str.extract(r"d(\d+)\.txt")[0].astype(int)
    upd = doc_id % 3 == 0
    assert (df.loc[upd, "op"] == "u").all()
    assert (df.loc[~upd, "op"] == "r").all()
    assert (df.loc[upd, "lsn"] == OFFSET + doc_id[upd] + 1).all()
    assert (df.loc[~upd, "lsn"] == doc_id[~upd]).all()


def test_incremental_snapshot_crash_resume(ray_session, tmp_lake):
    """Kill mid-snapshot (after 1 window + 1 interleaved chunk); resume
    must finish the remaining chunks WITHOUT re-emitting finished ones
    and converge to the full-replay state."""
    from cdcsdk_server_ray.engine import CdcEngine as E
    from cdcsdk_server_ray.state.lineage import read_lineage

    m1 = E(_inc_cfg(tmp_lake)).run(max_windows=1)
    assert m1.snapshot_chunks_done == 1          # one chunk per window
    eng = E(_inc_cfg(tmp_lake))
    m2 = eng.run()                               # resume: 1 window + drain
    assert m2.snapshot_chunks_done == 4
    pd.testing.assert_frame_equal(
        _state(eng)[["repo", "path", "commit", "lang", "content"]],
        _expected())
    # no chunk was emitted twice: every chunk fragment appears exactly
    # once in lineage (a re-emitted chunk would repeat its paths), and
    # all 4 chunk windows are present
    lin = read_lineage(tmp_lake).to_pandas()
    snap = lin[lin.window_id >= CdcEngine.SNAPSHOT_WINDOW_BASE]
    assert snap.window_id.nunique() == 4
    assert not snap.duplicated(["fragment"]).any()


def test_incremental_snapshot_guards(ray_session, tmp_lake):
    with pytest.raises(ValueError, match="source='table'"):
        CdcEngine(EngineConfig(lake_dir=tmp_lake, num_partitions=4,
                               window_lsns=3000,
                               incremental_snapshot=True)).run(max_windows=1)
    with pytest.raises(ValueError, match="checkpointing"):
        CdcEngine(_inc_cfg(tmp_lake, checkpointing=False)).run(max_windows=1)
    with pytest.raises(ValueError, match="mutually exclusive"):
        CdcEngine(_inc_cfg(tmp_lake, snapshot_mode="initial",
                           start_lsn=0)).run(max_windows=1)


def test_conflicting_snapshot_config_refuses_before_side_effects(
        ray_session, tmp_lake):
    """The mutual-exclusion refusal must fire BEFORE bootstrap_snapshot
    runs: a fresh lake configured with BOTH strategies must stay fresh
    (no committed manifest, no fragments) — not get bulk-loaded and THEN
    refused, which would leave forked history behind the error."""
    import os

    from cdcsdk_server_ray.state.manifest import load_current_manifest

    with pytest.raises(ValueError, match="mutually exclusive"):
        CdcEngine(_inc_cfg(tmp_lake, snapshot_mode="initial",
                           start_lsn=0)).run(max_windows=1)
    assert load_current_manifest(tmp_lake) is None
    assert not os.path.isdir(os.path.join(tmp_lake, "fragments"))


def test_incremental_snapshot_chunk_width_is_fenced(ray_session, tmp_lake):
    """snapshot_chunk_rows is a per-lake invariant: resuming a mid-flight
    snapshot with a different width must REFUSE (chunks_done counts chunks
    of the ORIGINAL width — a wider resume would declare the snapshot
    complete and silently never backfill the rest)."""
    m1 = CdcEngine(_inc_cfg(tmp_lake)).run(max_windows=1)
    assert 0 < m1.snapshot_chunks_done < 4       # mid-flight
    assert m1.snapshot_chunk_rows == 150         # geometry pinned
    assert m1.snapshot_total_chunks == 4
    with pytest.raises(ValueError, match="chunk geometry is fixed"):
        CdcEngine(_inc_cfg(tmp_lake, snapshot_chunk_rows=4096)).run()
    # the original width resumes fine
    m2 = CdcEngine(_inc_cfg(tmp_lake)).run()
    assert m2.snapshot_chunks_done == 4


def test_incremental_snapshot_drain_span_equivalence(ray_session, tmp_path):
    """The idle-drain span width (snapshot_drain_chunks) is a pure
    execution-batching knob: one-chunk-per-execution and the default
    span must produce the SAME final state, the same chunk progress, and
    per-chunk lineage windows either way."""
    from cdcsdk_server_ray.state.lineage import read_lineage

    lakes, states, lins = [], [], []
    for i, span in enumerate((1, 16)):
        lake = str(tmp_path / f"lake{i}")
        eng = CdcEngine(_inc_cfg(lake, snapshot_drain_chunks=span))
        m = eng.run()
        assert m.snapshot_chunks_done == 4
        assert m.snapshot_complete
        lakes.append(lake)
        states.append(_state(eng))
        lin = read_lineage(lake).to_pandas()
        snap = lin[lin.window_id >= CdcEngine.SNAPSHOT_WINDOW_BASE]
        assert snap.window_id.nunique() == 4      # per-chunk lineage kept
        lins.append(snap)
    pd.testing.assert_frame_equal(
        states[0][["repo", "path", "commit", "lang", "content", "op",
                   "lsn"]],
        states[1][["repo", "path", "commit", "lang", "content", "op",
                   "lsn"]])
    # same per-chunk event accounting regardless of span width
    a = lins[0].groupby("window_id")["events_applied"].sum()
    b = lins[1].groupby("window_id")["events_applied"].sum()
    pd.testing.assert_series_equal(a, b)


def test_snapshot_complete_flag_persists_and_short_circuits(
        ray_session, tmp_lake):
    """Completion is recorded distinctly from progress: after the drain,
    the committed manifest carries snapshot_complete=True and a resume
    takes the fast path (no geometry re-derivation, still streams)."""
    from cdcsdk_server_ray.state.manifest import load_current_manifest

    CdcEngine(_inc_cfg(tmp_lake)).run()
    m = load_current_manifest(tmp_lake)
    assert m.snapshot_complete
    # resume on the finished lake: no refusal, no extra chunks
    m2 = CdcEngine(_inc_cfg(tmp_lake)).run()
    assert m2.snapshot_chunks_done == 4
    assert m2.snapshot_complete


def test_legacy_manifest_completed_snapshot_resume(ray_session, tmp_lake):
    """Migration path for pre-geometry-pin lakes whose snapshot already
    COMPLETED: plain resume refuses (width unknowable) but points at the
    width-assertion override; with it the cfg geometry is adopted and
    the resume short-circuits (nothing re-emitted)."""
    from cdcsdk_server_ray.state.manifest import (commit_manifest,
                                                  load_current_manifest)

    CdcEngine(_inc_cfg(tmp_lake)).run()
    # simulate a round-3 manifest: progress, no geometry, no flag
    m = load_current_manifest(tmp_lake)
    m.snapshot_chunk_rows = 0
    m.snapshot_d_min = 0
    m.snapshot_total_chunks = 0
    m.snapshot_complete = False
    prev = m.epoch
    m.epoch += 1
    commit_manifest(tmp_lake, m, expected_prev_epoch=prev)
    with pytest.raises(ValueError,
                       match="snapshot_resume_legacy_assume_cfg_width"):
        CdcEngine(_inc_cfg(tmp_lake)).run()
    m2 = CdcEngine(_inc_cfg(
        tmp_lake, snapshot_resume_legacy_assume_cfg_width=True)).run()
    assert m2.snapshot_chunks_done == 4          # nothing re-emitted
    assert m2.snapshot_complete
    got = _state(CdcEngine(_inc_cfg(tmp_lake)))
    pd.testing.assert_frame_equal(
        got[["repo", "path", "commit", "lang", "content"]], _expected())


def test_legacy_override_resumes_midflight_snapshot(ray_session, tmp_lake):
    """A MID-FLIGHT legacy snapshot under the honest width assertion
    RESUMES from chunks_done and backfills the remaining chunks — the
    unsound completeness INFERENCE (total recomputed under a wider cfg
    covering chunks_done) no longer exists, so no width can silently
    declare an incomplete backfill done."""
    from cdcsdk_server_ray.state.manifest import (commit_manifest,
                                                  load_current_manifest)

    CdcEngine(_inc_cfg(tmp_lake)).run(max_windows=1)   # 1 of 4 chunks
    m = load_current_manifest(tmp_lake)
    assert 0 < m.snapshot_chunks_done < 4
    m.snapshot_chunk_rows = 0
    m.snapshot_d_min = 0
    m.snapshot_total_chunks = 0
    prev = m.epoch
    m.epoch += 1
    commit_manifest(tmp_lake, m, expected_prev_epoch=prev)
    with pytest.raises(ValueError, match="no pinned chunk geometry"):
        CdcEngine(_inc_cfg(tmp_lake)).run()
    m2 = CdcEngine(_inc_cfg(
        tmp_lake, snapshot_resume_legacy_assume_cfg_width=True)).run()
    assert m2.snapshot_chunks_done == 4
    assert m2.snapshot_complete
    got = _state(CdcEngine(_inc_cfg(tmp_lake)))
    pd.testing.assert_frame_equal(
        got[["repo", "path", "commit", "lang", "content"]], _expected())


def test_doc_id_bounds_without_statistics(ray_session, tmp_path):
    """table_doc_id_bounds falls back to ONE column read per stats-less
    file (not one per row group) and still returns exact bounds."""
    import pyarrow as pa

    from cdcsdk_server_ray.sources.source_table import table_doc_id_bounds

    t = pa.table({"doc_id": pa.array(list(range(17, 900)), pa.int64()),
                  "text": pa.array(["x"] * 883)})
    p = str(tmp_path / "nostats.parquet")
    pq.write_table(t, p, row_group_size=100, write_statistics=False)
    assert pq.ParquetFile(p).metadata.num_row_groups > 1
    assert table_doc_id_bounds(p) == (17, 899)


def test_incremental_snapshot_survives_compact_and_log_backend(
        ray_session, tmp_lake):
    """Chunk progress must survive a mid-snapshot compaction (the chunk
    marker rides the manifest that compact() rewrites) and the 'log'
    offset backend (append-log commit path serializes the same field)."""
    cfg1 = _inc_cfg(tmp_lake, offset_backend="log")
    m1 = CdcEngine(cfg1).run(max_windows=1)
    assert m1.snapshot_chunks_done == 1
    eng = CdcEngine(cfg1)
    mc = eng.compact()                       # fold chunk deltas into bases
    assert mc.snapshot_chunks_done == 1      # marker preserved
    m2 = CdcEngine(cfg1).run()               # resume: finish stream+chunks
    assert m2.snapshot_chunks_done == 4
    pd.testing.assert_frame_equal(
        _state(CdcEngine(cfg1))[["repo", "path", "commit", "lang",
                                 "content"]], _expected())


def test_time_travel_counts_matches_bruteforce(ray_session):
    """Point-in-time live-row counts vs a pandas replay of the 3-round
    changelog at every probe LSN."""
    import numpy as np
    import pandas as pd

    from cdcsdk_server_ray.pipelines.cdc_queries import time_travel_counts
    from cdcsdk_server_ray.sources.source_table import MAX_LSN

    sf = "/root/testdata/sf0.001"
    got = time_travel_counts(sf)

    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "lang", "source"])
    ev = [docs.assign(op="c", lsn=docs["doc_id"] + 1)]
    u = docs[docs["doc_id"] % 3 == 0]
    ev.append(u.assign(op="u", lsn=10_000_000 + u["doc_id"] + 1))
    d = docs[docs["doc_id"] % 7 == 0]
    ev.append(d.assign(op="d", lsn=20_000_000 + d["doc_id"] + 1,
                       lang=None))
    ch = pd.concat(ev, ignore_index=True)
    rows = []
    for i in range(8):
        p = (i + 1) * MAX_LSN // 8
        live = (ch[ch["lsn"] <= p].sort_values("lsn")
                .groupby("doc_id").tail(1))
        live = live[live["op"] != "d"]
        for lang, n in live.groupby("lang").size().items():
            rows.append((p, lang, n))
    exp = pd.DataFrame(rows, columns=["probe_lsn", "lang", "n"]) \
        .sort_values(["probe_lsn", "lang"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"n": "int64"}),
        exp.astype({"probe_lsn": "int64", "n": "int64"}))


def test_view_maintenance_incremental_equals_recomputed(ray_session):
    """IVM invariant: the delta-maintained view equals the aggregate
    recomputed over final state, for ANY window partitioning."""
    import pandas as pd

    from cdcsdk_server_ray.pipelines.cdc_queries import view_maintenance

    sf = "/root/testdata/sf0.001"
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    live = docs[docs["doc_id"] % 7 != 0].copy()
    live["blen"] = live["text"].str.len() + \
        (live["doc_id"] % 3 == 0).astype(int) * 5
    exp = (live.groupby("lang").agg(n_rows=("doc_id", "count"),
                                    content_bytes=("blen", "sum"))
           .reset_index().sort_values("lang").reset_index(drop=True))
    outs = {nw: view_maintenance(sf, n_windows=nw) for nw in (1, 4, 7)}
    for nw, got in outs.items():
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True),
            exp.astype({"n_rows": "int64", "content_bytes": "int64"}),
            obj=f"n_windows={nw}")
