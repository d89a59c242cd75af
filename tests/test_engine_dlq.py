"""Dead-letter routing: poison events are fenced + routed EXACTLY ONCE
into dlq/ fragments committed through the same epoch fence as the
deltas (≙ Kafka Connect errors.deadletterqueue; the reference's http
sink SKIPS failed records instead — HttpChangeConsumer.java:96-124)."""

import filecmp
import os
import shutil

import numpy as np
import pandas as pd
import pytest

from cdcsdk_server_ray.config import EngineConfig, SynthConfig
from cdcsdk_server_ray.engine import CdcEngine

BOUND = 400


def _mk(lake, **kw):
    synth = SynthConfig(num_keys=2000, max_versions=6)
    cfg = EngineConfig(lake_dir=lake, num_partitions=8, window_lsns=3000,
                       synth=synth, dlq_max_content_bytes=BOUND, **kw)
    return cfg


def _pure_events(cfg) -> pd.DataFrame:
    """Driver-side pure regeneration of the full flat event stream."""
    from cdcsdk_server_ray.sources.changelog import changelog_dataset
    df = changelog_dataset(cfg.synth, 1, cfg.synth.max_lsn,
                           mode="flat").to_pandas()
    blen = df["content"].map(
        lambda c: len(c.encode()) if isinstance(c, str) else 0)
    df["poison"] = blen > BOUND
    return df


def _expected_clean_state(events: pd.DataFrame) -> pd.DataFrame:
    clean = events[~events["poison"]]
    win = (clean.sort_values("lsn").groupby(["repo", "path"],
                                            sort=False).tail(1))
    win = win[win["op"] != "d"]
    return (win.sort_values(["repo", "path"])
            [["repo", "path", "lsn", "content"]].reset_index(drop=True))


def test_dlq_exactly_once_across_kill_resume(ray_session, tmp_path):
    lake = str(tmp_path / "lake")
    cfg = _mk(lake)
    CdcEngine(cfg).run(max_windows=2)          # crash mid-stream
    eng = CdcEngine(cfg)
    m = eng.run()                              # fresh-process resume

    events = _pure_events(cfg)
    poison = events[events["poison"]]

    dlq = eng.current_dlq().to_pandas()
    # exactly once: every poison event present once, nothing else
    assert len(dlq) == len(poison)
    assert sorted(dlq["lsn"]) == sorted(poison["lsn"])
    assert (dlq["dlq_reason"] == "content_too_large").all()
    assert sum(p.dlq_drops for p in m.partitions.values()) == len(poison)

    # the lake state is the LWW over CLEAN events only
    got = (eng.current_state().to_pandas()
           .sort_values(["repo", "path"])
           [["repo", "path", "lsn", "content"]].reset_index(drop=True))
    exp = _expected_clean_state(events)
    pd.testing.assert_frame_equal(got, exp)


def test_dlq_replay_byte_identity(ray_session, tmp_path):
    lakes = [str(tmp_path / "a"), str(tmp_path / "b")]
    for lake in lakes:
        CdcEngine(_mk(lake)).run()
    for root, _, files in os.walk(os.path.join(lakes[0], "dlq")):
        for f in files:
            a = os.path.join(root, f)
            b = a.replace(lakes[0], lakes[1], 1)
            assert os.path.exists(b), f"missing replica dlq file {b}"
            assert filecmp.cmp(a, b, shallow=False), f"dlq bytes differ: {f}"


def test_dlq_same_under_both_exchanges(ray_session, tmp_path):
    outs = {}
    for ex in ("staged", "groupby"):
        lake = str(tmp_path / ex)
        eng = CdcEngine(_mk(lake, exchange=ex))
        eng.run()
        outs[ex] = (eng.current_dlq().to_pandas()
                    .sort_values("lsn").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs["staged"], outs["groupby"])
    assert len(outs["staged"]) > 0


def test_dlq_survives_compaction(ray_session, tmp_path):
    lake = str(tmp_path / "lake")
    eng = CdcEngine(_mk(lake))
    eng.run()
    before = eng.current_dlq().to_pandas().sort_values("lsn") \
        .reset_index(drop=True)
    eng.compact()
    after = CdcEngine(_mk(lake)).current_dlq().to_pandas() \
        .sort_values("lsn").reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)
    assert len(after) > 0


def test_dlq_disabled_is_exact_noop(ray_session, tmp_path):
    """Without the knob the engine state equals the no-DLQ oracle and
    current_dlq is empty."""
    import hashlib

    from cdcsdk_server_ray.sources.changelog import expected_final_state

    lake = str(tmp_path / "lake")
    synth = SynthConfig(num_keys=2000, max_versions=6)
    cfg = EngineConfig(lake_dir=lake, num_partitions=8, window_lsns=3000,
                       synth=synth)
    eng = CdcEngine(cfg)
    eng.run()
    assert eng.current_dlq().count() == 0
    got = (eng.current_state().to_pandas()
           .sort_values(["repo", "path"]).reset_index(drop=True))
    exp = expected_final_state(cfg.synth).to_pandas().reset_index(drop=True)
    h = lambda df: [hashlib.sha256((c or "").encode()).hexdigest()
                    for c in df["content"]]
    assert h(got) == h(exp)


def test_all_engine_features_compose_across_kill_resume(ray_session,
                                                        tmp_path):
    """DLQ + mid-stream schema evolution + engine view maintenance all
    on, with a crash/resume: each feature keeps its own contract —
    state = LWW over CLEAN events (with evolved columns + null
    back-fill), DLQ = the pure poison set exactly once, and the view
    keeps STREAM semantics (it aggregates the changelog, so poison
    events still count — routing is a sink-side decision)."""
    from cdcsdk_server_ray.sources.changelog import expected_final_state

    synth = SynthConfig(num_keys=2000, max_versions=6,
                        stars_add_lsn=3000, stars_widen_lsn=8000)
    lake = str(tmp_path / "lake")
    cfg = EngineConfig(lake_dir=lake, num_partitions=8, window_lsns=3000,
                       synth=synth, dlq_max_content_bytes=BOUND,
                       view_maintenance=True)
    CdcEngine(cfg).run(max_windows=2)          # crash mid-stream
    eng = CdcEngine(cfg)
    eng.run()

    events = _pure_events(cfg)
    poison = events[events["poison"]]

    # 1. dlq exact
    dlq = eng.current_dlq().to_pandas()
    assert sorted(dlq["lsn"]) == sorted(poison["lsn"])

    # 2. state = clean LWW, evolved schema intact
    got = eng.current_state().to_pandas().sort_values(["repo", "path"])
    assert "stars" in got.columns and got["stars"].dtype == "float64"
    exp = _expected_clean_state(events)
    pd.testing.assert_frame_equal(
        got[["repo", "path", "lsn", "content"]].reset_index(drop=True),
        exp)
    # evolution null back-fill holds on the CLEAN winners too
    assert got.loc[got["lsn"] < 3000, "stars"].isna().all()
    assert got.loc[got["lsn"] >= 3000, "stars"].notna().all()

    # 3. view = stream aggregate over ALL events (pre-DLQ semantics)
    exp_t = expected_final_state(synth).to_pandas()
    want = (exp_t.assign(blen=exp_t["content"].str.len())
            .groupby("lang")
            .agg(n_rows=("content", "count"),
                 content_bytes=("blen", "sum"))
            .reset_index().sort_values("lang").reset_index(drop=True)
            .astype({"n_rows": "int64", "content_bytes": "int64"}))
    pd.testing.assert_frame_equal(eng.current_view(), want)
