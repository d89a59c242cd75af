"""GoldenHarness — the reusable record-then-verify framework
(≙ ConnectorOutputTest.java:76-170: record on first run, verify later,
ignored fields, ${variable} substitution, restart legs)."""

import pandas as pd
import pyarrow as pa
import pytest

from cdcsdk_server_ray.testing.golden import GoldenHarness


def _result(ts="2024-01-01T00:00:00", host="db1"):
    return pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "name": pa.array(["a", "b"]),
        "server": pa.array([host, host]),
        "processed_at": pa.array([ts, ts]),
    })


def test_record_then_verify_roundtrip(tmp_path):
    h = GoldenHarness(str(tmp_path / "g.jsonl"))
    assert h.record_or_verify(_result()) == "recorded"
    assert h.record_or_verify(_result()) == "verified"
    with pytest.raises(AssertionError, match="record 1 differs"):
        h.verify(pa.table({
            "id": pa.array([1, 2], pa.int64()),
            "name": pa.array(["a", "CHANGED"]),
            "server": pa.array(["db1", "db1"]),
            "processed_at": pa.array(["2024-01-01T00:00:00"] * 2),
        }))


def test_ignored_fields_mask_run_variation(tmp_path):
    """Run-varying columns (processing timestamps) must not fail the
    compare when declared ignored — and must still be PRESENT in the
    fixture (shape checked, value masked)."""
    h = GoldenHarness(str(tmp_path / "g.jsonl"),
                      ignored_fields=("processed_at",))
    h.record(_result(ts="2024-01-01T00:00:00"))
    h.verify(_result(ts="2099-12-31T23:59:59"))     # differs, masked
    with open(h.fixture_path) as f:
        assert "<ignored>" in f.read()


def test_variable_substitution(tmp_path):
    """${variable} placeholders: record-time reverse substitution makes
    the fixture environment-independent; verify-time substitution fills
    in the current environment's values (the server_uuid mechanism)."""
    rec = GoldenHarness(str(tmp_path / "g.jsonl"),
                        variables={"SERVER": "db1"})
    rec.record(_result(host="db1"))
    with open(rec.fixture_path) as f:
        content = f.read()
    assert "${SERVER}" in content and "db1" not in content
    # a different environment verifies with its own value
    ver = GoldenHarness(str(tmp_path / "g.jsonl"),
                        variables={"SERVER": "db9"})
    ver.verify(_result(host="db9"))
    with pytest.raises(AssertionError):
        ver.verify(_result(host="db1"))


def test_restart_legs_pin_resume_boundary(ray_session, tmp_path):
    """The restart-command analogue: legs = engine run to a mid-stream
    stop, then the resumed run's DELTA. A resume that replayed or
    skipped records would change a leg's record count and fail."""
    import shutil

    from cdcsdk_server_ray.config import EngineConfig, SynthConfig
    from cdcsdk_server_ray.engine import CdcEngine

    lake = str(tmp_path / "lake")
    cfg = EngineConfig(lake_dir=lake, num_partitions=4, window_lsns=1500,
                       synth=SynthConfig(num_keys=500, max_versions=4))

    def state():
        df = CdcEngine(cfg).current_state().to_pandas()
        return (df.sort_values(["repo", "path"]).reset_index(drop=True)
                [["repo", "path", "commit", "op", "lsn"]])

    CdcEngine(cfg).run(max_windows=1)
    leg1 = state()
    CdcEngine(cfg).run()                     # resume to completion
    leg2 = state()

    h = GoldenHarness(str(tmp_path / "engine.jsonl"))
    assert h.record_or_verify(leg1, leg2) == "recorded"

    # replay from scratch into a fresh lake: identical legs must verify
    shutil.rmtree(lake)
    CdcEngine(cfg).run(max_windows=1)
    r1 = state()
    CdcEngine(cfg).run()
    r2 = state()
    assert h.record_or_verify(r1, r2) == "verified"
    # a moved restart boundary (extra leg) is a shape failure
    with pytest.raises(AssertionError, match="legs"):
        h.verify(r1, r2, r2)


def test_dataset_and_dataframe_inputs(ray_session, tmp_path):
    import ray.data
    df = pd.DataFrame({"x": [1, 2, 3], "y": ["a", "b", "c"]})
    h = GoldenHarness(str(tmp_path / "ds.jsonl"))
    h.record(ray.data.from_pandas(df))
    h.verify(df)                             # DataFrame vs Dataset parity
