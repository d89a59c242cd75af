"""User-supplied Parquet changelog ingestion (source='parquet_changelog')."""

import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cdcsdk_server_ray.config import EngineConfig
from cdcsdk_server_ray.engine import CdcEngine

EVENTS = "/tmp/user_changelog.parquet"


def _write_changelog():
    rows = []
    # 100 keys inserted, %4 updated, %10 deleted — arbitrary user feed
    for k in range(100):
        rows.append((k + 1, "c", "repoA", f"f{k}.py", f"sha-{k}-v1",
                     "py", f"content {k} v1"))
    for k in range(0, 100, 4):
        rows.append((1000 + k, "u", "repoA", f"f{k}.py", f"sha-{k}-v2",
                     "py", f"content {k} v2"))
    for k in range(0, 100, 10):
        rows.append((2000 + k, "d", "repoA", f"f{k}.py", None, None, None))
    t = pa.table({
        "lsn": pa.array([r[0] for r in rows], pa.int64()),
        "op": pa.array([r[1] for r in rows]),
        "repo": pa.array([r[2] for r in rows]),
        "path": pa.array([r[3] for r in rows]),
        "commit": pa.array([r[4] for r in rows]),
        "lang": pa.array([r[5] for r in rows]),
        "content": pa.array([r[6] for r in rows]),
    })
    pq.write_table(t, EVENTS)


def _expected():
    exp = {}
    for k in range(100):
        exp[f"f{k}.py"] = f"content {k} v1"
    for k in range(0, 100, 4):
        exp[f"f{k}.py"] = f"content {k} v2"
    for k in range(0, 100, 10):
        exp.pop(f"f{k}.py")
    return exp


def _state(lake, **kw):
    cfg = EngineConfig(lake_dir=lake, num_partitions=4, window_lsns=500,
                       source="parquet_changelog", source_table=EVENTS, **kw)
    return cfg


def test_user_changelog_full_ingest(ray_session):
    _write_changelog()
    lake = "/tmp/lake_user_cl"
    shutil.rmtree(lake, ignore_errors=True)
    eng = CdcEngine(_state(lake))
    m = eng.run()
    got = eng.current_state().to_pandas()
    exp = _expected()
    assert dict(zip(got["path"], got["content"])) == exp
    assert m.committed_lsn == 2090   # max lsn in the feed


def test_user_changelog_windowed_resume(ray_session):
    _write_changelog()
    lake = "/tmp/lake_user_cl_resume"
    shutil.rmtree(lake, ignore_errors=True)
    CdcEngine(_state(lake)).run(max_windows=1)      # inserts only
    snap = CdcEngine(_state(lake)).current_state().to_pandas()
    assert len(snap) == 100 and (snap["op"] == "c").all()
    CdcEngine(_state(lake)).run()                   # resume to the end
    got = CdcEngine(_state(lake)).current_state().to_pandas()
    assert dict(zip(got["path"], got["content"])) == _expected()
