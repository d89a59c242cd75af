"""Changelog synthesis: determinism, op mix, oracle consistency.

Mirrors the reference's deterministic-source contract
(SimpleSourceConnector: same config ⇒ same records; resume regenerates
and skips — /root/reference/cdcsdk-engine/src/main/java/io/debezium/connector/simple/SimpleSourceConnector.java:143-175).
"""

import numpy as np
import pyarrow.compute as pc
import pytest

from cdcsdk_server_ray.config import SynthConfig
from cdcsdk_server_ray.sources.changelog import (expected_final_state,
                                                 synth_envelope_batch,
                                                 synth_flat_batch)

CFG = SynthConfig(num_keys=300, max_versions=6)


def test_pure_function_of_lsn():
    full = synth_flat_batch(CFG, np.arange(1, CFG.max_lsn))
    part = synth_flat_batch(CFG, np.arange(101, 301))
    lsns = set(part["lsn"].to_pylist())
    sub = full.filter(pc.is_in(full["lsn"], value_set=part["lsn"].combine_chunks()))
    assert sub.equals(part)
    # disjoint slices cover exactly once
    a = synth_flat_batch(CFG, np.arange(1, 500))
    b = synth_flat_batch(CFG, np.arange(500, CFG.max_lsn))
    assert a.num_rows + b.num_rows == full.num_rows


def test_op_sequence_per_key():
    full = synth_flat_batch(CFG, np.arange(1, CFG.max_lsn)).to_pandas()
    for (repo, path), g in full.sort_values("lsn").groupby(["repo", "path"]):
        ops = g["op"].tolist()
        assert ops[0] == "c", f"{repo}/{path} first op {ops}"
        # re-insert only ever directly after a delete
        for prev, cur in zip(ops, ops[1:]):
            if cur == "c":
                assert prev == "d"
        # deletes carry null payloads; others don't
        assert g.loc[g.op == "d", "content"].isna().all()
        assert g.loc[g.op != "d", "content"].notna().all()


def test_delete_payloads_null_and_insert_mix():
    t = synth_flat_batch(CFG, np.arange(1, CFG.max_lsn))
    ops = set(t["op"].to_pylist())
    assert ops == {"c", "u", "d"}


def test_expected_final_state_matches_brute_force():
    full = synth_flat_batch(CFG, np.arange(1, CFG.max_lsn)).to_pandas()
    last = (full.sort_values("lsn").groupby(["repo", "path"], as_index=False)
            .last())
    alive = last[last["op"] != "d"].sort_values(["repo", "path"])
    exp = expected_final_state(CFG).to_pandas()
    assert alive["commit"].tolist() == exp["commit"].tolist()
    assert alive["content"].tolist() == exp["content"].tolist()


def test_expected_final_state_prefix():
    # prefix replay oracle: only events with lsn < 500
    full = synth_flat_batch(CFG, np.arange(1, 500)).to_pandas()
    last = full.sort_values("lsn").groupby(["repo", "path"], as_index=False).last()
    alive = last[last["op"] != "d"].sort_values(["repo", "path"])
    exp = expected_final_state(CFG, upto_lsn=500).to_pandas()
    assert alive["commit"].tolist() == exp["commit"].tolist()


def test_envelope_schema():
    env = synth_envelope_batch(CFG, np.arange(1, 200), yb_wrap=False)
    assert {"key", "before", "after", "source", "op", "ts_ms"} <= set(env.column_names)
    env_yb = synth_envelope_batch(CFG, np.arange(1, 200), yb_wrap=True)
    at = env_yb["after"].type
    assert at.field(0).type.num_fields == 1
    assert at.field(0).type.field(0).name == "value"


def test_schema_evolution_variants():
    cfg = SynthConfig(num_keys=100, max_versions=5,
                      stars_add_lsn=200, stars_widen_lsn=400)
    t = synth_flat_batch(cfg, np.arange(1, cfg.max_lsn))
    assert "stars" in t.column_names
    df = t.to_pandas()
    early = df[df.lsn < 200]
    assert early["stars"].isna().all()
    late = df[(df.lsn >= 200) & (df.op != "d")]
    assert late["stars"].notna().all()
