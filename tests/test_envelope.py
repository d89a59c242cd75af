"""Envelope SMT chain: unwrap/flatten roundtrip, routing, filtering.

Reference behaviors: FLATTEN chain wiring (ServerApp.java:167-185),
RegexRouter (EmbeddedEngineTest.java:437-441), filter-drop semantics
(Transformations.java:74-82).
"""

import numpy as np
import pyarrow as pa

from cdcsdk_server_ray.config import SynthConfig
from cdcsdk_server_ray.sources.changelog import (synth_envelope_batch,
                                                 synth_flat_batch)
from cdcsdk_server_ray.stages.envelope import (build_chain, drop_tombstones,
                                               filter_regex, flatten_chain,
                                               register_transform,
                                               route_destination)

CFG = SynthConfig(num_keys=200, max_versions=5)
LSNS = np.arange(1, 600)


def test_flatten_roundtrip_plain():
    env = synth_envelope_batch(CFG, LSNS, yb_wrap=False)
    flat = flatten_chain(yb=False)(env)
    ref = synth_flat_batch(CFG, LSNS).select(flat.column_names)
    assert flat.equals(ref)


def test_flatten_roundtrip_yb_wrapped():
    env = synth_envelope_batch(CFG, LSNS, yb_wrap=True)
    flat = flatten_chain(yb=True)(env)
    ref = synth_flat_batch(CFG, LSNS).select(flat.column_names)
    assert flat.equals(ref)


def test_unwrap_is_noop_on_plain_envelope():
    env = synth_envelope_batch(CFG, LSNS, yb_wrap=False)
    assert flatten_chain(yb=True)(env).equals(flatten_chain(yb=False)(env))


def test_drop_tombstones():
    flat = synth_flat_batch(CFG, LSNS)
    out = drop_tombstones(flat)
    assert "d" not in out["op"].to_pylist()
    assert out.num_rows < flat.num_rows


def test_route_destination_regex():
    flat = synth_flat_batch(CFG, LSNS)
    routed = route_destination(flat, pattern=r"^org(\d+)/", replacement=r"tenant\1.")
    assert "destination" in routed.column_names
    d0 = routed["destination"][0].as_py()
    assert d0.startswith("tenant") and "/" not in d0.split(".")[0]


def test_route_outbox_inserts_only_key_and_destination():
    from cdcsdk_server_ray.stages.envelope import route_outbox

    flat = synth_flat_batch(CFG, LSNS)
    out = route_outbox(flat)
    ins = flat.filter(pa.compute.equal(flat["op"], "c"))
    # only inserts survive (outbox tables are append-only; EventRouter
    # drops non-insert ops)
    assert out.num_rows == ins.num_rows > 0
    assert set(out["op"].to_pylist()) == {"c"}
    # destination = prefix + aggregate type; key = aggregate id (string)
    assert all(d == f"outbox.event.{r}" for d, r in
               zip(out["destination"].to_pylist(), out["repo"].to_pylist()))
    assert out["key"].to_pylist() == [str(p) for p in
                                      out["path"].to_pylist()]
    assert out["payload"].to_pylist() == out["content"].to_pylist()
    # composes in the chain via the registry
    chained = build_chain([("route_outbox", {"route_prefix": "ob."})])(flat)
    assert chained["destination"][0].as_py().startswith("ob.")


def test_filter_regex_drop_and_keep():
    flat = synth_flat_batch(CFG, LSNS)
    dropped = filter_regex(flat, "lang", "^py$")
    kept = filter_regex(flat, "lang", "^py$", keep_matches=True)
    # deletes have null lang → null match → treated as non-match (dropped by keep)
    assert kept.num_rows + dropped.num_rows == flat.num_rows
    assert set(kept["lang"].to_pylist()) == {"py"}


def test_chain_composition_and_registry():
    calls = []

    def tap(batch: pa.Table) -> pa.Table:
        calls.append(batch.num_rows)
        return batch

    register_transform("tap", tap)
    chain = build_chain(["unwrap", "flatten", "tap",
                         ("filter_regex", {"column": "op", "pattern": "^d$"})])
    env = synth_envelope_batch(CFG, LSNS, yb_wrap=True)
    out = chain(env)
    assert calls and calls[0] == out.num_rows + (calls[0] - out.num_rows)
    assert "d" not in out["op"].to_pylist()


def test_chain_keeps_schema_stable_on_empty():
    # A 0-row batch must still flow through every transform so its schema
    # matches non-empty blocks — otherwise Ray/Arrow block concat fails on
    # schema unification (e.g. a routed 'destination' column missing from
    # one block). The reference's per-record short-circuit
    # (Transformations.java:74-82) is about records, not batch schemas.
    seen = []

    def tag(batch):
        seen.append(batch.num_rows)
        return batch.append_column(
            "tag", pa.array(["x"] * batch.num_rows, pa.string()))

    register_transform("tag", tag)
    chain = build_chain([("filter_regex", {"column": "op", "pattern": ""}),
                         "tag"])
    flat = synth_flat_batch(CFG, LSNS[:10])
    out = chain(flat)  # pattern "" matches everything → 0 rows remain
    assert out.num_rows == 0
    assert "tag" in out.column_names   # schema identical to non-empty blocks
    assert seen == [0]                 # transform DID run on the empty batch
