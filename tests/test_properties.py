"""Property-based tests (hypothesis): the algebraic laws the engine's
correctness rests on, checked over randomized inputs — the
ConnectorOutputTest-style "any input, same invariant" discipline.

No Ray needed: these laws are pure Arrow/numpy kernels.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from cdcsdk_server_ray.stages.lww import drop_deleted, lww_reduce, merge_tables_lww
from cdcsdk_server_ray.stages.schema_evolution import (concat_unified, conform,
                                                       promote_types, unify)
from cdcsdk_server_ray.stages.validity import null_where

# ---- generators -----------------------------------------------------------

events = st.lists(
    st.tuples(st.integers(0, 8),           # key index
              st.integers(0, 6),           # key index part 2
              st.sampled_from(["c", "u", "d"])),
    min_size=1, max_size=120,
).map(lambda rows: pa.table({
    "repo": [f"r{a}" for a, _, _ in rows],
    "path": [f"p{b}" for _, b, _ in rows],
    "lsn": pa.array(range(1, len(rows) + 1), pa.int64()),
    "op": [op for _, _, op in rows],
    "content": [None if op == "d" else f"c-{a}-{b}-{i}"
                for i, (a, b, op) in enumerate(rows)],
}))


def _winners(t: pa.Table) -> dict:
    out = {}
    for row in t.to_pylist():
        out.setdefault((row["repo"], row["path"]), row)
        if row["lsn"] > out[(row["repo"], row["path"])]["lsn"]:
            out[(row["repo"], row["path"])] = row
    return out


# ---- LWW laws -------------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(events)
def test_lww_reduce_is_per_key_argmax(t):
    got = {(r["repo"], r["path"]): r for r in lww_reduce(t).to_pylist()}
    assert got == _winners(t)


@settings(max_examples=60, deadline=None)
@given(events, st.integers(1, 5))
def test_lww_split_invariance(t, k):
    """Reducing any block-partitioning then merging equals reducing whole —
    the law that makes batch-local combining + shuffle + final merge (and
    salting) exact."""
    n = t.num_rows
    cuts = sorted({0, n} | {(n * i) // k for i in range(1, k)})
    parts = [t.slice(lo, hi - lo) for lo, hi in zip(cuts, cuts[1:]) if hi > lo]
    two_level = merge_tables_lww([lww_reduce(p) for p in parts])
    assert _winners(two_level) == _winners(lww_reduce(t))


@settings(max_examples=40, deadline=None)
@given(events)
def test_counted_reduce_conserves_events(t):
    w = lww_reduce(t, count_col="n_events")
    assert sum(w["n_events"].to_pylist()) == t.num_rows
    # two-level counting also conserves
    half = t.num_rows // 2
    if half:
        a = lww_reduce(t.slice(0, half), count_col="n_events")
        b = lww_reduce(t.slice(half), count_col="n_events")
        w2 = lww_reduce(concat_unified([a, b]), count_col="n_events")
        assert sum(w2["n_events"].to_pylist()) == t.num_rows


@settings(max_examples=40, deadline=None)
@given(events)
def test_tombstone_winners_are_dropped_exactly(t):
    final = drop_deleted(lww_reduce(t))
    expect = {k: v for k, v in _winners(t).items() if v["op"] != "d"}
    assert {(r["repo"], r["path"]) for r in final.to_pylist()} == set(expect)


# ---- schema promotion laws ------------------------------------------------

NUMERICS = [pa.int8(), pa.int16(), pa.int32(), pa.int64(),
            pa.float32(), pa.float64()]


@settings(max_examples=60, deadline=None)
@given(st.sampled_from(NUMERICS), st.sampled_from(NUMERICS))
def test_promotion_commutative_and_idempotent(a, b):
    assert promote_types(a, b) == promote_types(b, a)
    assert promote_types(a, a) == a
    p = promote_types(a, b)
    assert promote_types(p, a) == p and promote_types(p, b) == p  # absorbing


@settings(max_examples=30, deadline=None)
@given(st.lists(st.sampled_from(NUMERICS), min_size=1, max_size=4))
def test_conform_then_concat_roundtrips_values(types):
    tables = [pa.table({"k": pa.array([i], pa.int64()),
                        "v": pa.array([i + 1], t if not pa.types.is_floating(t)
                                      else t)})
              for i, t in enumerate(types)]
    target = unify([t.schema for t in tables])
    merged = concat_unified(tables)
    assert merged.num_rows == len(tables)
    assert [int(v) for v in merged["v"].to_pylist()] == \
        [i + 1 for i in range(len(tables))]
    for t in tables:
        assert conform(t, target).schema.equals(target)


# ---- zero-copy validity law ----------------------------------------------

@settings(max_examples=60, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=8)), min_size=1,
                max_size=64),
       st.data())
def test_null_where_equals_if_else(values, data):
    import pyarrow.compute as pc
    arr = pa.array(values, pa.string())
    mask = np.array(data.draw(st.lists(st.booleans(), min_size=len(values),
                                       max_size=len(values))))
    got = null_where(arr, mask)
    want = pc.if_else(pa.array(mask), pa.scalar(None, pa.string()), arr)
    assert got.to_pylist() == want.to_pylist()


@given(st.lists(
    st.tuples(st.one_of(st.none(), st.integers(-2**63, 2**63 - 1)),
              st.one_of(st.none(), st.text(max_size=24)),
              st.one_of(st.none(),
                        st.floats(allow_nan=False, width=64)),
              st.one_of(st.none(), st.booleans()),
              st.one_of(st.none(), st.binary(max_size=24))),
    min_size=1, max_size=32))
@settings(max_examples=60, deadline=None)
def test_avro_roundtrip_property(rows):
    """Avro binary encode/decode is lossless for every nullable flat
    record the schema admits (zigzag extremes, unicode, ±0.0, empty
    bytes)."""
    import pyarrow as pa

    from cdcsdk_server_ray.stages.avro import (avro_schema, decode_record,
                                               encode_batch)
    cols = list(zip(*rows))
    t = pa.table({
        "i": pa.array(cols[0], pa.int64()),
        "s": pa.array(cols[1], pa.string()),
        "f": pa.array(cols[2], pa.float64()),
        "b": pa.array(cols[3], pa.bool_()),
        "y": pa.array(cols[4], pa.binary()),
    })
    sj = avro_schema(t.schema)
    for idx, payload in enumerate(encode_batch(t)):
        rec = decode_record(payload, sj)
        for name in t.column_names:
            exp = t[name][idx].as_py()
            got = rec[name]
            if isinstance(exp, float):
                assert got == exp or (got != got and exp != exp)
            else:
                assert got == exp


def test_schema_registry_roundtrip_and_idempotency(tmp_path):
    """Registry analogue (ConvertingEngineBuilder.java:207-226): same
    schema registers to the same id from any writer with no coordination;
    framed messages decode back through an id → schema lookup."""
    import pyarrow as pa

    from cdcsdk_server_ray.stages.avro import avro_schema, decode_record
    from cdcsdk_server_ray.stages.schema_registry import (SchemaRegistry,
                                                          to_avro_registry,
                                                          unframe)

    root = str(tmp_path / "registry")
    batch = pa.table({"repo": ["r1", None], "stars": pa.array([5, None],
                                                              pa.int64())})
    out = to_avro_registry(batch, registry_root=root, subject="s1")
    msgs = out["payload"].to_pylist()
    assert len(msgs) == 2

    reg = SchemaRegistry(root)
    sid, body = unframe(msgs[0])
    schema_json = reg.get(sid)
    assert decode_record(body, schema_json) == {"repo": "r1", "stars": 5}
    sid2, body2 = unframe(msgs[1])
    assert sid2 == sid                        # same writer schema, same id
    assert decode_record(body2, schema_json) == {"repo": None, "stars": None}

    # idempotent + content-addressed: a second writer (fresh registry
    # handle, same schema) computes the identical id; a DIFFERENT schema
    # gets a different id and the subject records both versions
    same = SchemaRegistry(root).register("s1", avro_schema(batch.schema))
    assert same == sid
    other = pa.table({"x": pa.array([1.0], pa.float64())})
    sid3 = SchemaRegistry(root).register("s1", avro_schema(other.schema))
    assert sid3 != sid
    assert set(reg.versions("s1")) == {sid, sid3}
