"""LWW reduce + partitioning: correctness vs pandas oracle, associativity,
salt/partition stability, schema-evolution merge."""

import numpy as np
import pyarrow as pa

from cdcsdk_server_ray.config import SynthConfig
from cdcsdk_server_ray.sources.changelog import synth_flat_batch
from cdcsdk_server_ray.stages.lww import (drop_deleted, lww_reduce,
                                          merge_tables_lww)
from cdcsdk_server_ray.stages.partition import (add_partition_column,
                                                add_salt_column, key_hash)
from cdcsdk_server_ray.stages.schema_evolution import (concat_unified, conform,
                                                       promote_types, unify)

CFG = SynthConfig(num_keys=500, max_versions=6)
FULL = synth_flat_batch(CFG, np.arange(1, CFG.max_lsn))


def _oracle_lww(table: pa.Table):
    # NB: not groupby().last() — pandas' last() skips NaNs and would
    # resurrect pre-delete values on tombstone winners
    df = table.to_pandas().sort_values("lsn")
    return (df.drop_duplicates(subset=["repo", "path"], keep="last")
            .sort_values(["repo", "path"]).reset_index(drop=True))


def test_lww_reduce_matches_pandas_oracle():
    got = lww_reduce(FULL).to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    want = _oracle_lww(FULL)
    assert got["lsn"].tolist() == want["lsn"].tolist()
    assert got["commit"].tolist() == want["commit"].tolist()


def test_lww_is_associative_over_splits():
    # split → reduce each → merge-reduce == reduce whole
    n = FULL.num_rows
    parts = [FULL.slice(0, n // 3), FULL.slice(n // 3, n // 3),
             FULL.slice(2 * (n // 3))]
    two_level = merge_tables_lww([lww_reduce(p) for p in parts])
    one_level = lww_reduce(FULL)
    a = two_level.sort_by([("repo", "ascending"), ("path", "ascending")])
    b = one_level.sort_by([("repo", "ascending"), ("path", "ascending")])
    assert a.equals(b.select(a.column_names))


def test_drop_deleted():
    final = drop_deleted(lww_reduce(FULL))
    assert "d" not in final["op"].to_pylist()


def test_partition_and_salt_stability():
    t1 = add_partition_column(FULL, 16)
    t2 = add_partition_column(FULL.slice(100, 50), 16)
    joined = t1.to_pandas().merge(
        t2.to_pandas()[["lsn", "partition_id"]], on="lsn", suffixes=("", "_b"))
    assert (joined["partition_id"] == joined["partition_id_b"]).all()
    # same key ⇒ same partition and same salt
    s = add_salt_column(add_partition_column(FULL, 16), 16, 4).to_pandas()
    per_key = s.groupby(["repo", "path"])[["partition_id", "salt"]].nunique()
    assert (per_key == 1).all().all()
    assert s["partition_id"].between(0, 15).all()
    assert s["salt"].between(0, 3).all()


def test_key_hash_spreads():
    h = key_hash(FULL["repo"], FULL["path"])
    pids = h % np.uint64(16)
    counts = np.bincount(pids.astype(int), minlength=16)
    assert (counts > 0).all()


def test_promotion_lattice():
    assert promote_types(pa.int32(), pa.int64()) == pa.int64()
    assert promote_types(pa.int64(), pa.float32()) == pa.float64()
    assert promote_types(pa.int64(), pa.float64()) == pa.float64()
    assert promote_types(pa.string(), pa.large_string()) == pa.large_string()
    assert promote_types(pa.float32(), pa.float32()) == pa.float32()


def test_unify_conform_concat_evolved_schemas():
    t1 = pa.table({"repo": ["a"], "path": ["p"], "lsn": [1],
                   "stars": pa.array([3], pa.int64())})
    t2 = pa.table({"repo": ["a"], "path": ["p"], "lsn": [2],
                   "stars": pa.array([4.5], pa.float64()), "extra": ["x"]})
    u = unify([t1.schema, t2.schema])
    assert u.field("stars").type == pa.float64()
    merged = concat_unified([t1, t2])
    assert merged.num_rows == 2
    assert merged["extra"].to_pylist() == [None, "x"]
    win = lww_reduce(merged)
    assert win["stars"].to_pylist() == [4.5]
    c = conform(t1, u)
    assert c.schema.equals(u)


def test_embedded_separator_keys_do_not_collide():
    """('a\\x1fb','c') and ('a','b\\x1fc') are DISTINCT keys: the joined
    form escapes literal \\x1f so neither LWW nor partitioning merges
    them — and separator-free keys keep their exact pre-escape bytes, so
    existing lakes' partition placement is unchanged."""
    import pyarrow as pa

    from cdcsdk_server_ray.stages.lww import lww_reduce
    from cdcsdk_server_ray.stages.partition import key_hash

    t = pa.table({
        "repo": ["a\x1fb", "a", "plain"],
        "path": ["c", "b\x1fc", "p"],
        "lsn": [1, 2, 3],
        "content": ["x", "y", "z"],
        "op": ["c", "c", "c"],
    })
    out = lww_reduce(t)
    assert out.num_rows == 3                  # no silent merge
    h = key_hash(t["repo"], t["path"])
    assert h[0] != h[1]                       # distinct hashes too
    # separator-free keys hash exactly as before escaping existed
    h2 = key_hash(pa.array(["plain"]), pa.array(["p"]))
    assert h[2] == h2[0]
