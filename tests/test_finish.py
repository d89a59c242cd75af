"""finish_sorted: the size-guarded final sort must order identically on
both paths (one-task kernel below the byte bound, Dataset.sort above)
and preserve schema on empty results."""

import numpy as np
import pandas as pd

from cdcsdk_server_ray.stages.finish import finish_sorted


def _mk(n: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "k": rng.permutation(n).astype(np.int64),
        "grp": (np.arange(n) % 5).astype(np.int64),
        "v": rng.standard_normal(n).round(6)})


def test_small_path_sorts_in_one_block(ray_session):
    import ray.data
    df = _mk(5000)
    ds = ray.data.from_pandas(df).repartition(16)
    out = finish_sorted(ds, "k")
    got = out.to_pandas()
    exp = df.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    assert out.materialize().num_blocks() == 1


def test_large_path_matches_small_path(ray_session):
    import ray.data
    df = _mk(5000, seed=11)
    ds = ray.data.from_pandas(df).repartition(16)
    # force the distributed branch with a 1-byte bound
    big = finish_sorted(ds, ["grp", "k"], bound_bytes=1).to_pandas()
    small = finish_sorted(ds, ["grp", "k"]).to_pandas()
    pd.testing.assert_frame_equal(big.reset_index(drop=True), small)


def test_empty_result_keeps_schema(ray_session):
    # Dataset-level schema must survive (ray's to_pandas drops columns
    # on ANY empty dataset — pre-existing Ray behavior, not ours)
    import ray.data
    df = _mk(64).iloc[:0]
    ds = ray.data.from_pandas(df)
    out = finish_sorted(ds, "k")
    assert out.count() == 0
    assert out.schema().names == ["k", "grp", "v"]
