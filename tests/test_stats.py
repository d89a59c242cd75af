"""KMV distinct-count sketch + exact streaming quantiles vs brute force
and DuckDB at sf0.001 (the driver also oracle-checks both at sf0.01)."""

import duckdb
import numpy as np
import pyarrow.parquet as pq

from cdcsdk_server_ray.pipelines.stats import (approx_distinct_kmv,
                                               value_quantiles)

SF = "/root/testdata/sf0.001"


def test_kmv_sketch_matches_bruteforce_and_bounds_error(ray_session):
    got = approx_distinct_kmv(SF, k=256).to_pandas()
    x = pq.read_table(f"{SF}/lineitem.parquet",
                      columns=["l_partkey"])["l_partkey"].to_numpy()
    h = np.unique((x.astype(np.uint64) * np.uint64(2654435761))
                  % np.uint64(2**32))
    true_distinct = len(np.unique(x))
    assert len(got) == 1
    row = got.iloc[0]
    # the distributed sketch equals the single-pass sketch exactly
    if len(h) >= 256:
        assert row["k_used"] == 256
        assert row["kth_hash"] == int(h[:256][-1])
        assert row["estimate"] == round(255 * 4294967296.0 / h[255], 6)
        # KMV relative error ~1/sqrt(k) = 6.25%; allow 4 sigma
        assert abs(row["estimate"] - true_distinct) / true_distinct < 0.25
    else:
        assert row["k_used"] == len(h) and row["estimate"] == len(h)


def test_quantiles_match_duckdb_quantile_disc(ray_session):
    got = value_quantiles(SF).to_pandas().set_index("q_permille")
    con = duckdb.connect()
    for p in (500, 900, 990):
        exp = con.execute(
            f"SELECT quantile_disc(value, {p / 1000}) "
            f"FROM '{SF}/events.parquet'").fetchone()[0]
        assert got.loc[p, "value"] == float(exp), f"q={p}"
