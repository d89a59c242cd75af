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


def test_pearson_corr_matches_numpy(ray_session):
    import numpy as np
    import pandas as pd

    from cdcsdk_server_ray.pipelines.stats import pearson_corr

    got = pearson_corr(SF).to_pandas().iloc[0]
    df = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_quantity", "l_extendedprice",
                                  "l_discount"])
    assert got["n"] == len(df)
    assert got["corr_qty_price"] == round(
        float(np.corrcoef(df["l_quantity"], df["l_extendedprice"])[0, 1]), 6)
    assert got["corr_qty_disc"] == round(
        float(np.corrcoef(df["l_quantity"], df["l_discount"])[0, 1]), 6)


def test_group_zscore_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd

    from cdcsdk_server_ray.pipelines.stats import group_zscore_outliers

    got = group_zscore_outliers(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    st = ev.groupby("event_type")["value"].agg(["mean", lambda v: v.std(ddof=0)])
    st.columns = ["m", "sd"]
    ev = ev.merge(st, left_on="event_type", right_index=True)
    ev["z"] = np.round((ev["value"] - ev["m"]) / ev["sd"], 6)
    exp = (ev[np.abs(ev["z"]) > 1.5]
           [["event_id", "event_type", "value", "z"]]
           .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp, check_dtype=False)


def test_version_retention_keeps_newest_k(ray_session):
    import pandas as pd

    from cdcsdk_server_ray.pipelines.cdc_queries import version_retention

    got = version_retention(SF, keep=3).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev.sort_values(["user_id", "event_id"], ascending=[True, False])
    ev["version_rank"] = ev.groupby("user_id").cumcount() + 1
    exp = (ev[ev["version_rank"] <= 3]
           [["user_id", "version_rank", "event_id", "event_type", "value"]]
           .sort_values(["user_id", "version_rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp, check_dtype=False)
    assert (got.groupby("user_id").size() <= 3).all()


def test_group_quantiles_match_pandas(ray_session):
    from cdcsdk_server_ray.pipelines.stats import group_quantiles
    import pyarrow.parquet as pq
    sf = "/root/testdata/sf0.001"
    got = group_quantiles(sf).to_pandas()
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    for (lang, p), sub in got.set_index(["lang", "q_permille"]).iterrows():
        vals = np.sort(docs.loc[docs["lang"] == lang, "n_chars"].to_numpy())
        k = (p * len(vals) + 999) // 1000     # ceil(q*n), disc semantics
        assert sub["value"] == float(vals[k - 1]), (lang, p)


def test_quantile_sketch_error_bound(ray_session):
    """Sketch estimate within its declared relative error of the exact
    disc quantile (computed directly in pandas)."""
    from cdcsdk_server_ray.pipelines.stats import quantile_sketch
    sf = "/root/testdata/sf0.001"
    got = quantile_sketch(sf).to_pandas()
    vals = np.sort(pq.read_table(f"{sf}/orders.parquet")
                   .column("o_totalprice").to_numpy())
    for _, r in got.iterrows():
        k = (int(r["q_permille"]) * len(vals) + 999) // 1000
        exact = vals[k - 1]
        assert abs(r["value_est"] - exact) <= 0.011 * exact + 1e-9, \
            (r["q_permille"], r["value_est"], exact)


def test_dq_checks_flags_seeded_violations(ray_session):
    """The audit counts must equal direct pandas counts."""
    from cdcsdk_server_ray.pipelines.stats import dq_checks
    sf = "/root/testdata/sf0.001"
    got = dq_checks(sf).to_pandas().set_index("check")["violations"]
    ev = pq.read_table(f"{sf}/events.parquet").to_pandas()
    cust = pq.read_table(f"{sf}/customer.parquet").to_pandas()
    even = set(cust.loc[cust["c_custkey"] % 2 == 0, "c_custkey"])
    assert got["value_out_of_range"] == int(((ev["value"] < 0)
                                             | (ev["value"] > 90)).sum())
    assert got["event_type_unknown"] == int(
        (~ev["event_type"].isin(["click", "purchase", "view"])).sum())
    assert got["user_fk_missing"] == int((~ev["user_id"].isin(even)).sum())
    assert got["event_id_null"] == 0


def test_table_checksum_detects_single_row_drift(ray_session, tmp_path):
    """The consistency checksum: identical tables agree, a one-row edit
    flips EXACTLY the affected source's checksum (counts unchanged)."""
    import os
    import pandas as pd
    from cdcsdk_server_ray.pipelines.stats import table_checksum

    base = table_checksum(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    assert base["n_rows"].sum() == len(docs)

    # replica with one corrupted row
    drift = docs.copy()
    drift.loc[drift.index[0], "text"] = drift["text"].iloc[0] + " CORRUPT"
    bad_src = drift["source"].iloc[0]
    sf2 = tmp_path / "replica"
    os.makedirs(sf2)
    drift.to_parquet(sf2 / "documents.parquet")
    got = table_checksum(str(sf2)).to_pandas()

    m = base.merge(got, on="source", suffixes=("_a", "_b"))
    assert (m["n_rows_a"] == m["n_rows_b"]).all()
    diff = m[m["checksum_a"] != m["checksum_b"]]
    assert diff["source"].tolist() == [bad_src]


def test_dq_profile_matches_bruteforce(ray_session):
    """Column profile vs direct pandas aggregation of the same table."""
    import pandas as pd

    from cdcsdk_server_ray.pipelines.stats import dq_profile

    got = dq_profile(SF).set_index("col")
    df = pd.read_parquet(f"{SF}/orders.parquet")
    assert (got["n"] == len(df)).all()
    assert (got["nulls"] == 0).all()
    assert got.loc["o_orderkey", "vmin"] == str(df["o_orderkey"].min())
    assert got.loc["o_orderkey", "vmax"] == str(df["o_orderkey"].max())
    assert got.loc["o_totalprice", "vmin"] == str(
        int(round(df["o_totalprice"].min() * 100)))
    assert got.loc["o_orderdate", "vmax"] == df["o_orderdate"].max() \
        .isoformat(sep=" ")
    assert got.loc["o_orderstatus", "vmin"] == df["o_orderstatus"].min()


def test_group_regression_matches_numpy_lstsq(ray_session):
    """The integer-moment OLS equals numpy polyfit to float tolerance
    and the closed form exactly."""
    import numpy as np
    import pandas as pd

    from cdcsdk_server_ray.pipelines.stats import group_regression

    out = group_regression(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts", "value"])
    anchor = pd.Timestamp("2024-01-01").value // 1000
    x_all = (ev["ts"].astype("datetime64[us]").astype("int64")
             .to_numpy() - anchor) // 60_000_000
    y_all = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    for _, r in out.iterrows():
        m = (ev["event_type"] == r["event_type"]).to_numpy()
        x, y = x_all[m].astype(object), y_all[m].astype(object)
        n = int(m.sum())
        sx, sy = int(x.sum()), int(y.sum())
        sxy, sxx = int((x * y).sum()), int((x * x).sum())
        den = n * sxx - sx * sx
        assert r["slope_cents_per_min"] == float(n * sxy - sx * sy) / float(den)
        assert r["intercept_cents"] == float(sy * sxx - sx * sxy) / float(den)
        # and the closed form is the actual least-squares line
        slope_np, inter_np = np.polyfit(x_all[m].astype(float),
                                        y_all[m].astype(float), 1)
        assert abs(r["slope_cents_per_min"] - slope_np) < 1e-6
        assert abs(r["intercept_cents"] - inter_np) < 1e-3


def test_hll_estimate_within_expected_error(ray_session):
    """m=64 HLL raw estimate lands within the published ~1.04/sqrt(m)
    relative-error band (3 sigma) of the true distinct count, and the
    registers merge associatively (two half-table sketches max-merge to
    the full-table sketch)."""
    import numpy as np
    import pandas as pd

    from cdcsdk_server_ray.pipelines.stats import approx_distinct_hll

    out = approx_distinct_hll(SF)
    truth = pd.read_parquet(f"{SF}/lineitem.parquet",
                            columns=["l_partkey"])["l_partkey"].nunique()
    est = out["raw_estimate"].iloc[0]
    assert abs(est - truth) / truth < 3 * 1.04 / np.sqrt(64)

    # mergeability: recompute registers by hand over two halves
    import hashlib
    vals = pd.read_parquet(f"{SF}/lineitem.parquet",
                           columns=["l_partkey"])["l_partkey"].unique()
    halves = [vals[: len(vals) // 2], vals[len(vals) // 2:]]
    merged = np.zeros(64, dtype=np.int64)
    for half in halves:
        regs = np.zeros(64, dtype=np.int64)
        for v in half:
            h = int.from_bytes(
                hashlib.md5(str(v).encode()).digest()[8:], "little")
            w = h >> 6
            rho = 59 - w.bit_length() if w else 59
            regs[h & 63] = max(regs[h & 63], rho)
        merged = np.maximum(merged, regs)
    assert (merged == out["max_rho"].to_numpy()).all()


def test_mad_outliers_matches_bruteforce(ray_session):
    """Median/MAD/outlier counts equal a direct pandas computation
    under the same disc-median convention."""
    import pandas as pd

    from cdcsdk_server_ray.pipelines.stats import mad_outliers

    out = mad_outliers(SF).set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    c = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    for et in out.index:
        vals = np.sort(c[(ev["event_type"] == et).to_numpy()])
        n = len(vals)
        med = int(vals[(500 * n + 999) // 1000 - 1])
        dev = np.sort(np.abs(vals - med))
        mad = int(dev[(500 * n + 999) // 1000 - 1])
        assert out.loc[et, "median_value"] == med / 100.0
        assert out.loc[et, "mad_value"] == mad / 100.0
        assert out.loc[et, "n_outliers"] == int((np.abs(vals - med)
                                                 > 3 * mad).sum())


def test_group_quantiles_cont_matches_numpy(ray_session):
    """The exact-integer interpolation equals numpy's linear
    (type-7) quantile on the cents domain."""
    import pandas as pd

    from cdcsdk_server_ray.pipelines.stats import group_quantiles_cont

    out = group_quantiles_cont(SF).set_index(["event_type",
                                              "q_permille"])
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    c = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    for et in ev["event_type"].unique():
        vals = np.sort(c[(ev["event_type"] == et).to_numpy()])
        for p in (500, 900, 990):
            want = np.quantile(vals.astype(float), p / 1000,
                               method="linear") / 100.0
            got = out.loc[(et, p), "value"]
            assert abs(got - want) < 1e-9, (et, p, got, want)
