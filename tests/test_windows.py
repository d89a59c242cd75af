"""Event-time windowing ops: sessionization + as-of join vs pandas oracle."""

import pandas as pd
import pyarrow.parquet as pq

from cdcsdk_server_ray.pipelines.windows import (
    asof_last_view_before_purchase, session_windows)

SF = "/root/testdata/sf0.001"


def test_session_windows_match_pandas(ray_session):
    got = session_windows(SF).to_pandas().sort_values(
        ["user_id", "session_id"]).reset_index(drop=True)
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    gap = pd.Timedelta(minutes=30)
    exp_rows = []
    for uid, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        sid = (g["ts"].diff() > gap).fillna(True).cumsum()
        agg = g.groupby(sid).agg(n=("event_id", "size"),
                                 start=("ts", "min"), end=("ts", "max"))
        for i, (_, row) in enumerate(agg.iterrows(), start=1):
            exp_rows.append((uid, i, row.n, row.start, row.end))
    exp = pd.DataFrame(exp_rows, columns=["user_id", "session_id", "n_events",
                                          "session_start", "session_end"])
    assert len(got) == len(exp)
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    assert got["session_start"].tolist() == exp["session_start"].tolist()


def test_asof_strictly_earlier(ray_session):
    got = asof_last_view_before_purchase(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas().set_index("event_id")
    assert (ev.loc[got["event_id"], "event_type"] == "purchase").all()
    has = got.dropna(subset=["last_view_id"])
    assert (ev.loc[has["last_view_id"], "event_type"] == "view").all()
    # strictly earlier in the per-user order
    assert (has["last_view_id"] < has["event_id"]).all()


def test_funnel_conversion_matches_naive(ray_session):
    """Per-user ordered funnel vs a per-user Python oracle."""
    from cdcsdk_server_ray.pipelines.windows import funnel_conversion
    got = funnel_conversion(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    exp = {}
    for uid, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        stage, prev_ts = 0, None
        for want in ("signup", "view", "purchase"):
            m = g[g["event_type"] == want]
            if prev_ts is not None:
                m = m[m["ts"] > prev_ts]
            if m.empty:
                break
            stage += 1
            prev_ts = m["ts"].min()
        exp[uid] = stage
    assert dict(zip(got["user_id"], got["stage_reached"])) == exp
    assert got["stage_reached"].dtype.kind == "i"


def test_cohort_retention_counts(ray_session):
    """Partial per-bucket COUNT DISTINCT must sum to the global one."""
    from cdcsdk_server_ray.pipelines.windows import cohort_retention
    got = cohort_retention(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    week = ev["ts"].dt.to_period("W-SUN").dt.start_time
    cohort = week.groupby(ev["user_id"]).transform("min")
    off = ((week - cohort).dt.days // 7).astype("int64")
    d = pd.DataFrame({"u": ev["user_id"],
                      "cw": cohort.dt.strftime("%Y-%m-%d"),
                      "off": off}).drop_duplicates()
    exp = (d.groupby(["cw", "off"]).size().rename("n").reset_index()
           .sort_values(["cw", "off"]).reset_index(drop=True))
    assert got["n_users"].tolist() == exp["n"].tolist()
    assert got["cohort_week"].tolist() == exp["cw"].tolist()
    # offset 0 cohort sizes cover every user exactly once
    assert got[got["week_offset"] == 0]["n_users"].sum() == ev["user_id"].nunique()


def test_running_user_value_prefix_sums(ray_session):
    """The running sum is a per-user prefix sum in (ts, event_id) order,
    and the final value per user equals the user's floored-micros total."""
    import numpy as np
    from cdcsdk_server_ray.pipelines.windows import running_user_value
    got = running_user_value(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    assert len(got) == len(ev)
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    micros = np.floor(ev["value"].to_numpy() * 1_000_000).astype("int64")
    exp = (pd.Series(micros, index=ev.index)
           .groupby(ev["user_id"], sort=False).cumsum())
    exp_map = dict(zip(ev["event_id"], exp))
    assert all(exp_map[e] == v for e, v in
               zip(got["event_id"], got["running_value_micros"]))


def test_window_join_counts_naive(ray_session):
    """Windowed stream-stream join vs a per-purchase Python oracle."""
    from cdcsdk_server_ray.pipelines.windows import window_join_counts
    got = window_join_counts(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    w = pd.Timedelta(minutes=60)
    pur = ev[ev["event_type"] == "purchase"]
    clicks = ev[ev["event_type"] == "click"]
    assert len(got) == len(pur)
    exp = {}
    for _, p in pur.iterrows():
        c = clicks[(clicks["user_id"] == p["user_id"])
                   & (clicks["ts"] >= p["ts"] - w) & (clicks["ts"] < p["ts"])]
        exp[p["event_id"]] = len(c)
    assert dict(zip(got["event_id"], got["n_clicks"])) == exp


def test_stream_kernels_are_input_order_invariant(ray_session):
    """Shuffling the input rows (different block layout) must not change
    sessionization, funnel, or running-sum results — the kernels sort
    internally, so any exchange-induced row order is acceptable."""
    import numpy as np
    import ray.data
    from cdcsdk_server_ray.pipelines import windows as W

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    rng = np.random.default_rng(7)
    shuffled = ev.iloc[rng.permutation(len(ev))].reset_index(drop=True)
    tmp = "/tmp/events_shuffled.parquet"
    shuffled.to_parquet(tmp)
    import os
    import shutil
    sfdir = "/tmp/sf_shuffled"
    shutil.rmtree(sfdir, ignore_errors=True)
    os.makedirs(sfdir)
    shutil.move(tmp, f"{sfdir}/events.parquet")

    for fn, key in [(W.session_windows, ["user_id", "session_id"]),
                    (W.funnel_conversion, ["user_id"]),
                    (W.running_user_value, ["event_id"])]:
        a = fn(SF).to_pandas().reset_index(drop=True)
        b = fn(sfdir).to_pandas().reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_late_data_scan_bucket_span_invariance(ray_session):
    """The distributed prefix-max watermark must be independent of the
    scan's bucket geometry: a 500-row span (many buckets, seeds doing
    real work) and one giant bucket (pure in-kernel cummax) must agree
    exactly."""
    from cdcsdk_server_ray.pipelines.windows import late_data_counts

    a = late_data_counts(SF, bucket_span=500).to_pandas()
    b = late_data_counts(SF, bucket_span=10**9).to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    assert a["n_late"].sum() > 0          # non-vacuous


def test_moving_user_sum_matches_pandas_rolling(ray_session):
    """The ROWS-window moving sum equals pandas' grouped rolling sum on
    the floored micros (exact ints, so equality is bitwise)."""
    import numpy as np
    from cdcsdk_server_ray.pipelines.windows import moving_user_sum
    got = moving_user_sum(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    assert len(got) == len(ev)
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    micros = np.floor(ev["value"].to_numpy() * 1_000_000).astype("int64")
    roll = (pd.Series(micros, index=ev.index)
            .groupby(ev["user_id"].to_numpy(), sort=False)
            .rolling(3, min_periods=1).sum()
            .reset_index(level=0, drop=True).astype("int64"))
    exp_map = dict(zip(ev["event_id"], roll))
    assert all(exp_map[e] == v for e, v in
               zip(got["event_id"], got["moving_sum_micros"]))
    assert got["win_n"].max() == 3
    assert (got["win_n"] >= 1).all()


def test_users_except_and_cube(ray_session):
    """EXCEPT flips the intersect kernel; CUBE covers the full grouping
    lattice including the two single-axis slices ROLLUP lacks."""
    import numpy as np
    from cdcsdk_server_ray.pipelines.analytics import (cube_orders,
                                                       users_except)
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    buyers = set(ev.loc[ev["event_type"] == "purchase", "user_id"])
    sev = set(ev.loc[(ev["event_type"] == "error")
                     & (ev["value"] > 200), "user_id"])
    exp = sorted(buyers - sev)
    got = users_except(SF).to_pandas()
    assert got["user_id"].tolist() == exp
    assert 0 < len(exp) < len(buyers)  # non-degenerate both ways

    cube = cube_orders(SF).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    # grand total
    gt = cube[(cube["priority"] == "ALL") & (cube["status"] == "ALL")]
    assert gt["n_orders"].iloc[0] == len(orders)
    # single-axis slice (ALL, status) — absent from ROLLUP
    st = cube[(cube["priority"] == "ALL") & (cube["status"] != "ALL")]
    assert st["n_orders"].sum() == len(orders)
    exp_status = orders.groupby("o_orderstatus").size()
    assert dict(zip(st["status"], st["n_orders"])) == exp_status.to_dict()
    # (priority, ALL) and (priority, status) levels both present
    pr = cube[(cube["priority"] != "ALL") & (cube["status"] == "ALL")]
    assert pr["n_orders"].sum() == len(orders)
    assert len(cube) == (orders["o_orderpriority"].nunique()
                         * orders["o_orderstatus"].nunique()
                         + orders["o_orderpriority"].nunique()
                         + orders["o_orderstatus"].nunique() + 1)


def test_event_path_topk_matches_bruteforce(ray_session):
    """Per-user 3-event paths vs a pandas shift bruteforce."""
    from cdcsdk_server_ray.pipelines.windows import event_path_topk

    got = event_path_topk(SF)

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    e2 = ev.groupby("user_id")["event_type"].shift(-1)
    e3 = ev.groupby("user_id")["event_type"].shift(-2)
    trip = pd.DataFrame({"e1": ev["event_type"], "e2": e2, "e3": e3})
    trip = trip.dropna()
    exp = (trip.groupby(["e1", "e2", "e3"]).size().reset_index(name="n")
           .sort_values(["n", "e1", "e2", "e3"],
                        ascending=[False, True, True, True])
           .head(20).reset_index(drop=True))
    assert got["n"].tolist() == exp["n"].tolist()
    assert got[["e1", "e2", "e3"]].values.tolist() \
        == exp[["e1", "e2", "e3"]].values.tolist()


def test_hopping_distinct_users_matches_bruteforce(ray_session):
    """Sliding-window distinct users vs a pandas expansion bruteforce."""
    from cdcsdk_server_ray.pipelines.windows import hopping_distinct_users

    got = hopping_distinct_users(SF)

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "user_id"])
    frames = []
    base = ev["ts"].dt.floor("15min")
    for j in range(4):
        frames.append(pd.DataFrame({
            "window_start": base - pd.Timedelta(minutes=15 * j),
            "user_id": ev["user_id"]}))
    x = pd.concat(frames, ignore_index=True)
    exp = (x.groupby("window_start")["user_id"].nunique()
           .reset_index(name="n_users").sort_values("window_start")
           .reset_index(drop=True))
    exp["window_start"] = exp["window_start"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"n_users": "int64"}),
        exp.astype({"n_users": "int64"}))


def test_funnel_latency_matches_bruteforce(ray_session):
    """Transition deltas + disc quantiles equal a pandas bruteforce of
    the same strictly-after funnel semantics."""
    import numpy as np
    import pandas as pd

    from cdcsdk_server_ray.pipelines.windows import funnel_latency

    out = funnel_latency(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet")
    t0 = ev[ev["event_type"] == "signup"].groupby("user_id")["ts"].min()
    e1 = ev[ev["event_type"] == "view"].merge(
        t0.rename("t0"), left_on="user_id", right_index=True)
    t1 = e1[e1["ts"] > e1["t0"]].groupby("user_id")["ts"].min()
    e2 = ev[ev["event_type"] == "purchase"].merge(
        t1.rename("t1"), left_on="user_id", right_index=True)
    t2 = e2[e2["ts"] > e2["t1"]].groupby("user_id")["ts"].min()

    for stage, (cur, prv) in {1: (t1, t0), 2: (t2, t1)}.items():
        j = pd.concat([cur.rename("c"), prv.rename("p")], axis=1,
                      join="inner")
        d = np.sort((j["c"].astype("datetime64[us]").astype("int64")
                     - j["p"].astype("datetime64[us]").astype("int64"))
                    .to_numpy())
        n = len(d)
        sub = out[out["stage"] == stage]
        assert (sub["n_converted"] == n).all()
        for p in (500, 900):
            want = d[(p * n + 999) // 1000 - 1] / 1e6
            assert float(sub.loc[sub["q_permille"] == p,
                                 "delta_sec"].iloc[0]) == want
