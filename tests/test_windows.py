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
