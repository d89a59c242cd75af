"""Event-time windowing + as-of join over the ``events`` stream.

Ray Data has no native event-time windows (the reference has none either
— its poll interval is an implicit processing-time window, README.md:47-52).
These operators implement the streaming-shaped semantics the north star
asks for as per-key ordered computations: ``groupby(key).map_groups``
over ts-sorted groups, with pandas kernels inside — the documented
pattern for stream-shaped workloads on a batch engine. Partitioning
assumption: all events of a key fit one group (same invariant as the CDC
merge); at 10^10 scale the groupby is the same hash exchange the engine
uses.

Both have exact SQL oracles (gaps-and-islands / window functions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _events(sf_dir: str):
    import ray.data
    return ray.data.read_parquet(f"{sf_dir}/events.parquet")


def session_windows(sf_dir: str, gap_minutes: int = 30):
    """Sessionization: per user, a new session starts after a gap >
    ``gap_minutes``. Returns one row per session: (user_id, session_id,
    n_events, session_start, session_end). The classic gaps-and-islands
    computation, vectorized per group."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        new_session = (g["ts"].diff() > gap).fillna(True)
        sid = new_session.cumsum()
        out = g.groupby(sid).agg(
            user_id=("user_id", "first"),
            n_events=("event_id", "size"),
            session_start=("ts", "min"),
            session_end=("ts", "max"))
        out["session_id"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out[["user_id", "session_id", "n_events",
                    "session_start", "session_end"]]

    return (_events(sf_dir).groupby("user_id")
            .map_groups(sessions, batch_format="pandas")
            .sort(["user_id", "session_id"]))


def asof_last_view_before_purchase(sf_dir: str):
    """As-of join within the stream: for every 'purchase', the user's most
    recent strictly-earlier 'view' event (NULL if none) — the
    merge_asof-per-key pattern for as-of/range joins."""

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        view_ids = g["event_id"].where(g["event_type"] == "view")
        last_view = view_ids.ffill().shift(1)  # strictly earlier rows only
        out = g[g["event_type"] == "purchase"][["event_id", "user_id", "value"]]
        out = out.assign(last_view_id=last_view[out.index])
        return out

    return (_events(sf_dir).groupby("user_id")
            .map_groups(asof, batch_format="pandas")
            .sort("event_id"))
