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
from cdcsdk_server_ray.stages.finish import finish_sorted


def _events(sf_dir: str):
    import ray.data
    return ray.data.read_parquet(f"{sf_dir}/events.parquet")


def _bucket_by_user(ds, num_buckets: int = 32):
    """Hash users into a fixed number of buckets so the per-key streaming
    computation runs as ONE vectorized pandas kernel per bucket — a
    ``groupby(user_id).map_groups`` pays per-group Python overhead on one
    group per user (the degenerate case at 10^10 events). Same exchange
    shape as the engine's partition merge."""
    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__ub"] = (df["user_id"].to_numpy(np.uint64)
                      % np.uint64(num_buckets)).astype(np.int32)
        return df

    return ds.map_batches(add_bucket, batch_format="pandas").groupby("__ub")


def session_windows(sf_dir: str, gap_minutes: int = 30):
    """Sessionization: per user, a new session starts after a gap >
    ``gap_minutes``. Returns one row per session: (user_id, session_id,
    n_events, session_start, session_end). The classic gaps-and-islands
    computation — vectorized over each user-hash bucket (session breaks =
    user change OR gap exceeded, one cumsum for the whole bucket)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        user_change = g["user_id"].ne(g["user_id"].shift())
        new_session = (user_change | (g["ts"].diff() > gap))
        sid = new_session.cumsum()
        out = g.groupby(sid, sort=False).agg(
            user_id=("user_id", "first"),
            n_events=("event_id", "size"),
            session_start=("ts", "min"),
            session_end=("ts", "max")).reset_index(drop=True)
        out["session_id"] = (out.groupby("user_id", sort=False).cumcount()
                             + 1).astype("int64")
        return out[["user_id", "session_id", "n_events",
                    "session_start", "session_end"]]

    return (finish_sorted(_bucket_by_user(_events(sf_dir))
            .map_groups(sessions, batch_format="pandas"), ["user_id", "session_id"]))


def asof_last_view_before_purchase(sf_dir: str):
    """As-of join within the stream: for every 'purchase', the user's most
    recent strictly-earlier 'view' event (NULL if none) — the
    merge_asof-per-key pattern, vectorized per user-hash bucket (ffill +
    shift are grouped by user inside the bucket)."""

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        view_ids = g["event_id"].where(g["event_type"] == "view")
        by_user = view_ids.groupby(g["user_id"], sort=False)
        last_view = by_user.ffill().groupby(g["user_id"], sort=False).shift(1)
        out = g[g["event_type"] == "purchase"][["event_id", "user_id", "value"]]
        out = out.assign(last_view_id=last_view[out.index])
        return out

    return (finish_sorted(_bucket_by_user(_events(sf_dir))
            .map_groups(asof, batch_format="pandas"), "event_id"))


def tumbling_counts(sf_dir: str):
    """Tumbling event-time windows (fixed 1-hour buckets) per event type:
    the hopping/tumbling complement to the LSN windows the engine commits
    by (engine.py) and to the session windows above. The window key is
    derived VECTORIZED in map_batches (Arrow ``floor_temporal``), then the
    decomposable aggregate runs through the combiner (`grouped_aggregate`)
    so the all-to-all exchange moves one partial row per (window, type)
    per block — (hours × types) keys total, never the raw events."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from cdcsdk_server_ray.stages.aggregate import grouped_aggregate

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])

    def add_window(t: pa.Table) -> pa.Table:
        ws = pc.floor_temporal(t["ts"], unit="hour")
        return pa.table({"window_start": ws,
                         "event_type": t["event_type"],
                         "value": t["value"]})

    out = grouped_aggregate(
        ev.map_batches(add_window, batch_format="pyarrow"),
        ["window_start", "event_type"],
        {"n_events": ("value", "count"),
         "sum_value": ("value", "sum2"),
         "max_value": ("value", "max")})
    return finish_sorted(out, ["window_start", "event_type"])


def funnel_conversion(sf_dir: str,
                      stages=("signup", "view", "purchase")):
    """Ordered funnel: per user, the furthest stage reached IN ORDER
    (stage k+1 counts only with a strictly-later timestamp than the ts
    that satisfied stage k). Returns one row per user:
    (user_id, stage_reached ∈ 0..len(stages)).

    The sequential-pattern-match analytic the reference's forwarder can't
    express; here it's per-key ordered state, vectorized per user-hash
    bucket: each stage is ONE filter + merge + groupby-min over the whole
    bucket (no per-user Python), and stage k+1's merge keys on stage k's
    achieved ts — users split across buckets never occur (bucket = hash
    of user), so partial results are exact. At 10^10 events the exchange
    is the same single user-hash shuffle as session_windows."""

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        reached: list[pd.Series] = []     # per stage: user_id → achieved ts
        prev = None
        for k, stage in enumerate(stages):
            ev = g[g["event_type"] == stage][["user_id", "ts"]]
            if k == 0:
                cur = ev.groupby("user_id")["ts"].min()
            else:
                ev = ev.merge(prev.rename("prev_ts"), left_on="user_id",
                              right_index=True)
                cur = (ev[ev["ts"] > ev["prev_ts"]]
                       .groupby("user_id")["ts"].min())
            reached.append(cur)
            prev = cur
        users = pd.Index(np.sort(g["user_id"].unique()), name="user_id")
        stage_reached = np.zeros(len(users), dtype=np.int64)
        for cur in reached:                # reached[k+1].index ⊆ reached[k]
            stage_reached += users.isin(cur.index).astype(np.int64)
        return pd.DataFrame({"user_id": users.to_numpy(),
                             "stage_reached": stage_reached})

    return (finish_sorted(_bucket_by_user(_events(sf_dir))
            .map_groups(funnel, batch_format="pandas"), "user_id"))


def cohort_retention(sf_dir: str):
    """Weekly cohort retention: users are cohorted by the Monday-start
    week of their FIRST event; for every (cohort_week, week_offset) count
    the distinct users active that week. Two-phase plan: the distinct
    (user, cohort, offset) set is computed vectorized inside each
    user-hash bucket (a user lives in exactly one bucket, so per-bucket
    COUNT DISTINCT partials sum exactly), then a tiny combiner groupby
    over (weeks × offsets) keys — the all-to-all never carries raw
    events or user ids. cohort_week is a string so the Ray and DuckDB
    sides hash identically."""
    from cdcsdk_server_ray.stages.aggregate import grouped_aggregate

    def partials(g: pd.DataFrame) -> pd.DataFrame:
        # Monday-start week, matching DuckDB date_trunc('week', ts)
        week = g["ts"].dt.to_period("W-SUN").dt.start_time
        cohort = week.groupby(g["user_id"]).transform("min")
        off = ((week - cohort).dt.days // 7).astype(np.int64)
        d = pd.DataFrame({"user_id": g["user_id"].to_numpy(),
                          "cohort_week": cohort.dt.strftime("%Y-%m-%d"),
                          "week_offset": off}).drop_duplicates()
        out = (d.groupby(["cohort_week", "week_offset"], sort=False)
               .size().rename("n_users").reset_index())
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    parts = (_bucket_by_user(_events(sf_dir))
             .map_groups(partials, batch_format="pandas"))
    out = grouped_aggregate(parts, ["cohort_week", "week_offset"],
                            {"n_users": ("n_users", "sum")},
                            batch_format="pandas")
    return finish_sorted(out, ["cohort_week", "week_offset"])


def running_user_value(sf_dir: str):
    """Per-key running aggregate (streaming prefix sum): for every event,
    the cumulative value of that user's events so far (ordered by ts,
    event_id). The per-key stateful-accumulator shape of a streaming
    engine, vectorized per user-hash bucket as one sort + grouped cumsum.
    Values are fixed-pointed to integer micro-units with floor() BEFORE
    accumulating so the Ray and SQL oracles agree bit-exactly (float
    window-sum association order differs between engines)."""

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        micros = np.floor(g["value"].to_numpy() * 1_000_000).astype(np.int64)
        run = (pd.Series(micros, index=g.index)
               .groupby(g["user_id"], sort=False).cumsum())
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(),
                             "user_id": g["user_id"].to_numpy(),
                             "running_value_micros": run.to_numpy()})

    return (finish_sorted(_bucket_by_user(_events(sf_dir))
            .map_groups(running, batch_format="pandas"), "event_id"))


def hopping_counts(sf_dir: str, size_minutes: int = 60,
                   hop_minutes: int = 15):
    """Hopping (sliding) event-time windows — size 60 min, hop 15 min,
    so each event belongs to size/hop = 4 overlapping windows. The
    expansion is VECTORIZED: one 15-minute ``floor_temporal`` per batch
    plus k shifted zero-copy column slices (no per-row Python, no
    flat_map), and the aggregate rides the same combiner path as
    ``tumbling_counts`` — the exchange carries one partial row per
    (window, type) per block, never the ×k exploded events."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from cdcsdk_server_ray.stages.aggregate import grouped_aggregate

    assert size_minutes % hop_minutes == 0
    k = size_minutes // hop_minutes
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])

    def expand(t: pa.Table) -> pa.Table:
        base = pc.floor_temporal(t["ts"], multiple=hop_minutes,
                                 unit="minute")
        parts = [pa.table({
            "window_start": pc.subtract(
                base, pa.scalar(j * hop_minutes * 60_000_000,
                                pa.duration("us"))),
            "event_type": t["event_type"],
            "value": t["value"],
        }) for j in range(k)]
        return pa.concat_tables(parts)

    out = grouped_aggregate(
        ev.map_batches(expand, batch_format="pyarrow"),
        ["window_start", "event_type"],
        {"n_events": ("value", "count"),
         "sum_value": ("value", "sum2"),
         "max_value": ("value", "max")})
    return finish_sorted(out, ["window_start", "event_type"])


def window_join_counts(sf_dir: str, window_minutes: int = 60):
    """Stream-stream windowed join: for every 'purchase', the count of
    the same user's 'click' events with ts in [purchase_ts - window,
    purchase_ts). The interval-join shape streaming engines express as a
    double-buffered stateful join; here it's two vectorized
    ``merge_asof`` passes per user-hash bucket over per-user cumulative
    click counts — count(window) = cum(< ts) - cum(< ts - window), no
    per-row Python, no event-pair explosion."""
    w = pd.Timedelta(minutes=window_minutes)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        clicks = (g[g["event_type"] == "click"][["user_id", "ts"]]
                  .sort_values("ts", kind="mergesort"))
        clicks["cum"] = (clicks.groupby("user_id", sort=False).cumcount()
                         + 1).astype("int64")
        pur = (g[g["event_type"] == "purchase"]
               [["event_id", "user_id", "ts"]]
               .sort_values("ts", kind="mergesort"))
        if pur.empty:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "user_id": pd.Series([], dtype="int64"),
                                 "n_clicks": pd.Series([], dtype="int64")})
        hi = pd.merge_asof(pur, clicks, on="ts", by="user_id",
                           direction="backward",
                           allow_exact_matches=False)["cum"]
        # keep the Arrow-native [us] resolution: Timedelta arithmetic
        # upcasts to [ns], which merge_asof refuses to mix
        shifted = (pur["ts"] - w).astype(pur["ts"].dtype)
        lo = pd.merge_asof(pur.assign(ts=shifted), clicks, on="ts",
                           by="user_id", direction="backward",
                           allow_exact_matches=False)["cum"]
        n = (hi.fillna(0) - lo.fillna(0)).astype("int64")
        return pd.DataFrame({"event_id": pur["event_id"].to_numpy(),
                             "user_id": pur["user_id"].to_numpy(),
                             "n_clicks": n.to_numpy()})

    return (finish_sorted(_bucket_by_user(_events(sf_dir))
            .map_groups(kernel, batch_format="pandas"), "event_id"))


def late_data_counts(sf_dir: str, lateness_minutes: int = 30,
                     bucket_span: int = 100_000):
    """Event-time LATE-DATA handling — the watermark semantic every
    streaming engine (and the reference's downstream consumers) needs
    that none of the other window operators exercise: events arrive in
    ``event_id`` order but carry an EVENT TIME that lags arrival by a
    deterministic per-event network delay (overflow-safe Knuth-hash
    jitter, identical arithmetic in the SQL oracle); the WATERMARK is
    the running max event time over arrival order; an event is LATE iff
    its event time is more than ``lateness`` behind the watermark at its
    arrival. Output per 1-hour tumbling window: on-time count + exact
    on-time value sum, and the late-event count (the side-output a
    production pipeline would route to a corrections topic).

    The running max over a GLOBAL arrival order is the same two-level
    distributed prefix scan as ``text.pack_sequences`` (the one
    primitive Ray Data lacks natively): per-RANGE-bucket partial maxima
    (driver-sized by construction: ≤ n_events / bucket_span rows),
    exclusive prefix max on the driver, broadcast once via ``ray.put``,
    then ONE vectorized cummax kernel per bucket. The final aggregate
    runs through the combiner (`grouped_aggregate`), so the exchange
    moves one partial row per window per block."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data

    from cdcsdk_server_ray.stages.aggregate import grouped_aggregate
    from cdcsdk_server_ray.stages.join import _bcast_get

    HOUR_US = 3_600_000_000
    late_us = np.int64(lateness_minutes * 60_000_000)
    # (event_id * 2654435761) % 3600 computed overflow-safe:
    # ((id % 3600) * (2654435761 % 3600)) % 3600 — same value by modular
    # arithmetic, max intermediate 3599*961 ≈ 3.5e6 (never wraps, at any
    # event_id; the naive product wraps int64 at ids ≥ ~3.5e9)
    KNUTH_MOD = 2654435761 % 3600          # = 961

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "value"])

    def slim(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts_us = t["ts"].cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        delay_s = ((eid % 3600) * KNUTH_MOD) % 3600
        et = ts_us - delay_s * 1_000_000
        return pa.table({
            "event_id": pa.array(eid),
            "et": pa.array(et),
            "value": t["value"],
            "__rb": pa.array(eid // bucket_span)})

    slim_ds = ev.map_batches(slim, batch_format="pyarrow").materialize()

    # level 1: per-range-bucket maxima (driver-sized: one row per bucket)
    parts = pd.concat(
        [b.to_pandas() for b in
         slim_ds.map_batches(
             lambda t: t.select(["__rb", "et"]).group_by("__rb")
                        .aggregate([("et", "max")]),
             batch_format="pyarrow").iter_batches(batch_format="pyarrow")],
        ignore_index=True)
    bmax = parts.groupby("__rb", sort=True)["et_max"].max()
    # exclusive prefix max: watermark carried INTO each bucket
    seed = bmax.cummax().shift(1, fill_value=np.iinfo(np.int64).min)
    ref = ray.put(seed.to_dict())

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        seeds = _bcast_get(ref)
        g = g.sort_values("event_id", kind="mergesort")
        et = g["et"].to_numpy(np.int64)
        rm = np.maximum.accumulate(et)
        s = seeds.get(int(g["__rb"].iloc[0]), np.iinfo(np.int64).min)
        rm = np.maximum(rm, np.int64(s))
        late = et < rm - late_us
        ws = (et // HOUR_US) * HOUR_US
        return pd.DataFrame({
            "window_start": ws.astype("datetime64[us]"),
            "on_i": (~late).astype(np.int64),
            "late_i": late.astype(np.int64),
            "value_on": np.where(late, 0.0, g["value"].to_numpy(np.float64)),
        })

    flagged = slim_ds.groupby("__rb").map_groups(scan, batch_format="pandas")
    out = grouped_aggregate(
        flagged, ["window_start"],
        {"n_ontime": ("on_i", "sum"),
         "sum_value": ("value_on", "sum2"),
         "n_late": ("late_i", "sum")})
    return finish_sorted(out, "window_start")


def event_transitions(sf_dir: str, num_buckets: int = 32):
    """Per-user event-type transition counts (the Markov-chain /
    session-path-mining shape): for every consecutive pair of events in
    a user's time-ordered stream, count (prev_event, next_event)
    occurrences corpus-wide.

    Scale shape: ONE exchange hashes the pruned event rows (user_id, ts,
    event_id, event_type — never value/props) into user buckets; inside
    each bucket one vectorized kernel sorts by (user, ts, event_id),
    shifts, masks the user boundaries, and collapses to (prev, next,
    count) PARTIALS — the transition-type domain is |event_types|², so
    the second stage is a one-task sum over ≤ buckets × |types|² tiny
    rows. Order within equal timestamps breaks by event_id on both
    engines."""
    import ray.data

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])

    def transitions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        same_user = g["user_id"].to_numpy()[1:] == \
            g["user_id"].to_numpy()[:-1]
        types = g["event_type"].to_numpy()
        prev = types[:-1][same_user]
        nxt = types[1:][same_user]
        out = (pd.DataFrame({"prev_event": prev, "next_event": nxt})
               .groupby(["prev_event", "next_event"], sort=False)
               .size().rename("n").reset_index())
        out["n"] = out["n"].astype("int64")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["prev_event", "next_event"], sort=True)["n"]
             .sum().reset_index())
        g["n"] = g["n"].astype("int64")
        return g.reset_index(drop=True)

    return (_bucket_by_user(ev, num_buckets)
            .map_groups(transitions, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


def moving_user_sum(sf_dir: str, window: int = 3, num_buckets: int = 32):
    """Per-key ROWS-window aggregate (``ROWS BETWEEN window-1 PRECEDING
    AND CURRENT ROW``): for every event, the moving sum of that user's
    last ``window`` event values — the sliding-window accumulator shape
    of a streaming engine, completing the running-prefix-sum family.

    One user-hash exchange; inside each bucket the moving sum is the
    classic cumsum-minus-shifted-cumsum, entirely int64: values
    fix-point to integer micros with floor() BEFORE accumulating, the
    per-user cumulative sum shifts by ``window`` via each row's
    position-in-group (vectorized ``cumcount``), and rows earlier than
    the window start subtract zero. No float window-sum association
    order to disagree over, no per-user Python."""

    def moving(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        micros = np.floor(g["value"].to_numpy() * 1_000_000
                          ).astype(np.int64)
        s = pd.Series(micros, index=g.index)
        grp = s.groupby(g["user_id"], sort=False)
        csum = grp.cumsum().to_numpy()
        pos = grp.cumcount().to_numpy()
        # cumsum of the row `window` places earlier in the SAME user (0
        # when the window isn't full yet): that row's csum = csum here
        # minus the in-window contribution
        shifted = np.zeros(len(csum), np.int64)
        full = pos >= window
        idx = np.arange(len(csum))
        shifted[full] = csum[idx[full] - window]
        win_n = np.minimum(pos + 1, window).astype(np.int64)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "user_id": g["user_id"].to_numpy(),
            "moving_sum_micros": csum - shifted,
            "win_n": win_n})

    import ray.data
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"])
    return finish_sorted(
        _bucket_by_user(ev, num_buckets)
        .map_groups(moving, batch_format="pandas"), "event_id")


def event_path_topk(sf_dir: str, k: int = 20, num_buckets: int = 32):
    """Top-k most common 3-event paths (consecutive event-type triples
    in each user's timeline) — the clickstream path-mining shape behind
    funnel discovery, one step up from :func:`event_transitions`'s
    pairs.

    Plan: the usual ONE user-hash exchange co-locates each user's
    events; in-task a vectorized sort + two shifts forms every
    consecutive triple (user boundaries masked), and per-bucket
    value_counts collapse to ≤ |types|³ partial rows — event types are
    a bounded-cardinality dimension, so the driver fold and the final
    top-k (count desc, then path asc for determinism) are sketch-sized.
    """
    ds = _events(sf_dir)

    def paths(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy()
        e = g["event_type"].to_numpy()
        same3 = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:]) \
            if len(g) >= 3 else np.array([], bool)
        if not same3.any():
            return pd.DataFrame({
                "e1": pd.Series([], dtype="object"),
                "e2": pd.Series([], dtype="object"),
                "e3": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64")})
        trip = pd.DataFrame({"e1": e[:-2][same3], "e2": e[1:-1][same3],
                             "e3": e[2:][same3]})
        out = (trip.groupby(["e1", "e2", "e3"], sort=False).size()
               .reset_index(name="n"))
        out["n"] = out["n"].astype("int64")
        return out

    partials = _bucket_by_user(ds, num_buckets).map_groups(
        lambda g: paths(g.drop(columns="__ub")),
        batch_format="pandas")

    pf = partials.to_pandas()      # ≤ |types|³ × buckets rows, one frame
    agg = (pf.groupby(["e1", "e2", "e3"], sort=False)["n"].sum()
           .reset_index())
    agg = agg.sort_values(["n", "e1", "e2", "e3"],
                          ascending=[False, True, True, True]).head(k)
    agg["n"] = agg["n"].astype("int64")
    return agg.reset_index(drop=True)


def hopping_distinct_users(sf_dir: str, size_minutes: int = 60,
                           hop_minutes: int = 15, num_buckets: int = 32):
    """Sliding-window COUNT DISTINCT — unique users per hopping 60-min
    window (hop 15 min): the rolling-reach / active-users metric, and
    the one windowed aggregate that is NOT decomposable by plain
    combiner sums (distinct needs co-location of each (window, user)).

    Plan: the vectorized ×k window expansion of :func:`hopping_counts`
    emits (window, user) pairs, batch-pre-deduped; ONE exchange hashed
    on (window, user) finishes the distinct — a pair lives wholly in
    one bucket, so per-bucket per-window pair counts are final partial
    counts — and the driver folds ≤ windows × buckets count rows in one
    frame fetch. The exchange carries deduped id pairs, never events.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    assert size_minutes % hop_minutes == 0
    k = size_minutes // hop_minutes
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "user_id"])

    def expand(t: pa.Table) -> pd.DataFrame:
        base = pc.floor_temporal(t["ts"], multiple=hop_minutes,
                                 unit="minute")
        parts = [pa.table({
            "window_start": pc.subtract(
                base, pa.scalar(j * hop_minutes * 60_000_000,
                                pa.duration("us"))),
            "user_id": t["user_id"],
        }) for j in range(k)]
        df = pa.concat_tables(parts).to_pandas().drop_duplicates()
        h = (pd.util.hash_pandas_object(
            df["window_start"].astype("int64"), index=False)
            .to_numpy(np.uint64)
            ^ df["user_id"].to_numpy(np.uint64))
        df["__wb"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return df

    def bucket_count(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["window_start", "user_id"]].drop_duplicates()
        out = (d.groupby("window_start", sort=False).size()
               .reset_index(name="n_users"))
        out["n_users"] = out["n_users"].astype("int64")
        return out

    partials = (ev.map_batches(expand, batch_format="pyarrow")
                .groupby("__wb")
                .map_groups(bucket_count, batch_format="pandas"))

    pf = partials.to_pandas()
    out = (pf.groupby("window_start", sort=True)["n_users"].sum()
           .reset_index())
    out["n_users"] = out["n_users"].astype("int64")
    return out


def funnel_latency(sf_dir: str, stages=("signup", "view", "purchase"),
                   permilles=(500, 900)):
    """Funnel CONVERSION LATENCY: for each ordered stage transition
    (first qualifying event strictly after the previous stage's
    achieved time — same semantics as :func:`funnel_conversion`), the
    converting-user count and exact disc quantiles of the transition
    delay. The time-to-convert distribution product analytics builds on
    top of the funnel.

    Plan: ONE user-hash exchange computes each user's achieved-ts chain
    vectorized per bucket and emits only (stage, delta_us) rows for
    converting users — integers, exactly one row per conversion. That
    slim result ``materialize()``s (the fork rule: two quantile passes
    + a count pass consume it; re-executing the exchange per consumer
    would triple the wide work), then each stage's delays ride the
    exact no-global-sort disc-quantile pipeline. delta_us < 2^53 keeps
    the quantile machinery's float64 carrier exact; the only division
    is the shared /1e6 to seconds."""
    from cdcsdk_server_ray.pipelines.stats import quantile_pipeline
    from cdcsdk_server_ray.stages.aggregate import grouped_aggregate

    def deltas(g: pd.DataFrame) -> pd.DataFrame:
        prev = None
        out_stage, out_delta = [], []
        for k, stage in enumerate(stages):
            ev = g[g["event_type"] == stage][["user_id", "ts"]]
            if k == 0:
                cur = ev.groupby("user_id")["ts"].min()
            else:
                ev = ev.merge(prev.rename("prev_ts"), left_on="user_id",
                              right_index=True)
                cur = (ev[ev["ts"] > ev["prev_ts"]]
                       .groupby("user_id")["ts"].min())
                joined = pd.concat([cur.rename("cur"),
                                    prev.rename("prv")], axis=1,
                                   join="inner")
                d_us = (joined["cur"].astype("datetime64[us]")
                        .astype(np.int64)
                        - joined["prv"].astype("datetime64[us]")
                        .astype(np.int64))
                out_stage.append(np.full(len(d_us), k, dtype=np.int64))
                out_delta.append(d_us.to_numpy(np.int64))
            prev = cur
        if not out_stage:
            return pd.DataFrame({"stage": pd.Series([], dtype="int64"),
                                 "delta_us": pd.Series([], dtype="int64")})
        return pd.DataFrame({"stage": np.concatenate(out_stage),
                             "delta_us": np.concatenate(out_delta)})

    slim = (_bucket_by_user(_events(sf_dir))
            .map_groups(deltas, batch_format="pandas").materialize())

    counts = grouped_aggregate(slim, ["stage"],
                               {"n_converted": ("delta_us", "count")}) \
        .to_pandas().set_index("stage")["n_converted"]

    rows = []
    for k in range(1, len(stages)):
        sub = slim.filter(expr=f"stage == {k}")
        q = quantile_pipeline(sub, "delta_us", permilles).to_pandas()
        for _, r in q.iterrows():
            rows.append((k, int(r["q_permille"]),
                         int(counts.get(k, 0)),
                         float(r["value"]) / 1e6))
    return pd.DataFrame(rows, columns=["stage", "q_permille",
                                       "n_converted", "delta_sec"]) \
        .astype({"stage": "int64", "q_permille": "int64",
                 "n_converted": "int64"})
