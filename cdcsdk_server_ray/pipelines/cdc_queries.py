"""CDC operator pipelines over the driver's ``events`` stand-in table.

The synthesized source-code changelog has no DuckDB view, so the CDC
operators are *also* exposed over the ``events`` table
(event_id, ts, user_id, event_type, value, props — TESTDATA.md), treating
``event_id`` as the LSN, ``user_id`` as the key, and ``event_type='error'``
as the delete marker. Each pipeline has a matching ANSI-SQL oracle in
``__ray_entry__.oracle_sql`` — this is the correctness gate for the LWW /
fence / window semantics of the real engine (engine.py), expressed over a
table DuckDB can see.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cdcsdk_server_ray.stages.aggregate import grouped_aggregate
from cdcsdk_server_ray.stages.lww import lww_reduce
from cdcsdk_server_ray.stages.finish import finish_sorted


def _events(sf_dir: str):
    import ray.data
    return ray.data.read_parquet(f"{sf_dir}/events.parquet")


def _final_lww(g: pa.Table) -> pa.Table:
    return lww_reduce(g, key_cols=("user_id",), order_col="event_id")


def _bucketed_lww(ds, num_buckets: int = 32):
    """The engine's hash-bucket exchange, as a query plan: batch-local
    partial LWW (combiner) → ONE shuffle into ``num_buckets`` hash buckets
    → one VECTORIZED multi-key ``lww_reduce`` per bucket. Replaces the
    per-user ``groupby(user_id).map_groups`` (thousands of tiny Python
    groups — the r01 #2 query cost) with B arrow-kernel reduces, exactly
    how engine.py merges partitions (engine.py:_make_apply_fn)."""
    partial = ds.map_batches(_final_lww, batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], num_buckets - 1), pa.int32())
        return t.append_column("__bucket", b)

    def merge_bucket(t: pa.Table) -> pa.Table:
        return _final_lww(t).drop_columns(["__bucket"])

    assert num_buckets & (num_buckets - 1) == 0, "power of two"
    return (partial.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(merge_bucket, batch_format="pyarrow"))


def lww_state(sf_dir: str):
    """Last-write-wins state per key — THE lake-upsert merge, over events.

    Plan: combiner → hash-bucket exchange → vectorized per-bucket LWW.
    Column names match the SQL oracle (arg_max per column).
    """
    out = _bucketed_lww(_events(sf_dir))
    return finish_sorted(out.map_batches(
        lambda t: t.select(["user_id", "event_id", "event_type", "value", "ts"]),
        batch_format="pyarrow"), "user_id")


def lww_state_with_deletes(sf_dir: str):
    """LWW + delete-removes-key: users whose last event is 'error' vanish
    (≙ tombstone winner dropped at the current-state read)."""
    out = _bucketed_lww(_events(sf_dir))

    def drop_deleted(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["event_type"], "error"))
        return t.select(["user_id", "event_id", "event_type", "value"])

    return finish_sorted(out.map_batches(drop_deleted, batch_format="pyarrow"), "user_id")


def partition_lineage(sf_dir: str, num_partitions: int = 8):
    """Per-partition offset/lineage rollup (≙ the manifest's PartitionState;
    modulo partitioner here so the oracle can express it in SQL)."""
    ds = _events(sf_dir)

    def add_pid(t: pa.Table) -> pa.Table:
        pid = pc.cast(pc.bit_wise_and(t["user_id"], num_partitions - 1)
                      if (num_partitions & (num_partitions - 1)) == 0
                      else pc.subtract(t["user_id"],
                                       pc.multiply(pc.divide(t["user_id"], num_partitions),
                                                   num_partitions)),
                      pa.int64())
        return t.append_column("partition_id", pid)

    with_pid = ds.map_batches(add_pid, batch_format="pyarrow")
    return finish_sorted(grouped_aggregate(
        with_pid, ["partition_id"],
        {"events_applied": ("event_id", "count"),
         "committed_lsn": ("event_id", "max"),
         "sum_value": ("value", "sum2")},
    ), "partition_id")


def envelope_roundtrip(sf_dir: str):
    """Wrap each event in a Debezium-style envelope (key/before/after/
    source structs + YB cell wrappers), then unwrap+flatten — output must
    equal the plain projection (the oracle). Exercises T2/T3 on real data."""
    from cdcsdk_server_ray.stages.envelope import flatten_chain

    ds = _events(sf_dir)

    def wrap(t: pa.Table) -> pa.Table:
        n = t.num_rows

        def cell(col):  # YB {value: x} wrapper
            c = t[col].combine_chunks() if isinstance(t[col], pa.ChunkedArray) else t[col]
            return pa.StructArray.from_arrays([c], ["value"])

        key = pa.StructArray.from_arrays(
            [t["user_id"].combine_chunks()], ["user_id"])
        after = pa.StructArray.from_arrays(
            [cell("event_type"), cell("value"), cell("props")],
            ["event_type", "value", "props"])
        source = pa.StructArray.from_arrays(
            [t["event_id"].combine_chunks(),
             pc.divide(t["event_id"], 64).combine_chunks(),
             pa.nulls(n, pa.string()).fill_null("events"),
             pa.nulls(n, pa.string()).fill_null("cdcsdk-ray")],
            ["lsn", "tx_id", "table", "connector"])
        return pa.table({
            "key": key, "before": pa.nulls(n, after.type), "after": after,
            "source": source,
            "op": pa.nulls(n, pa.string()).fill_null("c"),
            "ts_ms": t["ts"],
        })

    chain = flatten_chain(yb=True)

    def unwrap_flatten(t: pa.Table) -> pa.Table:
        flat = chain(t)
        return pa.table({
            "lsn": flat["lsn"], "user_id": flat["user_id"],
            "event_type": flat["event_type"], "value": flat["value"],
        })

    return (finish_sorted(ds.map_batches(wrap, batch_format="pyarrow")
              .map_batches(unwrap_flatten, batch_format="pyarrow"), "lsn"))


def window_aggregate(sf_dir: str, window: int = 1000):
    """Tumbling LSN windows (≙ the engine's streaming windows): per-window
    event count + value sum + watermark (max lsn)."""
    ds = _events(sf_dir)

    def add_window(t: pa.Table) -> pa.Table:
        wid = pc.cast(pc.divide(t["event_id"], window), pa.int64())
        return t.append_column("window_id", wid)

    with_w = ds.map_batches(add_window, batch_format="pyarrow")
    return finish_sorted(grouped_aggregate(
        with_w, ["window_id"],
        {"n_events": ("event_id", "count"),
         "sum_value": ("value", "sum2"),
         "watermark": ("event_id", "max")},
    ), "window_id")


def dedup_fence(sf_dir: str, watermark: int = 5000):
    """Offset fencing as a queryable op: drop events at/below the committed
    watermark, report survivors per event_type (≙ dedup_drops lineage)."""
    ds = _events(sf_dir)
    fenced = ds.map_batches(
        lambda t: t.filter(pc.greater(t["event_id"], watermark)),
        batch_format="pyarrow")
    return finish_sorted(grouped_aggregate(
        fenced, ["event_type"],
        {"events_applied": ("event_id", "count"),
         "min_lsn": ("event_id", "min"),
         "max_lsn": ("event_id", "max")},
    ), "event_type")


def changefeed_serialize(sf_dir: str):
    """Boundary serializer (T7): flat events → JSON-line payload column +
    destination routing (StreamNameMapper analogue). Returns (lsn,
    destination, payload) — payload shape matches the oracle's
    json_object(...) output."""
    ds = _events(sf_dir)

    def ser(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized JSON assembly; keys in fixed order ⇒ deterministic text
        payload = ('{"event_id":' + df["event_id"].astype(str)
                   + ',"user_id":' + df["user_id"].astype(str)
                   + ',"event_type":"' + df["event_type"] + '"'
                   + ',"value":' + np.char.mod("%.2f", df["value"].to_numpy())
                   + '}')
        return pd.DataFrame({
            "lsn": df["event_id"],
            "destination": "cdc." + df["event_type"],
            "payload": payload,
        })

    return finish_sorted(ds.map_batches(ser, batch_format="pandas"), "lsn")


def changefeed_export(sf_dir: str, fmt: str = "avro"):
    """Binary changefeed export — the vectorized converter family (T7)
    on the sink hot path: events → flat record → Avro / Protobuf /
    CloudEvents payload column → per-destination byte accounting.
    Returns (event_type, n_records, total_bytes) — deterministic
    (both encoders are pure functions of the rows), rows-only at the
    driver (varint byte lengths have no SQL form); exactness is pinned
    by the byte-parity and roundtrip tests in tests/test_sinks.py."""
    from cdcsdk_server_ray.stages.serializers import (to_avro,
                                                      to_cloudevents,
                                                      to_protobuf)

    ser = {"avro": to_avro, "protobuf": to_protobuf,
           "cloudevents": to_cloudevents}[fmt]
    ds = _events(sf_dir)

    def encode(t: pa.Table) -> pa.Table:
        flat = t.select(["event_id", "user_id", "event_type", "value"])
        flat = flat.rename_columns(["lsn", "user_id", "event_type",
                                    "value"])
        payload = ser(flat)["payload"]
        nbytes = pc.binary_length(payload) if fmt != "cloudevents" \
            else pc.utf8_length(payload)
        return pa.table({
            "event_type": t["event_type"],
            "n_records": pa.nulls(t.num_rows, pa.int64()).fill_null(1),
            "total_bytes": pc.cast(nbytes, pa.int64()),
        })

    out = grouped_aggregate(
        ds.map_batches(encode, batch_format="pyarrow"), ["event_type"],
        {"n_records": ("n_records", "sum"),
         "total_bytes": ("total_bytes", "sum")})

    def pin(t: pa.Table) -> pa.Table:
        for c in ("n_records", "total_bytes"):
            t = t.set_column(t.column_names.index(c), c,
                             pc.cast(t[c], pa.int64()))
        return t

    return finish_sorted(out.map_batches(pin, batch_format="pyarrow"), "event_type")


def version_retention(sf_dir: str, keep: int = 3, num_buckets: int = 32):
    """MVCC version retention — per key, keep only the newest ``keep``
    versions: the lake compaction policy between "LWW latest-only"
    (lww_state) and "keep everything" (time travel). Real CDC lakes run
    exactly this between full compactions.

    Same plan shape as the engine merge: a batch-local combiner first
    prunes every batch to ≤ keep rows per key it contains (so the
    shuffle carries at most keep versions per (key, block) — bounded
    regardless of update skew), then ONE hash-bucket exchange and one
    vectorized rank-and-prune kernel per bucket. Output (user_id,
    version_rank, event_id, event_type, value), rank 1 = newest.
    """
    ds = _events(sf_dir)

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_id"],
                            ascending=[True, False], kind="mergesort")
        return df[df.groupby("user_id", sort=False).cumcount() < keep]

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__ub"] = (df["user_id"].to_numpy(np.uint64)
                      % np.uint64(num_buckets)).astype(np.int32)
        return df

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_id"],
                            ascending=[True, False], kind="mergesort")
        df["version_rank"] = (df.groupby("user_id", sort=False).cumcount()
                              + 1).astype("int64")
        df = df[df["version_rank"] <= keep]
        return df.reindex(columns=["user_id", "version_rank", "event_id",
                                   "event_type", "value"])

    return (finish_sorted(ds.map_batches(prune, batch_format="pandas")
            .map_batches(add_bucket, batch_format="pandas")
            .groupby("__ub")
            .map_groups(rank_bucket, batch_format="pandas"), ["user_id", "version_rank"]))


def scd2_history(sf_dir: str, num_buckets: int = 32):
    """SCD type-2 versioned history of the documents changelog: one row
    per (key, content version) with its validity LSN interval —
    ``valid_from_lsn`` = the version's own LSN, ``valid_to_lsn`` = the
    LSN of the NEXT change on that key (update or delete; -1 = open) and
    ``is_current`` = 1 for the open, non-deleted tail version. Delete
    events close the last version but emit no row of their own — the
    standard dimension-table history shape warehouses derive from a CDC
    feed (the reference forwards the raw feed and leaves this to the
    sink's warehouse; here it's a first-class operator).

    Plan: the 3-round changelog (sources/source_table.py, pruned reads)
    → ONE hash exchange on the engine's own (repo, path) SipHash buckets
    → per bucket one vectorized sort + shift(-1) 'lead' kernel. Keys
    never split across buckets, so the lead within a bucket is exact —
    same partitioning invariant as the engine merge."""
    from cdcsdk_server_ray.sources.source_table import (
        MAX_LSN, table_changelog_dataset)
    from cdcsdk_server_ray.stages.partition import add_partition_column

    ch = table_changelog_dataset(f"{sf_dir}/documents.parquet", 1, MAX_LSN)

    def bucket(t: pa.Table) -> pa.Table:
        t = t.select(["repo", "path", "content", "op", "lsn"])
        return add_partition_column(t, num_buckets, column="__bucket")

    def versions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["repo", "path", "lsn"])
        same_key = (df["repo"].shift(-1).eq(df["repo"])
                    & df["path"].shift(-1).eq(df["path"])).to_numpy()
        nxt = df["lsn"].shift(-1).to_numpy()
        valid_to = np.where(same_key, nxt, -1).astype(np.int64)
        keep = df["op"].to_numpy() != "d"
        out = pd.DataFrame({
            "repo": df["repo"].to_numpy()[keep],
            "path": df["path"].to_numpy()[keep],
            "content": df["content"].to_numpy()[keep],
            "op": df["op"].to_numpy()[keep],
            "valid_from_lsn": df["lsn"].to_numpy()[keep],
            "valid_to_lsn": valid_to[keep],
        })
        out["is_current"] = (out["valid_to_lsn"] == -1).astype(np.int64)
        return out

    return (finish_sorted(ch.map_batches(bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(lambda g: versions(g.drop(columns="__bucket")),
                        batch_format="pandas"), ["repo", "path", "valid_from_lsn"]))


def transaction_metadata(sf_dir: str, num_buckets: int = 32):
    """Per-transaction metadata — Debezium's ``provide.transaction.
    metadata`` analogue (the reference's engine inherits it: the END
    marker of a transaction carries its per-collection event counts):
    for every ``tx_id`` of the documents-derived changelog, the event
    count, LSN boundaries, and the number of distinct repos touched.

    Plan (exact COUNT DISTINCT without a per-tx Python group): each
    block pre-combines to one partial row per (tx_id, repo) — count +
    lsn min/max — so the ONE hash exchange moves combiner-shrunk
    partials, then each of the ``num_buckets`` tx-hash buckets runs a
    single vectorized pandas groupby (sum/min/max/nunique). Transactions
    are contiguous LSN runs, so partials-per-tx ≈ 1-2 blocks at any
    scale."""
    import numpy as np
    import pandas as pd

    from cdcsdk_server_ray.sources.source_table import (MAX_LSN,
                                                        table_changelog_dataset)

    ch = table_changelog_dataset(f"{sf_dir}/documents.parquet", 1, MAX_LSN)

    def partials(t: pa.Table) -> pa.Table:
        df = pa.table({"tx_id": t["tx_id"], "lsn": t["lsn"],
                       "repo": t["repo"]}).to_pandas()
        g = (df.groupby(["tx_id", "repo"], sort=False)["lsn"]
             .agg(n_events="size", min_lsn="min", max_lsn="max")
             .reset_index())
        g["n_events"] = g["n_events"].astype("int64")
        g["__tb"] = (g["tx_id"].to_numpy(np.uint64)
                     % np.uint64(num_buckets)).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("tx_id", sort=False)
               .agg(n_events=("n_events", "sum"),
                    min_lsn=("min_lsn", "min"),
                    max_lsn=("max_lsn", "max"),
                    n_repos=("repo", "nunique"))
               .reset_index())
        for c in ("n_events", "n_repos"):
            out[c] = out[c].astype("int64")
        return out

    return (finish_sorted(ch.map_batches(partials, batch_format="pyarrow")
            .groupby("__tb")
            .map_groups(finish, batch_format="pandas"), "tx_id"))


def time_travel_counts(sf_dir: str, n_probes: int = 8,
                       num_buckets: int = 32):
    """Time-travel snapshot counts: for each of ``n_probes`` probe LSNs
    spread across the changelog, how many rows were LIVE at that point,
    per lang — the AS-OF/point-in-time read a CDC-fed warehouse serves
    from its version history (the reference forwards the raw feed and
    leaves time travel to the sink; here it is a first-class operator).

    Plan: ONE key-hash exchange co-locates each key's events (the same
    partitioning invariant as the engine merge); in-task the validity
    interval per version comes from one vectorized sort + shift(-1)
    'lead' (deletes close their predecessor but emit no row), and every
    probe evaluates as a numpy interval-containment mask over the
    bucket's versions — a point-in-interval temporal join with zero
    extra exchanges. Partials (≤ probes × langs rows per bucket) fold
    on the driver via ONE frame fetch (to_pandas — never take_all on
    thousands of pandas rows)."""
    from cdcsdk_server_ray.sources.source_table import (
        MAX_LSN, table_changelog_dataset)
    from cdcsdk_server_ray.stages.partition import add_partition_column

    probes = [(i + 1) * MAX_LSN // n_probes for i in range(n_probes)]
    ch = table_changelog_dataset(f"{sf_dir}/documents.parquet", 1, MAX_LSN)

    def bucket(t: pa.Table) -> pa.Table:
        t = t.select(["repo", "path", "lang", "op", "lsn"])
        return add_partition_column(t, num_buckets, column="__bucket")

    def probe_kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["repo", "path", "lsn"])
        same_key = (df["repo"].shift(-1).eq(df["repo"])
                    & df["path"].shift(-1).eq(df["path"])).to_numpy()
        nxt = df["lsn"].shift(-1).to_numpy()
        vt = np.where(same_key, nxt, -1).astype(np.int64)
        keep = df["op"].to_numpy() != "d"
        vf = df["lsn"].to_numpy(np.int64)[keep]
        vt = vt[keep]
        lang = df["lang"].to_numpy()[keep]
        outs = []
        for p in probes:
            m = (vf <= p) & ((vt == -1) | (p < vt))
            if not m.any():
                continue
            cnt = pd.Series(lang[m]).value_counts()
            outs.append(pd.DataFrame({
                "probe_lsn": np.full(len(cnt), p, np.int64),
                "lang": cnt.index.to_numpy(object),
                "n": cnt.to_numpy(np.int64)}))
        if not outs:
            return pd.DataFrame({
                "probe_lsn": pd.Series([], dtype="int64"),
                "lang": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    partials = (ch.map_batches(bucket, batch_format="pyarrow")
                .groupby("__bucket")
                .map_groups(lambda g: probe_kernel(g.drop(
                    columns="__bucket")), batch_format="pandas"))

    pf = partials.to_pandas()
    out = (pf.groupby(["probe_lsn", "lang"], sort=True)["n"].sum()
           .reset_index())
    out["n"] = out["n"].astype("int64")
    return out


def view_maintenance(sf_dir: str, n_windows: int = 6):
    """Incrementally-maintained materialized view: per-lang live-row
    count and total content bytes, updated window by window from the
    change stream's DELTAS — never recomputed from state. Each event
    contributes ``f(after) − f(before)`` (before-images from the
    REPLICA-IDENTITY-FULL changelog): creates add a row + their bytes,
    updates add only the byte diff, deletes subtract the deleted image.
    This is the streaming-database materialized-view shape; the
    invariant (and the oracle) is that the incrementally-maintained
    view EQUALS the aggregate recomputed over the final table state.

    Plan: the stream processes as ``n_windows`` bounded Dataset
    executions (the engine's window cadence); inside each, one
    map-only pass turns events into per-lang integer delta partials
    (≤ |langs| rows per block — no exchange at any scale), and the
    driver folds them into the view dict, which is lang-sized. Window
    boundaries are invariant by construction (deltas commute), which
    the test pins by re-running under different window counts."""
    from cdcsdk_server_ray.sources.source_table import (
        MAX_LSN, table_changelog_before_dataset)

    bounds = [1 + i * (MAX_LSN - 1) // n_windows
              for i in range(n_windows)] + [MAX_LSN]

    def delta_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        after_len = df["content"].str.len().fillna(0).astype("int64")
        before_len = (df["before_content"].str.len().fillna(0)
                      .astype("int64"))
        op = df["op"]
        d_rows = np.where(op == "c", 1, np.where(op == "d", -1, 0))
        d_bytes = after_len.to_numpy() - before_len.to_numpy()
        g = (pd.DataFrame({"lang": df["lang"], "d_rows": d_rows,
                           "d_bytes": d_bytes})
             .groupby("lang", sort=False).sum().reset_index())
        return pa.table({
            "lang": pa.array(g["lang"].to_numpy(object), pa.string()),
            "d_rows": pa.array(g["d_rows"].to_numpy(np.int64)),
            "d_bytes": pa.array(g["d_bytes"].to_numpy(np.int64))})

    view: dict[str, list[int]] = {}
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        ds = table_changelog_before_dataset(f"{sf_dir}/documents.parquet",
                                            lo, hi)
        pf = (ds.map_batches(delta_partial, batch_format="pyarrow")
              .to_pandas())
        if pf.empty:        # a window span intersecting no round
            continue
        for lang, g in pf.groupby("lang"):
            s = view.setdefault(lang, [0, 0])
            s[0] += int(g["d_rows"].sum())
            s[1] += int(g["d_bytes"].sum())

    langs = sorted(view)
    return pd.DataFrame({
        "lang": langs,
        "n_rows": pd.Series([view[l][0] for l in langs], dtype="int64"),
        "content_bytes": pd.Series([view[l][1] for l in langs],
                                   dtype="int64")})
