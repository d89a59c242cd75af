"""Relational operator coverage over the TPC-H-ish test tables.

These are the gap operators (SURVEY.md §2.5: grouped aggregation, joins,
sort/top-k, filters, distinct) expressed Ray-Data-first: column-pruned
reads, combiner-style pre-aggregation before any shuffle, broadcast joins
for dimension tables, per-batch prune before top-k. Each has an ANSI-SQL
oracle in ``__ray_entry__``.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cdcsdk_server_ray.stages.aggregate import grouped_aggregate, topk
from cdcsdk_server_ray.stages.join import broadcast_join
from cdcsdk_server_ray.stages.finish import finish_sorted


def _read(sf_dir: str, table: str, columns=None):
    import ray.data
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped aggregate: per (returnflag, linestatus) sums/avgs
    over lineitem shipped before a date. Pre-aggregated per batch."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount", "l_shipdate"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"],
                                   pa.scalar(pd.Timestamp("1998-09-02"))))
        disc_price = pc.multiply(t["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("disc_price", disc_price)

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    out = grouped_aggregate(
        prepped, ["l_returnflag", "l_linestatus"],
        {"sum_qty": ("l_quantity", "sum2"),
         "sum_base_price": ("l_extendedprice", "sum2"),
         "sum_disc_price": ("disc_price", "sum4"),
         "avg_qty": ("l_quantity", "mean2"),
         "avg_disc": ("l_discount", "mean2"),
         "count_order": ("l_quantity", "count")})
    return finish_sorted(out, ["l_returnflag", "l_linestatus"])


def revenue_by_segment(sf_dir: str):
    """orders ⋈ customer → revenue per market segment, through the
    SIZE-GUARDED join entry: the customer side broadcasts only while its
    metadata-estimated bytes fit the bound (it does at test scale; at
    sf100 the same call flips to the partitioned hash join with no code
    change). No unguarded driver-side ``to_pandas`` on a growing table."""
    from cdcsdk_server_ray.stages.join import join_parquet_dim

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    joined = join_parquet_dim(
        orders, f"{sf_dir}/customer.parquet", on="o_custkey",
        right_columns=["c_custkey", "c_mktsegment"],
        rename={"c_custkey": "o_custkey"})
    out = grouped_aggregate(
        joined, ["c_mktsegment"],
        {"n_orders": ("o_totalprice", "count"),
         "revenue": ("o_totalprice", "sum2")})
    return finish_sorted(out, "c_mktsegment")


def customers_per_region(sf_dir: str):
    """customer ⋈ nation ⋈ region via one composed broadcast lookup —
    a two-hop dimension chain collapsed into a single dict merge."""
    nation = _read(sf_dir, "nation").to_pandas()
    region = _read(sf_dir, "region").to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    dim = dim[["n_nationkey", "r_name"]].rename(
        columns={"n_nationkey": "c_nationkey"})
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])
    joined = broadcast_join(cust, dim, on="c_nationkey")
    out = grouped_aggregate(
        joined, ["r_name"],
        {"n_customers": ("c_custkey", "count"),
         "sum_acctbal": ("c_acctbal", "sum2")})
    return finish_sorted(out, "r_name")


def top_orders(sf_dir: str, k: int = 10):
    """Top-k orders by totalprice — per-batch prune, then tiny final sort
    (no global shuffle of the full table)."""
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return topk(orders, "o_totalprice", k,
                keep_cols=["o_orderkey", "o_custkey", "o_totalprice"])


def filter_range_aggregate(sf_dir: str):
    """Predicate + projection pushed to the read; per-type aggregates over
    a time slice of events."""
    import pyarrow.dataset as pads
    import ray.data
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "value"],
        filter=(pads.field("ts") >= pa.scalar(pd.Timestamp("2024-01-08"))))
    out = grouped_aggregate(
        ds, ["event_type"],
        {"n_events": ("value", "count"),
         "avg_value": ("value", "mean2"),
         "max_value": ("value", "max")})
    return finish_sorted(out, "event_type")


def distinct_langs(sf_dir: str):
    """DISTINCT via per-batch dedup + tiny final unique (combiner again —
    ``ds.unique`` would shuffle all rows)."""
    docs = _read(sf_dir, "documents", columns=["lang"])
    partial = docs.map_batches(lambda t: t.group_by("lang").aggregate([]),
                               batch_format="pyarrow")
    return finish_sorted(partial.groupby("lang").map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow"), "lang")


def order_priority_histogram(sf_dir: str):
    """Histogram of order priorities per status — two-key grouped count."""
    orders = _read(sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority"])
    out = grouped_aggregate(
        orders, ["o_orderstatus", "o_orderpriority"],
        {"n_orders": ("o_orderpriority", "count")})
    return finish_sorted(out, ["o_orderstatus", "o_orderpriority"])


def events_without_customer(sf_dir: str):
    """ANTI join: events whose user_id has no customer row — the
    broadcast-key-set pattern (ship the key set once, filter per batch;
    no shuffle — the semi/anti analogue of the dimension broadcast)."""
    import numpy as np
    import ray

    import pyarrow.compute as pc
    cust_keys = _read(sf_dir, "customer", columns=["c_custkey"]) \
        .to_pandas()["c_custkey"].to_numpy()
    cust_keys = cust_keys[cust_keys % 2 == 0]   # the "active" key subset
    key_ref = ray.put(np.sort(cust_keys))
    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "event_type"])

    def anti(t: pa.Table) -> pa.Table:
        keys = ray.get(key_ref)
        uid = t["user_id"].to_numpy()
        idx = np.searchsorted(keys, uid)
        idx = np.clip(idx, 0, len(keys) - 1)
        present = keys[idx] == uid
        return t.filter(pa.array(~present))

    out = ev.map_batches(anti, batch_format="pyarrow")
    return finish_sorted(grouped_aggregate(out, ["user_id"],
                             {"n_events": ("event_id", "count"),
                              "min_event_id": ("event_id", "min")},
                             final="shuffle"  # per-user keys: unbounded
                             ), "user_id")


def top_orders_per_segment(sf_dir: str, k: int = 3):
    """Grouped top-k (ranking window): the k highest-value orders per
    market segment. Attach the segment through the SIZE-GUARDED join
    entry (broadcast at test scale, partitioned hash join when the
    customer table outgrows the bound — no unguarded driver-side
    ``to_pandas``), per-batch prune to k per segment (combiner), tiny
    final per-group head."""
    import pandas as pd

    from cdcsdk_server_ray.stages.join import join_parquet_dim

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])
    joined = join_parquet_dim(
        orders, f"{sf_dir}/customer.parquet", on="o_custkey",
        right_columns=["c_custkey", "c_mktsegment"],
        rename={"c_custkey": "o_custkey"})

    _PRUNE_COLS = ["o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment"]
    _OUT_COLS = ["c_mktsegment", "rank", "o_orderkey", "o_totalprice"]

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        # typed output even when the batch is empty — empty pandas blocks
        # that drop their columns churn the stream's schema (RefBundle
        # schema warnings) and can mis-plan schema-dependent fusion
        return (df.sort_values(["o_totalprice", "o_orderkey"],
                               ascending=[False, True])
                .groupby("c_mktsegment", sort=False).head(k)
                .reindex(columns=_PRUNE_COLS))

    pruned = joined.map_batches(prune, batch_format="pandas")

    def final_all(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_totalprice", "o_orderkey"],
                            ascending=[False, True])
        df = df.groupby("c_mktsegment", sort=False).head(k)
        df["rank"] = (df.groupby("c_mktsegment", sort=False).cumcount() + 1
                      ).astype("int64")
        return (df.reindex(columns=_OUT_COLS)
                .sort_values(["c_mktsegment", "rank"]))

    # the combiner already shrank the stream to ≤ k×segments per block —
    # the final head is one tiny task, not a groupby exchange (whose empty
    # range partitions churned the schema in r01)
    return (pruned.repartition(1)
            .map_batches(final_all, batch_format="pandas", batch_size=None))


def shipping_priority(sf_dir: str, segment: str = "BUILDING",
                      cutoff: str = "1998-06-01", k: int = 10,
                      num_buckets: int = 32,
                      broadcast_bound: int | None = None):
    """TPC-H Q3 (shipping priority): unshipped-revenue top-``k`` orders
    for one market segment — the repo's large ⋈ large join pattern
    (lineitem ⋈ orders are the two biggest tables; neither side ever
    fits a broadcast at scale).

    Plan, scale-first:

    1. orders filtered on date, then SEMI-filtered to the segment's
       customers through the size-guarded plan chooser: below the byte
       bound the (pruned, filtered) key set broadcasts; above it the
       keys bucket-join — same guard as ``revenue_by_segment``.
    2. lineitem filtered on shipdate and collapsed per batch to
       (l_orderkey, rev_e4): revenue is quantized to fixed-point 1e-4
       units per ROW before any accumulation (repo float policy;
       extendedprice/discount carry ≤2 decimals each so the product is
       ≥2e6 ulps away from any rounding boundary — measured 2.4e-07).
    3. ONE exchange: ``bucket_join`` on the order key, with the
       group-sum + local top-k running INSIDE the join task via
       ``post_join`` — an order's rows are complete in their bucket
       group by construction, so the aggregate needs no second
       exchange and ≤k rows per bucket reach the one-task final.

    Integer rev_e4 sums are order-free, so the Ray total and the DuckDB
    total match bit-for-bit; revenue = rev_e4 / 10000.0 is the single
    float step, identical IEEE division on both sides."""
    import numpy as np

    from cdcsdk_server_ray.stages.join import (bucket_join,
                                               choose_join_plan)

    cut = pd.Timestamp(cutoff)
    group_cols = ["l_orderkey", "o_orderdate", "o_orderpriority"]

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_orderpriority"])

    def ord_filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["o_orderdate"], pa.scalar(cut)))

    orders_f = orders.map_batches(ord_filter, batch_format="pyarrow")

    cust_path = f"{sf_dir}/customer.parquet"
    cust_cols = ["c_custkey", "c_mktsegment"]
    if broadcast_bound is None:
        from cdcsdk_server_ray.stages.join import BROADCAST_BOUND_BYTES
        broadcast_bound = BROADCAST_BOUND_BYTES
    if choose_join_plan(cust_path, cust_cols, broadcast_bound) == "broadcast":
        import pyarrow.parquet as pq
        cust = pq.read_table(cust_path, columns=cust_cols).to_pandas()
        keys = (cust.loc[cust["c_mktsegment"] == segment, ["c_custkey"]]
                .rename(columns={"c_custkey": "o_custkey"}))
        orders_f = broadcast_join(orders_f, keys, on="o_custkey")
    else:
        import ray.data

        def seg_keys(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["c_mktsegment"], segment))
            return pa.table({"o_custkey": t["c_custkey"]})

        cust_ds = ray.data.read_parquet(
            cust_path, columns=cust_cols).map_batches(
                seg_keys, batch_format="pyarrow")
        orders_f = bucket_join(
            orders_f, cust_ds, on="o_custkey", num_buckets=num_buckets,
            left_dtypes={"o_orderkey": "int64", "o_custkey": "int64",
                         "o_orderdate": "datetime64[us]",
                         "o_orderpriority": object},
            right_dtypes={"o_custkey": "int64"})

    def ord_project(df: pd.DataFrame) -> pd.DataFrame:
        return (df[["o_orderkey", "o_orderdate", "o_orderpriority"]]
                .rename(columns={"o_orderkey": "l_orderkey"}))

    orders_side = orders_f.map_batches(ord_project, batch_format="pandas")

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])

    def li_project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(cut)))
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        rev_e4 = pc.cast(pc.round(pc.multiply(rev, pa.scalar(10000.0))),
                         pa.int64())
        # combiner before the exchange (repo rule): collapse the batch's
        # ~4 line rows per order to one partial — integer partials sum
        # exactly across batches, so the post_join total is unchanged
        part = (pa.table({"l_orderkey": t["l_orderkey"], "rev_e4": rev_e4})
                .group_by("l_orderkey").aggregate([("rev_e4", "sum")]))
        return pa.table({"l_orderkey": part["l_orderkey"],
                         "rev_e4": pc.cast(part["rev_e4_sum"], pa.int64())})

    li_f = li.map_batches(li_project, batch_format="pyarrow")

    # join-back size guard, MEASURED like Q18's: the qualifying orders
    # side is the product of two filters (date + segment semi-join), so
    # its size is only knowable after they run — materialize it slim
    # (it is consumed either way) and let the observed row count pick
    # the plan. Broadcast branch: the (orderkey → date, priority)
    # arrays ship once; lineitem partials drop non-qualifying orders
    # BEFORE the exchange and only (orderkey, rev_e4) ints cross it,
    # aggregated per orderkey in the standard bucket kernel (Ray's
    # hash Aggregate on near-singleton orderkey groups is the measured
    # 171s-vs-4s anti-pattern); winners re-attach date/priority from
    # the broadcast in the one-task final.
    orders_mat = orders_side.materialize()
    if orders_mat.count() * 32 <= broadcast_bound:
        import ray
        o = orders_mat.to_pandas()
        if o.empty:     # schema is lost through an all-empty fetch
            o = pd.DataFrame({
                "l_orderkey": pd.Series([], dtype="int64"),
                "o_orderdate": pd.Series([], dtype="datetime64[us]"),
                "o_orderpriority": pd.Series([], dtype=object)})
        o = o.sort_values("l_orderkey")
        pri_cats, pri_codes = (np.unique(
            o["o_orderpriority"].to_numpy(object), return_inverse=True)
            if len(o) else (np.array([], object),
                            np.array([], np.int64)))
        ref = ray.put((o["l_orderkey"].to_numpy(np.int64),
                       o["o_orderdate"].astype("datetime64[us]")
                       .to_numpy(),
                       pri_codes.astype(np.int8)))

        def prune_and_bucket(t: pa.Table) -> pd.DataFrame:
            ks, _, _ = ray.get(ref)
            ok = t["l_orderkey"].to_numpy()
            if len(ks):
                idx = np.clip(np.searchsorted(ks, ok), 0, len(ks) - 1)
                hit = ks[idx] == ok
            else:
                hit = np.zeros(len(ok), dtype=bool)
            out = pd.DataFrame({
                "l_orderkey": ok[hit],
                "rev_e4": t["rev_e4"].to_numpy()[hit]})
            out["__b"] = (out["l_orderkey"].to_numpy(np.uint64)
                          % np.uint64(num_buckets)).astype(np.int32)
            return out

        def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
            s = (g.groupby("l_orderkey", sort=False)["rev_e4"]
                 .sum().reset_index())
            s["rev_e4"] = s["rev_e4"].astype("int64")
            return (s.sort_values(["rev_e4", "l_orderkey"],
                                  ascending=[False, True]).head(k))

        winners = (li_f.map_batches(prune_and_bucket,
                                    batch_format="pyarrow")
                   .groupby("__b")
                   .map_groups(lambda g: bucket_topk(
                       g.drop(columns="__b")), batch_format="pandas"))

        def bfinal(df: pd.DataFrame) -> pd.DataFrame:
            ks, dates, pri = ray.get(ref)
            df = (df.sort_values(["rev_e4", "l_orderkey"],
                                 ascending=[False, True]).head(k)
                  .reset_index(drop=True))
            if not len(df) or not len(ks):
                return pd.DataFrame({
                    "l_orderkey": pd.Series([], dtype="int64"),
                    "revenue": pd.Series([], dtype="float64"),
                    "o_orderdate": pd.Series([],
                                             dtype="datetime64[us]"),
                    "o_orderpriority": pd.Series([], dtype=object)})
            idx = np.searchsorted(ks, df["l_orderkey"].to_numpy(np.int64))
            return pd.DataFrame({
                "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
                "revenue": df["rev_e4"].to_numpy(np.int64) / 10000.0,
                "o_orderdate": pd.Series(dates[idx]),
                "o_orderpriority": pri_cats[pri[idx]]})

        return winners.repartition(1).map_batches(
            bfinal, batch_format="pandas", batch_size=None)

    def agg_prune(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "l_orderkey": pd.Series([], dtype="int64"),
                "o_orderdate": pd.Series([], dtype="datetime64[us]"),
                "o_orderpriority": pd.Series([], dtype=object),
                "rev_e4": pd.Series([], dtype="int64")})
        g = (df.groupby(group_cols, sort=False)["rev_e4"]
             .sum().reset_index())
        g["rev_e4"] = g["rev_e4"].astype("int64")
        return (g.sort_values(["rev_e4", "l_orderkey"],
                              ascending=[False, True]).head(k)
                .reset_index(drop=True))

    joined = bucket_join(
        li_f, orders_mat, on="l_orderkey", num_buckets=num_buckets,
        left_dtypes={"l_orderkey": "int64", "rev_e4": "int64"},
        right_dtypes={"l_orderkey": "int64",
                      "o_orderdate": "datetime64[us]",
                      "o_orderpriority": object},
        post_join=agg_prune)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.sort_values(["rev_e4", "l_orderkey"],
                             ascending=[False, True]).head(k)
              .reset_index(drop=True))
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "revenue": df["rev_e4"].to_numpy(np.int64) / 10000.0,
            "o_orderdate": df["o_orderdate"],
            "o_orderpriority": df["o_orderpriority"]})

    return joined.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def local_supplier_volume(sf_dir: str, region: str = "ASIA",
                          date_from: str = "1997-01-01",
                          date_to: str = "1998-01-01",
                          num_buckets: int = 32,
                          broadcast_bound: int | None = None):
    """TPC-H Q5 (local supplier volume): revenue per nation where the
    ordering customer and the line's supplier share the nation, one
    region, one order-date year — the repo's MULTI-WAY join pattern
    with a cross-side equality that is NOT a join key
    (c_nationkey = s_nationkey can only be applied after both sides
    meet).

    Plan: nation⋈region fold to a broadcast {nationkey → n_name} for
    the region (constant-sized: 25/5 rows at any SF). customer and
    supplier attach their nationkey through the SIZE-GUARDED dim join
    (broadcast under the byte bound, bucket join above — both tables
    grow with SF). The single unavoidable large ⋈ large exchange is
    lineitem ⋈ orders on the order key; the cross-side filter, the
    region filter and the per-nation partial sum all run INSIDE that
    join task via ``post_join`` (≤ nations-in-region partial rows per
    bucket), so the final is a driver-side fold of sketch-sized
    partials. Revenue is fixed-point 1e-4 per row before any sum."""
    import numpy as np

    from cdcsdk_server_ray.stages.join import (BROADCAST_BOUND_BYTES,
                                               bucket_join,
                                               join_parquet_dim)

    if broadcast_bound is None:
        broadcast_bound = BROADCAST_BOUND_BYTES
    t_from, t_to = pd.Timestamp(date_from), pd.Timestamp(date_to)

    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    reg = pd.read_parquet(f"{sf_dir}/region.parquet")
    rk = reg.loc[reg["r_name"] == region, "r_regionkey"]
    nat = nation[nation["n_regionkey"].isin(set(rk))]
    name_of = dict(zip(nat["n_nationkey"].astype("int64"), nat["n_name"]))
    region_keys = frozenset(name_of)

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey",
                                              "o_orderdate"])

    def ord_filter(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(t_from)),
                    pc.less(t["o_orderdate"], pa.scalar(t_to)))
        return t.filter(m).select(["o_orderkey", "o_custkey"])

    orders_f = join_parquet_dim(
        orders.map_batches(ord_filter, batch_format="pyarrow"),
        f"{sf_dir}/customer.parquet", on="o_custkey",
        right_columns=["c_custkey", "c_nationkey"],
        rename={"c_custkey": "o_custkey"},
        broadcast_bound=broadcast_bound, num_buckets=num_buckets)

    def ord_project(df: pd.DataFrame) -> pd.DataFrame:
        # region pushdown: c_nationkey = s_nationkey ∈ region-nations can
        # only hold for region customers — drop the other ~4/5 of rows
        # BEFORE the exchange (same filter mirrored on the lineitem side)
        df = df[df["c_nationkey"].isin(region_keys)]
        return pd.DataFrame({
            "l_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "c_nationkey": df["c_nationkey"].to_numpy(np.int64)})

    orders_side = orders_f.map_batches(ord_project, batch_format="pandas")

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])

    def li_project(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        rev_e4 = pc.cast(pc.round(pc.multiply(rev, pa.scalar(10000.0))),
                         pa.int64())
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"], "rev_e4": rev_e4})

    li_s = join_parquet_dim(
        li.map_batches(li_project, batch_format="pyarrow"),
        f"{sf_dir}/supplier.parquet", on="l_suppkey",
        right_columns=["s_suppkey", "s_nationkey"],
        rename={"s_suppkey": "l_suppkey"},
        broadcast_bound=broadcast_bound, num_buckets=num_buckets)

    def li_side_project(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["s_nationkey"].isin(region_keys)]
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "s_nationkey": df["s_nationkey"].to_numpy(np.int64),
            "rev_e4": df["rev_e4"].to_numpy(np.int64)})

    li_side = li_s.map_batches(li_side_project, batch_format="pandas")

    def nation_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["c_nationkey"] == df["s_nationkey"])
                & df["s_nationkey"].isin(region_keys)]
        if not len(df):
            return pd.DataFrame({
                "s_nationkey": pd.Series([], dtype="int64"),
                "rev_e4": pd.Series([], dtype="int64")})
        g = (df.groupby("s_nationkey", sort=False)["rev_e4"]
             .sum().reset_index())
        g["rev_e4"] = g["rev_e4"].astype("int64")
        return g

    # join-back size guard, MEASURED (the Q18/Q3 pattern): the orders
    # side is year × region-customer filtered (~3% of orders, two int
    # columns) — when its observed count fits the bound, broadcast the
    # (orderkey → c_nationkey) arrays and the WHOLE query becomes
    # map-only: the cross-side equality resolves per lineitem batch and
    # only ≤|region nations| partial rows leave any stage.
    orders_mat = orders_side.materialize()
    if orders_mat.count() * 16 <= broadcast_bound:
        import ray
        o = orders_mat.to_pandas()
        if o.empty:     # schema is lost through an all-empty fetch
            o = pd.DataFrame({"l_orderkey": pd.Series([], dtype="int64"),
                              "c_nationkey": pd.Series([], dtype="int64")})
        o = o.sort_values("l_orderkey")
        ref = ray.put((o["l_orderkey"].to_numpy(np.int64),
                       o["c_nationkey"].to_numpy(np.int64)))

        def local_partial(df: pd.DataFrame) -> pd.DataFrame:
            ks, cn = ray.get(ref)
            if not len(ks) or not len(df):
                return pd.DataFrame({
                    "s_nationkey": pd.Series([], dtype="int64"),
                    "rev_e4": pd.Series([], dtype="int64")})
            ok = df["l_orderkey"].to_numpy(np.int64)
            idx = np.clip(np.searchsorted(ks, ok), 0, len(ks) - 1)
            hit = ks[idx] == ok
            df = df[hit].copy()
            df["c_nationkey"] = cn[idx[hit]]
            return nation_partial(df)

        partials = li_side.map_batches(local_partial,
                                       batch_format="pandas")
    else:
        partials = bucket_join(
            li_side, orders_mat, on="l_orderkey",
            num_buckets=num_buckets,
            left_dtypes={"l_orderkey": "int64", "s_nationkey": "int64",
                         "rev_e4": "int64"},
            right_dtypes={"l_orderkey": "int64",
                          "c_nationkey": "int64"},
            post_join=nation_partial)

    folded: dict[int, int] = {}
    for r in partials.take_all():
        k = int(r["s_nationkey"])
        folded[k] = folded.get(k, 0) + int(r["rev_e4"])
    rows = sorted(((name_of[k], v) for k, v in folded.items()),
                  key=lambda t: (-t[1], t[0]))
    return pd.DataFrame({
        "n_name": [r[0] for r in rows],
        "revenue": np.array([r[1] for r in rows],
                            dtype=np.int64) / 10000.0})


def large_order_quantities(sf_dir: str, threshold: int = 200, k: int = 100,
                           num_buckets: int = 32,
                           broadcast_bound: int | None = None):
    """TPC-H Q18 (large volume customers): orders whose total line
    quantity exceeds ``threshold``, top-``k`` by order value — the
    repo's aggregate → HAVING → join-back pattern (the qualifying-key
    set is itself the product of a high-cardinality aggregate, so it
    can never be computed driver-side).

    Plan: per-batch combiner collapses lineitem to (l_orderkey,
    qty-partial) integer rows; ONE exchange hashes the partials into
    ``num_buckets`` groups where a single vectorized kernel finishes
    the per-order sums and applies the HAVING filter (O(buckets)
    Python groups — the repo's anti-171-s rule). The qualifying rows
    stay a Dataset (at production SF they are millions of rows — never
    ``take_all``) and bucket-join back to orders with the top-k prune
    running INSIDE the join task (``post_join``); only ≤ k rows per
    bucket reach the one-task final, which then attaches c_name
    through the size-guarded customer dim join. Quantities are exact
    integers in the schema, so every accumulation is int64 — the only
    doubles in the output are read, not computed."""
    import numpy as np

    from cdcsdk_server_ray.stages.join import (BROADCAST_BOUND_BYTES,
                                               bucket_join,
                                               join_parquet_dim)

    if broadcast_bound is None:
        broadcast_bound = BROADCAST_BOUND_BYTES

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def qty_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.assign(qty=df["l_quantity"].astype("int64"))
             .groupby("l_orderkey", sort=False)["qty"].sum().reset_index())
        g["qty"] = g["qty"].astype("int64")
        g["__b"] = (pd.util.hash_pandas_object(g["l_orderkey"], index=False)
                    .to_numpy(np.uint64) % np.uint64(num_buckets)
                    ).astype(np.int32)
        return g

    def bucket_having(g: pd.DataFrame) -> pd.DataFrame:
        t = (g.groupby("l_orderkey", sort=False)["qty"].sum().reset_index())
        t = t[t["qty"] > threshold]
        return pd.DataFrame({
            "o_orderkey": t["l_orderkey"].to_numpy(np.int64),
            "sum_qty": t["qty"].to_numpy(np.int64)})

    # the qualifying keys are the product of the aggregate, so their
    # size is only knowable AFTER it runs: materialize the slim
    # (orderkey, sum_qty) result (it is consumed either way) and let
    # the observed row count pick the join-back plan — the same
    # keep-set size guard as Q2/Q10, but measured, not estimated
    qualifying = (li.map_batches(qty_partial, batch_format="pandas")
                  .groupby("__b")
                  .map_groups(bucket_having, batch_format="pandas")
                  .materialize())

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_totalprice"])

    def order_prune(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["o_totalprice", "o_orderkey"],
                               ascending=[False, True]).head(k)
                .reset_index(drop=True))

    if qualifying.count() * 16 <= broadcast_bound:
        import ray
        q = qualifying.to_pandas()
        if q.empty:     # schema is lost through an all-empty fetch
            q = pd.DataFrame({"o_orderkey": pd.Series([], dtype="int64"),
                              "sum_qty": pd.Series([], dtype="int64")})
        q = q.sort_values("o_orderkey")
        qref = ray.put((q["o_orderkey"].to_numpy(np.int64),
                        q["sum_qty"].to_numpy(np.int64)))

        def attach_and_prune(df: pd.DataFrame) -> pd.DataFrame:
            ks, sq = ray.get(qref)
            if not len(ks) or not len(df):
                out = df.iloc[:0].copy()
                out["sum_qty"] = pd.Series([], dtype="int64")
                return out
            ok = df["o_orderkey"].to_numpy(np.int64)
            idx = np.clip(np.searchsorted(ks, ok), 0, len(ks) - 1)
            hit = ks[idx] == ok
            out = df[hit].copy()
            out["sum_qty"] = sq[idx[hit]]
            return order_prune(out)

        joined = orders.map_batches(attach_and_prune,
                                    batch_format="pandas")
    else:
        joined = bucket_join(
            orders, qualifying, on="o_orderkey", num_buckets=num_buckets,
            left_dtypes={"o_orderkey": "int64", "o_custkey": "int64",
                         "o_orderdate": "datetime64[us]",
                         "o_totalprice": "float64"},
            right_dtypes={"o_orderkey": "int64", "sum_qty": "int64"},
            post_join=order_prune)

    # attach c_name to the ≤ k-per-bucket CANDIDATES (map-only under the
    # broadcast guard), so one global final does sort + head(k) + project
    # — not two repartition(1) passes
    named = join_parquet_dim(
        joined, f"{sf_dir}/customer.parquet", on="o_custkey",
        right_columns=["c_custkey", "c_name"],
        rename={"c_custkey": "o_custkey"},
        broadcast_bound=broadcast_bound, num_buckets=num_buckets)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.sort_values(["o_totalprice", "o_orderkey"],
                             ascending=[False, True]).head(k)
              .reset_index(drop=True))
        return df.reindex(columns=["o_orderkey", "c_name", "o_orderdate",
                                   "o_totalprice", "sum_qty"])

    return named.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def revenue_by_segment_bucket_join(sf_dir: str, num_buckets: int = 8):
    """Same result as revenue_by_segment but via the BUCKETED HASH JOIN
    (both-sides-large path): bucket both sides on the key hash, join
    bucket-wise inside map_groups — one shuffle, bounded per-task memory.
    Exists so the partitioned-join plan is oracle-checked too."""
    from cdcsdk_server_ray.stages.join import bucket_join

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]) \
        .map_batches(lambda df: df.rename(columns={"c_custkey": "o_custkey"}),
                     batch_format="pandas")
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    joined = bucket_join(orders, cust, on="o_custkey",
                         num_buckets=num_buckets)
    out = grouped_aggregate(
        joined, ["c_mktsegment"],
        {"n_orders": ("o_totalprice", "count"),
         "revenue": ("o_totalprice", "sum2")})
    return finish_sorted(out, "c_mktsegment")


def range_join_value_bands(sf_dir: str):
    """Range (interval) join — match each event to every OVERLAPPING
    value band [lo, hi): bands are derived from ``nation``
    (lo = n_nationkey·15, hi = lo+40, so consecutive bands overlap and
    an event matches ~2.7 of them). The band side is dimension-sized, so
    it broadcasts once (``ray.put`` + per-worker cache) and each batch
    joins VECTORIZED with one (batch × bands) comparison matrix —
    O(n·B) SIMD work, no shuffle, no per-row Python. Partitioning
    assumption (documented contract): B is dimension-sized; a
    large-B range join would swap the mask matrix for a sorted-endpoint
    interval index per worker, still broadcast, still shuffle-free."""
    import numpy as np
    import ray

    from cdcsdk_server_ray.stages.join import _bcast_get

    nation = _read(sf_dir, "nation", columns=["n_nationkey"]).to_pandas()
    lo = nation["n_nationkey"].to_numpy(np.int64) * 15.0
    bands = pd.DataFrame({"band_id": nation["n_nationkey"].to_numpy(np.int64),
                          "lo": lo, "hi": lo + 40.0})
    ref = ray.put(bands)

    def join_batch(df: pd.DataFrame) -> pd.DataFrame:
        b = _bcast_get(ref)
        v = df["value"].to_numpy(np.float64)
        mask = (v[:, None] >= b["lo"].to_numpy()[None, :]) \
            & (v[:, None] < b["hi"].to_numpy()[None, :])
        ei, bi = np.nonzero(mask)
        return pd.DataFrame({
            "band_id": b["band_id"].to_numpy()[bi],
            "event_id": df["event_id"].to_numpy(np.int64)[ei],
            "value": v[ei],
            "lo": b["lo"].to_numpy()[bi],
            "hi": b["hi"].to_numpy()[bi]})

    ev = _read(sf_dir, "events", columns=["event_id", "value"])
    return (finish_sorted(ev.map_batches(join_batch, batch_format="pandas"), ["band_id", "event_id"]))


def rollup_orders(sf_dir: str):
    """Hierarchical ROLLUP aggregate in ONE exchange: per (priority,
    status), per priority subtotal, and grand total — the cube/rollup
    shape warehouses compute from a CDC-fed orders table. Map-side each
    row EXPANDS into its 3 rollup levels ('ALL' sentinel for rolled-up
    keys) BEFORE the combiner, so the all-to-all still carries one
    partial row per (level-key, block): levels multiply the combiner
    input ×3 but never the exchange (distinct level keys are
    |priorities|×|statuses| + |priorities| + 1)."""
    from cdcsdk_server_ray.stages.aggregate import grouped_aggregate

    ds = _read(sf_dir, "orders",
               columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def expand(t: pa.Table) -> pa.Table:
        n = t.num_rows
        alls = pa.array(["ALL"] * n)
        parts = [
            pa.table({"priority": t["o_orderpriority"],
                      "status": t["o_orderstatus"], "v": t["o_totalprice"]}),
            pa.table({"priority": t["o_orderpriority"], "status": alls,
                      "v": t["o_totalprice"]}),
            pa.table({"priority": alls, "status": alls,
                      "v": t["o_totalprice"]}),
        ]
        return pa.concat_tables(parts)

    out = grouped_aggregate(ds.map_batches(expand, batch_format="pyarrow"),
                            ["priority", "status"],
                            {"n_orders": ("v", "count"),
                             "sum_total": ("v", "sum2")})
    return finish_sorted(out, ["priority", "status"])


def pivot_events(sf_dir: str):
    """Conditional-aggregate PIVOT: one row per user with per-event-type
    counts and the purchase-value sum as COLUMNS — the wide-table shape
    BI layers build from a long event stream. Map-side each batch
    derives the indicator columns vectorized (one Arrow mask per type)
    and pre-sums them per user (batch-local combiner), then ONE exchange
    into user-hash buckets with a vectorized groupby-sum per bucket —
    distinct keys are per-user (unbounded), so the final never touches
    the driver and each bucket is one pandas kernel, not one Python
    group per user. Values ride as integer cents so any partial-sum
    order is exact to 2dp."""
    import numpy as np

    TYPES = ["click", "error", "purchase", "signup", "view"]
    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "value"])

    def indicators(t: pa.Table) -> pa.Table:
        cols = {"user_id": t["user_id"]}
        for ty in TYPES:
            m = pc.equal(t["event_type"], ty)
            cols[f"is_{ty}"] = pc.cast(m, pa.int64())
        pm = pc.cast(pc.equal(t["event_type"], "purchase"), pa.float64())
        # integer-cent fixed point so partial sums are exact across any
        # grouping order (same trick as the sum2 combiner)
        cents = pc.round(pc.multiply(t["value"], pa.scalar(100.0)))
        cols["pv"] = pc.multiply(cents, pm)
        return pa.table(cols)

    import pandas as pd

    num_buckets = 32
    sums = [f"n_{ty}" for ty in TYPES] + ["pv"]

    def partial(t: pa.Table) -> pa.Table:
        # batch-local combiner: one row per user per block
        df = t.to_pandas()
        g = df.groupby("user_id", sort=False).sum().reset_index()
        g = g.rename(columns={f"is_{ty}": f"n_{ty}" for ty in TYPES})
        g["__b"] = (g["user_id"].to_numpy(np.uint64)
                    % np.uint64(num_buckets)).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False)

    def bucket_sum(g: "pd.DataFrame") -> "pd.DataFrame":
        out = (g.groupby("user_id", sort=False)[sums].sum().reset_index())
        for c in sums[:-1]:
            out[c] = out[c].astype("int64")
        out = out.rename(columns={"pv": "purchase_value"})
        # 2dp-exact like the sum2 combiner: partials are exact-decimal
        out["purchase_value"] = out["purchase_value"] / 100.0
        return out

    return (finish_sorted(ds.map_batches(indicators, batch_format="pyarrow")
            .map_batches(partial, batch_format="pyarrow")
            .groupby("__b")
            .map_groups(bucket_sum, batch_format="pandas"), "user_id"))


def _tagged_user_sides(sf_dir: str, num_buckets: int = 32,
                       right_min_value: float | None = None):
    """Shared map side of the relational set operations: ONE pass over
    the events read emits both sides' block-deduped (user_id, side)
    pairs, user-hash bucketed (a two-branch version executed the read
    twice — a Dataset fork re-runs its upstream). At 10^10 events only
    (user_id, side) pairs move. ``right_min_value`` optionally narrows
    the error side to high-severity events (value > bound)."""
    import numpy as np

    def tag_both(t: pa.Table) -> pa.Table:
        uids, sides = [], []
        for event_type, side in (("purchase", 0), ("error", 1)):
            mask = pc.equal(t["event_type"], event_type)
            if side == 1 and right_min_value is not None:
                mask = pc.and_(mask, pc.greater(
                    t["value"], pa.scalar(float(right_min_value))))
            f = t.filter(mask)
            u = np.unique(f["user_id"].to_numpy())    # block-local dedup
            uids.append(u)
            sides.append(np.full(len(u), side, np.int8))
        uid = np.concatenate(uids)
        b = (uid.astype(np.uint64) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table({"user_id": pa.array(uid, pa.int64()),
                         "side": pa.array(np.concatenate(sides)),
                         "__b": pa.array(b)})

    cols = ["user_id", "event_type"]
    if right_min_value is not None:
        cols.append("value")
    ev = _read(sf_dir, "events", columns=cols)
    return ev.map_batches(tag_both, batch_format="pyarrow").groupby("__b")


def users_intersect(sf_dir: str):
    """Set operation (INTERSECT): users who both purchased AND hit an
    error — the shared tagged exchange + a vectorized per-bucket
    intersection (distinct users present on both sides)."""
    import numpy as np
    import pandas as pd

    def intersect(g: pd.DataFrame) -> pd.DataFrame:
        both = (g.drop_duplicates(["user_id", "side"])
                .groupby("user_id", sort=False)["side"].nunique())
        out = both[both == 2].index.to_numpy()
        return pd.DataFrame({"user_id": np.sort(out).astype(np.int64)})

    return finish_sorted(_tagged_user_sides(sf_dir)
                         .map_groups(intersect, batch_format="pandas"),
                         "user_id")


def users_except(sf_dir: str, error_min_value: float = 200.0):
    """Set operation (EXCEPT): users who purchased and NEVER hit a
    high-severity error (value > ``error_min_value``) — the same tagged
    exchange as :func:`users_intersect` with the per-bucket kernel
    flipped to a set difference (a user's every event hashes to one
    bucket, so per-bucket presence is global presence)."""
    import numpy as np
    import pandas as pd

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["user_id", "side"])
        sides = d.groupby("user_id", sort=False)["side"].agg(["min", "max"])
        only_purchase = sides[(sides["min"] == 0)
                              & (sides["max"] == 0)].index.to_numpy()
        return pd.DataFrame(
            {"user_id": np.sort(only_purchase).astype(np.int64)})

    return finish_sorted(
        _tagged_user_sides(sf_dir, right_min_value=error_min_value)
        .map_groups(diff, batch_format="pandas"), "user_id")


def join_full_outer(sf_dir: str, price_floor: float = 300_000.0):
    """FULL OUTER join with unbounded keys on BOTH sides: per-customer
    big-order aggregates ⟗ the (even-custkey) customer dimension — rows
    survive from either side with typed defaults on the missing one.
    Both sides flow tagged through ONE custkey-hash exchange; each
    bucket runs one vectorized aggregate + `pd.merge(how='outer')`.
    Neither side broadcasts (at scale both are corpus-sized); only slim
    projections move."""
    import numpy as np

    num_buckets = 32

    def order_partials(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["o_totalprice"], price_floor))
        import pandas as _pd
        df = t.select(["o_custkey", "o_totalprice"]).to_pandas()
        cents = np.round(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        g = (_pd.DataFrame({"custkey": df["o_custkey"], "cents": cents})
             .groupby("custkey", sort=False)
             .agg(n_big=("cents", "size"), cents=("cents", "sum"))
             .reset_index())
        g["n_big"] = g["n_big"].astype(np.int64)
        g["c_mktsegment"] = ""
        g["side"] = np.int8(0)
        return pa.Table.from_pandas(g, preserve_index=False)

    def cust_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(pc.bit_wise_and(t["c_custkey"], 1), 0))
        import pandas as _pd
        g = _pd.DataFrame({
            "custkey": t["c_custkey"].to_numpy(),
            "n_big": np.zeros(t.num_rows, np.int64),
            "cents": np.zeros(t.num_rows, np.int64),
            "c_mktsegment": t["c_mktsegment"].to_pylist(),
            "side": np.full(t.num_rows, 1, np.int8)})
        return pa.Table.from_pandas(g, preserve_index=False)

    def bucket(t: pa.Table) -> pa.Table:
        b = (t["custkey"].to_numpy().astype(np.uint64)
             % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("__b", pa.array(b))

    def outer(g: pd.DataFrame) -> pd.DataFrame:
        o = (g[g["side"] == 0].groupby("custkey", sort=False)
             .agg(n_big=("n_big", "sum"), cents=("cents", "sum"))
             .reset_index())
        c = g.loc[g["side"] == 1, ["custkey", "c_mktsegment"]]
        m = o.merge(c, on="custkey", how="outer")
        m["n_big"] = m["n_big"].fillna(0).astype("int64")
        m["big_total"] = m["cents"].fillna(0) / 100.0
        m["c_mktsegment"] = m["c_mktsegment"].fillna("NONE")
        return m[["custkey", "n_big", "big_total", "c_mktsegment"]] \
            .astype({"custkey": "int64"})

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    tagged = (orders.map_batches(order_partials, batch_format="pyarrow")
              .union(cust.map_batches(cust_rows, batch_format="pyarrow"))
              .map_batches(bucket, batch_format="pyarrow"))
    return (finish_sorted(tagged.groupby("__b").map_groups(outer, batch_format="pandas"), "custkey"))


def events_by_weekday(sf_dir: str):
    """Temporal-function aggregate: per ISO weekday (1=Mon..7=Sun) and
    event type, count + 2dp-exact value sum — the day-of-week derivation
    runs vectorized in Arrow, the aggregate through the combiner."""
    from cdcsdk_server_ray.stages.aggregate import grouped_aggregate

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def add_dow(t: pa.Table) -> pa.Table:
        dow = pc.cast(pc.day_of_week(t["ts"]), pa.int64())  # 0=Mon
        return pa.table({"weekday": pc.add(dow, 1),
                         "event_type": t["event_type"],
                         "value": t["value"]})

    out = grouped_aggregate(ds.map_batches(add_dow, batch_format="pyarrow"),
                            ["weekday", "event_type"],
                            {"n_events": ("value", "count"),
                             "sum_value": ("value", "sum2")})
    return finish_sorted(out, ["weekday", "event_type"])


def wow_revenue(sf_dir: str):
    """Period-over-period analytics: weekly event-value totals with the
    previous week's total and the micro-unit delta alongside — the lag
    window rides a ONE-TASK kernel over the post-combine weekly rows
    (weeks are bounded; only partials shuffle). Values are floored to
    integer micros before summing so both engines agree bit-exactly."""
    import numpy as np

    ev = _read(sf_dir, "events", columns=["ts", "value"])

    def partials(t: pa.Table) -> pa.Table:
        import pandas as _pd
        df = t.to_pandas()
        week = df["ts"].dt.to_period("W-SUN").dt.start_time \
            .dt.strftime("%Y-%m-%d")
        micros = np.floor(df["value"].to_numpy() * 1_000_000) \
            .astype(np.int64)
        g = (_pd.DataFrame({"week": week, "micros": micros})
             .groupby("week", sort=False).agg(
                 n_events=("micros", "size"), micros=("micros", "sum"))
             .reset_index())
        g["n_events"] = g["n_events"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("week", sort=True)[["n_events", "micros"]]
             .sum().reset_index())
        g["prev_micros"] = g["micros"].shift(1).fillna(0).astype("int64")
        g["delta_micros"] = g["micros"] - g["prev_micros"]
        return g.astype({"n_events": "int64", "micros": "int64"})

    return (ev.map_batches(partials, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


def customer_order_distribution(sf_dir: str, status: str = "O",
                                num_buckets: int = 32):
    """TPC-H Q13 (customer distribution): how many customers placed
    0, 1, 2, … open orders — the LEFT OUTER JOIN + double aggregation
    shape (the reference-side analogue is the per-key fan-in histograms
    its Grafana boards compute over the CDC stream).

    Plan: a per-batch combiner collapses orders to (o_custkey,
    count-partial) integer rows; ONE exchange hashes the partials into
    ``num_buckets`` groups where a single vectorized kernel finishes the
    per-customer counts AND collapses them to (c_count, custdist)
    partials — a customer lives wholly in one bucket, so per-bucket
    counts are final and the exchange output is at most
    max_orders_per_customer rows per bucket. The zero bucket (customers
    with no qualifying order) is total_customers − Σ custdist, with
    total_customers read from the customer file's parquet METADATA
    (O(row-groups), never a scan — the left side of Q13's outer join
    contributes only its cardinality). Final is a one-task kernel over
    ≤ num_buckets × max_count tiny rows."""
    import numpy as np
    import pyarrow.parquet as pq

    total_customers = pq.ParquetFile(
        f"{sf_dir}/customer.parquet").metadata.num_rows

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["o_orderstatus"] == status]
        g = (df.groupby("o_custkey", sort=False).size().rename("n")
             .reset_index())
        g["n"] = g["n"].astype("int64")
        g["__b"] = (g["o_custkey"].to_numpy(np.uint64)
                    % np.uint64(num_buckets)).astype(np.int32)
        return g

    def bucket_hist(g: pd.DataFrame) -> pd.DataFrame:
        per_cust = g.groupby("o_custkey", sort=False)["n"].sum()
        vc = per_cust.value_counts()
        return pd.DataFrame({
            "c_count": vc.index.to_numpy(np.int64),
            "custdist": vc.to_numpy(np.int64)})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("c_count", sort=False)["custdist"].sum().reset_index()
        zero = total_customers - int(g["custdist"].sum())
        if zero > 0:
            g = pd.concat([g, pd.DataFrame({"c_count": [0],
                                            "custdist": [zero]})],
                          ignore_index=True)
        g = g.astype({"c_count": "int64", "custdist": "int64"})
        return (g.sort_values(["custdist", "c_count"],
                              ascending=[False, False])
                .reset_index(drop=True))

    return (orders.map_batches(partial, batch_format="pandas")
            .groupby("__b")
            .map_groups(bucket_hist, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


def sales_opportunity(sf_dir: str, cutoff: str = "1999-01-01",
                      num_buckets: int = 32):
    """TPC-H Q22 (global sales opportunity): customers whose balance
    exceeds the positive-balance corpus average AND who placed no order
    since ``cutoff``, grouped by nation — the scalar-subquery +
    NOT EXISTS anti-join shape.

    Three bounded phases:

    1. threshold — per-batch (Σ cents, count) integer partials over
       positive-balance customers, driver barrier over ≤ blocks tiny
       rows (never ``repartition(1)`` for two scalars). The comparison
       ``c_acctbal > avg`` is then evaluated as
       ``cents × count > Σ cents`` — pure int64, no float division, so
       the Ray and SQL sides agree bit-exactly with no epsilon;
    2. anti join — qualifying customers and the DISTINCT custkeys of
       post-cutoff orders (batch-deduped before the exchange) hash into
       ``num_buckets`` groups on custkey; one vectorized isin per
       bucket. The order-key side is corpus-sized at production SF —
       never broadcast (the dedup_survivors rule);
    3. per-bucket (nation, numcust, Σ cents) partials → one-task final
       (nations are constant-sized)."""
    import numpy as np
    import ray

    cust_cols = ["c_custkey", "c_nationkey", "c_acctbal"]
    cust = _read(sf_dir, "customer", columns=cust_cols)

    def thresh_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(df["c_acctbal"].to_numpy(np.float64) * 100
                         ).astype(np.int64)
        pos = cents[cents > 0]
        return pd.DataFrame({"sum_cents": [int(pos.sum())],
                             "cnt": [int(len(pos))]})

    parts = cust.map_batches(thresh_partial,
                             batch_format="pandas").take_all()
    sum_cents = sum(r["sum_cents"] for r in parts)
    cnt = sum(r["cnt"] for r in parts)

    def cust_rows(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(df["c_acctbal"].to_numpy(np.float64) * 100
                         ).astype(np.int64)
        keep = cents * cnt > sum_cents
        out = pd.DataFrame({
            "c_custkey": df["c_custkey"].to_numpy(np.int64)[keep],
            "c_nationkey": df["c_nationkey"].to_numpy(np.int64)[keep],
            "cents": cents[keep]})
        out["__side"] = "K"
        return out

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    cut_ts = pd.Timestamp(cutoff)

    def order_keys(df: pd.DataFrame) -> pd.DataFrame:
        k = df.loc[df["o_orderdate"] >= cut_ts, "o_custkey"] \
            .drop_duplicates()
        out = pd.DataFrame({"c_custkey": k.to_numpy(np.int64)})
        out["c_nationkey"] = np.int64(0)
        out["cents"] = np.int64(0)
        out["__side"] = "D"
        return out

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = (df["c_custkey"].to_numpy(np.uint64)
                     % np.uint64(num_buckets)).astype(np.int32)
        return df

    tagged = (cust.map_batches(cust_rows, batch_format="pandas")
              .union(orders.map_batches(order_keys, batch_format="pandas"))
              .map_batches(add_bucket, batch_format="pandas"))

    def anti_agg(g: pd.DataFrame) -> pd.DataFrame:
        has_order = g.loc[g["__side"] == "D", "c_custkey"]
        keep = g[g["__side"] == "K"]
        keep = keep[~keep["c_custkey"].isin(has_order)]
        out = (keep.groupby("c_nationkey", sort=False)
               .agg(numcust=("c_custkey", "size"), cents=("cents", "sum"))
               .reset_index())
        return out.astype({"c_nationkey": "int64", "numcust": "int64",
                           "cents": "int64"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("c_nationkey", sort=True)[["numcust", "cents"]]
             .sum().reset_index())
        g["totacctbal"] = np.round(
            g["cents"].to_numpy(np.int64) / 100.0, 2)
        return (g[["c_nationkey", "numcust", "totacctbal"]]
                .astype({"c_nationkey": "int64", "numcust": "int64"})
                .reset_index(drop=True))

    return (tagged.groupby("__b")
            .map_groups(anti_agg, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


def promo_revenue_share(sf_dir: str, promo_type: str = "ECONOMY",
                        month: str = "1997-09"):
    """TPC-H Q14 (promotion effect): the share of one month's discounted
    revenue coming from promo-class parts — the fact ⋈ dimension +
    conditional-aggregate shape reduced to scalars.

    Plan: the month predicate pushes to the lineitem SCAN (row groups
    outside the month never leave storage); the part dimension attaches
    through the size-guarded join (broadcast at test SF, bucketed at
    production SF where part is millions of rows); revenue accumulates
    as exact 10⁻⁴-unit integers (cents × discount-hundredths — both
    factors are 2-dec exact, so the product is int64 with no float
    rounding) in per-batch (promo, total) partials; a driver barrier
    over ≤ blocks rows finishes two sums and the one float division
    both engines round identically."""
    import numpy as np
    import pyarrow.dataset as pads
    import ray.data

    from cdcsdk_server_ray.stages.join import join_parquet_dim

    start = pd.Timestamp(f"{month}-01")
    end = start + pd.offsets.MonthBegin(1)
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=((pads.field("l_shipdate") >= pa.scalar(start))
                & (pads.field("l_shipdate") < pa.scalar(end))))

    joined = join_parquet_dim(
        li, f"{sf_dir}/part.parquet", on="l_partkey",
        right_columns=["p_partkey", "p_type"],
        rename={"p_partkey": "l_partkey"})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(df["l_extendedprice"].to_numpy(np.float64) * 100
                         ).astype(np.int64)
        disc_h = 100 - np.round(df["l_discount"].to_numpy(np.float64) * 100
                                ).astype(np.int64)
        rev4 = cents * disc_h
        promo = df["p_type"].to_numpy() == promo_type
        return pd.DataFrame({"promo4": [int(rev4[promo].sum())],
                             "total4": [int(rev4.sum())]})

    parts = joined.map_batches(partial, batch_format="pandas").take_all()
    promo4 = sum(r["promo4"] for r in parts)
    total4 = sum(r["total4"] for r in parts)
    pct = round(100.0 * promo4 / total4, 6) if total4 else 0.0
    return pd.DataFrame({
        "promo_revenue": [round(promo4 / 10_000.0, 2)],
        "total_revenue": [round(total4 / 10_000.0, 2)],
        "promo_pct": [pct]})


def returned_item_report(sf_dir: str, quarter_start: str = "1997-07-01",
                         k: int = 20, num_buckets: int = 32,
                         broadcast_bound: int | None = None):
    """TPC-H Q10 (returned item reporting): top-``k`` customers by
    revenue on returned lineitems over one quarter — the two-exchange
    fact⋈fact + re-key aggregate + top-k shape.

    Plan: both scans prune at the read (returnflag predicate on
    lineitem, the quarter on orders — only qualifying row groups leave
    storage). The quarter-filtered (orderkey, custkey) side is
    materialized SLIM and size-guarded: below the broadcast bound it
    ships once via ``ray.put`` and the join runs as a vectorized
    searchsorted INSIDE the lineitem map (no join exchange at all);
    above the bound the same semantics fall back to the l_orderkey
    bucket join with the per-customer revenue PARTIALS computed inside
    the join task (``post_join``). Either way custkey is NOT the join
    key, so the partials re-key through ONE exchange that carries
    (custkey, rev4-int) rows only, never lineitems. Per custkey-hash
    bucket one vectorized kernel finishes the sums and prunes to the
    local top-k (a customer lives wholly in one bucket → global top-k ⊆
    union of bucket top-k); the ≤ k×buckets candidates attach c_name /
    c_acctbal / n_name through the size-guarded dim joins, and a
    one-task final sorts on the EXACT int rev4 before rounding."""
    import numpy as np
    import pyarrow.dataset as pads
    import ray.data

    from cdcsdk_server_ray.stages.join import (BROADCAST_BOUND_BYTES,
                                               bucket_join,
                                               join_parquet_dim)

    if broadcast_bound is None:
        broadcast_bound = BROADCAST_BOUND_BYTES

    start = pd.Timestamp(quarter_start)
    end = start + pd.offsets.MonthBegin(3)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_returnflag") == "R"))

    def _rev4(df: pd.DataFrame) -> "np.ndarray":
        cents = np.round(df["l_extendedprice"].to_numpy(np.float64) * 100
                         ).astype(np.int64)
        disc_h = 100 - np.round(df["l_discount"].to_numpy(np.float64) * 100
                                ).astype(np.int64)
        return cents * disc_h

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        filter=((pads.field("o_orderdate") >= pa.scalar(start))
                & (pads.field("o_orderdate") < pa.scalar(end))))

    def ord_rename(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "o_custkey": df["o_custkey"].to_numpy(np.int64)})

    def cust_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("o_custkey", sort=False)["rev4"].sum()
             .reset_index())
        g["__cb"] = (g["o_custkey"].to_numpy(np.uint64)
                     % np.uint64(num_buckets)).astype(np.int32)
        return g.astype({"o_custkey": "int64", "rev4": "int64"})

    # slim quarter side: 2 int64 cols, materialized so size_bytes is
    # metadata and the branch below never re-executes the filtered read
    ord_slim = (orders.map_batches(ord_rename, batch_format="pandas")
                .materialize())

    if (ord_slim.size_bytes() or 0) <= broadcast_bound:
        import ray

        odf = ord_slim.to_pandas()
        okeys = odf["l_orderkey"].to_numpy(np.int64)
        ix = np.argsort(okeys, kind="stable")
        ref = ray.put((okeys[ix],
                       odf["o_custkey"].to_numpy(np.int64)[ix]))

        def li_join_partial(df: pd.DataFrame) -> pd.DataFrame:
            keys, cust = ray.get(ref)
            empty = pd.DataFrame({"o_custkey": np.array([], np.int64),
                                  "rev4": np.array([], np.int64),
                                  "__cb": np.array([], np.int32)})
            if not len(df) or not len(keys):
                return empty
            lk = df["l_orderkey"].to_numpy(np.int64)
            pos = np.clip(np.searchsorted(keys, lk), 0, len(keys) - 1)
            hit = keys[pos] == lk
            if not hit.any():
                return empty
            return cust_partial(pd.DataFrame(
                {"o_custkey": cust[pos[hit]],
                 "rev4": _rev4(df)[hit]}))

        joined = li.map_batches(li_join_partial, batch_format="pandas")
    else:
        def li_rev(df: pd.DataFrame) -> pd.DataFrame:
            g = (pd.DataFrame({"l_orderkey":
                               df["l_orderkey"].to_numpy(np.int64),
                               "rev4": _rev4(df)})
                 .groupby("l_orderkey", sort=False)["rev4"].sum()
                 .reset_index())
            return g.astype({"l_orderkey": "int64", "rev4": "int64"})

        joined = bucket_join(
            li.map_batches(li_rev, batch_format="pandas"), ord_slim,
            on="l_orderkey", num_buckets=num_buckets,
            left_dtypes={"l_orderkey": "int64", "rev4": "int64"},
            right_dtypes={"l_orderkey": "int64", "o_custkey": "int64"},
            post_join=cust_partial)

    def bucket_cust_topk(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("o_custkey", sort=False)["rev4"].sum().reset_index()
        t = (t.sort_values(["rev4", "o_custkey"], ascending=[False, True])
             .head(k))
        return t.astype({"o_custkey": "int64", "rev4": "int64"})

    candidates = (joined.groupby("__cb")
                  .map_groups(bucket_cust_topk, batch_format="pandas"))

    named = join_parquet_dim(
        candidates, f"{sf_dir}/customer.parquet", on="o_custkey",
        right_columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        rename={"c_custkey": "o_custkey"},
        broadcast_bound=broadcast_bound, num_buckets=num_buckets)

    nation = _read(sf_dir, "nation").to_pandas()  # constant-sized dim
    nmap = dict(zip(nation["n_nationkey"].astype(int),
                    nation["n_name"]))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.sort_values(["rev4", "o_custkey"],
                             ascending=[False, True]).head(k)
              .reset_index(drop=True))
        return pd.DataFrame({
            "c_custkey": df["o_custkey"].astype("int64"),
            "c_name": df["c_name"],
            "revenue": np.round(df["rev4"].to_numpy(np.int64) / 10_000.0,
                                2),
            "c_acctbal": df["c_acctbal"].astype("float64"),
            "n_name": df["c_nationkey"].astype(int).map(nmap)})

    return named.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def cube_orders(sf_dir: str):
    """CUBE aggregate over (priority, status) in ONE exchange — the full
    grouping-sets lattice { (p,s), (p,ALL), (ALL,s), (ALL,ALL) }
    completing :func:`rollup_orders`'s hierarchy. Same map-side
    expansion: each row emits its 4 cube levels BEFORE the combiner, so
    the all-to-all carries one partial row per (level-key, block) — the
    exchange never multiplies with row count, only the combiner input
    does (×4)."""
    from cdcsdk_server_ray.stages.aggregate import grouped_aggregate

    ds = _read(sf_dir, "orders",
               columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def expand(t: pa.Table) -> pa.Table:
        n = t.num_rows
        alls = pa.array(["ALL"] * n)
        parts = [
            pa.table({"priority": t["o_orderpriority"],
                      "status": t["o_orderstatus"], "v": t["o_totalprice"]}),
            pa.table({"priority": t["o_orderpriority"], "status": alls,
                      "v": t["o_totalprice"]}),
            pa.table({"priority": alls, "status": t["o_orderstatus"],
                      "v": t["o_totalprice"]}),
            pa.table({"priority": alls, "status": alls,
                      "v": t["o_totalprice"]}),
        ]
        return pa.concat_tables(parts)

    out = grouped_aggregate(ds.map_batches(expand, batch_format="pyarrow"),
                            ["priority", "status"],
                            {"n_orders": ("v", "count"),
                             "sum_total": ("v", "sum2")})
    return finish_sorted(out, ["priority", "status"])


def small_quantity_revenue(sf_dir: str, brand: str = "Brand#23",
                           max_size: int = 15, num_buckets: int = 32,
                           broadcast_bound: int | None = None):
    """TPC-H Q17 (small-quantity-order revenue): average yearly revenue
    lost if orders below 20% of a part's average quantity were not
    taken — the repo's CORRELATED-SCALAR-SUBQUERY shape (each row is
    filtered against an aggregate of its own group).

    Plan: the part predicate (brand + size) selects a key set that
    grows with SF, so it rides the size guard — below the byte bound
    the selected partkeys broadcast as a frozenset and prune lineitem
    BEFORE the exchange (only ~|part|/75 of rows ship); above it the
    keys stay a Dataset and the prune happens inside the bucket join.
    Either way ONE partkey exchange co-locates each part's complete
    lineitem history, where the per-part mean and the conditional sum
    run in-task (``post_join`` / bucket kernel) — the driver folds one
    partial row per bucket. Quantities are integral in TPC-H, so the
    correlated comparison ``qty < 0.2 * avg(qty)`` is computed
    EXACT-INTEGER as ``5*qty*count < sum_qty`` (no float avg enters),
    and revenue accumulates in int64 cents; the single float step is
    the final /700.0 (reference has no joins — SURVEY.md §2.5 gap op).
    """
    import numpy as np
    import ray.data

    from cdcsdk_server_ray.stages.join import (BROADCAST_BOUND_BYTES,
                                               bucket_join,
                                               choose_join_plan)

    if broadcast_bound is None:
        broadcast_bound = BROADCAST_BOUND_BYTES

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def li_project(t: pa.Table) -> pa.Table:
        qty = pc.cast(t["l_quantity"], pa.int64())
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             pa.scalar(100.0))), pa.int64())
        return pa.table({"l_partkey": t["l_partkey"], "qty": qty,
                         "cents": cents})

    li_p = li.map_batches(li_project, batch_format="pyarrow")

    def part_kernel(df: pd.DataFrame) -> pd.DataFrame:
        # complete per-partkey groups are guaranteed here (one bucket =
        # whole partkeys): exact-integer correlated filter + partial sum
        if not len(df):
            return pd.DataFrame({"cents": pd.Series([], dtype="int64")})
        g = df.groupby("l_partkey", sort=False)["qty"]
        sum_q = g.transform("sum").to_numpy(np.int64)
        cnt = g.transform("count").to_numpy(np.int64)
        mask = 5 * df["qty"].to_numpy(np.int64) * cnt < sum_q
        total = int(df["cents"].to_numpy(np.int64)[mask].sum())
        return pd.DataFrame({"cents": pd.Series([total], dtype="int64")})

    plan = choose_join_plan(f"{sf_dir}/part.parquet", ["p_partkey"],
                            broadcast_bound)
    if plan == "broadcast":
        part = pd.read_parquet(f"{sf_dir}/part.parquet",
                               columns=["p_partkey", "p_brand", "p_size"])
        keys = frozenset(part.loc[(part["p_brand"] == brand)
                                  & (part["p_size"] <= max_size),
                                  "p_partkey"].astype("int64"))

        def prune_and_bucket(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["l_partkey"].isin(keys)].copy()
            df["__bucket"] = (pd.util.hash_pandas_object(
                df["l_partkey"], index=False) % num_buckets).astype("int32")
            return df

        partials = (li_p.map_batches(prune_and_bucket, batch_format="pandas")
                    .groupby("__bucket")
                    .map_groups(lambda g: part_kernel(g),
                                batch_format="pandas"))
    else:
        part_ds = ray.data.read_parquet(
            f"{sf_dir}/part.parquet",
            columns=["p_partkey", "p_brand", "p_size"]).map_batches(
            lambda t: t.filter(
                pc.and_(pc.equal(t["p_brand"], pa.scalar(brand)),
                        pc.less_equal(t["p_size"], pa.scalar(max_size)))
            ).select(["p_partkey"]).rename_columns(["l_partkey"]),
            batch_format="pyarrow")
        partials = bucket_join(
            li_p, part_ds, on="l_partkey", num_buckets=num_buckets,
            left_dtypes={"l_partkey": "int64", "qty": "int64",
                         "cents": "int64"},
            right_dtypes={"l_partkey": "int64"},
            post_join=part_kernel)

    total = sum(int(r["cents"]) for r in partials.take_all())
    return pd.DataFrame({"avg_yearly": [round(total / 700.0, 2)]})


def top_supplier(sf_dir: str, date_from: str = "1997-07-01",
                 date_to: str = "1997-10-01",
                 broadcast_bound: int | None = None):
    """TPC-H Q15 (top supplier): the supplier(s) with maximum revenue in
    one ship-date quarter — the repo's GLOBAL-SCALAR-THEN-FILTER shape
    (a view aggregated per key, compared against its own MAX, ties
    kept).

    Plan: one exchange builds per-supplier totals (map-side combiner →
    hash aggregate; per-key cardinality is unbounded so ``final=
    "shuffle"``). The totals are the fork point — consumed once for the
    global max and once for the tie filter — so they are
    ``materialize()``d (slim: two int64 columns, |supplier| rows)
    rather than re-executing the lineitem scan per consumer. The max
    folds from per-block partials on the driver (≤ |blocks| rows); the
    winners attach ``s_name`` through the size-guarded dim join.
    Revenue is exact-integer 1e-4 (cents × (100 − disc_pct)) end to
    end; the only float step is the final /10000.0 both engines share.
    """
    import numpy as np

    from cdcsdk_server_ray.stages.join import (BROADCAST_BOUND_BYTES,
                                               join_parquet_dim)

    if broadcast_bound is None:
        broadcast_bound = BROADCAST_BOUND_BYTES
    t_from, t_to = pd.Timestamp(date_from), pd.Timestamp(date_to)

    li = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])

    def project(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(t_from)),
                    pc.less(t["l_shipdate"], pa.scalar(t_to)))
        t = t.filter(m)
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             pa.scalar(100.0))), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(t["l_discount"],
                                            pa.scalar(100.0))), pa.int64())
        rev4 = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()),
                                              disc))
        return pa.table({"s_suppkey": t["l_suppkey"], "rev4": rev4})

    totals = grouped_aggregate(
        li.map_batches(project, batch_format="pyarrow"),
        ["s_suppkey"], {"rev4": ("rev4", "sum")},
        final="shuffle").materialize()

    def block_max(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"m": pa.array([], pa.int64())})
        return pa.table({"m": pa.array(
            [pc.max(t["rev4"]).as_py()], pa.int64())})

    maxima = [r["m"] for r in
              totals.map_batches(block_max,
                                 batch_format="pyarrow").take_all()]
    best = max(maxima) if maxima else 0

    winners = totals.map_batches(
        lambda t: t.filter(pc.equal(t["rev4"],
                                    pa.scalar(best, pa.int64()))),
        batch_format="pyarrow")
    named = join_parquet_dim(
        winners, f"{sf_dir}/supplier.parquet", on="s_suppkey",
        right_columns=["s_suppkey", "s_name"],
        broadcast_bound=broadcast_bound)

    df = named.to_pandas()
    if df.empty:        # empty quarter: schema lost through the fetch
        return pd.DataFrame({
            "s_suppkey": pd.Series([], dtype="int64"),
            "s_name": pd.Series([], dtype="object"),
            "total_revenue": pd.Series([], dtype="float64")})
    df = df.sort_values("s_suppkey").reset_index(drop=True)
    return pd.DataFrame({
        "s_suppkey": df["s_suppkey"].to_numpy(np.int64),
        "s_name": df["s_name"],
        "total_revenue": df["rev4"].to_numpy(np.int64) / 10000.0})


def volume_shipping(sf_dir: str, nation_a: str = "NATION_3",
                    nation_b: str = "NATION_7",
                    date_from: str = "1996-01-01",
                    date_to: str = "1998-01-01",
                    num_buckets: int = 32,
                    broadcast_bound: int | None = None):
    """TPC-H Q7 (volume shipping): revenue shipped between two nations,
    in both directions, per ship year — the repo's BOTH-SIDES-ENRICHED
    join (each side of the fact⋈fact exchange first attaches its own
    dimension attribute, and the final predicate relates the two).

    Plan: supplier/customer attach nationkey through the size-guarded
    dim join; both sides then prune to the two nations BEFORE the
    order-key exchange (≈ 2/25 of rows survive — the same pushdown
    argument as Q5's region filter: the cross-side pair predicate can
    only hold for the two nations). ONE bucket exchange joins the
    sides; the direction filter (supp ≠ cust nation) and the
    (supp, cust, year) partial sums run in-task — ≤ 2×|years| partial
    rows per bucket fold on the driver. Revenue is exact-integer 1e-4.
    """
    import numpy as np

    from cdcsdk_server_ray.stages.join import (BROADCAST_BOUND_BYTES,
                                               bucket_join,
                                               join_parquet_dim)

    if broadcast_bound is None:
        broadcast_bound = BROADCAST_BOUND_BYTES
    t_from, t_to = pd.Timestamp(date_from), pd.Timestamp(date_to)

    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    keys = nation.loc[nation["n_name"].isin([nation_a, nation_b])]
    name_of = dict(zip(keys["n_nationkey"].astype("int64"),
                       keys["n_name"]))
    pair_keys = frozenset(name_of)

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount", "l_shipdate"])

    def li_project(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(t_from)),
                    pc.less(t["l_shipdate"], pa.scalar(t_to)))
        t = t.filter(m)
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             pa.scalar(100.0))), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(t["l_discount"],
                                            pa.scalar(100.0))), pa.int64())
        rev4 = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()),
                                              disc))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"],
                         "l_year": pc.cast(pc.year(t["l_shipdate"]),
                                           pa.int64()),
                         "rev4": rev4})

    li_s = join_parquet_dim(
        li.map_batches(li_project, batch_format="pyarrow"),
        f"{sf_dir}/supplier.parquet", on="l_suppkey",
        right_columns=["s_suppkey", "s_nationkey"],
        rename={"s_suppkey": "l_suppkey"},
        broadcast_bound=broadcast_bound, num_buckets=num_buckets)

    def li_side(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["s_nationkey"].isin(pair_keys)]
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "l_year": df["l_year"].to_numpy(np.int64),
            "rev4": df["rev4"].to_numpy(np.int64),
            "s_nationkey": df["s_nationkey"].to_numpy(np.int64)})

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    ord_c = join_parquet_dim(
        orders, f"{sf_dir}/customer.parquet", on="o_custkey",
        right_columns=["c_custkey", "c_nationkey"],
        rename={"c_custkey": "o_custkey"},
        broadcast_bound=broadcast_bound, num_buckets=num_buckets)

    def ord_side(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["c_nationkey"].isin(pair_keys)]
        return pd.DataFrame({
            "l_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "c_nationkey": df["c_nationkey"].to_numpy(np.int64)})

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["s_nationkey"] != df["c_nationkey"]]
        if not len(df):
            return pd.DataFrame({
                "s_nationkey": pd.Series([], dtype="int64"),
                "c_nationkey": pd.Series([], dtype="int64"),
                "l_year": pd.Series([], dtype="int64"),
                "rev4": pd.Series([], dtype="int64")})
        g = (df.groupby(["s_nationkey", "c_nationkey", "l_year"],
                        sort=False)["rev4"].sum().reset_index())
        g["rev4"] = g["rev4"].astype("int64")
        return g

    # join-back size guard, MEASURED (Q18/Q3/Q5/Q8 pattern): the orders
    # side prunes to the two nations' customers (~2/25), two int
    # columns — under the bound the (orderkey → c_nationkey) arrays
    # broadcast and the direction pairs fold per lineitem batch
    # map-only.
    ord_mat = ord_c.map_batches(ord_side,
                                batch_format="pandas").materialize()
    if ord_mat.count() * 16 <= broadcast_bound:
        import ray
        o = ord_mat.to_pandas()
        if o.empty:     # schema is lost through an all-empty fetch
            o = pd.DataFrame({"l_orderkey": pd.Series([], dtype="int64"),
                              "c_nationkey": pd.Series([], dtype="int64")})
        o = o.sort_values("l_orderkey")
        ref = ray.put((o["l_orderkey"].to_numpy(np.int64),
                       o["c_nationkey"].to_numpy(np.int64)))

        def local_partial(df: pd.DataFrame) -> pd.DataFrame:
            ks, cn = ray.get(ref)
            if not len(ks) or not len(df):
                return pair_partial(df.iloc[:0].assign(c_nationkey=[]))
            ok = df["l_orderkey"].to_numpy(np.int64)
            idx = np.clip(np.searchsorted(ks, ok), 0, len(ks) - 1)
            hit = ks[idx] == ok
            df = df[hit].copy()
            df["c_nationkey"] = cn[idx[hit]]
            return pair_partial(df)

        partials = li_s.map_batches(li_side, batch_format="pandas") \
            .map_batches(local_partial, batch_format="pandas")
    else:
        partials = bucket_join(
            li_s.map_batches(li_side, batch_format="pandas"),
            ord_mat,
            on="l_orderkey", num_buckets=num_buckets,
            left_dtypes={"l_orderkey": "int64", "l_year": "int64",
                         "rev4": "int64", "s_nationkey": "int64"},
            right_dtypes={"l_orderkey": "int64",
                          "c_nationkey": "int64"},
            post_join=pair_partial)

    folded: dict[tuple, int] = {}
    for r in partials.take_all():
        k = (int(r["s_nationkey"]), int(r["c_nationkey"]),
             int(r["l_year"]))
        folded[k] = folded.get(k, 0) + int(r["rev4"])
    rows = sorted((name_of[s], name_of[c], y, v)
                  for (s, c, y), v in folded.items())
    return pd.DataFrame({
        "supp_nation": [r[0] for r in rows],
        "cust_nation": [r[1] for r in rows],
        "l_year": pd.Series([r[2] for r in rows], dtype="int64"),
        "revenue": np.array([r[3] for r in rows],
                            dtype=np.int64) / 10000.0})


def market_share(sf_dir: str, part_type: str = "ECONOMY",
                 region: str = "ASIA", supp_nation: str = "NATION_3",
                 date_from: str = "1996-01-01", date_to: str = "1998-01-01",
                 num_buckets: int = 32,
                 broadcast_bound: int | None = None):
    """TPC-H Q8 (national market share): one nation's share of the
    revenue for one part type sold into one region, per order year —
    the repo's CONDITIONAL-SHARE-OF-TOTAL shape (numerator and
    denominator of a ratio accumulated in the same pass).

    Plan: the part-type keep set prunes lineitem through the size
    guard (broadcast frozenset below the bound, a partkey bucket
    semi-join above — the honest extra exchange when the keep side is
    corpus-sized). Supplier nationkey attaches via the guarded dim
    join; orders filter to the date window and attach the customer's
    nationkey the same way, pruning to the target REGION before the
    exchange (only region customers can contribute). ONE order-key
    bucket exchange then accumulates BOTH integer sums per year
    in-task — numerator (target-nation rows) and denominator — so the
    driver folds ≤ |years| rows and the single float step is the final
    num/den divide both engines round at 6dp."""
    import numpy as np
    import ray.data

    from cdcsdk_server_ray.stages.join import (BROADCAST_BOUND_BYTES,
                                               bucket_join,
                                               choose_join_plan,
                                               join_parquet_dim)

    if broadcast_bound is None:
        broadcast_bound = BROADCAST_BOUND_BYTES
    t_from, t_to = pd.Timestamp(date_from), pd.Timestamp(date_to)

    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    reg = pd.read_parquet(f"{sf_dir}/region.parquet")
    rk = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    region_keys = frozenset(
        nation.loc[nation["n_regionkey"].isin(rk),
                   "n_nationkey"].astype("int64"))
    target_key = int(nation.loc[nation["n_name"] == supp_nation,
                                "n_nationkey"].iloc[0])

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey",
                        "l_extendedprice", "l_discount"])

    def li_project(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             pa.scalar(100.0))), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(t["l_discount"],
                                            pa.scalar(100.0))), pa.int64())
        rev4 = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()),
                                              disc))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_partkey": t["l_partkey"],
                         "l_suppkey": t["l_suppkey"], "rev4": rev4})

    li_p = li.map_batches(li_project, batch_format="pyarrow")

    plan = choose_join_plan(f"{sf_dir}/part.parquet", ["p_partkey"],
                            broadcast_bound)
    if plan == "broadcast":
        part = pd.read_parquet(f"{sf_dir}/part.parquet",
                               columns=["p_partkey", "p_type"])
        keys = frozenset(part.loc[part["p_type"] == part_type,
                                  "p_partkey"].astype("int64"))
        li_t = li_p.map_batches(
            lambda df: df[df["l_partkey"].isin(keys)]
            .drop(columns=["l_partkey"]), batch_format="pandas")
    else:
        part_ds = ray.data.read_parquet(
            f"{sf_dir}/part.parquet",
            columns=["p_partkey", "p_type"]).map_batches(
            lambda t: t.filter(pc.equal(t["p_type"],
                                        pa.scalar(part_type)))
            .select(["p_partkey"]).rename_columns(["l_partkey"]),
            batch_format="pyarrow")
        li_t = bucket_join(
            li_p, part_ds, on="l_partkey", num_buckets=num_buckets,
            left_dtypes={"l_orderkey": "int64", "l_partkey": "int64",
                         "l_suppkey": "int64", "rev4": "int64"},
            right_dtypes={"l_partkey": "int64"},
            post_join=lambda df: df.drop(columns=["l_partkey"]))

    li_s = join_parquet_dim(
        li_t, f"{sf_dir}/supplier.parquet", on="l_suppkey",
        right_columns=["s_suppkey", "s_nationkey"],
        rename={"s_suppkey": "l_suppkey"},
        broadcast_bound=broadcast_bound, num_buckets=num_buckets)

    def li_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "rev4": df["rev4"].to_numpy(np.int64),
            "is_target": (df["s_nationkey"].to_numpy(np.int64)
                          == target_key).astype(np.int64)})

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def ord_filter(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(t_from)),
                    pc.less(t["o_orderdate"], pa.scalar(t_to)))
        t = t.filter(m)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"],
                         "o_year": pc.cast(pc.year(t["o_orderdate"]),
                                           pa.int64())})

    ord_c = join_parquet_dim(
        orders.map_batches(ord_filter, batch_format="pyarrow"),
        f"{sf_dir}/customer.parquet", on="o_custkey",
        right_columns=["c_custkey", "c_nationkey"],
        rename={"c_custkey": "o_custkey"},
        broadcast_bound=broadcast_bound, num_buckets=num_buckets)

    def ord_side(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["c_nationkey"].isin(region_keys)]
        return pd.DataFrame({
            "l_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "o_year": df["o_year"].to_numpy(np.int64)})

    def share_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "o_year": pd.Series([], dtype="int64"),
                "num4": pd.Series([], dtype="int64"),
                "den4": pd.Series([], dtype="int64")})
        df = df.assign(num4=df["rev4"] * df["is_target"])
        g = (df.groupby("o_year", sort=False)
             .agg(num4=("num4", "sum"), den4=("rev4", "sum"))
             .reset_index())
        g["num4"] = g["num4"].astype("int64")
        g["den4"] = g["den4"].astype("int64")
        return g

    # join-back size guard, MEASURED (Q18/Q3/Q5 pattern): the orders
    # side is two-year × region-customer filtered, two int columns —
    # when its observed count fits the bound, broadcast the
    # (orderkey → year) arrays and BOTH integer sums fold per lineitem
    # batch map-only; only ≤|years| partial rows leave any stage.
    ord_mat = ord_c.map_batches(ord_side,
                                batch_format="pandas").materialize()
    if ord_mat.count() * 16 <= broadcast_bound:
        import ray
        o = ord_mat.to_pandas()
        if o.empty:     # schema is lost through an all-empty fetch
            o = pd.DataFrame({"l_orderkey": pd.Series([], dtype="int64"),
                              "o_year": pd.Series([], dtype="int64")})
        o = o.sort_values("l_orderkey")
        ref = ray.put((o["l_orderkey"].to_numpy(np.int64),
                       o["o_year"].to_numpy(np.int64)))

        def local_partial(df: pd.DataFrame) -> pd.DataFrame:
            ks, yr = ray.get(ref)
            if not len(ks) or not len(df):
                return share_partial(df.iloc[:0].assign(o_year=[]))
            ok = df["l_orderkey"].to_numpy(np.int64)
            idx = np.clip(np.searchsorted(ks, ok), 0, len(ks) - 1)
            hit = ks[idx] == ok
            df = df[hit].copy()
            df["o_year"] = yr[idx[hit]]
            return share_partial(df)

        partials = li_s.map_batches(li_side, batch_format="pandas") \
            .map_batches(local_partial, batch_format="pandas")
    else:
        partials = bucket_join(
            li_s.map_batches(li_side, batch_format="pandas"),
            ord_mat,
            on="l_orderkey", num_buckets=num_buckets,
            left_dtypes={"l_orderkey": "int64", "rev4": "int64",
                         "is_target": "int64"},
            right_dtypes={"l_orderkey": "int64", "o_year": "int64"},
            post_join=share_partial)

    folded: dict[int, list[int]] = {}
    for r in partials.take_all():
        s = folded.setdefault(int(r["o_year"]), [0, 0])
        s[0] += int(r["num4"]); s[1] += int(r["den4"])
    years = sorted(folded)
    return pd.DataFrame({
        "o_year": pd.Series(years, dtype="int64"),
        "mkt_share": [round(folded[y][0] / folded[y][1], 6)
                      if folded[y][1] else 0.0 for y in years]})


Q19_DISJUNCTS = (
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#7", 1, 15, 20, 30),
)


def discounted_revenue(sf_dir: str, disjuncts=Q19_DISJUNCTS,
                       num_buckets: int = 32,
                       broadcast_bound: int | None = None):
    """TPC-H Q19 (discounted revenue): revenue of lineitems matching ANY
    of three brand/size/quantity predicate groups — the repo's
    DISJUNCTIVE-PREDICATE shape (OR across conjunction groups spanning
    both join sides, so no single predicate can be fully pushed below
    the join).

    Plan: what CAN be pushed is the union envelope — a part row can
    only ever match if its (brand, size) satisfies SOME disjunct, and
    a lineitem row only if its quantity falls in SOME disjunct's range
    — so both sides prune to the envelope before the partkey attach
    (size-guarded dim join). The exact OR-of-ANDs then evaluates as
    one vectorized numpy mask per disjunct inside each joined batch,
    and per-batch integer partials fold on the driver. Revenue is
    exact-integer 1e-4."""
    import numpy as np

    from cdcsdk_server_ray.stages.join import (BROADCAST_BOUND_BYTES,
                                               join_parquet_dim)

    if broadcast_bound is None:
        broadcast_bound = BROADCAST_BOUND_BYTES
    qty_lo = min(d[3] for d in disjuncts)
    qty_hi = max(d[4] for d in disjuncts)

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice",
                        "l_discount"])

    def li_project(t: pa.Table) -> pa.Table:
        qty = pc.cast(t["l_quantity"], pa.int64())
        m = pc.and_(pc.greater_equal(qty, pa.scalar(qty_lo, pa.int64())),
                    pc.less_equal(qty, pa.scalar(qty_hi, pa.int64())))
        t, qty = t.filter(m), qty.filter(m)
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             pa.scalar(100.0))), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(t["l_discount"],
                                            pa.scalar(100.0))), pa.int64())
        rev4 = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()),
                                              disc))
        return pa.table({"l_partkey": t["l_partkey"], "qty": qty,
                         "rev4": rev4})

    joined = join_parquet_dim(
        li.map_batches(li_project, batch_format="pyarrow"),
        f"{sf_dir}/part.parquet", on="l_partkey",
        right_columns=["p_partkey", "p_brand", "p_size"],
        rename={"p_partkey": "l_partkey"},
        broadcast_bound=broadcast_bound, num_buckets=num_buckets)

    def disjunct_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"rev4": pd.Series([], dtype="int64")})
        qty = df["qty"].to_numpy(np.int64)
        size = df["p_size"].to_numpy(np.int64)
        brand = df["p_brand"].to_numpy()
        mask = np.zeros(len(df), dtype=bool)
        for b, s_lo, s_hi, q_lo, q_hi in disjuncts:
            mask |= ((brand == b) & (size >= s_lo) & (size <= s_hi)
                     & (qty >= q_lo) & (qty <= q_hi))
        total = int(df["rev4"].to_numpy(np.int64)[mask].sum())
        return pd.DataFrame({"rev4": pd.Series([total], dtype="int64")})

    partials = joined.map_batches(disjunct_partial, batch_format="pandas")
    total = sum(int(r["rev4"]) for r in partials.take_all())
    return pd.DataFrame({"revenue": [total / 10000.0]})


def sole_supplier_orders(sf_dir: str, k: int = 10, num_buckets: int = 32,
                         broadcast_bound: int | None = None):
    """TPC-H Q21-shaped EXISTS / NOT-EXISTS on the same fact table:
    suppliers who were the SOLE supplier on a multi-line order (an
    EXISTS — another line on the order — conjoined with a NOT EXISTS —
    no line from a different supplier), counted per supplier, top-k.

    Plan: Q21's correlated existence tests are per-order, so ONE
    order-key exchange co-locates each order's lines and both
    quantifiers evaluate in-task as vectorized group stats (nlines ≥ 2,
    nunique(supp) = 1) — no per-row subqueries, no second scan. The
    qualifying orders collapse to (suppkey, count) partials in the same
    task; a second, partial-sized exchange sums them per supplier
    (unbounded key set → hash aggregate), and the top-k prunes
    per-batch before one tiny final sort. ``s_name`` attaches to the k
    winners via the size-guarded dim join."""
    import numpy as np

    from cdcsdk_server_ray.stages.join import (BROADCAST_BOUND_BYTES,
                                               join_parquet_dim)

    if broadcast_bound is None:
        broadcast_bound = BROADCAST_BOUND_BYTES

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = (pd.util.hash_pandas_object(
            df["l_orderkey"], index=False) % num_buckets).astype("int32")
        return df

    def order_kernel(g: pd.DataFrame) -> pd.DataFrame:
        # whole orders per bucket: EXISTS(another line) = nlines >= 2,
        # NOT EXISTS(other supplier) = nunique(supp) == 1
        st = (g.groupby("l_orderkey", sort=False)["l_suppkey"]
              .agg(nlines="count", nsupp="nunique", the_supp="min")
              .reset_index())
        q = st[(st["nlines"] >= 2) & (st["nsupp"] == 1)]
        out = (q.groupby("the_supp", sort=False).size()
               .reset_index(name="sole_orders"))
        return pd.DataFrame({
            "s_suppkey": out["the_supp"].to_numpy(np.int64),
            "sole_orders": out["sole_orders"].to_numpy(np.int64)})

    partials = (li.map_batches(add_bucket, batch_format="pandas")
                .groupby("__bucket")
                .map_groups(order_kernel, batch_format="pandas"))

    totals = grouped_aggregate(partials, ["s_suppkey"],
                               {"sole_orders": ("sole_orders", "sum")},
                               final="shuffle")

    def prune(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        idx = pc.sort_indices(t, sort_keys=[("sole_orders", "descending"),
                                            ("s_suppkey", "ascending")])
        return t.take(idx.slice(0, k))

    top = (totals.map_batches(prune, batch_format="pyarrow")
           .repartition(1)
           .map_batches(prune, batch_format="pyarrow", batch_size=None))

    named = join_parquet_dim(
        top, f"{sf_dir}/supplier.parquet", on="s_suppkey",
        right_columns=["s_suppkey", "s_name"],
        broadcast_bound=broadcast_bound)
    df = (named.to_pandas()
          .sort_values(["sole_orders", "s_suppkey"],
                       ascending=[False, True]).reset_index(drop=True))
    return pd.DataFrame({
        "s_suppkey": df["s_suppkey"].to_numpy(np.int64),
        "s_name": df["s_name"],
        "sole_orders": df["sole_orders"].to_numpy(np.int64)})


def min_cost_supplier(sf_dir: str, brand: str = "Brand#14",
                      region: str = "ASIA", k: int = 50,
                      num_buckets: int = 32,
                      broadcast_bound: int | None = None):
    """TPC-H Q2-shaped minimum-cost supplier: for each part of one
    brand, the cheapest (lowest-acctbal, suppkey tiebreak) supplier
    that has shipped it within one region — the repo's
    ARGMIN-PER-GROUP-WITH-ATTRIBUTES shape (the correlated MIN
    equality of Q2, resolved with the winner's full row, not just the
    min value).

    Plan: lineitem pre-shrinks to DISTINCT (partkey, suppkey) partials
    per batch (supplier sets per part are tiny; the distinct finishes
    inside the partkey exchange); the brand keep-set and the supplier
    attributes ride the size-guarded paths; the region prune happens
    before the exchange. ONE partkey exchange then runs the argmin
    in-task (sort + first per part — complete groups guaranteed), and
    the global top-k (cheapest winners) prunes per-batch before one
    tiny final. Account balances are exact cents end to end."""
    import numpy as np

    from cdcsdk_server_ray.stages.join import (BROADCAST_BOUND_BYTES,
                                               choose_join_plan,
                                               join_parquet_dim)

    if broadcast_bound is None:
        broadcast_bound = BROADCAST_BOUND_BYTES

    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    reg = pd.read_parquet(f"{sf_dir}/region.parquet")
    rk = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    region_keys = frozenset(
        nation.loc[nation["n_regionkey"].isin(rk),
                   "n_nationkey"].astype("int64"))

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    plan = choose_join_plan(f"{sf_dir}/part.parquet", ["p_partkey"],
                            broadcast_bound)
    if plan == "broadcast":
        part = pd.read_parquet(f"{sf_dir}/part.parquet",
                               columns=["p_partkey", "p_brand"])
        keys = frozenset(part.loc[part["p_brand"] == brand,
                                  "p_partkey"].astype("int64"))

        def distinct_pairs(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["l_partkey"].isin(keys)]
            return df.drop_duplicates()

        cand = li.map_batches(distinct_pairs, batch_format="pandas")
    else:
        # keep-set above the byte bound: the brand semi-join pays its
        # own partkey exchange (same branch shape as Q17/Q8)
        import ray.data

        part_ds = ray.data.read_parquet(
            f"{sf_dir}/part.parquet",
            columns=["p_partkey", "p_brand"]).map_batches(
            lambda t: t.filter(pc.equal(t["p_brand"], pa.scalar(brand)))
            .select(["p_partkey"]).rename_columns(["l_partkey"]),
            batch_format="pyarrow")
        from cdcsdk_server_ray.stages.join import bucket_join
        cand = bucket_join(
            li.map_batches(lambda df: df.drop_duplicates(),
                           batch_format="pandas"),
            part_ds, on="l_partkey", num_buckets=num_buckets,
            left_dtypes={"l_partkey": "int64", "l_suppkey": "int64"},
            right_dtypes={"l_partkey": "int64"},
            post_join=lambda df: df.drop_duplicates())

    sc = join_parquet_dim(
        cand, f"{sf_dir}/supplier.parquet", on="l_suppkey",
        right_columns=["s_suppkey", "s_nationkey", "s_acctbal", "s_name"],
        rename={"s_suppkey": "l_suppkey"},
        broadcast_bound=broadcast_bound, num_buckets=num_buckets)

    def project(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["s_nationkey"].isin(region_keys)]
        out = pd.DataFrame({
            "p_partkey": df["l_partkey"].to_numpy(np.int64),
            "l_suppkey": df["l_suppkey"].to_numpy(np.int64),
            "cents": (df["s_acctbal"].to_numpy(np.float64) * 100)
            .round().astype(np.int64),
            "s_name": df["s_name"].to_numpy(object)})
        out["__pb"] = (out["p_partkey"].to_numpy(np.uint64)
                       % np.uint64(num_buckets)).astype(np.int32)
        return out

    def argmin_kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop_duplicates(subset=["p_partkey", "l_suppkey"])
             .sort_values(["p_partkey", "cents", "l_suppkey"])
             .groupby("p_partkey", sort=False).head(1))
        if len(g) > k:      # per-bucket top-k prune under the OUTPUT order
            g = g.sort_values(["cents", "p_partkey"]).head(k)
        return g[["p_partkey", "s_name", "cents"]]

    winners = (sc.map_batches(project, batch_format="pandas")
               .groupby("__pb")
               .map_groups(lambda g: argmin_kernel(g.drop(columns="__pb")),
                           batch_format="pandas"))

    df = winners.to_pandas()
    if df.empty:        # schema is lost through an all-empty fetch
        return pd.DataFrame({
            "p_partkey": pd.Series([], dtype="int64"),
            "s_name": pd.Series([], dtype="object"),
            "s_acctbal": pd.Series([], dtype="float64")})
    df = (df.sort_values(["cents", "p_partkey"]).head(k)
          .reset_index(drop=True))
    return pd.DataFrame({
        "p_partkey": df["p_partkey"].to_numpy(np.int64),
        "s_name": df["s_name"],
        "s_acctbal": df["cents"].to_numpy(np.int64) / 100.0})


def forecast_revenue(sf_dir: str, year: int = 1998, disc_lo: int = 5,
                     disc_hi: int = 7, max_qty: int = 24):
    """TPC-H Q6 (forecasting revenue change): revenue gained if discounts
    in a band were eliminated — the canonical PREDICATE-ONLY global
    aggregate (no join, no group key).

    Plan: pure map-side combiner — every batch filters (ship-year,
    discount band, quantity cap pushed as Arrow kernels) and folds to ONE
    int64 partial (cents × discount-hundredths = exact 1e-4 units); the
    driver folds |blocks| partial rows. Nothing shuffles; the only float
    step is the final /10000.0 both engines share. (Reference has no
    aggregates beyond counters — SURVEY.md §2.5 gap op.)"""
    t_from = pd.Timestamp(f"{year}-01-01")
    t_to = pd.Timestamp(f"{year + 1}-01-01")

    li = _read(sf_dir, "lineitem",
               columns=["l_extendedprice", "l_discount", "l_quantity",
                        "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        disc = pc.cast(pc.round(pc.multiply(t["l_discount"],
                                            pa.scalar(100.0))), pa.int64())
        m = pc.and_(
            pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(t_from)),
                    pc.less(t["l_shipdate"], pa.scalar(t_to))),
            pc.and_(
                pc.and_(pc.greater_equal(disc, pa.scalar(disc_lo,
                                                         pa.int64())),
                        pc.less_equal(disc, pa.scalar(disc_hi,
                                                      pa.int64()))),
                pc.less(t["l_quantity"], pa.scalar(float(max_qty)))))
        t2 = t.filter(m)
        if t2.num_rows == 0:
            return pa.table({"rev4": pa.array([], pa.int64())})
        cents = pc.cast(pc.round(pc.multiply(t2["l_extendedprice"],
                                             pa.scalar(100.0))), pa.int64())
        d2 = pc.cast(pc.round(pc.multiply(t2["l_discount"],
                                          pa.scalar(100.0))), pa.int64())
        tot = pc.sum(pc.multiply(cents, d2)).as_py() or 0
        return pa.table({"rev4": pa.array([tot], pa.int64())})

    partials = li.map_batches(partial, batch_format="pyarrow")
    total = sum(int(r["rev4"]) for r in partials.take_all())
    return pd.DataFrame({"revenue": [round(total / 10000.0, 2)]})


def shipping_modes(sf_dir: str, year: int = 1998, num_buckets: int = 32,
                   broadcast_bound: int | None = None):
    """TPC-H Q12-shaped (shipping modes / order priority): per line
    status ("mode" — the test table carries no l_shipmode), how many
    lineitems shipped this year belong to critical-priority orders vs
    not — the CONDITIONAL-COUNTS-THROUGH-A-FACT-JOIN shape.

    Plan, size-guarded on the orders side (only two int-sized columns
    of it are needed — orderkey + a priority BIT):

    - broadcast branch: the (sorted orderkey → is-high-priority) pair
      of arrays ships once (`ray.put`); every lineitem batch resolves
      the join locally (searchsorted) and folds its own ≤ |statuses|
      partial rows — ZERO exchange, the whole query is one map pass
      plus a single-task combine.
    - bucket branch (above the bound): ONE orderkey bucket exchange
      (`bucket_join`) with the conditional per-mode counts run INSIDE
      the join task (post_join — complete orderkey groups). Lineitem
      pre-filters the ship year before the exchange either way.

    (Reference has no joins — SURVEY.md §2.5 gap op.)"""
    import numpy as np
    import ray

    from cdcsdk_server_ray.stages.join import (BROADCAST_BOUND_BYTES,
                                               bucket_join,
                                               choose_join_plan)

    if broadcast_bound is None:
        broadcast_bound = BROADCAST_BOUND_BYTES

    t_from = pd.Timestamp(f"{year}-01-01")
    t_to = pd.Timestamp(f"{year + 1}-01-01")

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linestatus", "l_shipdate"])

    if choose_join_plan(f"{sf_dir}/orders.parquet",
                        ["o_orderkey", "o_orderpriority"],
                        broadcast_bound) == "broadcast":
        o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_orderpriority"])
        o = o.sort_values("o_orderkey")
        keys = o["o_orderkey"].to_numpy(np.int64)
        is_high = o["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]) \
            .to_numpy()
        ref = ray.put((keys, is_high))

        def local_counts(t: pa.Table) -> pd.DataFrame:
            ks, hi = ray.get(ref)
            m = pc.and_(pc.greater_equal(t["l_shipdate"],
                                         pa.scalar(t_from)),
                        pc.less(t["l_shipdate"], pa.scalar(t_to)))
            t = t.filter(m)
            empty = pd.DataFrame({
                "l_linestatus": pd.Series([], dtype="object"),
                "high_line_count": pd.Series([], dtype="int64"),
                "low_line_count": pd.Series([], dtype="int64")})
            if t.num_rows == 0 or not len(ks):
                return empty
            ok = t["l_orderkey"].to_numpy()
            idx = np.clip(np.searchsorted(ks, ok), 0, len(ks) - 1)
            found = ks[idx] == ok
            high = hi[idx] & found
            low = ~hi[idx] & found
            return (pd.DataFrame({
                "l_linestatus": t["l_linestatus"].to_pandas(),
                "high_line_count": high.astype(np.int64),
                "low_line_count": low.astype(np.int64)})
                .groupby("l_linestatus", sort=False).sum()
                .reset_index())

        out = grouped_aggregate(
            li.map_batches(local_counts, batch_format="pyarrow"),
            ["l_linestatus"],
            {"high_line_count": ("high_line_count", "sum"),
             "low_line_count": ("low_line_count", "sum")})
        return finish_sorted(out, "l_linestatus")

    def li_project(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(t_from)),
                    pc.less(t["l_shipdate"], pa.scalar(t_to)))
        t = t.filter(m)
        return pa.table({"o_orderkey": t["l_orderkey"],
                         "l_linestatus": t["l_linestatus"]})

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority"])

    def mode_kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "l_linestatus": pd.Series([], dtype="object"),
                "high_line_count": pd.Series([], dtype="int64"),
                "low_line_count": pd.Series([], dtype="int64")})
        high = df["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]) \
            .to_numpy()
        out = (pd.DataFrame({"l_linestatus": df["l_linestatus"],
                             "high_line_count": high.astype(np.int64),
                             "low_line_count": (~high).astype(np.int64)})
               .groupby("l_linestatus", sort=False).sum().reset_index())
        return out

    partials = bucket_join(
        li.map_batches(li_project, batch_format="pyarrow"), orders,
        on="o_orderkey", num_buckets=num_buckets,
        left_dtypes={"o_orderkey": "int64", "l_linestatus": "object"},
        right_dtypes={"o_orderkey": "int64", "o_orderpriority": "object"},
        post_join=mode_kernel)

    out = grouped_aggregate(
        partials, ["l_linestatus"],
        {"high_line_count": ("high_line_count", "sum"),
         "low_line_count": ("low_line_count", "sum")})
    return finish_sorted(out, "l_linestatus")


def late_orders(sf_dir: str, date_from: str = "1997-01-01",
                date_to: str = "1997-04-01", late_days: int = 90,
                num_buckets: int = 32,
                broadcast_bound: int | None = None):
    """TPC-H Q4 (order-priority checking), EXISTS shape proper: orders
    placed in one quarter that have AT LEAST ONE lineitem shipped more
    than ``late_days`` after the order date (the test table carries no
    commit/receipt dates — ship-vs-order lateness is the same correlated
    comparison), counted per priority.

    Plan, size-guarded on the QUARTER's orders (a quarter is ~1/28 of
    the order table — it outgrows a broadcast at the same rate the
    table does, so the byte guard decides):

    - broadcast branch: the quarter's (orderkey → orderdate-micros,
      priority-code) arrays ship once (`ray.put`); each lineitem batch
      resolves the correlated comparison LOCALLY (searchsorted lookup +
      integer [us] date math — no pandas Timedelta upcast) and emits
      only its batch-distinct LATE (orderkey, priority) pairs. One
      orderkey-hash exchange dedups the late set (late orders only — a
      vanishing fraction) and folds per-priority counts in-task.
    - bucket branch (above the bound): one orderkey bucket join
      co-locates each order's complete lineitem history and the EXISTS
      collapses in-task: late-mask → distinct orderkey → per-priority
      partial counts (≤ 5 rows/bucket). The date comparison happens
      inside the join task where both timestamps share pandas [ns]
      units (the merge_asof [us]/[ns] trap does not apply).

    (Reference has no joins — SURVEY.md §2.5 gap op.)"""
    import numpy as np
    import ray

    from cdcsdk_server_ray.stages.join import (BROADCAST_BOUND_BYTES,
                                               bucket_join,
                                               choose_join_plan)

    if broadcast_bound is None:
        broadcast_bound = BROADCAST_BOUND_BYTES
    t_from, t_to = pd.Timestamp(date_from), pd.Timestamp(date_to)
    lag = pd.Timedelta(days=late_days)

    o_cols = ["o_orderkey", "o_orderpriority", "o_orderdate"]
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    if choose_join_plan(f"{sf_dir}/orders.parquet", o_cols,
                        broadcast_bound) == "broadcast":
        o = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=o_cols)
        o = o[(o["o_orderdate"] >= t_from) & (o["o_orderdate"] < t_to)]
        o = o.sort_values("o_orderkey")
        pri_cats, pri_codes = np.unique(
            o["o_orderpriority"].to_numpy(object), return_inverse=True) \
            if len(o) else (np.array([], object),
                            np.array([], np.int64))
        keys = o["o_orderkey"].to_numpy(np.int64)
        # order date + lag as int64 microseconds: the comparison stays
        # integer (no Timedelta unit upcast anywhere near Arrow)
        cutoff_us = (o["o_orderdate"].astype("datetime64[us]")
                     .astype("int64").to_numpy()
                     + int(lag / pd.Timedelta(microseconds=1)))
        ref = ray.put((keys, cutoff_us, pri_codes.astype(np.int8)))

        def late_pairs(t: pa.Table) -> pd.DataFrame:
            ks, cut, pri = ray.get(ref)
            if not len(ks) or t.num_rows == 0:
                return pd.DataFrame({
                    "o_orderkey": pd.Series([], dtype="int64"),
                    "pri": pd.Series([], dtype="int8")})
            ok = t["l_orderkey"].to_numpy()
            idx = np.clip(np.searchsorted(ks, ok), 0, len(ks) - 1)
            ship_us = t["l_shipdate"].cast(pa.timestamp("us")) \
                .to_numpy().astype("datetime64[us]").astype("int64")
            m = (ks[idx] == ok) & (ship_us > cut[idx])
            out = pd.DataFrame({"o_orderkey": ok[m],
                                "pri": pri[idx[m]]})
            return out.drop_duplicates()

        def count_kernel(g: pd.DataFrame) -> pd.DataFrame:
            g = g.drop_duplicates(subset=["o_orderkey"])
            return (g.groupby("pri", sort=False).size()
                    .reset_index(name="order_count"))

        def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__b"] = (df["o_orderkey"].to_numpy(np.uint64)
                         % np.uint64(num_buckets)).astype(np.int32)
            return df

        partials = (li.map_batches(late_pairs, batch_format="pyarrow")
                    .map_batches(add_bucket, batch_format="pandas")
                    .groupby("__b")
                    .map_groups(lambda g: count_kernel(
                        g.drop(columns="__b")), batch_format="pandas"))
        folded = grouped_aggregate(partials, ["pri"],
                                   {"order_count": ("order_count",
                                                    "sum")}).to_pandas()
        if folded.empty:    # schema is lost through an all-empty fetch
            return pd.DataFrame({
                "o_orderpriority": pd.Series([], dtype="object"),
                "order_count": pd.Series([], dtype="int64")})
        folded["o_orderpriority"] = pri_cats[
            folded["pri"].to_numpy(np.int64)]
        folded = folded.sort_values("o_orderpriority") \
            .reset_index(drop=True)
        return folded[["o_orderpriority", "order_count"]]

    orders = _read(sf_dir, "orders", columns=o_cols)

    def o_project(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(t_from)),
                    pc.less(t["o_orderdate"], pa.scalar(t_to)))
        return t.filter(m)

    li_p = li.map_batches(
        lambda t: pa.table({"o_orderkey": t["l_orderkey"],
                            "l_shipdate": t["l_shipdate"]}),
        batch_format="pyarrow")

    def exists_kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "o_orderpriority": pd.Series([], dtype="object"),
                "order_count": pd.Series([], dtype="int64")})
        late = df[df["l_shipdate"] > df["o_orderdate"] + lag]
        uniq = late.drop_duplicates(subset=["o_orderkey"])
        return (uniq.groupby("o_orderpriority", sort=False)
                .size().reset_index(name="order_count"))

    partials = bucket_join(
        orders.map_batches(o_project, batch_format="pyarrow"), li_p,
        on="o_orderkey", num_buckets=num_buckets,
        left_dtypes={"o_orderkey": "int64", "o_orderpriority": "object",
                     "o_orderdate": "datetime64[us]"},
        right_dtypes={"o_orderkey": "int64",
                      "l_shipdate": "datetime64[us]"},
        post_join=exists_kernel)

    out = grouped_aggregate(partials, ["o_orderpriority"],
                            {"order_count": ("order_count", "sum")})
    return finish_sorted(out, "o_orderpriority")


def product_profit(sf_dir: str, name_like: str = "widget",
                   cost_pct: int = 60, num_buckets: int = 32,
                   broadcast_bound: int | None = None):
    """TPC-H Q9-shaped (product-type profit): per (nation, order year),
    profit on parts whose name contains a token — revenue minus a cost
    model. The test table has no ``partsupp``, so supply cost is a fixed
    fraction of ``p_retailprice`` (``cost_pct``/100), keeping Q9's shape:
    a FOUR-WAY FACT⋈DIM⋈DIM⋈FACT join with the measure combining columns
    of three tables.

    Plan: lineitem pre-prunes to the part name keep-set through the size
    guard (broadcast frozenset + retail-cents lookup below the byte
    bound; a partkey bucket join above it — the only way the dim's
    attributes move is with the join), the supplier nationkey rides the
    dim-sized guarded join, nation names are a constant-size driver map,
    and the orders year joins on ONE orderkey bucket exchange with the
    per-(nation, year) partial sums computed IN-TASK (post_join) — ≤
    |nations|×|years| rows per bucket leave the exchange. Profit stays
    exact-integer 1e-4 dollar units end to end: cents×(100−disc) −
    cost_pct·retail_cents·qty; the single float step is the final
    /10000.0 both engines share. (Reference has no joins — SURVEY.md
    §2.5 gap op.)"""
    import numpy as np
    import ray.data

    from cdcsdk_server_ray.stages.join import (BROADCAST_BOUND_BYTES,
                                               bucket_join,
                                               choose_join_plan,
                                               join_parquet_dim)

    if broadcast_bound is None:
        broadcast_bound = BROADCAST_BOUND_BYTES

    nation = pd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
    nation_map = dict(zip(nation["n_nationkey"].astype("int64"),
                          nation["n_name"]))

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey",
                        "l_quantity", "l_extendedprice", "l_discount"])

    def li_project(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             pa.scalar(100.0))), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(t["l_discount"],
                                            pa.scalar(100.0))), pa.int64())
        rev4 = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()),
                                              disc))
        qty = pc.cast(t["l_quantity"], pa.int64())
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_partkey": t["l_partkey"],
                         "l_suppkey": t["l_suppkey"],
                         "qty": qty, "rev4": rev4})

    li_p = li.map_batches(li_project, batch_format="pyarrow")

    part_path = f"{sf_dir}/part.parquet"
    part_cols = ["p_partkey", "p_name", "p_retailprice"]
    if choose_join_plan(part_path, part_cols,
                        broadcast_bound) == "broadcast":
        part = pd.read_parquet(part_path, columns=part_cols)
        part = part[part["p_name"].str.contains(name_like, regex=False)]
        pk = np.sort(part["p_partkey"].to_numpy(np.int64))
        rc = (part.set_index("p_partkey")["p_retailprice"]
              .reindex(pk).to_numpy(np.float64) * 100).round() \
            .astype(np.int64)
        import ray
        ref = ray.put((pk, rc))

        def attach_cost(df: pd.DataFrame) -> pd.DataFrame:
            keys, cents = ray.get(ref)
            if not len(keys):
                df = df.iloc[:0].copy()
                df["retail_cents"] = pd.Series([], dtype="int64")
                return df
            k = df["l_partkey"].to_numpy(np.int64)
            idx_c = np.clip(np.searchsorted(keys, k), 0, len(keys) - 1)
            hit = keys[idx_c] == k
            df = df[hit].copy()
            df["retail_cents"] = cents[idx_c[hit]]
            return df

        enriched = li_p.map_batches(attach_cost, batch_format="pandas")
    else:
        part_ds = ray.data.read_parquet(
            part_path, columns=part_cols).map_batches(
            lambda df: pd.DataFrame({
                "l_partkey": df.loc[
                    df["p_name"].str.contains(name_like, regex=False),
                    "p_partkey"].to_numpy(np.int64),
                "retail_cents": (df.loc[
                    df["p_name"].str.contains(name_like, regex=False),
                    "p_retailprice"].to_numpy(np.float64) * 100)
                .round().astype(np.int64)}),
            batch_format="pandas")
        enriched = bucket_join(
            li_p, part_ds, on="l_partkey", num_buckets=num_buckets,
            left_dtypes={"l_orderkey": "int64", "l_partkey": "int64",
                         "l_suppkey": "int64", "qty": "int64",
                         "rev4": "int64"},
            right_dtypes={"l_partkey": "int64", "retail_cents": "int64"})

    with_nat = join_parquet_dim(
        enriched, f"{sf_dir}/supplier.parquet", on="l_suppkey",
        right_columns=["s_suppkey", "s_nationkey"],
        rename={"s_suppkey": "l_suppkey"},
        broadcast_bound=broadcast_bound, num_buckets=num_buckets)

    def profit_project(df: pd.DataFrame) -> pd.DataFrame:
        amount4 = (df["rev4"].to_numpy(np.int64)
                   - cost_pct * df["retail_cents"].to_numpy(np.int64)
                   * df["qty"].to_numpy(np.int64))
        nat = df["s_nationkey"].map(nation_map)
        return pd.DataFrame({"o_orderkey": df["l_orderkey"]
                             .to_numpy(np.int64),
                             "nation": nat.to_numpy(object),
                             "amount4": amount4})

    fact = with_nat.map_batches(profit_project, batch_format="pandas")

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    orders_p = orders.map_batches(
        lambda t: pa.table({"o_orderkey": t["o_orderkey"],
                            "o_year": pc.cast(pc.year(t["o_orderdate"]),
                                              pa.int64())}),
        batch_format="pyarrow")

    def year_kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "nation": pd.Series([], dtype="object"),
                "o_year": pd.Series([], dtype="int64"),
                "amount4": pd.Series([], dtype="int64")})
        return (df.groupby(["nation", "o_year"], sort=False)["amount4"]
                .sum().reset_index())

    partials = bucket_join(
        fact, orders_p, on="o_orderkey", num_buckets=num_buckets,
        left_dtypes={"o_orderkey": "int64", "nation": "object",
                     "amount4": "int64"},
        right_dtypes={"o_orderkey": "int64", "o_year": "int64"},
        post_join=year_kernel)

    out = grouped_aggregate(partials, ["nation", "o_year"],
                            {"amount4": ("amount4", "sum")}).to_pandas()
    if out.empty:
        return pd.DataFrame({"nation": pd.Series([], dtype="object"),
                             "o_year": pd.Series([], dtype="int64"),
                             "profit": pd.Series([], dtype="float64")})
    out = (out.sort_values(["nation", "o_year"],
                           ascending=[True, False])
           .reset_index(drop=True))
    # exact 1e-4 units → one shared IEEE division (NO post-round: a
    # half-cent sum would round differently across engines)
    return pd.DataFrame({"nation": out["nation"],
                         "o_year": out["o_year"].to_numpy(np.int64),
                         "profit": out["amount4"].to_numpy(np.int64)
                         / 10000.0})


def dominant_suppliers(sf_dir: str, name_prefix: str = "red ",
                       year: int = 1998, num_buckets: int = 32,
                       broadcast_bound: int | None = None):
    """TPC-H Q20-shaped (potential part promotion): suppliers that
    shipped MORE THAN HALF of a part's total quantity within one ship
    year, for parts whose name starts with a prefix — per supplier, how
    many parts they dominate. Q20's correlated ``qty > 0.5 * sum(qty)``
    EXISTS collapses into ONE partkey exchange: the per-(part, supplier)
    sums AND the per-part totals are both complete inside the bucket
    task (two-level in-task aggregate), so only dominated (suppkey,
    partkey) pairs — a vanishing fraction — leave the exchange.

    The keep-set rides the size guard; the half comparison is
    exact-integer (``2*sq > tot``; TPC-H quantities are integral); the
    final per-supplier counts are an unbounded-key hash aggregate
    (``final="shuffle"``). (Reference has no joins — SURVEY.md §2.5 gap
    op.)"""
    import numpy as np
    import ray.data

    from cdcsdk_server_ray.stages.join import (BROADCAST_BOUND_BYTES,
                                               bucket_join,
                                               choose_join_plan,
                                               join_parquet_dim)

    if broadcast_bound is None:
        broadcast_bound = BROADCAST_BOUND_BYTES
    t_from = pd.Timestamp(f"{year}-01-01")
    t_to = pd.Timestamp(f"{year + 1}-01-01")

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_quantity",
                        "l_shipdate"])

    def li_project(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(t_from)),
                    pc.less(t["l_shipdate"], pa.scalar(t_to)))
        t = t.filter(m)
        return pa.table({"l_partkey": t["l_partkey"],
                         "l_suppkey": t["l_suppkey"],
                         "qty": pc.cast(t["l_quantity"], pa.int64())})

    li_p = li.map_batches(li_project, batch_format="pyarrow")

    def dominance_kernel(df: pd.DataFrame) -> pd.DataFrame:
        # complete partkey groups in-task: per-(part, supplier) sums vs
        # the per-part total, exact-integer half comparison
        if not len(df):
            return pd.DataFrame({
                "s_suppkey": pd.Series([], dtype="int64"),
                "n_dominated": pd.Series([], dtype="int64")})
        sq = (df.groupby(["l_partkey", "l_suppkey"], sort=False)["qty"]
              .sum().reset_index())
        tot = sq.groupby("l_partkey", sort=False)["qty"].transform("sum")
        dom = sq[2 * sq["qty"].to_numpy(np.int64)
                 > tot.to_numpy(np.int64)]
        return (dom.groupby("l_suppkey", sort=False).size()
                .reset_index(name="n_dominated")
                .rename(columns={"l_suppkey": "s_suppkey"}))

    part_path = f"{sf_dir}/part.parquet"
    part_cols = ["p_partkey", "p_name"]
    if choose_join_plan(part_path, part_cols,
                        broadcast_bound) == "broadcast":
        part = pd.read_parquet(part_path, columns=part_cols)
        keys = frozenset(part.loc[part["p_name"].str.startswith(
            name_prefix), "p_partkey"].astype("int64"))

        def prune_bucket(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["l_partkey"].isin(keys)].copy()
            df["__bucket"] = (pd.util.hash_pandas_object(
                df["l_partkey"], index=False) % num_buckets).astype("int32")
            return df

        partials = (li_p.map_batches(prune_bucket, batch_format="pandas")
                    .groupby("__bucket")
                    .map_groups(lambda g: dominance_kernel(
                        g.drop(columns="__bucket")),
                        batch_format="pandas"))
    else:
        part_ds = ray.data.read_parquet(
            part_path, columns=part_cols).map_batches(
            lambda t: t.filter(pc.starts_with(t["p_name"],
                                              name_prefix))
            .select(["p_partkey"]).rename_columns(["l_partkey"]),
            batch_format="pyarrow")
        partials = bucket_join(
            li_p, part_ds, on="l_partkey", num_buckets=num_buckets,
            left_dtypes={"l_partkey": "int64", "l_suppkey": "int64",
                         "qty": "int64"},
            right_dtypes={"l_partkey": "int64"},
            post_join=dominance_kernel)

    totals = grouped_aggregate(partials, ["s_suppkey"],
                               {"n_dominated": ("n_dominated", "sum")},
                               final="shuffle")
    named = join_parquet_dim(
        totals, f"{sf_dir}/supplier.parquet", on="s_suppkey",
        right_columns=["s_suppkey", "s_name"],
        broadcast_bound=broadcast_bound, num_buckets=num_buckets)
    df = named.to_pandas()
    if df.empty:
        return pd.DataFrame({
            "s_suppkey": pd.Series([], dtype="int64"),
            "s_name": pd.Series([], dtype="object"),
            "n_dominated": pd.Series([], dtype="int64")})
    df = df.sort_values("s_suppkey").reset_index(drop=True)
    return pd.DataFrame({
        "s_suppkey": df["s_suppkey"].to_numpy(np.int64),
        "s_name": df["s_name"],
        "n_dominated": df["n_dominated"].to_numpy(np.int64)})


def important_parts(sf_dir: str, nationkey: int = 3,
                    fraction_ppm: int = 1000,
                    broadcast_bound: int | None = None):
    """TPC-H Q11-shaped (important stock): parts whose shipped value
    from one nation's suppliers exceeds a fixed fraction of that
    nation's total — the HAVING-AGAINST-A-GLOBAL-SCALAR shape (every
    group compared to an aggregate over all groups). No ``partsupp`` in
    the test tables, so "value" is lineitem extended price through the
    supplier-nation filter.

    Plan: the nation's supplier keys broadcast (dim-sized); ONE partkey
    hash aggregate builds per-part cent totals (map-side combiner, keys
    unbounded → ``final="shuffle"``), which are then ``materialize()``d
    as the fork point — consumed once for the global total (per-block
    int partials, driver folds ≤|blocks| rows) and once for the filter.
    The fraction test is exact-integer: ``1_000_000 * cents >
    fraction_ppm * total_cents`` (parts-per-million), no float enters
    until the final /100 display step. Output is fraction-bounded
    (≤ 1e6/fraction_ppm rows) by construction. (Reference has no
    aggregates — SURVEY.md §2.5 gap op.)"""
    import numpy as np
    import ray

    from cdcsdk_server_ray.stages.join import BROADCAST_BOUND_BYTES

    if broadcast_bound is None:
        broadcast_bound = BROADCAST_BOUND_BYTES

    supp = pd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"])
    skeys = np.sort(supp.loc[supp["s_nationkey"] == nationkey,
                             "s_suppkey"].to_numpy(np.int64))
    sref = ray.put(skeys)

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_extendedprice"])

    def project(t: pa.Table) -> pa.Table:
        keys = ray.get(sref)
        sk = t["l_suppkey"].to_numpy()
        if len(keys):
            idx = np.clip(np.searchsorted(keys, sk), 0, len(keys) - 1)
            hit = keys[idx] == sk
        else:
            hit = np.zeros(len(sk), dtype=bool)
        t = t.filter(pa.array(hit))
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             pa.scalar(100.0))), pa.int64())
        return pa.table({"p_partkey": t["l_partkey"], "cents": cents})

    per_part = grouped_aggregate(
        li.map_batches(project, batch_format="pyarrow"),
        ["p_partkey"], {"cents": ("cents", "sum")},
        final="shuffle").materialize()

    def block_total(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"t": pa.array([], pa.int64())})
        return pa.table({"t": pa.array([pc.sum(t["cents"]).as_py()],
                                       pa.int64())})

    total = sum(int(r["t"]) for r in
                per_part.map_batches(block_total,
                                     batch_format="pyarrow").take_all())

    kept = per_part.map_batches(
        lambda t: t.filter(pc.greater(
            pc.multiply(t["cents"], pa.scalar(1_000_000, pa.int64())),
            pa.scalar(fraction_ppm * total, pa.int64()))),
        batch_format="pyarrow")

    df = kept.to_pandas()
    if df.empty:
        return pd.DataFrame({"p_partkey": pd.Series([], dtype="int64"),
                             "value": pd.Series([], dtype="float64")})
    df = df.sort_values(["cents", "p_partkey"],
                        ascending=[False, True]).reset_index(drop=True)
    return pd.DataFrame({"p_partkey": df["p_partkey"].to_numpy(np.int64),
                         "value": df["cents"].to_numpy(np.int64) / 100.0})


def events_json_extract(sf_dir: str):
    """Semi-structured payload extraction: pull the integer field ``k``
    out of the JSON ``props`` column and aggregate it per event type —
    the jsonb-column analogue (the reference's perf workload carries a
    jsonb payload column, ``perf/workloads/iot/schema.sql:4-6``; its
    engine forwards it opaquely — extraction is the §2.5 gap op).

    Plan: extraction is a single vectorized Arrow C++ regex kernel per
    batch (``pc.extract_regex`` — no per-row JSON parser in the hot
    path; the field grammar here is a flat integer, which the regex
    matches exactly), rows without the field drop, and the per-type
    sums/max/counts ride the standard map-side combiner (bounded key
    set → single-task final). Nothing but |event types| partial rows
    leaves any stage."""
    ev = _read(sf_dir, "events", columns=["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], r'"k":\s*(?P<v>-?\d+)')
        v = pc.struct_field(m, "v")
        keep = pc.is_valid(v)
        k = pc.cast(v, pa.int64())
        out = pa.table({"event_type": t["event_type"], "k": k})
        return out.filter(keep)

    out = grouped_aggregate(
        ev.map_batches(extract, batch_format="pyarrow"),
        ["event_type"],
        {"n_events": ("k", "count"),
         "sum_k": ("k", "sum"),
         "max_k": ("k", "max")})
    return finish_sorted(out, "event_type")


def supplier_part_types(sf_dir: str, excl_brand: str = "Brand#14",
                        excl_type_prefix: str = "PROMO",
                        sizes: tuple = (1, 4, 9, 14, 19, 24, 29, 34),
                        num_buckets: int = 32,
                        broadcast_bound: int | None = None):
    """TPC-H Q16-shaped (parts/supplier relationship): how many DISTINCT
    suppliers shipped parts of each (brand, type, size), under negated
    predicates (brand <>, type NOT LIKE) and a NOT-IN supplier
    blacklist (suppliers in deficit stand in for Q16's complaints
    subquery) — the GROUPED-COUNT-DISTINCT-WITH-ANTI-FILTER shape.

    Plan: lineitem pre-shrinks to batch-distinct (partkey, suppkey)
    pairs with the blacklist applied BEFORE any exchange (the NOT-IN
    side is dim-sized → broadcast keyset); part attributes ride the
    size-guarded join. The exact COUNT DISTINCT then buckets by the
    GROUP key hash — a group's pairs land wholly in one task, so the
    in-task ``drop_duplicates + nunique`` is final, no second exchange.
    Group cardinality is attribute-bounded (|brands|×|types|×|sizes|),
    never corpus-scale. (Reference has no aggregates — SURVEY.md §2.5
    gap op.)"""
    import numpy as np
    import ray

    from cdcsdk_server_ray.stages.join import (BROADCAST_BOUND_BYTES,
                                               join_parquet_dim)

    if broadcast_bound is None:
        broadcast_bound = BROADCAST_BOUND_BYTES
    size_set = frozenset(int(s) for s in sizes)

    supp = pd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_acctbal"])
    bad = np.sort(supp.loc[supp["s_acctbal"] < 0,
                           "s_suppkey"].to_numpy(np.int64))
    bad_ref = ray.put(bad)

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def distinct_pairs(df: pd.DataFrame) -> pd.DataFrame:
        blk = ray.get(bad_ref)
        df = df.drop_duplicates()
        if len(blk):
            sk = df["l_suppkey"].to_numpy(np.int64)
            idx = np.clip(np.searchsorted(blk, sk), 0, len(blk) - 1)
            df = df[blk[idx] != sk]
        return df

    pairs = li.map_batches(distinct_pairs, batch_format="pandas")

    attrs = join_parquet_dim(
        pairs, f"{sf_dir}/part.parquet", on="l_partkey",
        right_columns=["p_partkey", "p_brand", "p_type", "p_size"],
        rename={"p_partkey": "l_partkey"},
        broadcast_bound=broadcast_bound, num_buckets=num_buckets)

    def filter_and_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["p_brand"] != excl_brand)
                & ~df["p_type"].str.startswith(excl_type_prefix)
                & df["p_size"].isin(size_set)]
        df = df[["p_brand", "p_type", "p_size", "l_suppkey"]] \
            .drop_duplicates()
        key = (df["p_brand"].astype(str) + "\x1f"
               + df["p_type"].astype(str) + "\x1f"
               + df["p_size"].astype(str))
        df = df.copy()
        df["__gb"] = (pd.util.hash_pandas_object(key, index=False)
                      .to_numpy(np.uint64) % np.uint64(num_buckets)
                      ).astype(np.int32)
        return df

    def count_kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["p_brand", "p_type", "p_size",
                                      "l_suppkey"])
        out = (g.groupby(["p_brand", "p_type", "p_size"], sort=False)
               .size().reset_index(name="supplier_cnt"))
        out["p_size"] = out["p_size"].astype("int64")
        out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
        return out

    counts = (attrs.map_batches(filter_and_bucket, batch_format="pandas")
              .groupby("__gb")
              .map_groups(lambda g: count_kernel(g.drop(columns="__gb")),
                          batch_format="pandas"))

    df = counts.to_pandas()
    if df.empty:
        return pd.DataFrame({
            "p_brand": pd.Series([], dtype="object"),
            "p_type": pd.Series([], dtype="object"),
            "p_size": pd.Series([], dtype="int64"),
            "supplier_cnt": pd.Series([], dtype="int64")})
    return (df.sort_values(["supplier_cnt", "p_brand", "p_type",
                            "p_size"],
                           ascending=[False, True, True, True])
            .reset_index(drop=True))


def reorder_gaps(sf_dir: str, num_buckets: int = 32,
                 broadcast_bound: int | None = None):
    """Per-customer repurchase latency: the LAG/self-gap shape — days
    between each customer's consecutive orders, averaged per market
    segment (the retention-analytics window function ``date -
    lag(date) OVER (PARTITION BY customer ORDER BY date)``).

    Plan: the market segment attaches through the size-guarded customer
    dim join BEFORE the exchange; one custkey-hash exchange co-locates
    each customer's complete order history, where a single vectorized
    kernel sorts (custkey, date, orderkey), diffs against the shifted
    array with the customer-boundary positions masked (never a per-
    customer Python loop), and folds ≤ |segments| partial rows per
    bucket. Order dates are midnight timestamps, so day differences are
    exact integers; the single float step is the final sum/count
    division both engines share."""
    import numpy as np

    from cdcsdk_server_ray.stages.join import (BROADCAST_BOUND_BYTES,
                                               join_parquet_dim)

    if broadcast_bound is None:
        broadcast_bound = BROADCAST_BOUND_BYTES

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])
    seg = join_parquet_dim(
        orders, f"{sf_dir}/customer.parquet", on="o_custkey",
        right_columns=["c_custkey", "c_mktsegment"],
        rename={"c_custkey": "o_custkey"},
        broadcast_bound=broadcast_bound, num_buckets=num_buckets)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = (df["o_custkey"].to_numpy(np.uint64)
                     % np.uint64(num_buckets)).astype(np.int32)
        return df

    def gap_kernel(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "c_mktsegment": pd.Series([], dtype="object"),
                "n_gaps": pd.Series([], dtype="int64"),
                "sum_days": pd.Series([], dtype="int64")})
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        days = (g["o_orderdate"].astype("datetime64[us]")
                .astype("int64").to_numpy() // 86_400_000_000)
        cust = g["o_custkey"].to_numpy(np.int64)
        gap = days[1:] - days[:-1]
        same = cust[1:] == cust[:-1]
        out = pd.DataFrame({
            "c_mktsegment": g["c_mktsegment"].to_numpy(object)[1:][same],
            "gap": gap[same]})
        return (out.groupby("c_mktsegment", sort=False)["gap"]
                .agg(n_gaps="count", sum_days="sum").reset_index()
                .astype({"n_gaps": "int64", "sum_days": "int64"}))

    partials = (seg.map_batches(add_bucket, batch_format="pandas")
                .groupby("__b")
                .map_groups(lambda g: gap_kernel(g.drop(columns="__b")),
                            batch_format="pandas"))

    out = grouped_aggregate(partials, ["c_mktsegment"],
                            {"n_gaps": ("n_gaps", "sum"),
                             "sum_days": ("sum_days", "sum")}).to_pandas()
    if out.empty:
        return pd.DataFrame({
            "c_mktsegment": pd.Series([], dtype="object"),
            "n_gaps": pd.Series([], dtype="int64"),
            "avg_gap_days": pd.Series([], dtype="float64")})
    out = out.sort_values("c_mktsegment").reset_index(drop=True)
    return pd.DataFrame({
        "c_mktsegment": out["c_mktsegment"],
        "n_gaps": out["n_gaps"].to_numpy(np.int64),
        "avg_gap_days": out["sum_days"].to_numpy(np.int64)
        / out["n_gaps"].to_numpy(np.int64).astype(np.float64)})
