"""Distributed summary statistics: a KMV distinct-count sketch and exact
streaming quantiles — the two "wide" statistics a 100-TB pipeline needs
WITHOUT a global sort or a full-column shuffle.

Both are deterministic and oracle-checked: the KMV sketch is exactly
reproducible in SQL (k smallest distinct hash values under a
SQL-expressible hash), and the quantile thresholds use integer permille
arithmetic so there is no float-boundary hazard on either side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cdcsdk_server_ray.stages.finish import finish_sorted


def _finalize_partials(parts, final):
    """Driver-side barrier replacing ``repartition(1) → one-task final``:
    pull the tiny partials (IDENTICAL volume to what the single final
    task would have held — O(blocks × sketch size), never rows) and fan
    the final's small result back out as a Dataset. The Repartition
    AllToAll costs more fixed time than this barrier wherever the final
    is a one-task kernel over combiner partials (CLAUDE.md round-4
    rule: never ``repartition(1)`` for tiny rows)."""
    import ray.data

    return ray.data.from_pandas(final(parts.to_pandas()))


def approx_distinct_kmv(sf_dir: str, column: str = "l_partkey",
                        k: int = 256):
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002):
    keep the k smallest distinct 32-bit hash values; estimate
    |distinct| ≈ (k-1) · 2^32 / h_k. The sketch is MERGEABLE — each
    batch emits its own ≤ k minima, the union's k minima equal the
    whole-data sketch — so each block contributes at most k partial
    rows and the final reduce is a driver-side kernel over blocks × k
    rows, independent of data size.

    Deterministic and SQL-checkable: hash = (x · 2654435761) mod 2^32,
    the same Knuth multiplier the repo's sampling ops use. When fewer
    than k distinct hashes exist the sketch IS the exact count and the
    estimate reports it. Hash collisions shrink both sides identically
    (the oracle also counts distinct hashes), so parity holds at any
    cardinality."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=[column])

    def partial(t: pa.Table) -> pa.Table:
        x = t[column].to_numpy(zero_copy_only=False)
        if len(x) and int(x.max()) >= (2**63 - 1) // 2654435761:
            # fail loudly like the BIGINT oracle would (overflow), not
            # wrap into a silently different hash space
            raise OverflowError(f"{column} too large for the KMV hash")
        h = (x.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
        return pa.table({"hv": np.unique(h)[:k].astype(np.int64)})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        hs = np.unique(df["hv"].to_numpy(np.int64))[:k]
        k_used = len(hs)
        kth = int(hs[-1]) if k_used else 0
        est = (float(k_used) if k_used < k
               else round((k - 1) * 4294967296.0 / kth, 6))
        return pd.DataFrame({"k_used": [np.int64(k_used)],
                             "kth_hash": [np.int64(kth)],
                             "estimate": [np.float64(est)]})

    return _finalize_partials(
        ds.map_batches(partial, batch_format="pyarrow"), final)


def quantile_pipeline(ds, column: str, permilles,
                      num_buckets: int = 32):
    """The exact no-global-sort disc-quantile plan over any
    bounded-RESOLUTION column (see ``value_quantiles`` for the full
    semantics note): per-batch value counts -> per value-hash bucket
    vectorized sums (partial counts shuffle, never rows) -> driver-side
    final pick at the integer threshold ``(p*n + 999) // 1000`` over
    the ≤ |distinct values| bucket sums.
    Returns a Dataset with one (q_permille, value) row per permille."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[column].value_counts()
        out = pd.DataFrame({"value": vc.index.to_numpy(np.float64),
                            "cnt": vc.to_numpy(np.int64)})
        out["__vb"] = (pd.util.hash_pandas_object(out["value"], index=False)
                       .to_numpy(np.uint64) % np.uint64(num_buckets)
                       ).astype(np.int32)
        return out

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("value", sort=False)["cnt"].sum().reset_index()
        s["cnt"] = s["cnt"].astype("int64")
        return s[["value", "cnt"]]

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("value")
        cum = df["cnt"].to_numpy(np.int64).cumsum()
        total = int(cum[-1])
        vals = df["value"].to_numpy(np.float64)
        picks = [vals[np.searchsorted(cum, (p * total + 999) // 1000,
                                      side="left")]
                 for p in permilles]
        return pd.DataFrame({
            "q_permille": np.array(permilles, np.int64),
            "value": np.array(picks, np.float64)})

    return _finalize_partials(
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__vb")
        .map_groups(bucket_sum, batch_format="pandas"), final)


def disc_quantile(ds, column: str, permille: int,
                  num_buckets: int = 32) -> float:
    """Driver-side scalar: one exact disc-quantile of a
    bounded-resolution column. Executes the (tiny, one-row) pipeline —
    the standard broadcast-threshold step for quantile-gated filters."""
    rows = quantile_pipeline(ds, column, (permille,), num_buckets).take_all()
    return float(rows[0]["value"])


def value_quantiles(sf_dir: str, permilles=(500, 900, 990),
                    num_buckets: int = 32):
    """Exact quantiles over ``events.value`` with NO global sort: the
    value column has bounded RESOLUTION (2-decimal readings), so its
    distinct-value histogram is bounded by the value range — not by row
    count — and stays small at 100 TB. Plan:

    1. per-batch value counts (one vectorized value_counts per block);
    2. per value-hash bucket, one vectorized sum — partial counts
       shuffle, never rows;
    3. a driver-side final over ≤ |distinct values| rows: sort, cumsum,
       pick each quantile as the smallest value whose cumulative count
       reaches ``ceil(q·n)`` — computed as the INTEGER threshold
       ``(q_permille · n + 999) // 1000`` on both engine and oracle, so
       no float boundary can flip an index. This matches DuckDB's
       ``quantile_disc`` semantics exactly (pinned by a local test).

    The partitioning assumption (bounded value resolution) is the
    documented contract; for unbounded-resolution columns use the KMV
    sketch family instead."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["value"])
    return quantile_pipeline(ds, "value", permilles, num_buckets)


def pearson_corr(sf_dir: str):
    """Pearson correlation via single-pass moment sums — the combiner
    shape again: each batch emits ONE row of partial moments (n, Σx, Σy,
    Σxy, Σx², Σy² per pair), a driver-side final assembles r from the
    summed moments. Nothing but O(blocks) rows ever moves; no second
    pass over the data.

    The normalization constant cancels between sample and population
    definitions, so the result matches DuckDB ``corr`` exactly (both
    sides round to 6dp; the operands here — quantity 1..50, price ~1e4,
    discount 0..0.1 — keep the naive sums well inside float64's exact
    range at any SF, and the batch-level partial sums make the final
    summation order deterministic per block count)."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount"])

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        q = df["l_quantity"].to_numpy(np.float64)
        p = df["l_extendedprice"].to_numpy(np.float64)
        d = df["l_discount"].to_numpy(np.float64)
        return pd.DataFrame({
            "n": [np.int64(len(df))],
            "sq": [q.sum()], "sp": [p.sum()], "sd": [d.sum()],
            "sqq": [(q * q).sum()], "spp": [(p * p).sum()],
            "sdd": [(d * d).sum()],
            "sqp": [(q * p).sum()], "sqd": [(q * d).sum()],
        })

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sum()
        n = float(s["n"])

        def r(sx, sy, sxy, sxx, syy):
            cov = n * sxy - sx * sy
            vx = n * sxx - sx * sx
            vy = n * syy - sy * sy
            return round(cov / np.sqrt(vx * vy), 6)

        return pd.DataFrame({
            "n": [np.int64(s["n"])],
            "corr_qty_price": [r(s["sq"], s["sp"], s["sqp"],
                                 s["sqq"], s["spp"])],
            "corr_qty_disc": [r(s["sq"], s["sd"], s["sqd"],
                                s["sqq"], s["sdd"])],
        })

    return _finalize_partials(
        ds.map_batches(moments, batch_format="pandas"), finish)


def group_zscore_outliers(sf_dir: str, threshold: float = 1.5):
    """Per-group z-score outlier detection: events whose value sits more
    than ``threshold`` population standard deviations from their
    event_type's mean. The two-pass broadcast pattern (same as the
    quantile-gated filter): pass 1 reduces per-batch moment partials —
    one row per (batch, group) — to a TINY per-group (mean, stddev_pop)
    table on the driver; pass 2 is one vectorized filter per block
    against the broadcast stats (a closure constant, never re-shipped).

    z is rounded to 6dp to match the SQL oracle; moments are exact
    float64 sums at these magnitudes, so mean/stddev agree with DuckDB's
    ``avg``/``stddev_pop`` to well past the rounding point."""
    import ray
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", sort=False)["value"]
        out = g.agg(n="size", s="sum", ss=lambda v: float((v ** 2).sum()))
        return out.reset_index()

    rows = ds.map_batches(partial, batch_format="pandas").to_pandas()
    agg = rows.groupby("event_type").sum()
    mean = agg["s"] / agg["n"]
    var = agg["ss"] / agg["n"] - mean ** 2
    stats_map = {et: (float(m), float(np.sqrt(max(v, 0.0))))
                 for et, m, v in zip(agg.index, mean, var)}
    ref = ray.put(stats_map)

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray
        sm = _ray.get(ref)
        ms = df["event_type"].map(lambda e: sm[e][0]).to_numpy(np.float64)
        sd = df["event_type"].map(lambda e: sm[e][1]).to_numpy(np.float64)
        # threshold on the ROUNDED z (both sides) so a last-ulp moment
        # difference can't flip a row across the boundary
        z = np.round((df["value"].to_numpy(np.float64) - ms) / sd, 6)
        keep = np.abs(z) > threshold
        out = df.loc[keep, ["event_id", "event_type", "value"]].copy()
        out["z"] = z[keep]
        return out

    return (finish_sorted(ds.map_batches(flag, batch_format="pandas"), "event_id"))


def group_quantiles(sf_dir: str, permilles=(500, 900),
                    num_buckets: int = 32):
    """PER-GROUP exact disc quantiles (median + p90 of ``n_chars`` per
    ``lang``) with no global sort — the grouped form of
    ``quantile_pipeline``: per-batch (group, value) counts shuffle as
    partials, bucketed by hash(GROUP) so each group's entire histogram
    lands in one bucket, where one vectorized cumsum-and-pick per group
    emits the quantile rows directly. Exchange volume is bounded by
    |groups| × |distinct values| (resolution-bounded), never row count.
    The integer threshold ``(p·n + 999) // 1000`` matches DuckDB
    ``quantile_disc`` exactly (same pin as ``value_quantiles``)."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = (df.groupby(["lang", "n_chars"], sort=False)
              .size().rename("cnt").reset_index())
        vc["cnt"] = vc["cnt"].astype("int64")
        vc["__gb"] = (pd.util.hash_pandas_object(vc["lang"], index=False)
                      .to_numpy(np.uint64) % np.uint64(num_buckets)
                      ).astype(np.int32)
        return vc

    def bucket_final(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.groupby(["lang", "n_chars"], sort=False)["cnt"].sum()
             .reset_index().sort_values(["lang", "n_chars"]))
        rows = []
        for lang, sub in g.groupby("lang", sort=False):
            cum = sub["cnt"].to_numpy(np.int64).cumsum()
            total = int(cum[-1])
            vals = sub["n_chars"].to_numpy(np.int64)
            for p in permilles:
                v = vals[np.searchsorted(cum, (p * total + 999) // 1000,
                                         side="left")]
                rows.append((lang, p, float(v)))
        return pd.DataFrame(rows, columns=["lang", "q_permille", "value"]) \
            .astype({"q_permille": "int64"})

    return (finish_sorted(ds.map_batches(partial, batch_format="pandas")
            .groupby("__gb")
            .map_groups(bucket_final, batch_format="pandas"), ["lang", "q_permille"]))


def dq_checks(sf_dir: str):
    """Declarative data-quality audit (the Deequ-style validation pass a
    production feed runs before admitting a batch): one row per check
    with its violation count — null checks, range checks, duplicate-key
    count, and referential integrity (events.user_id ⊆ customer keys,
    FK key-set broadcast once via ``ray.put``). ALL checks evaluate in a
    single pass over events as per-block combiner partials (one count
    row per check per block); the exchange carries O(checks × blocks)
    rows, never events."""
    import ray
    import ray.data

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey"]).to_pandas()
    keys = cust["c_custkey"].to_numpy()
    keys = np.sort(keys[keys % 2 == 0])      # the "registered" key subset
    key_ref = ray.put(keys)

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "ts",
                                        "event_type", "value"])
    ALLOWED = ("click", "purchase", "view")  # signup/error flag as unknown

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        k = ray.get(key_ref)
        uid = df["user_id"].to_numpy()
        idx = np.clip(np.searchsorted(k, uid), 0, len(k) - 1)
        fk_miss = int((k[idx] != uid).sum())
        checks = {
            "event_id_null": int(df["event_id"].isna().sum()),
            "value_null": int(df["value"].isna().sum()),
            "value_out_of_range": int(((df["value"] < 0)
                                       | (df["value"] > 90)).sum()),
            "ts_out_of_range": int((df["ts"]
                                    < pd.Timestamp("2024-01-05")).sum()),
            "event_type_unknown": int((~df["event_type"]
                                       .isin(ALLOWED)).sum()),
            "user_fk_missing": fk_miss,
        }
        return pd.DataFrame({"check": list(checks),
                             "violations": np.array(list(checks.values()),
                                                    np.int64)})

    from cdcsdk_server_ray.stages.aggregate import grouped_aggregate
    out = grouped_aggregate(ev.map_batches(partials, batch_format="pandas"),
                            ["check"], {"violations": ("violations", "sum")})
    return finish_sorted(out, "check")


def quantile_sketch(sf_dir: str, permilles=(500, 900, 990),
                    rel_error: float = 0.01):
    """MERGEABLE quantile sketch for unbounded-resolution columns — the
    declared scale path where the exact disc-quantile plan's
    bounded-histogram contract does not hold (quantile_pipeline
    docstring). Log-spaced bins at ``rel_error`` relative width: each
    block emits one bounded bin-count vector (O(bins), independent of
    rows); bins sum through ONE tiny exchange; the final cumsum pick
    returns a value within one bin (≤ rel_error relative) of the exact
    quantile. Deterministic — no sampling — so re-runs are identical.
    Tested against the exact quantiles (test_stats)."""
    import ray.data

    lo, hi = 1.0, 1e7                        # o_totalprice domain anchor
    ratio = 1.0 + rel_error
    nbins = int(np.ceil(np.log(hi / lo) / np.log(ratio))) + 2

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = np.clip(df["o_totalprice"].to_numpy(np.float64), lo, hi)
        b = np.floor(np.log(v / lo) / np.log(ratio)).astype(np.int64) + 1
        cnt = np.bincount(b, minlength=nbins).astype(np.int64)
        return pd.DataFrame({"bin": np.arange(nbins, dtype=np.int64),
                             "cnt": cnt})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bin", sort=True)["cnt"].sum()
        cnt = np.zeros(nbins, np.int64)
        cnt[g.index.to_numpy()] = g.to_numpy()
        cum = cnt.cumsum()
        total = int(cum[-1])
        rows = []
        for p in permilles:
            k = (p * total + 999) // 1000
            b = int(np.searchsorted(cum, k, side="left"))
            # bin upper edge: value ≤ lo * ratio^b
            est = lo * ratio ** b
            rows.append((int(p), round(float(est), 4)))
        return pd.DataFrame(rows, columns=["q_permille", "value_est"])

    return _finalize_partials(
        ds.map_batches(partial, batch_format="pandas"), final)


def value_histogram(sf_dir: str, bin_width: float = 10.0):
    """Fixed-width histogram of ``events.value`` — the monitoring
    primitive behind every drift check: one vectorized floor-divide per
    block, partial (bin, count) rows through the combiner, nothing else
    moves."""
    import ray.data

    from cdcsdk_server_ray.stages.aggregate import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["value"])

    def binify(df: pd.DataFrame) -> pd.DataFrame:
        b = np.floor(df["value"].to_numpy(np.float64) / bin_width) \
            .astype(np.int64)
        return pd.DataFrame({"bin": b, "one": np.ones(len(df), np.int64)})

    out = grouped_aggregate(ds.map_batches(binify, batch_format="pandas"),
                            ["bin"], {"n": ("one", "sum")})
    return finish_sorted(out, "bin")


def drift_psi(sf_dir: str, bin_width: float = 10.0,
              split_ts: str = "2024-01-16"):
    """Population-stability-index drift monitor: PSI between the value
    distribution BEFORE and AFTER ``split_ts`` over fixed bins —
    Σ (p_a - p_b) · ln(p_a / p_b), the standard production check that a
    feed's distribution hasn't shifted. One pass: per-block (bin,
    side-count) partials through the combiner; the PSI sum is a
    driver-side kernel over ≤ |bins| rows. 6dp-rounded for the oracle."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "value"])
    cut = pd.Timestamp(split_ts)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        b = np.floor(df["value"].to_numpy(np.float64) / bin_width) \
            .astype(np.int64)
        early = (df["ts"] < cut).to_numpy()
        g = pd.DataFrame({"bin": b, "n_a": early.astype(np.int64),
                          "n_b": (~early).astype(np.int64)})
        return (g.groupby("bin", sort=False).sum().reset_index()
                .astype({"n_a": "int64", "n_b": "int64"}))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bin", sort=True)[["n_a", "n_b"]].sum()
        ta, tb = int(g["n_a"].sum()), int(g["n_b"].sum())
        # Laplace-smooth empty cells so ln() stays finite — mirrored in
        # the SQL oracle
        pa_ = (g["n_a"].to_numpy(np.float64) + 0.5) / (ta + 0.5 * len(g))
        pb_ = (g["n_b"].to_numpy(np.float64) + 0.5) / (tb + 0.5 * len(g))
        psi = float(((pa_ - pb_) * np.log(pa_ / pb_)).sum())
        return pd.DataFrame({"n_bins": [np.int64(len(g))],
                             "n_early": [np.int64(ta)],
                             "n_late": [np.int64(tb)],
                             "psi": [round(psi, 6)]})

    return _finalize_partials(
        ds.map_batches(partials, batch_format="pandas"), final)


def table_checksum(sf_dir: str):
    """Order-insensitive grouped table checksums — the
    pt-table-checksum / data-diff consistency primitive a CDC operator
    runs to verify that a replicated table matches its source: per
    group (source), an XOR-fold of md5-lower-64 over each row's
    canonical string, plus the exact row count. XOR is commutative and
    associative, so per-batch partials are exact regardless of block
    layout or partitioning — the aggregate distributes with NO exchange
    at all (group domain is small; partial rows are O(groups × blocks)
    and finish at a driver barrier).

    The hash is the repo-wide md5-lower-64 convention
    (``int.from_bytes(md5(x).digest()[8:], 'little')`` ==
    DuckDB ``md5_number_lower(x)``), so the SQL oracle re-derives every
    row hash independently; a checksum mismatch between two engines
    localizes to a (group, count) cell exactly like the reference
    tooling's per-chunk checksums."""
    import hashlib

    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"source": np.array([], object),
                                 "n_rows": np.array([], np.int64),
                                 "xor": np.array([], np.uint64)})
        h = np.fromiter(
            (int.from_bytes(
                hashlib.md5(f"{d}:{t}".encode()).digest()[8:], "little")
             for d, t in zip(df["doc_id"], df["text"])),
            dtype=np.uint64, count=len(df))
        out = []
        for src, idx in df.groupby("source", sort=False).indices.items():
            out.append((src, np.int64(len(idx)),
                        np.bitwise_xor.reduce(h[idx])))
        return pd.DataFrame(out, columns=["source", "n_rows", "xor"]) \
            .astype({"n_rows": "int64", "xor": "uint64"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, g in df.groupby("source", sort=True):
            x = np.bitwise_xor.reduce(g["xor"].to_numpy(np.uint64))
            signed = int(x) - (1 << 64) if int(x) >= (1 << 63) else int(x)
            rows.append((src, int(g["n_rows"].sum()), signed))
        return pd.DataFrame(rows, columns=["source", "n_rows", "checksum"]) \
            .astype({"n_rows": "int64", "checksum": "int64"})

    return _finalize_partials(
        docs.map_batches(partial, batch_format="pandas"), final)


def dq_profile(sf_dir: str, table: str = "orders"):
    """Column profile of a table — per column: row count, null count,
    distinct-or-min/max summary — the schema-profiling pass a data
    platform runs on every new feed before wiring it into a pipeline
    (reference scope ends at forwarding; profiling is a §2.5 gap op).

    One map-only pass: each block contributes one partial row per
    column (count/nulls/min/max, all decomposable), folded on the
    driver — no exchange at any scale. Numeric min/max are exact;
    string columns report lexicographic min/max (the same totals DuckDB
    computes), and money columns profile in exact cents.
    """
    import numpy as np
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet")

    def partial(t: pa.Table) -> pa.Table:
        names, nrows, nulls, mins, maxs = [], [], [], [], []
        for name in t.column_names:
            col = t[name]
            names.append(name)
            nrows.append(t.num_rows)
            nulls.append(col.null_count)
            valid = col.drop_null()
            if len(valid) == 0:
                mins.append(None); maxs.append(None)
                continue
            mm = pc.min_max(valid)
            mn, mx = mm["min"], mm["max"]
            ty = col.type
            if pa.types.is_floating(ty):
                # exact-cent profile for 2dp money columns
                mins.append(str(int(round(mn.as_py() * 100))))
                maxs.append(str(int(round(mx.as_py() * 100))))
            elif pa.types.is_timestamp(ty):
                mins.append(mn.as_py().isoformat(sep=" "))
                maxs.append(mx.as_py().isoformat(sep=" "))
            else:
                mins.append(str(mn.as_py()))
                maxs.append(str(mx.as_py()))
        return pa.table({
            "col": pa.array(names, pa.string()),
            "n": pa.array(nrows, pa.int64()),
            "nulls": pa.array(nulls, pa.int64()),
            "vmin": pa.array(mins, pa.string()),
            "vmax": pa.array(maxs, pa.string())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    rows = []
    for col, g in parts.groupby("col", sort=True):
        vmin = g["vmin"].dropna()
        vmax = g["vmax"].dropna()
        # numeric-string partials compare numerically, others lexically
        def _key(s):
            try:
                return (0, int(s))
            except ValueError:
                return (1, s)
        rows.append((col, int(g["n"].sum()), int(g["nulls"].sum()),
                     min(vmin, key=_key) if len(vmin) else None,
                     max(vmax, key=_key) if len(vmax) else None))
    return pd.DataFrame(rows, columns=["col", "n", "nulls",
                                       "vmin", "vmax"])


def group_regression(sf_dir: str):
    """Per-group OLS line (slope + intercept) of event value over time —
    the GROUPED-REGRESSION moment shape (trend per series; the closed
    form every streaming-ML "fit a line per key" reduces to).

    Exactness: x = whole minutes since 2024-01-01 (positive → integer
    truncation == floor on both engines), y = exact cents. Each batch
    folds ONE integer moment row per group (n, Σx, Σy, Σxy, Σx²) —
    int64-safe to ~10^9 rows per group at this x span (x ≤ 5·10^4 min
    → x² ≤ 2.5·10^9/row; documented bound, and DuckDB's HUGEINT sums
    are exact on the oracle side). The closed-form numerators/
    denominators are assembled in PYTHON INTS (arbitrary precision —
    n·Σxy overflows int64 by design at the final step), each rounded
    to double ONCE, and divided once — bit-identical to the oracle's
    CAST(num AS DOUBLE)/CAST(den AS DOUBLE)."""
    import ray.data

    from cdcsdk_server_ray.stages.aggregate import grouped_aggregate

    anchor_us = int(pd.Timestamp("2024-01-01").value // 1000)

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts", "value"])

    def moments(t: pa.Table) -> pd.DataFrame:
        ts_us = t["ts"].cast(pa.timestamp("us")).to_numpy() \
            .astype("datetime64[us]").astype(np.int64)
        x = (ts_us - anchor_us) // 60_000_000
        y = np.round(t["value"].to_numpy().astype(np.float64)
                     * 100).astype(np.int64)
        g = pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                          "n": np.ones(len(x), np.int64),
                          "sx": x, "sy": y, "sxy": x * y, "sxx": x * x})
        return (g.groupby("event_type", sort=False).sum().reset_index())

    totals = grouped_aggregate(
        ds.map_batches(moments, batch_format="pyarrow"),
        ["event_type"],
        {"n": ("n", "sum"), "sx": ("sx", "sum"), "sy": ("sy", "sum"),
         "sxy": ("sxy", "sum"), "sxx": ("sxx", "sum")}).to_pandas()

    rows = []
    for _, r in totals.sort_values("event_type").iterrows():
        n, sx, sy, sxy, sxx = (int(r["n"]), int(r["sx"]), int(r["sy"]),
                               int(r["sxy"]), int(r["sxx"]))
        den = n * sxx - sx * sx
        slope = float(n * sxy - sx * sy) / float(den) if den else 0.0
        intercept = (float(sy * sxx - sx * sxy) / float(den)
                     if den else 0.0)
        rows.append((r["event_type"], n, slope, intercept))
    return pd.DataFrame(rows, columns=["event_type", "n_events",
                                       "slope_cents_per_min",
                                       "intercept_cents"]).astype(
        {"n_events": "int64"})


def approx_distinct_hll(sf_dir: str, column: str = "l_partkey",
                        table: str = "lineitem"):
    """HyperLogLog distinct sketch (Flajolet et al. 2007), m=64
    registers — the MERGEABLE register-max sketch that complements the
    KMV estimator (:func:`approx_distinct_kmv`): registers combine with
    a plain per-bucket MAX, so partials merge associatively across any
    task topology.

    Oracle-exact by construction: value hash is md5-lower-64 (the house
    convention == ``md5_number_lower``), bucket = low 6 bits, rho =
    leading-zero rank of the remaining 58 bits; the harmonic sum stays
    EXACT-INTEGER (Σ 2^(59−M_j) — each term a power of two ≤ 2^59,
    summed in Python ints / HUGEINT) and is rounded to double ONCE in
    the shared estimate formula. Each batch emits ≤ m register rows
    (values pre-deduped per batch); one single-task max-combine
    finishes. Output: the registers (the sketch itself — what a
    100 TB run would persist and merge) plus the estimate."""
    import hashlib

    import ray.data

    from cdcsdk_server_ray.stages.aggregate import grouped_aggregate

    M = 64

    ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet",
                               columns=[column])

    def partial(t: pa.Table) -> pd.DataFrame:
        vals = pc.unique(t[column])
        regs = np.zeros(M, dtype=np.int64)
        for v in vals.to_pylist():
            h = int.from_bytes(
                hashlib.md5(str(v).encode()).digest()[8:], "little")
            w = h >> 6
            rho = 59 - w.bit_length() if w else 59
            b = h & 63
            if rho > regs[b]:
                regs[b] = rho
        nz = regs.nonzero()[0]
        return pd.DataFrame({"bucket": nz.astype(np.int64),
                             "max_rho": regs[nz]})

    merged = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["bucket"], {"max_rho": ("max_rho", "max")}).to_pandas()

    regs = np.zeros(M, dtype=np.int64)
    if len(merged):
        regs[merged["bucket"].to_numpy(np.int64)] = \
            merged["max_rho"].to_numpy(np.int64)
    s_exact = sum(1 << (59 - int(r)) for r in regs)     # Python ints
    estimate = 0.709 * 64 * 64 * 576460752303423488.0 / float(s_exact)
    return pd.DataFrame({
        "bucket": np.arange(M, dtype=np.int64),
        "max_rho": regs,
        "raw_estimate": np.full(M, estimate, dtype=np.float64)})


def mad_outliers(sf_dir: str, k_mad: int = 3):
    """Robust per-group outlier audit: median + MAD (median absolute
    deviation) of event value per type, and the count of events beyond
    ``k_mad`` MADs — the robust-statistics complement of
    :func:`group_zscore_outliers` (mean/std break under the very
    outliers they are meant to flag; median/MAD do not).

    ONE distributed pass: a per-(type, cents) value HISTOGRAM via the
    map-side combiner (2-decimal money → the distinct-value domain is
    bounded, ≤ ~49k cells per type — the documented assumption; an
    unbounded-domain column would ride :func:`quantile_sketch`
    instead). Median, the deviation histogram, MAD and the outlier
    count all fold from the histogram driver-side in exact integer
    cents — deviations need NO second data pass because
    |c − med| regroups the same histogram. Disc-median convention is
    the house ceil(q·n/1000) pick, matching the SQL oracle's
    cumulative-count window."""
    import ray.data

    from cdcsdk_server_ray.stages.aggregate import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def hist_partial(t: pa.Table) -> pd.DataFrame:
        c = np.round(t["value"].to_numpy().astype(np.float64)
                     * 100).astype(np.int64)
        g = pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                          "c": c})
        out = (g.groupby(["event_type", "c"], sort=False)
               .size().reset_index(name="cnt"))
        out["cnt"] = out["cnt"].astype("int64")
        return out

    hist = grouped_aggregate(
        ds.map_batches(hist_partial, batch_format="pyarrow"),
        ["event_type", "c"], {"cnt": ("cnt", "sum")}).to_pandas()

    def disc_median(vals: np.ndarray, cnts: np.ndarray) -> int:
        order = np.argsort(vals)
        vals, cnts = vals[order], cnts[order]
        cum = np.cumsum(cnts)
        total = int(cum[-1])
        pick = (500 * total + 999) // 1000
        return int(vals[np.searchsorted(cum, pick)])

    rows = []
    for et, g in hist.groupby("event_type"):
        vals = g["c"].to_numpy(np.int64)
        cnts = g["cnt"].to_numpy(np.int64)
        med = disc_median(vals, cnts)
        dev = np.abs(vals - med)
        dd = pd.DataFrame({"d": dev, "cnt": cnts}).groupby("d")["cnt"] \
            .sum().reset_index()
        mad = disc_median(dd["d"].to_numpy(np.int64),
                          dd["cnt"].to_numpy(np.int64))
        n_out = int(cnts[dev > k_mad * mad].sum())
        rows.append((et, med, mad, n_out))
    rows.sort()
    out = pd.DataFrame(rows, columns=["event_type", "med_c", "mad_c",
                                      "n_outliers"])
    return pd.DataFrame({
        "event_type": out["event_type"],
        "median_value": out["med_c"].to_numpy(np.int64) / 100.0,
        "mad_value": out["mad_c"].to_numpy(np.int64) / 100.0,
        "n_outliers": out["n_outliers"].to_numpy(np.int64)})


def group_quantiles_cont(sf_dir: str, permilles=(500, 900, 990)):
    """INTERPOLATED (type-7 / percentile_cont) per-group quantiles of
    event value — the continuous complement of the disc family, made
    EXACT-INTEGER: with cents ints and permille q, the rank position is
    the rational q·(n−1)/1000, so the interpolated value is
    ``v_lo·1000 + rem·(v_hi − v_lo)`` in milli-cents — no float enters
    until the one shared /100000 division.

    Same ONE-histogram-pass plan as :func:`mad_outliers` (per-(type,
    cents) combiner; the 2-decimal money domain bounds the histogram);
    ranks, neighbors and interpolation all fold from the histogram
    driver-side."""
    import ray.data

    from cdcsdk_server_ray.stages.aggregate import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def hist_partial(t: pa.Table) -> pd.DataFrame:
        c = np.round(t["value"].to_numpy().astype(np.float64)
                     * 100).astype(np.int64)
        g = pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                          "c": c})
        out = (g.groupby(["event_type", "c"], sort=False)
               .size().reset_index(name="cnt"))
        out["cnt"] = out["cnt"].astype("int64")
        return out

    hist = grouped_aggregate(
        ds.map_batches(hist_partial, batch_format="pyarrow"),
        ["event_type", "c"], {"cnt": ("cnt", "sum")}).to_pandas()

    rows = []
    for et, g in hist.groupby("event_type"):
        vals = g["c"].to_numpy(np.int64)
        cnts = g["cnt"].to_numpy(np.int64)
        order = np.argsort(vals)
        vals, cnts = vals[order], cnts[order]
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        for p in permilles:
            pos = p * (n - 1)               # rational rank ·1000
            idx, rem = pos // 1000, pos % 1000
            v_lo = int(vals[np.searchsorted(cum, idx + 1)])
            v_hi = int(vals[np.searchsorted(cum, idx + 2)]) \
                if idx + 2 <= n else v_lo
            milli = v_lo * 1000 + rem * (v_hi - v_lo)
            rows.append((et, int(p), milli / 100000.0))
    rows.sort(key=lambda r: (r[0], r[1]))
    return pd.DataFrame(rows, columns=["event_type", "q_permille",
                                       "value"]).astype(
        {"q_permille": "int64"})
