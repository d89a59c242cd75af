"""Grouped aggregation with batch-local pre-aggregation (combiner pattern).

The reference has only global Micrometer counters (Metrics.java:14-24);
grouped aggregation is one of the gap operators SURVEY.md §2.5 assigns to
the rebuild. At scale a bare ``groupby(k).aggregate(...)`` shuffles every
row; the combiner shrinks each batch to ≤ |keys-in-batch| partial rows
inside ``map_batches`` first, so the all-to-all exchange moves partials,
not data. Supported aggs: sum / count / min / max / mean (mean is carried
as sum+count and finalized after the shuffle — the classic decomposable-
aggregate treatment).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def grouped_aggregate(ds, keys: list[str], aggs: dict[str, tuple[str, str]],
                      batch_format: str = "pyarrow", final: str = "single"):
    """``aggs``: output_name → (input_col, fn).

    fn ∈ sum | count | min | max | mean — the decomposable classics — plus
    the *exact-decimal* variants ``sum2`` / ``sum4`` / ``mean2``: the value
    is scaled to an int64 at 10^2/10^4 (exact for 2-/4-decimal data like
    prices), summed in integer space (order-independent!), and unscaled at
    finalize. These exist so a distributed sum equals a single-threaded
    (DuckDB DECIMAL) sum bit-for-bit — float sums differ across summation
    orders, which breaks value-hash comparisons at rounding boundaries.

    ``count`` is count(*) (row count per group).
    Returns a Dataset with columns ``keys + list(aggs)``; one row per key.

    ``final`` picks the post-combiner plan — the caller's DECLARED key-
    cardinality assumption:
    - ``"single"`` (default): gather the partial rows (≤ |distinct keys|
      × |blocks|, and ≤ |distinct keys| after the second combine) into
      one task and finish with one Arrow group_by kernel. Right whenever
      the distinct-key set fits one worker heap — segments, regions,
      partitions, hourly windows — and skips the all-to-all Aggregate
      exchange, whose fixed cost (~4-5 s on this box) dwarfs these
      queries' real work.
    - ``"shuffle"``: Ray's hash Aggregate over the partials. Required
      when distinct keys are unbounded (per-user, per-document rollups).
    """
    _SCALE = {"sum2": 100, "mean2": 100, "sum4": 10_000}
    partial_cols: dict[str, tuple[str, str]] = {}   # partial_name → (src, fn)
    finals: dict[str, tuple] = {}                   # out_name → finalize plan
    for out, (src, fn) in aggs.items():
        if fn in ("mean", "mean2"):
            partial_cols[f"__s_{out}"] = (src, "sum" if fn == "mean" else "sum2")
            partial_cols[f"__c_{out}"] = (src, "count")
            finals[out] = ("mean", f"__s_{out}", f"__c_{out}", _SCALE.get(fn, 1))
        elif fn == "count":
            partial_cols[f"__p_{out}"] = (src, "count")
            finals[out] = ("id", f"__p_{out}", 1)
        else:
            partial_cols[f"__p_{out}"] = (src, fn)
            finals[out] = ("id", f"__p_{out}", _SCALE.get(fn, 1))

    def partial(batch: pa.Table) -> pa.Table:
        """Batch-local combine in Arrow C++ kernels (group_by + sum/min/
        max): no pandas conversion in the hot path. Scaled-int columns
        use round(half_to_even) — identical to the numpy rounding the
        previous pandas implementation used."""
        import pyarrow.compute as pc

        cols = {k: batch[k] for k in keys}
        plan = []
        for pname, (src, fn) in partial_cols.items():
            if fn == "count":
                cols[pname] = pa.array(
                    np.ones(batch.num_rows, np.int64))
                plan.append((pname, "sum"))
            elif fn in _SCALE:
                cols[pname] = pc.cast(
                    pc.round(pc.multiply(pc.cast(batch[src], pa.float64()),
                                         pa.scalar(float(_SCALE[fn])))),
                    pa.int64())
                plan.append((pname, "sum"))
            else:
                cols[pname] = batch[src]
                plan.append((pname, fn))
        t = pa.table(cols)
        out = t.group_by(keys, use_threads=False).aggregate(plan)
        # group_by names outputs "<col>_<fn>" — restore the partial names
        rename = {f"{p}_{f}": p for p, f in plan}
        return out.rename_columns(
            [rename.get(c, c) for c in out.column_names])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    if final == "single":
        def recombine(batch: pa.Table) -> pa.Table:
            plan = [(p, {"min": "min", "max": "max"}.get(f, "sum"))
                    for p, (_, f) in partial_cols.items()]
            out = batch.group_by(keys, use_threads=False).aggregate(plan)
            rename = {f"{p}_{f}": p for p, f in plan}
            return out.rename_columns(
                [rename.get(c, c) for c in out.column_names])

        grouped = partials.repartition(1).map_batches(
            recombine, batch_format="pyarrow", batch_size=None)
    else:
        from ray.data.aggregate import Max, Min, Sum
        agg_objs = []
        for pname, (src, fn) in partial_cols.items():
            cls = {"sum": Sum, "sum2": Sum, "sum4": Sum, "count": Sum,
                   "min": Min, "max": Max}[fn]
            agg_objs.append(cls(pname, alias_name=pname))
        grouped = partials.groupby(keys).aggregate(*agg_objs)

    def finalize(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = df[keys].copy()
        for oname, spec in finals.items():
            if spec[0] == "mean":
                _, s, c, scale = spec
                num = df[s] / scale if scale != 1 else df[s]
                out[oname] = num / df[c]
            else:
                _, p, scale = spec
                out[oname] = df[p] / scale if scale != 1 else df[p]
        return pa.Table.from_pandas(out, preserve_index=False)

    return grouped.map_batches(finalize, batch_format="pyarrow")


def topk(ds, col: str, k: int, descending: bool = True, keep_cols=None):
    """Distributed top-k without a global sort: per-batch k-prune inside
    map_batches, then one tiny final sort+limit. The global ``ds.sort``
    alternative is an all-to-all shuffle of every row — wrong at scale.
    """
    import pyarrow.compute as pc

    def prune(batch: pa.Table) -> pa.Table:
        if keep_cols:
            batch = batch.select(keep_cols)
        if batch.num_rows <= k:
            return batch
        order = "descending" if descending else "ascending"
        idx = pc.sort_indices(batch, sort_keys=[(col, order)])
        return batch.take(idx.slice(0, k))

    pruned = ds.map_batches(prune, batch_format="pyarrow")
    return pruned.sort(col, descending=descending).limit(k)
