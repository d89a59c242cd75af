"""User-supplied changelog source: ingest ANY Parquet event table.

The synth source proves replay determinism and the table source proves
real-table ingestion, but a user of the reference points it at an
ARBITRARY upstream changefeed (``cdcsdk.source.*`` →
`/root/reference/README.md:128-140`). This source is that surface for
the Ray engine: a Parquet file/directory of change events in the flat
event schema

    lsn:int64  op:string('c'|'u'|'d')  repo:string  path:string
    commit:string  lang:string  content:string
    [tx_id:int64]  [ts_ms:timestamp]   (derived from lsn when absent)

Windows read with an LSN RANGE PREDICATE pushed to the Parquet scan
(only the window's row groups leave storage — the same pruned-read rule
as the table source), so a 100 TB changelog streams window by window.
LSNs must be unique; per-key ordering follows LSN order (the WAL
contract every other source here shares). Resume/replay correctness
comes from the engine's watermark fence + deterministic fragment
names — a replayed window re-reads the same immutable rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

EVENT_COLUMNS = ["lsn", "op", "repo", "path", "commit", "lang", "content"]


def changelog_max_lsn(table_path: str) -> int:
    """Exclusive upper LSN bound, from parquet row-group statistics only
    (no data read)."""
    import pyarrow.dataset as pads

    ds = pads.dataset(table_path)
    hi = 0
    for frag in ds.get_fragments():
        for rg in frag.row_groups:
            stats = rg.statistics or {}
            m = (stats.get("lsn") or {}).get("max")
            if m is not None:
                hi = max(hi, int(m))
            else:                      # no stats written: fall back once
                t = frag.to_table(columns=["lsn"])
                if t.num_rows:
                    hi = max(hi, int(pc.max(t["lsn"]).as_py()))
                break
    return hi + 1


def parquet_changelog_dataset(table_path: str, lo: int, hi: int, *,
                              batch_size: int = 32_768):
    """Lazy Dataset of events with lsn ∈ [lo, hi), column-pruned and
    row-group-pruned at the read."""
    import pyarrow.dataset as pads
    import ray.data

    schema = pads.dataset(table_path).schema
    cols = list(EVENT_COLUMNS)
    for opt in ("tx_id", "ts_ms"):
        if schema.get_field_index(opt) != -1:
            cols.append(opt)
    filt = (pads.field("lsn") >= lo) & (pads.field("lsn") < hi)
    ds = ray.data.read_parquet(table_path, columns=cols, filter=filt)

    def conform(t: pa.Table) -> pa.Table:
        # engine bookkeeping columns derived from lsn when not supplied
        if "tx_id" not in t.column_names:
            t = t.append_column(
                "tx_id", pc.divide(t["lsn"], pa.scalar(64, pa.int64())))
        if "ts_ms" not in t.column_names:
            t = t.append_column(
                "ts_ms",
                pc.add(pa.scalar(1_700_000_000_000, pa.int64()),
                       pc.multiply(t["lsn"], pa.scalar(7, pa.int64())))
                .cast(pa.timestamp("ms")))
        order = ["lsn", "tx_id", "op", "ts_ms", "repo", "path",
                 "commit", "lang", "content"]
        return t.select(order)

    return ds.map_batches(conform, batch_format="pyarrow",
                          batch_size=batch_size)
