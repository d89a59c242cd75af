"""Changelog over a REAL Parquet table (the input_hint corpus).

The synth source (changelog.py) proves replay determinism; this source
proves the engine ingests an actual table. The driver's ``documents``
table (doc_id, text, lang, source, n_chars) is adapted to the input-hint
shape — ``repo = 'corpus/' + source``, ``path = 'docs/d<doc_id>.txt'``,
``commit = md5(content)``, ``content = text`` — and a three-round
changelog is derived from it deterministically:

    round 0 (lsn = doc_id + 1):               INSERT every row
    round 1 (lsn = OFFSET + doc_id + 1):      UPDATE rows with doc_id%3==0
                                              (content -> text + ' [v2]')
    round 2 (lsn = 2*OFFSET + doc_id + 1):    DELETE rows with doc_id%7==0

Expected final state is exactly SQL-expressible (oracle
``cdc_table_ingest`` in __ray_entry__), which makes the full engine —
fence, LWW, two-phase commit, merge-on-read — oracle-checked end to end
on real data, not just on synthesized events.

Reads are window-driven with parquet predicate pushdown on ``doc_id``
(only the rows whose LSNs fall in the window leave storage — the
column-prune + row-filter rule for 100 TB reads).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

OFFSET = 10_000_000          # lsn stride between rounds
MAX_LSN = 3 * OFFSET + 1     # exclusive upper bound of the changelog

_ROUND_OPS = {0: "c", 1: "u", 2: "d"}


def _md5_arr(texts: list[str | None]) -> pa.Array:
    return pa.array([None if t is None else hashlib.md5(t.encode()).hexdigest()
                     for t in texts], pa.string())


def _round_events(tbl: pa.Table, r: int) -> pa.Table:
    """Events of round ``r`` for the given documents rows (already
    row-filtered to the round's doc_id predicate and window range)."""
    doc_id = tbl["doc_id"].to_numpy()
    lsn = r * OFFSET + doc_id + 1
    op = _ROUND_OPS[r]
    n = len(doc_id)
    source = tbl["source"].to_pylist()
    repo = pa.array([f"corpus/{s}" for s in source])
    path = pa.array([f"docs/d{d}.txt" for d in doc_id])
    if op == "d":
        content = pa.nulls(n, pa.string())
        commit = pa.nulls(n, pa.string())
        lang = pa.nulls(n, pa.string())
    else:
        texts = tbl["text"].to_pylist()
        if op == "u":
            texts = [t + " [v2]" for t in texts]
        content = pa.array(texts, pa.string())
        commit = _md5_arr(texts)
        lang = tbl["lang"].combine_chunks() if isinstance(tbl["lang"], pa.ChunkedArray) else tbl["lang"]
    return pa.table({
        "lsn": pa.array(lsn),
        "tx_id": pa.array(lsn // 64),
        "op": pa.array([op] * n),
        "ts_ms": pa.array(1_700_000_000_000 + lsn * 7,
                          pa.int64()).cast(pa.timestamp("ms")),
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": content,
    })


def _round_filter(tbl: pa.Table, r: int) -> pa.Table:
    """Round membership (update/delete subsets) — applied per batch;
    modulo isn't expressible as a parquet pushdown predicate, but the
    doc_id RANGE still prunes row groups at the read."""
    if r in (1, 2):
        m = 3 if r == 1 else 7
        mod = pc.subtract(tbl["doc_id"],
                          pc.multiply(pc.divide(tbl["doc_id"], m), m))
        return tbl.filter(pc.equal(mod, 0))
    return tbl


def table_changelog_dataset(table_path: str, lo: int, hi: int, *,
                            batch_size: int = 32_768):
    """Lazy Dataset of change events with lsn ∈ [lo, hi) derived from the
    documents table — one pruned read per intersecting round."""
    import pyarrow.dataset as pads
    import ray.data

    parts = []
    for r in range(3):
        r_lo, r_hi = r * OFFSET + 1, r * OFFSET + OFFSET + 1
        w_lo, w_hi = max(lo, r_lo), min(hi, r_hi)
        if w_lo >= w_hi:
            continue
        # lsn = r*OFFSET + doc_id + 1  ⇒  doc_id ∈ [w_lo - r*OFFSET - 1, w_hi - r*OFFSET - 1)
        d_lo, d_hi = w_lo - r * OFFSET - 1, w_hi - r * OFFSET - 1
        filt = (pads.field("doc_id") >= d_lo) & (pads.field("doc_id") < d_hi)
        ds = ray.data.read_parquet(
            table_path, columns=["doc_id", "text", "lang", "source"],
            filter=filt)
        rr = r

        def to_events(tbl: pa.Table, _r=rr) -> pa.Table:
            return _round_events(_round_filter(tbl, _r), _r)

        parts.append(ds.map_batches(to_events, batch_format="pyarrow",
                                    batch_size=batch_size))
    if not parts:
        import ray.data as rd
        return rd.range(0).map_batches(
            lambda t: _round_events(
                pa.table({"doc_id": pa.array([], pa.int64()),
                          "text": pa.array([], pa.string()),
                          "lang": pa.array([], pa.string()),
                          "source": pa.array([], pa.string())}), 0),
            batch_format="pyarrow")
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def table_doc_id_bounds(table_path: str) -> tuple[int, int]:
    """(min, max) ``doc_id`` from parquet ROW-GROUP STATISTICS — an
    O(metadata) scan, no data pages read. The incremental snapshot plans
    its chunk key ranges from this, so planning stays cheap at 100 TB
    (the reference's incremental snapshot likewise plans chunks from
    table key bounds, not a table scan)."""
    import os

    import pyarrow.parquet as pq

    paths = []
    if os.path.isdir(table_path):
        for root, _dirs, files in os.walk(table_path):
            paths.extend(os.path.join(root, f) for f in sorted(files)
                         if f.endswith(".parquet"))
    else:
        paths = [table_path]
    lo, hi = None, None
    for p in paths:
        md = pq.ParquetFile(p).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = idx["doc_id"]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                # stats-less file: read its doc_id column ONCE, fold, and
                # move on (a per-row-group fallback would re-read the full
                # column O(row_groups) times, defeating the O(metadata)
                # planning claim)
                import pyarrow.compute as _pc
                col = pq.read_table(p, columns=["doc_id"])["doc_id"]
                mn, mx = _pc.min(col).as_py(), _pc.max(col).as_py()
                lo = mn if lo is None else min(lo, mn)
                hi = mx if hi is None else max(hi, mx)
                break
            mn, mx = st.min, st.max
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
    if lo is None:
        raise ValueError(f"no parquet rows under {table_path}")
    return int(lo), int(hi)


def _round_events_before(tbl: pa.Table, r: int) -> pa.Table:
    """Events of round ``r`` WITH before-images — the REPLICA IDENTITY
    FULL shape (Debezium envelope ``before``): updates carry the prior
    content, deletes carry the deleted row's full image (content + lang)
    instead of nulls. Incremental view maintenance needs exactly this —
    the old contribution to subtract — and it is source-derivable here
    because the changelog is a pure function of the table."""
    doc_id = tbl["doc_id"].to_numpy()
    lsn = r * OFFSET + doc_id + 1
    op = _ROUND_OPS[r]
    n = len(doc_id)
    source = tbl["source"].to_pylist()
    texts = tbl["text"].to_pylist()
    repo = pa.array([f"corpus/{s}" for s in source])
    path = pa.array([f"docs/d{d}.txt" for d in doc_id])
    lang = tbl["lang"].combine_chunks() \
        if isinstance(tbl["lang"], pa.ChunkedArray) else tbl["lang"]
    if op == "c":
        content = pa.array(texts, pa.string())
        before = pa.nulls(n, pa.string())
    elif op == "u":
        content = pa.array([t + " [v2]" for t in texts], pa.string())
        before = pa.array(texts, pa.string())
    else:
        content = pa.nulls(n, pa.string())
        before = pa.array([t + " [v2]" if d % 3 == 0 else t
                           for t, d in zip(texts, doc_id)], pa.string())
    return pa.table({
        "lsn": pa.array(lsn), "op": pa.array([op] * n),
        "repo": repo, "path": path, "lang": lang,
        "content": content, "before_content": before})


def table_changelog_before_dataset(table_path: str, lo: int, hi: int, *,
                                   batch_size: int = 32_768):
    """Lazy Dataset of change events with before-images, lsn ∈ [lo, hi)
    — same pruned 3-round derivation as :func:`table_changelog_dataset`
    but through :func:`_round_events_before`."""
    import pyarrow.dataset as pads
    import ray.data

    parts = []
    for r in range(3):
        r_lo, r_hi = r * OFFSET + 1, r * OFFSET + OFFSET + 1
        w_lo, w_hi = max(lo, r_lo), min(hi, r_hi)
        if w_lo >= w_hi:
            continue
        d_lo, d_hi = w_lo - r * OFFSET - 1, w_hi - r * OFFSET - 1
        filt = (pads.field("doc_id") >= d_lo) & (pads.field("doc_id") < d_hi)
        ds = ray.data.read_parquet(
            table_path, columns=["doc_id", "text", "lang", "source"],
            filter=filt)
        rr = r

        def to_events(tbl: pa.Table, _r=rr) -> pa.Table:
            return _round_events_before(_round_filter(tbl, _r), _r)

        parts.append(ds.map_batches(to_events, batch_format="pyarrow",
                                    batch_size=batch_size))
    if not parts:
        import ray.data as rd
        return rd.range(0).map_batches(
            lambda t: _round_events_before(
                pa.table({"doc_id": pa.array([], pa.int64()),
                          "text": pa.array([], pa.string()),
                          "lang": pa.array([], pa.string()),
                          "source": pa.array([], pa.string())}), 0),
            batch_format="pyarrow")
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
