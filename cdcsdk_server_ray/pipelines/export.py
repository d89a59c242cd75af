"""Resumable partitioned-Parquet export for query results.

The engine's lake already writes resumable output (deterministic
fragment names + manifest); this is the same contract for ARBITRARY
query results: one directory per partition key, a `_SUCCESS.<key>`
marker written only after that partition's data is fully on disk, and a
re-run that SKIPS every marked partition — so a failed 100 TB export
resumes from where it died instead of rewriting everything.
(≙ the reference's S3 sink laying one object per roll with atomic
complete-or-abort multipart, S3OutputStream.java:146-152; prompt brief
"Resumable output".)

Design notes for scale:
- the partition column must be LOW-CARDINALITY (source, lang, date —
  not doc_id): one flush task per partition key;
- data moves ONCE: blocks hash-exchange by partition key (the same
  bucketed `groupby` exchange every pipeline here uses), each group
  writes its own directory — the driver only writes markers;
- markers are per-partition, so concurrent exporters of DIFFERENT
  partitions never conflict; a crashed partition leaves data without a
  marker and is rewritten (tmp + rename keeps readers from seeing torn
  files).
"""

from __future__ import annotations

import os

import pandas as pd


def _marker(out_dir: str, key: str) -> str:
    return os.path.join(out_dir, f"_SUCCESS.{key}")


def export_partitioned(ds, out_dir: str, by: str) -> dict:
    """Write ``ds`` under ``out_dir/<by>=<key>/part-0.parquet`` with
    per-partition success markers; partitions whose marker already
    exists are SKIPPED (their rows are dropped before the exchange, so
    a resume moves only the unfinished remainder). Returns
    {written: [keys], skipped: [keys]}."""
    os.makedirs(out_dir, exist_ok=True)
    done = {f.split(".", 1)[1] for f in os.listdir(out_dir)
            if f.startswith("_SUCCESS.")}

    def drop_done(df: pd.DataFrame) -> pd.DataFrame:
        if done:
            df = df[~df[by].astype(str).isin(done)]
        return df

    def flush(g: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.parquet as pq
        key = str(g[by].iloc[0])
        pdir = os.path.join(out_dir, f"{by}={key}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, "part-0.parquet.tmp")
        final = os.path.join(pdir, "part-0.parquet")
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp,
                       compression="zstd")
        # fsync DATA before the rename and the marker — a durable marker
        # must never reference non-durable bytes (same contract as
        # state/lake.write_fragment)
        with open(tmp, "rb") as f:
            os.fsync(f.fileno())
        os.replace(tmp, final)
        # marker written HERE, per partition, as soon as this partition
        # is durable — a crash mid-export leaves markers for every
        # finished partition, so the resume skips them (writing markers
        # on the driver after take_all() would leave zero markers on a
        # 99%-done crash and rewrite everything)
        open(_marker(out_dir, key), "w").close()
        return pd.DataFrame({"key": [key], "rows": [len(g)]})

    written = (ds.map_batches(drop_done, batch_format="pandas")
               .groupby(by)
               .map_groups(flush, batch_format="pandas")
               .take_all())
    return {"written": sorted(r["key"] for r in written),
            "skipped": sorted(done)}
