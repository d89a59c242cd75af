"""Capstone composition: the full training-corpus preparation pipeline.

raw documents → quality filter → near-duplicate removal (MinHash-LSH
clusters, keep representatives) → sequence packing — the end-to-end
shape a pre-training data pipeline actually runs, composed from this
repo's own operators with a CHECKPOINTED stage boundary: the cleaned
corpus materializes as a documents-shaped Parquet snapshot between the
filter/dedup phase and the packing phase.

Why a materialized boundary instead of one fused Dataset: the dedup
phase is a multi-pass pipeline (signatures, band exchange, verify,
clustering) over the SAME input — fusing it into one lazy graph would
recompute the filtered corpus once per pass. At 100 TB the snapshot is
a resumable artifact (the same reason the engine commits fragments):
a crashed packing phase restarts from the snapshot, not from raw data.

Keep-set handling is fully DISTRIBUTED: the filter keeps, the dedup
survivors, and the corpus rows are tagged and hash-partitioned by
doc_id into the same buckets, and each bucket emits its corpus rows
whose id appears on BOTH keep sides — one exchange, one vectorized
membership kernel per bucket, nothing id-shaped ever materializes on
the driver or rides a task closure. (The round-3 version collected both
id-frames to the driver, intersected them as Python sets, and pickled
the result into every filter task — ~16 GB per task at 10^9 docs.)
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd


def _cleaned_corpus_snapshot(sf_dir: str, work_dir: str,
                             num_buckets: int = 32) -> str:
    """Stages 1-3: quality filter ∩ dedup survivors, snapshotted as a
    documents-shaped Parquet directory. Returns the snapshot path."""
    import ray.data

    # unsorted internal variants: the membership join re-exchanges both
    # keep sides, so the public APIs' presentation sorts would each add
    # a wasted repartition+sort execution here
    from cdcsdk_server_ray.pipelines.dedup import _survivors_unsorted
    from cdcsdk_server_ray.pipelines.text import _quality_filter_unsorted

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    doc_cols = docs.schema().names

    def tag(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            if side != "C":                      # keep-side rows: ids only
                df = df[["doc_id"]]
            df = df.reindex(columns=doc_cols).copy()
            df["__side"] = side
            df["__db"] = (df["doc_id"].to_numpy(np.uint64)
                          % np.uint64(num_buckets)).astype(np.int32)
            return df
        return fn

    tagged = (docs.map_batches(tag("C"), batch_format="pandas")
              .union(_quality_filter_unsorted(sf_dir)
                     .map_batches(tag("F"), batch_format="pandas"))
              .union(_survivors_unsorted(sf_dir)
                     .map_batches(tag("S"), batch_format="pandas")))

    def emit_kept(g: pd.DataFrame) -> pd.DataFrame:
        f_ids = g.loc[g["__side"] == "F", "doc_id"]
        s_ids = g.loc[g["__side"] == "S", "doc_id"]
        corpus = g[g["__side"] == "C"]
        keep = corpus["doc_id"].isin(f_ids) & corpus["doc_id"].isin(s_ids)
        return corpus.loc[keep, doc_cols]

    shutil.rmtree(work_dir, ignore_errors=True)
    os.makedirs(work_dir, exist_ok=True)
    (tagged.groupby("__db")
     .map_groups(emit_kept, batch_format="pandas")
     .write_parquet(work_dir))
    # pack_sequences expects <dir>/documents.parquet; Ray wrote a file
    # forest — point a directory named documents.parquet at it
    forest = [f for f in os.listdir(work_dir) if f.endswith(".parquet")]
    snap = os.path.join(work_dir, "documents.parquet")
    os.makedirs(snap, exist_ok=True)
    for f in forest:
        os.replace(os.path.join(work_dir, f), os.path.join(snap, f))
    return snap


def corpus_prep(sf_dir: str, work_dir: str = "/tmp/corpus_prep"):
    """Run the composed pipeline; returns the packed-bin summary
    (seq_id, n_docs, n_tokens) over the cleaned, deduped corpus and the
    cleaned-document count.

    Stages (each an existing, individually-tested operator):
    1. ``text.quality_filter``     — keep well-formed docs;
    2. ``dedup.dedup_survivors``   — drop near-dup cluster non-reps;
    3. bucketed 3-way membership join (filter ∩ survivors, applied to
       the corpus rows in one exchange), snapshot the cleaned corpus as
       Parquet (documents-shaped, so every operator in the repo runs on
       it unchanged);
    4. ``text.pack_sequences`` over the snapshot — fixed-token-budget
       training bins via the distributed ordered prefix scan.
    """
    import ray.data

    from cdcsdk_server_ray.pipelines.text import pack_sequences

    _cleaned_corpus_snapshot(sf_dir, work_dir)
    # metadata-only count of the snapshot (never the rows)
    n_clean = ray.data.read_parquet(
        os.path.join(work_dir, "documents.parquet")).count()

    # stage 4: pack the cleaned corpus into fixed-token bins
    packed = pack_sequences(work_dir).to_pandas()
    out = (packed.groupby("seq_id", sort=True)
           .agg(n_docs=("doc_id", "size"), n_tokens=("n_tokens", "sum"))
           .reset_index()
           .astype({"seq_id": "int64", "n_docs": "int64",
                    "n_tokens": "int64"}))
    return out, n_clean
