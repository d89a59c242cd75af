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
"""

from __future__ import annotations

import os
import shutil

import pandas as pd


def corpus_prep(sf_dir: str, work_dir: str = "/tmp/corpus_prep"):
    """Run the composed pipeline; returns the packed-bin summary
    (seq_id, n_docs, n_tokens) over the cleaned, deduped corpus.

    Stages (each an existing, individually-tested operator):
    1. ``text.quality_filter``     — keep well-formed docs;
    2. ``dedup.dedup_survivors``   — drop near-dup cluster non-reps;
    3. intersect survivors with the filter keeps, snapshot the cleaned
       corpus as Parquet (documents-shaped, so every operator in the
       repo runs on it unchanged);
    4. ``text.pack_sequences`` over the snapshot — fixed-token-budget
       training bins via the distributed ordered prefix scan.
    """
    import ray.data

    from cdcsdk_server_ray.pipelines.dedup import dedup_survivors
    from cdcsdk_server_ray.pipelines.text import pack_sequences, quality_filter

    # stage 1+2 run over the raw corpus (each is its own bounded plan)
    kept = quality_filter(sf_dir).to_pandas()          # (doc_id, lang, ...)
    survivors = dedup_survivors(sf_dir).to_pandas()    # (doc_id, ...)
    keep_ids = set(kept["doc_id"]) & set(survivors["doc_id"])
    # NOTE on driver state: kept/survivors are id-frames (output-sized,
    # not corpus-sized text); at 10^9+ docs swap this intersection for
    # the bucketed anti-join used inside dedup_survivors itself —
    # semantics identical, nothing driver-side.

    # stage 3: snapshot the cleaned corpus, documents-shaped
    shutil.rmtree(work_dir, ignore_errors=True)
    os.makedirs(work_dir, exist_ok=True)
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")

    def keep_rows(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["doc_id"].isin(keep_ids)]

    docs.map_batches(keep_rows, batch_format="pandas") \
        .write_parquet(os.path.join(work_dir))
    # pack_sequences expects <dir>/documents.parquet; Ray wrote a file
    # forest — point a directory named documents.parquet at it
    forest = [f for f in os.listdir(work_dir) if f.endswith(".parquet")]
    snap = os.path.join(work_dir, "documents.parquet")
    os.makedirs(snap, exist_ok=True)
    for f in forest:
        os.replace(os.path.join(work_dir, f), os.path.join(snap, f))

    # stage 4: pack the cleaned corpus into fixed-token bins
    packed = pack_sequences(work_dir).to_pandas()
    out = (packed.groupby("seq_id", sort=True)
           .agg(n_docs=("doc_id", "size"), n_tokens=("n_tokens", "sum"))
           .reset_index()
           .astype({"seq_id": "int64", "n_docs": "int64",
                    "n_tokens": "int64"}))
    return out, len(keep_ids)
