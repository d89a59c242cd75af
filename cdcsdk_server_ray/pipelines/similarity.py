"""Similarity search over the ``embeddings`` table (list<float> column).

- ``knn_bruteforce``: exact cosine top-k — query matrix broadcast via
  ``ray.put`` once, per-batch numpy matmul, per-batch top-k prune, tiny
  final merge. The baseline any ANN variant is measured against.
- ``knn_lsh``: random-hyperplane LSH bucketing — the scale path: each
  batch only scores candidates sharing a bucket with the query.
- ``near_dup_embeddings``: all-pairs cosine ≥ τ via the same broadcast
  pattern (at 10^9 rows this becomes blocked matmul over bucketed
  partitions; the block structure is already here).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _read_emb(sf_dir: str):
    import ray.data
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def _to_matrix(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix, zero-copy-ish."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_bruteforce(sf_dir: str, num_queries: int = 5, k: int = 10):
    """Exact cosine top-k for the first ``num_queries`` vectors against the
    whole table. Output: (query_id, vec_id, cos) rounded to 6dp — matches
    the DuckDB list_cosine_similarity oracle."""
    import ray

    ds = _read_emb(sf_dir)
    qdf = ds.filter(lambda r: r["vec_id"] < num_queries).to_pandas()
    qm = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                              for v in qdf["embedding"]]))
    qids = qdf["vec_id"].to_numpy()
    q_ref = ray.put((qids, qm))

    def score_batch(t: pa.Table) -> pa.Table:
        qids_, qm_ = ray.get(q_ref)
        m = _normalize(_to_matrix(t["embedding"]))
        cos = qm_ @ m.T                       # (Q, batch)
        vec_ids = t["vec_id"].to_numpy()
        out_q, out_v, out_c = [], [], []
        kk = min(k, cos.shape[1])
        for qi in range(cos.shape[0]):
            idx = np.argpartition(-cos[qi], kk - 1)[:kk]   # per-batch prune
            out_q.append(np.full(kk, qids_[qi], dtype=np.int64))
            out_v.append(vec_ids[idx])
            out_c.append(cos[qi][idx])
        return pa.table({"query_id": np.concatenate(out_q),
                         "vec_id": np.concatenate(out_v),
                         "cos": np.concatenate(out_c)})

    partial = ds.map_batches(score_batch, batch_format="pyarrow")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        g["cos"] = g["cos"].round(6)
        return g

    return (partial.groupby("query_id")
            .map_groups(final_topk, batch_format="pandas")
            .sort(["query_id", "cos", "vec_id"],
                  descending=[False, True, False]))


class LshBucketer:
    """Random-hyperplane LSH: planes drawn once per actor (seeded)."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))

    def bucket(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes) > 0
        return (bits @ (1 << np.arange(bits.shape[1]))).astype(np.int64)

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(t["embedding"]))
        return t.append_column("bucket", pa.array(self.bucket(m)))


def knn_lsh(sf_dir: str, num_queries: int = 5, k: int = 10, n_planes: int = 8):
    """ANN top-k: only candidates in the query's hyperplane bucket are
    scored (recall < 1 by design; bucket fan-out = 1 here, probe more
    buckets for higher recall)."""
    import ray

    ds = _read_emb(sf_dir)
    sample = ds.take(1)
    dim = len(sample[0]["embedding"])
    bucketer = LshBucketer(dim, n_planes)
    qdf = ds.filter(lambda r: r["vec_id"] < num_queries).to_pandas()
    qm = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                              for v in qdf["embedding"]]))
    q_buckets = bucketer.bucket(qm)
    q_ref = ray.put((qdf["vec_id"].to_numpy(), qm, q_buckets))

    def score(t: pa.Table, b=bucketer) -> pa.Table:
        qids, qm_, qb = ray.get(q_ref)
        m = _normalize(_to_matrix(t["embedding"]))
        vb = b.bucket(m)
        vec_ids = t["vec_id"].to_numpy()
        out_q, out_v, out_c = [], [], []
        for qi in range(len(qids)):
            mask = vb == qb[qi]
            if not mask.any():
                continue
            cos = m[mask] @ qm_[qi]
            kk = min(k, cos.size)
            idx = np.argpartition(-cos, kk - 1)[:kk]
            out_q.append(np.full(kk, qids[qi], dtype=np.int64))
            out_v.append(vec_ids[mask][idx])
            out_c.append(cos[idx])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        return pa.table({"query_id": np.concatenate(out_q),
                         "vec_id": np.concatenate(out_v),
                         "cos": np.concatenate(out_c)})

    partial = ds.map_batches(score, batch_format="pyarrow")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        g["cos"] = g["cos"].round(6)
        return g

    return (partial.groupby("query_id")
            .map_groups(final_topk, batch_format="pandas")
            .sort(["query_id", "cos", "vec_id"],
                  descending=[False, True, False]))


def near_dup_embeddings(sf_dir: str, threshold: float = 0.95):
    """Embedding near-duplicate pairs (cos ≥ τ, a < b). Small-side matrix
    broadcast once; per-batch blocked matmul."""
    import ray

    ds = _read_emb(sf_dir)
    all_df = ds.to_pandas()     # test scale; at 10^9 rows: bucketed blocks
    am = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                              for v in all_df["embedding"]]))
    ids = all_df["vec_id"].to_numpy()
    ref = ray.put((ids, am))

    def pairs(t: pa.Table) -> pa.Table:
        ids_, am_ = ray.get(ref)
        m = _normalize(_to_matrix(t["embedding"]))
        vec_ids = t["vec_id"].to_numpy()
        cos = m @ am_.T
        r, c = np.nonzero(cos >= threshold)
        keep = vec_ids[r] < ids_[c]     # a < b, no self-pairs
        return pa.table({"vec_a": vec_ids[r][keep],
                         "vec_b": ids_[c][keep],
                         "cos": np.round(cos[r, c][keep], 6)})

    return ds.map_batches(pairs, batch_format="pyarrow").sort(["vec_a", "vec_b"])


class HashEmbedder:
    """Batched "model inference" stage (actor pool): text → embedding.

    STUB model — a deterministic feature-hashing projection (token hash →
    bucket, signed counts, L2-normalized) standing in for a sentence
    encoder; the real deployment swaps ``_embed_batch`` for a model loaded
    in ``__init__`` (ONCE per actor — the whole point of the actor pool)
    and keeps everything else: batch shape, list<float32> output column,
    concurrency sizing.
    """

    def __init__(self, dim: int = 64, seed: int = 42):
        import re
        self.dim = dim
        self.tok = re.compile(r"\w+")
        rng = np.random.default_rng(seed)
        self._salt = rng.integers(1, 2**63 - 1, dtype=np.int64)

    def _embed_batch(self, texts) -> np.ndarray:
        import pandas as pd
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, text in enumerate(texts):
            toks = self.tok.findall(text.lower())
            if not toks:
                continue
            h = pd.util.hash_pandas_object(
                pd.Series(toks), index=False,
                hash_key="cdcsdk-ray-hash0").to_numpy()
            buckets = (h % np.uint64(self.dim)).astype(np.int64)
            signs = np.where((h >> np.uint64(32)) & np.uint64(1), 1.0, -1.0)
            np.add.at(out[i], buckets, signs.astype(np.float32))
        return _normalize(out.astype(np.float64)).astype(np.float32)

    def __call__(self, t: pa.Table) -> pa.Table:
        emb = self._embed_batch(t["text"].to_pylist())
        return pa.table({
            "doc_id": t["doc_id"],
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.reshape(-1), pa.float32()), self.dim),
        })


def embed_documents(sf_dir: str, dim: int = 64):
    """documents.text → embeddings via the actor-pool inference stage."""
    import ray.data
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return docs.map_batches(HashEmbedder, fn_constructor_kwargs={"dim": dim},
                            batch_format="pyarrow", batch_size=256,
                            concurrency=2).sort("doc_id")


def knn_ivf(sf_dir: str, num_queries: int = 5, k: int = 10,
            n_centroids: int = 16, nprobe: int = 4):
    """IVF ANN: coarse quantizer (deterministic centroids = first C
    vectors, one Lloyd refinement) → per-batch scoring restricted to the
    query's ``nprobe`` nearest cells. The inverted-file scale path next to
    the LSH variant; recall < 1 by construction (rows-only check)."""
    import ray

    ds = _read_emb(sf_dir)
    all_df = ds.to_pandas()     # small here; at scale: sample for training
    m = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                             for v in all_df["embedding"]]))
    cents = m[:n_centroids].copy()
    for _ in range(2):          # two Lloyd steps, deterministic
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(n_centroids):
            members = m[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    qm = m[:num_queries]
    qids = all_df["vec_id"].to_numpy()[:num_queries]
    q_cells = np.argsort(-(qm @ cents.T), axis=1)[:, :nprobe]
    ref = ray.put((qids, qm, cents, q_cells))

    def score(t: pa.Table) -> pa.Table:
        qids_, qm_, cents_, q_cells_ = ray.get(ref)
        mb = _normalize(_to_matrix(t["embedding"]))
        vec_ids = t["vec_id"].to_numpy()
        cell = np.argmax(mb @ cents_.T, axis=1)
        out_q, out_v, out_c = [], [], []
        for qi in range(len(qids_)):
            mask = np.isin(cell, q_cells_[qi])
            if not mask.any():
                continue
            cos = mb[mask] @ qm_[qi]
            kk = min(k, cos.size)
            idx = np.argpartition(-cos, kk - 1)[:kk]
            out_q.append(np.full(kk, qids_[qi], dtype=np.int64))
            out_v.append(vec_ids[mask][idx])
            out_c.append(cos[idx])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        return pa.table({"query_id": np.concatenate(out_q),
                         "vec_id": np.concatenate(out_v),
                         "cos": np.concatenate(out_c)})

    partial = ds.map_batches(score, batch_format="pyarrow")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        g["cos"] = g["cos"].round(6)
        return g

    return (partial.groupby("query_id")
            .map_groups(final_topk, batch_format="pandas")
            .sort(["query_id", "cos", "vec_id"],
                  descending=[False, True, False]))
