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

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from cdcsdk_server_ray.stages.worker_cache import worker_cached
from cdcsdk_server_ray.stages.finish import finish_sorted


def _read_emb(sf_dir: str):
    import ray.data
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def _read_queries(sf_dir: str, num_queries: int) -> pd.DataFrame:
    """The query vectors, via parquet predicate pushdown — only matching
    row groups leave storage (a ``ds.filter(lambda)`` here would stream
    the whole table through a per-row Python filter)."""
    import pyarrow.dataset as pads
    import ray.data
    return (ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                  filter=(pads.field("vec_id") < num_queries))
            .to_pandas())


_TOPK_COLS = ["query_id", "vec_id", "cos"]


def _topk_finish(partial, k: int):
    """Per-query exact top-k over per-batch partials, finished in ONE
    task: the partial stage already pruned to ≤ num_queries × k rows per
    block, so the surviving rows are tiny by construction and a
    groupby-per-query exchange + global sort (two all-to-all operators,
    each with seconds of fixed cost on this box) collapse into a single
    vectorized kernel. Returns a TYPED frame even when empty so
    downstream blocks keep a stable schema (empty pandas groups dropping
    columns caused RefBundle schema churn)."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.sort_values(["query_id", "cos", "vec_id"],
                             ascending=[True, False, True])
              .groupby("query_id", sort=False).head(k))
        df = df.reindex(columns=_TOPK_COLS).reset_index(drop=True)
        df["cos"] = df["cos"].round(6)
        return df
    return partial.repartition(1).map_batches(
        fn, batch_format="pandas", batch_size=None)


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


def _train_sample(ds, train_sample: int) -> pd.DataFrame:
    """Deterministic UNBIASED bounded training sample via a vec_id hash
    filter (Knuth multiplicative). ``ds.limit(n)`` reads the FIRST
    blocks of the file — a biased sample on any corpus sorted or
    partitioned by content (cluster/source/date), which trains centroids
    on one corner of the embedding space (VERDICT r03 item 6). The hash
    filter touches every block but keeps the same bounded row count and
    is a pure function of vec_id — replay-stable."""
    n = ds.count()                      # parquet metadata count — cheap
    m = max(1, round(n / max(1, train_sample)))
    if m == 1:
        return ds.to_pandas()

    def keep(t: pa.Table) -> pa.Table:
        h = (t["vec_id"].to_numpy().astype(np.uint64)
             * np.uint64(2654435761)) >> np.uint64(16)
        return t.filter(pa.array((h % np.uint64(m)) == 0))

    return ds.map_batches(keep, batch_format="pyarrow").to_pandas()


def _write_params(table: pa.Table, path: str) -> None:
    """Atomically publish a fitted-parameter sidecar (PCA components,
    k-means centroids) as parquet. The driver's DuckDB oracle joins
    against this file, which turns 'iterative, non-SQL-expressible'
    operators into exact oracle checks: the small fitted model is
    driver-sized configuration; the DISTRIBUTED part (assignment /
    projection over the corpus) is what the oracle then verifies
    independently in SQL."""
    import os

    import pyarrow.parquet as pq
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def knn_bruteforce(sf_dir: str, num_queries: int = 5, k: int = 10):
    """Exact cosine top-k for the first ``num_queries`` vectors against the
    whole table. Output: (query_id, vec_id, cos) rounded to 6dp — matches
    the DuckDB list_cosine_similarity oracle."""
    import ray

    ds = _read_emb(sf_dir)
    qdf = _read_queries(sf_dir, num_queries)
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
    return _topk_finish(partial, k)


class LshBucketer:
    """Multi-table random-hyperplane LSH: ``n_tables`` independent plane
    sets drawn once per actor (seeded). A vector's code per table is the
    sign pattern of its projections; recall compounds across tables
    (miss probability multiplies), the standard LSH space/recall trade."""

    def __init__(self, dim: int, n_planes: int = 12, n_tables: int = 1,
                 seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_tables, dim, n_planes))
        self.n_tables = n_tables

    def bucket(self, m: np.ndarray) -> np.ndarray:
        """(n, d) → (n_tables, n) bucket codes."""
        w = (1 << np.arange(self.planes.shape[2]))
        out = np.empty((self.n_tables, len(m)), dtype=np.int64)
        for ti in range(self.n_tables):
            out[ti] = ((m @ self.planes[ti]) > 0) @ w
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(t["embedding"]))
        return t.append_column("bucket", pa.array(self.bucket(m)[0]))


def knn_lsh(sf_dir: str, num_queries: int = 5, k: int = 10,
            n_planes: int = 8, multiprobe: int = 1, n_tables: int = 4,
            params_out: str | None = None):
    """ANN top-k: only candidates sharing a bucket with the query in at
    least one of ``n_tables`` hash tables are scored. ``multiprobe`` adds
    the buckets within that Hamming distance of the query's code per
    table (the standard recall lever: vectors near a hyperplane land one
    bit away); tables multiply the miss probability down (a true
    neighbor is lost only if EVERY table separates it) — together they
    push recall toward exact while candidate volume stays a small
    fraction of N."""
    import ray

    ds = _read_emb(sf_dir)
    qdf = _read_queries(sf_dir, num_queries)
    dim = len(qdf["embedding"].iloc[0])
    bucketer = LshBucketer(dim, n_planes, n_tables)
    if params_out:
        # hyperplanes published per (table, plane, dim) row: with them,
        # bucket codes, the multiprobe candidate rule AND the exact-cos
        # top-k are all SQL-re-derivable — the ANN result becomes an
        # exact oracle check, not rows-only (sign(x·w) is scale
        # invariant, so the oracle skips the normalization)
        T, D, P = bucketer.planes.shape     # reshape(-1): T, then D, then P
        _write_params(pa.table({
            "tbl": pa.array(np.repeat(np.arange(T, dtype=np.int64), D * P)),
            "dim_idx": pa.array(np.tile(
                np.repeat(np.arange(D, dtype=np.int64), P), T)),
            "plane": pa.array(np.tile(np.arange(P, dtype=np.int64), T * D)),
            "w": pa.array(bucketer.planes.reshape(-1)),
        }), params_out)
    qm = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                              for v in qdf["embedding"]]))
    base = bucketer.bucket(qm)                # (T, Q)
    probes = [base]
    if multiprobe >= 1:
        probes += [base ^ (1 << b) for b in range(n_planes)]
    if multiprobe >= 2:
        probes += [base ^ (1 << b1) ^ (1 << b2)
                   for b1 in range(n_planes) for b2 in range(b1 + 1, n_planes)]
    q_bucketsets = np.stack(probes, axis=2)   # (T, Q, n_probe_buckets)
    q_ref = ray.put((qdf["vec_id"].to_numpy(), qm, q_bucketsets))

    def score(t: pa.Table, b=bucketer) -> pa.Table:
        qids, qm_, qb = ray.get(q_ref)
        m = _normalize(_to_matrix(t["embedding"]))
        vb = b.bucket(m)                      # (T, batch)
        vec_ids = t["vec_id"].to_numpy()
        out_q, out_v, out_c = [], [], []
        for qi in range(len(qids)):
            mask = np.zeros(len(m), dtype=bool)
            for ti in range(vb.shape[0]):     # union of per-table matches
                mask |= np.isin(vb[ti], qb[ti, qi])
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
    return _topk_finish(partial, k)


SEED_DUP_OFFSET = 1_000_000   # seeded duplicates get vec_id + this
SEED_DUP_COUNT = 50           # first N vectors are duplicated


def _augmented_embeddings(sf_dir: str):
    """embeddings ∪ exact copies of the first SEED_DUP_COUNT vectors (ids
    shifted by SEED_DUP_OFFSET). The synthetic table has no natural pairs
    above cos 0.52, so the near-dup query was vacuously green on 0 rows;
    seeding known duplicates (the standard near-dup eval trick, and
    SQL-expressible so the oracle stays exact) makes the green meaningful.
    """
    import pyarrow.dataset as pads
    import ray.data

    base = _read_emb(sf_dir)
    dup_src = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        filter=(pads.field("vec_id") < SEED_DUP_COUNT))

    def shift(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.set_column(
            t.column_names.index("vec_id"), "vec_id",
            pc.add(t["vec_id"], SEED_DUP_OFFSET))

    return base.union(dup_src.map_batches(shift, batch_format="pyarrow"))


_PAIR_COLS = ["vec_a", "vec_b", "cos"]


def near_dup_embeddings(sf_dir: str, threshold: float = 0.95,
                        n_tables: int = 8, n_bits: int = 6):
    """Embedding near-duplicate pairs (cos ≥ τ, a < b) via banded
    random-hyperplane LSH: each vector emits one (table, bucket) row per
    hash table; candidates = co-bucketed vectors; exact cosine verify
    inside the group. NOTHING materializes on the driver — the shuffle
    moves n_tables copies of each embedding row (the classic LSH space
    trade), and buckets bound the verify to |bucket|² instead of N².

    Recall: a pair at cos τ collides in one table w.p. (1-θ/π)^n_bits;
    across 8 tables of 6 bits, misses are <0.3% at τ=0.95 — and the seeded
    exact duplicates (cos = 1) collide in EVERY table, so the oracle
    comparison is deterministic.

    DENSE-BUCKET CAP (recall bound, same as dedup.py's BAND_CAP): a
    bucket larger than ``BUCKET_CAP`` would pay O(n²) matmul and emit an
    unbounded pair list on clustered data — instead it scores every
    member against the bucket's hub (min vec_id) only: O(n·d) work, O(n)
    pairs. Spoke-spoke pairs of such a dense cluster are emitted only if
    they also co-bucket in a sparser table; exact-duplicate clusters stay
    connected through the hub, so downstream clustering is unaffected.
    """
    aug = _augmented_embeddings(sf_dir)
    sample = _read_queries(sf_dir, 1)
    dim = len(sample["embedding"].iloc[0])
    rng = np.random.default_rng(1234)
    planes = rng.standard_normal((n_tables, dim, n_bits))
    weights = (1 << np.arange(n_bits)).astype(np.int64)

    def band_rows(t: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(t["embedding"]))
        n = len(m)
        buckets = np.empty((n_tables, n), dtype=np.int64)
        for ti in range(n_tables):
            bits = (m @ planes[ti]) > 0
            buckets[ti] = bits @ weights
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        vec_ids = t["vec_id"].to_numpy()
        tables = []
        for ti in range(n_tables):
            tables.append(pa.table({
                "table_id": np.full(n, ti, dtype=np.int32),
                "bucket": buckets[ti],
                "vec_id": vec_ids,
                "embedding": emb,
            }))
        return pa.concat_tables(tables)

    banded = aug.map_batches(band_rows, batch_format="pyarrow")

    BUCKET_CAP = 256

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                              "vec_b": pd.Series(dtype="int64"),
                              "cos": pd.Series(dtype="float64")})
        if len(g) < 2:
            return empty
        order = np.argsort(g["vec_id"].to_numpy())
        ids = g["vec_id"].to_numpy()[order]
        m = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                                 for v in g["embedding"].to_numpy()[order]]))
        if len(ids) > BUCKET_CAP:
            # dense bucket: hub (min vec_id) vs every member — O(n·d)
            # instead of the O(n²) self-matmul; see docstring recall bound
            cos = m[1:] @ m[0]
            keep = cos >= threshold
            return pd.DataFrame({"vec_a": np.full(int(keep.sum()), ids[0]),
                                 "vec_b": ids[1:][keep],
                                 "cos": np.round(cos[keep], 6)})
        cos = m @ m.T
        r, c = np.nonzero(np.triu(cos >= threshold, k=1))
        return pd.DataFrame({"vec_a": ids[r], "vec_b": ids[c],
                             "cos": np.round(cos[r, c], 6)})

    pairs = (banded.groupby(["table_id", "bucket"])
             .map_groups(bucket_pairs, batch_format="pandas")).materialize()

    # dedup across tables (a pair can co-bucket in several). cos is
    # identical for a given pair in every table (rounded from the same
    # vectors), so keep="first" is deterministic either way. The pair
    # rows are OUTPUT-sized (star-capped, ≥τ only) and already
    # materialized, so when they fit one worker heap the dedup + sort
    # finish as one kernel — skipping two all-to-all exchanges whose
    # fixed cost dwarfs rows this small. Above the bound: hash-bucket by
    # PAIR + one vectorized drop_duplicates per bucket — a
    # groupby([vec_a, vec_b]).map_groups there would run one Python
    # group per OUTPUT PAIR (the measured high-cardinality groupby
    # pathology).
    if pairs.count() <= 2_000_000:
        def finish(df: pd.DataFrame) -> pd.DataFrame:
            return (df.drop_duplicates(["vec_a", "vec_b"])
                    .sort_values(["vec_a", "vec_b"])
                    .reindex(columns=_PAIR_COLS).reset_index(drop=True))
        return pairs.repartition(1).map_batches(
            finish, batch_format="pandas", batch_size=None)

    def add_pb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = (df["vec_a"].to_numpy(np.uint64)
             * np.uint64(0x9E3779B97F4A7C15)) ^ df["vec_b"].to_numpy(np.uint64)
        df["__pb"] = (h % np.uint64(32)).astype(np.int32)
        return df

    return (finish_sorted(pairs.map_batches(add_pb, batch_format="pandas")
            .groupby("__pb")
            .map_groups(lambda g: g.drop_duplicates(["vec_a", "vec_b"])
                        .reindex(columns=_PAIR_COLS),
                        batch_format="pandas"), ["vec_a", "vec_b"]))


def make_jl_projection(n_features: int = 1024, dim: int = 64,
                       seed: int = 42) -> np.ndarray:
    """Achlioptas sparse Johnson-Lindenstrauss projection (Achlioptas
    2003, "Database-friendly random projections"): entries drawn from
    {+1, 0, −1} with probabilities {1/6, 2/3, 1/6}. The √(3/dim) scale
    factor is deliberately OMITTED — the embedding is L2-normalized, so
    a constant scale cancels and the projection of the integer feature
    vector stays in EXACT int64 arithmetic end to end (what makes the
    DuckDB oracle re-derivation bit-identical before the one
    normalize+round step)."""
    rng = np.random.default_rng(seed)
    u = rng.random((n_features, dim))
    return np.where(u < 1 / 6, 1, np.where(u >= 5 / 6, -1, 0)) \
        .astype(np.int8)


class HashEmbedder:
    """Batched "model inference" stage (worker-cached): text → embedding.

    A REAL, public, deterministic embedding — the hashing trick
    (Weinberger et al. 2009) + sparse JL random projection:

    - tokenize ``[a-z0-9_]+`` over lowercased text;
    - md5-lower-64 each token (the repo's oracle-able hash convention:
      == DuckDB ``md5_number_lower``); bucket = h % n_features, sign
      from the next hash bits — signed token counts are the (sparse,
      integer) feature vector;
    - project through the broadcast ±1/0 JL matrix (int64 matmul,
      exact), L2-normalize in float64, round 6dp.

    A neural encoder swaps ``_embed_batch`` for a model loaded in
    ``__init__`` (ONCE per worker via ``worker_cached``; a heavy model
    would instead ``ray.put`` its weights once and pass the stable ref)
    and keeps everything else: batch shape, list<double> output column,
    concurrency sizing. The md5 per unique token is inherently per-token
    work; a worker-lifetime token cache amortizes it across batches."""

    def __init__(self, proj_ref=None, n_features: int = 1024,
                 dim: int = 64, seed: int = 42):
        import ray
        self.n_features = n_features
        self.dim = dim
        self.tok = re.compile(r"[a-z0-9_]+")
        self.proj = (ray.get(proj_ref) if proj_ref is not None
                     else make_jl_projection(n_features, dim, seed)) \
            .astype(np.int64)
        self._cache: dict[str, tuple[int, int]] = {}

    def _hash_token(self, tok: str) -> tuple[int, int]:
        hit = self._cache.get(tok)
        if hit is None:
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[8:],
                               "little")
            hit = (h % self.n_features,
                   1 if (h // self.n_features) % 2 == 0 else -1)
            if len(self._cache) < 1_000_000:     # bounded actor memory
                self._cache[tok] = hit
        return hit

    def _embed_batch(self, texts) -> tuple[np.ndarray, np.ndarray]:
        feats = np.zeros((len(texts), self.n_features), dtype=np.int64)
        for i, text in enumerate(texts):
            for tok in self.tok.findall(text.lower()):
                b, s = self._hash_token(tok)
                feats[i, b] += s
        raw = feats @ self.proj                   # exact int64
        norm = np.sqrt((raw.astype(np.float64) ** 2).sum(axis=1))
        keep = norm > 0                           # tokenless/degenerate
        emb = np.round(raw[keep] / norm[keep, None], 6)
        return emb, keep

    def __call__(self, t: pa.Table) -> pa.Table:
        emb, keep = self._embed_batch(t["text"].to_pylist())
        return pa.table({
            "doc_id": t["doc_id"].filter(pa.array(keep)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.reshape(-1), pa.float64()), self.dim),
        })


def embed_documents(sf_dir: str, dim: int = 64, n_features: int = 1024,
                    seed: int = 42, params_out: str | None = None):
    """documents.text → embeddings via the worker-cached inference stage.

    The fixed-seed JL matrix is rebuilt deterministically once per
    worker (64 KB — cheaper than broadcasting a fresh ObjectRef, which
    would also churn the worker cache per query) and optionally
    published as a (bucket, dim, weight) sidecar so the whole distributed
    computation — tokenize, hash, project, normalize — is re-derivable
    in SQL (see embed_docs in ``__ray_entry__``)."""
    import ray
    import ray.data

    proj = make_jl_projection(n_features, dim, seed)
    if params_out:
        b, d = np.divmod(np.arange(n_features * dim, dtype=np.int64), dim)
        _write_params(pa.table({
            "bucket": pa.array(b),
            "dim": pa.array(d),
            "weight": pa.array(proj.reshape(-1).astype(np.int64)),
        }), params_out)
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    # no ray.put: the JL matrix is a deterministic 64 KB function of
    # (n_features, dim, seed), so each worker rebuilds it once in
    # __init__ — a fresh ObjectRef per call would churn the worker_cached
    # key every query (new embedder + token cache per invocation) and pin
    # a plasma object per run for nothing
    return finish_sorted(docs.map_batches(
        worker_cached(HashEmbedder, n_features=n_features,
                      dim=dim, seed=seed),
        batch_format="pyarrow", batch_size=256), "doc_id")


def knn_ivf(sf_dir: str, num_queries: int = 5, k: int = 10,
            n_centroids: int = 16, nprobe: int = 4,
            train_sample: int = 4096, params_out: str | None = None):
    """IVF ANN: coarse quantizer (centroids seeded from a BOUNDED,
    UNBIASED hash-sample — ``_train_sample``, never the full table and
    never just the first blocks — with two Lloyd refinements) →
    per-batch scoring restricted to the query's ``nprobe`` nearest
    cells. The inverted-file scale path next to the LSH variant;
    recall < 1 vs brute force by construction, but the IVF result
    itself is exact-oracled via the published centroids sidecar."""
    import ray

    ds = _read_emb(sf_dir)
    train_df = _train_sample(ds, train_sample)      # bounded driver read
    m = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                             for v in train_df["embedding"]]))
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
    if params_out:
        # final centroids published per (cluster, dim) row: cell
        # assignment, the nprobe cell choice and the exact-cos top-k are
        # all SQL-re-derivable, making this ANN variant exact-oracled
        dim = cents.shape[1]
        _write_params(pa.table({
            "cluster": pa.array(np.repeat(np.arange(n_centroids,
                                                    dtype=np.int64), dim)),
            "dim_idx": pa.array(np.tile(np.arange(dim, dtype=np.int64),
                                        n_centroids)),
            "c": pa.array(cents.reshape(-1))}), params_out)
    qdf = _read_queries(sf_dir, num_queries)
    qm = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                              for v in qdf["embedding"]]))
    qids = qdf["vec_id"].to_numpy()
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
    return _topk_finish(partial, k)


def _combine_partials(rows, k: int, dim: int):
    """Sum per-batch (cluster, count, vsum) partial rows into (counts,
    sums) — the tiny driver-side reduce of the k-means EM step."""
    counts = np.zeros(k, dtype=np.int64)
    sums = np.zeros((k, dim), dtype=np.float64)
    for r in rows:
        c = int(r["cluster"])
        counts[c] += int(r["count"])
        if r["count"]:
            sums[c] += np.asarray(r["vsum"], dtype=np.float64)
    return counts, sums


def cluster_kmeans(sf_dir: str, k: int = 8, iters: int = 5,
                   params_out: str | None = None):
    """Distributed Lloyd k-means over the embedding column — the
    clustering primitive behind SemDeDup / data-mixing / IVF training,
    expressed Ray-Data-first:

    - centroids live on the DRIVER (k×d floats — trivially small) and are
      broadcast per iteration via ``ray.put``;
    - the E+M step is ONE stateless ``map_batches`` pass emitting k
      partial rows per batch (cluster, member count, vector sum) — the
      classic combiner shape, so the per-iteration exchange is
      O(k·blocks) partial rows, never the N×d points; the driver-side
      ``take_all`` reads only those sketch-sized partials;
    - assignment ties and empty clusters are handled deterministically
      (argmin takes the lowest cluster id; an empty cluster keeps its
      previous centroid), and init is the first ``k`` vectors by vec_id
      (predicate-pushdown read), so the result is a pure function of the
      input — replay-stable, like every operator in this repo.

    Output: (vec_id, cluster, dist) — dist is the squared L2 distance to
    the final centroid, rounded to 6dp. The Lloyd ITERATIONS are
    non-SQL-expressible, but with ``params_out`` the final k×d centroids
    are published as per-dimension parquet rows and the distributed
    ASSIGNMENT pass (argmin distance + dist) is exactly oracle-checkable
    in SQL; exactness of the iterations is additionally pinned by the
    blob-recovery and inertia tests."""
    import ray

    # Lloyd re-scans the SAME table every iteration (+1 assign pass):
    # materialize the read once so iterations run over object-store
    # blocks instead of re-decoding parquet iters+1 times. This is the
    # standard Ray iterative-training pattern — blocks spill to disk if
    # the table outgrows plasma, so it holds at scale too.
    ds = _read_emb(sf_dir).materialize()
    init_df = _read_queries(sf_dir, k)
    cents = np.stack([np.asarray(v, dtype=np.float64)
                      for v in init_df["embedding"]])
    dim = cents.shape[1]

    def em_pass(cents_ref):
        def partials(t: pa.Table) -> pa.Table:
            c = ray.get(cents_ref)
            m = _to_matrix(t["embedding"])
            # squared L2 via the expansion; |m|² is constant per row and
            # drops out of the argmin
            d = (c * c).sum(axis=1) - 2.0 * (m @ c.T)
            assign = np.argmin(d, axis=1)
            counts = np.bincount(assign, minlength=k).astype(np.int64)
            sums = np.zeros((k, dim), dtype=np.float64)
            for ci in range(k):            # k is small; mask-sum per
                sel = assign == ci          # cluster beats add.at by 10x
                if sel.any():
                    sums[ci] = m[sel].sum(axis=0)
            return pa.table({"cluster": np.arange(k, dtype=np.int64),
                             "count": counts,
                             "vsum": pa.array(list(sums),
                                              pa.list_(pa.float64()))})
        return partials

    for _ in range(iters):
        ref = ray.put(cents)
        rows = (ds.map_batches(em_pass(ref), batch_format="pyarrow")
                .take_all())                  # k rows per block (tiny)
        counts, sums = _combine_partials(rows, k, dim)
        nonempty = counts > 0
        cents = np.where(nonempty[:, None], sums / np.maximum(counts, 1)[:, None],
                         cents)

    if params_out:
        _write_params(pa.table({
            "cluster": pa.array(np.repeat(np.arange(k, dtype=np.int64), dim)),
            "dim_idx": pa.array(np.tile(np.arange(dim, dtype=np.int64), k)),
            "c": pa.array(cents.reshape(-1))}), params_out)
    final_ref = ray.put(cents)

    def assign_pass(t: pa.Table) -> pa.Table:
        c = ray.get(final_ref)
        m = _to_matrix(t["embedding"])
        d = ((m * m).sum(axis=1)[:, None] - 2.0 * (m @ c.T)
             + (c * c).sum(axis=1))
        a = np.argmin(d, axis=1)
        return pa.table({
            "vec_id": t["vec_id"],
            "cluster": a.astype(np.int64),
            "dist": np.round(np.maximum(d[np.arange(len(a)), a], 0.0), 6),
        })

    return finish_sorted(ds.map_batches(assign_pass, batch_format="pyarrow"), "vec_id")


SEMDEDUP_CLUSTER_CAP = 512


def semdedup(sf_dir: str, tau: float = 0.99, n_clusters: int = 16,
             train_sample: int = 4096, params_out: str | None = None):
    """Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
    embedding space coarsely, then drop every vector whose cosine to an
    earlier-id vector IN THE SAME CLUSTER is ≥ ``tau`` — pairwise work is
    confined to clusters, never N².

    Plan: centroids are trained on a BOUNDED unbiased hash-sample
    (``_train_sample``, like knn_ivf — never the full table, never just
    the first blocks) with two Lloyd refinements on the
    unit sphere; ONE stateless pass adds the cluster id; the only
    shuffle is ``groupby(cluster)``, inside which a single vectorized
    kernel sorts members by vec_id and marks each as kept/duplicate via
    a triangular cosine matrix.

    CLUSTER CAP (recall bound, same family as dedup.py's BAND_CAP): a
    cluster larger than ``SEMDEDUP_CLUSTER_CAP`` compares members only
    against its cap-prefix keepers (O(n·cap) work, O(n) output) instead
    of the full O(n²) triangle; exact duplicates of a prefix member are
    still caught, and at real scale ``n_clusters`` scales with N to keep
    clusters under the cap.

    Runs on the seeded-duplicate augmented table (like emb_near_dup) so
    the green is non-vacuous: the 50 exact copies MUST be dropped with
    ``dup_of`` pointing at their originals. Output: (vec_id, cluster,
    keep, dup_of) sorted by vec_id; dup_of = the smallest earlier vec_id
    within tau, null for kept rows.
    """
    import ray

    aug = _augmented_embeddings(sf_dir)

    train_df = _train_sample(_read_emb(sf_dir), train_sample)
    m = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                             for v in train_df["embedding"]]))
    cents = m[:n_clusters].copy()
    for _ in range(2):                      # spherical Lloyd, deterministic
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(n_clusters):
            members = m[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    if params_out:
        # list layout (cluster, cent) — the oracle assigns clusters with
        # list_cosine_similarity against these rows, then re-derives the
        # keep/dup_of rule with a within-cluster self-join
        _write_params(pa.table({
            "cluster": pa.array(np.arange(n_clusters, dtype=np.int64)),
            "cent": pa.array([row.tolist() for row in cents],
                             pa.list_(pa.float64()))}), params_out)
    cents_ref = ray.put(cents)

    def add_cluster(t: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        mb = _normalize(_to_matrix(t["embedding"]))
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        return pa.table({"vec_id": t["vec_id"],
                         "cluster": np.argmax(mb @ c.T, axis=1).astype(np.int64),
                         "embedding": emb})

    clustered = aug.map_batches(add_cluster, batch_format="pyarrow")

    def dedup_group(g: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(g["vec_id"].to_numpy())
        ids = g["vec_id"].to_numpy()[order]
        cluster = int(g["cluster"].iloc[0])
        m = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                                 for v in g["embedding"].to_numpy()[order]]))
        n = len(ids)
        dup_of = np.full(n, -1, dtype=np.int64)
        prefix = min(n, SEMDEDUP_CLUSTER_CAP)
        # cos of every member vs the id-ordered prefix; the strict lower
        # triangle masks "earlier vec_id" comparisons
        cos = m @ m[:prefix].T                      # (n, prefix)
        earlier = np.tril(np.ones((n, prefix), dtype=bool), k=-1)
        hit = (cos >= tau) & earlier
        has = hit.any(axis=1)
        dup_of[has] = ids[np.argmax(hit[has], axis=1)]
        return pd.DataFrame({
            "vec_id": ids,
            "cluster": np.full(n, cluster, dtype=np.int64),
            "keep": dup_of < 0,
            "dup_of": pd.array(np.where(dup_of < 0, None, dup_of),
                               dtype="Int64"),
        })

    return (finish_sorted(clustered.groupby("cluster")
            .map_groups(dedup_group, batch_format="pandas"), "vec_id"))


def embed_pca(sf_dir: str, n_components: int = 4,
              params_out: str | None = None):
    """Distributed PCA over the embedding column — dimensionality
    reduction as two bounded passes, the moment-partial pattern at
    matrix rank:

    - pass 1: each batch emits ONE row of sufficient statistics
      (n, Σx as d floats, Σxxᵀ as d² floats — ~32 KB at d=64,
      independent of batch size); the driver assembles the covariance
      from the summed moments and eigendecomposes a d×d matrix (trivial
      for any d a sane embedding has);
    - pass 2: one stateless projection pass, (x − mean) @ V, with the
      (mean, V) pair broadcast once via ``ray.put``.

    Eigenvector sign is fixed deterministically (largest-|loading|
    coordinate made positive) so output is replay-stable; components are
    ordered by descending eigenvalue. Output: vec_id, pc0..pc{c-1}
    rounded to 6dp.

    ``params_out``: optional parquet path for the fitted (mean,
    components) as per-dimension rows — the eigendecomposition itself is
    a d×d driver-side step, but with the components published, the
    DISTRIBUTED projection is exactly oracle-checkable in SQL
    (pc_j = Σ_i (x_i − mean_i)·comp_ij)."""
    import ray

    ds = _read_emb(sf_dir)

    def moments(t: pa.Table) -> pa.Table:
        m = _to_matrix(t["embedding"])
        return pa.table({
            "n": pa.array([len(m)], pa.int64()),
            "s": pa.array([m.sum(axis=0).tolist()],
                          pa.list_(pa.float64())),
            "ss": pa.array([(m.T @ m).reshape(-1).tolist()],
                           pa.list_(pa.float64())),
        })

    rows = ds.map_batches(moments, batch_format="pyarrow").take_all()
    n = sum(int(r["n"]) for r in rows)
    s = np.sum([np.asarray(r["s"], dtype=np.float64) for r in rows], axis=0)
    d = len(s)
    ss = np.sum([np.asarray(r["ss"], dtype=np.float64) for r in rows],
                axis=0).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)           # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order]                       # (d, c)
    flip = np.sign(comps[np.argmax(np.abs(comps), axis=0),
                         np.arange(comps.shape[1])])
    comps = comps * flip                          # deterministic sign
    if params_out:
        cols = {"dim_idx": pa.array(np.arange(d, dtype=np.int64)),
                "mean": pa.array(mean)}
        for c in range(comps.shape[1]):
            cols[f"c{c}"] = pa.array(comps[:, c])
        _write_params(pa.table(cols), params_out)
    ref = ray.put((mean, comps))

    def project(t: pa.Table) -> pa.Table:
        mean_, comps_ = ray.get(ref)
        m = _to_matrix(t["embedding"])
        proj = np.round((m - mean_) @ comps_, 6)
        cols = {"vec_id": t["vec_id"]}
        for c in range(proj.shape[1]):
            cols[f"pc{c}"] = proj[:, c]
        return pa.table(cols)

    return finish_sorted(ds.map_batches(project, batch_format="pyarrow"), "vec_id")


def embedding_norms(sf_dir: str):
    """Array-column operations over the embedding list column: per-vector
    L2 norm, dimension, and max |component| — one zero-copy numpy
    reshape per batch (fixed-size lists), three vectorized reductions;
    floats rounded to 6dp for oracle-stable comparison."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def norms(df: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame({
            "vec_id": df["vec_id"].to_numpy(),
            "dim": np.full(len(df), m.shape[1], dtype=np.int64),
            "l2_norm": np.round(np.sqrt((m * m).sum(axis=1)), 6),
            "max_abs": np.round(np.abs(m).max(axis=1), 6)})

    return finish_sorted(ds.map_batches(norms, batch_format="pandas"), "vec_id")


def label_centroids(sf_dir: str):
    """Per-label centroid of the embedding column — the VECTOR-VALUED
    GROUPED AGGREGATE (class prototypes / nearest-class-mean; also the
    E-step partial of any EM over labeled vectors). Output long-form
    (label, dim, centroid) so the oracle can re-derive it relationally.

    Plan: pure map-side combiner — each batch reshapes the list column
    to one (n, d) matrix (zero-copy for fixed-size lists), scales to
    EXACT-INTEGER micro-units (floor(x·1e6) on the float64-widened
    values; floor, not round — half-even vs half-away can split engines
    on exact .5 products), and folds per-label sum vectors + counts:
    |labels|·d partial rows per block, never the vectors themselves.
    One single-task final combine (label set is bounded), then the one
    shared IEEE division. At 100 TB nothing but k·d-int partials cross
    the exchange."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["label", "embedding"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"label": np.array([], np.int64),
                                 "dim": np.array([], np.int64),
                                 "s_micro": np.array([], np.int64),
                                 "n": np.array([], np.int64)})
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        micro = np.floor(m * 1e6).astype(np.int64)
        labels = df["label"].to_numpy(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        d = m.shape[1]
        sums = np.zeros((len(uniq), d), dtype=np.int64)
        np.add.at(sums, inv, micro)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pd.DataFrame({
            "label": np.repeat(uniq, d),
            "dim": np.tile(np.arange(d, dtype=np.int64), len(uniq)),
            "s_micro": sums.ravel(),
            "n": np.repeat(counts, d)})

    from cdcsdk_server_ray.stages.aggregate import grouped_aggregate
    totals = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        ["label", "dim"],
        {"s_micro": ("s_micro", "sum"), "n": ("n", "sum")})

    def finalize(t: pd.DataFrame) -> pd.DataFrame:
        t = t.sort_values(["label", "dim"]).reset_index(drop=True)
        return pd.DataFrame({
            "label": t["label"].to_numpy(np.int64),
            "dim": t["dim"].to_numpy(np.int64),
            "centroid": t["s_micro"].to_numpy(np.int64)
            / (t["n"].to_numpy(np.int64) * 1e6)})

    df = totals.to_pandas()
    return finalize(df)


def knn_pq(sf_dir: str, num_queries: int = 5, k: int = 10,
           n_subspaces: int = 4, n_centroids: int = 16,
           train_sample: int = 4096, params_out: str | None = None):
    """Product-quantization ANN (Jégou et al. 2011) — the third index
    family next to LSH and IVF: normalized vectors split into
    ``n_subspaces`` blocks, each block vector-quantized against its own
    ``n_centroids`` codebook (k-means: deterministic seed + two Lloyd
    steps on the bounded unbiased hash sample), the corpus stored as
    tiny codes, and queries answered by ASYMMETRIC DISTANCE (ADC): a
    per-query distance table against every subspace centroid, summed by
    code lookup — O(n·m) lookups per batch instead of O(n·d) multiplies.

    Scale shape: the codebook is sketch-sized and broadcasts
    (``ray.put``); encoding + ADC run vectorized per batch with a
    per-batch top-k prune (smallest ADC), one-task final. Exact-oracled
    via the published codebook sidecar: code assignment (argmin L2, tie
    → lowest cluster), the ADC sum and the top-k are all re-derived
    relationally; the ADC value is rounded 6dp on both engines (same
    insulation as the cos scores of the other ANN paths)."""
    import ray

    ds = _read_emb(sf_dir)
    train_df = _train_sample(ds, train_sample)
    m = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                             for v in train_df["embedding"]]))
    d = m.shape[1]
    assert d % n_subspaces == 0
    sub_d = d // n_subspaces
    books = np.empty((n_subspaces, n_centroids, sub_d), dtype=np.float64)
    for s in range(n_subspaces):
        blk = m[:, s * sub_d:(s + 1) * sub_d]
        cents = blk[:n_centroids].copy()
        for _ in range(2):      # two Lloyd steps, deterministic
            d2 = ((blk[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(n_centroids):
                members = blk[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[s] = cents
    if params_out:
        # (subspace, cluster, dim_idx, c) long-form codebook: encoding,
        # the ADC table and the top-k are all SQL-re-derivable from it
        _write_params(pa.table({
            "subspace": pa.array(np.repeat(
                np.arange(n_subspaces, dtype=np.int64),
                n_centroids * sub_d)),
            "cluster": pa.array(np.tile(np.repeat(
                np.arange(n_centroids, dtype=np.int64), sub_d),
                n_subspaces)),
            "dim_idx": pa.array(np.tile(np.arange(sub_d, dtype=np.int64),
                                        n_subspaces * n_centroids)),
            "c": pa.array(books.reshape(-1))}), params_out)

    qdf = _read_queries(sf_dir, num_queries)
    qm = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                              for v in qdf["embedding"]]))
    qids = qdf["vec_id"].to_numpy()
    # per-query ADC tables dt[q, s, c] = ||q_s - cent_sc||^2, QUANTIZED
    # to integer nano-units: the ADC sum is then exact-integer and
    # order-free on BOTH engines (a 4-term float sum's last ulp depends
    # on summation order, which SQL does not pin) — published alongside
    # the codebook so the oracle sums the identical integers
    dt = np.empty((len(qids), n_subspaces, n_centroids), dtype=np.float64)
    for s in range(n_subspaces):
        qs = qm[:, s * sub_d:(s + 1) * sub_d]
        dt[:, s, :] = ((qs[:, None, :] - books[s][None, :, :]) ** 2) \
            .sum(axis=2)
    dt_int = np.floor(dt * 1e9).astype(np.int64)
    if params_out:
        nq = len(qids)
        _write_params(pa.table({
            "query_id": pa.array(np.repeat(qids.astype(np.int64),
                                           n_subspaces * n_centroids)),
            "subspace": pa.array(np.tile(np.repeat(
                np.arange(n_subspaces, dtype=np.int64), n_centroids), nq)),
            "cluster": pa.array(np.tile(
                np.arange(n_centroids, dtype=np.int64), nq * n_subspaces)),
            "d9": pa.array(dt_int.reshape(-1))}),
            params_out.replace(".parquet", "_qdt.parquet"))
    ref = ray.put((qids, books, dt_int))

    def score(t: pa.Table) -> pa.Table:
        qids_, books_, dt_ = ray.get(ref)
        mb = _normalize(_to_matrix(t["embedding"]))
        vec_ids = t["vec_id"].to_numpy()
        ns, nc = books_.shape[0], books_.shape[1]
        sd = books_.shape[2]
        codes = np.empty((len(vec_ids), ns), dtype=np.int64)
        for s in range(ns):
            blk = mb[:, s * sd:(s + 1) * sd]
            d2 = ((blk[:, None, :] - books_[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(d2, axis=1)     # tie → lowest cluster
        out_q, out_v, out_a = [], [], []
        for qi in range(len(qids_)):
            # ADC: exact-integer sum of the query's quantized table at
            # each vector's codes — order-free, bit-identical to the
            # oracle's sum over the published d9 rows
            adc9 = np.zeros(len(vec_ids), dtype=np.int64)
            for s in range(ns):
                adc9 += dt_[qi, s, codes[:, s]]
            kk = min(k, adc9.size)
            if kk == 0:
                continue
            idx = np.argpartition(adc9, kk - 1)[:kk]
            out_q.append(np.full(kk, qids_[qi], dtype=np.int64))
            out_v.append(vec_ids[idx])
            out_a.append(adc9[idx])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "adc9": pa.array([], pa.int64())})
        return pa.table({"query_id": np.concatenate(out_q),
                         "vec_id": np.concatenate(out_v),
                         "adc9": np.concatenate(out_a)})

    partial = ds.map_batches(score, batch_format="pyarrow")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.sort_values(["query_id", "adc9", "vec_id"],
                             ascending=[True, True, True])
              .groupby("query_id", sort=False).head(k))
        df = df.reindex(columns=["query_id", "vec_id", "adc9"]) \
            .reset_index(drop=True)
        # one shared IEEE division back to distance units
        df["adc"] = df["adc9"].to_numpy(np.int64) / 1e9
        return df[["query_id", "vec_id", "adc"]]

    return partial.repartition(1).map_batches(
        fin, batch_format="pandas", batch_size=None)


def emb_decontaminate(sf_dir: str, num_bench: int = 20,
                      threshold: float = 0.35):
    """SEMANTIC decontamination: flag corpus vectors whose cosine to ANY
    benchmark vector exceeds the threshold — the embedding-space
    counterpart of the n-gram :func:`pipelines.text.decontaminate`
    (paraphrased eval contamination that token overlap misses). The
    benchmark set here is the label-0..? first ``num_bench`` vectors
    (standing in for an eval suite's embeddings).

    Plan: the benchmark matrix is benchmark-sized by definition →
    broadcast once (``ray.put``); every corpus batch computes one
    (batch × bench) matmul and keeps its max-cos + argmax — map-only,
    zero exchange, the knn_bruteforce shape with a max instead of a
    top-k. Output: every CONTAMINATED corpus vector with its closest
    benchmark id and the cosine (rounded 6dp, the ANN-family
    float-insulation convention)."""
    import ray

    bench = _read_queries(sf_dir, num_bench)
    bm = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                              for v in bench["embedding"]]))
    bids = bench["vec_id"].to_numpy(np.int64)
    ref = ray.put((bids, bm))

    def scan(t: pa.Table) -> pa.Table:
        bids_, bm_ = ray.get(ref)
        mb = _normalize(_to_matrix(t["embedding"]))
        vec_ids = t["vec_id"].to_numpy()
        # exclude the benchmark rows themselves from the corpus side
        keep = ~np.isin(vec_ids, bids_)
        mb, vec_ids = mb[keep], vec_ids[keep]
        if not len(vec_ids):
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "bench_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        cos = mb @ bm_.T
        best = np.argmax(cos, axis=1)
        best_cos = cos[np.arange(len(vec_ids)), best]
        m = best_cos > threshold
        return pa.table({"vec_id": vec_ids[m].astype(np.int64),
                         "bench_id": bids_[best[m]].astype(np.int64),
                         "cos": np.round(best_cos[m], 6)})

    out = _read_emb(sf_dir).map_batches(scan, batch_format="pyarrow")
    df = out.to_pandas()
    if df.empty:        # schema is lost through an all-empty fetch
        return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                             "bench_id": pd.Series([], dtype="int64"),
                             "cos": pd.Series([], dtype="float64")})
    return df.sort_values("vec_id").reset_index(drop=True)
