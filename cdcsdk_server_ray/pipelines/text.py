"""Text-analysis operators over ``documents`` (training-data pipeline set):
token counting, quality scoring, language ID, document fingerprinting.

Vectorized pyarrow/pandas kernels; regexes and stopword tables compiled
once per actor where stateful.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cdcsdk_server_ray.stages.worker_cache import worker_cached
from cdcsdk_server_ray.stages.finish import finish_sorted


def _read_docs(sf_dir: str, columns=None):
    import ray.data
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def token_counts(sf_dir: str):
    """Whitespace tokens + char length per doc — pyarrow kernels only.
    Token rule matches the oracle: len(regexp_split(trim(text), '\\s+'))."""
    docs = _read_docs(sf_dir, columns=["doc_id", "text"])

    # BPE-style pre-tokenizer classes (letters / digits / punctuation runs)
    # — RE2 syntax, identical semantics in pyarrow and DuckDB
    BPE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

    def count(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t["text"])
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
            "n_bpe_tokens": pc.cast(
                pc.count_substring_regex(t["text"], BPE), pa.int64()),
            "n_chars_calc": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
        })

    return finish_sorted(docs.map_batches(count, batch_format="pyarrow"), "doc_id")


def quality_scores(sf_dir: str):
    """Heuristic quality features (rounded for oracle-stable floats):
    punctuation ratio, digit ratio, mean token length."""
    docs = _read_docs(sf_dir, columns=["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        text = t["text"]
        n_chars = pc.cast(pc.utf8_length(text), pa.float64())
        n_punct = pc.cast(pc.count_substring_regex(text, r"[.,;:!?]"), pa.float64())
        n_digit = pc.cast(pc.count_substring_regex(text, r"[0-9]"), pa.float64())
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), pattern=r"\s+")
        n_tokens = pc.cast(pc.list_value_length(toks), pa.float64())
        nonspace = pc.cast(pc.utf8_length(
            pc.replace_substring_regex(text, pattern=r"\s", replacement="")),
            pa.float64())
        mean_tok_len = pc.round(pc.divide(nonspace, n_tokens), 6)
        return pa.table({
            "doc_id": t["doc_id"],
            "punct_ratio": pc.round(pc.divide(n_punct, n_chars), 6),
            "digit_ratio": pc.round(pc.divide(n_digit, n_chars), 6),
            "mean_token_len": mean_tok_len,
        })

    return finish_sorted(docs.map_batches(score, batch_format="pyarrow"), "doc_id")


class LangId:
    """Stopword-profile language ID (n-gram-free heuristic): actor-pool
    stage, profiles built once per actor. STUB-grade model — deterministic,
    no external deps; the plumbing (actor pool, batch shape) is the real
    part, as with any model-scoring stage at scale."""

    PROFILES = {
        "en": {"the", "and", "of", "to", "a", "in", "is", "it", "for", "on"},
        "es": {"el", "la", "de", "que", "y", "en", "un", "los", "se", "no"},
        "de": {"der", "die", "und", "das", "in", "zu", "den", "mit", "von", "ist"},
        "fr": {"le", "la", "de", "et", "les", "des", "en", "un", "du", "que"},
    }

    def __init__(self):
        import re
        self.tok = re.compile(r"[a-zA-Z]+")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        preds, scores = [], []
        for text in df["text"]:
            toks = [w.lower() for w in self.tok.findall(text)][:200]
            best, best_s = "unknown", 0.0
            for lang, stops in self.PROFILES.items():
                s = sum(t in stops for t in toks) / max(1, len(toks))
                if s > best_s:
                    best, best_s = lang, s
            preds.append(best)
            scores.append(round(best_s, 6))
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "pred_lang": preds, "confidence": scores})


def language_id(sf_dir: str):
    docs = _read_docs(sf_dir, columns=["doc_id", "text"])
    return finish_sorted(docs.map_batches(worker_cached(LangId), batch_format="pandas",
                            batch_size=512), "doc_id")


class Fingerprinter:
    """Winnowed rolling-hash document fingerprint (MOSS-style): k-gram
    hashes → min hash per window → distinct fingerprint count → one
    XOR-folded 64-bit document fingerprint. State (window/k, gram
    cache) fixed per actor.

    Gram hash = md5 lower-64 of the k-byte window (DuckDB's
    ``md5_number_lower`` convention, like SimHash/pHash) — the whole
    winnowing pipeline is therefore exactly SQL-re-derivable at the
    driver's oracle gate (window-min via a frame'd min() OVER, XOR fold
    via bit_xor)."""

    _CACHE_CAP = 1_000_000

    def __init__(self, k: int = 8, window: int = 4):
        self.k, self.window = k, window
        self._cache: dict[bytes, int] = {}

    def _hash_grams(self, grams: list[bytes]) -> np.ndarray:
        import hashlib
        c = self._cache
        if len(c) > self._CACHE_CAP:
            c.clear()
        out = np.empty(len(grams), dtype=np.uint64)
        for i, g in enumerate(grams):
            v = c.get(g)
            if v is None:
                v = int.from_bytes(hashlib.md5(g).digest()[8:], "little")
                c[g] = v
            out[i] = v
        return out

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out_id, out_fp, out_n = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            b = text.encode("utf-8", "ignore")
            if len(b) < self.k:
                b = b + b"\x00" * (self.k - len(b))
            h = self._hash_grams([b[i:i + self.k]
                                  for i in range(len(b) - self.k + 1)])
            if len(h) >= self.window:
                mins = np.lib.stride_tricks.sliding_window_view(
                    h, self.window).min(axis=1)
            else:
                mins = h
            fps = np.unique(mins)
            with np.errstate(over="ignore"):
                doc_fp = np.bitwise_xor.reduce(
                    fps * np.uint64(0x9E3779B97F4A7C15))
            out_id.append(doc_id)
            out_fp.append(np.int64(doc_fp.astype(np.int64)))
            out_n.append(len(fps))
        return pd.DataFrame({"doc_id": out_id, "fingerprint": out_fp,
                             "n_distinct_grams": out_n})


def fingerprints(sf_dir: str):
    docs = _read_docs(sf_dir, columns=["doc_id", "text"])
    return finish_sorted(docs.map_batches(worker_cached(Fingerprinter),
                            batch_format="pandas",
                            batch_size=512), "doc_id")


def quality_filter(sf_dir: str, max_punct_ratio: float = 0.05,
                   min_tokens: int = 20):
    """Quality FILTERING (the keep/drop decision a training-data pipeline
    actually makes): keep documents under a punctuation-ratio bound and
    over a token-count floor. Vectorized predicate inside map_batches."""
    return finish_sorted(
        _quality_filter_unsorted(sf_dir, max_punct_ratio, min_tokens),
        "doc_id")


def _quality_filter_unsorted(sf_dir: str, max_punct_ratio: float = 0.05,
                             min_tokens: int = 20):
    """``quality_filter`` without the presentation sort — for internal
    consumers (corpus_prep's membership join) that re-exchange the keep
    rows anyway."""
    docs = _read_docs(sf_dir, columns=["doc_id", "text", "lang", "n_chars"])

    def keep(t: pa.Table) -> pa.Table:
        text = t["text"]
        n_chars = pc.cast(pc.utf8_length(text), pa.float64())
        n_punct = pc.cast(pc.count_substring_regex(text, r"[.,;:!?]"), pa.float64())
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), pattern=r"\s+")
        n_tokens = pc.list_value_length(toks)
        mask = pc.and_(pc.less_equal(pc.divide(n_punct, n_chars),
                                     max_punct_ratio),
                       pc.greater_equal(n_tokens, min_tokens))
        return t.filter(mask).select(["doc_id", "lang", "n_chars"])

    return docs.map_batches(keep, batch_format="pyarrow")


def sample_documents(sf_dir: str, permille: int = 100):
    """Deterministic hash sampling (the reproducible alternative to
    ds.random_sample): keep docs where Knuth-hash(doc_id) mod 1000 <
    permille. Identical arithmetic is SQL-expressible, so the sample is
    oracle-checked — and stable across partitioning, resume, and replays
    (seeded random_sample is none of those)."""
    docs = _read_docs(sf_dir, columns=["doc_id", "lang", "n_chars"])

    def keep(t: pa.Table) -> pa.Table:
        # checked multiply: int64 overflow (doc_id ≳ 3.5e9) must fail
        # loudly like the DuckDB oracle does, not wrap into a skewed
        # sample
        h = pc.multiply_checked(t["doc_id"], 2654435761)
        bucket = pc.subtract(h, pc.multiply(pc.divide(h, 1000), 1000))
        return t.filter(pc.less(bucket, permille))

    return finish_sorted(docs.map_batches(keep, batch_format="pyarrow"), "doc_id")


def tfidf(sf_dir: str, min_tf: int = 3, num_buckets: int = 64):
    """TF-IDF term scoring (the inverted-index statistic behind BM25-style
    corpus filtering/ranking). Two stages, both scale-safe:

    1. per-batch term-frequency rows — each document lives wholly in one
       batch, so (doc_id, term, tf) is complete (and globally unique)
       after one vectorized explode+groupby per batch; no combiner needed.
    2. document frequency + score per TERM-HASH BUCKET: a bare
       ``groupby(term)`` would pay one Python group per vocabulary word
       (the measured 171-s pathology, see dedup.py); instead terms hash
       into ``num_buckets`` groups and each group computes df for ALL its
       terms with one vectorized ``transform('size')`` — so the exchange
       and the Python overhead are O(buckets), not O(vocabulary).

    ``tf >= min_tf`` bounds the output (applied AFTER df so document
    frequency counts every occurrence). Score = tf * ln(N/df), rounded to
    6dp on both sides (repo float policy): numpy's SIMD log and libm's
    can differ at the last ulp, and the driver hashes exact values — a
    6dp round is tie-free here because the ln factor is irrational
    except at df == N, where the score is exactly 0."""
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    docs = _read_docs(sf_dir, columns=["doc_id", "text"])

    def term_counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = (df["text"].str.lower().str.strip()
                .str.split(r"\s+", regex=True))
        lens = toks.str.len().to_numpy(np.int64)
        flat = pd.DataFrame({
            "doc_id": np.repeat(df["doc_id"].to_numpy(np.int64), lens),
            "term": np.concatenate(toks.to_numpy()),
        })
        tf = (flat.groupby(["doc_id", "term"], sort=False)
              .size().reset_index(name="tf"))
        tf["tf"] = tf["tf"].astype("int64")
        tf["__tb"] = (pd.util.hash_pandas_object(tf["term"], index=False)
                      .to_numpy(np.uint64) % np.uint64(num_buckets)
                      ).astype(np.int32)
        return tf

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        df_count = (g.groupby("term", sort=False)["doc_id"]
                    .transform("size").astype("int64"))
        g = g.assign(df=df_count)
        g = g[g["tf"] >= min_tf]
        score = np.round(g["tf"].to_numpy(np.float64) * np.log(
            float(n_docs) / g["df"].to_numpy(np.float64)), 6)
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                             "term": g["term"].to_numpy(),
                             "tf": g["tf"].to_numpy(np.int64),
                             "df": g["df"].to_numpy(np.int64),
                             "tfidf": score})

    return (finish_sorted(docs.map_batches(term_counts, batch_format="pandas")
            .groupby("__tb")
            .map_groups(score_bucket, batch_format="pandas"), ["doc_id", "term"]))


def bm25(sf_dir: str, min_tf: int = 3, num_buckets: int = 64,
         k1: float = 1.2, b: float = 0.75):
    """Okapi BM25 term scoring (Robertson & Walker; the Lucene "plus-1"
    idf variant, always positive) — the ranking twin of :func:`tfidf`
    and the statistic behind BM25-based corpus filtering.

    Same two-stage scale shape as tfidf (whole-doc batches → per-batch
    (doc_id, term, tf); term-HASH-BUCKET df so the exchange and Python
    overhead stay O(buckets), not O(vocabulary)), plus the two BM25
    extras, each computed without a second text read:

    - per-doc length ``dl`` is the batch-local token count (already in
      hand from the tokenizer) merged onto the tf rows for free;
    - ``avgdl`` needs a corpus total, so the tf rows are materialized
      (they are the fork point — the scoring groupby re-exchanges them
      all anyway) and total tokens is recovered as Σ tf over ALL rows
      (Σ_{doc,term} tf ≡ Σ_doc dl), a per-block partial that is immune
      to blocks re-slicing doc rows across batches. One take_all over
      per-block count rows is the barrier (repo rule: never
      repartition(1)/sum() for tiny rows).

    Score = ln((N - df + 0.5)/(df + 0.5) + 1) * tf·(k1+1) /
    (tf + k1·(1 - b + b·dl/avgdl)), rounded to 6dp on both sides (repo
    float policy — only ln differs at the last ulp between numpy and
    libm; every other op is identically-ordered IEEE double)."""
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    docs = _read_docs(sf_dir, columns=["doc_id", "text"])

    def term_counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = (df["text"].str.lower().str.strip()
                .str.split(r"\s+", regex=True))
        lens = toks.str.len().to_numpy(np.int64)
        doc_ids = df["doc_id"].to_numpy(np.int64)
        flat = pd.DataFrame({
            "doc_id": np.repeat(doc_ids, lens),
            "term": np.concatenate(toks.to_numpy()),
        })
        tf = (flat.groupby(["doc_id", "term"], sort=False)
              .size().reset_index(name="tf"))
        tf["tf"] = tf["tf"].astype("int64")
        tf = tf.merge(pd.DataFrame({"doc_id": doc_ids, "dl": lens}),
                      on="doc_id", copy=False)
        tf["__tb"] = (pd.util.hash_pandas_object(tf["term"], index=False)
                      .to_numpy(np.uint64) % np.uint64(num_buckets)
                      ).astype(np.int32)
        return tf

    tf_ds = docs.map_batches(term_counts, batch_format="pandas").materialize()

    def token_partial(d: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"s": [int(d["tf"].sum())]})

    total_tokens = sum(r["s"] for r in tf_ds.map_batches(
        token_partial, batch_format="pandas", batch_size=None).take_all())
    avgdl = float(total_tokens) / float(n_docs)

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        df_count = (g.groupby("term", sort=False)["doc_id"]
                    .transform("size").astype("int64"))
        g = g.assign(df=df_count)
        g = g[g["tf"] >= min_tf]
        tf_f = g["tf"].to_numpy(np.float64)
        df_f = g["df"].to_numpy(np.float64)
        dl_f = g["dl"].to_numpy(np.float64)
        idf = np.log((float(n_docs) - df_f + 0.5) / (df_f + 0.5) + 1.0)
        score = np.round(
            idf * (tf_f * (k1 + 1.0)
                   / (tf_f + k1 * (1.0 - b + b * dl_f / avgdl))), 6)
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                             "term": g["term"].to_numpy(),
                             "tf": g["tf"].to_numpy(np.int64),
                             "df": g["df"].to_numpy(np.int64),
                             "dl": g["dl"].to_numpy(np.int64),
                             "bm25": score})

    return finish_sorted(tf_ds.groupby("__tb")
                         .map_groups(score_bucket, batch_format="pandas"),
                         ["doc_id", "term"])


_SEARCH_TERMS = ("merge", "stream", "window")


def bm25_search(sf_dir: str, terms=_SEARCH_TERMS, k: int = 100,
                k1: float = 1.2, b: float = 0.75):
    """BM25 retrieval: rank documents for a fixed keyword query (sum of
    per-term Okapi BM25 contributions), return the exact top-``k``.

    Scale shape — ONE text scan, no vocabulary exchange (the query terms
    are known up front, so unlike :func:`bm25` nothing per-term ever
    shuffles):

    1. tagged scan pass (repo fork rule): each batch emits its candidate
       (doc_id, term, tf, dl) rows for query terms only, PLUS one tag-0
       partial row carrying the batch's total token count — both needed
       downstream, so they ride one materialized pass instead of two
       text reads.
    2. driver folds the tiny partials (take_all over per-block combiner
       rows) into df-per-query-term and avgdl, then broadcasts the
       per-term idf table into the scorer closure.
    3. scoring + per-doc sum is batch-local (docs stay whole per block
       through the materialize; batch_size=None keeps blocks intact),
       followed by a per-batch top-k prune, so ≤ k rows per block reach
       the one-task final — the knn ``_topk_finish`` shape.

    Per-term contributions are quantized to integer micro-BM25
    (round(x·1e6) as int64) BEFORE the per-doc sum: integer addition is
    order-free, so the Ray sum and the DuckDB sum agree bit-for-bit —
    the repo's fixed-point-before-accumulate float policy. Ties break
    on doc_id ascending in both engines."""
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    docs = _read_docs(sf_dir, columns=["doc_id", "text"])
    term_set = frozenset(terms)
    _COLS = ["doc_id", "term", "tf", "dl", "tag"]

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "term": pd.Series([], dtype=object),
                                 "tf": pd.Series([], dtype="int64"),
                                 "dl": pd.Series([], dtype="int64"),
                                 "tag": pd.Series([], dtype="int64")})
        toks = (df["text"].str.lower().str.strip()
                .str.split(r"\s+", regex=True))
        lens = toks.str.len().to_numpy(np.int64)
        doc_ids = df["doc_id"].to_numpy(np.int64)
        flat = pd.DataFrame({
            "doc_id": np.repeat(doc_ids, lens),
            "term": np.concatenate(toks.to_numpy()),
        })
        sub = flat[flat["term"].isin(term_set)]
        tf = (sub.groupby(["doc_id", "term"], sort=False)
              .size().reset_index(name="tf"))
        tf["tf"] = tf["tf"].astype("int64")
        tf = tf.merge(pd.DataFrame({"doc_id": doc_ids, "dl": lens}),
                      on="doc_id", copy=False)
        tf["tag"] = np.int64(1)
        partial = pd.DataFrame({"doc_id": [np.int64(-1)], "term": [""],
                                "tf": [int(lens.sum())],
                                "dl": [np.int64(0)], "tag": [np.int64(0)]})
        return pd.concat([tf[_COLS], partial], ignore_index=True)

    tagged = docs.map_batches(scan, batch_format="pandas").materialize()

    def stats_partial(d: pd.DataFrame) -> pd.DataFrame:
        tot = int(d.loc[d["tag"] == 0, "tf"].sum())
        dfc = (d[d["tag"] == 1].groupby("term", sort=False)["doc_id"]
               .size())
        return pd.DataFrame({"term": [""] + list(dfc.index),
                             "cnt": [tot] + [int(v) for v in dfc.values]})

    folded: dict[str, int] = {}
    for r in tagged.map_batches(stats_partial, batch_format="pandas",
                                batch_size=None).take_all():
        folded[r["term"]] = folded.get(r["term"], 0) + int(r["cnt"])
    avgdl = float(folded.pop("", 0)) / float(n_docs)
    idf_map = {t: float(np.log((float(n_docs) - c + 0.5) / (c + 0.5) + 1.0))
               for t, c in folded.items()}

    def score(d: pd.DataFrame) -> pd.DataFrame:
        d = d[d["tag"] == 1]
        if not len(d):
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "score_micro": pd.Series([], dtype="int64")})
        idf_v = d["term"].map(idf_map).to_numpy(np.float64)
        tf_f = d["tf"].to_numpy(np.float64)
        dl_f = d["dl"].to_numpy(np.float64)
        contrib = np.round(
            idf_v * (tf_f * (k1 + 1.0)
                     / (tf_f + k1 * (1.0 - b + b * dl_f / avgdl)))
            * 1e6).astype(np.int64)
        g = (d.assign(score_micro=contrib)
             .groupby("doc_id", sort=False)["score_micro"].sum()
             .reset_index())
        g = g.sort_values(["score_micro", "doc_id"],
                          ascending=[False, True]).head(k)
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                             "score_micro":
                                 g["score_micro"].to_numpy(np.int64)})

    partial = tagged.map_batches(score, batch_format="pandas",
                                 batch_size=None)

    def topk(d: pd.DataFrame) -> pd.DataFrame:
        d = (d.sort_values(["score_micro", "doc_id"],
                           ascending=[False, True]).head(k)
             .reset_index(drop=True))
        return d.reindex(columns=["doc_id", "score_micro"])

    return partial.repartition(1).map_batches(
        topk, batch_format="pandas", batch_size=None)


_NGRAM_KEY1 = "cdcsdk-ngramkey1"   # 16 bytes, pinned (pandas siphash keys)
_NGRAM_KEY2 = "cdcsdk-ngramkey2"
_NGRAM_C1 = np.uint64(0x9E3779B97F4A7C15)
_NGRAM_C2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _doc_ngrams(df: pd.DataFrame, n: int):
    """Exploded word ``n``-grams for a batch: returns ``(row_idx, h1,
    h2, gram_chars)`` numpy arrays with one entry per n-gram
    OCCURRENCE, where (h1, h2) is a 128-bit hash of the gram's token
    sequence and ``gram_chars`` is the joined gram's char length
    (Σ token lens + n-1 separators). Callers dedupe if they need sets —
    all in-repo consumers compare grams for EQUALITY only, so they
    operate on the hash pair (equal sequences hash equal, distinct
    ones collide at ~2^-128); the one consumer needing gram TEXT mass
    (repetition_stats) uses ``gram_chars``. Gram strings are never
    built: each token is hashed once per key, then n consecutive token
    hashes combine via two independent polynomial rolls — the n-1
    python-string concatenations this replaces were the dominant cost
    of the decontaminate scan. Vectorized shift-join on the exploded
    token array with a doc-boundary mask — an n-gram starting at i is
    valid iff position i+n-1 still belongs to the same doc. Docs with
    < n tokens contribute nothing. Tokenization (trim + split on \\s+)
    matches the DuckDB oracles byte-for-byte."""
    z = np.array([], np.uint64)
    empty = (np.array([], np.int64), z, z, np.array([], np.int64))
    if not len(df):
        return empty
    toks = df["text"].str.strip().str.split(r"\s+", regex=True)
    lens = toks.str.len().to_numpy(np.int64)
    flat = np.concatenate(toks.to_numpy())
    m = len(flat) - (n - 1)
    if m <= 0:
        return empty
    doc_idx = np.repeat(np.arange(len(df), dtype=np.int64), lens)
    mask = doc_idx[:m] == doc_idx[n - 1:]
    fs = pd.Series(flat)
    th1 = pd.util.hash_pandas_object(fs, index=False,
                                     hash_key=_NGRAM_KEY1).to_numpy()
    th2 = pd.util.hash_pandas_object(fs, index=False,
                                     hash_key=_NGRAM_KEY2).to_numpy()
    h1 = np.zeros(m, np.uint64)
    h2 = np.zeros(m, np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            h1 *= _NGRAM_C1
            h1 += th1[j:m + j]
            h2 *= _NGRAM_C2
            h2 += th2[j:m + j]
    cs = np.zeros(len(flat) + 1, np.int64)
    np.cumsum(fs.str.len().to_numpy(np.int64), out=cs[1:])
    glen = cs[n:m + n] - cs[:m] + (n - 1)
    return doc_idx[:m][mask], h1[mask], h2[mask], glen[mask]


def dup_ngram_stats(sf_dir: str):
    """Within-document repetition signal (the C4/Gopher "duplicated
    n-gram fraction" quality filter): per doc, total word trigrams,
    distinct trigrams, and the duplicated fraction. Embarrassingly
    parallel — one vectorized kernel per batch, no shuffle (see
    ``_doc_ngrams``). Docs with <3 tokens emit no row (they have no
    trigram), matching the SQL oracle's inner shape."""
    docs = _read_docs(sf_dir, columns=["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        idx, h1, h2, _ = _doc_ngrams(df, 3)
        if not len(idx):
            return pd.DataFrame({"doc_id": np.array([], np.int64),
                                 "n_ngrams": np.array([], np.int64),
                                 "n_distinct": np.array([], np.int64),
                                 "dup_ratio": np.array([], np.float64)})
        gd = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64)[idx],
                           "h1": h1, "h2": h2})
        agg = gd.groupby("doc_id", sort=False).agg(
            n_ngrams=("h1", "size")).reset_index()
        # distinct over the FULL 128-bit pair (not nunique of one u64):
        # a single-column collision would falsify the exact oracle count
        dist = (gd.drop_duplicates()
                .groupby("doc_id", sort=False).size()
                .rename("n_distinct").reset_index())
        agg = agg.merge(dist, on="doc_id", how="left")
        agg["n_ngrams"] = agg["n_ngrams"].astype("int64")
        agg["n_distinct"] = agg["n_distinct"].astype("int64")
        agg["dup_ratio"] = 1.0 - (agg["n_distinct"].to_numpy(np.float64)
                                  / agg["n_ngrams"].to_numpy(np.float64))
        return agg

    return finish_sorted(docs.map_batches(stats, batch_format="pandas"), "doc_id")


def cap_per_source(sf_dir: str, k: int = 50):
    """Per-domain quota sampling (cap documents per source — the web-crawl
    balance step): keep the ``k`` lowest doc_ids per source. Combiner
    prune per batch (≤ k rows per source leave each block), then one tiny
    final ranking task — no per-row shuffle, same plan shape as
    ``analytics.top_orders_per_segment``."""
    docs = _read_docs(sf_dir, columns=["doc_id", "source", "n_chars"])
    _COLS = ["source", "src_rank", "doc_id", "n_chars"]

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values("doc_id")
                .groupby("source", sort=False).head(k)
                .reindex(columns=["doc_id", "source", "n_chars"]))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id").groupby("source", sort=False).head(k)
        df = df.assign(src_rank=(df.groupby("source", sort=False).cumcount()
                                 + 1).astype("int64"))
        return df.sort_values(["source", "src_rank"]).reindex(columns=_COLS)

    return (docs.map_batches(prune, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


def train_test_split(sf_dir: str, test_permille: int = 100,
                     val_permille: int = 50):
    """Deterministic train/val/test assignment (the reproducible split a
    training pipeline needs): salt-shifted Knuth hash of doc_id mod 1000
    buckets docs into test / val / train. Pure pyarrow kernel per batch,
    no shuffle, stable across partitioning and resume — and the salt
    (104729) decorrelates it from ``sample_documents``'s hash so sampling
    then splitting doesn't bias either. SQL-expressible, oracle-checked."""
    docs = _read_docs(sf_dir, columns=["doc_id", "lang", "n_chars"])
    cut_test, cut_val = test_permille, test_permille + val_permille

    def assign(t: pa.Table) -> pa.Table:
        # checked ops: overflow (doc_id ≳ 3.5e9) fails loudly like the
        # SQL oracle instead of wrapping docs into the wrong split
        h = pc.multiply_checked(pc.add_checked(t["doc_id"], 104729),
                                2654435761)
        bucket = pc.subtract(h, pc.multiply(pc.divide(h, 1000), 1000))
        split = pc.if_else(
            pc.less(bucket, cut_test), pa.scalar("test"),
            pc.if_else(pc.less(bucket, cut_val), pa.scalar("val"),
                       pa.scalar("train")))
        return t.append_column("split", split)

    return finish_sorted(docs.map_batches(assign, batch_format="pyarrow"), "doc_id")


def word_topk(sf_dir: str, k: int = 50, num_buckets: int = 32):
    """Corpus vocabulary head (the Zipf top-k behind tokenizer-vocab and
    stopword-table construction). Three stages, all bounded:

    1. per-batch partial counts — one vectorized explode + value_counts
       per batch, so each block leaves at most |batch vocabulary| rows;
    2. per word-hash bucket, ONE vectorized sum + top-k prune (a word
       lives wholly in one bucket, so per-bucket sums are final totals
       and the global top-k is a subset of the union of per-bucket
       top-k) — the exchange carries partial counts, never tokens, and
       Python overhead is O(buckets), not O(vocabulary);
    3. a one-task final over ≤ k × num_buckets rows.

    Ties at the k boundary break by word ascending on both sides."""
    docs = _read_docs(sf_dir, columns=["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"word": np.array([], object),
                                 "n": np.array([], np.int64),
                                 "__wb": np.array([], np.int32)})
        toks = (df["text"].str.lower().str.strip()
                .str.split(r"\s+", regex=True))
        vc = pd.Series(np.concatenate(toks.to_numpy())).value_counts()
        out = pd.DataFrame({"word": vc.index.to_numpy(),
                            "n": vc.to_numpy(np.int64)})
        out["__wb"] = (pd.util.hash_pandas_object(out["word"], index=False)
                       .to_numpy(np.uint64) % np.uint64(num_buckets)
                       ).astype(np.int32)
        return out

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("word", sort=False)["n"].sum().reset_index()
        s["n"] = s["n"].astype("int64")
        return (s.sort_values(["n", "word"], ascending=[False, True])
                .head(k).reindex(columns=["word", "n"]))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["n", "word"], ascending=[False, True])
                .head(k).reset_index(drop=True))

    return (docs.map_batches(partial, batch_format="pandas")
            .groupby("__wb")
            .map_groups(bucket_topk, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


def bpe_pair_counts(sf_dir: str, k: int = 50, num_buckets: int = 32):
    """Adjacent-token pair counts — the inner step of BPE tokenizer
    training (count every adjacent symbol pair across the corpus, merge
    the most frequent). One merge round over word-level symbols, top-``k``
    pairs reported.

    Same three-stage bounded shape as :func:`word_topk` (the pair
    vocabulary is Zipf-distributed just like the unigram one):

    1. per-batch partials — tokens of ALL docs in the batch concatenate
       into one flat array, adjacent pairs form by two shifted views with
       the doc-boundary positions masked out (never a per-doc Python
       loop), then one ``value_counts``;
    2. per pair-hash bucket, ONE vectorized sum + top-k prune (a pair
       lives wholly in one bucket → per-bucket sums are final totals and
       the global top-k ⊆ union of per-bucket top-k). The exchange
       carries (pair, partial-count) rows — at most |batch pair
       vocabulary| per block, never the token stream;
    3. a one-task final over ≤ k × num_buckets rows.

    A full BPE train iterates this with a merge-apply map_batches pass
    between rounds; the counting exchange here is the part that touches
    corpus-scale data. Ties break by pair ascending on both engines."""
    docs = _read_docs(sf_dir, columns=["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"pair": np.array([], object),
                                 "n": np.array([], np.int64),
                                 "__pb": np.array([], np.int32)})
        toks = (df["text"].str.lower().str.strip()
                .str.split(r"\s+", regex=True))
        lens = toks.str.len().to_numpy(np.int64)
        flat = np.concatenate(toks.to_numpy())
        if len(flat) < 2:
            return pd.DataFrame({"pair": np.array([], object),
                                 "n": np.array([], np.int64),
                                 "__pb": np.array([], np.int32)})
        # position i pairs with i+1 unless i is the last token of a doc
        keep = np.ones(len(flat) - 1, dtype=bool)
        ends = np.cumsum(lens)[:-1]  # first token index of docs 1..N-1
        keep[ends - 1] = False
        left = pd.Series(flat[:-1][keep], dtype=object)
        right = pd.Series(flat[1:][keep], dtype=object)
        vc = left.str.cat(right, sep=" ").value_counts()
        out = pd.DataFrame({"pair": vc.index.to_numpy(),
                            "n": vc.to_numpy(np.int64)})
        out["__pb"] = (pd.util.hash_pandas_object(out["pair"], index=False)
                       .to_numpy(np.uint64) % np.uint64(num_buckets)
                       ).astype(np.int32)
        return out

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("pair", sort=False)["n"].sum().reset_index()
        s["n"] = s["n"].astype("int64")
        return (s.sort_values(["n", "pair"], ascending=[False, True])
                .head(k).reindex(columns=["pair", "n"]))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["n", "pair"], ascending=[False, True])
                .head(k).reset_index(drop=True))

    return (docs.map_batches(partial, batch_format="pandas")
            .groupby("__pb")
            .map_groups(bucket_topk, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


def decontaminate(sf_dir: str, n: int = 5, bench_mod: int = 97):
    """Benchmark decontamination (the GPT-3/PaLM eval-overlap check):
    per corpus doc, how many of its distinct word ``n``-grams appear in
    the benchmark set, and a contaminated flag. Docs with
    ``doc_id % bench_mod == 0`` stand in for the eval suite (they flag
    themselves — the degenerate case a real run also has to handle).

    Scale shape: the benchmark side is SMALL by definition (eval suites
    stay MB-sized while the corpus grows to 100 TB), so its distinct-gram
    set is computed distributed, collected once (bounded by benchmark
    size, not corpus size), and broadcast via ``ray.put``; the corpus
    side is ONE vectorized map_batches doing a hash-index ``isin`` per
    batch — no shuffle anywhere. Docs with < n tokens emit no row."""
    import ray

    from cdcsdk_server_ray.stages.join import _bcast_get

    docs = _read_docs(sf_dir, columns=["doc_id", "text"])

    def bench_grams(df: pd.DataFrame) -> pa.Table:
        df = df[df["doc_id"] % bench_mod == 0]
        _, h1, h2, _ = _doc_ngrams(df, n)
        pair = pd.DataFrame({"h1": h1, "h2": h2}).drop_duplicates()
        return pa.table({"h1": pa.array(pair["h1"].to_numpy(np.uint64)),
                         "h2": pa.array(pair["h2"].to_numpy(np.uint64))})

    bench_rows = (docs.map_batches(bench_grams, batch_format="pandas")
                  .take_all())
    # membership = h1 hit (vectorized np.isin) then h2 verify on the few
    # candidates — exact to 2^-128, and the broadcast payload is
    # 16 B/gram instead of the gram text
    bench_map = {int(r["h1"]): int(r["h2"]) for r in bench_rows}
    bench_h1 = np.fromiter(bench_map.keys(), np.uint64, len(bench_map))
    ref = ray.put((np.sort(bench_h1), bench_map))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        idx, h1, h2, _ = _doc_ngrams(df, n)
        if not len(idx):
            return pd.DataFrame({"doc_id": np.array([], np.int64),
                                 "n_distinct": np.array([], np.int64),
                                 "n_hits": np.array([], np.int64),
                                 "contaminated": np.array([], bool)})
        gd = pd.DataFrame({"i": idx, "h1": h1, "h2": h2}).drop_duplicates()
        bh1, bm = _bcast_get(ref)
        g1 = gd["h1"].to_numpy(np.uint64)
        hit = np.zeros(len(gd), bool)
        cand = np.flatnonzero(np.isin(g1, bh1))
        if len(cand):
            g2 = gd["h2"].to_numpy(np.uint64)
            hit[cand] = [bm.get(int(g1[j])) == int(g2[j]) for j in cand]
        gd["hit"] = hit
        agg = (gd.groupby("i", sort=False)
               .agg(n_distinct=("h1", "size"), n_hits=("hit", "sum"))
               .reset_index())
        nh = agg["n_hits"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64)[agg["i"].to_numpy()],
            "n_distinct": agg["n_distinct"].astype("int64"),
            "n_hits": nh,
            "contaminated": nh > 0,
        })

    return finish_sorted(docs.map_batches(scan, batch_format="pandas"), "doc_id")


def repetition_stats(sf_dir: str):
    """Gopher-style repetition quality signals (Rae et al. 2021, table A1
    family; complements ``dup_ngram_stats``'s duplicated-trigram rule):
    per document,

    - ``top_word_frac`` — occurrences of the most frequent word over
      total words (degenerate boilerplate scores near 1);
    - ``dup_word_frac`` — 1 - distinct/total words (the n=1 analogue of
      the duplicated-n-gram rule);
    - ``top_bigram_char_frac`` — max over word 2-grams of
      occurrences x len(bigram), divided by the doc's char length
      (Gopher's "fraction of characters in the most common 2-gram";
      max of the char MASS, so count-ties need no tie-break rule).

    All three are doc-local, so the whole operator is embarrassingly
    parallel: one vectorized explode + within-batch pandas groupby per
    block, NO shuffle (a doc never spans blocks). Scale note for 100 TB:
    the exploded frames are bounded by the batch's char count — the same
    order as the input block already resident in memory. The line- and
    sentence-duplication rules from the same Gopher table are left out
    deliberately: the test corpus is single-line word soup, and a signal
    that is structurally 0.0 on the oracle data would be a vacuous
    green. Docs with < 2 tokens get top_bigram_char_frac = 0.0."""
    docs = _read_docs(sf_dir, columns=["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        out_cols = ["doc_id", "top_word_frac", "dup_word_frac",
                    "top_bigram_char_frac"]
        if not len(df):
            return pd.DataFrame(
                {c: np.array([], np.int64 if c == "doc_id" else np.float64)
                 for c in out_cols})
        ids = df["doc_id"].to_numpy(np.int64)

        # --- word stats (trim + \s+ split, same rule as the oracle) ---
        toks = df["text"].str.strip().str.split(r"\s+", regex=True)
        nt = toks.str.len().to_numpy(np.int64)
        wf = pd.DataFrame({
            "i": np.repeat(np.arange(len(df), dtype=np.int64), nt),
            "w": np.concatenate(toks.to_numpy()),
        })
        wc = wf.groupby(["i", "w"], sort=False).size().rename("c").reset_index()
        ws = (wc.groupby("i", sort=False)["c"]
              .agg(mx="max", tot="sum", nd="size").reset_index())
        tot = ws["tot"].to_numpy(np.float64)
        top_frac = ws["mx"].to_numpy(np.float64) / tot
        dup_frac = 1.0 - ws["nd"].to_numpy(np.float64) / tot

        # --- top-bigram char mass / doc char length ---
        gidx, gh1, gh2, glen = _doc_ngrams(df, 2)
        out = pd.DataFrame({"doc_id": ids[ws["i"].to_numpy()],
                            "top_word_frac": top_frac,
                            "dup_word_frac": dup_frac})
        if len(gidx):
            # glen is a pure function of the gram, so grouping on it
            # alongside the 128-bit hash pair leaves the groups unchanged
            gc = (pd.DataFrame({"i": gidx, "h1": gh1, "h2": gh2,
                                "glen": glen})
                  .groupby(["i", "h1", "h2", "glen"], sort=False).size()
                  .rename("c").reset_index())
            mass = (gc["c"].to_numpy(np.int64)
                    * gc["glen"].to_numpy(np.int64))
            gm = (pd.DataFrame({"i": gc["i"], "mass": mass})
                  .groupby("i", sort=False)["mass"].max().reset_index())
            nc = df["text"].str.len().to_numpy(np.float64)
            big = pd.DataFrame({
                "doc_id": ids[gm["i"].to_numpy()],
                "top_bigram_char_frac": gm["mass"].to_numpy(np.float64)
                / nc[gm["i"].to_numpy()]})
            out = out.merge(big, on="doc_id", how="left")
            out["top_bigram_char_frac"] = (
                out["top_bigram_char_frac"].fillna(0.0))
        else:
            out["top_bigram_char_frac"] = 0.0
        # no rounding anywhere: both sides divide the same exact integer
        # sums in float64, so results are bit-identical to the oracle
        return out.reindex(columns=out_cols)

    return finish_sorted(docs.map_batches(stats, batch_format="pandas"), "doc_id")


def pack_sequences(sf_dir: str, target_tokens: int = 2048,
                   bucket_span: int = 10_000):
    """Sequence packing for training (assign each doc to a fixed
    token-budget bin, filling bins in doc_id order): ``seq_id`` =
    exclusive-prefix-sum(n_tokens, ordered by doc_id) // target_tokens —
    the streaming-concatenation layout a pre-training loader uses.

    A global ordered prefix scan is the one primitive Ray Data has no
    native operator for; the distributed plan here is the classic
    two-level scan:

    1. per-block partial sums keyed by a RANGE bucket (monotone in
       doc_id: ``doc_id // bucket_span``) — a tiny (bucket, sum) frame
       per block, collected on the driver (≤ n_docs / bucket_span rows
       TOTAL, e.g. 100k rows at 10^9 docs — driver-sized by design);
    2. an exclusive scan over the sorted bucket sums on the driver
       (O(buckets)), broadcast via ``ray.put``;
    3. one shuffle of the small (doc_id, n_tokens, bucket) rows —
       text stays behind — then ONE vectorized sort + cumsum kernel per
       bucket adds the bucket offset (the repo's standard bucket-kernel
       recipe; Python overhead is O(buckets), never O(docs)).

    Token rule (trim + \\s+ split) matches the SQL oracle exactly; all
    arithmetic is int64, so parity is exact, not float-close."""
    import ray

    from cdcsdk_server_ray.stages.join import _bcast_get

    docs = _read_docs(sf_dir, columns=["doc_id", "text"])

    def counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t["text"]), pattern=r"\s+")
        n = pc.cast(pc.list_value_length(toks), pa.int64())
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": n,
            "bucket": pc.divide(t["doc_id"], bucket_span),
        })

    # materialized because it is consumed twice (bucket sums, then the
    # scan); it holds three int64 columns — the text stayed behind, so
    # this is ~24 GB at 10^9 docs spread over the object store, not a
    # full-corpus materialization
    slim = docs.map_batches(counts, batch_format="pyarrow").materialize()

    def partial(t: pa.Table) -> pa.Table:
        return (t.select(["bucket", "n_tokens"])
                .group_by("bucket").aggregate([("n_tokens", "sum")]))

    parts = pd.concat(
        [b.to_pandas() for b in
         slim.map_batches(partial, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow")],
        ignore_index=True)
    sums = (parts.groupby("bucket", sort=True)["n_tokens_sum"].sum())
    offsets = sums.cumsum().shift(fill_value=0).astype("int64")
    ref = ray.put(offsets.to_dict())

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        off = _bcast_get(ref)
        df = df.sort_values("doc_id")
        n = df["n_tokens"].to_numpy(np.int64)
        prev = np.cumsum(n) - n + off[int(df["bucket"].iloc[0])]
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n_tokens": n,
            "seq_id": prev // target_tokens,
        })

    return (finish_sorted(slim.groupby("bucket")
            .map_groups(scan, batch_format="pandas"), "doc_id"))


def quality_quantile_filter(sf_dir: str, permille: int = 900,
                            num_buckets: int = 32):
    """Quantile-gated quality filter (keep docs at or below the corpus
    p90 MEAN TOKEN LENGTH — dropping the long-average-word tail that
    signals code/garbage; the data-driven cousin of ``quality_filter``'s
    fixed thresholds): composes the repo's exact disc-quantile plan with
    a broadcast-scalar filter.

    1. score every doc (mean token length rounded to 3 decimals — the
       rounding IS the quantile plan's bounded-resolution contract:
       ≤ ~10^5 distinct values for any corpus, independent of row
       count; the gate signal was chosen because the test corpus has
       real spread on it — punctuation ratio is structurally 0 on word
       soup and would filter nothing), materialized: three slim
       columns, the text stays behind;
    2. ``stats.disc_quantile`` computes the exact global threshold with
       partial counts only (no global sort, no row shuffle) — a one-row
       result fetched to the driver;
    3. one vectorized ``<=`` filter per block against the broadcast
       scalar (a closure constant — no per-batch re-ship).

    The two-pass shape is the scale-correct one: pass 1 writes O(docs)
    slim rows, pass 2 moves only partial counts. Matches the DuckDB
    ``quantile_disc`` oracle exactly (integer-permille pick on rounded
    values — no float boundary hazard)."""
    from cdcsdk_server_ray.pipelines import stats

    docs = _read_docs(sf_dir, columns=["doc_id", "lang", "text"])

    def score(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t["text"]), pattern=r"\s+")
        n_tokens = pc.cast(pc.list_value_length(toks), pa.float64())
        nonspace = pc.cast(pc.utf8_length(
            pc.replace_substring_regex(t["text"], pattern=r"\s",
                                       replacement="")), pa.float64())
        return pa.table({
            "doc_id": t["doc_id"], "lang": t["lang"],
            "mean_token_len": pc.round(
                pc.divide(nonspace, n_tokens), 3,
                # DuckDB round() is half-away-from-zero; Arrow
                # defaults to half-to-even — at 3 decimals the
                # x*1000 = ####.5 tie IS representable and the
                # modes diverge (seen at sf0.01 rows 38/299/429)
                round_mode="half_towards_infinity")})

    scored = docs.map_batches(score, batch_format="pyarrow").materialize()
    thr = stats.disc_quantile(scored, "mean_token_len", permille,
                              num_buckets)

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.less_equal(t["mean_token_len"], thr))

    return (finish_sorted(scored.map_batches(keep, batch_format="pyarrow"), "doc_id"))


# PII patterns — RE2 syntax only (no backtracking constructs), so the
# pyarrow kernels and the DuckDB oracle (both RE2-backed) match exactly
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}-\d{4}\b"


def _imod(arr, m: int):
    """int64 modulo via truncated divide (pyarrow.compute has no mod
    kernel); inputs are non-negative here so trunc == floor."""
    return pc.subtract(arr, pc.multiply(pc.divide(arr, m), m))


def pii_redact(sf_dir: str):
    """PII scrub (the pre-training privacy pass: emails / IPv4 / phone
    fragments → typed placeholder tokens) with per-doc detection counts.

    The synthetic corpus contains no natural PII, so each doc's text is
    first AUGMENTED with deterministic doc_id-derived PII (one email, one
    IP, one phone) — the same seeding trick as the embedding near-dup
    query: it makes the oracle comparison non-vacuous while staying a
    pure function of the row, hence SQL-expressible. A real run deletes
    the augmentation stage and keeps everything else.

    One stateless ``map_batches`` pass, all RE2 kernels (compiled once
    per process by Arrow's kernel cache): count matches per class on the
    augmented text, then three chained ``replace_substring_regex`` calls
    (email → IP → phone, each on the prior output so placeholders are
    never re-scanned). No shuffle; output is row-aligned with the input.
    """
    docs = _read_docs(sf_dir, columns=["doc_id", "text"])

    def redact(t: pa.Table) -> pa.Table:
        did = t["doc_id"]
        aug = pc.binary_join_element_wise(
            t["text"],
            " contact user", pc.cast(did, pa.string()),
            "@example-", pc.cast(_imod(did, 10), pa.string()),
            ".com or 10.", pc.cast(_imod(did, 256), pa.string()),
            ".", pc.cast(_imod(pc.multiply(did, 7), 256), pa.string()),
            ".42 tel 555-0", pc.cast(pc.add(_imod(did, 900), 100),
                                     pa.string()),
            "")
        n_emails = pc.cast(pc.count_substring_regex(aug, PII_EMAIL),
                           pa.int64())
        n_ips = pc.cast(pc.count_substring_regex(aug, PII_IPV4), pa.int64())
        n_phones = pc.cast(pc.count_substring_regex(aug, PII_PHONE),
                           pa.int64())
        red = pc.replace_substring_regex(aug, pattern=PII_EMAIL,
                                         replacement="<EMAIL>")
        red = pc.replace_substring_regex(red, pattern=PII_IPV4,
                                         replacement="<IP>")
        red = pc.replace_substring_regex(red, pattern=PII_PHONE,
                                         replacement="<PHONE>")
        return pa.table({"doc_id": did, "n_emails": n_emails,
                         "n_ips": n_ips, "n_phones": n_phones,
                         "redacted": red})

    return finish_sorted(docs.map_batches(redact, batch_format="pyarrow"), "doc_id")


def heavy_hitters(sf_dir: str, k: int = 100):
    """EXACT corpus heavy hitters (words with count·k > total tokens) via
    the two-pass candidate-generation / verification pattern — the
    scale-correct alternative to counting the full vocabulary when only
    the heavy tail matters.

    Pass 1 (candidate generation, no shuffle): per batch, one vectorized
    explode + value_counts; emit only words with batch_count·k >
    batch_total. LOCAL HEAVY-HITTER LEMMA: if a word's global count
    exceeds N/k then its count must exceed n_b/k in at least ONE batch
    (averaging argument), so the union of per-batch candidates is a
    superset of the true heavy hitters; each batch emits < k rows, so
    the union is sketch-sized (≤ k·num_batches) and is collected +
    ``ray.put`` broadcast — the same bounded-driver-read contract as the
    KMV sketch and decontaminate's benchmark side.

    Pass 2 (verification, no second corpus read): exact counts of the
    candidate words come from the SAME per-batch value_counts partials
    pass 1 built — the partials (one (word, n) row per DISTINCT word per
    batch, far smaller than the token stream under any Zipfian corpus)
    are materialized once, so the verify pass filters slim numeric/
    string rows instead of re-reading and re-tokenizing the corpus (a
    Dataset fork re-runs its upstream; the re-tokenize was the query's
    largest cost). A one-task final sums the partials, applies the exact
    threshold count·k > N, and sorts. Output is EXACT — SQL-oracle-
    checkable — the driver still holds only O(k·blocks) candidate rows.
    """
    import ray

    from cdcsdk_server_ray.stages.join import _bcast_get

    docs = _read_docs(sf_dir, columns=["text"])
    TOTAL = "\x00total"   # sentinel row carrying the batch token total

    def _words(df: pd.DataFrame) -> np.ndarray:
        toks = (df["text"].str.lower().str.strip()
                .str.split(r"\s+", regex=True))
        return np.concatenate(toks.to_numpy())

    def vc_partial(df: pd.DataFrame) -> pd.DataFrame:
        # per-batch exact word counts + the local-heavy-hitter flag
        # (n·k > batch_total) + one sentinel row with the batch total
        if not len(df):
            return pd.DataFrame({"word": np.array([], object),
                                 "n": np.array([], np.int64),
                                 "cand": np.array([], np.int8)})
        vc = pd.Series(_words(df)).value_counts()
        n = vc.to_numpy(np.int64)
        tot = int(n.sum())
        return pd.DataFrame({
            "word": np.concatenate([vc.index.to_numpy(object), [TOTAL]]),
            "n": np.concatenate([n, [tot]]),
            "cand": np.concatenate([(n * k > tot).astype(np.int8),
                                    np.ones(1, np.int8)])})

    vc_rows = docs.map_batches(vc_partial, batch_format="pandas") \
                  .materialize()

    # ≤ k+1 rows per block, but k×blocks is thousands — fetch as ONE
    # frame (to_pandas), not take_all: Ray's per-row path costs ~1 ms/row
    # on pandas blocks (measured 8.5 s for 7.7k rows vs 0.1 s as a frame)
    cand_df = (vc_rows.map_batches(
        lambda df: df.loc[df["cand"] == 1, ["word", "n"]],
        batch_format="pandas").to_pandas())
    total = int(cand_df.loc[cand_df["word"] == TOTAL, "n"].sum())
    cand_idx = pd.Index(pd.unique(
        cand_df.loc[cand_df["word"] != TOTAL, "word"].to_numpy(object)))
    ref = ray.put(cand_idx)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["word"].isin(_bcast_get(ref))]
        return (sub.groupby("word", sort=False)["n"].sum()
                .reset_index().astype({"n": "int64"}))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby("word", sort=False)["n"].sum().reset_index()
        s = s[s["n"] * k > total]
        s["n"] = s["n"].astype("int64")
        return (s.sort_values("word").reset_index(drop=True)
                .reindex(columns=["word", "n"]))

    return (vc_rows.map_batches(verify, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


def sample_mix(sf_dir: str, salt: int = 7919):
    """Domain-mix (rate) sampling — the data-mixing primitive: each
    source keeps a DIFFERENT deterministic fraction of its docs (the way
    a training recipe up/down-weights crawl domains), rather than a
    uniform rate (``sample_documents``) or a hard per-source cap
    (``cap_per_source``).

    The per-source keep rate here is a pure function of the source name
    (200 + 40·(suffix mod 10) permille) so the whole op stays a single
    stateless pyarrow pass with a salt-shifted Knuth hash — reproducible
    across partitioning/resume, decorrelated from the sampling and split
    hashes by its own salt, and exactly SQL-expressible for the oracle.
    A production run swaps the rate function for a broadcast
    source→permille table; everything else is unchanged."""
    docs = _read_docs(sf_dir, columns=["doc_id", "source", "lang",
                                       "n_chars"])

    def keep(t: pa.Table) -> pa.Table:
        sfx = pc.cast(pc.utf8_slice_codeunits(t["source"], 3, 99),
                      pa.int64())
        permille = pc.add(pc.multiply(_imod(sfx, 10), 40), 200)
        h = pc.multiply_checked(pc.add_checked(t["doc_id"], salt),
                                2654435761)
        bucket = _imod(h, 1000)
        t = t.append_column("keep_permille",
                            pc.cast(permille, pa.int64()))
        return t.filter(pc.less(bucket, permille))

    return (finish_sorted(docs.map_batches(keep, batch_format="pyarrow"), "doc_id"))


def chunk_documents(sf_dir: str, chunk_tokens: int = 64, stride: int = 48):
    """Context-window chunking: split each document into overlapping
    windows of ``chunk_tokens`` whitespace tokens every ``stride`` tokens
    (chunk k covers tokens [k·stride, k·stride + chunk_tokens); emitted
    while k·stride < n) — the prep step that turns raw documents into
    training-context pieces. FULLY VECTORIZED: one split per batch, then
    per chunk-rank k one zero-copy ``list_slice`` + ``binary_join`` over
    the whole batch (the k-loop is bounded by the longest doc in the
    batch, each iteration an Arrow kernel — never per-row Python).
    Output: (doc_id, chunk_id, n_tokens, chunk_text)."""
    docs = _read_docs(sf_dir, columns=["doc_id", "text"])

    def chunks(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t["text"])
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        n = pc.cast(pc.list_value_length(toks), pa.int64())
        max_n = pc.max(n).as_py() or 0
        parts = []
        k = 0
        toks = toks.combine_chunks()      # ONCE — not per chunk rank
        while k * stride < max_n:
            mask = pc.greater(n, k * stride)
            sub_toks = pc.list_slice(toks, k * stride,
                                     k * stride + chunk_tokens)
            piece = pa.table({
                "doc_id": t["doc_id"],
                "chunk_id": pa.array(
                    np.full(t.num_rows, k, dtype=np.int64)),
                "n_tokens": pc.cast(pc.list_value_length(sub_toks),
                                    pa.int64()),
                "chunk_text": pc.binary_join(
                    sub_toks, pa.scalar(" ", pa.string())),
            }).filter(mask)
            parts.append(piece)
            k += 1
        if not parts:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "chunk_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "chunk_text": pa.array([], pa.string())})
        return pa.concat_tables(parts)

    return (finish_sorted(docs.map_batches(chunks, batch_format="pyarrow"), ["doc_id", "chunk_id"]))


def normalize_text(sf_dir: str):
    """Canonical text normalization (the cleaning step before hashing /
    tokenizing): lowercase, strip non-alphanumerics to spaces, collapse
    whitespace runs, trim. Pure Arrow kernels (utf8_lower +
    replace_substring_regex), RE2 semantics identical to the DuckDB
    oracle. Output: (doc_id, norm_text, n_norm_chars)."""
    docs = _read_docs(sf_dir, columns=["doc_id", "text"])

    def norm(t: pa.Table) -> pa.Table:
        s = pc.utf8_lower(t["text"])
        s = pc.replace_substring_regex(s, pattern=r"[^a-z0-9]+",
                                       replacement=" ")
        s = pc.utf8_trim_whitespace(s)
        return pa.table({
            "doc_id": t["doc_id"],
            "norm_text": s,
            "n_norm_chars": pc.cast(pc.utf8_length(s), pa.int64())})

    return finish_sorted(docs.map_batches(norm, batch_format="pyarrow"), "doc_id")


def quartile_buckets(sf_dir: str):
    """NTILE-style quantile bucketing by value, not by row position:
    assign each document the quartile of its ``n_chars`` (1..4) using
    the three exact disc-quantile thresholds (p250/p500/p750) computed
    by the distributed no-sort quantile plan and broadcast as three
    scalars — one vectorized ``searchsorted`` per block, no global sort,
    no row numbering. (Positional NTILE ties are engine-defined; value
    thresholds make the bucketing deterministic and SQL-mirrorable.)
    Output: (doc_id, n_chars, quartile)."""
    import ray.data

    from cdcsdk_server_ray.pipelines.stats import quantile_pipeline

    docs = _read_docs(sf_dir, columns=["doc_id", "n_chars"])
    qrows = quantile_pipeline(docs, "n_chars", (250, 500, 750)).take_all()
    cuts = np.array(sorted(float(r["value"]) for r in qrows))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        v = df["n_chars"].to_numpy(np.float64)
        # quartile q: count of thresholds STRICTLY below v, +1 — a value
        # equal to the p-th disc quantile stays in the lower bucket
        quart = (np.searchsorted(cuts, v, side="left") + 1).astype(np.int64)
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "n_chars": df["n_chars"].to_numpy(),
                             "quartile": quart})

    return finish_sorted(docs.map_batches(assign, batch_format="pandas"), "doc_id")


def sample_temperature(sf_dir: str, alpha_inv2: bool = True):
    """Temperature-based corpus mixing (the multinomial α-sampling of
    XLM-R / mT5, α = 0.5): languages are kept at rates ∝ count^(α-1),
    so rare languages up-weight toward the target q_l ∝ count_l^α. The
    rarest language keeps everything; every other keeps
    ``floor(sqrt((10^6 · c_min) // c_l))`` permille — integer floor
    division BEFORE the (correctly-rounded IEEE) sqrt makes the rate
    bit-identical on Ray and DuckDB, so the sampled set is
    oracle-exact, not just statistically right.

    Two bounded passes: per-lang counts through the combiner (|langs|
    partial rows per block), rates to a broadcast dict, then one
    vectorized deterministic-hash filter per block (the
    ``sample_documents`` hash — stable across partitioning/replay)."""
    import math

    from cdcsdk_server_ray.stages.aggregate import grouped_aggregate

    docs = _read_docs(sf_dir, columns=["doc_id", "lang"])
    counts = {r["lang"]: int(r["n"])
              for r in grouped_aggregate(docs, ["lang"],
                                         {"n": ("doc_id", "count")})
              .take_all()}
    cmin = min(counts.values())
    permille = {lang: int(math.isqrt((1_000_000 * cmin) // c))
                for lang, c in counts.items()}

    full = _read_docs(sf_dir, columns=["doc_id", "lang", "n_chars"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        # exact bound: floor((2^63-1)/2654435761); beyond it the product
        # wraps and the bucket silently diverges from the SQL oracle
        if (ids > 3_474_701_543).any():
            raise OverflowError("doc_id beyond exact int64 hash range")
        h = ids * np.int64(2654435761)
        bucket = h % 1000
        thresh = df["lang"].map(permille).to_numpy(np.int64)
        out = df[bucket < thresh].copy()
        out["keep_permille"] = thresh[bucket < thresh]
        return out

    return (finish_sorted(full.map_batches(keep, batch_format="pandas"), "doc_id"))


def lm_perplexity(sf_dir: str, num_buckets: int = 64,
                  params_out: str | None = None):
    """CCNet-style language-model quality scoring (Wenzek et al. 2020
    filter corpora by the perplexity of a corpus-trained LM; KenLM in
    the paper, an add-one bigram LM here), Ray-Data-first and
    integer-exact end to end:

    1. TRAIN (distributed): per-batch partial bigram counts (each doc
       lives wholly in one batch, so one vectorized explode+groupby per
       batch is a complete combiner) → one bucketed exchange (bigrams
       hash into ``num_buckets``; one vectorized sum per bucket — never
       a per-bigram Python group) → the fitted LM collects to the
       driver. Driver pull is LM-sized, not corpus-sized: a production
       deployment caps the vocabulary exactly like KenLM pruning does.
    2. QUANTIZE (driver, once): add-one log-probs become integer
       micronats — nll(a,b) = round(1e6·(ln(c1(a)+V) − ln(c2(a,b)+1)))
       — the same trick KenLM uses to store quantized log-probs. Every
       step after this is exact-integer, so the SQL oracle (joining the
       published sidecar) matches bit-for-bit: no float-summation-order
       risk across ~10² log terms per document.
    3. SCORE (distributed): the quantized tables broadcast via ray.put
       (sketch-sized); per batch one explode + two vectorized merges +
       a fillna fallback chain (seen bigram → seen prefix → OOV) +
       groupby-sum. Per-doc totals are complete within the batch, so
       the only exchange in the whole pipeline is the training one.

    Output (all int64): doc_id, n_bigrams, nll_micronats (total),
    avg_nll_micronats (floor mean; 0 when the doc has <2 tokens).
    """
    import ray

    docs = _read_docs(sf_dir, columns=["doc_id", "text"])

    def _pairs(df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        toks = (df["text"].str.lower().str.strip()
                .str.split(r"\s+", regex=True))
        lens = toks.str.len().to_numpy(np.int64)
        flat = np.concatenate(toks.to_numpy()) if len(df) else \
            np.empty(0, object)
        # adjacent pairs within each doc: drop the last token of every
        # doc from the "a" side and the first from the "b" side
        ends = np.cumsum(lens)
        last_idx = ends - 1
        mask = np.ones(flat.shape[0], bool)
        mask[last_idx[lens > 0]] = False
        first_idx = ends - lens
        mask_b = np.ones(flat.shape[0], bool)
        mask_b[first_idx[lens > 0]] = False
        doc_ids = np.repeat(df["doc_id"].to_numpy(np.int64), lens)
        return doc_ids[mask], flat[mask], flat[mask_b]

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        _ids, ta, tb = _pairs(df)
        g = (pd.DataFrame({"tok_a": ta, "tok_b": tb})
             .groupby(["tok_a", "tok_b"], sort=False)
             .size().reset_index(name="c"))
        g["c"] = g["c"].astype("int64")
        key = g["tok_a"] + "\x1f" + g["tok_b"]
        g["__bb"] = (pd.util.hash_pandas_object(key, index=False)
                     .to_numpy(np.uint64) % np.uint64(num_buckets)
                     ).astype(np.int32)
        return g

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["tok_a", "tok_b"], sort=False)["c"]
               .sum().reset_index())
        out["c"] = out["c"].astype("int64")
        return out

    # LM-sized driver pull (vocab² bound; production caps vocab) —
    # the fit itself is the one legitimate driver step, like kmeans/PCA
    lm = (docs.map_batches(partial_counts, batch_format="pandas")
          .groupby("__bb").map_groups(bucket_sum, batch_format="pandas")
          .to_pandas())

    c1 = lm.groupby("tok_a", sort=False)["c"].sum()
    # NOTE: pd.Index.union keeps duplicate values (multiset semantics)
    # — dedupe explicitly for the true vocabulary size
    vocab = np.union1d(lm["tok_a"].to_numpy(), lm["tok_b"].to_numpy())
    v = max(1, len(vocab))
    c1_a = c1.reindex(lm["tok_a"]).to_numpy(np.int64)
    # quantize ONCE on the driver: integer micronats from exact-integer
    # count arguments — downstream arithmetic is exact on both engines
    bg_nll = np.round(1e6 * (np.log(c1_a + float(v))
                             - np.log(lm["c"].to_numpy(np.int64) + 1.0))
                      ).astype(np.int64)
    ug_nll = np.round(1e6 * np.log(c1.to_numpy(np.int64) + float(v))
                      ).astype(np.int64)
    v_nll = int(np.round(1e6 * np.log(float(v))))

    bg_df = pd.DataFrame({"tok_a": lm["tok_a"].to_numpy(),
                          "tok_b": lm["tok_b"].to_numpy(),
                          "nll": bg_nll})
    ug_df = pd.DataFrame({"tok_a": c1.index.to_numpy(), "nll_u": ug_nll})

    if params_out:
        from cdcsdk_server_ray.pipelines.similarity import _write_params
        _write_params(pa.table({
            "tok_a": pa.array(
                np.concatenate([bg_df["tok_a"].to_numpy(),
                                ug_df["tok_a"].to_numpy(), [None]]),
                pa.string()),
            "tok_b": pa.array(
                np.concatenate([bg_df["tok_b"].to_numpy(),
                                np.full(len(ug_df) + 1, None, object)]),
                pa.string()),
            "nll_micronats": pa.array(
                np.concatenate([bg_df["nll"].to_numpy(),
                                ug_df["nll_u"].to_numpy(), [v_nll]]),
                pa.int64()),
        }), params_out)

    lm_ref = ray.put((bg_df, ug_df, v_nll))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        bg, ug, oov = ray.get(lm_ref)
        ids, ta, tb = _pairs(df)
        p = pd.DataFrame({"doc_id": ids, "tok_a": ta, "tok_b": tb})
        p = p.merge(bg, on=["tok_a", "tok_b"], how="left")
        p = p.merge(ug, on="tok_a", how="left")
        nll = p["nll"].fillna(p["nll_u"]).fillna(float(oov)) \
            .to_numpy(np.int64)
        tot = (pd.DataFrame({"doc_id": p["doc_id"], "nll": nll})
               .groupby("doc_id", sort=False)["nll"]
               .agg(["count", "sum"]))
        out = tot.reindex(df["doc_id"].to_numpy(np.int64)) \
            .fillna(0).astype(np.int64)
        n_bg = out["count"].to_numpy()
        total = out["sum"].to_numpy()
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n_bigrams": n_bg,
            "nll_micronats": total,
            "avg_nll_micronats": np.where(n_bg > 0, total //
                                          np.maximum(n_bg, 1), 0),
        })

    return finish_sorted(docs.map_batches(score, batch_format="pandas"),
                         "doc_id")


class _FeatureHasher:
    """Hashed-unigram featurizer (the DSIR paper's hashed n-gram
    features): feature = md5-lower-64(token) % n_features — the repo's
    oracle-able hash convention (DuckDB ``md5_number_lower``). Distinct
    tokens hash once per worker (dict cache, SimHasher pattern)."""

    def __init__(self, n_features: int):
        self.n = n_features
        self._cache: dict[str, int] = {}

    def feats(self, toks: np.ndarray) -> np.ndarray:
        import hashlib
        cache = self._cache
        out = np.empty(len(toks), np.int64)
        for i, t in enumerate(toks):
            h = cache.get(t)
            if h is None:
                h = int.from_bytes(hashlib.md5(t.encode())
                                   .digest()[8:], "little") % self.n
                if len(cache) < 1_000_000:
                    cache[t] = h
            out[i] = h
        return out


_FEATURE_HASHERS: dict[int, _FeatureHasher] = {}


def _feature_hasher(n_features: int) -> _FeatureHasher:
    """One md5 token cache per worker PROCESS (module-level, so it
    survives across tasks — the worker_cached rationale, without the
    class plumbing since the state is a pure memo)."""
    return _FEATURE_HASHERS.setdefault(n_features,
                                       _FeatureHasher(n_features))


def _doc_tokens(df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """(per-doc token counts, flat token array) — the shared
    tokenize+explode kernel (tfidf convention: lower/strip/split \\s+)."""
    toks = (df["text"].str.lower().str.strip()
            .str.split(r"\s+", regex=True))
    lens = toks.str.len().to_numpy(np.int64)
    flat = np.concatenate(toks.to_numpy()) if len(df) else \
        np.empty(0, object)
    return lens, flat


def dsir_weights(sf_dir: str, target_source: str = "src0",
                 n_features: int = 1024, num_buckets: int = 32,
                 params_out: str | None = None):
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023): score every raw-corpus document by the log importance weight
    of a hashed-unigram bag-of-words model fit on a TARGET domain vs
    the RAW corpus; downstream selection resamples by this weight.
    Ray-Data-first and integer-exact:

    1. COUNT (distributed, one pass): per-batch partial feature counts
       on BOTH sides at once (raw = every document, target = documents
       whose ``source`` equals ``target_source``) → one bucketed
       exchange over feature % num_buckets (features are already dense
       ints; one vectorized sum per bucket) → the 2×n_features count
       table collects to the driver (fixed-size, independent of corpus
       scale).
    2. QUANTIZE (driver, once): add-one log importance ratios
       lr(f) = round(1e6·(ln p_target(f) − ln p_raw(f))) in integer
       micronats — the LM-perplexity trick, so the distributed score
       pass and the SQL oracle (which joins the published sidecar) are
       exact-integer with zero float-summation risk.
    3. SCORE (distributed): broadcast the n_features-long int64 ratio
       array (ray.put, KBs); per batch one explode+gather+bincount-sum
       per doc. Per-doc totals complete within the batch (docs live
       wholly in one batch) — presentation sort is the only exchange.

    Output (int64): doc_id, n_tokens, logw_micronats.
    """
    import ray

    docs = _read_docs(sf_dir, columns=["doc_id", "text", "source"])

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        lens, flat = _doc_tokens(df)
        f = _feature_hasher(n_features).feats(flat)
        is_tgt = np.repeat(
            (df["source"] == target_source).to_numpy(), lens)
        c_all = np.bincount(f, minlength=n_features).astype(np.int64)
        c_tgt = np.bincount(f[is_tgt], minlength=n_features) \
            .astype(np.int64)
        feats = np.arange(n_features, dtype=np.int64)
        return pd.DataFrame({"feature": feats, "c_all": c_all,
                             "c_tgt": c_tgt,
                             "__fb": (feats % num_buckets)
                             .astype(np.int32)})

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("feature", sort=False)[["c_all", "c_tgt"]]
               .sum().reset_index())
        return out.astype({"c_all": "int64", "c_tgt": "int64"})

    counts = (docs.map_batches(partial_counts, batch_format="pandas")
              .groupby("__fb").map_groups(bucket_sum,
                                          batch_format="pandas")
              .to_pandas().sort_values("feature"))
    c_all = np.zeros(n_features, np.int64)
    c_tgt = np.zeros(n_features, np.int64)
    c_all[counts["feature"].to_numpy()] = counts["c_all"].to_numpy()
    c_tgt[counts["feature"].to_numpy()] = counts["c_tgt"].to_numpy()
    n_all, n_tgt = int(c_all.sum()), int(c_tgt.sum())
    # add-one smoothed log ratio, quantized once to integer micronats
    lr = np.round(1e6 * (
        np.log((c_tgt + 1.0) / (n_tgt + n_features))
        - np.log((c_all + 1.0) / (n_all + n_features)))).astype(np.int64)

    if params_out:
        from cdcsdk_server_ray.pipelines.similarity import _write_params
        _write_params(pa.table({
            "feature": pa.array(np.arange(n_features, dtype=np.int64)),
            "lr_micronats": pa.array(lr),
        }), params_out)

    lr_ref = ray.put(lr)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        lrv = ray.get(lr_ref)
        lens, flat = _doc_tokens(df)
        f = _feature_hasher(n_features).feats(flat)
        doc_ids = df["doc_id"].to_numpy(np.int64)
        idx = np.repeat(np.arange(len(doc_ids), dtype=np.int64), lens)
        # int micronat sums stay < 2**53, so the float64 bincount
        # accumulator is exact
        logw = np.bincount(idx, weights=lrv[f].astype(np.float64),
                           minlength=len(doc_ids)).astype(np.int64)
        return pd.DataFrame({"doc_id": doc_ids, "n_tokens": lens,
                             "logw_micronats": logw})

    return finish_sorted(docs.map_batches(score, batch_format="pandas"),
                         "doc_id")


def collocations_pmi(sf_dir: str, k: int = 100, num_buckets: int = 32):
    """Collocation extraction: the top-``k`` adjacent word pairs scored
    by pointwise mutual information, PMI = ln(p(a,b) / (p(a)·p(b))) —
    the statistical phrase detector behind word2vec-phrases / corpus
    linguistics.

    Scale shape — ONE text scan, one slim fork, two bounded exchanges:

    1. a single tagged pass emits BOTH unigram and pair partial counts
       per block (the fork-re-execution rule: forking the docs read
       would tokenize the corpus twice), materialized at the partials —
       Σ block-vocabulary rows, the slim fork point;
    2. pair side: the bpe_pair_counts bucket top-k (a pair lives wholly
       in one bucket) prunes to ≤ k × buckets candidates, and the
       per-task (unigram, pair) grand totals ride along as partial rows
       — no extra pass for N;
    3. unigram side: only words OCCURRING IN the candidate pairs need
       exact counts — the candidate word set (≤ 2k words) broadcasts
       and filters the unigram partials BEFORE their exchange, so the
       second all-to-all moves ≤ 2k rows per block.

    The one float step (two ln calls) happens once per reported pair on
    the driver-side final over ≤ k rows, rounded to 6dp on both
    engines."""
    import math

    import ray

    docs = _read_docs(sf_dir, columns=["text"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"w1": np.array([], object),
                              "w2": np.array([], object),
                              "n": np.array([], np.int64),
                              "kind": np.array([], object)})
        if not len(df):
            return empty
        toks = (df["text"].str.lower().str.strip()
                .str.split(r"\s+", regex=True))
        lens = toks.str.len().to_numpy(np.int64)
        flat = np.concatenate(toks.to_numpy())
        uni = pd.Series(flat, dtype=object).value_counts()
        out = [pd.DataFrame({"w1": uni.index.to_numpy(),
                             "w2": "", "n": uni.to_numpy(np.int64),
                             "kind": "u"})]
        if len(flat) >= 2:
            keep = np.ones(len(flat) - 1, dtype=bool)
            keep[np.cumsum(lens)[:-1] - 1] = False
            left = pd.Series(flat[:-1][keep], dtype=object)
            right = pd.Series(flat[1:][keep], dtype=object)
            pairs = (pd.DataFrame({"w1": left.to_numpy(),
                                   "w2": right.to_numpy()})
                     .groupby(["w1", "w2"], sort=False).size().rename("n")
                     .reset_index())
            pairs["kind"] = "p"
            out.append(pairs.astype({"n": "int64"}))
        return pd.concat(out, ignore_index=True)

    # slim fork point: Σ block-vocab rows, consumed by both sides below
    parts = docs.map_batches(partials, batch_format="pandas").materialize()

    def pair_bucket_partial(df: pd.DataFrame) -> pd.DataFrame:
        # per-task totals ride along as sentinel rows (kind='t')
        p = df[df["kind"] == "p"]
        tot = pd.DataFrame({
            "w1": ["", ""], "w2": ["", ""],
            "n": np.array([df.loc[df["kind"] == "u", "n"].sum(),
                           p["n"].sum()], np.int64),
            "kind": ["tu", "tp"]})
        p = pd.concat([p, tot], ignore_index=True)
        key = p["w1"].str.cat(p["w2"], sep="\x1f")
        p["__b"] = np.where(
            p["kind"] == "p",
            (pd.util.hash_pandas_object(key, index=False)
             .to_numpy(np.uint64) % np.uint64(num_buckets)).astype(np.int32),
            np.int32(0)).astype(np.int32)
        return p

    def pair_bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        tot = (g[g["kind"] != "p"].groupby("kind", sort=False)["n"]
               .sum().reset_index())
        tot["w1"] = ""
        tot["w2"] = ""
        p = (g[g["kind"] == "p"]
             .groupby(["w1", "w2"], sort=False)["n"].sum().reset_index())
        p["kind"] = "p"
        p = (p.sort_values(["n", "w1", "w2"],
                           ascending=[False, True, True]).head(k))
        return pd.concat([p, tot[["w1", "w2", "n", "kind"]]],
                         ignore_index=True)

    cand = (parts.map_batches(pair_bucket_partial, batch_format="pandas")
            .groupby("__b")
            .map_groups(pair_bucket_topk, batch_format="pandas")
            .to_pandas())          # ≤ k×buckets + 2×buckets rows
    n_tokens = int(cand.loc[cand["kind"] == "tu", "n"].sum())
    n_pairs_total = int(cand.loc[cand["kind"] == "tp", "n"].sum())
    top = (cand[cand["kind"] == "p"]
           .groupby(["w1", "w2"], sort=False)["n"].sum().reset_index()
           .sort_values(["n", "w1", "w2"], ascending=[False, True, True])
           .head(k).reset_index(drop=True))

    words = np.sort(pd.unique(pd.concat([top["w1"], top["w2"]])))
    wref = ray.put(words)

    def uni_filter(df: pd.DataFrame) -> pd.DataFrame:
        ws = ray.get(wref)
        u = df[(df["kind"] == "u") & df["w1"].isin(ws)]
        g = u.groupby("w1", sort=False)["n"].sum().reset_index()
        return g.astype({"n": "int64"})

    # O(k·blocks) driver pull (the heavy_hitters verify-pass bound) —
    # cheaper than an exchange for ≤2k filtered rows per block
    uni = parts.map_batches(uni_filter, batch_format="pandas").to_pandas()
    counts = uni.groupby("w1")["n"].sum().to_dict()

    pmi = [round(math.log((n_ab / n_pairs_total)
                          / ((counts[a] / n_tokens)
                             * (counts[b] / n_tokens))), 6)
           for a, b, n_ab in zip(top["w1"], top["w2"], top["n"])]
    out = pd.DataFrame({"w1": top["w1"], "w2": top["w2"],
                        "n": top["n"].astype("int64"), "pmi": pmi})
    return out


def token_entropy(sf_dir: str):
    """Per-document unigram entropy (nats) — the vocabulary-diversity
    quality signal (low entropy ⇒ repetitive/template text; pairs with
    the Gopher repetition family). Doc-local ⇒ ZERO shuffle: one
    map_batches computes every doc's token distribution with ONE
    batch-wide groupby over the exploded (doc_id, token) pairs — never
    a per-doc Python loop — and the entropy sum is a second grouped
    vectorized pass. The only floats are the final ln calls, rounded to
    6dp identically on both engines."""
    docs = _read_docs(sf_dir, columns=["doc_id", "text"])

    def entropy(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"doc_id": np.array([], np.int64),
                                 "n_tokens": np.array([], np.int64),
                                 "n_distinct": np.array([], np.int64),
                                 "entropy": np.array([], np.float64)})
        toks = (df["text"].str.lower().str.strip()
                .str.split(r"\s+", regex=True))
        lens = toks.str.len().to_numpy(np.int64)
        flat = np.concatenate(toks.to_numpy())
        ids = np.repeat(df["doc_id"].to_numpy(np.int64), lens)
        counts = (pd.DataFrame({"doc_id": ids, "w": flat})
                  .groupby(["doc_id", "w"], sort=False).size()
                  .rename("c").reset_index())
        n = counts.groupby("doc_id", sort=False)["c"].transform("sum") \
            .to_numpy(np.int64)
        c = counts["c"].to_numpy(np.int64)
        p = c / n
        ent_terms = pd.DataFrame({"doc_id": counts["doc_id"],
                                  "t": -p * np.log(p), "one": 1})
        g = (ent_terms.groupby("doc_id", sort=False)
             .agg(entropy=("t", "sum"), n_distinct=("one", "sum"))
             .reset_index())
        tot = pd.Series(lens, index=df["doc_id"].to_numpy(np.int64))
        g["n_tokens"] = g["doc_id"].map(tot).astype("int64")
        g["n_distinct"] = g["n_distinct"].astype("int64")
        g["entropy"] = np.round(g["entropy"].to_numpy(np.float64), 6)
        return g[["doc_id", "n_tokens", "n_distinct", "entropy"]]

    return finish_sorted(docs.map_batches(entropy, batch_format="pandas"),
                         "doc_id")


def source_overlap(sf_dir: str, n: int = 5, num_buckets: int = 64):
    """Cross-source n-gram containment matrix: for every pair of
    sources, how many distinct word n-grams they share and the Jaccard
    of their gram sets — the corpus-contamination audit a training-data
    pipeline runs before mixing sources (which crawls/dumps overlap,
    and by how much).

    Plan: one pass emits batch-deduped (gram-hash-pair, source-id)
    rows — grams ride the repo's vectorized 128-bit token-roll hash
    (:func:`_doc_ngrams`; equality classes only, the oracle re-derives
    from gram TEXT), sources as md5-lower-64 ids so the exchange is
    ALL-NUMERIC (object/string block columns measured ~2× the exchange
    wall here). ONE gram-hash bucket exchange finishes the distinct and
    a vectorized self-merge expands each gram's source set into pairs —
    bounded by |sources|² per gram, and sources are a bounded-
    cardinality dimension by design (the declared partitioning
    assumption). Per-source distinct-gram totals ride the same exchange
    as sentinel rows (sid_b = 0); the driver folds ≤ |sources|² +
    |sources| partials per bucket, maps ids back to names via one
    column-pruned distinct scan, and performs the single shared float
    step (shared/union, round 6)."""
    import hashlib

    import numpy as np

    ds = _read_docs(sf_dir, columns=["text", "source"])

    def _sid(s: str) -> int:
        return int.from_bytes(hashlib.md5(s.encode()).digest()[8:],
                              "little")

    def gram_rows(df: pd.DataFrame) -> pd.DataFrame:
        low = df.assign(text=df["text"].str.lower()).reset_index(drop=True)
        idx, h1, h2, _ = _doc_ngrams(low, n)
        codes, uniq = pd.factorize(low["source"])
        sid_map = np.array([_sid(s) for s in uniq], dtype=np.uint64)
        out = pd.DataFrame({"h1": h1, "h2": h2,
                            "sid": sid_map[codes[idx]]}).drop_duplicates()
        out["__bucket"] = (out["h1"].to_numpy(np.uint64)
                           % np.uint64(num_buckets)).astype(np.int32)
        return out

    def bucket_kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["h1", "h2", "sid"]].drop_duplicates()
        sz = df.groupby("sid", sort=False).size().reset_index(name="cnt")
        sizes = pd.DataFrame({
            "sid_a": sz["sid"].astype("uint64"),
            "sid_b": np.zeros(len(sz), np.uint64),
            "cnt": sz["cnt"].astype("int64")})
        m = df.merge(df, on=["h1", "h2"])
        m = m[m["sid_x"] < m["sid_y"]]
        pc_ = (m.groupby(["sid_x", "sid_y"], sort=False).size()
               .reset_index(name="cnt"))
        pairs = pd.DataFrame({
            "sid_a": pc_["sid_x"].astype("uint64"),
            "sid_b": pc_["sid_y"].astype("uint64"),
            "cnt": pc_["cnt"].astype("int64")})
        return pd.concat([pairs, sizes], ignore_index=True)

    partials = (ds.map_batches(gram_rows, batch_format="pandas")
                .groupby("__bucket")
                .map_groups(bucket_kernel, batch_format="pandas"))

    # driver fold via to_pandas, NOT take_all: Ray's row path costs
    # ~1ms/row on pandas blocks (measured 10 s for 7.7k partial rows vs
    # 0.1 s for the same fetch as a frame) — fold vectorized instead
    pf = partials.to_pandas()
    agg = (pf.groupby(["sid_a", "sid_b"], sort=False)["cnt"].sum()
           .reset_index())
    sz_rows = agg[agg["sid_b"] == 0]
    sizes = dict(zip(sz_rows["sid_a"].astype("uint64").map(int),
                     sz_rows["cnt"].map(int)))
    pr_rows = agg[agg["sid_b"] != 0]
    shared = {(int(a), int(b)): int(c) for a, b, c in zip(
        pr_rows["sid_a"].astype("uint64"),
        pr_rows["sid_b"].astype("uint64"), pr_rows["cnt"])}

    # sid → name from one column-pruned distinct scan (sources are a
    # bounded dimension; the scan reads ONE small column)
    src_rows = (_read_docs(sf_dir, columns=["source"])
                .map_batches(lambda d: d.drop_duplicates(),
                             batch_format="pandas").take_all())
    name_of = {_sid(nm): nm for nm in {r["source"] for r in src_rows}}

    rows = sorted((tuple(sorted((name_of[a], name_of[b]))), v)
                  for (a, b), v in shared.items())
    by_name_sizes = {name_of[k]: v for k, v in sizes.items()}
    return pd.DataFrame({
        "source_a": [p[0] for p, _ in rows],
        "source_b": [p[1] for p, _ in rows],
        "shared": pd.Series([v for _, v in rows], dtype="int64"),
        "jaccard": [round(v / (by_name_sizes[p[0]] + by_name_sizes[p[1]]
                               - v), 6) for p, v in rows]})


def epoch_shuffle_rank(sf_dir: str, epoch: int = 1,
                       num_buckets: int = 32):
    """Deterministic training-epoch shuffle: every document gets an
    exact GLOBAL position in a pseudo-random order keyed by
    md5-lower-64('ep<epoch>-' + doc_id) — the reproducible corpus
    shuffle a training run applies before :func:`pack_sequences`
    (replayable across restarts and partitionings, unlike
    random_shuffle).

    Plan: global ranking WITHOUT a global sort operator — shuffle keys
    are uniform uint64, so RANGE-partitioning by high bits makes bucket
    order globally consistent: (1) one map pass computes keys and range
    buckets; (2) per-bucket counts (map-only partials) prefix-sum on
    the driver into bucket offsets (≤ num_buckets ints); (3) ONE
    exchange sorts within each bucket and adds its offset — every
    row's rank is exact, and no all-to-all Sort of the full corpus ever
    runs. Ties (2⁻⁶⁴ collisions) break by doc_id on both engines."""
    import hashlib

    import numpy as np

    ds = _read_docs(sf_dir, columns=["doc_id"])
    prefix = f"ep{epoch}-".encode()
    span = (2**64 + num_buckets - 1) // num_buckets

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        keys = np.fromiter(
            (int.from_bytes(hashlib.md5(prefix + str(d).encode())
                            .digest()[8:], "little") for d in ids),
            np.uint64, len(ids))
        return pd.DataFrame({
            "doc_id": ids, "key": keys,
            "__rb": (keys // np.uint64(span)).astype(np.int32)})

    keyed_ds = ds.map_batches(keyed, batch_format="pandas").materialize()

    counts = (keyed_ds.map_batches(
        lambda df: df.groupby("__rb", sort=False).size()
        .reset_index(name="n"), batch_format="pandas").to_pandas()
        .groupby("__rb")["n"].sum())
    offsets = {}
    acc = 0
    for rb in sorted(counts.index):
        offsets[int(rb)] = acc
        acc += int(counts[rb])

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["key", "doc_id"])
        base = offsets[int(g["__rb"].iloc[0])]
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "rank": np.arange(base, base + len(g), dtype=np.int64)})

    out = (keyed_ds.groupby("__rb")
           .map_groups(rank_bucket, batch_format="pandas"))
    return finish_sorted(out, "rank")


def ngram_novelty(sf_dir: str, n: int = 3, num_buckets: int = 64):
    """Per-document n-gram NOVELTY: the fraction of a doc's distinct
    word n-grams that no earlier document (by doc_id) contains — the
    curation signal behind "is this page new content or a remix",
    complementing the dedup family (a doc can evade near-dup thresholds
    yet be almost entirely recombined n-grams).

    Plan: one pass emits per-doc-distinct (gram-hash-pair, doc_id)
    rows (:func:`_doc_ngrams`, numeric-only exchange); ONE gram-hash
    bucket exchange then knows each gram's FIRST owner (min doc_id) and
    scores every (gram, doc) row in-task — novel ⟺ doc == first owner.
    Per-(doc, bucket) integer partials leave the kernel and one
    hash-aggregate sums them per doc (per-doc output is the result, so
    corpus-sized output is inherent, not a materialization smell). The
    single float step is the final novel/total divide, rounded 6dp on
    both engines."""
    import numpy as np

    docs = _read_docs(sf_dir, columns=["doc_id", "text"])

    def gram_rows(df: pd.DataFrame) -> pd.DataFrame:
        low = df.assign(text=df["text"].str.lower()).reset_index(drop=True)
        idx, h1, h2, _ = _doc_ngrams(low, n)
        out = pd.DataFrame({
            "doc_id": low["doc_id"].to_numpy(np.int64)[idx],
            "h1": h1, "h2": h2}).drop_duplicates()
        out["__gb"] = (out["h1"].to_numpy(np.uint64)
                       % np.uint64(num_buckets)).astype(np.int32)
        return out

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        first = (g.groupby(["h1", "h2"], sort=False)["doc_id"]
                 .transform("min"))
        novel = (g["doc_id"] == first).astype("int64")
        out = (pd.DataFrame({"doc_id": g["doc_id"], "novel": novel})
               .groupby("doc_id", sort=False)
               .agg(n_novel=("novel", "sum"), n_grams=("novel", "count"))
               .reset_index())
        out["n_novel"] = out["n_novel"].astype("int64")
        out["n_grams"] = out["n_grams"].astype("int64")
        return out

    partials = (docs.map_batches(gram_rows, batch_format="pandas")
                .groupby("__gb")
                .map_groups(lambda g: score_bucket(g.drop(columns="__gb")),
                            batch_format="pandas"))

    # per-doc sum via the repo's 64-bucket kernel (Ray's hash Aggregate
    # measured ~2x this plan's wall on near-singleton doc groups)
    def add_doc_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__db"] = (df["doc_id"].to_numpy(np.uint64)
                      % np.uint64(num_buckets)).astype(np.int32)
        return df

    def doc_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("doc_id", sort=False)
               .agg(n_novel=("n_novel", "sum"), n_grams=("n_grams", "sum"))
               .reset_index())
        out["n_novel"] = out["n_novel"].astype("int64")
        out["n_grams"] = out["n_grams"].astype("int64")
        out["novelty"] = (out["n_novel"] / out["n_grams"]).round(6)
        return out[["doc_id", "n_grams", "n_novel", "novelty"]]

    totals = (partials.map_batches(add_doc_bucket, batch_format="pandas")
              .groupby("__db")
              .map_groups(lambda g: doc_sum(g.drop(columns="__db")),
                          batch_format="pandas"))
    return finish_sorted(totals, "doc_id")


def inverted_index(sf_dir: str, k: int = 20, postings_cap: int = 20,
                   num_buckets: int = 32):
    """Inverted-index head: for the ``k`` highest-document-frequency
    terms, the df and the first ``postings_cap`` doc ids of the posting
    list — the IR index-build primitive (term → sorted docs), bounded to
    a deterministic head so the result is a query, not a corpus dump.

    Plan (the :func:`word_topk` three-stage shape, plus postings):

    1. per-batch DISTINCT (word, doc_id) pairs — explode + one
       drop_duplicates, so each block emits its batch-local posting
       fragments, never the token stream's multiplicity;
    2. per word-hash bucket: a word's ENTIRE posting list lands in one
       bucket, so the in-bucket distinct → per-word df is a final total;
       the per-bucket top-k by (df desc, word asc) prunes to ≤ k rows
       BEFORE any posting string is built (only survivors pay the
       sort + join — O(k · postings_cap) Python per bucket, not
       O(vocabulary));
    3. a one-task final over ≤ k × num_buckets rows.

    At 100 TB the exchange carries distinct (word, doc) pairs — the
    posting-list payload itself, which is what an index build must move
    by definition; stop-word-scale postings are pruned per bucket before
    leaving as strings."""
    import numpy as np

    docs = _read_docs(sf_dir, columns=["doc_id", "text"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"word": np.array([], object),
                                 "doc_id": np.array([], np.int64),
                                 "__wb": np.array([], np.int32)})
        toks = df["text"].str.lower().str.split(" ")
        words = np.concatenate(toks.to_numpy())
        ids = np.repeat(df["doc_id"].to_numpy(np.int64),
                        toks.str.len().to_numpy(np.int64))
        out = (pd.DataFrame({"word": words, "doc_id": ids})
               .drop_duplicates())
        out["__wb"] = (pd.util.hash_pandas_object(out["word"], index=False)
                       .to_numpy(np.uint64) % np.uint64(num_buckets)
                       ).astype(np.int32)
        return out

    def bucket_index(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["word", "doc_id"])
        dfreq = g.groupby("word", sort=False).size()
        top = (dfreq.reset_index(name="df")
               .sort_values(["df", "word"], ascending=[False, True])
               .head(k))
        sub = g[g["word"].isin(set(top["word"]))]
        postings = (sub.sort_values(["word", "doc_id"])
                    .groupby("word", sort=False)["doc_id"]
                    .apply(lambda s: ",".join(
                        s.head(postings_cap).astype(str))))
        top = top.set_index("word")
        return pd.DataFrame({
            "word": top.index.to_numpy(object),
            "df": top["df"].to_numpy(np.int64),
            "postings": postings.reindex(top.index).to_numpy(object)})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["df", "word"], ascending=[False, True])
                .head(k).reset_index(drop=True))

    return (docs.map_batches(pairs, batch_format="pandas")
            .groupby("__wb")
            .map_groups(lambda g: bucket_index(g.drop(columns="__wb")),
                        batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


_BPE_MARK = chr(183)    # symbol-start marker: absent from the corpus,
                        # makes literal pair replacement boundary-safe


def bpe_train(sf_dir: str, num_merges: int = 8, k: int = 30,
              params_out: str | None = None):
    """ITERATIVE BPE tokenizer training (Sennrich et al. 2016), the
    full merge loop — not just one pair-count round
    (:func:`bpe_pair_counts`): build the weighted word vocabulary once,
    then ``num_merges`` rounds of (distributed adjacent-pair count over
    the symbolized vocab → argmax pair → distributed merge apply), and
    finally the corpus token counts under the learned merges.

    Classic trick: training operates on the DISTINCT-WORD vocabulary
    weighted by occurrence counts — one word-hash exchange builds it,
    after which every round is vocab-sized, not corpus-sized. Symbols
    carry a start marker so literal string replacement can never match
    a symbol suffix; both engines apply the same left-to-right
    non-overlapping replace. The merge table publishes as the fitted
    sidecar; the oracle re-applies it with a RECURSIVE CTE and
    re-derives the final token counts — the iterative trainer is
    exact-oracled end to end (integer counts, no floats anywhere)."""
    from cdcsdk_server_ray.stages.aggregate import grouped_aggregate

    docs = _read_docs(sf_dir, columns=["text"])

    def word_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.split(" ")
        vc = pd.Series(np.concatenate(toks.to_numpy())).value_counts()
        return pd.DataFrame({"word": vc.index.to_numpy(object),
                             "n": vc.to_numpy(np.int64)})

    vocab = grouped_aggregate(
        docs.map_batches(word_partial, batch_format="pandas"),
        ["word"], {"n": ("n", "sum")}, final="shuffle")

    def symbolize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["s"] = df["word"].map(
            lambda w: " ".join(_BPE_MARK + c for c in w))
        return df

    cur = vocab.map_batches(symbolize,
                            batch_format="pandas").materialize()

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows: dict[str, int] = {}
        syms = df["s"].str.split(" ")
        ns = df["n"].to_numpy(np.int64)
        for toks, n in zip(syms.to_numpy(), ns):
            for a, b in zip(toks, toks[1:]):
                key = a + " " + b
                rows[key] = rows.get(key, 0) + int(n)
        # Arrow output: empty object-dtype pandas columns trip Ray's
        # block-size estimator (np.vectorize on size-0) — string-typed
        # Arrow arrays size cleanly either way
        return pa.table({"pair": pa.array(list(rows), pa.string()),
                         "cnt": pa.array(list(rows.values()),
                                         pa.int64())})

    merges: list[tuple[int, str, str]] = []
    for i in range(num_merges):
        counts = (cur.map_batches(pair_partial, batch_format="pandas")
                  .to_pandas())
        if not len(counts):
            break
        tot = counts.groupby("pair")["cnt"].sum().reset_index()
        tot = tot.sort_values(["cnt", "pair"],
                              ascending=[False, True])
        pat = str(tot["pair"].iloc[0])
        rep = pat.replace(" " + _BPE_MARK, "")
        merges.append((i, pat, rep))

        def apply_merge(df: pd.DataFrame, pat=pat,
                        rep=rep) -> pd.DataFrame:
            df = df.copy()
            df["s"] = df["s"].str.replace(pat, rep, regex=False)
            return df

        cur = cur.map_batches(apply_merge,
                              batch_format="pandas").materialize()

    if params_out:
        import pyarrow.parquet as pq
        t = pa.table({
            "idx": pa.array([m[0] for m in merges], pa.int64()),
            "pat": pa.array([m[1] for m in merges], pa.string()),
            "rep": pa.array([m[2] for m in merges], pa.string())})
        tmp = f"{params_out}.tmp{__import__('os').getpid()}"
        pq.write_table(t, tmp)
        __import__("os").replace(tmp, params_out)

    def token_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows: dict[str, int] = {}
        for toks, n in zip(df["s"].str.split(" ").to_numpy(),
                           df["n"].to_numpy(np.int64)):
            for t_ in toks:
                rows[t_] = rows.get(t_, 0) + int(n)
        return pa.table({"token": pa.array(list(rows), pa.string()),
                         "cnt": pa.array(list(rows.values()),
                                         pa.int64())})

    toks = (cur.map_batches(token_partial, batch_format="pandas")
            .to_pandas())
    tot = (toks.groupby("token")["cnt"].sum().reset_index()
           .sort_values(["cnt", "token"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    # strip the marker for the presentation form (tokens are unique
    # with or without it — every symbol starts with exactly one mark)
    return pd.DataFrame({
        "token": tot["token"].str.replace(_BPE_MARK, "", regex=False),
        "cnt": tot["cnt"].to_numpy(np.int64)})
