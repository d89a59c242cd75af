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

    return docs.map_batches(count, batch_format="pyarrow").sort("doc_id")


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

    return docs.map_batches(score, batch_format="pyarrow").sort("doc_id")


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
    return docs.map_batches(LangId, batch_format="pandas",
                            batch_size=512, concurrency=(1, 8)).sort("doc_id")


class Fingerprinter:
    """Winnowed rolling-hash document fingerprint (MOSS-style): k-gram
    rolling hashes → min hash per window → distinct fingerprint count.
    State (window/k) fixed per actor."""

    def __init__(self, k: int = 8, window: int = 4):
        self.k, self.window = k, window

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out_id, out_fp, out_n = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            b = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
            if len(b) < self.k:
                b = np.pad(b, (0, self.k - len(b)))
            win = np.lib.stride_tricks.sliding_window_view(b, self.k).astype(np.uint64)
            mult = np.uint64(257) ** np.arange(self.k, dtype=np.uint64)
            with np.errstate(over="ignore"):
                h = (win * mult).sum(axis=1)
            if len(h) >= self.window:
                mins = np.lib.stride_tricks.sliding_window_view(h, self.window).min(axis=1)
            else:
                mins = h
            fps = np.unique(mins)
            with np.errstate(over="ignore"):
                doc_fp = np.bitwise_xor.reduce(fps * np.uint64(0x9E3779B97F4A7C15))
            out_id.append(doc_id)
            out_fp.append(np.int64(doc_fp.astype(np.int64)))
            out_n.append(len(fps))
        return pd.DataFrame({"doc_id": out_id, "fingerprint": out_fp,
                             "n_distinct_grams": out_n})


def fingerprints(sf_dir: str):
    docs = _read_docs(sf_dir, columns=["doc_id", "text"])
    return docs.map_batches(Fingerprinter, batch_format="pandas",
                            batch_size=512, concurrency=(1, 8)).sort("doc_id")


def quality_filter(sf_dir: str, max_punct_ratio: float = 0.05,
                   min_tokens: int = 20):
    """Quality FILTERING (the keep/drop decision a training-data pipeline
    actually makes): keep documents under a punctuation-ratio bound and
    over a token-count floor. Vectorized predicate inside map_batches."""
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

    return docs.map_batches(keep, batch_format="pyarrow").sort("doc_id")


def sample_documents(sf_dir: str, permille: int = 100):
    """Deterministic hash sampling (the reproducible alternative to
    ds.random_sample): keep docs where Knuth-hash(doc_id) mod 1000 <
    permille. Identical arithmetic is SQL-expressible, so the sample is
    oracle-checked — and stable across partitioning, resume, and replays
    (seeded random_sample is none of those)."""
    docs = _read_docs(sf_dir, columns=["doc_id", "lang", "n_chars"])

    def keep(t: pa.Table) -> pa.Table:
        h = pc.multiply(t["doc_id"], 2654435761)
        bucket = pc.subtract(h, pc.multiply(pc.divide(h, 1000), 1000))
        return t.filter(pc.less(bucket, permille))

    return docs.map_batches(keep, batch_format="pyarrow").sort("doc_id")
