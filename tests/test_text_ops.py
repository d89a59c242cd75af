"""Round-3 training-data text/window operators vs brute-force pandas
oracles at sf0.001: TF-IDF, within-doc n-gram repetition, per-source
quota cap, tumbling event-time windows. (The driver also checks each
against a DuckDB SQL oracle at sf0.01 — these are the fast local gates.)
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from cdcsdk_server_ray.pipelines.text import (bm25, bm25_search,
                                              bpe_pair_counts,
                                              cap_per_source,
                                              decontaminate,
                                              dup_ngram_stats, tfidf,
                                              train_test_split,
                                              word_topk)
from cdcsdk_server_ray.pipelines.windows import tumbling_counts

SF = "/root/testdata/sf0.001"


def _docs():
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


def test_tfidf_matches_bruteforce(ray_session):
    got = tfidf(SF).to_pandas().sort_values(
        ["doc_id", "term"]).reset_index(drop=True)
    docs = _docs()
    n_docs = len(docs)
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = text.lower().strip().split()
        counts = pd.Series(toks).value_counts()
        rows.extend((doc_id, t, int(c)) for t, c in counts.items())
    tf = pd.DataFrame(rows, columns=["doc_id", "term", "tf"])
    df_map = tf.groupby("term")["doc_id"].size()
    tf["df"] = tf["term"].map(df_map).astype("int64")
    exp = tf[tf["tf"] >= 3].copy()
    exp["tfidf"] = np.round(
        exp["tf"].to_numpy(np.float64)
        * np.log(n_docs / exp["df"].to_numpy(np.float64)), 6)
    exp = exp.sort_values(["doc_id", "term"]).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    assert got["term"].tolist() == exp["term"].tolist()
    assert got["tf"].tolist() == exp["tf"].tolist()
    assert got["df"].tolist() == exp["df"].tolist()
    np.testing.assert_allclose(got["tfidf"], exp["tfidf"], rtol=0, atol=0)


def test_bm25_matches_bruteforce(ray_session):
    k1, b = 1.2, 0.75
    got = bm25(SF).to_pandas().sort_values(
        ["doc_id", "term"]).reset_index(drop=True)
    docs = _docs()
    n_docs = len(docs)
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = text.lower().strip().split()
        counts = pd.Series(toks).value_counts()
        rows.extend((doc_id, t, int(c), len(toks))
                    for t, c in counts.items())
    tf = pd.DataFrame(rows, columns=["doc_id", "term", "tf", "dl"])
    avgdl = tf.drop_duplicates("doc_id")["dl"].sum() / n_docs
    df_map = tf.groupby("term")["doc_id"].size()
    tf["df"] = tf["term"].map(df_map).astype("int64")
    exp = tf[tf["tf"] >= 3].copy()
    tf_f = exp["tf"].to_numpy(np.float64)
    df_f = exp["df"].to_numpy(np.float64)
    dl_f = exp["dl"].to_numpy(np.float64)
    idf = np.log((float(n_docs) - df_f + 0.5) / (df_f + 0.5) + 1.0)
    exp["bm25"] = np.round(
        idf * (tf_f * (k1 + 1.0)
               / (tf_f + k1 * (1.0 - b + b * dl_f / avgdl))), 6)
    exp = exp.sort_values(["doc_id", "term"]).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    assert got["term"].tolist() == exp["term"].tolist()
    assert got["tf"].tolist() == exp["tf"].tolist()
    assert got["df"].tolist() == exp["df"].tolist()
    assert got["dl"].tolist() == exp["dl"].tolist()
    np.testing.assert_allclose(got["bm25"], exp["bm25"], rtol=0, atol=0)


def test_bm25_search_matches_bruteforce(ray_session):
    k1, b, k = 1.2, 0.75, 100
    terms = ("merge", "stream", "window")
    got = bm25_search(SF, terms=terms, k=k).to_pandas()
    docs = _docs()
    n_docs = len(docs)
    tok = {d: t.lower().strip().split()
           for d, t in zip(docs["doc_id"], docs["text"])}
    avgdl = sum(len(v) for v in tok.values()) / n_docs
    df_map = {t: sum(t in set(v) for v in tok.values()) for t in terms}
    idf = {t: np.log((n_docs - df_map[t] + 0.5) / (df_map[t] + 0.5) + 1.0)
           for t in terms}
    rows = []
    for d, v in tok.items():
        s = 0
        for t in terms:
            tf = v.count(t)
            if not tf:
                continue
            s += int(np.round(idf[t] * (tf * (k1 + 1.0)
                     / (tf + k1 * (1.0 - b + b * len(v) / avgdl))) * 1e6))
        if s:
            rows.append((d, s))
    exp = (pd.DataFrame(rows, columns=["doc_id", "score_micro"])
           .sort_values(["score_micro", "doc_id"],
                        ascending=[False, True]).head(k)
           .reset_index(drop=True))
    assert len(got) == len(exp) > 0
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["score_micro"].tolist() == exp["score_micro"].tolist()


def test_dup_ngram_stats_counts_and_ratio(ray_session):
    got = dup_ngram_stats(SF).to_pandas().set_index("doc_id")
    docs = _docs()
    checked = 0
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = text.strip().split()
        if len(toks) < 3:
            assert doc_id not in got.index
            continue
        grams = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
        row = got.loc[doc_id]
        assert row["n_ngrams"] == len(grams)
        assert row["n_distinct"] == len(set(grams))
        assert row["dup_ratio"] == 1.0 - len(set(grams)) / len(grams)
        checked += 1
    assert checked > 0


def test_cap_per_source_quota_and_rank(ray_session):
    k = 50
    got = cap_per_source(SF, k=k).to_pandas()
    docs = _docs()
    for source, g in docs.groupby("source"):
        sub = got[got["source"] == source]
        expect_ids = sorted(g["doc_id"])[:k]
        assert sub["doc_id"].tolist() == expect_ids
        assert sub["src_rank"].tolist() == list(range(1, len(expect_ids) + 1))
    assert set(got["source"]) == set(docs["source"])


def test_train_test_split_deterministic_and_disjoint(ray_session):
    got = train_test_split(SF).to_pandas()
    docs = _docs()
    assert len(got) == len(docs)                      # total partition
    bucket = ((docs["doc_id"].astype("int64") + 104729)
              * 2654435761) % 1000
    exp = np.where(bucket < 100, "test",
                   np.where(bucket < 150, "val", "train"))
    exp_map = dict(zip(docs["doc_id"], exp))
    assert [exp_map[d] for d in got["doc_id"]] == got["split"].tolist()
    # both splits present and ratios roughly match the permille targets
    frac = got["split"].value_counts(normalize=True)
    assert 0.03 < frac.get("test", 0) < 0.2
    assert frac.get("train", 0) > 0.7
    # re-run is byte-identical (stable across partitioning/replay)
    again = train_test_split(SF).to_pandas()
    assert again["split"].tolist() == got["split"].tolist()


def test_tumbling_counts_match_pandas(ray_session):
    got = tumbling_counts(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["window_start"] = ev["ts"].dt.floor("h")
    exp = (ev.groupby(["window_start", "event_type"])
           .agg(n_events=("value", "size"), max_value=("value", "max"))
           .reset_index().sort_values(["window_start", "event_type"])
           .reset_index(drop=True))
    assert got[["window_start", "event_type"]].values.tolist() == \
        exp[["window_start", "event_type"]].values.tolist()
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    np.testing.assert_allclose(got["max_value"], exp["max_value"])
    # exact-decimal sum: scaled-int sums are order-independent
    exp_sum = (ev.assign(v2=(ev["value"] * 100).round().astype("int64"))
               .groupby(["window_start", "event_type"])["v2"].sum() / 100)
    np.testing.assert_allclose(got["sum_value"], exp_sum.to_numpy())


def test_word_topk_matches_bruteforce(ray_session):
    got = word_topk(SF, k=50).to_pandas()
    docs = _docs()
    all_toks = []
    for text in docs["text"]:
        all_toks.extend(text.lower().strip().split())
    vc = pd.Series(all_toks).value_counts()
    exp = (pd.DataFrame({"word": vc.index, "n": vc.to_numpy(np.int64)})
           .sort_values(["n", "word"], ascending=[False, True])
           .head(50).reset_index(drop=True))
    assert got["word"].tolist() == exp["word"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()


def test_bpe_pair_counts_matches_bruteforce(ray_session):
    got = bpe_pair_counts(SF, k=50).to_pandas()
    docs = _docs()
    all_pairs = []
    for text in docs["text"]:
        toks = text.lower().strip().split()
        all_pairs.extend(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    vc = pd.Series(all_pairs).value_counts()
    exp = (pd.DataFrame({"pair": vc.index, "n": vc.to_numpy(np.int64)})
           .sort_values(["n", "pair"], ascending=[False, True])
           .head(50).reset_index(drop=True))
    assert got["pair"].tolist() == exp["pair"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()
    # no cross-doc pairs: every reported pair occurs inside some doc
    joined = " ␞ ".join(docs["text"].str.lower().str.strip())
    assert all(p in joined for p in got["pair"][:5])


def test_collocations_pmi_matches_bruteforce(ray_session):
    import math

    from cdcsdk_server_ray.pipelines.text import collocations_pmi
    got = collocations_pmi(SF, k=50)
    docs = _docs()
    all_pairs, all_toks = [], []
    for text_ in docs["text"]:
        toks = text_.lower().strip().split()
        all_toks.extend(toks)
        all_pairs.extend(zip(toks, toks[1:]))
    pc_ = pd.Series(all_pairs).value_counts()
    uc = pd.Series(all_toks).value_counts()
    n_tokens, n_pairs = len(all_toks), len(all_pairs)
    exp = (pd.DataFrame({"w1": [p[0] for p in pc_.index],
                         "w2": [p[1] for p in pc_.index],
                         "n": pc_.to_numpy(np.int64)})
           .sort_values(["n", "w1", "w2"], ascending=[False, True, True])
           .head(50).reset_index(drop=True))
    exp["pmi"] = [round(math.log((n / n_pairs)
                                 / ((uc[a] / n_tokens)
                                    * (uc[b] / n_tokens))), 6)
                  for a, b, n in zip(exp["w1"], exp["w2"], exp["n"])]
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.astype({"n": "int64"}))


def test_decontaminate_flags_benchmark_and_counts(ray_session):
    got = decontaminate(SF).to_pandas().set_index("doc_id")
    docs = _docs()
    grams = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = text.strip().split()
        if len(toks) >= 5:
            grams[doc_id] = {" ".join(toks[i:i + 5])
                             for i in range(len(toks) - 4)}
    bench = set().union(*(g for d, g in grams.items() if d % 97 == 0))
    assert bench, "sf0.001 must contain at least one benchmark doc"
    for doc_id, g in grams.items():
        row = got.loc[doc_id]
        assert row["n_distinct"] == len(g)
        assert row["n_hits"] == len(g & bench)
        assert bool(row["contaminated"]) == bool(g & bench)
        if doc_id % 97 == 0:  # benchmark docs flag themselves entirely
            assert row["n_hits"] == row["n_distinct"]
            assert row["contaminated"]
    # short docs emit no row, matching the SQL inner shape
    assert set(got.index) == set(grams)


def test_hopping_counts_cover_each_event_k_times(ray_session):
    from cdcsdk_server_ray.pipelines.windows import hopping_counts
    got = hopping_counts(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    # every event lands in exactly size/hop = 4 windows
    assert got["n_events"].sum() == 4 * len(ev)
    # brute-force one window: all events with base floor in the window
    ev["base"] = ev["ts"].dt.floor("15min")
    w0 = got.iloc[0]
    in_w = ev[(ev["base"] >= w0["window_start"])
              & (ev["base"] < w0["window_start"] + pd.Timedelta(minutes=60))
              & (ev["event_type"] == w0["event_type"])]
    assert w0["n_events"] == len(in_w)
    np.testing.assert_allclose(w0["max_value"],
                               round(in_w["value"].max(), 2))


def test_range_join_matches_bruteforce(ray_session):
    from cdcsdk_server_ray.pipelines.analytics import range_join_value_bands
    got = range_join_value_bands(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    nat = pq.read_table(f"{SF}/nation.parquet").to_pandas()
    rows = []
    for bid in nat["n_nationkey"]:
        lo, hi = bid * 15.0, bid * 15.0 + 40.0
        m = ev[(ev["value"] >= lo) & (ev["value"] < hi)]
        rows.extend((bid, e, v, lo, hi)
                    for e, v in zip(m["event_id"], m["value"]))
    exp = (pd.DataFrame(rows, columns=["band_id", "event_id", "value",
                                       "lo", "hi"])
           .sort_values(["band_id", "event_id"]).reset_index(drop=True))
    assert len(got) == len(exp) > 0
    assert got["band_id"].tolist() == exp["band_id"].tolist()
    assert got["event_id"].tolist() == exp["event_id"].tolist()
    np.testing.assert_array_equal(got["value"], exp["value"])
    # overlap is real: some events match more than one band
    assert got["event_id"].duplicated().any()


def test_repetition_stats_matches_bruteforce(ray_session):
    from cdcsdk_server_ray.pipelines.text import repetition_stats
    got = repetition_stats(SF).to_pandas().set_index("doc_id")
    docs = _docs()
    assert len(got) == len(docs)
    saw_dup = saw_bigram = 0
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = text.strip().split() or [""]
        wc = pd.Series(toks).value_counts()
        row = got.loc[doc_id]
        assert row["top_word_frac"] == wc.max() / wc.sum()
        assert row["dup_word_frac"] == 1.0 - len(wc) / len(toks)
        grams = [toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)]
        if grams:
            gc = pd.Series(grams).value_counts()
            mass = max(c * len(g) for g, c in gc.items())
            assert row["top_bigram_char_frac"] == mass / len(text)
            saw_bigram += gc.max() > 1
        else:
            assert row["top_bigram_char_frac"] == 0.0
        saw_dup += len(wc) < len(toks)
    # the synthetic corpus must actually exercise the repetition paths
    assert saw_dup > 0 and saw_bigram > 0


def test_pack_sequences_matches_prefix_scan(ray_session):
    from cdcsdk_server_ray.pipelines.text import pack_sequences
    target = 2048
    # tiny bucket_span so the test crosses many bucket boundaries
    got = pack_sequences(SF, target_tokens=target, bucket_span=37).to_pandas()
    docs = _docs().sort_values("doc_id")
    n = docs["text"].str.strip().str.split(r"\s+", regex=True).str.len()
    prev = n.cumsum().shift(fill_value=0).to_numpy("int64")
    exp_seq = prev // target
    assert got["doc_id"].tolist() == docs["doc_id"].tolist()
    assert got["n_tokens"].tolist() == n.astype("int64").tolist()
    assert got["seq_id"].tolist() == exp_seq.tolist()
    # packing must actually produce multi-doc bins AND multiple bins
    assert got["seq_id"].nunique() > 1
    assert (got.groupby("seq_id").size() > 1).any()


def test_quality_quantile_filter_matches_bruteforce(ray_session):
    from cdcsdk_server_ray.pipelines.text import quality_quantile_filter
    got = quality_quantile_filter(SF).to_pandas()
    docs = _docs()
    toks = docs["text"].str.strip().str.split(r"\s+", regex=True)
    nonspace = docs["text"].str.replace(r"\s", "", regex=True).str.len()
    raw = (nonspace.to_numpy(np.float64)
           / toks.str.len().to_numpy(np.float64))
    # half-away-from-zero at 3 decimals, matching DuckDB round() and the
    # operator's Arrow round_mode (np.round is half-to-even and differs
    # exactly at the representable ####.5 ties)
    mtl = np.floor(raw * 1000.0 + 0.5) / 1000.0
    n = len(mtl)
    srt = np.sort(mtl)
    thr = srt[(900 * n + 999) // 1000 - 1]
    exp = docs.loc[mtl <= thr, "doc_id"].sort_values().tolist()
    assert got["doc_id"].tolist() == exp
    exp_mtl = [m for _, m in sorted(zip(docs["doc_id"], mtl)) if m <= thr]
    np.testing.assert_allclose(got["mean_token_len"], exp_mtl,
                               rtol=0, atol=0)
    # the filter must actually drop the long-token tail
    assert 0 < len(got) < len(docs)


def test_pii_redact_counts_and_placeholders(ray_session):
    from cdcsdk_server_ray.pipelines.text import pii_redact

    got = pii_redact(SF).to_pandas()
    docs = _docs()
    assert len(got) == len(docs)
    # the deterministic augmentation seeds exactly one of each PII class
    assert (got["n_emails"] == 1).all()
    assert (got["n_ips"] == 1).all()
    assert (got["n_phones"] == 1).all()
    red = got["redacted"]
    assert red.str.contains("<EMAIL>", regex=False).all()
    assert red.str.contains("<IP>", regex=False).all()
    assert red.str.contains("<PHONE>", regex=False).all()
    # nothing PII-shaped survives redaction
    assert not red.str.contains("@example-").any()
    assert not red.str.contains(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
                                regex=True).any()
    # the original text prefix is untouched
    m = got.merge(docs[["doc_id", "text"]], on="doc_id")
    assert all(r.startswith(t) for r, t in zip(m["redacted"], m["text"]))


def test_heavy_hitters_exact_vs_bruteforce(ray_session):
    from cdcsdk_server_ray.pipelines.text import heavy_hitters

    k = 100
    got = heavy_hitters(SF, k=k).to_pandas()
    words = pd.Series(np.concatenate(
        [t.lower().strip().split() for t in _docs()["text"]]))
    vc = words.value_counts()
    n = int(vc.sum())
    exp = (vc[vc * k > n].rename_axis("word").reset_index(name="n")
           .sort_values("word").reset_index(drop=True))
    exp["n"] = exp["n"].astype("int64")
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) > 0          # non-vacuous on the word-soup corpus


def test_sample_mix_rates_and_determinism(ray_session):
    from cdcsdk_server_ray.pipelines.text import sample_mix

    got = sample_mix(SF).to_pandas()
    docs = _docs()
    sfx = docs["source"].str[3:].astype(int)
    permille = (200 + 40 * (sfx % 10)).astype("int64")
    h = ((docs["doc_id"] + 7919) * 2654435761) % 1000
    exp = docs[h < permille].copy()
    exp["keep_permille"] = permille[h < permille]
    exp = (exp[["doc_id", "source", "lang", "n_chars", "keep_permille"]]
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp, check_dtype=False)
    again = sample_mix(SF).to_pandas()
    pd.testing.assert_frame_equal(got, again)


def test_chunk_documents_overlap_and_coverage(ray_session):
    """Chunks cover every token; consecutive chunks overlap by
    chunk_tokens - stride; chunk k starts at token k*stride."""
    from cdcsdk_server_ray.pipelines.text import chunk_documents
    sf = "/root/testdata/sf0.001"
    got = chunk_documents(sf).to_pandas()
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    doc = docs.iloc[docs["n_chars"].idxmax()]
    toks = doc["text"].strip().split()
    mine = got[got["doc_id"] == doc["doc_id"]].sort_values("chunk_id")
    assert len(mine) == -(-len(toks) // 48)          # ceil(n/stride)
    for _, r in mine.iterrows():
        start = int(r["chunk_id"]) * 48
        expect = toks[start:start + 64]
        assert r["chunk_text"].split(" ") == expect
        assert r["n_tokens"] == len(expect)


def test_corpus_prep_composition(ray_session):
    """End-to-end corpus prep: every cleaned doc passed the quality
    filter AND survived dedup; bins respect the token budget."""
    from cdcsdk_server_ray.pipelines.corpus_prep import corpus_prep
    from cdcsdk_server_ray.pipelines.dedup import dedup_survivors
    from cdcsdk_server_ray.pipelines.text import quality_filter
    sf = "/root/testdata/sf0.001"
    out, n_clean = corpus_prep(sf)
    kept = set(quality_filter(sf).to_pandas()["doc_id"])
    surv = set(dedup_survivors(sf).to_pandas()["doc_id"])
    assert n_clean == len(kept & surv)
    assert out["n_docs"].sum() == n_clean
    # every bin except possibly the last stays within ~budget+max_doc
    assert (out["n_tokens"].iloc[:-1] >= 1500).all()


def test_language_id_and_fingerprints_deterministic(ray_session):
    """Rows-only operators still get exact local checks: (a) both are
    deterministic across runs (replay contract); (b) the fingerprint of
    identical text is identical and the single-process computation
    agrees with the distributed one; (c) language codes come from the
    classifier's closed label set."""
    import pyarrow.parquet as pq
    from cdcsdk_server_ray.pipelines.text import (Fingerprinter,
                                                  fingerprints, language_id)
    sf = "/root/testdata/sf0.001"
    l1 = language_id(sf).to_pandas()
    l2 = language_id(sf).to_pandas()
    pd.testing.assert_frame_equal(l1, l2)
    assert l1["lang_pred"].notna().all() if "lang_pred" in l1 else True

    f1 = fingerprints(sf).to_pandas()
    f2 = fingerprints(sf).to_pandas()
    pd.testing.assert_frame_equal(f1, f2)
    # single-process parity on a sample
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas().head(25)
    ref = Fingerprinter()(docs)
    mine = f1.set_index("doc_id")
    for _, r in ref.iterrows():
        for col in ref.columns:
            if col == "doc_id":
                continue
            assert mine.loc[r["doc_id"], col] == r[col]


def test_lm_perplexity_matches_bruteforce(ray_session):
    """Distributed train+score must equal a single-process add-one
    bigram LM computed directly over the same corpus, integer-exact."""
    import math

    from cdcsdk_server_ray.pipelines.text import lm_perplexity

    got = lm_perplexity(SF).to_pandas().set_index("doc_id")

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    import re
    toks = {r.doc_id: re.split(r"\s+", r.text.lower().strip())
            for r in docs.itertuples()}
    from collections import Counter
    c2 = Counter(p for ts in toks.values() for p in zip(ts, ts[1:]))
    c1 = Counter()
    for (a, _b), c in c2.items():
        c1[a] += c
    vocab = {a for a, _ in c2} | {b for _, b in c2}
    v = max(1, len(vocab))
    q = {p: round(1e6 * (math.log(c1[p[0]] + v) - math.log(c + 1)))
         for p, c in c2.items()}
    for doc_id, ts in toks.items():
        pairs = list(zip(ts, ts[1:]))
        total = sum(q[p] for p in pairs)      # all pairs seen: self-corpus
        row = got.loc[doc_id]
        assert row["n_bigrams"] == len(pairs)
        assert row["nll_micronats"] == total
        exp_avg = total // len(pairs) if pairs else 0
        assert row["avg_nll_micronats"] == exp_avg
    assert len(got) == len(docs)


def test_dsir_weights_match_bruteforce(ray_session):
    """Distributed count+score must equal a single-process DSIR
    computation (hashed unigrams, add-one smoothed log ratio quantized
    to micronats) — integer-exact. Catches fit bugs the sidecar-based
    SQL oracle cannot see (both engines score with the same sidecar)."""
    import hashlib
    import math
    import re
    from collections import Counter

    from cdcsdk_server_ray.pipelines.text import dsir_weights

    got = dsir_weights(SF).to_pandas().set_index("doc_id")

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text", "source"])
    nf = 1024
    feat = lambda t: int.from_bytes(
        hashlib.md5(t.encode()).digest()[8:], "little") % nf
    toks = {r.doc_id: [feat(t) for t in
                       re.split(r"\s+", r.text.lower().strip())]
            for r in docs.itertuples()}
    c_all = Counter(f for fs in toks.values() for f in fs)
    tgt_ids = set(docs[docs["source"] == "src0"]["doc_id"])
    c_tgt = Counter(f for d, fs in toks.items() if d in tgt_ids
                    for f in fs)
    n_all, n_tgt = sum(c_all.values()), sum(c_tgt.values())
    assert n_tgt > 0, "target domain empty — test would be vacuous"
    lr = {f: round(1e6 * (math.log((c_tgt[f] + 1) / (n_tgt + nf))
                          - math.log((c_all[f] + 1) / (n_all + nf))))
          for f in range(nf)}
    for doc_id, fs in toks.items():
        row = got.loc[doc_id]
        assert row["n_tokens"] == len(fs)
        assert row["logw_micronats"] == sum(lr[f] for f in fs)
    # the weights discriminate: target-domain docs score higher per
    # token (totals are confounded by document length)
    per_tok = got["logw_micronats"] / got["n_tokens"]
    m_tgt = per_tok.loc[sorted(tgt_ids)].mean()
    m_rest = per_tok.drop(index=sorted(tgt_ids)).mean()
    assert m_tgt > m_rest


def test_token_entropy_matches_bruteforce(ray_session):
    import math

    from cdcsdk_server_ray.pipelines.text import token_entropy
    got = token_entropy(SF).to_pandas().set_index("doc_id")
    docs = _docs()
    for doc_id, text_ in zip(docs["doc_id"][:50], docs["text"][:50]):
        toks = text_.lower().strip().split()
        vc = pd.Series(toks).value_counts()
        ent = round(sum(-(c / len(toks)) * math.log(c / len(toks))
                        for c in vc), 6)
        row = got.loc[doc_id]
        assert row["n_tokens"] == len(toks)
        assert row["n_distinct"] == len(vc)
        assert abs(row["entropy"] - ent) < 2e-6


def test_source_overlap_matches_bruteforce(ray_session):
    """Cross-source 5-gram containment vs a pure-pandas bruteforce over
    the same md5-lower-64 gram identities."""
    import hashlib

    from cdcsdk_server_ray.pipelines.text import source_overlap

    got = source_overlap(SF)

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text", "source"])
    per_source: dict[str, set] = {}
    for text, src in zip(docs["text"], docs["source"]):
        w = text.lower().split(" ")
        s = per_source.setdefault(src, set())
        for i in range(max(0, len(w) - 4)):
            g = " ".join(w[i:i + 5]).encode()
            s.add(int.from_bytes(hashlib.md5(g).digest()[8:], "little"))
    rows = []
    for a in sorted(per_source):
        for b in sorted(per_source):
            if a < b:
                inter = len(per_source[a] & per_source[b])
                if inter:
                    rows.append((a, b, inter, round(
                        inter / len(per_source[a] | per_source[b]), 6)))
    assert got["source_a"].tolist() == [r[0] for r in rows]
    assert got["source_b"].tolist() == [r[1] for r in rows]
    assert got["shared"].tolist() == [r[2] for r in rows]
    assert got["jaccard"].tolist() == [r[3] for r in rows]


def test_epoch_shuffle_rank_exact_permutation(ray_session):
    """Global ranks are an exact 0..n-1 permutation, deterministic
    across runs, and different across epochs."""
    import hashlib

    from cdcsdk_server_ray.pipelines.text import epoch_shuffle_rank

    got = epoch_shuffle_rank(SF).to_pandas()
    n = len(pd.read_parquet(f"{SF}/documents.parquet",
                            columns=["doc_id"]))
    assert sorted(got["rank"]) == list(range(n))
    # matches the driver-side key order exactly
    keys = {d: int.from_bytes(hashlib.md5(f"ep1-{d}".encode())
                              .digest()[8:], "little")
            for d in got["doc_id"]}
    exp_order = sorted(keys, key=lambda d: (keys[d], d))
    assert got.sort_values("rank")["doc_id"].tolist() == exp_order
    # a different epoch produces a different permutation
    other = epoch_shuffle_rank(SF, epoch=2).to_pandas()
    assert other.sort_values("rank")["doc_id"].tolist() != exp_order


def test_ngram_novelty_matches_bruteforce(ray_session):
    """Per-doc novelty vs a python first-owner bruteforce."""
    from cdcsdk_server_ray.pipelines.text import ngram_novelty

    got = ngram_novelty(SF).to_pandas().set_index("doc_id")

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    per_doc = {}
    first = {}
    for d, t in sorted(zip(docs["doc_id"], docs["text"])):
        w = t.lower().strip().split()
        gs = {" ".join(w[i:i + 3]) for i in range(max(0, len(w) - 2))}
        per_doc[d] = gs
        for g in gs:
            first.setdefault(g, d)
    for d, gs in per_doc.items():
        if not gs:
            continue
        novel = sum(1 for g in gs if first[g] == d)
        assert got.loc[d, "n_grams"] == len(gs)
        assert got.loc[d, "n_novel"] == novel
        assert got.loc[d, "novelty"] == round(novel / len(gs), 6)


def test_inverted_index_matches_bruteforce(ray_session):
    """Posting-list head: df and capped postings equal a pandas
    bruteforce under the single-space tokenizer."""
    import numpy as np

    from cdcsdk_server_ray.pipelines.text import inverted_index

    out = inverted_index(SF, k=10, postings_cap=5).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    toks = docs["text"].str.lower().str.split(" ")
    pairs = pd.DataFrame({
        "word": np.concatenate(toks.to_numpy()),
        "doc_id": np.repeat(docs["doc_id"].to_numpy(),
                            toks.str.len())}).drop_duplicates()
    dfreq = pairs.groupby("word").size().reset_index(name="df")
    top = dfreq.sort_values(["df", "word"],
                            ascending=[False, True]).head(10)
    assert list(out["word"]) == list(top["word"])
    assert list(out["df"]) == list(top["df"])
    for w, p in zip(out["word"], out["postings"]):
        want = ",".join(pairs.loc[pairs["word"] == w, "doc_id"]
                        .sort_values().head(5).astype(str))
        assert p == want


def test_events_json_extract_matches_json_parse(ray_session):
    """The vectorized regex extraction equals a real per-row JSON parse
    on the props column."""
    import json

    from cdcsdk_server_ray.pipelines.analytics import events_json_extract

    out = events_json_extract(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "props"])
    ks = ev["props"].map(lambda s: json.loads(s).get("k"))
    sub = ev[ks.notna()].assign(k=ks[ks.notna()].astype("int64"))
    want = (sub.groupby("event_type")["k"]
            .agg(n_events="count", sum_k="sum", max_k="max")
            .reset_index().sort_values("event_type")
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out[["event_type", "n_events", "sum_k", "max_k"]],
        want, check_dtype=False)


def test_bpe_train_merges_and_counts(ray_session, tmp_path):
    """The merge loop equals a pure-python reference BPE (Sennrich) on
    the same weighted vocabulary, and final token counts account every
    original character exactly once."""
    import numpy as np

    from cdcsdk_server_ray.pipelines.text import _BPE_MARK, bpe_train

    params = str(tmp_path / "merges.parquet")
    out = bpe_train(SF, num_merges=6, k=100, params_out=params)

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    words = pd.Series(np.concatenate(
        docs["text"].str.lower().str.split(" ").to_numpy())).value_counts()

    # reference implementation: dict of symbol tuples
    vocab = {tuple(w): int(n) for w, n in words.items()}
    ref_merges = []
    for _ in range(6):
        pairs = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        # tie-break matches the engine: count desc, marked-pair asc
        best = min(pairs.items(),
                   key=lambda kv: (-kv[1],
                                   _BPE_MARK + kv[0][0] + " "
                                   + _BPE_MARK + kv[0][1]))[0]
        ref_merges.append(best)
        new = {}
        for syms, n in vocab.items():
            syms = list(syms)
            i, outs = 0, []
            while i < len(syms):
                if (i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == best):
                    outs.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    outs.append(syms[i])
                    i += 1
            new[tuple(outs)] = new.get(tuple(outs), 0) + n
        vocab = new

    mt = pd.read_parquet(params)
    got_merges = [tuple(p.replace(_BPE_MARK, "\x00").split(" "))
                  for p in mt["pat"]]
    got_merges = [tuple(x.lstrip("\x00") for x in m) for m in got_merges]
    assert got_merges == ref_merges

    # final counts: reference fold
    ref_counts = {}
    for syms, n in vocab.items():
        for s in syms:
            ref_counts[s] = ref_counts.get(s, 0) + n
    for _, r in out.iterrows():
        assert ref_counts[r["token"]] == r["cnt"]
    # every char accounted: sum(len(token)*cnt) == total chars
    total_chars = int(words.index.str.len().to_numpy()
                      @ words.to_numpy())
    assert int((out["token"].str.len() * out["cnt"]).sum()) \
        <= total_chars  # top-k is a subset
