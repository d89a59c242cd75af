"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in cdcsdk_server_ray) calls ``ray.init`` / ``ray.shutdown``.

Float policy: every float column is rounded identically in the Ray
pipeline and the SQL (sums → 2dp, ratios/avgs/cosines → 6dp) so the
value-hash is stable against summation-order differences.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable
from typing import Any

import pandas as pd


def _pdf(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    try:
        import pyarrow as pa
        if isinstance(result, pa.Table):
            return result.to_pandas()
    except ImportError:
        pass
    return result.to_pandas()


def _cols(df: pd.DataFrame, names: list[str]) -> pd.DataFrame:
    """Pin the output schema even when the result is empty (an empty Ray
    Dataset loses its schema through to_pandas)."""
    return df.reindex(columns=names)


def _round(df: pd.DataFrame, spec: dict[str, int]) -> pd.DataFrame:
    for col, nd in spec.items():
        if col in df.columns:
            df[col] = df[col].astype(float).round(nd)
    return df


# ---------------------------------------------------------------------------
# flagship: the CDC lake-upsert engine over the synthesized changelog
# ---------------------------------------------------------------------------

# fitted-parameter / expected-state sidecars: the query callable writes
# these (atomic rename) BEFORE the driver evaluates the matching oracle
# SQL, which reads them back with read_parquet() — the route by which
# stateful-engine and iterative operators get EXACT driver-visible
# oracles instead of rows-only checks
ORACLE_DIR = "/tmp/cdcsdk_oracle"


def _lake_state(sf_dir: str, num_keys: int, tag: str) -> pd.DataFrame:
    from cdcsdk_server_ray.config import EngineConfig, SynthConfig
    from cdcsdk_server_ray.engine import CdcEngine

    lake = f"/tmp/cdc_lake_entry_{tag}"
    shutil.rmtree(lake, ignore_errors=True)
    cfg = EngineConfig(
        lake_dir=lake, num_partitions=8,
        window_lsns=max(2000, num_keys * 2),
        synth=SynthConfig(num_keys=num_keys, max_versions=6))
    eng = CdcEngine(cfg)
    eng.run()
    df = eng.current_state().to_pandas()
    return (df.sort_values(["repo", "path"]).reset_index(drop=True)
            [["repo", "path", "commit", "lang", "content", "lsn", "op"]])


def _write_expected_lake_state(num_keys: int) -> None:
    """Publish the PURE-FUNCTION expected final state (computed from the
    generation rules alone — no engine involvement) as the oracle's
    comparison table: the engine's windowed/partitioned/two-phase-commit
    path must converge to exactly these rows."""
    import pyarrow.parquet as pq

    from cdcsdk_server_ray.config import SynthConfig
    from cdcsdk_server_ray.sources.changelog import expected_final_state

    os.makedirs(ORACLE_DIR, exist_ok=True)
    t = expected_final_state(SynthConfig(num_keys=num_keys, max_versions=6))
    t = t.select(["repo", "path", "commit", "lang", "content", "lsn", "op"])
    path = f"{ORACLE_DIR}/lake_state_expected.parquet"
    tmp = f"{path}.tmp{os.getpid()}"
    pq.write_table(t, tmp)
    os.replace(tmp, path)


def _write_expected_dlq(num_keys: int, bound: int) -> None:
    """Publish the PURE-FUNCTION expected dead-letter stream (generation
    rules + the byte bound alone — no engine involvement): every event
    whose content exceeds the bound, exactly once."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from cdcsdk_server_ray.config import SynthConfig
    from cdcsdk_server_ray.sources.changelog import synth_flat_batch

    os.makedirs(ORACLE_DIR, exist_ok=True)
    synth = SynthConfig(num_keys=num_keys, max_versions=6)
    t = synth_flat_batch(synth,
                         np.arange(1, synth.max_lsn, dtype=np.int64))
    poison = pc.fill_null(pc.greater(pc.binary_length(t["content"]),
                                     pa.scalar(bound, pa.int64())), False)
    t = t.filter(poison).sort_by("lsn")
    t = t.select(["lsn", "repo", "path", "op", "content"])
    path = f"{ORACLE_DIR}/dlq_expected.parquet"
    tmp = f"{path}.tmp{os.getpid()}"
    pq.write_table(t, tmp)
    os.replace(tmp, path)


def entry() -> Any:
    """Flagship pipeline: full CDC engine run (synth changelog → envelope
    chain → partitioned LWW upsert → two-phase commit) at smoke scale;
    returns the converged lake state."""
    return _lake_state("/root/testdata/sf0.001", num_keys=2000, tag="smoke")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[str], Any]]:
    from cdcsdk_server_ray.pipelines import (analytics, cdc_queries, dedup,
                                             multimodal, similarity, text)

    def cdc_lww_state(sf):
        return _pdf(cdc_queries.lww_state(sf))

    def cdc_lww_deletes(sf):
        return _pdf(cdc_queries.lww_state_with_deletes(sf))

    def cdc_partition_lineage(sf):
        return _round(_pdf(cdc_queries.partition_lineage(sf)), {"sum_value": 2})

    def cdc_envelope_roundtrip(sf):
        return _pdf(cdc_queries.envelope_roundtrip(sf))

    def cdc_window_aggregate(sf):
        return _round(_pdf(cdc_queries.window_aggregate(sf)), {"sum_value": 2})

    def cdc_dedup_fence(sf):
        return _cols(_pdf(cdc_queries.dedup_fence(sf)),
                     ["event_type", "events_applied", "min_lsn", "max_lsn"])

    def cdc_changefeed_serialize(sf):
        return _pdf(cdc_queries.changefeed_serialize(sf))

    def cdc_lake_state(sf):
        _write_expected_lake_state(num_keys=5000)
        return _lake_state(sf, num_keys=5000, tag="q")

    def cdc_schema_evolution(sf):
        """FULL engine under MID-STREAM SCHEMA EVOLUTION (the synth
        changelog adds a ``stars`` column at one LSN and widens it
        int64→float64 at another): zero-copy unify/widen map_batches +
        heterogeneous-fragment merge-on-read must converge to the
        pure-function expected state, nulls back-filled for pre-add
        winners — the north-star's schema-evolution clause made
        driver-visible."""
        import pyarrow.parquet as pq

        from cdcsdk_server_ray.config import EngineConfig, SynthConfig
        from cdcsdk_server_ray.engine import CdcEngine
        from cdcsdk_server_ray.sources.changelog import expected_final_state

        synth = SynthConfig(num_keys=3000, max_versions=6,
                            stars_add_lsn=5000, stars_widen_lsn=12000)
        os.makedirs(ORACLE_DIR, exist_ok=True)
        t = expected_final_state(synth).select(
            ["repo", "path", "lsn", "content", "stars"])
        path = f"{ORACLE_DIR}/evolution_expected.parquet"
        tmp = f"{path}.tmp{os.getpid()}"
        pq.write_table(t, tmp)
        os.replace(tmp, path)

        lake = "/tmp/cdc_lake_evo_q"
        shutil.rmtree(lake, ignore_errors=True)
        cfg = EngineConfig(lake_dir=lake, num_partitions=8,
                           window_lsns=4000, synth=synth)
        eng = CdcEngine(cfg)
        eng.run()
        df = eng.current_state().to_pandas()
        return (df.sort_values(["repo", "path"]).reset_index(drop=True)
                [["repo", "path", "lsn", "content", "stars"]])

    def cdc_dlq_state(sf):
        """FULL engine with dead-letter routing: oversized-content
        events are fenced + routed exactly-once into dlq/ fragments
        committed through the same epoch fence as the deltas; the
        oracle is the pure-function poison stream (generation rules +
        the byte bound, no engine code)."""
        from cdcsdk_server_ray.config import EngineConfig, SynthConfig
        from cdcsdk_server_ray.engine import CdcEngine

        bound, nk = 400, 3000
        _write_expected_dlq(num_keys=nk, bound=bound)
        lake = "/tmp/cdc_lake_dlq_q"
        shutil.rmtree(lake, ignore_errors=True)
        cfg = EngineConfig(lake_dir=lake, num_partitions=8,
                           window_lsns=4000,
                           synth=SynthConfig(num_keys=nk, max_versions=6),
                           dlq_max_content_bytes=bound)
        eng = CdcEngine(cfg)
        eng.run()
        df = eng.current_dlq().to_pandas()
        return (df.sort_values("lsn").reset_index(drop=True)
                [["lsn", "repo", "path", "op", "content"]])

    def window_sessions(sf):
        from cdcsdk_server_ray.pipelines import windows
        return _pdf(windows.session_windows(sf))

    def asof_last_view(sf):
        from cdcsdk_server_ray.pipelines import windows
        return _pdf(windows.asof_last_view_before_purchase(sf))

    def cdc_table_ingest(sf):
        """FULL engine over the real documents table: 3-round changelog
        (insert all / update %3 / delete %7) → fence → LWW → two-phase
        commit → merge-on-read. Oracle-checked — the flagship's exactness
        on real data."""
        from cdcsdk_server_ray.config import EngineConfig
        from cdcsdk_server_ray.engine import CdcEngine

        lake = "/tmp/cdc_lake_table_q"
        shutil.rmtree(lake, ignore_errors=True)
        from cdcsdk_server_ray.sources.source_table import OFFSET
        cfg = EngineConfig(lake_dir=lake, num_partitions=8,
                           window_lsns=OFFSET,  # one window per round
                           source="table",
                           source_table=f"{sf}/documents.parquet")
        eng = CdcEngine(cfg)
        eng.run()
        df = eng.current_state().to_pandas()
        return (df.sort_values(["repo", "path"]).reset_index(drop=True)
                [["repo", "path", "commit", "lang", "content", "lsn", "op"]])

    def agg_pricing_summary(sf):
        return _round(_pdf(analytics.pricing_summary(sf)),
                      {"sum_qty": 2, "sum_base_price": 2, "sum_disc_price": 4,
                       "avg_qty": 6, "avg_disc": 6})

    def join_revenue_by_segment(sf):
        return _round(_pdf(analytics.revenue_by_segment(sf)), {"revenue": 2})

    def join_bucket_revenue(sf):
        return _round(_pdf(analytics.revenue_by_segment_bucket_join(sf)),
                      {"revenue": 2})

    def join_customers_per_region(sf):
        return _round(_pdf(analytics.customers_per_region(sf)),
                      {"sum_acctbal": 2})

    def anti_join_events(sf):
        return _cols(_pdf(analytics.events_without_customer(sf)),
                     ["user_id", "n_events", "min_event_id"])

    def topk_per_segment(sf):
        return _pdf(analytics.top_orders_per_segment(sf))

    def topk_orders(sf):
        df = _pdf(analytics.top_orders(sf))
        return (df.sort_values(["o_totalprice", "o_orderkey"],
                               ascending=[False, True])
                .reset_index(drop=True))

    def filter_range_aggregate(sf):
        return _round(_pdf(analytics.filter_range_aggregate(sf)),
                      {"avg_value": 6, "max_value": 2})

    def distinct_langs(sf):
        return _pdf(analytics.distinct_langs(sf))

    def order_priority_histogram(sf):
        return _pdf(analytics.order_priority_histogram(sf))

    def dedup_exact(sf):
        return _pdf(dedup.exact_dedup(sf))[["doc_id", "text_hash"]]

    def dedup_minhash_lsh(sf):
        return _round(_pdf(dedup.minhash_lsh_pairs(sf)), {"jaccard": 6})

    def dedup_simhash(sf):
        return _pdf(dedup.simhash_signatures(sf))

    def dedup_simhash_pairs(sf):
        return _cols(_pdf(dedup.simhash_pairs(sf)),
                     ["doc_a", "doc_b", "hamming"])

    def dedup_ngram_jaccard(sf):
        # jaccard stays RAW float64: both engines divide the same exact
        # integers (shared / (|A|+|B|-shared)), so IEEE division makes the
        # values bit-identical with no rounding-tie hazard (a 6dp round
        # half-even vs half-away mismatches on terminating ratios like
        # 1/128)
        return _cols(_pdf(dedup.ngram_jaccard_matrix(sf)),
                     ["doc_a", "doc_b", "jaccard"])

    def dedup_clusters(sf):
        return _cols(_pdf(dedup.dedup_clusters(sf)), ["doc_id", "cluster_id"])

    def dedup_pagerank(sf):
        return _cols(_pdf(dedup.pagerank_pairs(
            sf, params_out=f"{ORACLE_DIR}/pagerank_edges.parquet")),
            ["doc_id", "deg", "rank_pico"])

    def dedup_triangles(sf):
        return _cols(dedup.triangle_counts(
            sf, params_out=f"{ORACLE_DIR}/triangle_edges.parquet"),
            ["n_wedges", "n_triangles"])

    def dedup_survivors(sf):
        return _cols(_pdf(dedup.dedup_survivors(sf)),
                     ["doc_id", "lang", "source", "n_chars"])

    def dedup_substrings(sf):
        """ExactSubstr (Lee et al. 2022): per doc, k-token windows whose
        text occurs elsewhere in the corpus, and the tokens span-cutting
        removes. Oracle-checked exactly (the SQL builds every window)."""
        return _pdf(dedup.exact_substring_dedup(sf))

    def text_token_counts(sf):
        return _pdf(text.token_counts(sf))

    def text_quality_scores(sf):
        return _pdf(text.quality_scores(sf))

    def text_quality_filter(sf):
        return _cols(_pdf(text.quality_filter(sf)),
                     ["doc_id", "lang", "n_chars"])

    def sample_documents(sf):
        return _cols(_pdf(text.sample_documents(sf)),
                     ["doc_id", "lang", "n_chars"])

    def text_tfidf(sf):
        return _cols(_pdf(text.tfidf(sf)),
                     ["doc_id", "term", "tf", "df", "tfidf"])

    def text_bm25(sf):
        return _cols(_pdf(text.bm25(sf)),
                     ["doc_id", "term", "tf", "df", "dl", "bm25"])

    def text_bm25_search(sf):
        return _cols(_pdf(text.bm25_search(sf)),
                     ["doc_id", "score_micro"])

    def text_lm_perplexity(sf):
        """CCNet-style LM quality scoring: corpus-trained add-one
        bigram LM, log-probs quantized to integer micronats on the
        driver (KenLM-style), exact-oracled via the published LM
        sidecar."""
        return _cols(_pdf(text.lm_perplexity(
            sf, params_out=f"{ORACLE_DIR}/lm_bigram.parquet")),
            ["doc_id", "n_bigrams", "nll_micronats",
             "avg_nll_micronats"])

    def text_dsir_weights(sf):
        """DSIR (Xie et al. 2023): hashed-unigram importance weights of
        a target domain vs the raw corpus, quantized to integer
        micronats — exact-oracled via the published log-ratio sidecar
        and DuckDB md5_number_lower feature hashing."""
        return _cols(_pdf(text.dsir_weights(
            sf, params_out=f"{ORACLE_DIR}/dsir_lr.parquet")),
            ["doc_id", "n_tokens", "logw_micronats"])

    def text_dup_ngrams(sf):
        return _cols(_pdf(text.dup_ngram_stats(sf)),
                     ["doc_id", "n_ngrams", "n_distinct", "dup_ratio"])

    def text_repetition(sf):
        return _cols(_pdf(text.repetition_stats(sf)),
                     ["doc_id", "top_word_frac", "dup_word_frac",
                      "top_bigram_char_frac"])

    def quality_quantile_filter(sf):
        return _cols(_pdf(text.quality_quantile_filter(sf)),
                     ["doc_id", "lang", "mean_token_len"])

    def pack_sequences(sf):
        return _cols(_pdf(text.pack_sequences(sf)),
                     ["doc_id", "n_tokens", "seq_id"])

    def sample_per_source(sf):
        return _cols(_pdf(text.cap_per_source(sf)),
                     ["source", "src_rank", "doc_id", "n_chars"])

    def sample_split(sf):
        return _cols(_pdf(text.train_test_split(sf)),
                     ["doc_id", "lang", "n_chars", "split"])

    def sample_mix(sf):
        return _cols(_pdf(text.sample_mix(sf)),
                     ["doc_id", "source", "lang", "n_chars",
                      "keep_permille"])

    def embed_pca(sf):
        df = _pdf(similarity.embed_pca(
            sf, params_out=f"{ORACLE_DIR}/pca.parquet"))
        return _round(_cols(df, ["vec_id", "pc0", "pc1", "pc2", "pc3"]),
                      {c: 6 for c in ["pc0", "pc1", "pc2", "pc3"]})

    def text_word_topk(sf):
        return _cols(_pdf(text.word_topk(sf)), ["word", "n"])

    def text_bpe_pairs(sf):
        return _cols(_pdf(text.bpe_pair_counts(sf)), ["pair", "n"])

    def text_collocations(sf):
        return _cols(text.collocations_pmi(sf), ["w1", "w2", "n", "pmi"])

    def text_entropy(sf):
        return _cols(_pdf(text.token_entropy(sf)),
                     ["doc_id", "n_tokens", "n_distinct", "entropy"])

    def text_novelty(sf):
        return _cols(_pdf(text.ngram_novelty(sf)),
                     ["doc_id", "n_grams", "n_novel", "novelty"])

    def text_epoch_shuffle(sf):
        return _cols(_pdf(text.epoch_shuffle_rank(sf)),
                     ["doc_id", "rank"])

    def text_source_overlap(sf):
        return _cols(text.source_overlap(sf),
                     ["source_a", "source_b", "shared", "jaccard"])

    def text_pii_redact(sf):
        return _cols(_pdf(text.pii_redact(sf)),
                     ["doc_id", "n_emails", "n_ips", "n_phones", "redacted"])

    def text_heavy_hitters(sf):
        return _cols(_pdf(text.heavy_hitters(sf)), ["word", "n"])

    def cluster_kmeans(sf):
        return _cols(_pdf(similarity.cluster_kmeans(
            sf, params_out=f"{ORACLE_DIR}/kmeans.parquet")),
            ["vec_id", "cluster", "dist"])

    def semdedup(sf):
        df = _cols(_pdf(similarity.semdedup(
            sf, params_out=f"{ORACLE_DIR}/semdedup.parquet")),
            ["vec_id", "cluster", "keep", "dup_of"])
        # kept rows carry the sentinel -1 (plain int64 on both sides —
        # a nullable column comes back float64 from DuckDB and the
        # driver's hash fails dtype splits)
        df["dup_of"] = df["dup_of"].fillna(-1).astype("int64")
        return df

    def window_hopping(sf):
        from cdcsdk_server_ray.pipelines import windows
        return _round(_pdf(windows.hopping_counts(sf)),
                      {"sum_value": 2, "max_value": 2})

    def join_range_bands(sf):
        return _cols(_pdf(analytics.range_join_value_bands(sf)),
                     ["band_id", "event_id", "value", "lo", "hi"])

    def stat_approx_distinct(sf):
        from cdcsdk_server_ray.pipelines import stats
        return _cols(_pdf(stats.approx_distinct_kmv(sf)),
                     ["k_used", "kth_hash", "estimate"])

    def stat_quantiles(sf):
        from cdcsdk_server_ray.pipelines import stats
        return _cols(_pdf(stats.value_quantiles(sf)),
                     ["q_permille", "value"])

    def stat_corr(sf):
        from cdcsdk_server_ray.pipelines import stats
        return _cols(_pdf(stats.pearson_corr(sf)),
                     ["n", "corr_qty_price", "corr_qty_disc"])

    def stat_group_zscore(sf):
        from cdcsdk_server_ray.pipelines import stats
        return _round(_cols(_pdf(stats.group_zscore_outliers(sf)),
                            ["event_id", "event_type", "value", "z"]),
                      {"value": 2, "z": 6})

    def stat_group_quantiles(sf):
        from cdcsdk_server_ray.pipelines import stats
        return _pdf(stats.group_quantiles(sf))

    def dq_checks(sf):
        from cdcsdk_server_ray.pipelines import stats
        return _pdf(stats.dq_checks(sf))

    def dq_profile(sf):
        from cdcsdk_server_ray.pipelines import stats
        return _cols(stats.dq_profile(sf),
                     ["col", "n", "nulls", "vmin", "vmax"])

    def dq_table_checksum(sf):
        from cdcsdk_server_ray.pipelines import stats
        return _pdf(stats.table_checksum(sf))

    def stat_quantile_sketch(sf):
        from cdcsdk_server_ray.pipelines import stats
        return _pdf(stats.quantile_sketch(sf))

    def stat_histogram(sf):
        from cdcsdk_server_ray.pipelines import stats
        return _pdf(stats.value_histogram(sf))

    def stat_drift_psi(sf):
        from cdcsdk_server_ray.pipelines import stats
        return _pdf(stats.drift_psi(sf))

    def agg_wow_revenue(sf):
        return _pdf(analytics.wow_revenue(sf))

    def cdc_version_retention(sf):
        return _round(_cols(_pdf(cdc_queries.version_retention(sf)),
                            ["user_id", "version_rank", "event_id",
                             "event_type", "value"]),
                      {"value": 2})

    def decontaminate(sf):
        return _cols(_pdf(text.decontaminate(sf)),
                     ["doc_id", "n_distinct", "n_hits", "contaminated"])

    def window_late_data(sf):
        """Watermark/late-data semantics: running-max event-time watermark
        over arrival order (distributed two-level prefix scan), per-window
        on-time aggregates + late side-output counts."""
        from cdcsdk_server_ray.pipelines import windows
        return _pdf(windows.late_data_counts(sf))

    def window_tumbling(sf):
        from cdcsdk_server_ray.pipelines import windows
        return _round(_pdf(windows.tumbling_counts(sf)),
                      {"sum_value": 2, "max_value": 2})

    def cdc_snapshot_ingest(sf):
        """snapshot_mode='initial': bulk snapshot (op='r') + streamed
        update/delete rounds — same final state as cdc_table_ingest but
        via the snapshot-then-stream path (README.md:138)."""
        from cdcsdk_server_ray.config import EngineConfig
        from cdcsdk_server_ray.engine import CdcEngine
        from cdcsdk_server_ray.sources.source_table import OFFSET

        lake = "/tmp/cdc_lake_snapshot_q"
        shutil.rmtree(lake, ignore_errors=True)
        cfg = EngineConfig(lake_dir=lake, num_partitions=8,
                           window_lsns=OFFSET, source="table",
                           snapshot_mode="initial",
                           source_table=f"{sf}/documents.parquet")
        eng = CdcEngine(cfg)
        eng.run()
        df = eng.current_state().to_pandas()
        return (df.sort_values(["repo", "path"]).reset_index(drop=True)
                [["repo", "path", "commit", "lang", "content", "lsn", "op"]])

    def cdc_tx_metadata(sf):
        """Debezium provide.transaction.metadata analogue: per-tx event
        count, LSN boundaries, distinct repos touched."""
        return _pdf(cdc_queries.transaction_metadata(sf))

    def cdc_changefeed_avro(sf):
        """Vectorized Avro changefeed export (rows-only: varint byte
        lengths have no SQL form; byte-parity pinned in test_sinks)."""
        return _pdf(cdc_queries.changefeed_export(sf, "avro"))

    def cdc_changefeed_protobuf(sf):
        """Vectorized Protobuf Struct changefeed export (rows-only)."""
        return _pdf(cdc_queries.changefeed_export(sf, "protobuf"))

    def cdc_incremental_snapshot(sf):
        """Debezium/DBLog incremental (ad-hoc) snapshot: a stream attached
        LATE (start_lsn = OFFSET, so the insert round was never streamed)
        backfills the table in bounded chunks INTERLEAVED with the
        update/delete windows. The oracle checks the DBLog dedup rule at
        row level: streamed events win LWW (op='u', round-1 lsn) while
        never-streamed keys carry the snapshot read (op='r', lsn=doc_id)."""
        from cdcsdk_server_ray.config import EngineConfig
        from cdcsdk_server_ray.engine import CdcEngine
        from cdcsdk_server_ray.sources.source_table import OFFSET

        lake = "/tmp/cdc_lake_incsnap_q"
        shutil.rmtree(lake, ignore_errors=True)
        cfg = EngineConfig(lake_dir=lake, num_partitions=8,
                           window_lsns=OFFSET, source="table",
                           start_lsn=OFFSET, incremental_snapshot=True,
                           snapshot_chunk_rows=100,
                           source_table=f"{sf}/documents.parquet")
        eng = CdcEngine(cfg)
        eng.run()
        df = eng.current_state().to_pandas()
        return (df.sort_values(["repo", "path"]).reset_index(drop=True)
                [["repo", "path", "commit", "lang", "content", "lsn", "op"]])

    def cdc_user_changelog(sf):
        """source='parquet_changelog': a user-supplied event table (here
        derived deterministically from documents and written to /tmp,
        as a stand-in for an arbitrary upstream feed) ingested through
        the full engine; oracle reproduces the final LWW state."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from cdcsdk_server_ray.config import EngineConfig
        from cdcsdk_server_ray.engine import CdcEngine

        docs = pq.read_table(f"{sf}/documents.parquet",
                             columns=["doc_id", "text", "lang", "source"])
        did = docs["doc_id"].to_pylist()
        txt = docs["text"].to_pylist()
        lang = docs["lang"].to_pylist()
        src = docs["source"].to_pylist()
        rows = []
        for d, t, lg, s in zip(did, txt, lang, src):
            rows.append((d + 1, "c", f"user/{s}", f"u{d}.txt",
                         f"v1-{d}", lg, t))
            if d % 4 == 0:
                rows.append((100_000 + d + 1, "u", f"user/{s}",
                             f"u{d}.txt", f"v2-{d}", lg, t + " !upd"))
            if d % 10 == 0:
                rows.append((200_000 + d + 1, "d", f"user/{s}",
                             f"u{d}.txt", None, None, None))
        feed = pa.table({
            "lsn": pa.array([r[0] for r in rows], pa.int64()),
            "op": pa.array([r[1] for r in rows]),
            "repo": pa.array([r[2] for r in rows]),
            "path": pa.array([r[3] for r in rows]),
            "commit": pa.array([r[4] for r in rows]),
            "lang": pa.array([r[5] for r in rows]),
            "content": pa.array([r[6] for r in rows]),
        })
        feed_path = "/tmp/cdc_user_feed_q.parquet"
        pq.write_table(feed, feed_path)
        lake = "/tmp/cdc_lake_user_q"
        shutil.rmtree(lake, ignore_errors=True)
        cfg = EngineConfig(lake_dir=lake, num_partitions=8,
                           window_lsns=100_000,
                           source="parquet_changelog",
                           source_table=feed_path)
        eng = CdcEngine(cfg)
        eng.run()
        df = eng.current_state().to_pandas()
        return (df.sort_values(["repo", "path"]).reset_index(drop=True)
                [["repo", "path", "commit", "lang", "content", "lsn", "op"]])

    def cdc_scd2_history(sf):
        return _pdf(cdc_queries.scd2_history(sf))

    def cdc_time_travel(sf):
        return _cols(cdc_queries.time_travel_counts(sf),
                     ["probe_lsn", "lang", "n"])

    def cdc_view_maintenance(sf):
        return _cols(cdc_queries.view_maintenance(sf),
                     ["lang", "n_rows", "content_bytes"])

    def cdc_engine_view(sf):
        """ENGINE-integrated incremental materialized view: the view's
        per-window deltas commit through the same epoch fence as the
        offsets (manifest.view_deltas), so crash/resume keeps it
        exactly-once. Oracle = the pure-function expected final state
        aggregated per lang (published as a sidecar)."""
        import pyarrow.parquet as pq

        from cdcsdk_server_ray.config import EngineConfig, SynthConfig
        from cdcsdk_server_ray.engine import CdcEngine
        from cdcsdk_server_ray.sources.changelog import \
            expected_final_state

        synth = SynthConfig(num_keys=3000, max_versions=6)
        os.makedirs(ORACLE_DIR, exist_ok=True)
        t = expected_final_state(synth).select(["lang", "content"])
        path = f"{ORACLE_DIR}/view_state_expected.parquet"
        tmp = f"{path}.tmp{os.getpid()}"
        pq.write_table(t, tmp)
        os.replace(tmp, path)

        lake = "/tmp/cdc_lake_engine_view_q"
        shutil.rmtree(lake, ignore_errors=True)
        cfg = EngineConfig(lake_dir=lake, num_partitions=8,
                           window_lsns=4000, view_maintenance=True,
                           synth=synth)
        CdcEngine(cfg).run(max_windows=2)     # crash mid-stream
        CdcEngine(cfg).run()                  # resume, finish
        return _cols(CdcEngine(cfg).current_view(),
                     ["lang", "n_rows", "content_bytes"])

    def dedup_incremental(sf):
        return _pdf(dedup.dedup_incremental(sf))

    def funnel_conversion(sf):
        from cdcsdk_server_ray.pipelines import windows
        return _pdf(windows.funnel_conversion(sf))

    def cohort_retention(sf):
        from cdcsdk_server_ray.pipelines import windows
        return _pdf(windows.cohort_retention(sf))

    def running_user_value(sf):
        from cdcsdk_server_ray.pipelines import windows
        return _pdf(windows.running_user_value(sf))

    def agg_rollup(sf):
        return _round(_pdf(analytics.rollup_orders(sf)), {"sum_total": 2})

    def agg_pivot(sf):
        return _round(_pdf(analytics.pivot_events(sf)),
                      {"purchase_value": 2})

    def text_chunks(sf):
        return _pdf(text.chunk_documents(sf))

    def set_intersect(sf):
        return _pdf(analytics.users_intersect(sf))

    def set_except(sf):
        return _pdf(analytics.users_except(sf))

    def agg_cube(sf):
        return _round(_pdf(analytics.cube_orders(sf)), {"sum_total": 2})

    def window_moving_sum(sf):
        from cdcsdk_server_ray.pipelines import windows
        return _pdf(windows.moving_user_sum(sf))

    def join_full_outer(sf):
        return _round(_pdf(analytics.join_full_outer(sf)),
                      {"big_total": 2})

    def join_shipping_priority(sf):
        return _cols(_pdf(analytics.shipping_priority(sf)),
                     ["l_orderkey", "revenue", "o_orderdate",
                      "o_orderpriority"])

    def join_local_supplier_volume(sf):
        return _cols(analytics.local_supplier_volume(sf),
                     ["n_name", "revenue"])

    def join_large_orders(sf):
        return _cols(_pdf(analytics.large_order_quantities(sf)),
                     ["o_orderkey", "c_name", "o_orderdate",
                      "o_totalprice", "sum_qty"])

    def join_returned_items(sf):
        return _cols(_pdf(analytics.returned_item_report(sf)),
                     ["c_custkey", "c_name", "revenue", "c_acctbal",
                      "n_name"])

    def join_small_quantity_revenue(sf):
        return _cols(analytics.small_quantity_revenue(sf), ["avg_yearly"])

    def join_top_supplier(sf):
        return _cols(analytics.top_supplier(sf),
                     ["s_suppkey", "s_name", "total_revenue"])

    def join_volume_shipping(sf):
        return _cols(analytics.volume_shipping(sf),
                     ["supp_nation", "cust_nation", "l_year", "revenue"])

    def join_market_share(sf):
        return _cols(analytics.market_share(sf), ["o_year", "mkt_share"])

    def join_discounted_revenue(sf):
        return _cols(analytics.discounted_revenue(sf), ["revenue"])

    def join_min_cost_supplier(sf):
        return _cols(analytics.min_cost_supplier(sf),
                     ["p_partkey", "s_name", "s_acctbal"])

    def join_sole_supplier(sf):
        return _cols(analytics.sole_supplier_orders(sf),
                     ["s_suppkey", "s_name", "sole_orders"])

    def join_customer_distribution(sf):
        return _cols(_pdf(analytics.customer_order_distribution(sf)),
                     ["c_count", "custdist"])

    def join_sales_opportunity(sf):
        return _cols(_pdf(analytics.sales_opportunity(sf)),
                     ["c_nationkey", "numcust", "totacctbal"])

    def join_promo_revenue(sf):
        return analytics.promo_revenue_share(sf)

    def agg_forecast_revenue(sf):
        return analytics.forecast_revenue(sf)

    def join_shipping_modes(sf):
        return _cols(_pdf(analytics.shipping_modes(sf)),
                     ["l_linestatus", "high_line_count", "low_line_count"])

    def join_late_orders(sf):
        return _cols(_pdf(analytics.late_orders(sf)),
                     ["o_orderpriority", "order_count"])

    def join_product_profit(sf):
        return _cols(analytics.product_profit(sf),
                     ["nation", "o_year", "profit"])

    def join_dominant_suppliers(sf):
        return _cols(analytics.dominant_suppliers(sf),
                     ["s_suppkey", "s_name", "n_dominated"])

    def agg_important_parts(sf):
        return _cols(analytics.important_parts(sf),
                     ["p_partkey", "value"])

    def events_json_extract(sf):
        return _cols(_pdf(analytics.events_json_extract(sf)),
                     ["event_type", "n_events", "sum_k", "max_k"])

    def join_supplier_part_types(sf):
        return _cols(analytics.supplier_part_types(sf),
                     ["p_brand", "p_type", "p_size", "supplier_cnt"])

    def emb_label_centroids(sf):
        return _cols(similarity.label_centroids(sf),
                     ["label", "dim", "centroid"])

    def stat_group_regression(sf):
        from cdcsdk_server_ray.pipelines import stats
        return _cols(stats.group_regression(sf),
                     ["event_type", "n_events", "slope_cents_per_min",
                      "intercept_cents"])

    def join_reorder_gaps(sf):
        return _cols(analytics.reorder_gaps(sf),
                     ["c_mktsegment", "n_gaps", "avg_gap_days"])

    def stat_approx_distinct_hll(sf):
        from cdcsdk_server_ray.pipelines import stats
        return _cols(stats.approx_distinct_hll(sf),
                     ["bucket", "max_rho", "raw_estimate"])

    def stat_group_quantiles_cont(sf):
        from cdcsdk_server_ray.pipelines import stats
        return _cols(stats.group_quantiles_cont(sf),
                     ["event_type", "q_permille", "value"])

    def dq_mad_outliers(sf):
        from cdcsdk_server_ray.pipelines import stats
        return _cols(stats.mad_outliers(sf),
                     ["event_type", "median_value", "mad_value",
                      "n_outliers"])

    def text_inverted_index(sf):
        return _cols(_pdf(text.inverted_index(sf)),
                     ["word", "df", "postings"])

    def events_by_weekday(sf):
        return _round(_pdf(analytics.events_by_weekday(sf)),
                      {"sum_value": 2})

    def text_normalize(sf):
        return _pdf(text.normalize_text(sf))

    def emb_norms(sf):
        return _pdf(similarity.embedding_norms(sf))

    def text_quartiles(sf):
        return _pdf(text.quartile_buckets(sf))

    def sample_temperature(sf):
        return _pdf(text.sample_temperature(sf))

    def window_join(sf):
        from cdcsdk_server_ray.pipelines import windows
        return _pdf(windows.window_join_counts(sf))

    def window_transitions(sf):
        from cdcsdk_server_ray.pipelines import windows
        return _pdf(windows.event_transitions(sf))

    def text_bpe_train(sf):
        return _cols(text.bpe_train(
            sf, params_out=f"{ORACLE_DIR}/bpe_merges.parquet"),
            ["token", "cnt"])

    def window_funnel_latency(sf):
        from cdcsdk_server_ray.pipelines import windows
        return _cols(windows.funnel_latency(sf),
                     ["stage", "q_permille", "n_converted", "delta_sec"])

    def window_paths(sf):
        from cdcsdk_server_ray.pipelines import windows
        return _cols(windows.event_path_topk(sf), ["e1", "e2", "e3", "n"])

    def window_distinct_users(sf):
        from cdcsdk_server_ray.pipelines import windows
        return _cols(windows.hopping_distinct_users(sf),
                     ["window_start", "n_users"])

    def text_language_id(sf):
        return _pdf(text.language_id(sf))

    def text_fingerprints(sf):
        return _pdf(text.fingerprints(sf))

    def knn_bruteforce(sf):
        return _pdf(similarity.knn_bruteforce(sf))

    def knn_ivf(sf):
        return _cols(_pdf(similarity.knn_ivf(
            sf, params_out=f"{ORACLE_DIR}/ivf_cents.parquet")),
            ["query_id", "vec_id", "cos"])

    def emb_decontaminate(sf):
        return _cols(similarity.emb_decontaminate(sf),
                     ["vec_id", "bench_id", "cos"])

    def knn_pq(sf):
        return _cols(_pdf(similarity.knn_pq(
            sf, params_out=f"{ORACLE_DIR}/pq_books.parquet")),
            ["query_id", "vec_id", "adc"])

    def embed_docs(sf):
        df = _pdf(similarity.embed_documents(
            sf, params_out=f"{ORACLE_DIR}/embed_proj.parquet"))
        df["embedding"] = df["embedding"].map(
            lambda v: [round(float(x), 6) for x in v])
        return df

    def knn_lsh(sf):
        return _cols(_pdf(similarity.knn_lsh(
            sf, params_out=f"{ORACLE_DIR}/lsh_planes.parquet")),
            ["query_id", "vec_id", "cos"])

    def emb_near_dup(sf):
        return _cols(_pdf(similarity.near_dup_embeddings(sf)),
                     ["vec_a", "vec_b", "cos"])

    def media_stats(sf):
        return _pdf(multimodal.media_stats(sf))

    def media_decode(sf):
        """REAL PNG decode (stdlib zlib+struct codec): chunk walk, CRC
        verify, inflate, scanline unfilter — dimensions and exact pixel
        stats oracle-checked against the closed-form pattern the
        payloads were synthesized from."""
        return _cols(_pdf(multimodal.decode_media(sf)),
                     ["media_id", "width", "height", "n_channels",
                      "px_sum"] + [f"h{b}" for b in range(8)])

    def media_resize(sf):
        return _cols(_pdf(multimodal.resize_media(sf)),
                     ["media_id", "width", "height", "est_bytes"])

    def corpus_prep(sf):
        """Capstone composition: quality filter → near-dup removal →
        cleaned-corpus snapshot → sequence packing (rows-only: the
        dedup stage is signature-based, no SQL form)."""
        from cdcsdk_server_ray.pipelines.corpus_prep import corpus_prep
        out, _ = corpus_prep(sf)
        return out

    def media_phash_pairs(sf):
        return _pdf(multimodal.media_phash_pairs(sf))

    def media_frames(sf):
        return _cols(_pdf(multimodal.sample_frames(sf)),
                     ["media_id", "frame_idx", "n_frames", "width",
                      "height", "delay_num", "delay_den", "duration_ms",
                      "ts_ms", "pixel_sum"])

    def media_resize_pixels(sf):
        """REAL pixel-rewriting resize: decode → nearest-neighbor
        resample into a 64x64 fit → re-encode; output geometry and
        exact resized pixel sums oracle-checked against the closed-form
        source pattern."""
        return _cols(_pdf(multimodal.resize_media_pixels(sf)),
                     ["media_id", "width", "height", "px_sum"])

    def media_audio(sf):
        """REAL WAV decode (stdlib RIFF/PCM codec): chunk walk, fmt
        contract, exact int16 signal features — oracle-checked against
        the closed-form sample pattern the payloads encode."""
        return _cols(_pdf(multimodal.decode_audio(sf)),
                     ["media_id", "sample_rate", "n_samples",
                      "duration_ms", "sum_sq", "peak", "zero_crossings"])

    def media_audio_frames(sf):
        """Frame-level audio feature extraction (fixed 400-sample
        frames, exact per-frame energy) over the real WAV decode."""
        return _cols(_pdf(multimodal.audio_energy_frames(sf)),
                     ["media_id", "frame_idx", "frame_samples",
                      "energy"])

    return {
        "cdc_lww_state": cdc_lww_state,
        "cdc_lww_deletes": cdc_lww_deletes,
        "cdc_partition_lineage": cdc_partition_lineage,
        "cdc_envelope_roundtrip": cdc_envelope_roundtrip,
        "cdc_window_aggregate": cdc_window_aggregate,
        "cdc_dedup_fence": cdc_dedup_fence,
        "cdc_changefeed_serialize": cdc_changefeed_serialize,
        "cdc_lake_state": cdc_lake_state,
        "cdc_dlq_state": cdc_dlq_state,
        "cdc_schema_evolution": cdc_schema_evolution,
        "cdc_table_ingest": cdc_table_ingest,
        "window_sessions": window_sessions,
        "asof_last_view": asof_last_view,
        "agg_pricing_summary": agg_pricing_summary,
        "join_revenue_by_segment": join_revenue_by_segment,
        "join_customers_per_region": join_customers_per_region,
        "join_bucket_revenue": join_bucket_revenue,
        "topk_orders": topk_orders,
        "anti_join_events": anti_join_events,
        "topk_per_segment": topk_per_segment,
        "filter_range_aggregate": filter_range_aggregate,
        "distinct_langs": distinct_langs,
        "order_priority_histogram": order_priority_histogram,
        "dedup_exact": dedup_exact,
        "dedup_minhash_lsh": dedup_minhash_lsh,
        "dedup_simhash": dedup_simhash,
        "dedup_simhash_pairs": dedup_simhash_pairs,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "dedup_clusters": dedup_clusters,
        "dedup_pagerank": dedup_pagerank,
        "dedup_triangles": dedup_triangles,
        "dedup_survivors": dedup_survivors,
        "dedup_substrings": dedup_substrings,
        "text_token_counts": text_token_counts,
        "text_quality_scores": text_quality_scores,
        "text_quality_filter": text_quality_filter,
        "sample_documents": sample_documents,
        "text_tfidf": text_tfidf,
        "text_bm25": text_bm25,
        "text_bm25_search": text_bm25_search,
        "text_lm_perplexity": text_lm_perplexity,
        "text_dsir_weights": text_dsir_weights,
        "text_dup_ngrams": text_dup_ngrams,
        "text_repetition": text_repetition,
        "pack_sequences": pack_sequences,
        "quality_quantile_filter": quality_quantile_filter,
        "sample_per_source": sample_per_source,
        "sample_split": sample_split,
        "sample_mix": sample_mix,
        "embed_pca": embed_pca,
        "text_word_topk": text_word_topk,
        "text_bpe_pairs": text_bpe_pairs,
        "text_collocations": text_collocations,
        "text_entropy": text_entropy,
        "text_source_overlap": text_source_overlap,
        "text_epoch_shuffle": text_epoch_shuffle,
        "text_novelty": text_novelty,
        "text_pii_redact": text_pii_redact,
        "text_heavy_hitters": text_heavy_hitters,
        "cluster_kmeans": cluster_kmeans,
        "semdedup": semdedup,
        "decontaminate": decontaminate,
        "window_hopping": window_hopping,
        "join_range_bands": join_range_bands,
        "stat_approx_distinct": stat_approx_distinct,
        "stat_quantiles": stat_quantiles,
        "stat_corr": stat_corr,
        "stat_group_zscore": stat_group_zscore,
        "stat_group_quantiles": stat_group_quantiles,
        "dq_checks": dq_checks,
        "dq_profile": dq_profile,
        "dq_table_checksum": dq_table_checksum,
        "stat_quantile_sketch": stat_quantile_sketch,
        "stat_histogram": stat_histogram,
        "stat_drift_psi": stat_drift_psi,
        "agg_wow_revenue": agg_wow_revenue,
        "cdc_version_retention": cdc_version_retention,
        "window_tumbling": window_tumbling,
        "window_late_data": window_late_data,
        "funnel_conversion": funnel_conversion,
        "cohort_retention": cohort_retention,
        "running_user_value": running_user_value,
        "cdc_snapshot_ingest": cdc_snapshot_ingest,
        "cdc_incremental_snapshot": cdc_incremental_snapshot,
        "cdc_tx_metadata": cdc_tx_metadata,
        "cdc_changefeed_avro": cdc_changefeed_avro,
        "cdc_changefeed_protobuf": cdc_changefeed_protobuf,
        "cdc_user_changelog": cdc_user_changelog,
        "cdc_scd2_history": cdc_scd2_history,
        "cdc_time_travel": cdc_time_travel,
        "cdc_view_maintenance": cdc_view_maintenance,
        "cdc_engine_view": cdc_engine_view,
        "agg_rollup": agg_rollup,
        "agg_pivot": agg_pivot,
        "text_chunks": text_chunks,
        "set_intersect": set_intersect,
        "set_except": set_except,
        "agg_cube": agg_cube,
        "window_moving_sum": window_moving_sum,
        "join_full_outer": join_full_outer,
        "join_shipping_priority": join_shipping_priority,
        "join_local_supplier_volume": join_local_supplier_volume,
        "join_large_orders": join_large_orders,
        "join_returned_items": join_returned_items,
        "join_small_quantity_revenue": join_small_quantity_revenue,
        "join_top_supplier": join_top_supplier,
        "join_volume_shipping": join_volume_shipping,
        "join_market_share": join_market_share,
        "join_discounted_revenue": join_discounted_revenue,
        "join_sole_supplier": join_sole_supplier,
        "join_min_cost_supplier": join_min_cost_supplier,
        "join_customer_distribution": join_customer_distribution,
        "join_sales_opportunity": join_sales_opportunity,
        "join_promo_revenue": join_promo_revenue,
        "agg_forecast_revenue": agg_forecast_revenue,
        "join_shipping_modes": join_shipping_modes,
        "join_late_orders": join_late_orders,
        "join_product_profit": join_product_profit,
        "join_dominant_suppliers": join_dominant_suppliers,
        "agg_important_parts": agg_important_parts,
        "events_json_extract": events_json_extract,
        "text_inverted_index": text_inverted_index,
        "join_supplier_part_types": join_supplier_part_types,
        "emb_label_centroids": emb_label_centroids,
        "stat_group_regression": stat_group_regression,
        "join_reorder_gaps": join_reorder_gaps,
        "stat_approx_distinct_hll": stat_approx_distinct_hll,
        "dq_mad_outliers": dq_mad_outliers,
        "stat_group_quantiles_cont": stat_group_quantiles_cont,
        "events_by_weekday": events_by_weekday,
        "text_normalize": text_normalize,
        "emb_norms": emb_norms,
        "text_quartiles": text_quartiles,
        "sample_temperature": sample_temperature,
        "window_join": window_join,
        "window_transitions": window_transitions,
        "window_paths": window_paths,
        "window_funnel_latency": window_funnel_latency,
        "text_bpe_train": text_bpe_train,
        "window_distinct_users": window_distinct_users,
        "dedup_incremental": dedup_incremental,
        "text_language_id": text_language_id,
        "text_fingerprints": text_fingerprints,
        "knn_bruteforce": knn_bruteforce,
        "knn_lsh": knn_lsh,
        "knn_ivf": knn_ivf,
        "knn_pq": knn_pq,
        "emb_decontaminate": emb_decontaminate,
        "embed_docs": embed_docs,
        "emb_near_dup": emb_near_dup,
        "media_stats": media_stats,
        "media_decode": media_decode,
        "media_resize": media_resize,
        "media_frames": media_frames,
        "media_resize_pixels": media_resize_pixels,
        "media_audio": media_audio,
        "media_audio_frames": media_audio_frames,
        "media_phash_pairs": media_phash_pairs,
        "corpus_prep": corpus_prep,
    }


# shared oracle fragments ----------------------------------------------

# exact char-5-shingle Jaccard over ALL doc pairs (the brute-force truth
# the MinHash-LSH pipeline approximates). Equality with the LSH output
# is non-trivial but EXACT on this corpus: pair similarities are bimodal
# (< 0.40 or ≥ 0.83 — seeded near-dups vs background), and at ≥ 0.83 the
# 16×8 band recall is ≥ 0.98 per pair; verified pair-for-pair at
# sf0.001/0.01/0.1. The Ray side hashes shingles to 64-bit before the
# set ops — set Jaccard is hash-invariant (collisions ~1e-13).
_MINHASH_PAIRS_CTE = """
    grams AS (
        SELECT DISTINCT doc_id, substring(text, i, 5) AS g
        FROM documents,
             UNNEST(generate_series(1, length(text) - 4)) AS t(i)
    ), sizes AS (
        SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id
    ), shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
        FROM grams a JOIN grams b USING (g)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    ), jpairs AS (
        SELECT s.doc_a, s.doc_b,
               CAST(s.shared AS DOUBLE) / (sa.n + sb.n - s.shared)
                   AS jaccard
        FROM shared s
        JOIN sizes sa ON sa.doc_id = s.doc_a
        JOIN sizes sb ON sb.doc_id = s.doc_b
        WHERE CAST(s.shared AS DOUBLE) / (sa.n + sb.n - s.shared) >= 0.5
    )
"""

# 64-bit SimHash signatures, bit-exactly as pipelines/dedup.py builds
# them: token hash = md5_number_lower (the Ray side uses the same last-8
# md5 bytes little-endian), term-frequency-weighted ±1 bit votes, bit j
# set iff vote > 0 (bit 63 via two's complement).
_SIMHASH_SIG_CTE = r"""
    toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS tok
        FROM documents
    ), th AS (
        SELECT doc_id, md5_number_lower(tok) AS h FROM toks
    ), sbits AS (
        SELECT doc_id, j,
               sum(CASE WHEN (h >> CAST(j AS UBIGINT)) & 1 = 1
                        THEN 1 ELSE -1 END) AS vote
        FROM th, UNNEST(generate_series(0, 63)) AS t(j)
        GROUP BY doc_id, j
    ), sig AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN vote > 0 THEN
                    CASE WHEN j = 63
                         THEN CAST(-9223372036854775808 AS HUGEINT)
                         ELSE CAST(CAST(1 AS BIGINT) << CAST(j AS INTEGER)
                                   AS HUGEINT) END
                    ELSE 0 END) AS BIGINT) AS simhash
        FROM sbits GROUP BY doc_id
    ), sigs AS (
        SELECT d.doc_id, COALESCE(s.simhash, 0) AS simhash
        FROM documents d LEFT JOIN sig s USING (doc_id)
    )
"""

# min-label connected components over the exact near-dup pair graph —
# the recursive closure of jpairs; cluster_id = min doc_id reachable.
_CLUSTERS_CTE = _MINHASH_PAIRS_CTE + """,
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM jpairs
        UNION SELECT doc_b, doc_a FROM jpairs
    ), reach(n, r) AS (
        SELECT DISTINCT a, a FROM edges
        UNION
        SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.n
    ), cc AS (
        SELECT n AS doc_id, min(r) AS cluster_id FROM reach GROUP BY n
    )
"""


def oracle_sql() -> dict[str, str]:
    """ANSI SQL oracles (DuckDB, views pre-registered). The only keys
    absent here are cdc_changefeed_avro / cdc_changefeed_protobuf
    (varint wire-byte lengths have no SQL form; byte parity is pinned by
    tests instead) — everything else, including
    the stateful engine, the iterative/ANN family and the codecs, has an
    exact value-hash oracle. Operators whose fitted parameters are small
    (PCA components, k-means/IVF centroids, LSH hyperplanes) or whose
    expected state is a pure function (the synth lake) publish a sidecar
    parquet from the query callable; the oracle reads it back with
    read_parquet() and independently re-derives the distributed part in
    SQL. Hash conventions are chosen to be SQL-reproducible
    (md5_number_lower for SimHash/pHash/fingerprints)."""
    return {
        "cdc_lake_state": f"""
            -- the engine's converged lake state vs the PURE-FUNCTION
            -- expected state (generation rules only, no engine code) —
            -- the driver-visible form of the sha256 replay oracle
            SELECT repo, path, commit, lang, content, lsn, op
            FROM read_parquet('{ORACLE_DIR}/lake_state_expected.parquet')
            ORDER BY repo, path
        """,
        "cdc_schema_evolution": f"""
            -- the engine's converged state under mid-stream column-add
            -- + type-widen vs the PURE-FUNCTION expected state
            -- (generation rules only): pre-add winners must carry NULL
            -- stars, post-widen winners float64
            SELECT repo, path, lsn, content, stars
            FROM read_parquet('{ORACLE_DIR}/evolution_expected.parquet')
            ORDER BY repo, path
        """,
        "cdc_dlq_state": f"""
            -- the engine's committed dead-letter stream vs the
            -- PURE-FUNCTION poison set (generation rules + byte bound,
            -- no engine code) — exactly-once routing made driver-visible
            SELECT lsn, repo, path, op, content
            FROM read_parquet('{ORACLE_DIR}/dlq_expected.parquet')
            ORDER BY lsn
        """,
        "dedup_minhash_lsh": f"""
            WITH {_MINHASH_PAIRS_CTE}
            SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard
            FROM jpairs ORDER BY doc_a, doc_b
        """,
        "dedup_simhash": f"""
            WITH {_SIMHASH_SIG_CTE}
            SELECT doc_id, simhash FROM sigs ORDER BY doc_id
        """,
        "dedup_simhash_pairs": f"""
            -- all pairs within Hamming 3 of the exact signatures; equals
            -- the banded pipeline output by pigeonhole (4 bands, d<=3)
            WITH {_SIMHASH_SIG_CTE}
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT)
                       AS hamming
            FROM sigs a, sigs b
            WHERE a.doc_id < b.doc_id
              AND bit_count(xor(a.simhash, b.simhash)) <= 3
            ORDER BY doc_a, doc_b
        """,
        "dedup_triangles": """
            -- wedge/triangle counts re-derived from the published
            -- pair-list sidecar (edges oriented a < b) — mirrors
            -- dedup.triangle_counts
            WITH e AS (
                SELECT doc_a AS a, doc_b AS b
                FROM read_parquet('/tmp/cdcsdk_oracle/triangle_edges.parquet')
            ), w AS (
                SELECT e1.b AS x, e2.b AS y
                FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
            )
            SELECT (SELECT COUNT(*) FROM w) AS n_wedges,
                   (SELECT COUNT(*) FROM w
                    JOIN e ON w.x = e.a AND w.y = e.b) AS n_triangles
        """,
        "dedup_pagerank": """
            -- integer PageRank re-derived from the published pair-list
            -- sidecar: 3 unrolled iterations, floor division at exactly
            -- the two points the Ray kernels use — mirrors
            -- dedup.pagerank_pairs
            WITH edges AS (
                SELECT doc_a AS src, doc_b AS dst
                FROM read_parquet('/tmp/cdcsdk_oracle/pagerank_edges.parquet')
                UNION ALL
                SELECT doc_b, doc_a
                FROM read_parquet('/tmp/cdcsdk_oracle/pagerank_edges.parquet')
            ), deg AS (
                SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
                FROM edges GROUP BY 1
            ), n AS (
                SELECT CAST(1000000000000 // count(*) AS BIGINT) AS base,
                       CAST(((1000000000000 // count(*)) * 15) // 100
                            AS BIGINT) AS base15
                FROM deg
            ), r0 AS (
                SELECT node, deg, (SELECT base FROM n) AS r FROM deg
            ), r1 AS (
                SELECT d.node, d.deg,
                       (SELECT base15 FROM n)
                       + (85 * s.c) // 100 AS r
                FROM deg d JOIN (
                    SELECT e.dst AS node,
                           CAST(sum(p.r // p.deg) AS BIGINT) AS c
                    FROM edges e JOIN r0 p ON e.src = p.node GROUP BY 1
                ) s ON d.node = s.node
            ), r2 AS (
                SELECT d.node, d.deg,
                       (SELECT base15 FROM n)
                       + (85 * s.c) // 100 AS r
                FROM deg d JOIN (
                    SELECT e.dst AS node,
                           CAST(sum(p.r // p.deg) AS BIGINT) AS c
                    FROM edges e JOIN r1 p ON e.src = p.node GROUP BY 1
                ) s ON d.node = s.node
            ), r3 AS (
                SELECT d.node, d.deg,
                       (SELECT base15 FROM n)
                       + (85 * s.c) // 100 AS r
                FROM deg d JOIN (
                    SELECT e.dst AS node,
                           CAST(sum(p.r // p.deg) AS BIGINT) AS c
                    FROM edges e JOIN r2 p ON e.src = p.node GROUP BY 1
                ) s ON d.node = s.node
            )
            SELECT node AS doc_id, deg, CAST(r AS BIGINT) AS rank_pico
            FROM r3 ORDER BY doc_id
        """,
        "dedup_clusters": f"""
            WITH RECURSIVE {_CLUSTERS_CTE}
            SELECT doc_id, cluster_id FROM cc ORDER BY doc_id
        """,
        "dedup_survivors": f"""
            WITH RECURSIVE {_CLUSTERS_CTE}
            SELECT doc_id, lang, source, n_chars FROM documents
            WHERE doc_id NOT IN
                  (SELECT doc_id FROM cc WHERE doc_id <> cluster_id)
            ORDER BY doc_id
        """,
        "text_fingerprints": """
            -- MOSS winnowing re-derived: md5 lower-64 of every 8-char
            -- window, min over each 4-window frame, DISTINCT mins per
            -- doc, XOR fold of min*golden (mod 2^64) as the fingerprint
            WITH g AS (
                SELECT doc_id, i,
                       md5_number_lower(substring(text, i, 8)) AS h
                FROM documents,
                     UNNEST(generate_series(1, length(text) - 7)) AS t(i)
            ), wm AS (
                SELECT doc_id, i,
                       min(h) OVER (PARTITION BY doc_id ORDER BY i
                           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mn,
                       max(i) OVER (PARTITION BY doc_id) AS imax
                FROM g
            ), fps AS (
                SELECT DISTINCT doc_id, mn FROM wm WHERE i <= imax - 3
            ), x AS (
                SELECT doc_id,
                       bit_xor(CAST(CAST(mn AS UHUGEINT)
                               * 11400714819323198485
                               % 18446744073709551616 AS UBIGINT)) AS fp,
                       count(*) AS n
                FROM fps GROUP BY doc_id
            )
            SELECT doc_id,
                   CAST(CASE WHEN fp >= 9223372036854775808
                        THEN CAST(fp AS HUGEINT) - 18446744073709551616
                        ELSE CAST(fp AS HUGEINT) END AS BIGINT)
                       AS fingerprint,
                   CAST(n AS BIGINT) AS n_distinct_grams
            FROM x ORDER BY doc_id
        """,
        "text_language_id": """
            -- the stopword-profile classifier re-derived in SQL: first
            -- 200 [a-zA-Z]+ tokens lowercased, score(lang) = stopword
            -- hits / token count, winner = highest score with FIRST
            -- profile winning ties (strict > in the Python loop), and
            -- 'unknown' when every score is 0
            WITH stops(lang, prio, w) AS (
                SELECT * FROM (VALUES
                  ('en',1,'the'),('en',1,'and'),('en',1,'of'),('en',1,'to'),
                  ('en',1,'a'),('en',1,'in'),('en',1,'is'),('en',1,'it'),
                  ('en',1,'for'),('en',1,'on'),
                  ('es',2,'el'),('es',2,'la'),('es',2,'de'),('es',2,'que'),
                  ('es',2,'y'),('es',2,'en'),('es',2,'un'),('es',2,'los'),
                  ('es',2,'se'),('es',2,'no'),
                  ('de',3,'der'),('de',3,'die'),('de',3,'und'),('de',3,'das'),
                  ('de',3,'in'),('de',3,'zu'),('de',3,'den'),('de',3,'mit'),
                  ('de',3,'von'),('de',3,'ist'),
                  ('fr',4,'le'),('fr',4,'la'),('fr',4,'de'),('fr',4,'et'),
                  ('fr',4,'les'),('fr',4,'des'),('fr',4,'en'),('fr',4,'un'),
                  ('fr',4,'du'),('fr',4,'que'))
            ), toks AS (
                SELECT doc_id,
                       list_transform(
                           regexp_extract_all(text, '[a-zA-Z]+')[1:200],
                           t -> lower(t)) AS w
                FROM documents
            ), tn AS (
                SELECT doc_id, unnest(w) AS tok, greatest(1, len(w)) AS n
                FROM toks
            ), hits AS (
                SELECT tn.doc_id, s.lang, s.prio,
                       CAST(count(*) AS DOUBLE) / max(tn.n) AS score
                FROM tn JOIN stops s ON s.w = tn.tok
                GROUP BY 1, 2, 3
            ), best AS (
                SELECT doc_id, lang, score,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY score DESC, prio) AS rn
                FROM hits WHERE score > 0
            )
            SELECT d.doc_id,
                   COALESCE(b.lang, 'unknown') AS pred_lang,
                   round(COALESCE(b.score, 0.0), 6) AS confidence
            FROM documents d
            LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
            ORDER BY d.doc_id
        """,
        "stat_quantile_sketch": """
            -- the mergeable log-bin sketch, re-derived: bin =
            -- floor(ln(clip(v,1,1e7))/ln(1.01)) + 1, cumulative pick at
            -- ceil(p*total/1000), estimate = upper bin edge 1.01^bin
            WITH b AS (
                SELECT CAST(floor(ln(least(greatest(
                           CAST(o_totalprice AS DOUBLE), 1.0), 10000000.0))
                           / ln(1.01)) AS BIGINT) + 1 AS bin,
                       count(*) AS cnt
                FROM orders GROUP BY 1
            ), c AS (
                SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum,
                       (SELECT sum(cnt) FROM b) AS total
                FROM b
            ), picks AS (
                SELECT p AS q_permille,
                       (SELECT min(bin) FROM c
                        WHERE cum >= (p * total + 999) // 1000) AS bin
                FROM UNNEST([500, 900, 990]) AS t(p),
                     (SELECT max(total) AS total FROM c)
            )
            SELECT CAST(q_permille AS BIGINT) AS q_permille,
                   round(power(1.01, bin), 4) AS value_est
            FROM picks ORDER BY q_permille
        """,
        "corpus_prep": f"""
            -- the capstone composition is now fully SQL-composable from
            -- its pieces' own oracles: quality-filter predicate ∩ dedup
            -- survivors (CC over exact near-dup pairs) → token counts →
            -- exclusive prefix scan → 2048-token bins
            WITH RECURSIVE {_CLUSTERS_CTE},
            clean AS (
                SELECT doc_id, text FROM documents
                WHERE length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                        * 1.0 / length(text) <= 0.05
                  AND len(str_split_regex(trim(text), '\\s+')) >= 20
                  AND doc_id NOT IN
                      (SELECT doc_id FROM cc WHERE doc_id <> cluster_id)
            ), t AS (
                SELECT doc_id,
                       len(str_split_regex(trim(text), '\\s+')) AS n_tokens
                FROM clean
            ), s AS (
                SELECT doc_id, n_tokens,
                       COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS prev
                FROM t
            )
            SELECT CAST(prev // 2048 AS BIGINT) AS seq_id,
                   count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS n_tokens
            FROM s GROUP BY 1 ORDER BY 1
        """,
        "media_phash_pairs": f"""
            -- perceptual-hash near-dup pairs: SimHash over DISTINCT
            -- 4-byte payload grams (md5 lower-64 gram hash — the same
            -- DuckDB-reproducible convention as dedup_simhash), pairs =
            -- all within Hamming 3 (pigeonhole over 4x16-bit bands)
            WITH pgrams AS (
                SELECT DISTINCT doc_id, g FROM (
                    SELECT doc_id, substring(text, i, 4) AS g
                    FROM documents,
                         UNNEST(generate_series(1, length(text) - 3)) AS t(i))
            ), th AS (
                SELECT doc_id, md5_number_lower(g) AS h FROM pgrams
            ), sbits AS (
                SELECT doc_id, j,
                       sum(CASE WHEN (h >> CAST(j AS UBIGINT)) & 1 = 1
                                THEN 1 ELSE -1 END) AS vote
                FROM th, UNNEST(generate_series(0, 63)) AS t(j)
                GROUP BY doc_id, j
            ), sig AS (
                SELECT doc_id,
                       CAST(sum(CASE WHEN vote > 0 THEN
                            CASE WHEN j = 63
                                 THEN CAST(-9223372036854775808 AS HUGEINT)
                                 ELSE CAST(CAST(1 AS BIGINT)
                                           << CAST(j AS INTEGER) AS HUGEINT)
                                 END
                            ELSE 0 END) AS BIGINT) AS simhash
                FROM sbits GROUP BY doc_id
            ), sigs AS (
                SELECT d.doc_id, COALESCE(s.simhash, 0) AS simhash
                FROM documents d LEFT JOIN sig s USING (doc_id)
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT)
                       AS hamming
            FROM sigs a, sigs b
            WHERE a.doc_id < b.doc_id
              AND bit_count(xor(a.simhash, b.simhash)) <= 3
            ORDER BY doc_a, doc_b
        """,
        "knn_lsh": f"""
            -- full ANN re-derivation from the published hyperplanes:
            -- bucket codes (sign bits of x.w — scale-invariant, so no
            -- normalization needed), multiprobe-1 candidates = Hamming
            -- <=1 on the code in ANY of the 4 tables, exact-cos top-10
            WITH e AS (
                SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                       generate_subscripts(embedding, 1) - 1 AS dim_idx
                FROM embeddings),
            proj AS (
                SELECT e.vec_id, p.tbl, p.plane, sum(e.x * p.w) AS pr
                FROM e JOIN read_parquet('{ORACLE_DIR}/lsh_planes.parquet') p
                     USING (dim_idx)
                GROUP BY 1, 2, 3),
            codes AS (
                SELECT vec_id, tbl,
                       CAST(sum(CASE WHEN pr > 0 THEN
                            (CAST(1 AS BIGINT) << CAST(plane AS INTEGER))
                            ELSE 0 END) AS BIGINT) AS code
                FROM proj GROUP BY 1, 2),
            cand AS (
                SELECT DISTINCT q.vec_id AS query_id, c.vec_id
                FROM codes q JOIN codes c ON c.tbl = q.tbl
                WHERE q.vec_id < 5
                  AND bit_count(xor(c.code, q.code)) <= 1),
            scored AS (
                SELECT cand.query_id, cand.vec_id,
                       list_cosine_similarity(
                           list_transform(ev.embedding,
                                          x -> CAST(x AS DOUBLE)),
                           list_transform(eq.embedding,
                                          x -> CAST(x AS DOUBLE))) AS cos
                FROM cand
                JOIN embeddings ev ON ev.vec_id = cand.vec_id
                JOIN embeddings eq ON eq.vec_id = cand.query_id),
            r AS (
                SELECT query_id, vec_id, cos,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, vec_id) AS rn
                FROM scored)
            SELECT query_id, vec_id, round(cos, 6) AS cos
            FROM r WHERE rn <= 10 ORDER BY query_id, rn
        """,
        "knn_ivf": f"""
            -- IVF re-derivation from the published centroids: cell =
            -- argmax cosine(x, cent) (tie -> lowest cluster), query
            -- probes its 4 nearest cells, exact-cos top-10 among
            -- candidate cells' members
            WITH e AS (
                SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                       generate_subscripts(embedding, 1) - 1 AS dim_idx
                FROM embeddings),
            nrm AS (
                SELECT vec_id, sqrt(sum(x * x)) AS nv FROM e GROUP BY 1),
            dots AS (
                SELECT e.vec_id, c.cluster, sum(e.x * c.c) AS dot
                FROM e JOIN read_parquet('{ORACLE_DIR}/ivf_cents.parquet') c
                     USING (dim_idx)
                GROUP BY 1, 2),
            scored AS (
                SELECT d.vec_id, d.cluster,
                       d.dot / NULLIF(nrm.nv, 0) AS cosc,
                       row_number() OVER (PARTITION BY d.vec_id
                           ORDER BY d.dot / NULLIF(nrm.nv, 0) DESC,
                                    d.cluster) AS rn
                FROM dots d JOIN nrm USING (vec_id)),
            assign AS (SELECT vec_id, cluster FROM scored WHERE rn = 1),
            qcells AS (
                SELECT vec_id AS query_id, cluster FROM scored
                WHERE vec_id < 5 AND rn <= 4),
            cand AS (
                SELECT DISTINCT q.query_id, a.vec_id
                FROM qcells q JOIN assign a ON a.cluster = q.cluster),
            paircos AS (
                SELECT cand.query_id, cand.vec_id,
                       list_cosine_similarity(
                           list_transform(ev.embedding,
                                          x -> CAST(x AS DOUBLE)),
                           list_transform(eq.embedding,
                                          x -> CAST(x AS DOUBLE))) AS cos
                FROM cand
                JOIN embeddings ev ON ev.vec_id = cand.vec_id
                JOIN embeddings eq ON eq.vec_id = cand.query_id),
            r AS (
                SELECT query_id, vec_id, cos,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, vec_id) AS rn
                FROM paircos)
            SELECT query_id, vec_id, round(cos, 6) AS cos
            FROM r WHERE rn <= 10 ORDER BY query_id, rn
        """,
        "emb_decontaminate": """
            -- semantic decontamination: corpus vectors within cos >
            -- 0.35 of ANY benchmark vector (vec_id < 20), closest
            -- benchmark + cosine (argmax tie → lowest bench_id) —
            -- mirrors similarity.emb_decontaminate
            WITH b AS (
                SELECT vec_id AS bench_id,
                       list_transform(embedding,
                                      x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings WHERE vec_id < 20
            ), c AS (
                SELECT vec_id,
                       list_transform(embedding,
                                      x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings WHERE vec_id >= 20
            ), pairs AS (
                SELECT c.vec_id, b.bench_id,
                       list_cosine_similarity(c.v, b.v) AS cos,
                       row_number() OVER (PARTITION BY c.vec_id
                                          ORDER BY
                                          list_cosine_similarity(c.v, b.v)
                                              DESC, b.bench_id) AS rn
                FROM c, b
            )
            SELECT vec_id, bench_id, round(cos, 6) AS cos
            FROM pairs WHERE rn = 1 AND cos > 0.35
            ORDER BY vec_id
        """,
        "knn_pq": f"""
            -- product-quantization ADC re-derived from the published
            -- codebook + quantized per-query distance tables: code =
            -- argmin L2 per (vector, subspace) (tie → lowest cluster),
            -- adc = EXACT-INTEGER sum of the d9 lookups, one shared
            -- /1e9 division — mirrors similarity.knn_pq
            WITH e AS (
                SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                       generate_subscripts(embedding, 1) - 1 AS dim_idx
                FROM embeddings),
            nrm AS (
                SELECT vec_id, sqrt(sum(x * x)) AS nv FROM e GROUP BY 1),
            d2 AS (
                SELECT e.vec_id, b.subspace, b.cluster,
                       sum(pow(e.x / NULLIF(nrm.nv, 0) - b.c, 2)) AS d2
                FROM e JOIN nrm USING (vec_id)
                JOIN read_parquet('{ORACLE_DIR}/pq_books.parquet') b
                  ON b.subspace = e.dim_idx // 16
                 AND b.dim_idx = e.dim_idx % 16
                GROUP BY 1, 2, 3),
            codes AS (
                SELECT vec_id, subspace, cluster FROM (
                    SELECT vec_id, subspace, cluster,
                           row_number() OVER (
                               PARTITION BY vec_id, subspace
                               ORDER BY d2, cluster) AS rn
                    FROM d2) WHERE rn = 1),
            adc AS (
                SELECT q.query_id, c.vec_id,
                       CAST(sum(q.d9) AS BIGINT) AS adc9
                FROM codes c
                JOIN read_parquet('{ORACLE_DIR}/pq_books_qdt.parquet') q
                  ON q.subspace = c.subspace AND q.cluster = c.cluster
                GROUP BY 1, 2),
            r AS (
                SELECT query_id, vec_id, adc9,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY adc9, vec_id) AS rn
                FROM adc)
            SELECT query_id, vec_id, adc9 / 1e9 AS adc
            FROM r WHERE rn <= 10 ORDER BY query_id, rn
        """,
        "embed_pca": f"""
            -- distributed projection vs per-row SQL over the published
            -- (mean, components) sidecar: pc_j = (x - mean) . comp_j
            WITH e AS (
                SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                       generate_subscripts(embedding, 1) - 1 AS dim_idx
                FROM embeddings)
            SELECT e.vec_id,
                   round(sum((x - m.mean) * m.c0), 6) AS pc0,
                   round(sum((x - m.mean) * m.c1), 6) AS pc1,
                   round(sum((x - m.mean) * m.c2), 6) AS pc2,
                   round(sum((x - m.mean) * m.c3), 6) AS pc3
            FROM e JOIN read_parquet('{ORACLE_DIR}/pca.parquet') m
                 USING (dim_idx)
            GROUP BY e.vec_id ORDER BY e.vec_id
        """,
        "embed_docs": f"""
            -- full re-derivation of the hashing-trick + sparse-JL
            -- embedding: tokenize, md5-lower-64 hash, signed bucket
            -- counts, INTEGER projection through the published +-1/0
            -- JL sidecar (exact in both engines), one normalize+round.
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text),
                                                 '[a-z0-9_]+')) AS tok
                FROM documents),
            feats AS (
                SELECT doc_id,
                       CAST(md5_number_lower(tok) % 1024 AS BIGINT)
                           AS bucket,
                       SUM(CASE WHEN (md5_number_lower(tok) // 1024) % 2
                                     = 0 THEN 1 ELSE -1 END) AS cnt
                FROM toks GROUP BY 1, 2),
            raw AS (
                SELECT f.doc_id, p.dim,
                       SUM(f.cnt * p.weight) AS v
                FROM feats f
                JOIN read_parquet('{ORACLE_DIR}/embed_proj.parquet') p
                     USING (bucket)
                GROUP BY 1, 2),
            nrm AS (
                SELECT doc_id, sqrt(SUM(CAST(v AS DOUBLE) ** 2)) AS nrm
                FROM raw GROUP BY 1)
            SELECT r.doc_id,
                   list(round(CAST(r.v AS DOUBLE) / n.nrm, 6)
                        ORDER BY r.dim) AS embedding
            FROM raw r JOIN nrm n USING (doc_id)
            WHERE n.nrm > 0
            GROUP BY r.doc_id ORDER BY r.doc_id
        """,
        "cluster_kmeans": f"""
            -- distributed assignment vs SQL argmin over the published
            -- final centroids (tie -> lowest cluster id, like argmin)
            WITH e AS (
                SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                       generate_subscripts(embedding, 1) - 1 AS dim_idx
                FROM embeddings),
            d AS (
                SELECT e.vec_id, c.cluster,
                       sum((x - c.c) * (x - c.c)) AS dist
                FROM e JOIN read_parquet('{ORACLE_DIR}/kmeans.parquet') c
                     USING (dim_idx)
                GROUP BY 1, 2),
            r AS (
                SELECT vec_id, cluster, dist,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dist, cluster) AS rn
                FROM d)
            SELECT vec_id, cluster, round(greatest(dist, 0), 6) AS dist
            FROM r WHERE rn = 1 ORDER BY vec_id
        """,
        "semdedup": f"""
            -- cluster assignment from the published spherical centroids,
            -- then the SemDeDup rule: dup_of = min earlier-id member of
            -- the same cluster with cosine >= 0.99 (-1 = kept); runs on
            -- the seeded-duplicate augmented table like emb_near_dup
            WITH aug AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE))
                           AS emb
                FROM embeddings
                UNION ALL
                SELECT vec_id + 1000000,
                       list_transform(embedding, x -> CAST(x AS DOUBLE))
                FROM embeddings WHERE vec_id < 50),
            scored AS (
                SELECT a.vec_id, c.cluster, a.emb,
                       row_number() OVER (PARTITION BY a.vec_id
                           ORDER BY list_cosine_similarity(a.emb, c.cent)
                                    DESC, c.cluster) AS rn
                FROM aug a,
                     read_parquet('{ORACLE_DIR}/semdedup.parquet') c),
            assigned AS (
                SELECT vec_id, cluster, emb FROM scored WHERE rn = 1),
            dup AS (
                SELECT a.vec_id, min(b.vec_id) AS dup_of
                FROM assigned a JOIN assigned b
                  ON a.cluster = b.cluster AND b.vec_id < a.vec_id
                WHERE list_cosine_similarity(a.emb, b.emb) >= 0.99
                GROUP BY a.vec_id)
            SELECT a.vec_id, a.cluster, dup.dup_of IS NULL AS keep,
                   COALESCE(dup.dup_of, -1) AS dup_of
            FROM assigned a LEFT JOIN dup USING (vec_id)
            ORDER BY a.vec_id
        """,
        "dedup_ngram_jaccard": """
            -- word-3-gram Jaccard; mirrors pipelines/dedup.py exactly:
            -- gram SETS per doc; candidate pairs share >=1 gram with
            -- doc-frequency in [2, 50] (stop-grams excluded from both
            -- candidate gen AND the shared count); |A|,|B| are FULL set
            -- sizes; jaccard raw float64 (bit-identical IEEE division)
            WITH toks AS (
                SELECT doc_id, string_split(lower(text), ' ') AS w
                FROM documents
            ), grams AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
                FROM toks,
                     UNNEST(generate_series(1, greatest(0, len(w) - 2))) AS t(i)
            ), sizes AS (
                SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id
            ), df AS (
                SELECT gram, count(*) AS df FROM grams GROUP BY gram
            ), shared AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       count(*) AS shared
                FROM grams a
                JOIN df USING (gram)
                JOIN grams b USING (gram)
                WHERE a.doc_id < b.doc_id AND df.df BETWEEN 2 AND 50
                GROUP BY 1, 2
            )
            SELECT s.doc_a, s.doc_b,
                   CAST(s.shared AS DOUBLE) / (sa.n + sb.n - s.shared)
                       AS jaccard
            FROM shared s
            JOIN sizes sa ON sa.doc_id = s.doc_a
            JOIN sizes sb ON sb.doc_id = s.doc_b
            WHERE CAST(s.shared AS DOUBLE) / (sa.n + sb.n - s.shared) >= 0.3
            ORDER BY s.doc_a, s.doc_b
        """,
        "cdc_table_ingest": """
            WITH final AS (
                SELECT 'corpus/' || source AS repo,
                       'docs/d' || doc_id || '.txt' AS path,
                       CASE WHEN doc_id % 3 = 0 THEN md5(text || ' [v2]')
                            ELSE md5(text) END AS commit,
                       lang,
                       CASE WHEN doc_id % 3 = 0 THEN text || ' [v2]'
                            ELSE text END AS content,
                       CASE WHEN doc_id % 3 = 0 THEN 10000000 + doc_id + 1
                            ELSE doc_id + 1 END AS lsn,
                       CASE WHEN doc_id % 3 = 0 THEN 'u' ELSE 'c' END AS op
                FROM documents
                WHERE doc_id % 7 <> 0
            )
            SELECT * FROM final ORDER BY repo, path
        """,
        "window_sessions": """
            WITH marked AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                              OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
                SELECT user_id, ts,
                       sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_id
                FROM marked
            )
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   count(*) AS n_events,
                   min(ts) AS session_start, max(ts) AS session_end
            FROM sess GROUP BY user_id, session_id
            ORDER BY user_id, session_id
        """,
        "asof_last_view": """
            SELECT event_id, user_id, value, last_view_id FROM (
                SELECT event_id, user_id, event_type, value,
                       max(CASE WHEN event_type = 'view' THEN event_id END)
                           OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                           AS last_view_id
                FROM events
            ) WHERE event_type = 'purchase' ORDER BY event_id
        """,
        "anti_join_events": """
            SELECT user_id, count(*) AS n_events, min(event_id) AS min_event_id
            FROM events
            WHERE user_id NOT IN (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0)
            GROUP BY user_id ORDER BY user_id
        """,
        "topk_per_segment": """
            SELECT c_mktsegment, CAST(rank AS BIGINT) AS rank,
                   o_orderkey, o_totalprice
            FROM (
                SELECT c_mktsegment, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY c_mktsegment
                                          ORDER BY o_totalprice DESC, o_orderkey)
                           AS rank
                FROM orders JOIN customer ON o_custkey = c_custkey
            ) WHERE rank <= 3
            ORDER BY c_mktsegment, rank
        """,
        "text_quality_filter": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0
                    / length(text) <= 0.05
              AND len(str_split_regex(trim(text), '\\s+')) >= 20
            ORDER BY doc_id
        """,
        "sample_documents": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE (doc_id * 2654435761) % 1000 < 100
            ORDER BY doc_id
        """,
        "cdc_lww_state": """
            SELECT user_id,
                   max(event_id) AS event_id,
                   arg_max(event_type, event_id) AS event_type,
                   arg_max(value, event_id) AS value,
                   arg_max(ts, event_id) AS ts
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "cdc_lww_deletes": """
            SELECT user_id,
                   max(event_id) AS event_id,
                   arg_max(event_type, event_id) AS event_type,
                   arg_max(value, event_id) AS value
            FROM events GROUP BY user_id
            HAVING arg_max(event_type, event_id) <> 'error'
            ORDER BY user_id
        """,
        "cdc_partition_lineage": """
            SELECT user_id % 8 AS partition_id,
                   count(*) AS events_applied,
                   max(event_id) AS committed_lsn,
                   round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "cdc_envelope_roundtrip": """
            SELECT event_id AS lsn, user_id, event_type, value
            FROM events ORDER BY lsn
        """,
        "cdc_window_aggregate": """
            SELECT event_id // 1000 AS window_id,
                   count(*) AS n_events,
                   round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value,
                   max(event_id) AS watermark
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "cdc_dedup_fence": """
            SELECT event_type,
                   count(*) AS events_applied,
                   min(event_id) AS min_lsn,
                   max(event_id) AS max_lsn
            FROM events WHERE event_id > 5000
            GROUP BY event_type ORDER BY event_type
        """,
        "cdc_changefeed_serialize": """
            SELECT event_id AS lsn,
                   'cdc.' || event_type AS destination,
                   '{"event_id":' || event_id || ',"user_id":' || user_id
                     || ',"event_type":"' || event_type || '","value":'
                     || printf('%.2f', value) || '}' AS payload
            FROM events ORDER BY lsn
        """,
        "agg_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4) AS sum_disc_price,
                   round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
                   round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "join_bucket_revenue": """
            SELECT c_mktsegment,
                   count(*) AS n_orders,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "join_revenue_by_segment": """
            SELECT c_mktsegment,
                   count(*) AS n_orders,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "join_customers_per_region": """
            SELECT r_name,
                   count(*) AS n_customers,
                   round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_acctbal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name
        """,
        "topk_orders": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 10
        """,
        "filter_range_aggregate": """
            SELECT event_type,
                   count(*) AS n_events,
                   round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_value,
                   round(max(value), 2) AS max_value
            FROM events WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
            GROUP BY event_type ORDER BY event_type
        """,
        "distinct_langs": """
            SELECT DISTINCT lang FROM documents ORDER BY lang
        """,
        "order_priority_histogram": """
            SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
            FROM orders GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id, md5(text) AS text_hash
            FROM documents GROUP BY md5(text) ORDER BY doc_id
        """,
        "text_token_counts": """
            SELECT doc_id,
                   len(str_split_regex(trim(text), '\\s+')) AS n_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
                   length(text) AS n_chars_calc
            FROM documents ORDER BY doc_id
        """,
        "text_dsir_weights": """
            -- re-derives the distributed score pass: feature =
            -- md5_number_lower(token) % 1024 (the repo hash
            -- convention), per-doc sum of the published quantized
            -- log importance ratios — integer micronats end to end
            WITH lr AS (
                SELECT feature, lr_micronats FROM read_parquet(
                    '/tmp/cdcsdk_oracle/dsir_lr.parquet')),
            toks AS (
                SELECT doc_id,
                       unnest(str_split_regex(trim(lower(text)),
                                              '\s+')) AS tok
                FROM documents),
            f AS (
                SELECT doc_id,
                       CAST(md5_number_lower(tok) % 1024 AS BIGINT)
                           AS feature
                FROM toks),
            s AS (
                SELECT doc_id, count(*) AS n,
                       sum(lr_micronats) AS logw
                FROM f JOIN lr USING (feature) GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(COALESCE(s.n, 0) AS BIGINT) AS n_tokens,
                   CAST(COALESCE(s.logw, 0) AS BIGINT)
                       AS logw_micronats
            FROM documents d LEFT JOIN s USING (doc_id)
            ORDER BY doc_id
        """,
        "text_lm_perplexity": """
            -- re-derives the distributed score pass from the published
            -- quantized LM sidecar (tok_b IS NULL rows = unseen-bigram
            -- fallbacks per prefix; the tok_a IS NULL row = OOV):
            -- integer micronats end to end, no float summation
            WITH lm AS (
                SELECT * FROM read_parquet(
                    '/tmp/cdcsdk_oracle/lm_bigram.parquet')),
            bg AS (
                SELECT tok_a, tok_b, nll_micronats FROM lm
                WHERE tok_b IS NOT NULL),
            ug AS (
                SELECT tok_a, nll_micronats FROM lm
                WHERE tok_b IS NULL AND tok_a IS NOT NULL),
            oov AS (
                SELECT nll_micronats FROM lm WHERE tok_a IS NULL),
            d AS (
                SELECT doc_id,
                       str_split_regex(trim(lower(text)), '\s+') AS w
                FROM documents),
            pairs AS (
                SELECT doc_id, w[i] AS ta, w[i + 1] AS tb
                FROM d, UNNEST(range(1, len(w))) AS t(i)),
            scored AS (
                SELECT p.doc_id,
                       COALESCE(bg.nll_micronats, ug.nll_micronats,
                                (SELECT nll_micronats FROM oov)) AS nll
                FROM pairs p
                LEFT JOIN bg ON bg.tok_a = p.ta AND bg.tok_b = p.tb
                LEFT JOIN ug ON ug.tok_a = p.ta),
            tot AS (
                SELECT doc_id, count(*) AS n_bg, sum(nll) AS nll_tot
                FROM scored GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(COALESCE(t.n_bg, 0) AS BIGINT) AS n_bigrams,
                   CAST(COALESCE(t.nll_tot, 0) AS BIGINT)
                       AS nll_micronats,
                   CAST(CASE WHEN COALESCE(t.n_bg, 0) > 0
                        THEN t.nll_tot // t.n_bg ELSE 0 END AS BIGINT)
                       AS avg_nll_micronats
            FROM d LEFT JOIN tot t USING (doc_id) ORDER BY doc_id
        """,
        "text_tfidf": """
            WITH tf AS (
                SELECT doc_id, term, count(*) AS tf
                FROM (SELECT doc_id,
                             unnest(str_split_regex(trim(lower(text)), '\\s+')) AS term
                      FROM documents)
                GROUP BY doc_id, term
            ), w AS (
                SELECT doc_id, term, tf,
                       count(*) OVER (PARTITION BY term) AS df
                FROM tf
            )
            SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
                   CAST(df AS BIGINT) AS df,
                   round(tf * ln((SELECT count(*) FROM documents) / df), 6)
                       AS tfidf
            FROM w WHERE tf >= 3
            ORDER BY doc_id, term
        """,
        "text_bm25": """
            -- Okapi BM25, Lucene plus-1 idf; expression tree mirrors the
            -- numpy order op-for-op so only ln can differ (6dp round)
            WITH tf AS (
                SELECT doc_id, term, count(*) AS tf
                FROM (SELECT doc_id,
                             unnest(str_split_regex(trim(lower(text)), '\\s+')) AS term
                      FROM documents)
                GROUP BY doc_id, term
            ), dl AS (
                SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
                FROM tf GROUP BY doc_id
            ), stats AS (
                SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
                       CAST((SELECT sum(dl) FROM dl) AS DOUBLE)
                           / CAST((SELECT count(*) FROM documents) AS DOUBLE)
                           AS avgdl
            ), w AS (
                SELECT tf.doc_id, tf.term, tf.tf, dl.dl,
                       count(*) OVER (PARTITION BY tf.term) AS df
                FROM tf JOIN dl ON tf.doc_id = dl.doc_id
            )
            SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
                   CAST(df AS BIGINT) AS df, dl,
                   round(ln((stats.n - df + 0.5) / (df + 0.5) + 1.0)
                         * (tf * (1.2 + 1.0)
                            / (tf + 1.2 * (1.0 - 0.75
                                           + 0.75 * dl / stats.avgdl))), 6)
                       AS bm25
            FROM w, stats WHERE tf >= 3
            ORDER BY doc_id, term
        """,
        "text_bm25_search": """
            -- BM25 retrieval for the fixed query {merge, stream, window}:
            -- per-term contributions quantized to integer micro-BM25
            -- BEFORE the per-doc sum (order-free addition), top-100 with
            -- doc_id tiebreak — mirrors pipelines/text.bm25_search
            WITH tf AS (
                SELECT doc_id, term, count(*) AS tf
                FROM (SELECT doc_id,
                             unnest(str_split_regex(trim(lower(text)), '\\s+')) AS term
                      FROM documents)
                GROUP BY doc_id, term
            ), dl AS (
                SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
                FROM tf GROUP BY doc_id
            ), stats AS (
                SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
                       CAST((SELECT sum(dl) FROM dl) AS DOUBLE)
                           / CAST((SELECT count(*) FROM documents) AS DOUBLE)
                           AS avgdl
            ), q AS (
                SELECT unnest(['merge', 'stream', 'window']) AS term
            ), dfq AS (
                SELECT tf.term, count(*) AS df
                FROM tf JOIN q ON tf.term = q.term GROUP BY tf.term
            ), scored AS (
                SELECT tf.doc_id,
                       sum(CAST(round(
                           ln((stats.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
                           * (tf.tf * (1.2 + 1.0)
                              / (tf.tf + 1.2 * (1.0 - 0.75
                                                + 0.75 * dl.dl / stats.avgdl)))
                           * 1000000.0) AS BIGINT)) AS score_micro
                FROM tf
                JOIN dfq ON tf.term = dfq.term
                JOIN dl ON tf.doc_id = dl.doc_id, stats
                GROUP BY tf.doc_id
            )
            SELECT doc_id, CAST(score_micro AS BIGINT) AS score_micro
            FROM scored
            ORDER BY score_micro DESC, doc_id
            LIMIT 100
        """,
        "dedup_substrings": """
            -- ExactSubstr: every 8-token window materialized; a window is
            -- duplicated unless it is its gram's global first occurrence
            -- (min doc_id, pos); removed tokens = union of dup spans
            WITH toks AS (
                SELECT doc_id, str_split_regex(trim(text), '\\s+') AS w
                FROM documents
            ), base AS (
                SELECT doc_id, len(w) AS n_tokens, w FROM toks
            ), wins AS (
                SELECT doc_id,
                       unnest([i for i in range(1, len(w) - 8 + 2)]) AS p,
                       unnest([array_to_string(w[i:i+7], ' ')
                               for i in range(1, len(w) - 8 + 2)]) AS g
                FROM base WHERE len(w) >= 8
            ), marked AS (
                SELECT doc_id, p,
                       row_number() OVER (PARTITION BY g
                                          ORDER BY doc_id, p) AS rn
                FROM wins
            ), dups AS (
                SELECT doc_id, p FROM marked WHERE rn > 1
            ), covered AS (
                SELECT DISTINCT doc_id, tp FROM
                (SELECT doc_id, unnest([p + j for j in range(0, 8)]) AS tp
                 FROM dups)
            ), agg AS (
                SELECT doc_id, count(*) AS n_removed_tokens
                FROM covered GROUP BY doc_id
            ), dc AS (
                SELECT doc_id, count(*) AS n_dup_windows
                FROM dups GROUP BY doc_id
            )
            SELECT b.doc_id, b.n_tokens,
                   greatest(b.n_tokens - 8 + 1, 0) AS n_windows,
                   coalesce(dc.n_dup_windows, 0) AS n_dup_windows,
                   coalesce(agg.n_removed_tokens, 0) AS n_removed_tokens
            FROM base b
            LEFT JOIN dc ON dc.doc_id = b.doc_id
            LEFT JOIN agg ON agg.doc_id = b.doc_id
            ORDER BY b.doc_id
        """,
        "text_dup_ngrams": """
            WITH toks AS (
                SELECT doc_id, str_split_regex(trim(text), '\\s+') AS w
                FROM documents
            ), grams AS (
                SELECT doc_id,
                       unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                               for i in range(1, len(w) - 1)]) AS g
                FROM toks WHERE len(w) >= 3
            )
            SELECT doc_id, count(*) AS n_ngrams,
                   count(DISTINCT g) AS n_distinct,
                   1.0 - count(DISTINCT g) * 1.0 / count(*) AS dup_ratio
            FROM grams GROUP BY doc_id ORDER BY doc_id
        """,
        "text_repetition": """
            WITH toks AS (
                SELECT doc_id, str_split_regex(trim(text), '\\s+') AS w,
                       length(text) AS nc
                FROM documents
            ), wc AS (
                SELECT doc_id, wd, count(*) AS c
                FROM (SELECT doc_id, unnest(w) AS wd FROM toks)
                GROUP BY doc_id, wd
            ), ws AS (
                SELECT doc_id, max(c) AS mx, sum(c) AS tot,
                       count(*) AS nd
                FROM wc GROUP BY doc_id
            ), grams AS (
                SELECT doc_id,
                       unnest([w[i] || ' ' || w[i+1]
                               for i in range(1, len(w))]) AS g,
                       nc
                FROM toks WHERE len(w) >= 2
            ), gc AS (
                SELECT doc_id, g, count(*) AS c, max(nc) AS nc
                FROM grams GROUP BY doc_id, g
            ), gtop AS (
                SELECT doc_id,
                       CAST(max(c * length(g)) AS DOUBLE)
                           / CAST(max(nc) AS DOUBLE) AS bg
                FROM gc GROUP BY doc_id
            )
            SELECT ws.doc_id,
                   CAST(ws.mx AS DOUBLE) / CAST(ws.tot AS DOUBLE)
                       AS top_word_frac,
                   1.0 - CAST(ws.nd AS DOUBLE) / CAST(ws.tot AS DOUBLE)
                       AS dup_word_frac,
                   COALESCE(g.bg, 0.0) AS top_bigram_char_frac
            FROM ws LEFT JOIN gtop g USING (doc_id) ORDER BY doc_id
        """,
        "quality_quantile_filter": """
            WITH pr AS (
                SELECT doc_id, lang,
                       round(length(regexp_replace(text, '\\s', '', 'g'))
                             * 1.0
                             / len(str_split_regex(trim(text), '\\s+')),
                             3) AS mean_token_len
                FROM documents
            ), th AS (
                SELECT quantile_disc(mean_token_len, 0.900) AS t FROM pr
            )
            SELECT pr.doc_id, pr.lang, pr.mean_token_len
            FROM pr, th WHERE pr.mean_token_len <= th.t
            ORDER BY pr.doc_id
        """,
        "pack_sequences": """
            WITH t AS (
                SELECT doc_id,
                       len(str_split_regex(trim(text), '\\s+')) AS n_tokens
                FROM documents
            ), s AS (
                SELECT doc_id, n_tokens,
                       COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS prev
                FROM t
            )
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(prev // 2048 AS BIGINT) AS seq_id
            FROM s ORDER BY doc_id
        """,
        "text_word_topk": """
            WITH toks AS (
                SELECT unnest(str_split_regex(lower(trim(text)), '\\s+'))
                           AS word
                FROM documents
            )
            SELECT word, count(*) AS n FROM toks GROUP BY word
            ORDER BY n DESC, word LIMIT 50
        """,
        "text_novelty": """
            -- per-doc 3-gram novelty: fraction of a doc's distinct
            -- grams whose FIRST owner (min doc_id) is the doc itself —
            -- mirrors text.ngram_novelty
            WITH toks AS (
                SELECT doc_id, string_split(lower(text), ' ') AS w
                FROM documents
            ), grams AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
                FROM toks,
                     UNNEST(generate_series(1, greatest(0, len(w) - 2)))
                         AS t(i)
            ), f AS (
                SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g
            )
            SELECT doc_id, COUNT(*) AS n_grams,
                   CAST(SUM(CASE WHEN doc_id = first_doc
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
                   ROUND(CAST(SUM(CASE WHEN doc_id = first_doc
                                       THEN 1 ELSE 0 END) AS DOUBLE)
                         / COUNT(*), 6) AS novelty
            FROM grams JOIN f USING (g)
            GROUP BY doc_id ORDER BY doc_id
        """,
        "text_epoch_shuffle": """
            -- deterministic epoch shuffle: exact global rank under the
            -- md5-lower-64 key (doc_id tiebreak) — mirrors
            -- text.epoch_shuffle_rank
            SELECT doc_id,
                   CAST(row_number() OVER (
                       ORDER BY md5_number_lower('ep1-' || doc_id),
                                doc_id) - 1 AS BIGINT) AS rank
            FROM documents ORDER BY rank
        """,
        "text_source_overlap": """
            -- cross-source word-5-gram containment matrix (corpus
            -- contamination audit); gram identity = md5-lower-64 of
            -- the joined words (the repo's oracle-able hash
            -- convention) — mirrors text.source_overlap
            WITH toks AS (
                SELECT source, string_split(lower(text), ' ') AS w
                FROM documents
            ), grams AS (
                SELECT DISTINCT source,
                       md5_number_lower(w[i] || ' ' || w[i+1] || ' ' ||
                                        w[i+2] || ' ' || w[i+3] || ' ' ||
                                        w[i+4]) AS g
                FROM toks,
                     UNNEST(generate_series(1, greatest(0, len(w) - 4)))
                         AS t(i)
            ), sizes AS (
                SELECT source, count(*) AS n FROM grams GROUP BY source
            ), shared AS (
                SELECT a.source AS source_a, b.source AS source_b,
                       count(*) AS shared
                FROM grams a JOIN grams b USING (g)
                WHERE a.source < b.source GROUP BY 1, 2
            )
            SELECT source_a, source_b, shared,
                   ROUND(CAST(shared AS DOUBLE)
                         / (sa.n + sb.n - shared), 6) AS jaccard
            FROM shared
            JOIN sizes sa ON sa.source = source_a
            JOIN sizes sb ON sb.source = source_b
            ORDER BY source_a, source_b
        """,
        "text_entropy": """
            -- per-doc unigram entropy (nats): -(c/n)·ln(c/n) summed per
            -- doc, rounded 6dp — mirrors text.token_entropy
            WITH toks AS (
                SELECT doc_id,
                       unnest(str_split_regex(lower(trim(text)), '\\s+'))
                           AS w
                FROM documents
            ), c AS (
                SELECT doc_id, w, count(*) AS c FROM toks GROUP BY 1, 2
            ), n AS (
                SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
                       CAST(count(*) AS BIGINT) AS n_distinct
                FROM c GROUP BY 1
            )
            SELECT c.doc_id, n.n AS n_tokens, n.n_distinct,
                   round(sum(-(c.c / n.n) * ln(c.c / n.n)), 6) AS entropy
            FROM c JOIN n USING (doc_id)
            GROUP BY c.doc_id, n.n, n.n_distinct
            ORDER BY doc_id
        """,
        "text_collocations": """
            -- PMI-scored collocations over the top-100 adjacent pairs;
            -- the two ln() calls and round(…,6) mirror the driver-side
            -- final in text.collocations_pmi exactly
            WITH toks AS (
                SELECT str_split_regex(lower(trim(text)), '\\s+') AS ws
                FROM documents
            ), uni AS (
                SELECT w AS word, count(*) AS n
                FROM toks, LATERAL (SELECT unnest(ws) AS w) t
                GROUP BY 1
            ), tot AS (
                SELECT CAST(sum(n) AS BIGINT) AS n_tokens FROM uni
            ), pcnt AS (
                SELECT ws[i] AS w1, ws[i + 1] AS w2, count(*) AS n
                FROM toks, LATERAL (
                    SELECT unnest(range(1, len(ws))) AS i) t
                GROUP BY 1, 2
            ), ptot AS (
                SELECT CAST(sum(n) AS BIGINT) AS n_pairs FROM pcnt
            ), top AS (
                SELECT w1, w2, n FROM pcnt
                ORDER BY n DESC, w1, w2 LIMIT 100
            )
            SELECT t.w1, t.w2, t.n,
                   round(ln((t.n / ptot.n_pairs)
                            / ((u1.n / tot.n_tokens)
                               * (u2.n / tot.n_tokens))), 6) AS pmi
            FROM top t CROSS JOIN tot CROSS JOIN ptot
            JOIN uni u1 ON t.w1 = u1.word
            JOIN uni u2 ON t.w2 = u2.word
            ORDER BY t.n DESC, t.w1, t.w2
        """,
        "text_bpe_pairs": """
            -- BPE merge-candidate counts: adjacent token pairs within
            -- each doc — mirrors text.bpe_pair_counts (word-level
            -- symbols, one merge round)
            WITH toks AS (
                SELECT str_split_regex(lower(trim(text)), '\\s+') AS ws
                FROM documents
            ), pairs AS (
                SELECT ws[i] || ' ' || ws[i + 1] AS pair
                FROM toks, LATERAL (
                    SELECT unnest(range(1, len(ws))) AS i) t
            )
            SELECT pair, count(*) AS n FROM pairs GROUP BY pair
            ORDER BY n DESC, pair LIMIT 50
        """,
        "window_hopping": """
            -- 60-min windows hopping every 15 min: each event lands in
            -- 4 overlapping windows (15-min epoch-aligned floor, then
            -- 4 backward shifts)
            WITH x AS (
                SELECT time_bucket(INTERVAL '15 minutes', ts)
                           - j * INTERVAL '15 minutes' AS window_start,
                       event_type, value
                FROM events, UNNEST([0, 1, 2, 3]) AS t(j)
            )
            SELECT window_start, event_type,
                   count(*) AS n_events,
                   round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
                       AS sum_value,
                   round(max(value), 2) AS max_value
            FROM x GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "join_range_bands": """
            -- interval join: event.value in [lo, hi) with OVERLAPPING
            -- bands (spacing 15 < width 40)
            SELECT n.n_nationkey AS band_id, e.event_id, e.value,
                   n.n_nationkey * 15.0 AS lo,
                   n.n_nationkey * 15.0 + 40.0 AS hi
            FROM events e
            JOIN nation n ON e.value >= n.n_nationkey * 15.0
                         AND e.value <  n.n_nationkey * 15.0 + 40.0
            ORDER BY band_id, event_id
        """,
        "stat_approx_distinct": """
            -- KMV sketch, exactly reproduced: k=256 smallest distinct
            -- 32-bit Knuth hashes; estimate (k-1)*2^32/h_k (or the
            -- exact count when fewer than k distinct hashes exist)
            WITH h AS (
                SELECT DISTINCT (l_partkey * 2654435761) % 4294967296
                           AS hv
                FROM lineitem
            ), b AS (
                SELECT hv FROM h ORDER BY hv LIMIT 256
            )
            SELECT CAST(count(*) AS BIGINT) AS k_used,
                   CAST(max(hv) AS BIGINT) AS kth_hash,
                   CASE WHEN count(*) < 256
                        THEN CAST(count(*) AS DOUBLE)
                        ELSE round(255 * 4294967296.0 / max(hv), 6)
                   END AS estimate
            FROM b
        """,
        "stat_histogram": """
            SELECT CAST(floor(value / 10.0) AS BIGINT) AS bin,
                   count(*) AS n
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "stat_drift_psi": """
            -- PSI between value distributions before/after the split,
            -- Laplace-smoothed like the Ray side
            WITH b AS (
                SELECT CAST(floor(value / 10.0) AS BIGINT) AS bin,
                       count(*) FILTER (WHERE ts < TIMESTAMP '2024-01-16')
                           AS n_a,
                       count(*) FILTER (WHERE ts >= TIMESTAMP '2024-01-16')
                           AS n_b
                FROM events GROUP BY 1
            ), t AS (
                SELECT CAST(count(*) AS BIGINT) AS nb,
                       CAST(sum(n_a) AS BIGINT) AS ta,
                       CAST(sum(n_b) AS BIGINT) AS tb
                FROM b
            )
            SELECT t.nb AS n_bins, t.ta AS n_early, t.tb AS n_late,
                   round(sum(((b.n_a + 0.5) / (t.ta + 0.5 * t.nb)
                              - (b.n_b + 0.5) / (t.tb + 0.5 * t.nb))
                             * ln(((b.n_a + 0.5) / (t.ta + 0.5 * t.nb))
                                  / ((b.n_b + 0.5) / (t.tb + 0.5 * t.nb)))),
                         6) AS psi
            FROM b, t GROUP BY t.nb, t.ta, t.tb
        """,
        "agg_wow_revenue": """
            -- week-over-week totals in exact integer micros
            WITH w AS (
                SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
                       count(*) AS n_events,
                       CAST(sum(CAST(floor(value * 1000000) AS BIGINT))
                            AS BIGINT) AS micros
                FROM events GROUP BY 1
            )
            SELECT week, n_events, micros,
                   CAST(COALESCE(lag(micros) OVER (ORDER BY week), 0)
                        AS BIGINT) AS prev_micros,
                   CAST(micros - COALESCE(lag(micros) OVER (ORDER BY week),
                                          0) AS BIGINT) AS delta_micros
            FROM w ORDER BY week
        """,
        "dq_table_checksum": """
            -- pt-table-checksum shape: order-insensitive XOR fold of
            -- md5-lower-64 row hashes per source + exact counts —
            -- mirrors stats.table_checksum
            WITH h AS (
                SELECT source,
                       md5_number_lower(CAST(doc_id AS VARCHAR)
                                        || ':' || text) AS h
                FROM documents
            ), x AS (
                SELECT source, bit_xor(h) AS fp, count(*) AS n_rows
                FROM h GROUP BY source
            )
            SELECT source, CAST(n_rows AS BIGINT) AS n_rows,
                   CAST(CASE WHEN fp >= 9223372036854775808
                        THEN CAST(fp AS HUGEINT) - 18446744073709551616
                        ELSE CAST(fp AS HUGEINT) END AS BIGINT)
                       AS checksum
            FROM x ORDER BY source
        """,
        "dq_profile": """
            -- per-column profile of orders (count/nulls/min/max; money
            -- in exact cents, timestamps as 'Y-m-d H:M:S') — mirrors
            -- stats.dq_profile
            SELECT 'o_orderkey' AS col, COUNT(*) AS n,
                   COUNT(*) - COUNT(o_orderkey) AS nulls,
                   CAST(MIN(o_orderkey) AS VARCHAR) AS vmin,
                   CAST(MAX(o_orderkey) AS VARCHAR) AS vmax FROM orders
            UNION ALL
            SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
                   CAST(MIN(o_custkey) AS VARCHAR),
                   CAST(MAX(o_custkey) AS VARCHAR) FROM orders
            UNION ALL
            SELECT 'o_orderstatus', COUNT(*),
                   COUNT(*) - COUNT(o_orderstatus),
                   MIN(o_orderstatus), MAX(o_orderstatus) FROM orders
            UNION ALL
            SELECT 'o_totalprice', COUNT(*),
                   COUNT(*) - COUNT(o_totalprice),
                   CAST(CAST(ROUND(MIN(o_totalprice) * 100) AS BIGINT)
                        AS VARCHAR),
                   CAST(CAST(ROUND(MAX(o_totalprice) * 100) AS BIGINT)
                        AS VARCHAR) FROM orders
            UNION ALL
            SELECT 'o_orderdate', COUNT(*),
                   COUNT(*) - COUNT(o_orderdate),
                   CAST(MIN(o_orderdate) AS VARCHAR),
                   CAST(MAX(o_orderdate) AS VARCHAR) FROM orders
            UNION ALL
            SELECT 'o_orderpriority', COUNT(*),
                   COUNT(*) - COUNT(o_orderpriority),
                   MIN(o_orderpriority), MAX(o_orderpriority) FROM orders
            ORDER BY col
        """,
        "dq_checks": """
            -- Deequ-style audit: one row per check, violation counts
            SELECT 'event_id_null' AS check,
                   CAST(count(*) FILTER (WHERE event_id IS NULL) AS BIGINT)
                       AS violations FROM events
            UNION ALL
            SELECT 'value_null',
                   count(*) FILTER (WHERE value IS NULL) FROM events
            UNION ALL
            SELECT 'value_out_of_range',
                   count(*) FILTER (WHERE value < 0 OR value > 90)
            FROM events
            UNION ALL
            SELECT 'ts_out_of_range',
                   count(*) FILTER (WHERE ts < TIMESTAMP '2024-01-05')
            FROM events
            UNION ALL
            SELECT 'event_type_unknown',
                   count(*) FILTER (WHERE event_type NOT IN
                                    ('click', 'purchase', 'view'))
            FROM events
            UNION ALL
            SELECT 'user_fk_missing',
                   (SELECT count(*) FROM events e
                    WHERE NOT EXISTS (SELECT 1 FROM customer c
                                      WHERE c.c_custkey = e.user_id
                                        AND c.c_custkey % 2 = 0))
            ORDER BY 1
        """,
        "stat_group_quantiles": """
            -- per-group discrete quantiles, same integer-permille pick
            -- as stat_quantiles but per lang
            WITH c AS (
                SELECT lang, n_chars, CAST(count(*) AS BIGINT) AS cnt
                FROM documents GROUP BY lang, n_chars
            ), s AS (
                SELECT lang, n_chars,
                       CAST(sum(cnt) OVER (PARTITION BY lang
                                           ORDER BY n_chars) AS BIGINT)
                           AS cum,
                       CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT)
                           AS total
                FROM c
            ), q AS (
                SELECT CAST(unnest([500, 900]) AS BIGINT) AS q_permille
            )
            SELECT s.lang, q.q_permille,
                   CAST(min(s.n_chars) AS DOUBLE) AS value
            FROM s, q
            WHERE s.cum >= (q.q_permille * s.total + 999) // 1000
            GROUP BY s.lang, q.q_permille
            ORDER BY s.lang, q.q_permille
        """,
        "stat_quantiles": """
            -- discrete quantiles: smallest value whose cumulative count
            -- reaches ceil(q*n), thresholds in INTEGER permille
            -- arithmetic (no float boundary); matches quantile_disc
            WITH t AS (
                SELECT CAST(count(*) AS BIGINT) AS n FROM events
            ), c AS (
                SELECT value, CAST(count(*) AS BIGINT) AS cnt
                FROM events GROUP BY value
            ), s AS (
                SELECT value,
                       CAST(sum(cnt) OVER (ORDER BY value) AS BIGINT)
                           AS cum
                FROM c
            ), q AS (
                SELECT CAST(unnest([500, 900, 990]) AS BIGINT)
                           AS q_permille
            )
            SELECT q.q_permille, min(s.value) AS value
            FROM q CROSS JOIN t
            JOIN s ON s.cum >= (q.q_permille * t.n + 999) // 1000
            GROUP BY q.q_permille
            ORDER BY q.q_permille
        """,
        "decontaminate": """
            -- word-5-gram overlap vs the benchmark subset
            -- (doc_id % 97 = 0); grams are per-doc DISTINCT sets, so
            -- count(*) is the set size and count(b.g) the hit count
            WITH toks AS (
                SELECT doc_id, str_split_regex(trim(text), '\\s+') AS w
                FROM documents
            ), grams AS (
                SELECT DISTINCT doc_id,
                       unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                               || ' ' || w[i+3] || ' ' || w[i+4]
                               for i in range(1, len(w) - 3)]) AS g
                FROM toks WHERE len(w) >= 5
            ), bench AS (
                SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0
            )
            SELECT gr.doc_id, count(*) AS n_distinct,
                   count(b.g) AS n_hits,
                   count(b.g) > 0 AS contaminated
            FROM grams gr LEFT JOIN bench b ON b.g = gr.g
            GROUP BY gr.doc_id ORDER BY gr.doc_id
        """,
        "sample_per_source": """
            SELECT source,
                   CAST(row_number() OVER (PARTITION BY source
                                           ORDER BY doc_id) AS BIGINT)
                       AS src_rank,
                   doc_id, n_chars
            FROM documents
            QUALIFY src_rank <= 50
            ORDER BY source, src_rank
        """,
        "sample_mix": """
            -- domain-mix sampling: per-source keep rate (permille) is a
            -- pure function of the source suffix; salt 7919 decorrelates
            -- from the uniform-sampling and split hashes
            SELECT doc_id, source, lang, n_chars,
                   CAST(200 + 40 * (CAST(substr(source, 4) AS INT) % 10)
                        AS BIGINT) AS keep_permille
            FROM documents
            WHERE ((doc_id + 7919) * 2654435761) % 1000
                  < 200 + 40 * (CAST(substr(source, 4) AS INT) % 10)
            ORDER BY doc_id
        """,
        "sample_split": """
            SELECT doc_id, lang, n_chars,
                   CASE WHEN ((doc_id + 104729) * 2654435761) % 1000 < 100
                            THEN 'test'
                        WHEN ((doc_id + 104729) * 2654435761) % 1000 < 150
                            THEN 'val'
                        ELSE 'train' END AS split
            FROM documents ORDER BY doc_id
        """,
        "stat_corr": """
            -- Pearson r from single-pass moment sums; the sample/population
            -- normalization cancels, so DuckDB corr() is the exact oracle
            SELECT count(*) AS n,
                   round(corr(l_quantity, l_extendedprice), 6)
                       AS corr_qty_price,
                   round(corr(l_quantity, l_discount), 6) AS corr_qty_disc
            FROM lineitem
        """,
        "stat_group_zscore": """
            -- per-event_type z-score outliers; the threshold compares the
            -- ROUNDED z on both sides (no float-boundary hazard)
            WITH st AS (
                SELECT event_type, avg(value) AS m,
                       stddev_pop(value) AS sd
                FROM events GROUP BY event_type
            )
            SELECT e.event_id, e.event_type, round(e.value, 2) AS value,
                   round((e.value - st.m) / st.sd, 6) AS z
            FROM events e JOIN st USING (event_type)
            WHERE abs(round((e.value - st.m) / st.sd, 6)) > 1.5
            ORDER BY e.event_id
        """,
        "cdc_version_retention": """
            -- MVCC retention: newest 3 versions per key
            SELECT user_id,
                   CAST(rank AS BIGINT) AS version_rank,
                   event_id, event_type, round(value, 2) AS value
            FROM (
                SELECT user_id, event_id, event_type, value,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY event_id DESC) AS rank
                FROM events
            ) WHERE rank <= 3
            ORDER BY user_id, version_rank
        """,
        "text_pii_redact": r"""
            -- PII scrub with deterministic doc_id-derived PII seeding
            -- (the corpus has no natural PII; the augmentation is the
            -- same non-vacuous-oracle trick as emb_near_dup's seeded
            -- duplicates). Patterns are RE2 on both engines.
            WITH aug AS (
                SELECT doc_id,
                       text || ' contact user' || doc_id || '@example-'
                            || (doc_id % 10) || '.com or 10.'
                            || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
                            || '.42 tel 555-0' || (100 + doc_id % 900) AS t
                FROM documents
            )
            SELECT doc_id,
                   len(regexp_extract_all(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                       AS n_emails,
                   len(regexp_extract_all(t,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
                   len(regexp_extract_all(t, '\b\d{3}-\d{4}\b')) AS n_phones,
                   regexp_replace(regexp_replace(regexp_replace(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                       '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS redacted
            FROM aug ORDER BY doc_id
        """,
        "text_heavy_hitters": r"""
            -- exact heavy hitters: words with count*k > N (k=100); the
            -- Ray side reaches the same exact answer in two bounded
            -- passes (local-candidate superset + verification)
            WITH toks AS (
                SELECT unnest(str_split_regex(lower(trim(text)), '\s+'))
                           AS word
                FROM documents
            ), t AS (SELECT count(*) AS n FROM toks)
            SELECT word, count(*) AS n
            FROM toks, t GROUP BY word, t.n
            HAVING count(*) * 100 > t.n
            ORDER BY word
        """,
        "window_late_data": """
            -- arrival order = event_id; event time = ts minus an
            -- overflow-safe Knuth-hash delay; watermark = running max
            -- event time; late = event time > 30 min behind watermark
            WITH et AS (
                SELECT event_id, value,
                       ts - to_microseconds((((event_id % 3600) * 961)
                                             % 3600) * 1000000) AS etime
                FROM events
            ), wm AS (
                SELECT etime, value,
                       max(etime) OVER (ORDER BY event_id
                                        ROWS UNBOUNDED PRECEDING) AS rm
                FROM et
            ), flagged AS (
                SELECT date_trunc('hour', etime) AS window_start,
                       (etime < rm - INTERVAL '30 minutes') AS late, value
                FROM wm
            )
            SELECT window_start,
                   CAST(count(*) FILTER (WHERE NOT late) AS BIGINT)
                       AS n_ontime,
                   round(CAST(sum(CAST(CASE WHEN late THEN 0 ELSE value END
                              AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value,
                   CAST(sum(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_late
            FROM flagged GROUP BY 1 ORDER BY 1
        """,
        "window_tumbling": """
            SELECT date_trunc('hour', ts) AS window_start,
                   event_type,
                   count(*) AS n_events,
                   round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
                       AS sum_value,
                   round(max(value), 2) AS max_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "agg_rollup": """
            SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
                   COALESCE(o_orderstatus, 'ALL') AS status,
                   count(*) AS n_orders,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                              AS DOUBLE), 2) AS sum_total
            FROM orders
            GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
            ORDER BY 1, 2
        """,
        "set_intersect": """
            SELECT user_id FROM events WHERE event_type = 'purchase'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'error'
            ORDER BY user_id
        """,
        "set_except": """
            -- purchasers who never hit a HIGH-SEVERITY error (value >
            -- 200; plain purchase∖error is empty in the synth data —
            -- every user has every type) — mirrors analytics.users_except
            SELECT user_id FROM events WHERE event_type = 'purchase'
            EXCEPT
            SELECT user_id FROM events
            WHERE event_type = 'error' AND value > 200
            ORDER BY user_id
        """,
        "agg_cube": """
            SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
                   COALESCE(o_orderstatus, 'ALL') AS status,
                   count(*) AS n_orders,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                              AS DOUBLE), 2) AS sum_total
            FROM orders
            GROUP BY CUBE(o_orderpriority, o_orderstatus)
            ORDER BY 1, 2
        """,
        "window_moving_sum": """
            -- per-key ROWS window: moving sum of the last 3 event values
            -- in integer micros — mirrors windows.moving_user_sum
            SELECT event_id, user_id,
                   CAST(sum(CAST(floor(value * 1000000) AS BIGINT))
                            OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS moving_sum_micros,
                   CAST(count(*)
                            OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS win_n
            FROM events ORDER BY event_id
        """,
        "join_full_outer": """
            -- full outer: big-order aggregates vs even-custkey customers
            WITH big AS (
                SELECT o_custkey AS custkey,
                       count(*) AS n_big,
                       sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS cents
                FROM orders WHERE o_totalprice > 300000 GROUP BY 1
            ), cust AS (
                SELECT c_custkey AS custkey, c_mktsegment
                FROM customer WHERE c_custkey % 2 = 0
            )
            SELECT COALESCE(b.custkey, c.custkey) AS custkey,
                   COALESCE(b.n_big, 0) AS n_big,
                   round(COALESCE(b.cents, 0) / 100.0, 2) AS big_total,
                   COALESCE(c.c_mktsegment, 'NONE') AS c_mktsegment
            FROM big b FULL OUTER JOIN cust c ON b.custkey = c.custkey
            ORDER BY custkey
        """,
        "join_shipping_priority": """
            -- TPC-H Q3: revenue quantized to 1e-4 fixed point PER ROW
            -- before the sum (order-free integer addition), top-10 with
            -- l_orderkey tiebreak — mirrors analytics.shipping_priority
            WITH orders_f AS (
                SELECT o_orderkey, o_orderdate, o_orderpriority
                FROM orders JOIN customer ON o_custkey = c_custkey
                WHERE c_mktsegment = 'BUILDING'
                  AND o_orderdate < TIMESTAMP '1998-06-01'
            ), li AS (
                SELECT l_orderkey,
                       CAST(round(l_extendedprice * (1.0 - l_discount)
                                  * 10000.0) AS BIGINT) AS rev_e4
                FROM lineitem
                WHERE l_shipdate > TIMESTAMP '1998-06-01'
            ), agg AS (
                SELECT l_orderkey, sum(rev_e4) AS rev_e4,
                       o_orderdate, o_orderpriority
                FROM li JOIN orders_f ON l_orderkey = o_orderkey
                GROUP BY l_orderkey, o_orderdate, o_orderpriority
            )
            SELECT l_orderkey,
                   CAST(rev_e4 AS BIGINT) / 10000.0 AS revenue,
                   o_orderdate, o_orderpriority
            FROM agg
            ORDER BY rev_e4 DESC, l_orderkey
            LIMIT 10
        """,
        "join_local_supplier_volume": """
            -- TPC-H Q5: cross-side equality c_nationkey = s_nationkey is
            -- a post-join filter, revenue fixed-point 1e-4 per row before
            -- the sum — mirrors analytics.local_supplier_volume
            WITH nat AS (
                SELECT n_nationkey, n_name
                FROM nation JOIN region ON n_regionkey = r_regionkey
                WHERE r_name = 'ASIA'
            ), li AS (
                SELECT l_orderkey, l_suppkey,
                       CAST(round(l_extendedprice * (1.0 - l_discount)
                                  * 10000.0) AS BIGINT) AS rev_e4
                FROM lineitem
            ), agg AS (
                SELECT s_nationkey, sum(rev_e4) AS rev_e4
                FROM li
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN supplier ON l_suppkey = s_suppkey
                WHERE c_nationkey = s_nationkey
                  AND o_orderdate >= TIMESTAMP '1997-01-01'
                  AND o_orderdate < TIMESTAMP '1998-01-01'
                  AND s_nationkey IN (SELECT n_nationkey FROM nat)
                GROUP BY s_nationkey
            )
            SELECT n_name, CAST(rev_e4 AS BIGINT) / 10000.0 AS revenue
            FROM agg JOIN nat ON s_nationkey = n_nationkey
            ORDER BY rev_e4 DESC, n_name
        """,
        "join_large_orders": """
            -- TPC-H Q18: HAVING over a high-cardinality aggregate, then
            -- join back; quantities are exact ints so sums are int64 —
            -- mirrors analytics.large_order_quantities
            WITH q AS (
                SELECT l_orderkey,
                       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                           AS sum_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING sum(CAST(l_quantity AS BIGINT)) > 200
            )
            SELECT o_orderkey, c_name, o_orderdate, o_totalprice, sum_qty
            FROM q
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 100
        """,
        "join_small_quantity_revenue": """
            -- TPC-H Q17: correlated per-part average filter, computed
            -- exact-integer (qty < 0.2*avg(qty) <=> 5*qty*cnt < sum_qty;
            -- TPC-H quantities are integral) — mirrors
            -- analytics.small_quantity_revenue
            WITH sel AS (
                SELECT p_partkey FROM part
                WHERE p_brand = 'Brand#23' AND p_size <= 15
            ), li AS (
                SELECT l_partkey,
                       CAST(l_quantity AS BIGINT) AS qty,
                       CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
                FROM lineitem JOIN sel ON l_partkey = p_partkey
            ), st AS (
                SELECT l_partkey, SUM(qty) AS sum_q, COUNT(*) AS cnt
                FROM li GROUP BY l_partkey
            )
            SELECT ROUND(CAST(COALESCE(SUM(li.cents), 0) AS DOUBLE)
                         / 700.0, 2) AS avg_yearly
            FROM li JOIN st USING (l_partkey)
            WHERE 5 * li.qty * st.cnt < st.sum_q
        """,
        "join_min_cost_supplier": """
            -- TPC-H Q2-shaped argmin-per-group with attributes: the
            -- cheapest regional supplier per brand part (acctbal in
            -- exact cents, suppkey tiebreak), top-50 cheapest —
            -- mirrors analytics.min_cost_supplier
            WITH sel AS (
                SELECT p_partkey FROM part WHERE p_brand = 'Brand#14'
            ), cand AS (
                SELECT DISTINCT l_partkey, l_suppkey
                FROM lineitem JOIN sel ON l_partkey = p_partkey
            ), sc AS (
                SELECT l_partkey, l_suppkey,
                       CAST(ROUND(s_acctbal * 100) AS BIGINT) AS cents,
                       s_name
                FROM cand
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
                WHERE r_name = 'ASIA'
            ), w AS (
                SELECT l_partkey AS p_partkey, s_name, cents,
                       row_number() OVER (PARTITION BY l_partkey
                                          ORDER BY cents, l_suppkey)
                           AS rn
                FROM sc
            )
            SELECT p_partkey, s_name, cents / 100.0 AS s_acctbal
            FROM w WHERE rn = 1
            ORDER BY cents, p_partkey LIMIT 50
        """,
        "join_sole_supplier": """
            -- Q21-shaped EXISTS/NOT-EXISTS on one fact table: suppliers
            -- who were the sole supplier on a multi-line order, top-k
            -- by count (suppkey tiebreak) — mirrors
            -- analytics.sole_supplier_orders
            WITH per_order AS (
                SELECT l_orderkey, COUNT(*) AS nlines,
                       COUNT(DISTINCT l_suppkey) AS nsupp,
                       MIN(l_suppkey) AS the_supp
                FROM lineitem GROUP BY l_orderkey
            ), q AS (
                SELECT the_supp AS s_suppkey, COUNT(*) AS sole_orders
                FROM per_order WHERE nlines >= 2 AND nsupp = 1
                GROUP BY the_supp
            )
            SELECT s_suppkey, s_name, sole_orders
            FROM q JOIN supplier USING (s_suppkey)
            ORDER BY sole_orders DESC, s_suppkey LIMIT 10
        """,
        "join_discounted_revenue": """
            -- TPC-H Q19: OR of three brand/size/quantity conjunction
            -- groups spanning both join sides; exact-integer 1e-4
            -- revenue — mirrors analytics.discounted_revenue
            SELECT CAST(COALESCE(
                       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                           * (100 - CAST(ROUND(l_discount * 100)
                                         AS BIGINT))), 0) AS BIGINT)
                   / 10000.0 AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "join_market_share": """
            -- TPC-H Q8: one nation's share of a part type's revenue
            -- into one region per order year; numerator/denominator
            -- exact-integer, one float divide rounded 6dp — mirrors
            -- analytics.market_share
            WITH base AS (
                SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)
                           AS o_year,
                       CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(ROUND(l_discount * 100)
                                       AS BIGINT)) AS rev4,
                       CASE WHEN n2.n_name = 'NATION_3'
                            THEN 1 ELSE 0 END AS is_target
                FROM lineitem
                JOIN part ON l_partkey = p_partkey
                JOIN orders ON l_orderkey = o_orderkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON c_nationkey = n1.n_nationkey
                JOIN nation n2 ON s_nationkey = n2.n_nationkey
                JOIN region ON n1.n_regionkey = r_regionkey
                WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
                  AND o_orderdate >= TIMESTAMP '1996-01-01'
                  AND o_orderdate < TIMESTAMP '1998-01-01'
            )
            SELECT o_year,
                   ROUND(CAST(SUM(rev4 * is_target) AS DOUBLE)
                         / CAST(SUM(rev4) AS DOUBLE), 6) AS mkt_share
            FROM base GROUP BY o_year ORDER BY o_year
        """,
        "join_volume_shipping": """
            -- TPC-H Q7: revenue shipped between two nations per ship
            -- year, both directions; exact-integer 1e-4 revenue —
            -- mirrors analytics.volume_shipping
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(EXTRACT(year FROM l_shipdate) AS BIGINT)
                       AS l_year,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(ROUND(l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                       / 10000.0 AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
                OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1, 2, 3
            ORDER BY 1, 2, 3
        """,
        "join_top_supplier": """
            -- TPC-H Q15: max-revenue supplier(s) in one ship quarter,
            -- ties kept; revenue exact-integer 1e-4 — mirrors
            -- analytics.top_supplier
            WITH rev AS (
                SELECT l_suppkey AS s_suppkey,
                       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                           * (100 - CAST(ROUND(l_discount * 100)
                                         AS BIGINT))) AS rev4
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1997-07-01'
                  AND l_shipdate < TIMESTAMP '1997-10-01'
                GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name,
                   CAST(rev4 AS BIGINT) / 10000.0 AS total_revenue
            FROM rev JOIN supplier USING (s_suppkey)
            WHERE rev4 = (SELECT MAX(rev4) FROM rev)
            ORDER BY s_suppkey
        """,
        "join_returned_items": """
            -- TPC-H Q10: returned-lineitem revenue per customer over one
            -- quarter, top 20; ORDER/prune on the exact int rev4 before
            -- rounding — mirrors analytics.returned_item_report
            WITH r AS (
                SELECT o_custkey,
                       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                                * (100 - CAST(round(l_discount * 100)
                                              AS BIGINT))) AS BIGINT)
                           AS rev4
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE l_returnflag = 'R'
                  AND o_orderdate >= TIMESTAMP '1997-07-01'
                  AND o_orderdate < TIMESTAMP '1997-10-01'
                GROUP BY o_custkey
            )
            SELECT c_custkey, c_name, round(rev4 / 10000.0, 2) AS revenue,
                   c_acctbal, n_name
            FROM r JOIN customer ON o_custkey = c_custkey
                   JOIN nation ON c_nationkey = n_nationkey
            ORDER BY rev4 DESC, c_custkey LIMIT 20
        """,
        "join_customer_distribution": """
            -- TPC-H Q13: LEFT OUTER count + count distribution —
            -- mirrors analytics.customer_order_distribution
            WITH per_cust AS (
                SELECT c_custkey, count(o_custkey) AS c_count
                FROM customer LEFT OUTER JOIN orders
                  ON c_custkey = o_custkey AND o_orderstatus = 'O'
                GROUP BY c_custkey
            )
            SELECT c_count, count(*) AS custdist
            FROM per_cust GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "join_sales_opportunity": """
            -- TPC-H Q22: scalar subquery + NOT EXISTS anti join; the
            -- balance comparison runs in integer cents (cents*cnt >
            -- sum_cents) so no float threshold crosses engines —
            -- mirrors analytics.sales_opportunity
            WITH t AS (
                SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                            AS BIGINT) AS sum_cents,
                       count(*) AS cnt
                FROM customer
                WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0
            ), q AS (
                SELECT c_custkey, c_nationkey,
                       CAST(round(c_acctbal * 100) AS BIGINT) AS cents
                FROM customer, t
                WHERE CAST(round(c_acctbal * 100) AS BIGINT) * t.cnt
                          > t.sum_cents
                  AND NOT EXISTS (
                      SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01')
            )
            SELECT c_nationkey, count(*) AS numcust,
                   round(CAST(sum(cents) AS DOUBLE) / 100.0, 2)
                       AS totacctbal
            FROM q GROUP BY c_nationkey ORDER BY c_nationkey
        """,
        "join_promo_revenue": """
            -- TPC-H Q14: conditional aggregate over fact ⋈ dim; revenue
            -- accumulates as exact 1e-4-unit integers (cents ×
            -- discount-hundredths) — mirrors analytics.promo_revenue_share
            WITH x AS (
                SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))
                           AS rev4,
                       p_type
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE l_shipdate >= TIMESTAMP '1997-09-01'
                  AND l_shipdate < TIMESTAMP '1997-10-01'
            ), s AS (
                SELECT CAST(sum(CASE WHEN p_type = 'ECONOMY'
                                     THEN rev4 ELSE 0 END) AS BIGINT)
                           AS promo4,
                       CAST(sum(rev4) AS BIGINT) AS total4
                FROM x
            )
            SELECT round(promo4 / 10000.0, 2) AS promo_revenue,
                   round(total4 / 10000.0, 2) AS total_revenue,
                   round(100.0 * promo4 / total4, 6) AS promo_pct
            FROM s
        """,
        "agg_forecast_revenue": """
            -- TPC-H Q6: predicate-only global aggregate; revenue
            -- accumulates as exact 1e-4-unit integers (cents ×
            -- discount-hundredths) — mirrors analytics.forecast_revenue
            SELECT round(CAST(sum(
                       CAST(round(l_extendedprice * 100) AS BIGINT)
                       * CAST(round(l_discount * 100) AS BIGINT)
                   ) AS BIGINT) / 10000.0, 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1998-01-01'
              AND l_shipdate < TIMESTAMP '1999-01-01'
              AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
              AND l_quantity < 24
        """,
        "join_shipping_modes": """
            -- TPC-H Q12-shaped: conditional per-mode counts through the
            -- orderkey fact join (l_linestatus stands in for the absent
            -- l_shipmode) — mirrors analytics.shipping_modes
            SELECT l_linestatus,
                   CAST(sum(CASE WHEN o_orderpriority IN
                                      ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority IN
                                      ('1-URGENT', '2-HIGH')
                                 THEN 0 ELSE 1 END) AS BIGINT)
                       AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1998-01-01'
              AND l_shipdate < TIMESTAMP '1999-01-01'
            GROUP BY l_linestatus ORDER BY l_linestatus
        """,
        "join_late_orders": """
            -- TPC-H Q4 EXISTS shape: quarter's orders with ≥1 lineitem
            -- shipped >90 days after the order date, counted per
            -- priority — mirrors analytics.late_orders
            SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1997-04-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_shipdate > o_orderdate
                                             + INTERVAL 90 DAY)
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "join_product_profit": """
            -- TPC-H Q9-shaped: per (nation, order year) profit with a
            -- retailprice-fraction cost model (no partsupp in the test
            -- tables); exact 1e-4-unit integers end to end — mirrors
            -- analytics.product_profit
            WITH x AS (
                SELECT n_name AS nation,
                       CAST(year(o_orderdate) AS BIGINT) AS o_year,
                       CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))
                       - 60 * CAST(round(p_retailprice * 100) AS BIGINT)
                            * CAST(l_quantity AS BIGINT) AS amount4
                FROM lineitem
                JOIN part ON l_partkey = p_partkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                JOIN orders ON l_orderkey = o_orderkey
                WHERE p_name LIKE '%widget%'
            )
            SELECT nation, o_year,
                   CAST(sum(amount4) AS BIGINT) / 10000.0 AS profit
            FROM x GROUP BY nation, o_year
            ORDER BY nation, o_year DESC
        """,
        "join_dominant_suppliers": """
            -- TPC-H Q20-shaped: suppliers shipping >half a part's
            -- yearly quantity (name-prefix part filter); exact-integer
            -- half test — mirrors analytics.dominant_suppliers
            WITH q AS (
                SELECT l_partkey, l_suppkey,
                       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                           AS sq
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE p_name LIKE 'red %'
                  AND l_shipdate >= TIMESTAMP '1998-01-01'
                  AND l_shipdate < TIMESTAMP '1999-01-01'
                GROUP BY 1, 2
            ), t AS (
                SELECT l_partkey, CAST(sum(sq) AS BIGINT) AS tot
                FROM q GROUP BY 1
            )
            SELECT s_suppkey, s_name,
                   CAST(count(*) AS BIGINT) AS n_dominated
            FROM q JOIN t USING (l_partkey)
            JOIN supplier ON l_suppkey = s_suppkey
            WHERE 2 * sq > tot
            GROUP BY 1, 2 ORDER BY 1
        """,
        "agg_important_parts": """
            -- TPC-H Q11-shaped: parts above a ppm fraction of one
            -- nation's total shipped value; exact-integer ppm test —
            -- mirrors analytics.important_parts
            WITH v AS (
                SELECT l_partkey AS p_partkey,
                       CAST(sum(CAST(round(l_extendedprice * 100)
                                     AS BIGINT)) AS BIGINT) AS cents
                FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                WHERE s_nationkey = 3
                GROUP BY 1
            )
            SELECT p_partkey, round(cents / 100.0, 2) AS value
            FROM v
            WHERE 1000000 * cents > 1000 * (SELECT CAST(sum(cents)
                                                        AS BIGINT)
                                            FROM v)
            ORDER BY cents DESC, p_partkey
        """,
        "text_bpe_train": f"""
            -- iterative BPE re-derivation: the published merge table
            -- re-applies via a RECURSIVE CTE over the weighted word
            -- vocabulary (same marker-prefixed symbol strings, same
            -- left-to-right literal replace), final token counts
            -- re-derived — mirrors text.bpe_train
            WITH RECURSIVE words AS (
                SELECT word, CAST(count(*) AS BIGINT) AS n
                FROM (SELECT unnest(string_split(lower(text), ' '))
                          AS word FROM documents)
                GROUP BY 1
            ), m AS (
                SELECT * FROM
                read_parquet('{ORACLE_DIR}/bpe_merges.parquet')
            ), nm AS (SELECT CAST(count(*) AS BIGINT) AS n FROM m),
            init AS (
                SELECT word, n,
                       list_aggregate(list_transform(
                           string_split_regex(word, ''),
                           c -> chr(183) || c), 'string_agg', ' ') AS s
                FROM words
            ), applied AS (
                SELECT word, n, s, 0 AS i FROM init
                UNION ALL
                SELECT a.word, a.n, replace(a.s, m.pat, m.rep), a.i + 1
                FROM applied a JOIN m ON m.idx = a.i
            ), fin AS (
                SELECT n, unnest(string_split(s, ' ')) AS tok
                FROM applied WHERE i = (SELECT n FROM nm)
            )
            SELECT replace(tok, chr(183), '') AS token,
                   CAST(sum(n) AS BIGINT) AS cnt
            FROM fin GROUP BY 1
            ORDER BY cnt DESC, token LIMIT 30
        """,
        "window_funnel_latency": """
            -- funnel conversion latency: first qualifying event
            -- strictly after the previous stage's achieved time, exact
            -- integer microsecond deltas, house disc-quantile pick,
            -- one shared /1e6 — mirrors windows.funnel_latency
            WITH s0 AS (
                SELECT user_id, min(ts) AS t0 FROM events
                WHERE event_type = 'signup' GROUP BY 1
            ), s1 AS (
                SELECT e.user_id, min(e.ts) AS t1
                FROM events e JOIN s0 USING (user_id)
                WHERE e.event_type = 'view' AND e.ts > s0.t0
                GROUP BY 1
            ), s2 AS (
                SELECT e.user_id, min(e.ts) AS t2
                FROM events e JOIN s1 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts > s1.t1
                GROUP BY 1
            ), d AS (
                SELECT 1 AS stage,
                       CAST(epoch_us(t1) - epoch_us(t0) AS BIGINT)
                           AS delta_us
                FROM s1 JOIN s0 USING (user_id)
                UNION ALL
                SELECT 2, CAST(epoch_us(t2) - epoch_us(t1) AS BIGINT)
                FROM s2 JOIN s1 USING (user_id)
            ), h AS (
                SELECT stage, delta_us,
                       CAST(count(*) AS BIGINT) AS cnt
                FROM d GROUP BY 1, 2
            ), s AS (
                SELECT stage, delta_us,
                       CAST(sum(cnt) OVER (PARTITION BY stage
                                           ORDER BY delta_us)
                            AS BIGINT) AS cum,
                       CAST(sum(cnt) OVER (PARTITION BY stage)
                            AS BIGINT) AS total
                FROM h
            ), q AS (
                SELECT CAST(unnest([500, 900]) AS BIGINT) AS q_permille
            )
            SELECT s.stage, q.q_permille,
                   CAST(min(s.total) AS BIGINT) AS n_converted,
                   CAST(min(s.delta_us) AS DOUBLE) / 1e6 AS delta_sec
            FROM s, q
            WHERE s.cum >= (q.q_permille * s.total + 999) // 1000
            GROUP BY s.stage, q.q_permille
            ORDER BY s.stage, q.q_permille
        """,
        "stat_group_quantiles_cont": """
            -- interpolated (type-7) per-group quantiles, EXACT-INTEGER:
            -- rank position q·(n−1)/1000 is rational, value =
            -- v_lo·1000 + rem·(v_hi − v_lo) milli-cents, one shared
            -- /100000 — mirrors stats.group_quantiles_cont
            WITH v AS (
                SELECT event_type,
                       CAST(round(value * 100) AS BIGINT) AS c
                FROM events
            ), h AS (
                SELECT event_type, c, CAST(count(*) AS BIGINT) AS cnt
                FROM v GROUP BY 1, 2
            ), s AS (
                SELECT event_type, c,
                       CAST(sum(cnt) OVER (PARTITION BY event_type
                                           ORDER BY c) AS BIGINT) AS cum,
                       CAST(sum(cnt) OVER (PARTITION BY event_type)
                            AS BIGINT) AS n
                FROM h
            ), q AS (
                SELECT CAST(unnest([500, 900, 990]) AS BIGINT) AS q
            ), lo AS (
                SELECT s.event_type, q.q, CAST(min(s.c) AS BIGINT)
                           AS v_lo,
                       CAST(min(s.n) AS BIGINT) AS n
                FROM s, q
                WHERE s.cum >= (q.q * (s.n - 1)) // 1000 + 1
                GROUP BY 1, 2
            ), hi AS (
                SELECT s.event_type, q.q, CAST(min(s.c) AS BIGINT)
                           AS v_hi
                FROM s, q
                WHERE s.cum >= (q.q * (s.n - 1)) // 1000 + 2
                GROUP BY 1, 2
            )
            SELECT lo.event_type, lo.q AS q_permille,
                   (lo.v_lo * 1000
                    + ((lo.q * (lo.n - 1)) % 1000)
                      * (COALESCE(hi.v_hi, lo.v_lo) - lo.v_lo))
                   / 100000.0 AS value
            FROM lo LEFT JOIN hi ON hi.event_type = lo.event_type
                                AND hi.q = lo.q
            ORDER BY lo.event_type, lo.q
        """,
        "dq_mad_outliers": """
            -- robust median/MAD outlier audit in exact integer cents;
            -- disc-median = the house ceil(q·n/1000) cumulative pick,
            -- deviations regroup the SAME histogram — mirrors
            -- stats.mad_outliers
            WITH v AS (
                SELECT event_type,
                       CAST(round(value * 100) AS BIGINT) AS c
                FROM events
            ), h AS (
                SELECT event_type, c, CAST(count(*) AS BIGINT) AS cnt
                FROM v GROUP BY 1, 2
            ), s1 AS (
                SELECT event_type, c,
                       CAST(sum(cnt) OVER (PARTITION BY event_type
                                           ORDER BY c) AS BIGINT) AS cum,
                       CAST(sum(cnt) OVER (PARTITION BY event_type)
                            AS BIGINT) AS total
                FROM h
            ), med AS (
                SELECT event_type, CAST(min(c) AS BIGINT) AS med_c
                FROM s1 WHERE cum >= (500 * total + 999) // 1000
                GROUP BY event_type
            ), d AS (
                SELECT h.event_type, abs(h.c - med.med_c) AS dev,
                       h.cnt, h.c
                FROM h JOIN med USING (event_type)
            ), dh AS (
                SELECT event_type, dev,
                       CAST(sum(cnt) AS BIGINT) AS cnt
                FROM d GROUP BY 1, 2
            ), s2 AS (
                SELECT event_type, dev,
                       CAST(sum(cnt) OVER (PARTITION BY event_type
                                           ORDER BY dev) AS BIGINT)
                           AS cum,
                       CAST(sum(cnt) OVER (PARTITION BY event_type)
                            AS BIGINT) AS total
                FROM dh
            ), mad AS (
                SELECT event_type, CAST(min(dev) AS BIGINT) AS mad_c
                FROM s2 WHERE cum >= (500 * total + 999) // 1000
                GROUP BY event_type
            ), outs AS (
                SELECT d.event_type,
                       CAST(sum(CASE WHEN d.dev > 3 * mad.mad_c
                                     THEN d.cnt ELSE 0 END) AS BIGINT)
                           AS n_outliers
                FROM d JOIN mad USING (event_type)
                GROUP BY d.event_type
            )
            SELECT med.event_type, med.med_c / 100.0 AS median_value,
                   mad.mad_c / 100.0 AS mad_value, outs.n_outliers
            FROM med JOIN mad USING (event_type)
            JOIN outs USING (event_type)
            ORDER BY med.event_type
        """,
        "stat_approx_distinct_hll": """
            -- HyperLogLog m=64 re-derived relationally: md5-lower-64
            -- hash, bucket = low 6 bits, rho = leading-zero rank of
            -- the top 58; harmonic sum exact-integer (HUGEINT shifts)
            -- with ONE double rounding in the estimate — mirrors
            -- stats.approx_distinct_hll
            WITH h AS (
                SELECT DISTINCT md5_number_lower(
                           CAST(l_partkey AS VARCHAR)) AS h
                FROM lineitem
            ), r AS (
                SELECT CAST(h & 63 AS BIGINT) AS bucket,
                       CAST(CASE WHEN (h >> 6) = 0 THEN 59
                            ELSE 59 - length(bin(h >> 6)) END
                            AS BIGINT) AS rho
                FROM h
            ), regs AS (
                SELECT g.bucket,
                       CAST(COALESCE(max(r.rho), 0) AS BIGINT)
                           AS max_rho
                FROM (SELECT unnest(generate_series(0, 63)) AS bucket) g
                LEFT JOIN r USING (bucket)
                GROUP BY g.bucket
            ), s AS (
                SELECT sum(CAST(1 AS HUGEINT) << (59 - max_rho)) AS sv
                FROM regs
            )
            SELECT CAST(bucket AS BIGINT) AS bucket, max_rho,
                   0.709 * 64 * 64 * 576460752303423488.0
                   / CAST(sv AS DOUBLE) AS raw_estimate
            FROM regs, s ORDER BY bucket
        """,
        "stat_group_regression": """
            -- grouped OLS over integer moments: x = whole minutes
            -- since 2024-01-01 (positive → trunc == floor), y = exact
            -- cents; HUGEINT-exact sums, one double rounding per
            -- operand, one division — mirrors stats.group_regression
            WITH m AS (
                SELECT event_type,
                       CAST(count(*) AS BIGINT) AS n,
                       sum(x) AS sx, sum(y) AS sy,
                       sum(x * y) AS sxy, sum(x * x) AS sxx
                FROM (
                    SELECT event_type,
                           CAST(floor(date_diff('second',
                                TIMESTAMP '2024-01-01', ts) / 60.0)
                                AS HUGEINT) AS x,
                           CAST(round(value * 100) AS HUGEINT) AS y
                    FROM events)
                GROUP BY event_type
            )
            SELECT event_type, n AS n_events,
                   CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE)
                       AS slope_cents_per_min,
                   CAST(sy * sxx - sx * sxy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE)
                       AS intercept_cents
            FROM m ORDER BY event_type
        """,
        "join_reorder_gaps": """
            -- per-customer repurchase latency (LAG/self-gap) averaged
            -- per market segment; order dates are midnight so day
            -- gaps are exact integers — mirrors analytics.reorder_gaps
            WITH g AS (
                SELECT o_custkey,
                       date_diff('day',
                                 lag(o_orderdate) OVER (
                                     PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey),
                                 o_orderdate) AS gap
                FROM orders
            )
            SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_gaps,
                   CAST(CAST(sum(gap) AS BIGINT) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS avg_gap_days
            FROM g JOIN customer ON o_custkey = c_custkey
            WHERE gap IS NOT NULL
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "join_supplier_part_types": """
            -- TPC-H Q16-shaped: distinct suppliers per (brand, type,
            -- size) under negated predicates and a NOT-IN supplier
            -- blacklist (deficit suppliers ≙ Q16's complaints) —
            -- mirrors analytics.supplier_part_types
            SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
                   CAST(count(DISTINCT l_suppkey) AS BIGINT)
                       AS supplier_cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#14'
              AND p_type NOT LIKE 'PROMO%'
              AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
              AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                    WHERE s_acctbal < 0)
            GROUP BY p_brand, p_type, p_size
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        "emb_label_centroids": """
            -- vector-valued grouped aggregate: per-label centroid of
            -- the embedding column in long form; exact-integer
            -- micro-unit sums (floor, not round — half-even vs
            -- half-away) until one shared IEEE division — mirrors
            -- similarity.label_centroids
            WITH x AS (
                SELECT label, unnest(embedding) AS v,
                       generate_subscripts(embedding, 1) AS i
                FROM embeddings
            )
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(i - 1 AS BIGINT) AS dim,
                   CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000)
                                 AS BIGINT)) AS BIGINT)
                   / (CAST(count(*) AS BIGINT) * 1e6) AS centroid
            FROM x GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "events_json_extract": """
            -- semi-structured extraction: integer field k out of the
            -- JSON props payload, aggregated per event type — mirrors
            -- analytics.events_json_extract (the regex kernel and
            -- json_extract_string agree on the flat-integer grammar)
            WITH x AS (
                SELECT event_type,
                       CAST(json_extract_string(props, '$.k') AS BIGINT)
                           AS k
                FROM events
                WHERE json_extract_string(props, '$.k') IS NOT NULL
            )
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(k) AS BIGINT) AS sum_k,
                   CAST(max(k) AS BIGINT) AS max_k
            FROM x GROUP BY event_type ORDER BY event_type
        """,
        "text_inverted_index": """
            -- inverted-index head: top-k terms by document frequency
            -- with the first 20 doc ids of each posting list — mirrors
            -- text.inverted_index (single-space tokenizer, same as the
            -- ngram family)
            WITH toks AS (
                SELECT doc_id, string_split(lower(text), ' ') AS w
                FROM documents
            ), pairs AS (
                SELECT DISTINCT doc_id, unnest(w) AS word FROM toks
            ), ranked AS (
                SELECT word, doc_id,
                       row_number() OVER (PARTITION BY word
                                          ORDER BY doc_id) AS rn
                FROM pairs
            ), agg AS (
                SELECT word, CAST(count(*) AS BIGINT) AS df,
                       string_agg(CASE WHEN rn <= 20
                                       THEN CAST(doc_id AS VARCHAR)
                                       END, ',' ORDER BY doc_id)
                           AS postings
                FROM ranked GROUP BY word
            )
            SELECT word, df, postings FROM agg
            ORDER BY df DESC, word LIMIT 20
        """,
        "events_by_weekday": """
            SELECT CAST(isodow(ts) AS BIGINT) AS weekday, event_type,
                   count(*) AS n_events,
                   round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE),
                         2) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "text_normalize": """
            SELECT doc_id,
                   trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
                       AS norm_text,
                   CAST(length(trim(regexp_replace(lower(text),
                        '[^a-z0-9]+', ' ', 'g'))) AS BIGINT)
                       AS n_norm_chars
            FROM documents ORDER BY doc_id
        """,
        "sample_temperature": """
            -- α=0.5 temperature mixing: keep-rate ∝ count^(α-1), rarest
            -- lang keeps all; integer floor-div BEFORE the sqrt keeps
            -- the rate bit-identical across engines
            WITH c AS (
                SELECT lang, CAST(count(*) AS BIGINT) AS n
                FROM documents GROUP BY 1
            ), m AS (SELECT min(n) AS cmin FROM c),
            r AS (
                SELECT lang,
                       CAST(floor(sqrt((1000000 * m.cmin) // n)) AS BIGINT)
                           AS keep_permille
                FROM c, m
            )
            SELECT d.doc_id, d.lang, d.n_chars, r.keep_permille
            FROM documents d JOIN r USING (lang)
            WHERE (d.doc_id * 2654435761) % 1000 < r.keep_permille
            ORDER BY d.doc_id
        """,
        "text_quartiles": """
            -- value-threshold quartiles via the same integer-permille
            -- disc-quantile pick as stat_quantiles; ties stay low
            WITH c AS (
                SELECT n_chars, CAST(count(*) AS BIGINT) AS cnt
                FROM documents GROUP BY n_chars
            ), s AS (
                SELECT n_chars,
                       CAST(sum(cnt) OVER (ORDER BY n_chars) AS BIGINT)
                           AS cum,
                       (SELECT count(*) FROM documents) AS total
                FROM c
            ), cuts AS (
                SELECT q.p AS p,
                       min(s.n_chars) AS cut
                FROM s, (SELECT unnest([250, 500, 750]) AS p) q
                WHERE s.cum >= (q.p * s.total + 999) // 1000
                GROUP BY q.p
            )
            SELECT d.doc_id, d.n_chars,
                   CAST(1 + (SELECT count(*) FROM cuts
                             WHERE cuts.cut < d.n_chars) AS BIGINT)
                       AS quartile
            FROM documents d ORDER BY d.doc_id
        """,
        "emb_norms": """
            SELECT vec_id,
                   CAST(len(embedding) AS BIGINT) AS dim,
                   round(sqrt(list_sum(list_transform(embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6)
                       AS l2_norm,
                   round(list_max(list_transform(embedding,
                         x -> abs(CAST(x AS DOUBLE)))), 6) AS max_abs
            FROM embeddings ORDER BY vec_id
        """,
        "agg_pivot": """
            -- conditional-aggregate pivot: long event stream -> one wide
            -- row per user
            SELECT user_id,
                   count(*) FILTER (WHERE event_type = 'click')    AS n_click,
                   count(*) FILTER (WHERE event_type = 'error')    AS n_error,
                   count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
                   count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
                   count(*) FILTER (WHERE event_type = 'view')     AS n_view,
                   round(CAST(COALESCE(sum(CAST(value AS DECIMAL(18,2)))
                              FILTER (WHERE event_type = 'purchase'), 0)
                              AS DOUBLE), 2) AS purchase_value
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "text_chunks": """
            -- overlapping context-window chunks: 64 whitespace tokens
            -- every 48; chunk k emitted while k*48 < n_tokens
            WITH toks AS (
                SELECT doc_id,
                       str_split_regex(trim(text), '\\s+') AS t
                FROM documents
            ), k AS (
                SELECT doc_id, t,
                       unnest(range(0, CAST(ceil(len(t) / 48.0) AS BIGINT)))
                           AS chunk_id
                FROM toks
            )
            SELECT doc_id, chunk_id,
                   CAST(len(list_slice(t, chunk_id * 48 + 1,
                                       chunk_id * 48 + 64)) AS BIGINT)
                       AS n_tokens,
                   array_to_string(list_slice(t, chunk_id * 48 + 1,
                                              chunk_id * 48 + 64), ' ')
                       AS chunk_text
            FROM k ORDER BY doc_id, chunk_id
        """,
        "window_distinct_users": """
            -- unique users per hopping 60-min window (hop 15 min) —
            -- the non-decomposable sliding COUNT DISTINCT; mirrors
            -- windows.hopping_distinct_users
            WITH x AS (
                SELECT time_bucket(INTERVAL '15 minutes', ts)
                           - j * INTERVAL '15 minutes' AS window_start,
                       user_id
                FROM events, UNNEST([0, 1, 2, 3]) AS t(j)
            )
            SELECT window_start, COUNT(DISTINCT user_id) AS n_users
            FROM x GROUP BY 1 ORDER BY 1
        """,
        "window_paths": """
            -- top-k consecutive 3-event paths per user timeline
            -- (count desc, path asc tiebreak) — mirrors
            -- windows.event_path_topk
            WITH seq AS (
                SELECT event_type AS e1,
                       lead(event_type, 1) OVER w AS e2,
                       lead(event_type, 2) OVER w AS e3
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT e1, e2, e3, COUNT(*) AS n
            FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
            GROUP BY 1, 2, 3
            ORDER BY n DESC, e1, e2, e3 LIMIT 20
        """,
        "window_transitions": """
            -- per-user event-type transition counts; equal-ts order
            -- breaks by event_id — mirrors windows.event_transitions
            WITH s AS (
                SELECT event_type,
                       lag(event_type) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_event
                FROM events
            )
            SELECT prev_event, event_type AS next_event, count(*) AS n
            FROM s WHERE prev_event IS NOT NULL
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "window_join": """
            -- stream-stream windowed join: clicks in the hour before
            -- each purchase, same user, [ts - 60min, ts)
            SELECT p.event_id, p.user_id,
                   (SELECT count(*) FROM events c
                    WHERE c.user_id = p.user_id
                      AND c.event_type = 'click'
                      AND c.ts >= p.ts - INTERVAL '60 minutes'
                      AND c.ts < p.ts) AS n_clicks
            FROM events p WHERE p.event_type = 'purchase'
            ORDER BY p.event_id
        """,
        "cdc_snapshot_ingest": """
            -- snapshot-then-stream final state: snapshot rows keep op='r'
            -- and their snapshot LSN; streamed updates overwrite with 'u'
            WITH final AS (
                SELECT 'corpus/' || source AS repo,
                       'docs/d' || doc_id || '.txt' AS path,
                       CASE WHEN doc_id % 3 = 0 THEN md5(text || ' [v2]')
                            ELSE md5(text) END AS commit,
                       lang,
                       CASE WHEN doc_id % 3 = 0 THEN text || ' [v2]'
                            ELSE text END AS content,
                       CASE WHEN doc_id % 3 = 0 THEN 10000000 + doc_id + 1
                            ELSE doc_id + 1 END AS lsn,
                       CASE WHEN doc_id % 3 = 0 THEN 'u' ELSE 'r' END AS op
                FROM documents
                WHERE doc_id % 7 <> 0
            )
            SELECT * FROM final ORDER BY repo, path
        """,
        "cdc_tx_metadata": """
            -- per-transaction metadata over the documents-derived
            -- changelog (tx_id = lsn // 64; 3 rounds: insert all,
            -- update %3, delete %7)
            WITH ev AS (
                SELECT doc_id + 1 AS lsn, 'corpus/' || source AS repo
                FROM documents
                UNION ALL
                SELECT 10000000 + doc_id + 1, 'corpus/' || source
                FROM documents WHERE doc_id % 3 = 0
                UNION ALL
                SELECT 20000000 + doc_id + 1, 'corpus/' || source
                FROM documents WHERE doc_id % 7 = 0
            )
            SELECT lsn // 64 AS tx_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   min(lsn) AS min_lsn, max(lsn) AS max_lsn,
                   CAST(count(DISTINCT repo) AS BIGINT) AS n_repos
            FROM ev GROUP BY 1 ORDER BY 1
        """,
        "cdc_incremental_snapshot": """
            -- late-attached stream + chunked backfill (DBLog): streamed
            -- updates win LWW (op='u', round-1 lsn); never-streamed keys
            -- carry the snapshot read (op='r', lsn = doc_id, one below
            -- the skipped insert event); deletes removed the key
            WITH final AS (
                SELECT 'corpus/' || source AS repo,
                       'docs/d' || doc_id || '.txt' AS path,
                       CASE WHEN doc_id % 3 = 0 THEN md5(text || ' [v2]')
                            ELSE md5(text) END AS commit,
                       lang,
                       CASE WHEN doc_id % 3 = 0 THEN text || ' [v2]'
                            ELSE text END AS content,
                       CASE WHEN doc_id % 3 = 0 THEN 10000000 + doc_id + 1
                            ELSE doc_id END AS lsn,
                       CASE WHEN doc_id % 3 = 0 THEN 'u' ELSE 'r' END AS op
                FROM documents
                WHERE doc_id % 7 <> 0
            )
            SELECT * FROM final ORDER BY repo, path
        """,
        "cdc_user_changelog": """
            -- final LWW state of the user feed: delete %10 wins over
            -- update %4 wins over insert
            WITH final AS (
                SELECT 'user/' || source AS repo,
                       'u' || doc_id || '.txt' AS path,
                       CASE WHEN doc_id % 4 = 0 THEN 'v2-' || doc_id
                            ELSE 'v1-' || doc_id END AS commit,
                       lang,
                       CASE WHEN doc_id % 4 = 0 THEN text || ' !upd'
                            ELSE text END AS content,
                       CASE WHEN doc_id % 4 = 0 THEN 100000 + doc_id + 1
                            ELSE doc_id + 1 END AS lsn,
                       CASE WHEN doc_id % 4 = 0 THEN 'u' ELSE 'c' END AS op
                FROM documents
                WHERE doc_id % 10 <> 0
            )
            SELECT * FROM final ORDER BY repo, path
        """,
        "cdc_engine_view": """
            -- the engine-integrated incremental view must equal the
            -- pure-function expected final state aggregated per lang
            -- (sidecar published by the query; the engine maintained
            -- the view from per-window deltas through a crash/resume)
            SELECT lang, COUNT(*) AS n_rows,
                   CAST(SUM(length(content)) AS BIGINT) AS content_bytes
            FROM read_parquet('/tmp/cdcsdk_oracle/view_state_expected.parquet')
            GROUP BY lang ORDER BY lang
        """,
        "cdc_view_maintenance": """
            -- the materialized-view invariant: the incrementally
            -- maintained per-lang view (deltas f(after)-f(before) over
            -- the before-image changelog) must equal the aggregate
            -- recomputed over the FINAL table state — mirrors
            -- cdc_queries.view_maintenance (updates append ' [v2]',
            -- +5 bytes; doc_id % 7 = 0 rows are deleted)
            SELECT lang, COUNT(*) AS n_rows,
                   CAST(SUM(length(text) + CASE WHEN doc_id % 3 = 0
                                                THEN 5 ELSE 0 END)
                        AS BIGINT) AS content_bytes
            FROM documents WHERE doc_id % 7 <> 0
            GROUP BY lang ORDER BY lang
        """,
        "cdc_time_travel": """
            -- point-in-time (AS OF) live-row counts per lang at 8 probe
            -- LSNs over the deterministic 3-round changelog — the
            -- time-travel read mirrored by cdc_queries.time_travel_counts
            WITH ch AS (
                SELECT 'corpus/' || source AS repo,
                       'docs/d' || doc_id || '.txt' AS path,
                       lang, 'c' AS op, doc_id + 1 AS lsn
                FROM documents
                UNION ALL
                SELECT 'corpus/' || source, 'docs/d' || doc_id || '.txt',
                       lang, 'u', 10000000 + doc_id + 1
                FROM documents WHERE doc_id % 3 = 0
                UNION ALL
                SELECT 'corpus/' || source, 'docs/d' || doc_id || '.txt',
                       NULL, 'd', 20000000 + doc_id + 1
                FROM documents WHERE doc_id % 7 = 0
            ), v AS (
                SELECT lang, op, lsn AS vf,
                       COALESCE(lead(lsn) OVER (PARTITION BY repo, path
                                                ORDER BY lsn), -1) AS vt
                FROM ch
            ), probes(p) AS (VALUES (3750000), (7500000), (11250000), (15000000), (18750000), (22500000), (26250000), (30000001))
            SELECT CAST(p AS BIGINT) AS probe_lsn, lang, COUNT(*) AS n
            FROM v JOIN probes ON vf <= p AND (vt = -1 OR p < vt)
            WHERE op <> 'd'
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "cdc_scd2_history": """
            -- SCD type-2 over the deterministic 3-round changelog
            -- (insert all / update %3 / delete %7; sources/source_table.py):
            -- valid_to = lead(lsn) per key, deletes close but emit no row
            WITH ch AS (
                SELECT 'corpus/' || source AS repo,
                       'docs/d' || doc_id || '.txt' AS path,
                       text AS content, 'c' AS op,
                       doc_id + 1 AS lsn
                FROM documents
                UNION ALL
                SELECT 'corpus/' || source, 'docs/d' || doc_id || '.txt',
                       text || ' [v2]', 'u', 10000000 + doc_id + 1
                FROM documents WHERE doc_id % 3 = 0
                UNION ALL
                SELECT 'corpus/' || source, 'docs/d' || doc_id || '.txt',
                       NULL, 'd', 20000000 + doc_id + 1
                FROM documents WHERE doc_id % 7 = 0
            ), v AS (
                SELECT repo, path, content, op,
                       lsn AS valid_from_lsn,
                       COALESCE(lead(lsn) OVER (PARTITION BY repo, path
                                                ORDER BY lsn), -1)
                           AS valid_to_lsn
                FROM ch
            )
            SELECT repo, path, content, op, valid_from_lsn, valid_to_lsn,
                   CASE WHEN valid_to_lsn = -1 THEN 1 ELSE 0 END
                       AS is_current
            FROM v WHERE op <> 'd'
            ORDER BY repo, path, valid_from_lsn
        """,
        "dedup_incremental": """
            -- incoming docs admitted iff their exact text is NOT in the
            -- snapshot corpus (docs with doc_id % 5 = 0); the Ray side's
            -- bloom prune + exact verify must reduce to this anti-join
            SELECT doc_id, lang, source, n_chars
            FROM documents d
            WHERE NOT EXISTS (
                SELECT 1 FROM documents c
                WHERE c.doc_id % 5 = 0 AND c.text = d.text)
            ORDER BY doc_id
        """,
        "funnel_conversion": """
            -- ordered funnel signup -> view -> purchase (strictly-later ts
            -- at each stage), furthest stage per user
            WITH u  AS (SELECT DISTINCT user_id FROM events),
                 t1 AS (SELECT user_id, min(ts) AS ts1 FROM events
                        WHERE event_type = 'signup' GROUP BY 1),
                 t2 AS (SELECT e.user_id, min(e.ts) AS ts2 FROM events e
                        JOIN t1 ON e.user_id = t1.user_id
                        WHERE e.event_type = 'view' AND e.ts > t1.ts1
                        GROUP BY 1),
                 t3 AS (SELECT e.user_id, min(e.ts) AS ts3 FROM events e
                        JOIN t2 ON e.user_id = t2.user_id
                        WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
                        GROUP BY 1)
            SELECT u.user_id,
                   CASE WHEN t3.user_id IS NOT NULL THEN 3
                        WHEN t2.user_id IS NOT NULL THEN 2
                        WHEN t1.user_id IS NOT NULL THEN 1
                        ELSE 0 END AS stage_reached
            FROM u
            LEFT JOIN t1 ON u.user_id = t1.user_id
            LEFT JOIN t2 ON u.user_id = t2.user_id
            LEFT JOIN t3 ON u.user_id = t3.user_id
            ORDER BY u.user_id
        """,
        "cohort_retention": """
            -- weekly cohorts (Monday-start weeks) x distinct active users
            WITH fw AS (SELECT user_id, date_trunc('week', min(ts)) AS cw
                        FROM events GROUP BY 1),
                 act AS (SELECT DISTINCT e.user_id, fw.cw,
                                date_diff('day', fw.cw,
                                          date_trunc('week', e.ts)) // 7
                                    AS week_offset
                         FROM events e JOIN fw ON e.user_id = fw.user_id)
            SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
                   week_offset, count(*) AS n_users
            FROM act GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "running_user_value": """
            -- per-key running sum; fixed-point micros floored BEFORE the
            -- accumulation so association order can't change the result
            SELECT event_id, user_id,
                   CAST(sum(CAST(floor(value * 1000000) AS BIGINT))
                            OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)
                        AS BIGINT) AS running_value_micros
            FROM events ORDER BY event_id
        """,
        "text_quality_scores": """
            SELECT doc_id,
                   round(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0
                         / length(text), 6) AS punct_ratio,
                   round(length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
                         / length(text), 6) AS digit_ratio,
                   round(length(regexp_replace(text, '\\s', '', 'g')) * 1.0
                         / len(str_split_regex(trim(text), '\\s+')), 6) AS mean_token_len
            FROM documents ORDER BY doc_id
        """,
        "knn_bruteforce": """
            WITH q AS (SELECT vec_id AS qid, embedding AS e
                       FROM embeddings WHERE vec_id < 5)
            SELECT q.qid AS query_id, v.vec_id AS vec_id,
                   round(list_cosine_similarity(
                       list_transform(v.embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(q.e, x -> CAST(x AS DOUBLE))), 6) AS cos
            FROM q, embeddings v
            QUALIFY row_number() OVER (
                PARTITION BY q.qid
                ORDER BY list_cosine_similarity(
                    list_transform(v.embedding, x -> CAST(x AS DOUBLE)),
                    list_transform(q.e, x -> CAST(x AS DOUBLE))) DESC,
                    v.vec_id) <= 10
            ORDER BY query_id, cos DESC, vec_id
        """,
        "emb_near_dup": """
            WITH aug AS (
                SELECT vec_id, embedding FROM embeddings
                UNION ALL
                SELECT vec_id + 1000000 AS vec_id, embedding
                FROM embeddings WHERE vec_id < 50
            )
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_cosine_similarity(
                       list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos
            FROM aug a, aug b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(
                    list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                    list_transform(b.embedding, x -> CAST(x AS DOUBLE))) >= 0.95
            ORDER BY vec_a, vec_b
        """,
        "media_stats": """
            SELECT 'image/fake' AS media_type,
                   count(*) AS n_items,
                   CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
                   max(octet_length(encode(text))) AS max_bytes
            FROM documents
        """,
        "media_decode": """
            -- the decoder must recover the closed-form pixel pattern
            -- (v_i = (id*37 + i*101) % 256 over w*h*3 flat RGB indices,
            -- w = 8 + id%25, h = 8 + (id*7)%17) from genuine PNG bytes:
            -- any parsing/inflate/unfilter defect breaks px_sum/hist
            WITH geo AS (
                SELECT doc_id AS media_id,
                       8 + doc_id % 25 AS width,
                       8 + (doc_id * 7) % 17 AS height
                FROM documents),
            px AS (
                SELECT media_id, width, height,
                       (media_id * 37 + i * 101) % 256 AS v
                FROM geo,
                     UNNEST(generate_series(0, width * height * 3 - 1))
                         AS t(i))
            SELECT media_id, width, height,
                   CAST(3 AS BIGINT) AS n_channels,
                   CAST(sum(v) AS BIGINT) AS px_sum,
                   CAST(count(*) FILTER (WHERE v // 32 = 0) AS BIGINT) AS h0,
                   CAST(count(*) FILTER (WHERE v // 32 = 1) AS BIGINT) AS h1,
                   CAST(count(*) FILTER (WHERE v // 32 = 2) AS BIGINT) AS h2,
                   CAST(count(*) FILTER (WHERE v // 32 = 3) AS BIGINT) AS h3,
                   CAST(count(*) FILTER (WHERE v // 32 = 4) AS BIGINT) AS h4,
                   CAST(count(*) FILTER (WHERE v // 32 = 5) AS BIGINT) AS h5,
                   CAST(count(*) FILTER (WHERE v // 32 = 6) AS BIGINT) AS h6,
                   CAST(count(*) FILTER (WHERE v // 32 = 7) AS BIGINT) AS h7
            FROM px GROUP BY 1, 2, 3 ORDER BY media_id
        """,
        "media_resize": """
            -- aspect-preserving fit of the REAL decoded dims into
            -- 256x256 (same IEEE double expression tree as the planner)
            WITH geo AS (
                SELECT doc_id AS media_id,
                       8 + doc_id % 25 AS w,
                       8 + (doc_id * 7) % 17 AS h
                FROM documents),
            s AS (
                SELECT media_id, w, h,
                       least(256.0 / w, 256.0 / h) AS scale
                FROM geo)
            SELECT media_id,
                   CAST(greatest(1, floor(w * scale)) AS BIGINT) AS width,
                   CAST(greatest(1, floor(h * scale)) AS BIGINT) AS height,
                   CAST(greatest(1, floor(w * scale))
                        * greatest(1, floor(h * scale)) * 3 AS BIGINT)
                       AS est_bytes
            FROM s ORDER BY media_id
        """,
        "media_frames": """
            -- re-derives the WHOLE APNG parse from the synthesis closed
            -- forms: geometry w=8+id%25, h=8+(id*7)%17; n_frames=1+id%6;
            -- delay_num(k)=2+(id*3+k*5)%7 over den 50 (so duration_ms =
            -- 20*delay_num exactly); pixel v_i=(id*37+k*11+i*101)%256 —
            -- gcd(101,256)=1 makes each 256-run of i a permutation of
            -- 0..255 (sum 32640), so pixel_sum needs only the n%256
            -- partial terms. ts_ms = exclusive running sum of durations.
            WITH geom AS (
                SELECT doc_id AS media_id,
                       8 + doc_id % 25 AS w,
                       8 + (doc_id * 7) % 17 AS h,
                       1 + doc_id % 6 AS nf
                FROM documents),
            fr AS (
                SELECT media_id, w, h, nf,
                       CAST(f AS BIGINT) AS frame_idx,
                       2 + (media_id * 3 + f * 5) % 7 AS delay_num,
                       (media_id * 37 + f * 11) % 256 AS a,
                       w * h * 3 AS npx
                FROM geom, UNNEST(range(nf)) AS t(f)),
            ps AS (
                SELECT media_id, frame_idx,
                       (npx // 256) * 32640
                       + COALESCE(SUM(CASE WHEN i < npx % 256
                                      THEN (a + i * 101) % 256 END), 0)
                           AS pixel_sum
                FROM fr, UNNEST(range(256)) AS s(i)
                GROUP BY media_id, frame_idx, npx, a)
            SELECT fr.media_id,
                   fr.frame_idx,
                   CAST(fr.nf AS BIGINT) AS n_frames,
                   CAST(fr.w AS BIGINT) AS width,
                   CAST(fr.h AS BIGINT) AS height,
                   CAST(fr.delay_num AS BIGINT) AS delay_num,
                   CAST(50 AS BIGINT) AS delay_den,
                   CAST(fr.delay_num * 20 AS BIGINT) AS duration_ms,
                   CAST(COALESCE(SUM(fr.delay_num * 20) OVER (
                        PARTITION BY fr.media_id ORDER BY fr.frame_idx
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS BIGINT) AS ts_ms,
                   CAST(ps.pixel_sum AS BIGINT) AS pixel_sum
            FROM fr JOIN ps USING (media_id, frame_idx)
            ORDER BY media_id, frame_idx
        """,
        "media_resize_pixels": """
            -- re-derives the WHOLE decode+resample: source pattern
            -- v_i = (id*37 + i*101) % 256 over flat RGB index
            -- i = (sy*w + sx)*3 + c, sampled at the nearest-neighbor
            -- grid sy = yo*h//oh, sx = xo*w//ow of the 64x64
            -- aspect-fit (same IEEE double expression tree as numpy)
            WITH geo AS (
                SELECT doc_id AS media_id,
                       8 + doc_id % 25 AS w,
                       8 + (doc_id * 7) % 17 AS h
                FROM documents),
            fit AS (
                SELECT media_id, w, h,
                       CAST(greatest(1, floor(w * least(64.0 / w,
                            64.0 / h))) AS BIGINT) AS ow,
                       CAST(greatest(1, floor(h * least(64.0 / w,
                            64.0 / h))) AS BIGINT) AS oh
                FROM geo),
            px AS (
                SELECT media_id, ow, oh,
                       (media_id * 37
                        + (((yo * h // oh) * w + (xo * w // ow)) * 3
                           + c) * 101) % 256 AS v
                FROM fit,
                     UNNEST(range(oh)) AS a(yo),
                     UNNEST(range(ow)) AS b(xo),
                     UNNEST(range(3)) AS d(c))
            SELECT media_id,
                   CAST(any_value(ow) AS BIGINT) AS width,
                   CAST(any_value(oh) AS BIGINT) AS height,
                   CAST(sum(v) AS BIGINT) AS px_sum
            FROM px GROUP BY media_id ORDER BY media_id
        """,
        "media_audio": """
            -- the decoder must recover the closed-form PCM pattern
            -- (s_i = (id*73 + i*157) % 4001 - 2000, n = 800 + (id*31)
            -- % 1600, sr = 8000*(1 + id%3)) from genuine RIFF/WAVE
            -- bytes: any chunk-walk/fmt/endianness defect breaks
            -- sum_sq/peak/zero_crossings
            WITH geo AS (
                SELECT doc_id AS media_id,
                       8000 * (1 + doc_id % 3) AS sample_rate,
                       800 + (doc_id * 31) % 1600 AS n_samples
                FROM documents),
            s AS (
                SELECT media_id, sample_rate, n_samples, i,
                       (media_id * 73 + i * 157) % 4001 - 2000 AS v,
                       (media_id * 73 + (i + 1) * 157) % 4001 - 2000
                           AS v_next
                FROM geo, UNNEST(range(n_samples)) AS t(i))
            SELECT media_id,
                   CAST(any_value(sample_rate) AS BIGINT) AS sample_rate,
                   CAST(any_value(n_samples) AS BIGINT) AS n_samples,
                   CAST(any_value(n_samples) * 1000
                        // any_value(sample_rate) AS BIGINT)
                       AS duration_ms,
                   CAST(sum(v * v) AS BIGINT) AS sum_sq,
                   CAST(max(abs(v)) AS BIGINT) AS peak,
                   CAST(count(*) FILTER (WHERE i < n_samples - 1
                        AND (v >= 0) != (v_next >= 0)) AS BIGINT)
                       AS zero_crossings
            FROM s GROUP BY media_id ORDER BY media_id
        """,
        "media_audio_frames": """
            -- per-frame (400-sample) exact energy over the same
            -- closed-form PCM pattern
            WITH geo AS (
                SELECT doc_id AS media_id,
                       800 + (doc_id * 31) % 1600 AS n_samples
                FROM documents),
            s AS (
                SELECT media_id, i // 400 AS frame_idx,
                       (media_id * 73 + i * 157) % 4001 - 2000 AS v
                FROM geo, UNNEST(range(n_samples)) AS t(i))
            SELECT media_id,
                   frame_idx,
                   CAST(count(*) AS BIGINT) AS frame_samples,
                   CAST(sum(v * v) AS BIGINT) AS energy
            FROM s GROUP BY media_id, frame_idx
            ORDER BY media_id, frame_idx
        """,
    }
