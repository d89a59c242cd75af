"""Distributed dedup/similarity pipelines: connected components across
blocks, bucket-join dtype stability under chaining, seeded embedding
near-dups, and the no-driver-materialization contracts from VERDICT r01.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF01_DIR, SF_DIR


def test_connected_components_cluster_larger_than_one_batch(ray_session):
    """A dense duplicate cluster whose edge rows span MANY blocks must
    still collapse to one label (driver union-find is gone; hash-to-min
    propagates via groupby rounds)."""
    import ray.data

    from cdcsdk_server_ray.pipelines.dedup import connected_components

    # star cluster: 0-1..0-600, plus a disjoint chain 1000..1012, plus an
    # isolated pair — spread over 20 blocks so no single batch sees a
    # whole component
    star = pd.DataFrame({"doc_a": np.zeros(600, dtype=np.int64),
                         "doc_b": np.arange(1, 601, dtype=np.int64)})
    chain = pd.DataFrame({"doc_a": np.arange(1000, 1012, dtype=np.int64),
                          "doc_b": np.arange(1001, 1013, dtype=np.int64)})
    pair = pd.DataFrame({"doc_a": [5000], "doc_b": [5001]})
    edges = pd.concat([star, chain, pair], ignore_index=True).sample(
        frac=1.0, random_state=7)  # shuffle so components interleave
    ds = ray.data.from_pandas(edges).repartition(20)
    # force the DISTRIBUTED rounds (the small graph would otherwise take
    # the single-task fast path), then check the fast path agrees exactly
    out = connected_components(ds, single_task_edges=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    labels = dict(zip(out["doc_id"], out["cluster_id"]))
    assert all(labels[i] == 0 for i in range(601))
    assert all(labels[i] == 1000 for i in range(1000, 1013))
    assert labels[5000] == labels[5001] == 5000
    assert len(out) == 601 + 13 + 2
    local = connected_components(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(local, out)


def test_connected_components_100k_nodes_in_seconds(ray_session):
    """Scale shape from VERDICT r02 #1: 100k+ nodes must cluster in
    seconds. The bucketed plan runs ONE vectorized kernel per hash
    bucket per round; the per-node groupby it replaced would pay 100k
    Python group calls × rounds (minutes) on this same input."""
    import time

    import ray.data

    from cdcsdk_server_ray.pipelines.dedup import connected_components

    # 2,000 stars × 50 nodes (bulk) + 100 chains × 64 nodes (propagation
    # depth: hash-to-min needs ~log2(64) rounds to collapse a chain)
    base = np.arange(2000, dtype=np.int64) * 1000
    star_a = np.repeat(base, 49)
    star_b = star_a + np.tile(np.arange(1, 50, dtype=np.int64), 2000)
    cbase = 10_000_000 + np.arange(100, dtype=np.int64) * 1000
    chain_a = (cbase[:, None] + np.arange(63, dtype=np.int64)).ravel()
    chain_b = chain_a + 1
    edges = pd.DataFrame({"doc_a": np.concatenate([star_a, chain_a]),
                          "doc_b": np.concatenate([star_b, chain_b])})
    ds = ray.data.from_pandas(edges).repartition(32)
    t0 = time.time()
    # single_task_edges=0 pins the DISTRIBUTED rounds — this test exists
    # to prove the bucketed plan's throughput, not the fast path's
    out = connected_components(ds, single_task_edges=0).to_pandas()
    dt = time.time() - t0
    assert len(out) == 2000 * 50 + 100 * 64
    ids = out["doc_id"].to_numpy(np.int64)
    np.testing.assert_array_equal(out["cluster_id"].to_numpy(np.int64),
                                  ids // 1000 * 1000)
    # measured ~30s at 4 CPUs; the bound only needs to reject the old
    # per-node-Python-group design (many minutes) and survive VM noise
    assert dt < 240, f"100k-node clustering took {dt:.1f}s"


def test_bucket_join_preserves_int_keys_when_chained(ray_session):
    """Regression: the union's NaN reindex upcast int64 keys to float64,
    so a SECOND bucket_join hashed '42.0' vs '42' and silently dropped
    rows. Chained joins must keep every match."""
    import ray.data

    from cdcsdk_server_ray.stages.join import bucket_join

    n = 500
    pairs = pd.DataFrame({"a": np.arange(n, dtype=np.int64),
                          "b": np.arange(n, dtype=np.int64)[::-1]})
    attr = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "val": np.arange(n, dtype=np.int64) * 10})
    left = ray.data.from_pandas(
        pairs.rename(columns={"a": "doc_id"})).repartition(8)
    attrs = ray.data.from_pandas(attr).repartition(8)
    j1 = bucket_join(left, attrs, on="doc_id", num_buckets=8)
    j1 = j1.map_batches(
        lambda df: df.rename(columns={"doc_id": "a", "val": "val_a",
                                      "b": "doc_id"}),
        batch_format="pandas")
    j2 = bucket_join(j1, attrs, on="doc_id", num_buckets=8).to_pandas()
    assert len(j2) == n                      # no silent row loss
    assert (j2["val_a"] == j2["a"] * 10).all()
    assert (j2["val"] == j2["doc_id"] * 10).all()


def test_minhash_pairs_no_driver_corpus_read(ray_session):
    """The verify step must not materialize the corpus on the driver —
    grep-level contract from VERDICT r01 (#2)."""
    import inspect

    from cdcsdk_server_ray.pipelines import dedup
    src = inspect.getsource(dedup)
    assert "docs.to_pandas()" not in src
    assert "texts = docs" not in src


def test_minhash_pairs_match_known_duplicates(ray_session):
    """sf0.001 documents contain seeded near-dups; the distributed verify
    must find the same pairs as a single-process reference computation."""
    from cdcsdk_server_ray.pipelines.dedup import (_char_shingles,
                                                   minhash_lsh_pairs)

    got = minhash_lsh_pairs(SF_DIR).to_pandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])
    sh = {r.doc_id: _char_shingles(r.text) for r in docs.itertuples()}
    for row in got.itertuples():           # every reported pair is real
        sa, sb = sh[row.doc_a], sh[row.doc_b]
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        jac = inter / (sa.size + sb.size - inter)
        assert jac >= 0.5
        assert jac == pytest.approx(row.jaccard, abs=1e-9)
    assert len(got) > 0                    # the green is not vacuous


def test_near_dup_embeddings_finds_seeded_duplicates(ray_session):
    """Seeded exact duplicates (vec_id + 1e6) must all surface with
    cos = 1.0; the banded LSH may not miss identical vectors."""
    from cdcsdk_server_ray.pipelines.similarity import (SEED_DUP_COUNT,
                                                        SEED_DUP_OFFSET,
                                                        near_dup_embeddings)

    out = near_dup_embeddings(SF_DIR).to_pandas()
    assert len(out) == SEED_DUP_COUNT
    assert (out["vec_b"] - out["vec_a"] == SEED_DUP_OFFSET).all()
    assert (out["cos"] == 1.0).all()


def test_knn_ivf_trains_on_bounded_sample(ray_session):
    """IVF centroid training must read a bounded sample, not the table."""
    import inspect

    from cdcsdk_server_ray.pipelines import similarity
    src = inspect.getsource(similarity.knn_ivf)
    assert "_train_sample(ds, train_sample)" in src
    assert "ds.to_pandas()" not in src
    out = similarity.knn_ivf(SF_DIR).to_pandas()
    assert len(out) > 0
    assert set(out.columns) == {"query_id", "vec_id", "cos"}


def test_simhash_pairs_match_bruteforce(ray_session):
    """Banded SimHash candidate generation + Hamming verify must find
    EXACTLY the pairs a brute-force all-pairs popcount finds (banding is
    lossless for Hamming <= 3 by pigeonhole over 4 bands)."""
    from cdcsdk_server_ray.pipelines.dedup import (simhash_pairs,
                                                   simhash_signatures)

    got = simhash_pairs(SF_DIR, max_hamming=3).to_pandas()
    sigs = simhash_signatures(SF_DIR).to_pandas()
    s = sigs["simhash"].to_numpy(np.uint64)
    ids = sigs["doc_id"].to_numpy()
    x = s[:, None] ^ s[None, :]
    ham = np.unpackbits(
        x.view(np.uint8).reshape(len(s), len(s), 8), axis=2).sum(axis=2)
    a, b = np.nonzero(np.triu(ham <= 3, k=1))
    exp = sorted(zip(ids[a], ids[b]))
    assert sorted(zip(got["doc_a"], got["doc_b"])) == exp
    assert len(exp) > 0


def test_multimodal_resize_and_frames(ray_session):
    """Chained actor-pool media stages: decode → resize keeps aspect and
    bounds dims; frame sampling expands 1→N with per-media frame counts
    derived from payload size."""
    from cdcsdk_server_ray.pipelines.multimodal import (resize_media,
                                                        sample_frames,
                                                        synth_media_table)

    rs = resize_media(SF_DIR, target_w=128, target_h=64).to_pandas()
    assert (rs["width"] <= 128).all() and (rs["height"] <= 64).all()
    assert (rs["width"] >= 1).all() and (rs["height"] >= 1).all()
    assert (rs["est_bytes"] == rs["width"].astype("int64")
            * rs["height"].astype("int64") * 3).all()

    fr = sample_frames(SF_DIR, max_frames=3).to_pandas()
    # real APNG parse: counts come from acTL (capped by max_frames),
    # timestamps are the exclusive running sum of fcTL delay fractions
    got_counts = fr.groupby("media_id").size()
    exp_counts = (1 + got_counts.index.to_series() % 6).clip(upper=3)
    assert got_counts.sort_index().equals(
        exp_counts.sort_index().astype("int64"))
    assert (fr["duration_ms"] == fr["delay_num"] * 1000
            // fr["delay_den"]).all()
    first = fr[fr["frame_idx"] == 0]
    assert (first["ts_ms"] == 0).all()


def test_apng_roundtrip_and_corruption(ray_session):
    """apng_encode → apng_parse recovers frame count, per-frame dims,
    delays, cumulative timestamps and exact pixel sums; a flipped byte
    in a frame chunk fails CRC; a truncated acTL count is rejected."""
    import struct as _struct

    from cdcsdk_server_ray.pipelines.multimodal import (apng_encode,
                                                        apng_parse)

    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
              for _ in range(4)]
    delays = [(2, 50), (3, 50), (5, 100), (1, 25)]
    data = apng_encode(frames, delays)
    recs = apng_parse(data)
    assert [r["n_frames"] for r in recs] == [4] * 4
    assert [(r["width"], r["height"]) for r in recs] == [(13, 9)] * 4
    assert [(r["delay_num"], r["delay_den"]) for r in recs] == delays
    exp_durs = [n * 1000 // d for n, d in delays]
    assert [r["duration_ms"] for r in recs] == exp_durs
    assert [r["ts_ms"] for r in recs] == [0, exp_durs[0],
                                          sum(exp_durs[:2]),
                                          sum(exp_durs[:3])]
    assert [r["pixel_sum"] for r in recs] == \
        [int(f.astype(np.int64).sum()) for f in frames]

    bad = bytearray(data)
    idx = data.index(b"fdAT") + 10          # inside a frame-data chunk
    bad[idx] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        apng_parse(bytes(bad))

    # declared frame count must match the fcTL chain
    pos = data.index(b"acTL") - 4
    (ln,) = _struct.unpack(">I", data[pos:pos + 4])
    wrong = _struct.pack(">II", 9, 0)
    import zlib as _zlib
    patched = (data[:pos] + _struct.pack(">I", ln) + b"acTL" + wrong
               + _struct.pack(">I", _zlib.crc32(b"acTL" + wrong))
               + data[pos + 12 + ln:])
    with pytest.raises(ValueError, match="declares"):
        apng_parse(patched)


def test_train_sample_unbiased_on_sorted_corpus(ray_session, tmp_path):
    """VERDICT r03 item 6: centroid training on ``ds.limit(n)`` reads
    only the FIRST blocks — on a corpus sorted by cluster it never sees
    the tail clusters. The hash-sample must cover the whole id range
    with the same bounded size."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from cdcsdk_server_ray.pipelines.similarity import _train_sample

    rng = np.random.default_rng(3)
    n, d = 4000, 8
    # sorted-by-cluster layout: first half blob A, second half blob B
    a = rng.normal(0, 0.1, (n // 2, d)) + 10.0
    b = rng.normal(0, 0.1, (n // 2, d)) - 10.0
    emb = np.vstack([a, b]).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                  "embedding": pa.array(list(emb),
                                        pa.list_(pa.float32()))})
    path = str(tmp_path / "embeddings.parquet")
    pq.write_table(t, path, row_group_size=250)

    ds = ray.data.read_parquet(path)
    biased = ds.limit(500).to_pandas()
    assert (biased["vec_id"] < n // 2).all()       # the failure mode
    sample = _train_sample(ray.data.read_parquet(path), 500)
    first = (sample["vec_id"] < n // 2).sum()
    second = (sample["vec_id"] >= n // 2).sum()
    assert first > 0 and second > 0                # both blobs covered
    assert 0.3 <= first / max(1, len(sample)) <= 0.7
    assert len(sample) <= 2 * 500                  # still bounded


def test_png_codec_roundtrip_and_filters():
    """The stdlib PNG codec is REAL: byte-exact roundtrip through
    encode→decode (None/Sub/Up filters on the encode side), correct
    unfiltering of Average and Paeth scanlines from a hand-built file,
    and hard failure on a corrupted chunk CRC."""
    import struct
    import zlib

    import pytest

    from cdcsdk_server_ray.pipelines.multimodal import (_png_chunk,
                                                        png_decode,
                                                        png_encode)

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    w, h, c, out = png_decode(png_encode(arr))
    assert (w, h, c) == (23, 17, 3)
    assert np.array_equal(out, arr)

    # Average(3) + Paeth(4) scanlines, filtered by hand
    px = rng.integers(0, 256, (2, 4, 3), dtype=np.uint8)
    rows = []
    prev = np.zeros(12, np.uint8)
    for y, ft in enumerate([3, 4]):
        row = px[y].reshape(-1)
        enc = np.empty(12, np.uint8)
        for x in range(12):
            a = int(row[x - 3]) if x >= 3 else 0
            b = int(prev[x])
            cc = int(prev[x - 3]) if x >= 3 else 0
            if ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc_) else \
                    (b if pb <= pc_ else cc)
            enc[x] = (int(row[x]) - pred) & 0xFF
        rows.append(bytes([ft]) + enc.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", 4, 2, 8, 2, 0, 0, 0)
    data = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + _png_chunk(b"IEND", b""))
    w, h, c, out = png_decode(data)
    assert np.array_equal(out, px)

    # corrupted CRC must refuse, not return garbage
    good = png_encode(arr)
    bad = bytearray(good)
    bad[-5] ^= 0xFF                       # inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(bad))


def test_png_decode_pipeline_recovers_pattern(ray_session):
    """End-to-end: synth PNG table → actor-pool decode; dims and pixel
    sums must equal the closed-form pattern (the SQL oracle's formula)."""
    from cdcsdk_server_ray.pipelines.multimodal import decode_media

    got = decode_media(SF_DIR).to_pandas()
    ids = got["media_id"].to_numpy()
    assert (got["width"].to_numpy() == 8 + ids % 25).all()
    assert (got["height"].to_numpy() == 8 + (ids * 7) % 17).all()
    n = (got["width"] * got["height"] * 3).to_numpy()
    exp_sum = np.array([((mid * 37 + np.arange(k, dtype=np.int64) * 101)
                         % 256).sum() for mid, k in zip(ids, n)])
    assert (got["px_sum"].to_numpy() == exp_sum).all()
    assert (got[[f"h{b}" for b in range(8)]].sum(axis=1).to_numpy()
            == n).all()


def test_giant_duplicate_cluster_bounded(ray_session, tmp_path):
    """A cluster of hundreds of identical docs must NOT explode into
    O(n^2) candidate pairs: bands above the cap emit star edges, pair
    output stays O(n), and clustering still groups every member."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cdcsdk_server_ray.pipelines.dedup import (dedup_clusters,
                                                   minhash_lsh_pairs)

    n_dup, n_unique = 600, 50
    texts = (["the same duplicated document body repeated verbatim "
              "across the corpus shard"] * n_dup
             + [f"unique document number {i} with distinct content {i**2}"
                for i in range(n_unique)])
    t = pa.table({
        "doc_id": pa.array(range(n_dup + n_unique), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    d = tmp_path / "giant"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    pairs = minhash_lsh_pairs(str(d)).to_pandas()
    # star edges: O(n) pairs (hub 0 vs each spoke), not n*(n-1)/2
    dup_pairs = pairs[pairs["doc_b"] < n_dup]
    assert len(dup_pairs) == n_dup - 1          # exactly the star
    assert (dup_pairs["jaccard"] == 1.0).all()
    assert len(pairs) < 3 * n_dup               # uniques add only O(n)

    clusters = dedup_clusters(str(d)).to_pandas()
    dup_cluster = clusters[clusters["doc_id"] < n_dup]
    assert len(dup_cluster) == n_dup
    assert (dup_cluster["cluster_id"] == 0).all()

    # SimHash takes the same star path: identical signatures form giant
    # bands; output must be O(n) star pairs at Hamming 0, every dup
    # member connected to hub 0. band_cap is pinned BELOW the cluster
    # size here to exercise the star-edge machinery (the production
    # default of 1024 sits above natural 16-bit band collisions so the
    # pigeonhole pair-completeness claim holds on real corpora).
    from cdcsdk_server_ray.pipelines.dedup import simhash_pairs
    sp = simhash_pairs(str(d), band_cap=256).to_pandas()
    sp_dup = sp[sp["doc_b"] < n_dup]
    assert set(sp_dup.loc[sp_dup["doc_a"] == 0, "doc_b"]) == \
        set(range(1, n_dup))
    assert (sp_dup["hamming"] == 0).all()
    assert len(sp) < 3 * n_dup


def test_simhash_token_hash_matches_duckdb_md5_lower():
    """The SimHash token hash IS DuckDB's md5_number_lower (last 8 md5
    digest bytes, little-endian) — the convention the driver's SQL
    oracle re-derives signatures with. A refactor that changes the hash
    silently breaks oracle parity; this pins it."""
    import duckdb

    from cdcsdk_server_ray.pipelines.dedup import SimHasher
    toks = ["abc", "hello", "cafe_123", "_"]
    got = SimHasher()._hash_tokens(toks)
    for t, h in zip(toks, got):
        exp = duckdb.sql(
            f"select md5_number_lower('{t}')").fetchone()[0]
        assert int(h) == exp


def test_connected_components_100k_nodes_fast(ray_session):
    """VERDICT r02: per-node Python groups made ≥100k-node graphs grind
    (one map_groups call per node per round). The bucketed-vectorized
    kernel must cluster 100k nodes in seconds, exactly."""
    import time

    import ray.data

    from cdcsdk_server_ray.pipelines.dedup import connected_components

    # 25k chain components of 4 nodes each (100k nodes): 4i-4i+1-4i+2-4i+3
    n_comp = 25_000
    base = 4 * np.arange(n_comp, dtype=np.int64)
    a = np.concatenate([base, base + 1, base + 2])
    b = a + 1
    edges = pd.DataFrame({"doc_a": a, "doc_b": b}).sample(
        frac=1.0, random_state=3)
    ds = ray.data.from_pandas(edges).repartition(16)
    t0 = time.perf_counter()
    out = connected_components(ds).to_pandas()
    wall = time.perf_counter() - t0
    assert len(out) == 4 * n_comp
    lab = out.set_index("doc_id")["cluster_id"]
    ids = out["doc_id"].to_numpy()
    assert (lab.to_numpy() == 4 * (lab.index.to_numpy() // 4)).all()
    assert set(ids) == set(range(4 * n_comp))
    # seconds, not minutes (the old shape: 100k Python groups × rounds)
    assert wall < 90, f"100k-node clustering took {wall:.0f}s"


def test_near_dup_embeddings_dense_bucket_capped(ray_session, tmp_path):
    """VERDICT r02: a dense cluster (hundreds of identical embeddings)
    must not trigger the O(n²) intra-bucket matmul/pair explosion — the
    hub-spoke cap bounds output to O(n) while keeping the cluster
    connected through the hub."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cdcsdk_server_ray.pipelines.similarity import (SEED_DUP_COUNT,
                                                        SEED_DUP_OFFSET,
                                                        near_dup_embeddings)

    rng = np.random.default_rng(77)
    dim, n_dense, n_rand = 32, 600, 50
    v = rng.standard_normal(dim)
    dense = np.tile(v, (n_dense, 1))
    rand = rng.standard_normal((n_rand, dim))
    emb = np.concatenate([dense, rand])
    t = pa.table({
        "vec_id": pa.array(range(n_dense + n_rand), pa.int64()),
        "embedding": pa.array([list(map(float, e)) for e in emb]),
    })
    d = tmp_path / "dense"
    d.mkdir()
    pq.write_table(t, str(d / "embeddings.parquet"))

    pairs = near_dup_embeddings(str(d)).to_pandas()
    # cluster = 600 dense + SEED_DUP_COUNT seeded copies of ids 0..49
    members = set(range(n_dense)) | {
        SEED_DUP_OFFSET + i for i in range(SEED_DUP_COUNT)}
    n = len(members)
    assert len(pairs) < 3 * n, "pair output must be O(n), not O(n²)"
    # every member reachable from hub 0
    touched = set(pairs["vec_a"]) | set(pairs["vec_b"])
    assert members <= touched
    assert (pairs["cos"] >= 0.95).all()


def _recall_vs_bruteforce(ann_df, bf_df):
    bf = set(zip(bf_df["query_id"], bf_df["vec_id"]))
    ann = set(zip(ann_df["query_id"], ann_df["vec_id"]))
    return len(ann & bf) / len(bf)


def test_knn_lsh_recall_floor(ray_session):
    """ANN recall property (VERDICT r02 #7): knn_lsh is rows-only at the
    driver forever; pin recall@k vs exact brute force so a change that
    silently guts recall fails here. multiprobe=2 on sf0.01."""
    from cdcsdk_server_ray.pipelines.similarity import (knn_bruteforce,
                                                        knn_lsh)

    bf = knn_bruteforce(SF01_DIR).to_pandas()
    ann = knn_lsh(SF01_DIR, multiprobe=2, n_tables=8).to_pandas()
    assert _recall_vs_bruteforce(ann, bf) >= 0.9   # measured 0.96
    # and the default config stays a useful ANN, not a degenerate one
    dflt = knn_lsh(SF01_DIR).to_pandas()
    assert _recall_vs_bruteforce(dflt, bf) >= 0.3


def test_knn_ivf_recall_floor(ray_session):
    from cdcsdk_server_ray.pipelines.similarity import (knn_bruteforce,
                                                        knn_ivf)

    bf = knn_bruteforce(SF01_DIR).to_pandas()
    ann = knn_ivf(SF01_DIR).to_pandas()
    assert _recall_vs_bruteforce(ann, bf) >= 0.7   # measured 0.88


def test_cluster_kmeans_recovers_separated_blobs(ray_session, tmp_path):
    """Three well-separated Gaussian blobs must come back as three pure
    clusters (label-agnostic), and the assignment must be deterministic
    across runs (pure function of the input)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cdcsdk_server_ray.pipelines.similarity import cluster_kmeans

    rng = np.random.default_rng(7)
    centers = np.array([[10.0, 0, 0, 0], [0, 10.0, 0, 0], [0, 0, 10.0, 0]])
    vecs, labels = [], []
    for li, c in enumerate(centers):
        pts = c + 0.1 * rng.standard_normal((40, 4))
        vecs.extend(pts.tolist())
        labels.extend([li] * 40)
    # interleave so the first-k init sees all blobs
    order = np.argsort(np.tile(np.arange(40), 3), kind="stable")
    tbl = pa.table({
        "vec_id": pa.array(np.arange(120), pa.int64()),
        "embedding": pa.array(np.asarray(vecs)[order].tolist(),
                              pa.list_(pa.float32())),
        "label": pa.array(np.asarray(labels)[order], pa.int32()),
    })
    d = tmp_path / "blobs"
    d.mkdir()
    pq.write_table(tbl, d / "embeddings.parquet")

    got = cluster_kmeans(str(d), k=3, iters=5).to_pandas()
    assert len(got) == 120
    truth = np.asarray(labels)[order]
    df = pd.DataFrame({"cluster": got["cluster"], "label": truth})
    # purity 1.0: each k-means cluster maps to exactly one blob
    assert (df.groupby("cluster")["label"].nunique() == 1).all()
    assert df["cluster"].nunique() == 3

    again = cluster_kmeans(str(d), k=3, iters=5).to_pandas()
    pd.testing.assert_frame_equal(got, again)


def test_semdedup_drops_seeded_duplicates(ray_session):
    """SemDeDup on the seeded-duplicate augmented table: all 50 exact
    copies are dropped with dup_of = their original; every original and
    every non-duplicated vector is kept (no natural pair reaches
    tau=0.99 in this table)."""
    from cdcsdk_server_ray.pipelines.similarity import (SEED_DUP_COUNT,
                                                        SEED_DUP_OFFSET,
                                                        semdedup)

    got = semdedup("/root/testdata/sf0.001").to_pandas()
    dropped = got[~got["keep"]]
    assert len(dropped) == SEED_DUP_COUNT
    assert (dropped["vec_id"] >= SEED_DUP_OFFSET).all()
    assert (dropped["dup_of"].astype("int64")
            == dropped["vec_id"] - SEED_DUP_OFFSET).all()
    assert got[got["vec_id"] < SEED_DUP_OFFSET]["keep"].all()


def test_dedup_survivors_partition_the_corpus(ray_session):
    """survivors ∪ dropped == corpus; dropped = exactly the non-
    representative members of dedup_clusters; every representative
    survives."""
    from cdcsdk_server_ray.pipelines.dedup import (dedup_clusters,
                                                   dedup_survivors)

    sf = "/root/testdata/sf0.001"
    surv = dedup_survivors(sf).to_pandas()
    cl = dedup_clusters(sf).to_pandas()
    import pyarrow.parquet as pq
    all_ids = set(pq.read_table(f"{sf}/documents.parquet",
                                columns=["doc_id"])["doc_id"].to_pylist())
    expected_drop = set(cl.loc[cl["doc_id"] != cl["cluster_id"], "doc_id"])
    got_ids = set(surv["doc_id"])
    assert got_ids == all_ids - expected_drop
    assert set(cl["cluster_id"]) <= got_ids       # reps survive
    assert list(surv.columns) == ["doc_id", "lang", "source", "n_chars"]


def test_dedup_survivors_bucket_branch_matches_broadcast(ray_session,
                                                         monkeypatch):
    """The size guard's two anti-join plans agree: forcing the bound to
    0 takes the bucketed-exchange branch, which must return exactly the
    broadcast branch's survivor set (same rows, same column order)."""
    import cdcsdk_server_ray.pipelines.dedup as dd
    import cdcsdk_server_ray.stages.join as join_mod

    sf = "/root/testdata/sf0.001"
    bcast = dd.dedup_survivors(sf).to_pandas()
    monkeypatch.setattr(join_mod, "BROADCAST_BOUND_BYTES", 0)
    bucketed = dd.dedup_survivors(sf).to_pandas()
    pd.testing.assert_frame_equal(bcast.reset_index(drop=True),
                                  bucketed.reset_index(drop=True))


def test_embed_pca_matches_numpy_bruteforce(ray_session):
    """Moment-partial PCA == whole-matrix numpy PCA (same sign fix),
    components ordered by descending explained variance."""
    import pyarrow.parquet as pq

    from cdcsdk_server_ray.pipelines.similarity import embed_pca

    sf = "/root/testdata/sf0.001"
    got = embed_pca(sf, n_components=4).to_pandas()
    emb = pq.read_table(f"{sf}/embeddings.parquet")
    m = np.stack([np.asarray(v, np.float64)
                  for v in emb["embedding"].to_pylist()])
    mean = m.mean(axis=0)
    cov = (m.T @ m) / len(m) - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    comps = evecs[:, order]
    flip = np.sign(comps[np.argmax(np.abs(comps), axis=0), np.arange(4)])
    comps = comps * flip
    exp = np.round((m - mean) @ comps, 6)
    got = got.sort_values("vec_id").reset_index(drop=True)
    ids = emb["vec_id"].to_numpy()
    exp = exp[np.argsort(ids)]
    for c in range(4):
        assert np.allclose(got[f"pc{c}"].to_numpy(), exp[:, c], atol=2e-6)
    # descending explained variance in the output itself
    var = [got[f"pc{c}"].var() for c in range(4)]
    assert var == sorted(var, reverse=True)


def test_dedup_incremental_exact_and_bloom_sound(ray_session):
    """Bloom prune + exact verify must equal the plain anti-join: admitted
    = docs whose text is NOT in the doc_id%5==0 snapshot. Also asserts the
    bloom never drops a non-duplicate (false positives verified away)."""
    from cdcsdk_server_ray.pipelines.dedup import dedup_incremental
    sf = "/root/testdata/sf0.001"
    import pyarrow.parquet as pq
    got = dedup_incremental(sf).to_pandas()
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    snap_texts = set(docs.loc[docs["doc_id"] % 5 == 0, "text"])
    exp = docs[~docs["text"].isin(snap_texts)].sort_values("doc_id")
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["n_chars"].tolist() == exp["n_chars"].tolist()


def test_media_phash_finds_seeded_near_dups(ray_session):
    """The byte-level perceptual hash must pair the seeded near-dup
    payloads (payload = utf-8 text, so text near-dups are payload
    near-dups), and every reported pair must verify under the direct
    single-process signature computation."""
    from cdcsdk_server_ray.pipelines.multimodal import (MediaPHasher,
                                                        media_phash_pairs)
    import pyarrow.parquet as pq
    got = media_phash_pairs(SF_DIR).to_pandas()
    assert len(got) > 0
    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    hasher = MediaPHasher()
    sigs = hasher(pd.DataFrame({
        "media_id": docs["doc_id"],
        "payload": docs["text"].map(lambda t: t.encode())}))
    sig_of = dict(zip(sigs["doc_id"], sigs["simhash"].to_numpy(np.uint64)))
    for _, r in got.iterrows():
        x = np.uint64(sig_of[r["doc_a"]]) ^ np.uint64(sig_of[r["doc_b"]])
        ham = bin(int(x)).count("1")
        assert ham == r["hamming"] and ham <= 3


def test_exact_substring_dedup_bruteforce(ray_session):
    """ExactSubstr parity: the distributed hash-exchange plan must agree
    with a direct single-process pass (global-first kept, all other
    occurrences duplicated, removed tokens = union of dup spans)."""
    import re

    import pyarrow.parquet as pq

    from cdcsdk_server_ray.pipelines.dedup import exact_substring_dedup

    k = 8
    got = exact_substring_dedup(SF_DIR, k=k).to_pandas()
    docs = (pq.read_table(f"{SF_DIR}/documents.parquet",
                          columns=["doc_id", "text"]).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    seen: set = set()
    exp_rows = []
    for _, r in docs.iterrows():
        toks = re.split(r"\s+", r["text"].strip())
        covered: set = set()
        n_dup = 0
        for pos in range(max(0, len(toks) - k + 1)):
            gram = tuple(toks[pos:pos + k])
            if gram in seen:
                n_dup += 1
                covered.update(range(pos, pos + k))
            else:
                seen.add(gram)
        exp_rows.append((int(r["doc_id"]), len(toks),
                         max(0, len(toks) - k + 1), n_dup, len(covered)))
    exp = pd.DataFrame(exp_rows, columns=["doc_id", "n_tokens", "n_windows",
                                          "n_dup_windows",
                                          "n_removed_tokens"])
    assert (got["n_dup_windows"] > 0).any()      # non-vacuous corpus
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                  check_dtype=False)


def test_join_parquet_dim_size_guard_both_branches(ray_session):
    """The guarded join entry picks broadcast vs bucket from parquet
    METADATA, and BOTH plans produce the same rows. Forcing the bound to
    0 exercises the bucket branch on the same input; the metadata
    estimate itself must exceed the real file size's compressed bytes
    only via footers (no data read is observable, but the estimate must
    be positive and column-pruned)."""
    from cdcsdk_server_ray.pipelines.analytics import _read
    from cdcsdk_server_ray.stages.join import (choose_join_plan,
                                               join_parquet_dim,
                                               parquet_table_bytes)

    cust = f"{SF_DIR}/customer.parquet"
    pruned = parquet_table_bytes(cust, ["c_custkey", "c_mktsegment"])
    full = parquet_table_bytes(cust)
    assert 0 < pruned < full                     # column pruning counts
    assert choose_join_plan(cust, ["c_custkey", "c_mktsegment"]) == "broadcast"
    assert choose_join_plan(cust, ["c_custkey", "c_mktsegment"],
                            broadcast_bound=0) == "bucket"

    outs = {}
    for plan, bound in (("broadcast", None), ("bucket", 0)):
        orders = _read(SF_DIR, "orders", columns=["o_custkey", "o_totalprice"])
        kw = {} if bound is None else {"broadcast_bound": bound}
        j = join_parquet_dim(orders, cust, on="o_custkey",
                             right_columns=["c_custkey", "c_mktsegment"],
                             rename={"c_custkey": "o_custkey"}, **kw)
        outs[plan] = (j.to_pandas()
                      .sort_values(["o_custkey", "o_totalprice",
                                    "c_mktsegment"])
                      .reset_index(drop=True))
    assert len(outs["broadcast"]) > 0
    pd.testing.assert_frame_equal(
        outs["broadcast"], outs["bucket"][outs["broadcast"].columns],
        check_dtype=False)


def test_shipping_priority_same_under_both_join_branches(ray_session):
    """TPC-H Q3 through the size-guarded customer semi-filter: the
    broadcast branch (default at test scale) and the forced bucket
    branch (bound=0) return identical top-k rows, and the post_join
    in-task aggregate matches a pandas bruteforce."""
    from cdcsdk_server_ray.pipelines.analytics import shipping_priority

    outs = {}
    for plan, bound in (("broadcast", None), ("bucket", 0)):
        kw = {} if bound is None else {"broadcast_bound": bound}
        outs[plan] = (shipping_priority(SF_DIR, **kw).to_pandas()
                      .reset_index(drop=True))
    assert len(outs["broadcast"]) > 0
    pd.testing.assert_frame_equal(outs["broadcast"], outs["bucket"])

    cut = pd.Timestamp("1998-06-01")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    keys = set(cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"])
    o = orders[(orders["o_orderdate"] < cut)
               & orders["o_custkey"].isin(keys)]
    l = li[li["l_shipdate"] > cut].copy()
    l["rev_e4"] = np.round(l["l_extendedprice"]
                           * (1.0 - l["l_discount"]) * 10000.0
                           ).astype("int64")
    j = l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    exp = (j.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"],
                     sort=False)["rev_e4"].sum().reset_index()
           .sort_values(["rev_e4", "l_orderkey"],
                        ascending=[False, True]).head(10)
           .reset_index(drop=True))
    got = outs["broadcast"]
    assert got["l_orderkey"].tolist() == exp["l_orderkey"].tolist()
    assert np.allclose(got["revenue"],
                       exp["rev_e4"].to_numpy("int64") / 10000.0,
                       rtol=0, atol=0)


def test_local_supplier_volume_same_under_both_join_branches(ray_session):
    """TPC-H Q5 through both size-guard branches (customer/supplier dims
    broadcast by default, forced to bucket joins with bound=0) plus a
    pandas bruteforce of the cross-side nationkey equality."""
    from cdcsdk_server_ray.pipelines.analytics import local_supplier_volume

    outs = {}
    for plan, bound in (("broadcast", None), ("bucket", 0)):
        kw = {} if bound is None else {"broadcast_bound": bound}
        outs[plan] = local_supplier_volume(SF_DIR, **kw).reset_index(drop=True)
    pd.testing.assert_frame_equal(outs["broadcast"], outs["bucket"])

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    supp = pd.read_parquet(f"{SF_DIR}/supplier.parquet")
    nation = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    reg = pd.read_parquet(f"{SF_DIR}/region.parquet")
    nat = nation.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    nat = nat[nat["r_name"] == "ASIA"]
    o = orders[(orders["o_orderdate"] >= pd.Timestamp("1997-01-01"))
               & (orders["o_orderdate"] < pd.Timestamp("1998-01-01"))]
    j = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
         .merge(cust, left_on="o_custkey", right_on="c_custkey")
         .merge(supp, left_on="l_suppkey", right_on="s_suppkey"))
    j = j[(j["c_nationkey"] == j["s_nationkey"])
          & j["s_nationkey"].isin(set(nat["n_nationkey"]))]
    j["rev_e4"] = np.round(j["l_extendedprice"]
                           * (1.0 - j["l_discount"]) * 10000.0
                           ).astype("int64")
    agg = (j.groupby("s_nationkey")["rev_e4"].sum().reset_index()
           .merge(nat, left_on="s_nationkey", right_on="n_nationkey"))
    exp = (agg.assign(revenue=agg["rev_e4"].astype("int64") / 10000.0)
           .sort_values(["rev_e4", "n_name"], ascending=[False, True])
           [["n_name", "revenue"]].reset_index(drop=True))
    got = outs["broadcast"]
    assert got["n_name"].tolist() == exp["n_name"].tolist()
    assert np.allclose(got["revenue"], exp["revenue"], rtol=0, atol=0)


def test_large_order_quantities_matches_bruteforce(ray_session):
    """TPC-H Q18: HAVING over the distributed per-order quantity sums,
    joined back — vs a pandas bruteforce; both join-guard branches for
    the c_name dim attach agree."""
    from cdcsdk_server_ray.pipelines.analytics import large_order_quantities

    th = 15  # sf0.001 orders are small; a low bar keeps the result non-empty
    outs = {}
    for plan, bound in (("broadcast", None), ("bucket", 0)):
        kw = {} if bound is None else {"broadcast_bound": bound}
        outs[plan] = (large_order_quantities(SF_DIR, threshold=th, **kw)
                      .to_pandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(outs["broadcast"], outs["bucket"])

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    q = (li.assign(qty=li["l_quantity"].astype("int64"))
         .groupby("l_orderkey")["qty"].sum().reset_index())
    q = q[q["qty"] > th]
    j = (q.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
         .merge(cust, left_on="o_custkey", right_on="c_custkey"))
    exp = (j.sort_values(["o_totalprice", "o_orderkey"],
                         ascending=[False, True]).head(100)
           .reset_index(drop=True))
    got = outs["broadcast"]
    assert len(got) == len(exp) > 0
    assert got["o_orderkey"].tolist() == exp["o_orderkey"].tolist()
    assert got["c_name"].tolist() == exp["c_name"].tolist()
    assert got["sum_qty"].tolist() == exp["qty"].tolist()
    assert np.allclose(got["o_totalprice"], exp["o_totalprice"],
                       rtol=0, atol=0)


def test_customer_order_distribution_matches_bruteforce(ray_session):
    """TPC-H Q13: left-outer count distribution incl. the zero bucket
    (computed from parquet metadata, never a customer scan)."""
    from cdcsdk_server_ray.pipelines.analytics import \
        customer_order_distribution

    got = customer_order_distribution(SF_DIR).to_pandas()
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    per = (orders[orders["o_orderstatus"] == "O"]
           .groupby("o_custkey").size())
    counts = cust["c_custkey"].map(per).fillna(0).astype("int64")
    vc = counts.value_counts()
    exp = (pd.DataFrame({"c_count": vc.index.to_numpy(np.int64),
                         "custdist": vc.to_numpy(np.int64)})
           .sort_values(["custdist", "c_count"], ascending=[False, False])
           .reset_index(drop=True))
    assert (got["c_count"] == 0).any()  # zero bucket present
    pd.testing.assert_frame_equal(got, exp)


def test_sales_opportunity_matches_bruteforce(ray_session):
    """TPC-H Q22: integer-cents threshold + bucketed anti join vs a
    pandas bruteforce."""
    from cdcsdk_server_ray.pipelines.analytics import sales_opportunity

    got = sales_opportunity(SF_DIR).to_pandas()
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet").copy()
    cust["cents"] = np.round(cust["c_acctbal"].to_numpy() * 100
                             ).astype(np.int64)
    pos = cust.loc[cust["cents"] > 0, "cents"]
    sum_cents, cnt = int(pos.sum()), int(len(pos))
    recent = set(orders.loc[
        orders["o_orderdate"] >= pd.Timestamp("1999-01-01"), "o_custkey"])
    q = cust[(cust["cents"] * cnt > sum_cents)
             & ~cust["c_custkey"].isin(recent)]
    exp = (q.groupby("c_nationkey")
           .agg(numcust=("c_custkey", "size"), cents=("cents", "sum"))
           .reset_index())
    exp["totacctbal"] = np.round(exp["cents"].to_numpy() / 100.0, 2)
    exp = (exp[["c_nationkey", "numcust", "totacctbal"]]
           .astype({"c_nationkey": "int64", "numcust": "int64"})
           .sort_values("c_nationkey").reset_index(drop=True))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, exp)


def test_promo_revenue_share_matches_bruteforce(ray_session):
    """TPC-H Q14: exact 1e-4-unit integer revenue accumulation through
    the size-guarded part join."""
    from cdcsdk_server_ray.pipelines.analytics import promo_revenue_share

    got = promo_revenue_share(SF_DIR)
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    part = pd.read_parquet(f"{SF_DIR}/part.parquet")
    m = li[(li["l_shipdate"] >= pd.Timestamp("1997-09-01"))
           & (li["l_shipdate"] < pd.Timestamp("1997-10-01"))]
    j = m.merge(part, left_on="l_partkey", right_on="p_partkey")
    rev4 = (np.round(j["l_extendedprice"].to_numpy() * 100).astype(np.int64)
            * (100 - np.round(j["l_discount"].to_numpy() * 100
                              ).astype(np.int64)))
    promo4 = int(rev4[(j["p_type"] == "ECONOMY").to_numpy()].sum())
    total4 = int(rev4.sum())
    assert total4 > 0
    assert got["promo_revenue"].iloc[0] == round(promo4 / 10_000.0, 2)
    assert got["total_revenue"].iloc[0] == round(total4 / 10_000.0, 2)
    assert got["promo_pct"].iloc[0] == round(100.0 * promo4 / total4, 6)


def test_returned_item_report_matches_bruteforce(ray_session):
    """TPC-H Q10: two-exchange fact⋈fact re-key aggregate + top-k, both
    dim-join branches agree with a pandas bruteforce."""
    from cdcsdk_server_ray.pipelines.analytics import returned_item_report

    outs = {}
    for plan, bound in (("broadcast", None), ("bucket", 0)):
        kw = {} if bound is None else {"broadcast_bound": bound}
        outs[plan] = (returned_item_report(SF_DIR, **kw)
                      .to_pandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(outs["broadcast"], outs["bucket"])

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    nation = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    m = orders[(orders["o_orderdate"] >= pd.Timestamp("1997-07-01"))
               & (orders["o_orderdate"] < pd.Timestamp("1997-10-01"))]
    j = li[li["l_returnflag"] == "R"].merge(
        m, left_on="l_orderkey", right_on="o_orderkey")
    rev4 = (np.round(j["l_extendedprice"].to_numpy() * 100).astype(np.int64)
            * (100 - np.round(j["l_discount"].to_numpy() * 100
                              ).astype(np.int64)))
    per = (pd.DataFrame({"o_custkey": j["o_custkey"], "rev4": rev4})
           .groupby("o_custkey")["rev4"].sum().reset_index()
           .sort_values(["rev4", "o_custkey"], ascending=[False, True])
           .head(20))
    exp = (per.merge(cust, left_on="o_custkey", right_on="c_custkey")
           .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
           .sort_values(["rev4", "o_custkey"], ascending=[False, True]))
    got = outs["broadcast"]
    assert len(got) == len(exp) > 0
    assert got["c_custkey"].tolist() == exp["c_custkey"].tolist()
    assert got["revenue"].tolist() == \
        np.round(exp["rev4"].to_numpy() / 10_000.0, 2).tolist()
    assert got["n_name"].tolist() == exp["n_name"].tolist()


def test_event_transitions_match_bruteforce(ray_session):
    """Per-user transition counts vs a pandas lag bruteforce."""
    from cdcsdk_server_ray.pipelines.windows import event_transitions

    got = event_transitions(SF_DIR).to_pandas()
    ev = (pd.read_parquet(f"{SF_DIR}/events.parquet")
          .sort_values(["user_id", "ts", "event_id"]))
    same = ev["user_id"].to_numpy()[1:] == ev["user_id"].to_numpy()[:-1]
    t = ev["event_type"].to_numpy()
    exp = (pd.DataFrame({"prev_event": t[:-1][same],
                         "next_event": t[1:][same]})
           .groupby(["prev_event", "next_event"]).size().rename("n")
           .reset_index().astype({"n": "int64"})
           .sort_values(["prev_event", "next_event"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_pagerank_pairs_matches_integer_bruteforce(ray_session):
    """Distributed integer PageRank vs a driver-side replay of the same
    floor-division recurrence over the same pair graph."""
    from cdcsdk_server_ray.pipelines.dedup import (pagerank_pairs,
                                                   simhash_pairs)

    got = pagerank_pairs(SF_DIR).to_pandas()
    pairs = simhash_pairs(SF_DIR).to_pandas()
    assert len(pairs) > 0
    src = np.concatenate([pairs["doc_a"], pairs["doc_b"]]).astype(np.int64)
    dst = np.concatenate([pairs["doc_b"], pairs["doc_a"]]).astype(np.int64)
    nodes = np.unique(src)
    deg = pd.Series(src).value_counts().sort_index()
    SCALE = 1_000_000_000_000
    base = SCALE // len(nodes)
    base15 = (base * 15) // 100
    r = pd.Series(np.int64(base), index=nodes)
    for _ in range(3):
        contrib = (r[src].to_numpy() // deg[src].to_numpy())
        s = pd.Series(contrib).groupby(dst).sum()
        r = base15 + (85 * s.reindex(nodes).fillna(0).astype("int64")) // 100
    exp = pd.DataFrame({"doc_id": nodes,
                        "deg": deg.to_numpy(np.int64),
                        "rank_pico": r.to_numpy(np.int64)})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)
    # centrality sanity: some node beats the uniform base rank
    assert got["rank_pico"].max() > base


def test_worker_cached_builds_once_per_process_and_keys_on_args():
    from cdcsdk_server_ray.stages import worker_cache
    from cdcsdk_server_ray.stages.worker_cache import worker_cached

    builds = []

    class Stage:
        def __init__(self, k=1):
            builds.append(k)
            self.k = k

        def __call__(self, batch):
            return batch * self.k

    worker_cache._CACHE.clear()
    f1 = worker_cached(Stage, k=2)
    assert f1.__name__ == "Stage"          # stats/plan label stays readable
    assert f1(3) == 6 and f1(4) == 8
    assert builds == [2]                   # second batch reused the instance
    f2 = worker_cached(Stage, k=5)         # different args -> new instance
    assert f2(3) == 15 and builds == [2, 5]
    assert f1(1) == 2 and builds == [2, 5]  # both instances coexist


def test_media_parsers_reject_malformed_containers_with_valueerror():
    """Every malformed-container path raises ValueError (the documented
    rejection type) — not struct.error on a short CRC slice or TypeError
    on fdAT-before-fcTL — so callers can reject a bad media row without
    killing the whole decode task."""
    import struct

    import pytest

    import numpy as np

    from cdcsdk_server_ray.pipelines.multimodal import (apng_parse,
                                                        png_decode,
                                                        png_encode)

    good = png_encode(np.zeros((4, 4, 3), np.uint8))
    # damage the first chunk's length field to run past the payload end
    bad_len = good[:8] + struct.pack(">I", 2**24) + good[12:]
    with pytest.raises(ValueError, match="runs past"):
        png_decode(bad_len)
    with pytest.raises(ValueError, match="runs past"):
        apng_parse(bad_len)

    # fdAT before any fcTL
    def chunk(typ: bytes, payload: bytes) -> bytes:
        import zlib
        return (struct.pack(">I", len(payload)) + typ + payload
                + struct.pack(">I", zlib.crc32(typ + payload)))

    ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
    fdat = chunk(b"fdAT", struct.pack(">I", 0) + b"x")
    png_sig = good[:8]
    with pytest.raises(ValueError, match="fdAT chunk before"):
        apng_parse(png_sig + ihdr + fdat + chunk(b"IEND", b""))
    short_fdat = chunk(b"fdAT", b"\x00")
    with pytest.raises(ValueError, match="too short|fdAT chunk before"):
        apng_parse(png_sig + ihdr + short_fdat + chunk(b"IEND", b""))


def test_wav_codec_roundtrip_and_rejection():
    """wav_encode → wav_decode is identity on samples/rate; malformed
    RIFF containers (bad magic, truncated chunk, non-PCM fmt, data
    before fmt) reject with ValueError."""
    import struct

    from cdcsdk_server_ray.pipelines.multimodal import (wav_decode,
                                                        wav_encode)

    s = np.array([0, 1, -1, 32767, -32768, 123], np.int16)
    sr, ch, out = wav_decode(wav_encode(s, 16000))
    assert sr == 16000 and ch == 1
    assert (out == s).all()

    # spec-valid empty data chunk: features degrade to zeros, no crash
    empty = wav_encode(np.array([], np.int16), 8000)
    sr0, _c, out0 = wav_decode(empty)
    assert sr0 == 8000 and len(out0) == 0
    import pyarrow as _pa
    from cdcsdk_server_ray.pipelines.multimodal import WavDecoder
    t = _pa.table({"media_id": _pa.array([7], _pa.int64()),
                   "payload": _pa.array([empty], _pa.binary())})
    row = WavDecoder()(t).to_pydict()
    assert (row["n_samples"], row["sum_sq"], row["peak"],
            row["zero_crossings"]) == ([0], [0], [0], [0])

    good = wav_encode(s, 8000)
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"JUNK" + good[4:])
    # declared RIFF size larger than the payload
    bad_size = good[:4] + struct.pack("<I", 2**24) + good[8:]
    with pytest.raises(ValueError, match="exceeds"):
        wav_decode(bad_size)
    # truncated data chunk: the chunk's own length field runs past the
    # end while the RIFF size stays consistent with the payload
    data_off = good.index(b"data") + 4
    overlong = (good[:data_off] + struct.pack("<I", 2**16)
                + good[data_off + 4:])
    with pytest.raises(ValueError, match="truncated"):
        wav_decode(overlong)
    # non-PCM codec id in fmt
    fmt_off = good.index(b"fmt ") + 8
    bad_fmt = (good[:fmt_off] + struct.pack("<H", 3)
               + good[fmt_off + 2:])
    with pytest.raises(ValueError, match="unsupported fmt"):
        wav_decode(bad_fmt)
    # data chunk before any fmt
    body = good[12:]
    fmt_chunk = body[:8 + 16]
    data_chunk = body[8 + 16:]
    swapped = (b"RIFF" + good[4:8] + b"WAVE" + data_chunk + fmt_chunk)
    with pytest.raises(ValueError, match="before fmt"):
        wav_decode(swapped)


def test_wav_decode_pipeline_recovers_pattern(ray_session):
    """End-to-end: synth WAV table → decode stage; every feature must
    equal the closed-form PCM pattern (the SQL oracle's formula), and
    the frame energies must partition the total energy exactly."""
    from cdcsdk_server_ray.pipelines.multimodal import (
        audio_energy_frames, decode_audio)

    got = decode_audio(SF_DIR).to_pandas()
    ids = got["media_id"].to_numpy()
    assert (got["sample_rate"].to_numpy() == 8000 * (1 + ids % 3)).all()
    n = 800 + (ids * 31) % 1600
    assert (got["n_samples"].to_numpy() == n).all()
    assert (got["duration_ms"].to_numpy()
            == n * 1000 // got["sample_rate"].to_numpy()).all()
    for row in got.itertuples(index=False):
        s = (row.media_id * 73
             + np.arange(row.n_samples, dtype=np.int64) * 157) \
            % 4001 - 2000
        assert row.sum_sq == int((s * s).sum())
        assert row.peak == int(np.abs(s).max())
        nonneg = s >= 0
        assert row.zero_crossings == int((nonneg[1:] != nonneg[:-1]).sum())

    frames = audio_energy_frames(SF_DIR).to_pandas()
    per_item = frames.groupby("media_id").agg(
        energy=("energy", "sum"), n=("frame_samples", "sum"))
    merged = got.set_index("media_id").join(per_item)
    assert (merged["energy"].to_numpy() == merged["sum_sq"].to_numpy()).all()
    assert (merged["n"].to_numpy() == merged["n_samples"].to_numpy()).all()
    # frame indices are dense 0..k-1 per item
    assert (frames.groupby("media_id")["frame_idx"].max().to_numpy() + 1
            == np.ceil(per_item["n"].to_numpy() / 400)).all()


def test_resize_pixels_real_thumbnails(ray_session):
    """media_resize_pixels re-encodes REAL thumbnails: decoding the
    output payload must reproduce the nearest-neighbor resample of the
    closed-form source image exactly (pixels, not just stats)."""
    from cdcsdk_server_ray.pipelines.multimodal import (
        png_decode, resize_media_pixels)

    got = resize_media_pixels(SF_DIR).to_pandas().head(25)
    for row in got.itertuples(index=False):
        w = 8 + row.media_id % 25
        h = 8 + (row.media_id * 7) % 17
        src = ((row.media_id * 37
                + np.arange(w * h * 3, dtype=np.int64) * 101)
               % 256).astype(np.uint8).reshape(h, w, 3)
        sy = np.arange(row.height, dtype=np.int64) * h // row.height
        sx = np.arange(row.width, dtype=np.int64) * w // row.width
        exp = src[np.ix_(sy, sx)]
        ow, oh, _c, out = png_decode(row.payload)
        assert (ow, oh) == (row.width, row.height)
        assert (out == exp).all()
        assert row.payload_bytes == len(row.payload)


def test_small_quantity_revenue_same_under_both_join_branches(ray_session):
    """TPC-H Q17 through both size-guard branches (keep-set broadcast by
    default, forced through the bucket join with bound=0) plus a pandas
    bruteforce of the correlated per-part average filter."""
    from cdcsdk_server_ray.pipelines.analytics import small_quantity_revenue

    outs = {}
    for plan, bound in (("broadcast", None), ("bucket", 0)):
        kw = {} if bound is None else {"broadcast_bound": bound}
        outs[plan] = small_quantity_revenue(SF_DIR, **kw)
    pd.testing.assert_frame_equal(outs["broadcast"], outs["bucket"])

    part = pd.read_parquet(f"{SF_DIR}/part.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    sel = part[(part["p_brand"] == "Brand#23") & (part["p_size"] <= 15)]
    j = li[li["l_partkey"].isin(set(sel["p_partkey"]))].copy()
    j["qty"] = j["l_quantity"].round().astype("int64")
    j["cents"] = (j["l_extendedprice"] * 100).round().astype("int64")
    g = j.groupby("l_partkey")["qty"]
    mask = 5 * j["qty"] * g.transform("count") < g.transform("sum")
    exp = round(int(j.loc[mask, "cents"].sum()) / 700.0, 2)
    assert outs["broadcast"]["avg_yearly"].iloc[0] == exp


def test_top_supplier_same_under_both_join_branches(ray_session):
    """TPC-H Q15 through both size-guard branches plus a pandas
    bruteforce of the max-with-ties semantics."""
    from cdcsdk_server_ray.pipelines.analytics import top_supplier

    outs = {}
    for plan, bound in (("broadcast", None), ("bucket", 0)):
        kw = {} if bound is None else {"broadcast_bound": bound}
        outs[plan] = top_supplier(SF_DIR, **kw)
    pd.testing.assert_frame_equal(outs["broadcast"], outs["bucket"])

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    li = li[(li["l_shipdate"] >= pd.Timestamp("1997-07-01"))
            & (li["l_shipdate"] < pd.Timestamp("1997-10-01"))].copy()
    li["rev4"] = ((li["l_extendedprice"] * 100).round().astype("int64")
                  * (100 - (li["l_discount"] * 100).round().astype("int64")))
    rev = li.groupby("l_suppkey")["rev4"].sum()
    winners = sorted(rev[rev == rev.max()].index)
    got = outs["broadcast"]
    assert got["s_suppkey"].tolist() == winners
    assert (got["total_revenue"] == rev.max() / 10000.0).all()


def test_volume_shipping_same_under_both_join_branches(ray_session):
    """TPC-H Q7 through both size-guard branches plus a pandas
    bruteforce of the both-directions nation-pair predicate."""
    from cdcsdk_server_ray.pipelines.analytics import volume_shipping

    outs = {}
    for plan, bound in (("broadcast", None), ("bucket", 0)):
        kw = {} if bound is None else {"broadcast_bound": bound}
        outs[plan] = volume_shipping(SF_DIR, **kw)
    pd.testing.assert_frame_equal(outs["broadcast"], outs["bucket"])

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    supp = pd.read_parquet(f"{SF_DIR}/supplier.parquet")
    nation = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    nk = dict(zip(nation["n_name"], nation["n_nationkey"]))
    a, b = nk["NATION_3"], nk["NATION_7"]
    li = li[(li["l_shipdate"] >= pd.Timestamp("1996-01-01"))
            & (li["l_shipdate"] < pd.Timestamp("1998-01-01"))]
    j = (li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
         .merge(cust, left_on="o_custkey", right_on="c_custkey")
         .merge(supp, left_on="l_suppkey", right_on="s_suppkey"))
    j = j[((j["s_nationkey"] == a) & (j["c_nationkey"] == b))
          | ((j["s_nationkey"] == b) & (j["c_nationkey"] == a))].copy()
    j["rev4"] = ((j["l_extendedprice"] * 100).round().astype("int64")
                 * (100 - (j["l_discount"] * 100).round().astype("int64")))
    j["l_year"] = j["l_shipdate"].dt.year.astype("int64")
    exp = (j.groupby(["s_nationkey", "c_nationkey", "l_year"])["rev4"]
           .sum().reset_index().sort_values(
               ["s_nationkey", "c_nationkey", "l_year"]))
    got = outs["broadcast"]
    assert len(got) == len(exp)
    assert np.allclose(got["revenue"].to_numpy(),
                       exp["rev4"].to_numpy("int64") / 10000.0,
                       rtol=0, atol=0)


def test_market_share_same_under_both_join_branches(ray_session):
    """TPC-H Q8 through both size-guard branches plus a pandas
    bruteforce of the conditional share-of-total ratio."""
    from cdcsdk_server_ray.pipelines.analytics import market_share

    outs = {}
    for plan, bound in (("broadcast", None), ("bucket", 0)):
        kw = {} if bound is None else {"broadcast_bound": bound}
        outs[plan] = market_share(SF_DIR, **kw)
    pd.testing.assert_frame_equal(outs["broadcast"], outs["bucket"])

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    supp = pd.read_parquet(f"{SF_DIR}/supplier.parquet")
    nation = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    reg = pd.read_parquet(f"{SF_DIR}/region.parquet")
    part = pd.read_parquet(f"{SF_DIR}/part.parquet")
    rk = set(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"])
    region_nk = set(nation.loc[nation["n_regionkey"].isin(rk),
                               "n_nationkey"])
    target = int(nation.loc[nation["n_name"] == "NATION_3",
                            "n_nationkey"].iloc[0])
    o = orders[(orders["o_orderdate"] >= pd.Timestamp("1996-01-01"))
               & (orders["o_orderdate"] < pd.Timestamp("1998-01-01"))]
    j = (li.merge(part[part["p_type"] == "ECONOMY"], left_on="l_partkey",
                  right_on="p_partkey")
         .merge(o, left_on="l_orderkey", right_on="o_orderkey")
         .merge(cust, left_on="o_custkey", right_on="c_custkey")
         .merge(supp, left_on="l_suppkey", right_on="s_suppkey"))
    j = j[j["c_nationkey"].isin(region_nk)].copy()
    j["rev4"] = ((j["l_extendedprice"] * 100).round().astype("int64")
                 * (100 - (j["l_discount"] * 100).round().astype("int64")))
    j["o_year"] = j["o_orderdate"].dt.year.astype("int64")
    j["num4"] = j["rev4"] * (j["s_nationkey"] == target).astype("int64")
    g = j.groupby("o_year").agg(num4=("num4", "sum"), den4=("rev4", "sum"))
    got = outs["broadcast"].set_index("o_year")
    for y, row in g.iterrows():
        assert got.loc[y, "mkt_share"] == round(
            int(row["num4"]) / int(row["den4"]), 6)


def test_discounted_revenue_same_under_both_join_branches(ray_session):
    """TPC-H Q19 through both size-guard branches plus a pandas
    bruteforce of the OR-of-conjunctions predicate."""
    from cdcsdk_server_ray.pipelines.analytics import (Q19_DISJUNCTS,
                                                       discounted_revenue)

    outs = {}
    for plan, bound in (("broadcast", None), ("bucket", 0)):
        kw = {} if bound is None else {"broadcast_bound": bound}
        outs[plan] = discounted_revenue(SF_DIR, **kw)
    pd.testing.assert_frame_equal(outs["broadcast"], outs["bucket"])

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    part = pd.read_parquet(f"{SF_DIR}/part.parquet")
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    mask = pd.Series(False, index=j.index)
    for b, s_lo, s_hi, q_lo, q_hi in Q19_DISJUNCTS:
        mask |= ((j["p_brand"] == b)
                 & j["p_size"].between(s_lo, s_hi)
                 & j["l_quantity"].between(q_lo, q_hi))
    j = j[mask]
    rev4 = ((j["l_extendedprice"] * 100).round().astype("int64")
            * (100 - (j["l_discount"] * 100).round().astype("int64"))).sum()
    assert outs["broadcast"]["revenue"].iloc[0] == int(rev4) / 10000.0


def test_sole_supplier_orders_same_under_both_join_branches(ray_session):
    """Q21-shaped exists/not-exists through both size-guard branches
    plus a pandas bruteforce of the sole-supplier quantifiers."""
    from cdcsdk_server_ray.pipelines.analytics import sole_supplier_orders

    outs = {}
    for plan, bound in (("broadcast", None), ("bucket", 0)):
        kw = {} if bound is None else {"broadcast_bound": bound}
        outs[plan] = sole_supplier_orders(SF_DIR, **kw)
    pd.testing.assert_frame_equal(outs["broadcast"], outs["bucket"])

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    st = (li.groupby("l_orderkey")["l_suppkey"]
          .agg(nlines="count", nsupp="nunique", the_supp="min")
          .reset_index())
    q = st[(st["nlines"] >= 2) & (st["nsupp"] == 1)]
    cnt = q.groupby("the_supp").size().reset_index(name="sole_orders")
    exp = (cnt.sort_values(["sole_orders", "the_supp"],
                           ascending=[False, True]).head(10))
    got = outs["broadcast"]
    assert got["s_suppkey"].tolist() == exp["the_supp"].tolist()
    assert got["sole_orders"].tolist() == exp["sole_orders"].tolist()


def test_triangle_counts_matches_bruteforce(ray_session):
    """Wedge/triangle counts vs a python adjacency bruteforce over the
    same simhash pair list."""
    from cdcsdk_server_ray.pipelines.dedup import (simhash_pairs,
                                                   triangle_counts)

    got = triangle_counts(SF_DIR)
    p = simhash_pairs(SF_DIR).to_pandas()
    e = set(zip(p["doc_a"], p["doc_b"]))
    adj: dict[int, list[int]] = {}
    for a, b in e:
        adj.setdefault(a, []).append(b)
    nw = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    nt = sum(1 for a, nbrs in adj.items()
             for i, x in enumerate(sorted(nbrs))
             for y in sorted(nbrs)[i + 1:] if (x, y) in e)
    assert got["n_wedges"].iloc[0] == nw
    assert got["n_triangles"].iloc[0] == nt


def test_min_cost_supplier_matches_bruteforce(ray_session):
    """Q2-shaped per-part argmin vs a pandas bruteforce."""
    from cdcsdk_server_ray.pipelines.analytics import min_cost_supplier

    got = min_cost_supplier(SF_DIR)

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])
    part = pd.read_parquet(f"{SF_DIR}/part.parquet")
    supp = pd.read_parquet(f"{SF_DIR}/supplier.parquet")
    nation = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    reg = pd.read_parquet(f"{SF_DIR}/region.parquet")
    rk = set(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"])
    nk = set(nation.loc[nation["n_regionkey"].isin(rk), "n_nationkey"])
    sel = set(part.loc[part["p_brand"] == "Brand#14", "p_partkey"])
    cand = (li[li["l_partkey"].isin(sel)].drop_duplicates()
            .merge(supp, left_on="l_suppkey", right_on="s_suppkey"))
    cand = cand[cand["s_nationkey"].isin(nk)].copy()
    cand["cents"] = (cand["s_acctbal"] * 100).round().astype("int64")
    w = (cand.sort_values(["l_partkey", "cents", "l_suppkey"])
         .groupby("l_partkey").head(1)
         .sort_values(["cents", "l_partkey"]).head(50))
    assert got["p_partkey"].tolist() == w["l_partkey"].tolist()
    assert got["s_name"].tolist() == w["s_name"].tolist()
    assert got["s_acctbal"].tolist() == (w["cents"] / 100.0).tolist()


def test_min_cost_supplier_same_under_both_join_branches(ray_session):
    """Q2-shaped argmin through both size-guard branches (keep-set
    broadcast by default, forced through the bucket semi-join with
    bound=0)."""
    from cdcsdk_server_ray.pipelines.analytics import min_cost_supplier

    a = min_cost_supplier(SF_DIR)
    b = min_cost_supplier(SF_DIR, broadcast_bound=0)
    pd.testing.assert_frame_equal(a, b)


def test_new_join_ops_degenerate_filters(ray_session):
    """Selective predicates that match NOTHING must yield well-formed
    empty/zero results, not crashes — the empty-sub-batch guard rule."""
    from cdcsdk_server_ray.pipelines.analytics import (
        discounted_revenue, market_share, min_cost_supplier,
        small_quantity_revenue, top_supplier, volume_shipping)

    r = small_quantity_revenue(SF_DIR, brand="Brand#99")
    assert r["avg_yearly"].iloc[0] == 0.0
    r = discounted_revenue(SF_DIR, disjuncts=(("Brand#99", 1, 1, 1, 1),))
    assert r["revenue"].iloc[0] == 0.0
    r = market_share(SF_DIR, part_type="NOPE")
    assert len(r) == 0 and list(r.columns) == ["o_year", "mkt_share"]
    r = volume_shipping(SF_DIR, nation_a="NATION_98",
                        nation_b="NATION_99")
    assert len(r) == 0
    r = min_cost_supplier(SF_DIR, brand="Brand#99")
    assert len(r) == 0 and list(r.columns) == ["p_partkey", "s_name",
                                               "s_acctbal"]
    r = top_supplier(SF_DIR, date_from="2030-01-01",
                     date_to="2030-02-01")
    assert len(r) == 0
    # the measured-guard broadcast branches under all-empty sides
    from cdcsdk_server_ray.pipelines.analytics import (
        large_order_quantities, local_supplier_volume, shipping_priority)
    r = local_supplier_volume(SF_DIR, region="NOWHERE")
    assert len(r) == 0
    r = shipping_priority(SF_DIR, segment="NOSEG").to_pandas()
    assert len(r) == 0
    r = large_order_quantities(SF_DIR, threshold=10**9).to_pandas()
    assert len(r) == 0


def test_forecast_revenue_matches_bruteforce(ray_session):
    """TPC-H Q6: the map-only integer partials equal a pandas
    bruteforce in exact 1e-4 units."""
    from cdcsdk_server_ray.pipelines.analytics import forecast_revenue

    out = forecast_revenue(SF_DIR)
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    disc = np.round(li["l_discount"].to_numpy() * 100).astype(np.int64)
    cents = np.round(li["l_extendedprice"].to_numpy() * 100) \
        .astype(np.int64)
    m = ((li["l_shipdate"] >= pd.Timestamp("1998-01-01"))
         & (li["l_shipdate"] < pd.Timestamp("1999-01-01"))
         & (disc >= 5) & (disc <= 7)
         & (li["l_quantity"] < 24)).to_numpy()
    want = round(int((cents[m] * disc[m]).sum()) / 10000.0, 2)
    assert out["revenue"].iloc[0] == want


def test_shipping_modes_and_late_orders_match_bruteforce(ray_session):
    """Q12/Q4 shapes: in-task conditional counts equal pandas."""
    from cdcsdk_server_ray.pipelines.analytics import (late_orders,
                                                       shipping_modes)

    sm = shipping_modes(SF_DIR).to_pandas().sort_values(
        "l_linestatus").reset_index(drop=True)
    # both size-guard branches agree (orders priority-bit broadcast vs
    # the orderkey bucket join)
    smb = shipping_modes(SF_DIR, broadcast_bound=0).to_pandas() \
        .sort_values("l_linestatus").reset_index(drop=True)
    pd.testing.assert_frame_equal(sm, smb, check_dtype=False)
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    j = li[(li["l_shipdate"] >= pd.Timestamp("1998-01-01"))
           & (li["l_shipdate"] < pd.Timestamp("1999-01-01"))].merge(
        orders, left_on="l_orderkey", right_on="o_orderkey")
    high = j["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
    want = (pd.DataFrame({"l_linestatus": j["l_linestatus"],
                          "high": high.astype(np.int64),
                          "low": (~high).astype(np.int64)})
            .groupby("l_linestatus").sum().reset_index()
            .sort_values("l_linestatus").reset_index(drop=True))
    assert (sm["high_line_count"].to_numpy()
            == want["high"].to_numpy()).all()
    assert (sm["low_line_count"].to_numpy()
            == want["low"].to_numpy()).all()

    lo = late_orders(SF_DIR)
    if hasattr(lo, "to_pandas"):
        lo = lo.to_pandas()
    # both size-guard branches agree (quarter keyset broadcast vs the
    # full orderkey bucket join)
    lob = late_orders(SF_DIR, broadcast_bound=0)
    if hasattr(lob, "to_pandas"):
        lob = lob.to_pandas()
    pd.testing.assert_frame_equal(
        lo.reset_index(drop=True), lob.reset_index(drop=True),
        check_dtype=False)
    o = orders[(orders["o_orderdate"] >= pd.Timestamp("1997-01-01"))
               & (orders["o_orderdate"] < pd.Timestamp("1997-04-01"))]
    j2 = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    late = j2[j2["l_shipdate"]
              > j2["o_orderdate"] + pd.Timedelta(days=90)]
    want2 = (late.drop_duplicates("o_orderkey")
             .groupby("o_orderpriority").size())
    got = dict(zip(lo["o_orderpriority"], lo["order_count"]))
    assert got == want2.to_dict()


def test_product_profit_same_under_both_part_branches(ray_session):
    """Q9 shape through the part size guard: broadcast lookup and the
    forced partkey bucket join return identical (nation, year, profit)
    rows."""
    from cdcsdk_server_ray.pipelines.analytics import product_profit

    outs = {}
    for plan, bound in (("broadcast", None), ("bucket", 0)):
        kw = {} if bound is None else {"broadcast_bound": bound}
        outs[plan] = product_profit(SF_DIR, **kw).reset_index(drop=True)
    assert len(outs["broadcast"]) > 0
    pd.testing.assert_frame_equal(outs["broadcast"], outs["bucket"])


def test_dominant_suppliers_same_under_both_branches(ray_session):
    """Q20 shape: keep-set broadcast vs bucket semi-join parity, and the
    two-level in-task aggregate matches a pandas bruteforce."""
    from cdcsdk_server_ray.pipelines.analytics import dominant_suppliers

    outs = {}
    for plan, bound in (("broadcast", None), ("bucket", 0)):
        kw = {} if bound is None else {"broadcast_bound": bound}
        outs[plan] = dominant_suppliers(SF_DIR, **kw) \
            .reset_index(drop=True)
    pd.testing.assert_frame_equal(outs["broadcast"], outs["bucket"])

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    part = pd.read_parquet(f"{SF_DIR}/part.parquet")
    keys = set(part.loc[part["p_name"].str.startswith("red "),
                        "p_partkey"])
    m = (li["l_partkey"].isin(keys)
         & (li["l_shipdate"] >= pd.Timestamp("1998-01-01"))
         & (li["l_shipdate"] < pd.Timestamp("1999-01-01")))
    sq = (li[m].assign(qty=li.loc[m, "l_quantity"].astype(np.int64))
          .groupby(["l_partkey", "l_suppkey"])["qty"].sum()
          .reset_index())
    tot = sq.groupby("l_partkey")["qty"].transform("sum")
    dom = sq[2 * sq["qty"] > tot]
    want = dom.groupby("l_suppkey").size().to_dict()
    got = dict(zip(outs["broadcast"]["s_suppkey"],
                   outs["broadcast"]["n_dominated"]))
    assert got == want


def test_important_parts_fraction_filter_exact(ray_session):
    """Q11 shape: the ppm HAVING filter over the materialized per-part
    totals matches pandas, including the exact-integer threshold."""
    from cdcsdk_server_ray.pipelines.analytics import important_parts

    out = important_parts(SF_DIR)
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    supp = pd.read_parquet(f"{SF_DIR}/supplier.parquet")
    keys = set(supp.loc[supp["s_nationkey"] == 3, "s_suppkey"])
    sub = li[li["l_suppkey"].isin(keys)].copy()
    sub["cents"] = np.round(sub["l_extendedprice"].to_numpy()
                            * 100).astype(np.int64)
    v = sub.groupby("l_partkey")["cents"].sum()
    total = int(v.sum())
    want = v[1_000_000 * v > 1000 * total].sort_values(ascending=False)
    assert len(out) == len(want)
    assert (out["value"].to_numpy()
            == (want.to_numpy() / 100.0)).all()


def test_supplier_part_types_matches_bruteforce(ray_session):
    """Q16 shape: grouped exact COUNT DISTINCT with the NOT-IN
    blacklist equals pandas, and both part-join branches agree."""
    from cdcsdk_server_ray.pipelines.analytics import supplier_part_types

    outs = {}
    for plan, bound in (("broadcast", None), ("bucket", 0)):
        kw = {} if bound is None else {"broadcast_bound": bound}
        outs[plan] = supplier_part_types(SF_DIR, **kw) \
            .reset_index(drop=True)
    pd.testing.assert_frame_equal(outs["broadcast"], outs["bucket"])

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])
    part = pd.read_parquet(f"{SF_DIR}/part.parquet")
    supp = pd.read_parquet(f"{SF_DIR}/supplier.parquet")
    bad = set(supp.loc[supp["s_acctbal"] < 0, "s_suppkey"])
    j = li[~li["l_suppkey"].isin(bad)].merge(
        part, left_on="l_partkey", right_on="p_partkey")
    j = j[(j["p_brand"] != "Brand#14")
          & ~j["p_type"].str.startswith("PROMO")
          & j["p_size"].isin({1, 4, 9, 14, 19, 24, 29, 34})]
    want = (j.groupby(["p_brand", "p_type", "p_size"])["l_suppkey"]
            .nunique().reset_index(name="supplier_cnt"))
    got = outs["broadcast"]
    assert len(got) == len(want)
    m = got.merge(want, on=["p_brand", "p_type", "p_size"])
    assert (m["supplier_cnt_x"] == m["supplier_cnt_y"]).all()


def test_label_centroids_exact_integer_mean(ray_session):
    """Vector grouped aggregate: the micro-unit integer path equals a
    numpy bruteforce bit-for-bit (same floor + same IEEE division)."""
    from cdcsdk_server_ray.pipelines.similarity import label_centroids

    out = label_centroids(SF_DIR)
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                          columns=["label", "embedding"])
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    micro = np.floor(m * 1e6).astype(np.int64)
    for lab in sorted(emb["label"].unique()):
        rows = micro[(emb["label"] == lab).to_numpy()]
        want = rows.sum(axis=0) / (len(rows) * 1e6)
        got = out.loc[out["label"] == lab].sort_values("dim")[
            "centroid"].to_numpy()
        assert (got == want).all()


def test_large_orders_same_under_both_joinback_branches(ray_session):
    """Q18's join-back size guard: the measured-count broadcast path
    and the forced bucket join return identical top-k rows."""
    from cdcsdk_server_ray.pipelines.analytics import \
        large_order_quantities

    outs = {}
    for plan, bound in (("broadcast", None), ("bucket", 0)):
        kw = {} if bound is None else {"broadcast_bound": bound}
        outs[plan] = large_order_quantities(SF_DIR, threshold=100, **kw) \
            .to_pandas().reset_index(drop=True)
    assert len(outs["broadcast"]) > 0
    pd.testing.assert_frame_equal(outs["broadcast"], outs["bucket"],
                                  check_dtype=False)


def test_reorder_gaps_matches_pandas_lag(ray_session):
    """The self-gap kernel equals a pandas groupby-shift bruteforce."""
    from cdcsdk_server_ray.pipelines.analytics import reorder_gaps

    out = reorder_gaps(SF_DIR)
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    o = orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    prev = o.groupby("o_custkey")["o_orderdate"].shift()
    gap = (o["o_orderdate"] - prev).dt.days
    j = o.assign(gap=gap).dropna(subset=["gap"]).merge(
        cust, left_on="o_custkey", right_on="c_custkey")
    want = (j.groupby("c_mktsegment")["gap"]
            .agg(n_gaps="count", s="sum").reset_index()
            .sort_values("c_mktsegment").reset_index(drop=True))
    assert list(out["c_mktsegment"]) == list(want["c_mktsegment"])
    assert (out["n_gaps"].to_numpy()
            == want["n_gaps"].to_numpy()).all()
    assert np.allclose(out["avg_gap_days"],
                       want["s"].to_numpy() / want["n_gaps"].to_numpy())


def test_knn_pq_codes_and_recall(ray_session, tmp_path):
    """PQ: codes equal a numpy re-derivation from the published
    codebook, and ADC top-10 recalls a sane fraction of the exact
    cosine top-10 (PQ with 4x16 codes is coarse but not random)."""
    from cdcsdk_server_ray.pipelines.similarity import (knn_bruteforce,
                                                        knn_pq)

    params = str(tmp_path / "books.parquet")
    out = knn_pq(SF_DIR, params_out=params).to_pandas()
    assert set(out.columns) == {"query_id", "vec_id", "adc"}
    assert (out.groupby("query_id").size() == 10).all()
    assert (out["adc"] >= 0).all()

    # ADC ordering is non-decreasing within each query
    for _, g in out.groupby("query_id"):
        assert (np.diff(g["adc"].to_numpy()) >= -1e-12).all()

    bf = knn_bruteforce(SF_DIR).to_pandas()
    recalls = []
    for q in out["query_id"].unique():
        got = set(out.loc[out["query_id"] == q, "vec_id"])
        want = set(bf.loc[bf["query_id"] == q, "vec_id"])
        recalls.append(len(got & want) / max(1, len(want)))
    assert sum(recalls) / len(recalls) > 0.2, recalls


def test_emb_decontaminate_matches_bruteforce(ray_session):
    """Flagged set equals a numpy bruteforce of max-cos vs the
    benchmark block, including the argmax tie rule."""
    from cdcsdk_server_ray.pipelines.similarity import emb_decontaminate

    out = emb_decontaminate(SF_DIR)
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy()
    bmask = ids < 20
    cos = m[~bmask] @ m[bmask].T
    best = np.argmax(cos, axis=1)
    bc = cos[np.arange(len(best)), best]
    flag = bc > 0.35
    want_ids = ids[~bmask][flag]
    assert sorted(out["vec_id"]) == sorted(want_ids)
    got = out.set_index("vec_id")
    for vid, b, c in zip(want_ids, ids[bmask][best[flag]], bc[flag]):
        assert got.loc[vid, "bench_id"] == b
        assert got.loc[vid, "cos"] == round(c, 6)


def test_orders_side_guard_branches_agree_q5_q7_q8(ray_session):
    """The measured orders-side broadcast branch and the forced bucket
    join return identical results for Q5/Q7/Q8."""
    from cdcsdk_server_ray.pipelines.analytics import (local_supplier_volume,
                                                       market_share,
                                                       volume_shipping)

    for fn in (local_supplier_volume, volume_shipping, market_share):
        a = fn(SF_DIR)
        b = fn(SF_DIR, broadcast_bound=0)
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True),
            check_dtype=False)
