"""Multimodal column plumbing: opaque binary payloads + typed metadata.

IMAGE DECODE IS REAL: PNG needs only stdlib zlib+struct, so
``synth_png_table`` writes genuine RGB PNGs (chunk CRCs, per-row scanline
filters) and ``PngDecoder`` actually parses, CRC-verifies, decompresses
and unfilters them — dimensions and pixel statistics are exact-oracle-checked against
the closed-form pattern the pixels were generated from. Audio/video
probing (frame sampling) remains a declared deterministic stand-in.
Everything around the codecs — binary Arrow columns, small-batch
actor-pool stages, schema of the output, byte accounting — is what
matters for the 100 TB path (payload bytes stay in Arrow buffers end to
end; batch_size is small because rows are MBs, not KBs).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def synth_media_table(sf_dir: str):
    """Derive an image-shaped table from documents: payload = utf-8 bytes
    of the text (an opaque blob to the pipeline), plus declared media
    metadata. Stands in for read_binary_files(include_paths=True)."""
    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "source"])

    def to_media(t: pa.Table) -> pa.Table:
        payload = pc.cast(t["text"], pa.binary())
        size = pc.cast(pc.binary_length(payload), pa.int64())
        return pa.table({
            "media_id": t["doc_id"],
            "uri": pc.binary_join_element_wise(
                pa.array(["s3://corpus"] * t.num_rows), t["source"],
                pc.cast(t["doc_id"], pa.string()), "/"),
            "media_type": pa.array(["image/fake"] * t.num_rows),
            "payload": payload,
            "payload_bytes": size,
        })

    return docs.map_batches(to_media, batch_format="pyarrow")


class FakeImageDecoder:
    """Actor-pool decode stage. STUB: a real deployment replaces
    ``_decode`` with PIL/libvips/ffmpeg loaded in ``__init__``; here it
    derives deterministic pseudo-dimensions + a feature vector from the
    payload bytes so the pipeline shape (small batches, per-actor state,
    fixed output schema) is fully exercised without codecs."""

    OUTPUT_SCHEMA = pa.schema([
        ("media_id", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_channels", pa.int32()),
        ("feature", pa.list_(pa.float32(), 8)),
    ])

    def __init__(self):
        # real decoders load libraries/models here, once per actor
        self.dim = 8

    def _decode(self, payload: bytes):
        raise NotImplementedError("no image codecs in this container")

    def _fake_decode(self, payload: bytes):
        b = np.frombuffer(payload, dtype=np.uint8)
        w = 64 + int(b[:16].sum()) % 1984 if b.size else 64
        h = 64 + int(b[16:32].sum()) % 1016 if b.size > 16 else 64
        hist = np.bincount(b % self.dim, minlength=self.dim).astype(np.float32)
        feat = hist / max(1.0, hist.sum())
        return w, h, 3, feat

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {"media_id": [], "width": [], "height": [],
                "n_channels": [], "feature": []}
        payloads = t["payload"].to_pylist()
        for mid, payload in zip(t["media_id"].to_pylist(), payloads):
            w, h, c, feat = self._fake_decode(payload or b"")
            rows["media_id"].append(mid)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["n_channels"].append(c)
            rows["feature"].append(feat)
        return pa.Table.from_pydict(rows, schema=self.OUTPUT_SCHEMA)


def decode_media(sf_dir: str):
    """media table → decoded metadata/features via an actor pool with
    SMALL batches (payload rows are large: batch_size trades heap for
    throughput — the Roller-threshold analogue for fat rows)."""
    media = synth_media_table(sf_dir)
    return media.map_batches(FakeImageDecoder, batch_format="pyarrow",
                             batch_size=64, concurrency=(1, 8)).sort("media_id")


class FakeResizer:
    """Actor-pool resize stage. STUB decode (no codecs in container): a
    real deployment decodes the payload and resizes with PIL/libvips in
    ``__call__`` using state built once in ``__init__``; here the output
    dims/bytes derive deterministically from the input dims so the
    plumbing (fixed target geometry per actor, small batches, byte
    accounting for the resized payloads) is real and testable."""

    def __init__(self, target_w: int = 256, target_h: int = 256):
        self.tw, self.th = target_w, target_h   # per-actor state, once

    def __call__(self, t: pa.Table) -> pa.Table:
        w = t["width"].to_numpy()
        h = t["height"].to_numpy()
        # aspect-preserving fit into (tw, th), like a thumbnailer
        scale = np.minimum(self.tw / w, self.th / h)
        out_w = np.maximum(1, np.floor(w * scale)).astype(np.int32)
        out_h = np.maximum(1, np.floor(h * scale)).astype(np.int32)
        est = (out_w.astype(np.int64) * out_h.astype(np.int64) * 3)
        return pa.table({
            "media_id": t["media_id"],
            "width": pa.array(out_w),
            "height": pa.array(out_h),
            "est_bytes": pa.array(est),
        })


def resize_media(sf_dir: str, target_w: int = 256, target_h: int = 256):
    """decode → resize as chained actor-pool stages (decode's output
    feeds the resizer without leaving Arrow)."""
    decoded = decode_media(sf_dir)
    return decoded.map_batches(
        FakeResizer, fn_constructor_kwargs={"target_w": target_w,
                                            "target_h": target_h},
        batch_format="pyarrow", batch_size=256,
        # min 1 actor: chained pools with min 2 each can reserve every
        # CPU of a small session and starve the upstream read tasks
        concurrency=(1, 8)).sort("media_id")


class FakeFrameSampler:
    """Video frame sampling as a 1→N actor stage: each payload expands to
    ``fps_out``-spaced frame records (a flat_map realized inside
    map_batches — one output table with repeated media_id). STUB decode:
    frame count/timestamps derive deterministically from payload bytes;
    a real deployment probes the container (ffprobe) in ``__call__``."""

    def __init__(self, max_frames: int = 4):
        self.max_frames = max_frames

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["media_id"].to_numpy()
        nbytes = t["payload_bytes"].to_numpy()
        # fake duration: 1 "second" per 100 payload bytes, ≥1 frame
        n_frames = np.minimum(self.max_frames,
                              np.maximum(1, nbytes // 100)).astype(np.int64)
        rep_ids = np.repeat(ids, n_frames)
        frame_idx = np.concatenate([np.arange(n, dtype=np.int64)
                                    for n in n_frames]) if len(ids) else \
            np.array([], dtype=np.int64)
        ts_ms = frame_idx * 1000
        return pa.table({
            "media_id": pa.array(rep_ids),
            "frame_idx": pa.array(frame_idx),
            "ts_ms": pa.array(ts_ms),
        })


def sample_frames(sf_dir: str, max_frames: int = 4):
    """media table → frame records (1→N expansion), small batches because
    video rows are fat."""
    media = synth_media_table(sf_dir)
    return media.map_batches(
        FakeFrameSampler, fn_constructor_kwargs={"max_frames": max_frames},
        batch_format="pyarrow", batch_size=64,
        concurrency=(1, 8)).sort(["media_id", "frame_idx"])


def media_stats(sf_dir: str):
    """Byte accounting per media_type/source bucket — the lineage-style
    rollup for a multimodal corpus. SQL-oracle-able (bytes = length)."""
    from cdcsdk_server_ray.stages.aggregate import grouped_aggregate

    media = synth_media_table(sf_dir)
    stats = grouped_aggregate(
        media, ["media_type"],
        {"n_items": ("payload_bytes", "count"),
         "total_bytes": ("payload_bytes", "sum"),
         "max_bytes": ("payload_bytes", "max")},
    )

    def pin_types(t: pa.Table) -> pa.Table:
        # byte counters are int64 BY CONTRACT (the oracle casts its HUGEINT
        # sum to BIGINT); pinning here keeps the driver's exact value-hash
        # stable regardless of what the aggregate's finalize produced
        for c in ("n_items", "total_bytes", "max_bytes"):
            t = t.set_column(t.column_names.index(c), c,
                             pc.cast(t[c], pa.int64()))
        return t

    return stats.map_batches(pin_types, batch_format="pyarrow").sort("media_type")


class MediaPHasher:
    """Actor-pool perceptual-hash stage over OPAQUE media payloads:
    a 64-bit locality-sensitive signature from byte 4-grams (SimHash
    vote over gram hashes). A real deployment swaps the gram features
    for decoded-pixel DCT features (classic pHash) inside ``__init__``/
    ``__call__`` — the plumbing (binary column in, (media_id, simhash)
    out, per-actor state, small batches) is the real contract.
    Near-identical payloads differ in few grams → small Hamming
    distance, so the shared band machinery finds them."""

    def __init__(self):
        self.gram_mult = (np.uint64(0x100000001B3)
                          ** np.arange(4, dtype=np.uint64))

    def __call__(self, df) -> "pd.DataFrame":
        import pandas as pd
        sigs = np.empty(len(df), dtype=np.uint64)
        for i, payload in enumerate(df["payload"]):
            b = np.frombuffer(payload, dtype=np.uint8)
            if len(b) < 4:
                sigs[i] = 0
                continue
            win = np.lib.stride_tricks.sliding_window_view(b, 4) \
                .astype(np.uint64)
            with np.errstate(over="ignore"):
                h = (win * self.gram_mult).sum(axis=1)
                h = (h ^ (h >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
                h ^= h >> np.uint64(33)
                h = np.unique(h)
                bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                        & np.uint64(1)).astype(np.int64)
                vote = (2 * bits - 1).sum(axis=0)
            sigs[i] = np.packbits((vote > 0)[::-1]).view(np.uint64) \
                .byteswap()[0]
        return pd.DataFrame({"doc_id": df["media_id"].to_numpy(),
                             "simhash": sigs.view(np.int64)})


def media_phash_pairs(sf_dir: str, max_hamming: int = 3):
    """Multimodal near-duplicate detection: perceptual-hash signatures
    from the binary payload column (actor pool, small batches — rows
    are MBs at production scale) → the SAME banded-signature pair
    machinery as text SimHash (`dedup.signature_pairs`). Payload bytes
    never leave the signer; everything downstream shuffles 16-byte
    signature rows."""
    import pandas as pd  # noqa: F401  (signer returns pandas)

    from cdcsdk_server_ray.pipelines.dedup import signature_pairs

    media = synth_media_table(sf_dir)
    sigs = media.map_batches(MediaPHasher, batch_format="pandas",
                             batch_size=64, concurrency=(2, 8))
    return signature_pairs(sigs, max_hamming=max_hamming)
