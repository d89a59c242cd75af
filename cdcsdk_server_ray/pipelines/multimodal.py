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


# ---- real PNG codec (stdlib zlib + struct only) ---------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


def png_encode(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a genuine RGB PNG. Scanline
    filters rotate None/Sub/Up by row (y % 3) so the decoder's
    unfiltering is actually exercised, not just the zlib pass."""
    h, w, nch = arr.shape
    assert nch == 3 and arr.dtype == np.uint8
    lines = []
    prev = np.zeros(w * nch, np.uint8)
    for y in range(h):
        row = arr[y].reshape(-1)
        ft = y % 3
        if ft == 0:
            enc = row
        elif ft == 1:                       # Sub: delta vs left pixel
            enc = row.copy()
            enc[nch:] = row[nch:] - row[:-nch]
        else:                               # Up: delta vs row above
            enc = row - prev
        lines.append(bytes([ft]) + enc.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + _png_chunk(b"IEND", b""))


def png_decode(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode an 8-bit RGB/greyscale/RGBA PNG: chunk walk with CRC
    verification, zlib inflate, full scanline unfiltering (all five
    filter types). Returns (width, height, n_channels, (h, w, c) uint8).
    Rejects interlaced and non-8-bit images (out of scope)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat = 8, []
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(data):
        ln, typ = struct.unpack(">I4s", data[pos:pos + 8])
        chunk = data[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(typ + chunk) != crc:
            raise ValueError(f"CRC mismatch in {typ!r} chunk")
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", chunk)
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("missing IHDR")
    if depth != 8 or interlace != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, "
                         f"interlace={interlace})")
    nch = {0: 1, 2: 3, 6: 4}.get(ctype)
    if nch is None:
        raise ValueError(f"unsupported color type {ctype}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(raw, np.uint8, stride,
                            y * (stride + 1) + 1).copy()
        if ft == 0:
            pass
        elif ft == 1:                       # Sub — per-channel prefix sum
            np.add.accumulate(row.reshape(-1, nch), axis=0, out=row.reshape(-1, nch))
        elif ft == 2:                       # Up
            row += prev
        elif ft == 3:                       # Average
            for x in range(stride):
                left = int(row[x - nch]) if x >= nch else 0
                row[x] = (int(row[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ft == 4:                       # Paeth
            for x in range(stride):
                a = int(row[x - nch]) if x >= nch else 0
                b = int(prev[x])
                c = int(prev[x - nch]) if x >= nch else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else \
                    (b if pb <= pc_ else c)
                row[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad filter type {ft}")
        out[y] = row
        prev = row
    return w, h, nch, out.reshape(h, w, nch)


def _png_geometry(media_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """The deterministic image geometry the synthesizer uses — also the
    closed form the SQL oracle recomputes (w = 8 + id % 25,
    h = 8 + (id*7) % 17)."""
    w = 8 + media_id % 25
    h = 8 + (media_id * 7) % 17
    return w.astype(np.int64), h.astype(np.int64)


def synth_png_table(sf_dir: str):
    """An image table with GENUINE PNG payloads: pixels follow the
    closed-form pattern v_i = (media_id*37 + i*101) % 256 over the flat
    RGB index i, so decoded dimensions and pixel statistics are exactly
    SQL-derivable from media_id alone. Stands in for
    read_binary_files over an image bucket."""
    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source"])

    def to_png(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        ws, hs = _png_geometry(ids)
        payloads = []
        for mid, w, h in zip(ids, ws, hs):
            n = int(w) * int(h) * 3
            px = ((int(mid) * 37 + np.arange(n, dtype=np.int64) * 101)
                  % 256).astype(np.uint8).reshape(int(h), int(w), 3)
            payloads.append(png_encode(px))
        size = np.fromiter((len(p) for p in payloads), np.int64,
                           len(payloads))
        return pa.table({
            "media_id": pa.array(ids),
            "uri": pc.binary_join_element_wise(
                pa.array(["s3://corpus"] * t.num_rows), t["source"],
                pc.cast(t["doc_id"], pa.string()), "/"),
            "media_type": pa.array(["image/png"] * t.num_rows),
            "payload": pa.array(payloads, pa.binary()),
            "payload_bytes": pa.array(size),
        })

    return docs.map_batches(to_png, batch_format="pyarrow", batch_size=64)


class PngDecoder:
    """Actor-pool decode stage over REAL PNG payloads (the round-3
    FakeImageDecoder, with the stub removed): per payload it parses
    chunks, verifies CRCs, inflates and unfilters scanlines, then emits
    dimensions + exact pixel statistics (sum and an 8-bin histogram).
    A production deployment swaps ``png_decode`` for PIL/libvips loaded
    in ``__init__`` — the stage contract (binary column in, stats out,
    per-actor state, SMALL batches because rows are MBs) is unchanged.
    Reference plumbing analogue: payload exactness through the sink
    path, S3ConsumerIT.java:117-144."""

    N_BINS = 8

    OUTPUT_SCHEMA = pa.schema(
        [("media_id", pa.int64()),
         ("width", pa.int64()),
         ("height", pa.int64()),
         ("n_channels", pa.int64()),
         ("px_sum", pa.int64())]
        + [(f"h{b}", pa.int64()) for b in range(8)])

    def __init__(self):
        # real decoders load codec libraries here, once per actor
        self.bins = np.arange(0, 257, 256 // self.N_BINS)

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {k: np.empty(n, np.int64) for k in
                ("media_id", "width", "height", "n_channels", "px_sum")}
        hist = np.empty((n, self.N_BINS), np.int64)
        payload_col = t["payload"]
        if isinstance(payload_col, pa.ChunkedArray):
            payload_col = payload_col.combine_chunks()
        ids = t["media_id"].to_numpy()
        for i in range(n):
            # per-row buffer view — no whole-column to_pylist copy
            w, h, c, px = png_decode(payload_col[i].as_py())
            cols["media_id"][i] = ids[i]
            cols["width"][i] = w
            cols["height"][i] = h
            cols["n_channels"][i] = c
            flat = px.reshape(-1)
            cols["px_sum"][i] = int(flat.sum(dtype=np.int64))
            hist[i] = np.histogram(flat, bins=self.bins)[0]
        out = {k: pa.array(v) for k, v in cols.items()}
        for b in range(self.N_BINS):
            out[f"h{b}"] = pa.array(hist[:, b])
        return pa.table(out).cast(self.OUTPUT_SCHEMA)


def decode_media(sf_dir: str):
    """PNG table → decoded dimensions + pixel stats via an actor pool
    with SMALL batches (payload rows are large: batch_size trades heap
    for throughput — the Roller-threshold analogue for fat rows)."""
    media = synth_png_table(sf_dir)
    return media.map_batches(PngDecoder, batch_format="pyarrow",
                             batch_size=64, concurrency=(1, 8)).sort("media_id")


class ResizePlanner:
    """Actor-pool resize stage over REAL decoded dimensions (PngDecoder
    upstream): aspect-preserving fit into the per-actor target geometry
    plus byte accounting for the resized output. A production deployment
    additionally rewrites pixels (PIL/libvips in ``__call__``); the
    geometry/accounting math here is the real thing and is exact-oracle
    checked against the closed-form PNG dims."""

    def __init__(self, target_w: int = 256, target_h: int = 256):
        self.tw, self.th = target_w, target_h   # per-actor state, once

    def __call__(self, t: pa.Table) -> pa.Table:
        w = t["width"].to_numpy()
        h = t["height"].to_numpy()
        # aspect-preserving fit into (tw, th), like a thumbnailer
        scale = np.minimum(self.tw / w, self.th / h)
        out_w = np.maximum(1, np.floor(w * scale)).astype(np.int64)
        out_h = np.maximum(1, np.floor(h * scale)).astype(np.int64)
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
        ResizePlanner, fn_constructor_kwargs={"target_w": target_w,
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
    a 64-bit locality-sensitive signature — SimHash vote over the
    payload's DISTINCT byte 4-grams. A real deployment swaps the gram
    features for decoded-pixel DCT features (classic pHash) inside
    ``__init__``/``__call__`` — the plumbing (binary column in,
    (media_id, simhash) out, per-actor state, small batches) is the
    real contract. Near-identical payloads differ in few grams → small
    Hamming distance, so the shared band machinery finds them.

    Gram hash = md5 lower-64 (DuckDB's ``md5_number_lower``), the same
    oracle-reproducible convention as text SimHash — which makes the
    pair list exactly SQL-checkable at the driver's gate. Distinct
    grams are cached per actor (4-gram vocabulary repeats heavily
    across a corpus)."""

    _CACHE_CAP = 1_000_000

    def __init__(self):
        self._cache: dict[bytes, int] = {}

    def _hash_grams(self, grams: list[bytes]) -> np.ndarray:
        import hashlib
        c = self._cache
        if len(c) > self._CACHE_CAP:
            c.clear()
        out = np.empty(len(grams), dtype=np.uint64)
        for i, g in enumerate(grams):
            h = c.get(g)
            if h is None:
                h = int.from_bytes(hashlib.md5(g).digest()[8:], "little")
                c[g] = h
            out[i] = h
        return out

    def __call__(self, df) -> "pd.DataFrame":
        import pandas as pd
        sigs = np.empty(len(df), dtype=np.uint64)
        for i, payload in enumerate(df["payload"]):
            if len(payload) < 4:
                sigs[i] = 0
                continue
            grams = list({payload[j:j + 4]
                          for j in range(len(payload) - 3)})
            hs = self._hash_grams(grams)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
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
