"""Deterministic CDC changelog synthesis — a pure function of (seed, lsn).

Reference analogue: the deterministic test source
``SimpleSourceConnector`` (/root/reference/cdcsdk-engine/src/main/java/io/debezium/connector/simple/SimpleSourceConnector.java:107-215),
which emits records as a pure function of configuration and resumes past a
stored offset by regenerating and skipping (``:143-157``). We keep that
property — ``lsn → event`` is a pure function — because it is what makes
replay-from-any-checkpoint provably convergent (the engine's exactly-once
story, SURVEY.md §7.5).

LSN layout (rounds): key ``k ∈ [0, num_keys)`` emits its round-``r`` event
at ``lsn = r * num_keys + k + 1``. A key with ``n_k`` total versions is
silent for rounds ``>= n_k`` (LSN gaps are fine; a real WAL's LSNs are not
dense either). Op sequence per key, all derived from splitmix64 hashes:

- round 0: INSERT (``op='c'``)
- a fraction of keys get a mid-life DELETE followed by a re-INSERT
- a fraction of keys end with a DELETE (``op='d'``, null payload)
- everything else: UPDATE (``op='u'``) with fresh commit/content

The payload matches BASELINE.json's input_hint table:
``(repo: string, path: string, commit: string, lang: string, content: string)``
keyed by ``(repo, path)``. Schema evolution (FIXTURES.md F6): events past
``stars_add_lsn`` carry an extra ``stars: int64`` column; past
``stars_widen_lsn`` it is emitted as float64.

Everything here is vectorized numpy/pyarrow — no per-row Python.
"""

from __future__ import annotations

import binascii

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cdcsdk_server_ray.config import SynthConfig

_U64 = np.uint64
_GOLDEN = _U64(0x9E3779B97F4A7C15)
_MIX1 = _U64(0xBF58476D1CE4E5B9)
_MIX2 = _U64(0x94D049BB133111EB)

LANGS = np.array(["py", "java", "go", "rs", "c", "cpp", "js", "md"])

# Deterministic vocabulary of "code lines" used to compose file contents.
_VOCAB_WORDS = (
    "def class return import self value batch table row key hash merge "
    "window stream commit offset partition lsn apply fence stage write "
    "read schema column arrow block actor shuffle sort group filter map "
    "index buffer flush roll sink source event delta lake manifest epoch"
).split()


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array (wrapping mul)."""
    with np.errstate(over="ignore"):
        z = x + _GOLDEN
        z = (z ^ (z >> _U64(30))) * _MIX1
        z = (z ^ (z >> _U64(27))) * _MIX2
        return z ^ (z >> _U64(31))


def _h(seed: int, *streams: int | np.ndarray) -> np.ndarray:
    """Hash (seed, stream...) → uint64 array; each arg folds in via splitmix."""
    acc = _splitmix64(np.asarray(_U64(seed & 0xFFFFFFFFFFFFFFFF)))
    for s in streams:
        arr = np.asarray(s, dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            acc = _splitmix64(acc ^ (arr + _GOLDEN))
    return acc


def _build_vocab(seed: int, size: int = 512) -> np.ndarray:
    """Deterministic pool of pseudo-code lines (~32 B each)."""
    idx = np.arange(size, dtype=np.int64)
    words = np.array(_VOCAB_WORDS)
    w = [words[(_h(seed, 7, idx * 5 + j) % _U64(len(words))).astype(np.int64)] for j in range(4)]
    lines = np.char.add(np.char.add(np.char.add(np.char.add(np.char.add(
        w[0], "_"), w[1]), " = "), w[2]), np.char.add("(", np.char.add(w[3], ")")))
    return lines.astype(object)


_VOCAB_CACHE: dict[int, pa.Array] = {}


def _vocab(seed: int) -> pa.Array:
    if seed not in _VOCAB_CACHE:
        _VOCAB_CACHE[seed] = pa.array(_build_vocab(seed), type=pa.string())
    return _VOCAB_CACHE[seed]


_COMBO_CACHE: dict[tuple[int, int, int], pa.Array] = {}


def _combo_vocab(seed: int, lmin: int, lmax: int) -> pa.Array:
    """All possible content values, precomputed once per worker.

    content(k, r) joins lines at CONSECUTIVE ring positions
    ``(base + j) % V`` for j < L — i.e. it is fully determined by
    ``(base % V, L)``: V × span distinct strings (~10 MB at the fat
    profile). Materializing them once turns per-batch content synthesis
    into a single ``take`` that allocates the final column directly —
    the previous per-line plan (two np.repeat index builds + a 20×-row
    vocab take + binary_join) was 86% of synthesis CPU and faulted
    ~2.5× the content bytes in intermediates (the fat-payload scaling
    numerator, BASELINE.md). Index layout: ``start * span + (L - lmin)``,
    with one trailing empty-string slot for L = 0 (delete rows).
    """
    key = (seed, lmin, lmax)
    if key not in _COMBO_CACHE:
        lines = _build_vocab(seed).tolist()
        ring = lines + lines[:lmax]
        span = lmax - lmin + 1
        combos = ["\n".join(ring[b:b + (lmin + s)])
                  for b in range(len(lines)) for s in range(span)]
        combos.append("")                        # L = 0 (deletes)
        _COMBO_CACHE[key] = pa.array(combos, type=pa.string())
    return _COMBO_CACHE[key]


def _hex40(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> pa.Array:
    """40-char hex digests from three uint64 streams, fully vectorized.

    Rows are packed as 20 contiguous bytes → one hexlify over the whole
    buffer → reinterpreted as fixed-width S40 strings.
    """
    packed = np.empty((len(a), 20), dtype=np.uint8)
    packed[:, 0:8] = a.view(np.uint8).reshape(-1, 8)
    packed[:, 8:16] = b.view(np.uint8).reshape(-1, 8)
    packed[:, 16:20] = c.view(np.uint8).reshape(-1, 8)[:, :4]
    hexed = binascii.hexlify(packed.tobytes())
    return pa.array(np.frombuffer(hexed, dtype="S40").astype("U40"))


def _content(cfg: SynthConfig, k: np.ndarray, r: np.ndarray,
             empty_mask: np.ndarray | None = None) -> pa.Array:
    """content(k, r): join L(k,r) vocab lines chosen by counter-based hashing.

    ``empty_mask`` rows generate no lines (used for deletes — their content
    is nulled via a zero-copy validity bitmap instead of a copying if_else).
    """
    span = cfg.content_lines_max - cfg.content_lines_min + 1
    n_lines = (cfg.content_lines_min
               + (_h(cfg.seed, 11, k * 131 + r) % _U64(span)).astype(np.int64))
    combos = _combo_vocab(cfg.seed, cfg.content_lines_min,
                          cfg.content_lines_max)
    n_vocab = 512
    start = (_h(cfg.seed, 13, k * 1_000_003 + r) % _U64(n_vocab)).astype(np.int64)
    idx = start * span + (n_lines - cfg.content_lines_min)
    if empty_mask is not None:
        idx = np.where(empty_mask, len(combos) - 1, idx)   # "" slot
    return combos.take(pa.array(idx, type=pa.int32()))


def _key_columns(cfg: SynthConfig, k: np.ndarray) -> tuple[pa.Array, pa.Array, np.ndarray]:
    """(repo, path, lang_idx) for key indices — log-uniform repo skew.

    The Zipf-ish head (a few repos own most keys) is what makes hot-key
    salting testable (SURVEY.md §4 "Skew / stragglers").
    """
    u = (_h(cfg.seed, 17, k) % _U64(1 << 53)).astype(np.float64) / float(1 << 53)
    repo_id = np.minimum(
        (np.power(float(cfg.num_repos), u) - 1.0).astype(np.int64),
        cfg.num_repos - 1,
    )
    lang_idx = (_h(cfg.seed, 19, k) % _U64(len(LANGS))).astype(np.int64)
    # string assembly in Arrow kernels (np.char.* is a Python-level loop —
    # it was 74% of synthesis CPU)
    repo_id_s = pc.cast(pa.array(repo_id), pa.string())
    org_s = pc.cast(pa.array(repo_id % 13), pa.string())
    repo = pc.binary_join_element_wise("org", org_s, "/repo", repo_id_s, "")
    ext = pa.array(LANGS.tolist()).take(pa.array(lang_idx))
    module_s = pc.cast(pa.array(k % 37), pa.string())
    k_s = pc.cast(pa.array(k), pa.string())
    path = pc.binary_join_element_wise("src/m", module_s, "/f", k_s, ".",
                                       ext, "")
    return repo, path, lang_idx


def synth_flat_batch(cfg: SynthConfig, lsns: np.ndarray) -> pa.Table:
    """Synthesize the FLATTENED change-event batch for the given LSNs.

    Output schema (FIXTURES.md F2): lsn, tx_id, op, ts_ms, repo, path,
    commit, lang, content [, stars]. Invalid LSNs (silent rounds, lsn<1)
    are dropped.
    """
    lsns = np.asarray(lsns, dtype=np.int64)
    k = (lsns - 1) % cfg.num_keys
    r = (lsns - 1) // cfg.num_keys

    hk = _h(cfg.seed, 1, k)
    n_k = 1 + (hk % _U64(cfg.max_versions)).astype(np.int64)
    valid = (lsns >= 1) & (r >= 0) & (r < n_k)
    lsns, k, r, hk, n_k = lsns[valid], k[valid], r[valid], hk[valid], n_k[valid]

    del_key = ((_h(cfg.seed, 2, k) % _U64(cfg.delete_fraction_inv)) == 0) & (n_k >= 2)
    midlife = ((_h(cfg.seed, 3, k) % _U64(cfg.reinsert_fraction_inv)) == 0) & (n_k >= 4)
    rd = n_k // 2

    ops = np.full(len(k), "u", dtype="<U1")
    ops[r == 0] = "c"
    ops[midlife & (r == rd)] = "d"
    ops[midlife & (r == rd + 1)] = "c"
    ops[del_key & (r == n_k - 1)] = "d"
    is_del = ops == "d"

    from cdcsdk_server_ray.stages.validity import null_where

    repo, path, lang_idx = _key_columns(cfg, k)
    commit = _hex40(_h(cfg.seed, 23, k * 1_000_003 + r),
                    _h(cfg.seed, 29, k * 1_000_003 + r),
                    _h(cfg.seed, 31, k * 1_000_003 + r))
    content = _content(cfg, k, r, empty_mask=is_del)
    lang = pa.array(LANGS[lang_idx])

    # zero-copy null masking for delete payloads (no if_else data copies)
    commit = null_where(commit, is_del)
    lang = null_where(lang, is_del)
    content = null_where(content, is_del)

    cols: dict[str, pa.Array] = {
        "lsn": pa.array(lsns),
        "tx_id": pa.array(lsns // 64),
        "op": pa.array(ops),
        "ts_ms": pa.array(cfg.base_ts_ms + lsns * cfg.ts_step_ms,
                          type=pa.int64()).cast(pa.timestamp("ms")),
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": content,
    }

    # no len() guard: an EMPTY batch must still carry the stars column
    # (int64, the pre-widen type) or its block's schema diverges from
    # every non-empty block and Arrow/Ray concat fails
    if cfg.stars_add_lsn:
        stars_v = (_h(cfg.seed, 37, k * 131 + r) % _U64(10_000)).astype(np.int64)
        has = lsns >= cfg.stars_add_lsn
        if cfg.stars_widen_lsn and (lsns >= cfg.stars_widen_lsn).any():
            # value is a per-event pure function (fractional only for
            # post-widen events); only the batch TYPE evolves
            vals = np.where(lsns >= cfg.stars_widen_lsn,
                            stars_v.astype(np.float64) / 100.0,
                            stars_v.astype(np.float64))
            stars = pc.if_else(pa.array(has & ~is_del), pa.array(vals),
                               pa.scalar(None, pa.float64()))
        else:
            stars = pc.if_else(pa.array(has & ~is_del), pa.array(stars_v),
                               pa.scalar(None, pa.int64()))
        cols["stars"] = stars

    return pa.table(cols)


def synth_envelope_batch(cfg: SynthConfig, lsns: np.ndarray, yb_wrap: bool = False) -> pa.Table:
    """Synthesize the ENVELOPED form (Debezium envelope, FIXTURES.md F2).

    Columns: key struct<repo,path>, before (null struct), after
    struct<commit,lang,content>, source struct<lsn,tx_id,table,connector>,
    op, ts_ms. With ``yb_wrap`` each after-cell is wrapped as
    struct<value> — the YugabyteDB column wrapper the ``unwrap`` SMT
    removes (/root/reference/cdcsdk-server/cdcsdk-server-core/src/main/java/com/yugabyte/cdcsdk/server/ServerApp.java:173-177).
    """
    flat = synth_flat_batch(cfg, lsns)
    n = flat.num_rows
    key = pa.StructArray.from_arrays(
        [flat["repo"].combine_chunks(), flat["path"].combine_chunks()],
        ["repo", "path"])
    payload_names = [c for c in ("commit", "lang", "content", "stars") if c in flat.column_names]
    children = [flat[c].combine_chunks() for c in payload_names]
    if yb_wrap:
        children = [
            pa.StructArray.from_arrays([c], ["value"], mask=pc.is_null(c))
            for c in children
        ]
    is_del = pc.equal(flat["op"], "d").combine_chunks()
    after = pa.StructArray.from_arrays(children, payload_names, mask=is_del)
    before = pa.nulls(n, type=after.type)
    source = pa.StructArray.from_arrays(
        [flat["lsn"].combine_chunks(), flat["tx_id"].combine_chunks(),
         pa.nulls(n, pa.string()).fill_null("source_code"),
         pa.nulls(n, pa.string()).fill_null("cdcsdk-ray")],
        ["lsn", "tx_id", "table", "connector"])
    return pa.table({
        "key": key, "before": before, "after": after, "source": source,
        "op": flat["op"], "ts_ms": flat["ts_ms"],
    })


def changelog_range_source(cfg: SynthConfig, lo: int, hi: int, *,
                           batch_size: int = 32_768):
    """The bare LSN-range source Dataset (column ``id``; add ``lo`` for
    the lsn) with the pinned block geometry both the unfused changelog
    pipeline and the engine's fused spill path share.

    Block count pinned to min(batch geometry, 2×CPUs): the default range
    sizing emits ~65 tiny id blocks per 250k-LSN window that the gen
    stage re-bundles to ~8 tasks anyway — 7× the scheduling events for
    nothing, a measurable driver-loop tax in the pipelined small-window
    tail regime. The CPU cap matters on BIG windows: one block per
    batch_size there would mean 440 gen tasks × P spill files for a
    14M-LSN window (measured a 27% regression on the 32-CPU
    single-window leg vs ~64 CPU-sized blocks whose gen splits batches
    internally). GRAFT_SYNTH_BLOCKS pins the plan regardless of CPU
    count — the two-parallelism scaling protocol needs the IDENTICAL job
    at both sizes (a CPU-derived cap gives the small leg a cheaper plan
    and the comparison stops measuring parallelism)."""
    import os as _os

    import ray
    import ray.data

    want = max(1, (hi - lo + batch_size - 1) // batch_size)
    cap = max(1, int(2 * (ray.cluster_resources().get("CPU") or 8)))
    pinned = _os.environ.get("GRAFT_SYNTH_BLOCKS")
    blocks = int(pinned) if pinned else min(want, cap)
    return ray.data.range(hi - lo, override_num_blocks=blocks)


def changelog_dataset(cfg: SynthConfig, lo: int, hi: int, *,
                      mode: str = "flat", yb_wrap: bool = False,
                      batch_size: int = 32_768):
    """A lazy ``ray.data.Dataset`` of change events for lsn ∈ [lo, hi).

    Built as ``ray.data.range`` → ``map_batches`` so synthesis itself is
    distributed and streaming (no driver-side materialization); at
    10^10-event scale the LSN axis is the only thing that exists up front.
    """
    ds = changelog_range_source(cfg, lo, hi, batch_size=batch_size)

    def gen(batch: pa.Table) -> pa.Table:
        from cdcsdk_server_ray.memtune import tune_process_memory
        tune_process_memory()
        lsns = batch["id"].to_numpy() + lo
        if mode == "envelope":
            return synth_envelope_batch(cfg, lsns, yb_wrap=yb_wrap)
        return synth_flat_batch(cfg, lsns)

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=batch_size)


def expected_final_state(cfg: SynthConfig, upto_lsn: int | None = None,
                         keys: np.ndarray | None = None) -> pa.Table:
    """Driver-side oracle: the exact final table after replaying all events
    with per-key last-write-wins and delete-removes semantics.

    Test/verification use only (small scale) — computes every key's last
    valid round directly from the generation rules, then synthesizes just
    those winning events. ``keys`` restricts the oracle to a key subset —
    the spot-check path for lakes too large to materialize the full
    oracle on the driver (the 10^9-event demonstration run).
    """
    hi = upto_lsn if upto_lsn is not None else cfg.max_lsn
    k = (np.asarray(keys, dtype=np.int64) if keys is not None
         else np.arange(cfg.num_keys, dtype=np.int64))
    hk = _h(cfg.seed, 1, k)
    n_k = 1 + (hk % _U64(cfg.max_versions)).astype(np.int64)
    # last round emitted before `hi`: lsn(k, r) = r*K + k + 1 < hi
    max_r = (hi - 2 - k) // cfg.num_keys  # floor((hi-1 - (k+1)) / K)
    last_r = np.minimum(n_k - 1, max_r)
    alive = last_r >= 0
    k, last_r, n_k = k[alive], last_r[alive], n_k[alive]
    del_key = ((_h(cfg.seed, 2, k) % _U64(cfg.delete_fraction_inv)) == 0) & (n_k >= 2)
    midlife = ((_h(cfg.seed, 3, k) % _U64(cfg.reinsert_fraction_inv)) == 0) & (n_k >= 4)
    is_del = (del_key & (last_r == n_k - 1)) | (midlife & (last_r == n_k // 2))
    k, last_r = k[~is_del], last_r[~is_del]
    lsns = last_r * cfg.num_keys + k + 1
    t = synth_flat_batch(cfg, lsns)
    return t.sort_by([("repo", "ascending"), ("path", "ascending")])


def synth_view_deltas(cfg: SynthConfig, lsns: np.ndarray) -> pa.Table:
    """Per-lang materialized-view DELTAS for the given LSNs —
    ``f(after) − f(before)`` per event with before-images derived from
    the generator's pure functions (the REPLICA-IDENTITY-FULL shape):
    creates add a row and their bytes, updates add the byte diff
    between version r and r−1, deletes subtract the deleted image.
    A midlife delete/reinsert pair (see :func:`synth_flat_batch`) makes
    the reinsert a 'c' with NO before — handled exactly. Returns one
    (lang, d_rows, d_bytes) row per lang present; all integer."""
    import pandas as pd
    import pyarrow.compute as pc

    lsns = np.asarray(lsns, dtype=np.int64)
    k = (lsns - 1) % cfg.num_keys
    r = (lsns - 1) // cfg.num_keys
    hk = _h(cfg.seed, 1, k)
    n_k = 1 + (hk % _U64(cfg.max_versions)).astype(np.int64)
    valid = (lsns >= 1) & (r >= 0) & (r < n_k)
    k, r, n_k = k[valid], r[valid], n_k[valid]
    if not len(k):
        return pa.table({"lang": pa.array([], pa.string()),
                         "d_rows": pa.array([], pa.int64()),
                         "d_bytes": pa.array([], pa.int64())})

    del_key = ((_h(cfg.seed, 2, k) % _U64(cfg.delete_fraction_inv)) == 0) \
        & (n_k >= 2)
    midlife = ((_h(cfg.seed, 3, k) % _U64(cfg.reinsert_fraction_inv)) == 0) \
        & (n_k >= 4)
    rd = n_k // 2

    is_del = (midlife & (r == rd)) | (del_key & (r == n_k - 1))
    # n_k == 4 midlife+delete keys: the reinsert slot (rd+1) IS the
    # final-delete slot (n_k-1), and synth_flat_batch's op assignment
    # order makes the delete win — so that event deletes an ABSENT row
    # (the midlife delete already removed it): a no-op for the view
    noop_del = del_key & midlife & (r == n_k - 1) & (rd + 1 == n_k - 1)
    is_create = (r == 0) | (midlife & (r == rd + 1) & ~is_del)
    has_before = ~is_create & ~noop_del

    after_len = pc.utf8_length(
        _content(cfg, k, r, empty_mask=is_del)).to_numpy(
        zero_copy_only=False).astype(np.int64)
    before_len = pc.utf8_length(
        _content(cfg, k, np.maximum(r - 1, 0),
                 empty_mask=~has_before)).to_numpy(
        zero_copy_only=False).astype(np.int64)

    d_rows = is_create.astype(np.int64) \
        - (is_del & ~noop_del).astype(np.int64)
    d_bytes = after_len - before_len

    _, _, lang_idx = _key_columns(cfg, k)
    g = (pd.DataFrame({"lang": LANGS[lang_idx], "d_rows": d_rows,
                       "d_bytes": d_bytes})
         .groupby("lang", sort=True).sum().reset_index())
    return pa.table({
        "lang": pa.array(g["lang"].to_numpy(object), pa.string()),
        "d_rows": pa.array(g["d_rows"].to_numpy(np.int64)),
        "d_bytes": pa.array(g["d_bytes"].to_numpy(np.int64))})
