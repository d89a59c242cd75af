"""Run configuration for the CDC engine.

Reference analogue: ServerApp's env/property munging
(/root/reference/cdcsdk-server/cdcsdk-server-core/src/main/java/com/yugabyte/cdcsdk/server/ServerApp.java:237-253)
collapsed into a plain dataclass — no reflection, no prefix rewriting.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class SynthConfig:
    """Deterministic changelog synthesis parameters.

    Event generation is a pure function of (seed, lsn) — the property the
    reference's deterministic test source has
    (/root/reference/cdcsdk-engine/src/main/java/io/debezium/connector/simple/SimpleSourceConnector.java:143-175)
    and that makes replay-from-checkpoint provably convergent.

    The LSN space is laid out in rounds: key ``k`` (of ``num_keys``) emits
    its round-``r`` event at ``lsn = r * num_keys + k + 1``; a key with
    ``n_k`` total events is silent for rounds >= n_k (LSN gaps are fine —
    a WAL's LSNs are not dense either). ``n_k``, the op sequence, and the
    payload all derive from splitmix64 hashes of (seed, k, r).
    """

    seed: int = 42
    num_keys: int = 10_000
    max_versions: int = 8          # n_k ∈ [1, max_versions]
    num_repos: int = 200           # log-uniform (Zipf-ish) key→repo skew
    delete_fraction_inv: int = 4   # 1/x of keys end with a DELETE
    reinsert_fraction_inv: int = 8 # 1/x of deleted keys get a mid-life delete + re-insert
    content_lines_min: int = 3
    content_lines_max: int = 40    # content length ≈ lines × ~32 B
    base_ts_ms: int = 1_700_000_000_000
    ts_step_ms: int = 7
    # schema evolution (FIXTURES.md F6): events with lsn >= stars_add_lsn
    # carry an extra int64 column `stars`; with lsn >= stars_widen_lsn it
    # becomes float64. 0 disables.
    stars_add_lsn: int = 0
    stars_widen_lsn: int = 0

    @property
    def max_lsn(self) -> int:
        """Exclusive upper bound of the LSN space."""
        return self.max_versions * self.num_keys + 1


@dataclass
class EngineConfig:
    """Engine-level knobs (≙ cdcsdk.server.* / engine properties)."""

    lake_dir: str = "/tmp/cdc_lake"
    num_partitions: int = 32       # ≙ tablets / task shards (ServerApp.java:192-211)
    window_lsns: int = 80_000      # LSNs per streaming window (≙ poll batch)
    batch_size: int = 32_768       # rows per Arrow batch in map_batches
    commit_every_windows: int = 1  # ≙ OffsetCommitPolicy: 1 = always, N = periodic
                                   # (/root/reference/cdcsdk-engine/src/main/java/com/yugabyte/cdcsdk/engine/spi/OffsetCommitPolicy.java:30-59)
    # hot-partition bound: a partition whose staged bytes per window exceed
    # this is merged per-salt in parallel (one fragment per salt) instead of
    # by one straggler task (SURVEY.md §4 "Skew / stragglers")
    hot_partition_bytes: int = 256 * 1024 * 1024
    salt_buckets: int = 8          # sub-buckets for hot-partition two-level reduce
    # exchange implementation for the per-window hash partitioning:
    #   "staged"  — map tasks spill hive-partitioned parquet runs; one
    #               reader/merger task per partition (how Spark/MR shuffles
    #               physically work; ~8x faster here than the in-memory
    #               sort exchange and it scales via shared storage)
    #   "groupby" — ray.data groupby(partition_id).map_groups (in-memory
    #               sort-based AllToAll)
    # Both produce byte-identical lake fragments.
    exchange: str = "staged"
    # CPUs reserved per stage-2 merge task. Merge tasks are memory-
    # bandwidth-bound (decompress + gather ~100MB bursts), not CPU-bound:
    # running one per core collapses on machines whose page-fault/zeroing
    # path serializes (measured 40s → 5.8s for the same work by throttling
    # 32 → 8 concurrent; re-swept in round 4: 1.0 → 23.9 s, 2.0 → 8.7 s,
    # 4.0 → 11.8 s on the 14.4M-event single-window merge — 16 concurrent
    # is this box's sweet spot). Reserving >1 CPU per task is the
    # Ray-idiomatic way to bound a stage's concurrency to memory
    # bandwidth.
    merge_num_cpus: float = 2.0
    # CPUs reserved per spill (map-side) task. 1.0 = one task per core.
    # Raising it throttles concurrent parquet-encode allocation bursts the
    # same way merge_num_cpus throttles the reduce side — useful on hosts
    # whose page-fault path serializes under many concurrent writers.
    spill_num_cpus: float = 1.0
    # parquet compression for the transient spill runs. The exchange is
    # write-once-read-once; two codecs have competed here across rounds:
    # zstd (r2 pick: ~2x fewer staged page-cache bytes) and lz4. Round-5
    # measurement settled it: zstd's per-file compression-context
    # allocations ride this host's fault-serialized allocation path, so
    # at high concurrency zstd LOSES more to allocator contention than
    # it saves in page-cache bytes — spill wall 5.9s (zstd) vs 4.3s
    # (lz4) at 32 CPUs, statistically equal at 8 CPUs (13-14s both).
    # lz4's contexts are KBs and its decode side is cheaper for the
    # merge readers too. Durable lake fragments remain zstd (state/
    # lake.py) — there bytes-at-rest dominate.
    spill_compression: str = "lz4"
    # changelog source: "synth" (pure-function WAL, sources/changelog.py),
    # "table" (derive the changelog from a real Parquet table,
    # sources/source_table.py), or "parquet_changelog" (ingest a
    # USER-SUPPLIED Parquet event table in the flat event schema,
    # sources/parquet_changelog.py — the arbitrary-upstream surface).
    # source_table holds the path for both non-synth modes.
    source: str = "synth"
    source_table: str = ""
    # ≙ cdcsdk.source.snapshot.mode (README.md:138): "never" = stream the
    # changelog from LSN 1; "initial" = on a FRESH lake, bulk-load the
    # source table as a consistent snapshot (op='r' rows written straight
    # to per-partition fragments, zero shuffle) and commit the snapshot
    # watermark, then stream only the changelog AFTER it. On a lake with
    # committed state, "initial" degrades to resume (like the reference:
    # a snapshot runs at most once per stream).
    snapshot_mode: str = "never"
    # Debezium-style INCREMENTAL (ad-hoc) snapshot — the DBLog watermark
    # algorithm the reference inherits from Debezium (public design:
    # debezium.io "incremental snapshots", Netflix DBLog paper): backfill
    # the source table in bounded key-range CHUNKS *interleaved* with
    # streaming windows, without stopping the stream. Here the chunk/event
    # dedup rule is expressed purely as LWW ordering: a snapshot-read row
    # (op='r') carries lsn = doc_id — ONE BELOW the key's round-0 insert
    # event — so any streamed event for the key wins the merge while keys
    # the stream never touched (e.g. a connector attached at start_lsn)
    # backfill from the chunk. Chunk progress is a durable manifest field
    # (snapshot_chunks_done) committed through the same epoch fence as
    # window offsets, so a crash resumes mid-snapshot without re-emitting
    # finished chunks. Requires source='table' and checkpointing=True;
    # mutually exclusive with snapshot_mode='initial' (a lake gets ONE
    # snapshot strategy).
    incremental_snapshot: bool = False
    # doc_id range width per incremental-snapshot chunk (Debezium's
    # incremental.snapshot.chunk.size analogue). Bounds per-chunk memory
    # and keeps the stream's window cadence (one chunk per window).
    snapshot_chunk_rows: int = 4096
    # chunks per Dataset execution while DRAINING an incremental snapshot
    # with the stream idle (the post-window-loop drain). While streaming,
    # the interleave stays one chunk per window (DBLog cadence). Each
    # bounded execution costs ~0.2 s fixed, so draining one chunk at a
    # time made the drain phase execution-bound; a span of N amortizes
    # that Nx. Memory bound: span_rows = N * snapshot_chunk_rows per
    # execution (default 16 * 4096 = 64Ki rows ≈ tens of MB at 1KB rows).
    # Chunk identity on disk (fragment names, lineage, progress counter)
    # is unchanged by the span width.
    snapshot_drain_chunks: int = 16
    # migration override for PRE-geometry-pin lakes (round-3 and earlier
    # manifests have snapshot_chunks_done but no pinned chunk geometry).
    # Such lakes normally REFUSE to resume an incremental snapshot (the
    # original chunk width is unknowable). Setting this flag asserts the
    # single operator-checkable fact that cfg.snapshot_chunk_rows IS the
    # original width (read it off the old deploy config): geometry is
    # pinned from cfg and the normal complete-or-continue logic applies,
    # so a completed legacy snapshot short-circuits and a mid-flight one
    # resumes. Asserting a NARROWER-than-original width re-emits rows
    # (harmless — LWW is idempotent); a WIDER one would skip rows, which
    # is why this is an explicit assertion, not an inference.
    snapshot_resume_legacy_assume_cfg_width: bool = False
    # attach point for a FRESH lake: streaming starts AFTER this LSN (a
    # connector attached mid-stream — the situation incremental snapshots
    # exist for). Ignored on resume (the committed watermark rules).
    start_lsn: int = 0
    # fault injection (≙ SimpleSourceConnector error.retriable.on,
    # /root/reference/cdcsdk-engine/src/main/java/io/debezium/connector/simple/SimpleSourceConnector.java:199-202):
    # the first task to see this LSN raises once; Ray's task retry
    # (≙ MTEngine.java:900-905 swallowing RetriableException) re-runs it
    # and the run completes exactly-once. 0 disables.
    fault_inject_lsn: int = 0
    # checkpointing=False ≙ the reference's memory offset store /
    # "stateless mode" default (ServerApp.java:196-201): no manifest is
    # committed, a restart replays from scratch. The lake still receives
    # fragments (idempotent overwrites), but nothing is durably visible.
    checkpointing: bool = True
    # incremental materialized view (streaming-DB shape): when True the
    # engine maintains a per-lang (live rows, content bytes) view from
    # per-window DELTAS — f(after) − f(before), before-images derived
    # from the pure-function synth source — committed through the SAME
    # epoch fence as the offsets (keyed by window id + lo, so truncated
    # -window continuations and crash replays stay exactly-once). Synth
    # source only; other sources refuse rather than silently skip.
    view_maintenance: bool = False
    # offset storage backend (≙ memory/file/Kafka offset-store plurality,
    # MTEngine.java:128-183): "file" = manifest + atomic CURRENT pointer;
    # "log" = append-only record log (Kafka-topic analogue — commits
    # append, resume replays to the last intact record). Fixed per lake.
    offset_backend: str = "file"
    # staging root for the exchange spill. Default "" = <lake_dir>/_staging.
    # MUST be visible to every node: the merge planner lists this
    # directory from whatever node runs it, so runs spilled to a path
    # only their writer node can see would be silently missed (lost
    # events). On one node any local NVMe path qualifies; on a cluster
    # use a shared FS / fast shuffle tier (per-node-local staging would
    # need node-affine merge scheduling — not implemented). Staging is
    # transient (wiped on replay), so durability is not needed.
    staging_root: str = ""
    # how many windows run concurrently in the staged-exchange pipeline
    # (window w+1's spill overlaps window w's merge). Commits stay
    # strictly ordered regardless. 2 suffices to hide the merge; 3 helps
    # when per-window fixed costs dominate (small-window streaming tails).
    pipeline_depth: int = 2
    # auto-compaction cadence: merge each partition's fragments into one
    # base every N committed windows (0 = only on explicit compact()).
    # Bounds fragment count — and therefore merge-on-read cost — for
    # long-running streaming tails (SCALE.md "compact every k windows").
    compact_every_windows: int = 0
    # user SMT chain (≙ transforms=a,b + transforms.a.type=... config,
    # MTEngine.java:229-235): ordered specs resolved against the
    # stages.envelope registry and applied AFTER unwrap/flatten, BEFORE
    # partitioning. e.g. [("filter_regex", {"column": "repo",
    # "pattern": "^org0/"})]
    transforms: tuple = ()
    # dead-letter routing (≙ Kafka Connect errors.deadletterqueue; the
    # reference's http sink SKIPS failed records instead,
    # HttpChangeConsumer.java:96-124): events whose content exceeds this
    # byte bound are fenced + routed EXACTLY-ONCE into dlq/ fragments
    # committed through the same epoch fence as the deltas, instead of
    # being applied or silently dropped. None = disabled. Any user
    # transform may also emit a __dlq_reason column directly — the
    # engine routes on the column whenever present.
    dlq_max_content_bytes: int | None = None
    synth: SynthConfig = field(default_factory=SynthConfig)
