"""JSONL directory sink — the S3 sink's format and roll semantics (K3).

Reference behaviors reproduced:

- flattened records serialized as JSON lines, appended to a rolling
  object (S3ChangeConsumer.java:131-139 writes ``value + "\\n"``);
- roll to a new object when bytes/records thresholds hit —
  ``flush.sizeMB`` / ``flush.records`` defaults 200MB / 10,000
  (Roller.java:21-49, StorageSinkConnectorConfig.java:31-39);
- **insert-only** (README.md:180-183): no upsert here — the lake path in
  engine.py is the upsert-capable sink;
- gzip optional (S3 sink's compression wrapper).

Differences by design: object names are DETERMINISTIC
``<dest>/part-<actor_seed>-<seq>.jsonl[.gz]`` instead of the reference's
time/UUID pattern (NamePatternResolver.java:19-35) — deterministic names
are what make retried deliveries overwrite rather than duplicate
(SURVEY.md §7.5).
"""

from __future__ import annotations

import gzip
import os

import pyarrow as pa

from cdcsdk_server_ray.sinks.base import BaseSink


class Roller:
    """Roll-policy math (≙ Roller.java:21-49, minus its MB→GB bug at
    Roller.java:22 — thresholds here are plain bytes).

    ``rotate_interval_ms`` (≙ ``rotate.interval.ms``,
    StorageSinkConnectorConfig.java:31-39): an object also rolls when it
    has been open longer than the interval — the policy that keeps
    LOW-throughput destinations flushing instead of buffering forever.
    ``clock`` is injectable (monotonic ms) so tests drive time
    explicitly, RollerTest-style."""

    def __init__(self, max_bytes: int = 200 * 1024 * 1024,
                 max_records: int = 10_000,
                 rotate_interval_ms: int | None = None,
                 clock=None):
        import time
        self.max_bytes = max_bytes
        self.max_records = max_records
        self.rotate_interval_ms = rotate_interval_ms
        self.clock = clock or (lambda: time.monotonic() * 1000.0)
        self.bytes = 0
        self.records = 0
        self.opened_at_ms: float | None = None

    def update(self, records: int, nbytes: int) -> None:
        if self.opened_at_ms is None:
            self.opened_at_ms = self.clock()
        self.records += records
        self.bytes += nbytes

    def should_roll(self) -> bool:
        if self.bytes >= self.max_bytes or self.records >= self.max_records:
            return True
        return self.interval_expired()

    def interval_expired(self) -> bool:
        """Time-based roll alone — polled between batches too, so an
        idle destination still flushes (the reference's scheduler tick,
        Roller.java:33-41)."""
        return (self.rotate_interval_ms is not None
                and self.opened_at_ms is not None
                and self.records > 0
                and self.clock() - self.opened_at_ms
                >= self.rotate_interval_ms)

    def reset(self) -> None:
        self.bytes = 0
        self.records = 0
        self.opened_at_ms = None


class JsonlDirSink(BaseSink):
    """Actor-pool sink writing rolling JSONL objects per destination.

    One buffer per destination (≙ per-TopicPartition write buffers);
    ``actor_seed`` disambiguates actors in the pool — pass the batch's
    partition id range or let the pool default to pid-of-first-batch.
    """

    def __init__(self, out_dir: str, max_bytes: int = 200 * 1024 * 1024,
                 max_records: int = 10_000, compress: bool = False,
                 destination_col: str | None = None,
                 rotate_interval_ms: int | None = None, clock=None, **kw):
        super().__init__(**kw)
        self.out_dir = out_dir
        self.compress = compress
        self.destination_col = destination_col
        self.max_bytes = max_bytes
        self.max_records = max_records
        self.rotate_interval_ms = rotate_interval_ms
        self.clock = clock
        self._buffers: dict[str, list[bytes]] = {}
        self._rollers: dict[str, Roller] = {}
        self._seq: dict[str, int] = {}
        self._seed: str | None = None
        os.makedirs(out_dir, exist_ok=True)

    def _flush(self, dest: str) -> int:
        buf = self._buffers.get(dest)
        if not buf:
            return 0
        seq = self._seq.get(dest, 0)
        self._seq[dest] = seq + 1
        ext = ".jsonl.gz" if self.compress else ".jsonl"
        d = os.path.join(self.out_dir, dest)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"part-{self._seed}-{seq:06d}{ext}")
        data = b"".join(buf)
        tmp = path + ".tmp"
        if self.compress:
            with gzip.open(tmp, "wb") as f:
                f.write(data)
        else:
            with open(tmp, "wb") as f:
                f.write(data)
        os.replace(tmp, path)   # complete-or-abort (≙ multipart semantics)
        self._buffers[dest] = []
        self._rollers[dest].reset()
        return len(data)

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = self._pre(batch)
        if batch.num_rows == 0:
            return self.receipt("empty", 0, 0)
        if self._seed is None:
            # deterministic per-data-shard seed: first row's key-ish hash
            import hashlib
            first = str(batch.slice(0, 1).to_pylist()[0])
            self._seed = hashlib.md5(first.encode()).hexdigest()[:8]
        if self.destination_col and self.destination_col in batch.column_names:
            dests = batch[self.destination_col].to_pylist()
            payload_tbl = batch.drop_columns([self.destination_col])
        else:
            dests = ["events"] * batch.num_rows
            payload_tbl = batch
        lines = self.to_json_lines(payload_tbl).to_pylist()
        total = 0
        for dest, line in zip(dests, lines):
            data = (line + "\n").encode()
            roller = self._rollers.setdefault(
                dest, Roller(self.max_bytes, self.max_records,
                             rotate_interval_ms=self.rotate_interval_ms,
                             clock=self.clock))
            self._buffers.setdefault(dest, []).append(data)
            roller.update(1, len(data))
            total += len(data)
            if roller.should_roll():      # ≙ RollingOutputStream.java:28-42
                self._flush(dest)
        # interval tick for destinations this batch did NOT touch — a
        # low-throughput topic must still flush on rotate.interval.ms
        for dest, roller in self._rollers.items():
            if roller.interval_expired():
                self._flush(dest)
        return self.receipt(dests[0], batch.num_rows, total)

    def finish(self) -> None:
        """Drain all buffers (≙ graceful shutdown final flush, E8)."""
        for dest in list(self._buffers):
            self._flush(dest)

    def __del__(self):  # actor teardown drains
        try:
            self.finish()
        except Exception:
            pass
