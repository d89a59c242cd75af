"""Kafka sink (K1) — the topic-log contract plus the producer config
surface the reference exposes.

Reference: ``KafkaChangeConsumer`` passes every ``debezium.sink.kafka.
producer.*`` property straight to the Kafka producer
(/root/reference/cdcsdk-server/cdcsdk-server-kafka/src/main/java/io/debezium/server/kafka/KafkaChangeConsumer.java:60-76;
perf tuning example perf/cdcsdk-kafka-local.yaml: batch.size, linger.ms,
compression.type). This stand-in implements the three behaviors those
knobs actually buy — record-batch accumulation (``batch.size`` bytes),
time-bounded lingering (``linger.ms``, injectable clock) and wire
compression (``compression.type: gzip`` — each flushed record batch is
one gzip member; concatenated members are a valid gzip stream, so the
shard log stays a single readable object) — over the shared
keyed-shard topic log (per-key ordering proven there).
"""

from __future__ import annotations

import gzip
import time

from cdcsdk_server_ray.sinks.topic_log import TopicLogSink

_DEFAULTS = {"batch.size": 16_384, "linger.ms": 0,
             "compression.type": "none"}


class KafkaSink(TopicLogSink):
    def __init__(self, out_dir: str, producer_config: dict | None = None,
                 clock=None, **kw):
        super().__init__(out_dir, **kw)
        cfg = dict(_DEFAULTS)
        cfg.update(producer_config or {})
        unknown = set(cfg) - set(_DEFAULTS)
        if unknown:
            # config is a contract: a typo'd producer key must refuse,
            # not silently no-op (the reference fails in the producer)
            raise ValueError(f"unsupported producer config keys: "
                             f"{sorted(unknown)}")
        self.batch_size = int(cfg["batch.size"])
        self.linger_ms = float(cfg["linger.ms"])
        self.compression = str(cfg["compression.type"])
        if self.compression not in ("none", "gzip"):
            raise ValueError(
                f"unsupported compression.type: {self.compression!r}")
        self.clock = clock or (lambda: time.monotonic() * 1000.0)
        self._acc: dict[tuple[str, int], list[bytes]] = {}
        self._acc_bytes: dict[tuple[str, int], int] = {}
        self._acc_since: dict[tuple[str, int], float] = {}

    def _file(self, topic: str, shard: int):
        fh = self._files.get((topic, shard))
        if fh is None:
            import os
            d = os.path.join(self.out_dir, topic)
            os.makedirs(d, exist_ok=True)
            ext = ".jsonl.gz" if self.compression == "gzip" else ".jsonl"
            fh = open(os.path.join(d, f"shard-{shard:04d}{ext}"), "ab")
            self._files[(topic, shard)] = fh
        return fh

    def _flush_key(self, key: tuple[str, int]) -> None:
        buf = self._acc.pop(key, None)
        self._acc_bytes.pop(key, None)
        self._acc_since.pop(key, None)
        if not buf:
            return
        data = b"".join(buf)
        if self.compression == "gzip":
            # mtime pinned: deterministic bytes under replay
            data = gzip.compress(data, mtime=0)
        fh = self._file(*key)
        fh.write(data)
        fh.flush()

    def _append(self, topic: str, shard: int, data: bytes) -> int:
        # Receipt bytes are LOGICAL (pre-compression) payload bytes — the
        # producer-side record size, matching what the reference's
        # producer metrics count. Post-gzip physical bytes are only known
        # at _flush_key time, which batches many appends into one member.
        key = (topic, shard)
        self._acc.setdefault(key, []).append(data)
        self._acc_since.setdefault(key, self.clock())
        n = self._acc_bytes.get(key, 0) + len(data)
        self._acc_bytes[key] = n
        if n >= self.batch_size or \
                self.clock() - self._acc_since[key] >= self.linger_ms:
            self._flush_key(key)
        return len(data)

    def _barrier(self) -> None:
        # linger tick for shards this batch did not touch
        now = self.clock()
        for key in list(self._acc):
            if now - self._acc_since.get(key, now) >= self.linger_ms:
                self._flush_key(key)
        super()._barrier()

    def finish(self) -> None:
        for key in list(self._acc):
            self._flush_key(key)
        super().finish()
