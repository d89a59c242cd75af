"""Apache Pulsar sink (K8) — keyed per-record publish with message ids.

Reference: ``PulsarChangeConsumer.handleBatch``
(/root/reference/cdcsdk-server/cdcsdk-server-pulsar/src/main/java/io/debezium/server/pulsar/PulsarChangeConsumer.java:114-146):
one producer per mapped topic created lazily (:121, ``computeIfAbsent``),
each record becomes one message with ``key`` = record key or the
configured ``null.key`` sentinel (default "default", :59-60 and :123),
sent synchronously — the returned ``MessageId`` establishes the
per-topic publish order — then marked processed; batch finish after the
loop.

Stand-in (no broker): one append-only JSONL log per topic; the message
id is ``<ledger=0>:<entry=seq>`` from a per-topic counter (monotonic
per topic exactly like broker-assigned ids). Pulsar routes key-hash →
partition inside a partitioned topic; with the single-log stand-in the
per-key order contract is trivially preserved (one topic = one log =
publish order). Broker-assigned ids require a single sequencer per
topic, so each topic log is claimed by ONE writer (O_EXCL owner
marker); a second concurrent sink actor on the same topic errors
loudly instead of silently minting duplicate ids — shard topics across
actors via ``topic_col`` or run the sink stage with ``concurrency=1``.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from cdcsdk_server_ray.sinks.base import (BaseSink, claim_single_writer,
                                          identity_stream_mapper,
                                          release_single_writer)

NULL_KEY = "default"   # ≙ cdcsdk.sink.pulsar.null.key default (:59-60)


class PulsarSink(BaseSink):
    def __init__(self, out_dir: str, key_cols=("repo", "path"),
                 topic_col: str | None = None, null_key: str = NULL_KEY,
                 stream_mapper=identity_stream_mapper, **kw):
        super().__init__(stream_mapper=stream_mapper, **kw)
        self.out_dir = out_dir
        self.key_cols = tuple(key_cols)
        self.topic_col = topic_col
        self.null_key = null_key
        self._producers: dict[str, object] = {}   # topic → file (≙ Producer)
        self._seq: dict[str, int] = {}
        self._owned: list[str] = []               # owner markers to release
        os.makedirs(out_dir, exist_ok=True)

    def _producer(self, topic: str):
        fh = self._producers.get(topic)
        if fh is None:
            path = os.path.join(self.out_dir, f"{topic}.topic.jsonl")
            self._owned.append(claim_single_writer(path))
            try:
                with open(path, "rb") as f:
                    self._seq[topic] = sum(1 for _ in f)
            except FileNotFoundError:
                self._seq[topic] = 0
            fh = self._producers[topic] = open(path, "ab")
        return fh

    def _send(self, topic: str, key: str, value: str) -> tuple[str, int]:
        """≙ producer.newMessage().key(key).value(value).send() — returns
        the message id (swap for a real client here)."""
        fh = self._producer(topic)
        mid = f"0:{self._seq[topic]}"
        data = (json.dumps({"message_id": mid, "key": key,
                            "value": value}) + "\n").encode()
        fh.write(data)
        self._seq[topic] += 1
        return mid, len(data)

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = self._pre(batch)
        if batch.num_rows == 0:
            return self.receipt("empty", 0, 0)
        if self.topic_col and self.topic_col in batch.column_names:
            dests = batch[self.topic_col].to_pylist()
        else:
            dests = ["events"] * batch.num_rows
        key_parts = [batch[c].to_pylist() for c in self.key_cols
                     if c in batch.column_names]
        if "payload" in batch.column_names:
            values = batch["payload"].to_pylist()
        else:
            values = self.to_json_lines(batch).to_pylist()
        nbytes = 0
        for i in range(batch.num_rows):
            topic = self.stream_mapper(dests[i])
            parts = [p[i] for p in key_parts]
            key = "\x1f".join(str(p) for p in parts) \
                if parts and not all(p is None for p in parts) else self.null_key
            _, n = self._send(topic, key, values[i])
            nbytes += n                           # ≙ markProcessed per record
        for fh in self._producers.values():       # ≙ markBatchFinished
            fh.flush()
        return self.receipt(self.stream_mapper(dests[0]),
                            batch.num_rows, nbytes)

    def __del__(self):
        for fh in self._producers.values():
            try:
                fh.close()
            except Exception:
                pass
        for marker in self._owned:
            release_single_writer(marker)


def read_topic(out_dir: str, topic: str) -> list[dict]:
    path = os.path.join(out_dir, f"{topic}.topic.jsonl")
    with open(path, "rb") as f:
        return [json.loads(line) for line in f]
