"""NATS Streaming sink (K9) — per-record subject publish.

Reference: ``NatsStreamingChangeConsumer.handleBatch``
(/root/reference/cdcsdk-server/cdcsdk-server-nats-streaming/src/main/java/io/debezium/server/nats/streaming/NatsStreamingChangeConsumer.java:114-134):
for each record with a non-null value, ``sc.publish(subject, bytes)``
where subject = mapped destination; null-valued records are NOT
published but ARE marked processed (:121 guards the publish only, :131
commits unconditionally); batch finish after the loop. NATS Streaming
assigns a per-channel monotonic sequence to each published message.

Stand-in (no broker): one append-only JSONL log per subject with a
per-subject sequence — the channel-sequence analogue. The broker
assigns that sequence centrally, so each subject log is claimed by ONE
writer (O_EXCL owner marker); a second concurrent sink actor on the
same subject errors loudly instead of silently writing duplicate
sequence numbers — shard subjects across actors via ``topic_col`` or
run the sink stage with ``concurrency=1``. The class boundary
(connection in ``__init__`` ≙ the ``StreamingConnection`` built in
@PostConstruct :77-92, publishes in ``__call__``) is what a real
client fills in.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from cdcsdk_server_ray.sinks.base import (BaseSink, claim_single_writer,
                                          identity_stream_mapper,
                                          release_single_writer)


class NatsStreamingSink(BaseSink):
    def __init__(self, out_dir: str, topic_col: str | None = None,
                 stream_mapper=identity_stream_mapper, **kw):
        super().__init__(stream_mapper=stream_mapper, **kw)
        self.out_dir = out_dir
        self.topic_col = topic_col
        self._subjects: dict[str, object] = {}   # subject → file handle
        self._seq: dict[str, int] = {}
        self._owned: list[str] = []              # owner markers to release
        self.records_processed = 0   # null values count processed, not written
        os.makedirs(out_dir, exist_ok=True)

    def _subject(self, subject: str):
        fh = self._subjects.get(subject)
        if fh is None:
            path = os.path.join(self.out_dir, f"{subject}.subject.jsonl")
            self._owned.append(claim_single_writer(path))
            try:
                with open(path, "rb") as f:
                    self._seq[subject] = sum(1 for _ in f)
            except FileNotFoundError:
                self._seq[subject] = 0
            fh = self._subjects[subject] = open(path, "ab")
        return fh

    def _publish(self, subject: str, value: str) -> int:
        """≙ sc.publish(subject, recordBytes) — swap for a real client."""
        fh = self._subject(subject)
        seq = self._seq[subject]
        data = (json.dumps({"seq": seq, "value": value}) + "\n").encode()
        fh.write(data)
        self._seq[subject] = seq + 1
        return len(data)

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = self._pre(batch)
        if batch.num_rows == 0:
            return self.receipt("empty", 0, 0)
        if self.topic_col and self.topic_col in batch.column_names:
            dests = batch[self.topic_col].to_pylist()
        else:
            dests = ["events"] * batch.num_rows
        if "payload" in batch.column_names:
            values = batch["payload"].to_pylist()
        else:
            values = self.to_json_lines(batch).to_pylist()
        sent = nbytes = 0
        for i in range(batch.num_rows):
            self.records_processed += 1          # ≙ markProcessed (:131)
            if values[i] is None:                # null value → no publish (:121)
                continue
            nbytes += self._publish(self.stream_mapper(dests[i]), values[i])
            sent += 1
        for fh in self._subjects.values():       # ≙ markBatchFinished
            fh.flush()
        return self.receipt(self.stream_mapper(dests[0]), sent, nbytes)

    def __del__(self):
        for fh in self._subjects.values():
            try:
                fh.close()
            except Exception:
                pass
        for marker in self._owned:
            release_single_writer(marker)


def read_subject(out_dir: str, subject: str) -> list[dict]:
    path = os.path.join(out_dir, f"{subject}.subject.jsonl")
    with open(path, "rb") as f:
        return [json.loads(line) for line in f]
