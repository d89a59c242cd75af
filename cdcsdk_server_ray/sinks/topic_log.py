"""Topic-log sink — the keyed-stream sink family's ordering contract
(K1 kafka, K5 kinesis, K6 pubsub) without external brokers.

The property all three share: records with the same key land in the same
stream shard, in order — Kinesis via partitionKey
(KinesisChangeConsumer.java:108-112), Pub/Sub via orderingKey
(PubSubChangeConsumer.java:124-135), Kafka via key-hash partitioning.
Here: a directory per (topic, shard) where shard = hash(key) % shards,
one append-only JSONL log per shard; feed it per-partition batches (the
engine's partitioned output) and per-key order is preserved because a
key's events always hit the same shard file through the same actor.

No broker in the sandbox ⇒ this is the honest local materialization of
the contract; the class boundary (connection in __init__, batch sends in
__call__, barrier flush per batch ≙ the countdown-latch barrier at
KafkaChangeConsumer.java:94-109) is exactly what a real broker client
would fill in.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from cdcsdk_server_ray.sinks.base import BaseSink


class TopicLogSink(BaseSink):
    def __init__(self, out_dir: str, shards: int = 8,
                 topic_col: str | None = None, key_cols=("repo", "path"), **kw):
        super().__init__(**kw)
        self.out_dir = out_dir
        self.shards = shards
        self.topic_col = topic_col
        self.key_cols = tuple(key_cols)
        self._files: dict[tuple[str, int], object] = {}
        os.makedirs(out_dir, exist_ok=True)

    def _file(self, topic: str, shard: int):
        fh = self._files.get((topic, shard))
        if fh is None:
            d = os.path.join(self.out_dir, topic)
            os.makedirs(d, exist_ok=True)
            fh = open(os.path.join(d, f"shard-{shard:04d}.jsonl"), "ab")
            self._files[(topic, shard)] = fh
        return fh

    def _key_strings(self, batch: pa.Table, topics: list[str]) -> pd.Series:
        """Partition-key string per row (subclass hook — Kinesis's
        null-key fallback overrides this)."""
        return (batch.select(list(self.key_cols)).to_pandas().astype(str)
                .agg("\x1f".join, axis=1))

    def _shards_for(self, batch: pa.Table,
                    topics: list[str]) -> np.ndarray:
        """Shard per row = hash(partition key) % shards (subclass hook —
        Pub/Sub's ordering toggle overrides this)."""
        key = pd.util.hash_pandas_object(
            self._key_strings(batch, topics), index=False,
            hash_key="cdcsdk-ray-hash0").to_numpy()
        return (key % np.uint64(self.shards)).astype(int)

    def _append(self, topic: str, shard: int, data: bytes) -> int:
        """Append one record batch to a shard log (subclass hook —
        Kafka's producer buffering/compression overrides this)."""
        fh = self._file(topic, shard)
        fh.write(data)
        return len(data)

    def _barrier(self) -> None:
        for fh in self._files.values():   # batch barrier ≙ latch await
            fh.flush()

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = self._pre(batch)
        if batch.num_rows == 0:
            return self.receipt("empty", 0, 0)
        topics = (batch[self.topic_col].to_pylist()
                  if self.topic_col and self.topic_col in batch.column_names
                  else ["events"] * batch.num_rows)
        shard = self._shards_for(batch, topics)
        lines = self.to_json_lines(batch).to_pylist()
        total = 0
        # group rows per (topic, shard), append in batch order — per-key
        # order preserved (same key ⇒ same shard, rows stay in order)
        df = pd.DataFrame({"topic": topics, "shard": shard, "line": lines})
        for (topic, sh), g in df.groupby(["topic", "shard"], sort=False):
            data = ("\n".join(g["line"]) + "\n").encode()
            total += self._append(topic, int(sh), data)
        self._barrier()
        return self.receipt(topics[0], batch.num_rows, total)

    def finish(self) -> None:
        """Drain (subclasses with buffers override + call super)."""
        self._barrier()

    def __del__(self):
        try:
            self.finish()
        except Exception:
            pass
        for fh in self._files.values():
            try:
                fh.close()
            except Exception:
                pass
