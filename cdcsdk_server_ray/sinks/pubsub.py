"""Pub/Sub sink (K6) — keyed-shard contract plus the ordering toggle.

Reference: ``PubSubChangeConsumer`` only sets an orderingKey when
``debezium.sink.pubsub.ordering.enabled`` is true; with ordering off,
messages spread across the topic with no per-key guarantee
(/root/reference/cdcsdk-server/cdcsdk-server-pubsub/src/main/java/io/debezium/server/pubsub/PubSubChangeConsumer.java:124-135).
Here: ordering on = key-hash sharding (per-key order proven by the
shared topic-log tests); ordering off = deterministic round-robin
across shards (throughput over order — the same trade the real sink
makes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cdcsdk_server_ray.sinks.topic_log import TopicLogSink


class PubSubSink(TopicLogSink):
    def __init__(self, out_dir: str, ordering_enabled: bool = True, **kw):
        super().__init__(out_dir, **kw)
        self.ordering_enabled = ordering_enabled
        self._rr = 0

    def _shards_for(self, batch: pa.Table,
                    topics: list[str]) -> np.ndarray:
        if self.ordering_enabled:
            return super()._shards_for(batch, topics)
        n = batch.num_rows
        shards = (np.arange(self._rr, self._rr + n) % self.shards) \
            .astype(int)
        self._rr = (self._rr + n) % self.shards
        return shards
