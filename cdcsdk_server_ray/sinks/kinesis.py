"""Kinesis sink (K5) — keyed-shard contract plus the null-key fallback.

Reference: ``KinesisChangeConsumer`` uses the record key as the
partition key and FALLS BACK to the stream name when the key is null
(/root/reference/cdcsdk-server/cdcsdk-server-kinesis/src/main/java/io/debezium/server/kinesis/KinesisChangeConsumer.java:104-112)
— so keyless records all land on one shard of their stream, in order,
instead of crashing the producer. Same semantics here over the shared
topic-log stand-in.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from cdcsdk_server_ray.sinks.topic_log import TopicLogSink


class KinesisSink(TopicLogSink):
    def _key_strings(self, batch: pa.Table, topics: list[str]) -> pd.Series:
        present = [c for c in self.key_cols if c in batch.column_names]
        if not present:
            # keyless stream: every record keys on its stream name
            return pd.Series(topics)
        df = batch.select(present).to_pandas()
        joined = df.astype(str).agg("\x1f".join, axis=1)
        all_null = df.isna().all(axis=1)
        if all_null.any():
            joined = joined.mask(all_null, pd.Series(topics)[all_null])
        return joined
