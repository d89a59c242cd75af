"""Null sink — the throughput-measurement sink (K11).

Reference: NullStreamChangeConsumer counts records/bytes and discards,
logging every 100k (/root/reference/cdcsdk-server/cdcsdk-server-null/src/main/java/org/yb/cdcsdk/server/nullstream/NullStreamChangeConsumer.java:56-80);
it is the sink the perf framework benches against (perf/cdcsdk-null.yaml).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from cdcsdk_server_ray.sinks.base import BaseSink


class NullSink(BaseSink):
    """Count + discard. Use as the measurement tail of any pipeline:
    ``ds.map_batches(NullSink, batch_format="pyarrow", concurrency=N)``."""

    LOG_EVERY = 100_000

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = self._pre(batch)
        nbytes = batch.nbytes
        before = self.records_written // self.LOG_EVERY
        out = self.receipt("null", batch.num_rows, nbytes)
        if self.records_written // self.LOG_EVERY != before:  # ≙ :75-79 log
            print(f"[null-sink] {self.records_written} records, "
                  f"{self.bytes_written} bytes")
        return out
