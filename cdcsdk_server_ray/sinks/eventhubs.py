"""Azure Event Hubs sink (K7) — batch-atomic send.

Reference: ``EventHubsChangeConsumer.handleBatch``
(/root/reference/cdcsdk-server/cdcsdk-server-eventhubs/src/main/java/io/debezium/server/eventhubs/EventHubsChangeConsumer.java:114-185):
the WHOLE poll batch is accumulated into one ``EventDataBatch`` —
null-valued records skipped (:133-135), an event that does not fit the
configured ``maxbatchsize`` fails the batch (:143-158) — and delivered
with a single ``producer.send(batch)`` (:166); only after that send do
the per-record commits run (:175-183). All records share the hub-level
``partitionid``/``partitionkey`` routing set in ``CreateBatchOptions``
(:120-123) — Event Hubs routes per BATCH, not per record.

Stand-in (no broker): the hub is one append-only JSONL log; "send" is a
single buffered write + flush of the whole batch — all-or-nothing at
the batch grain exactly like the client's one send call. Routing
metadata rides on each entry so a reader can assert the per-batch
partition contract.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from cdcsdk_server_ray.sinks.base import BaseSink, identity_stream_mapper


class EventTooLargeError(RuntimeError):
    """≙ DebeziumException("Event data was too large to fit in the batch")."""


class EventHubsSink(BaseSink):
    def __init__(self, out_dir: str, hub_name: str = "events",
                 partition_id: str = "", partition_key: str = "",
                 max_batch_bytes: int = 0,
                 stream_mapper=identity_stream_mapper, **kw):
        super().__init__(stream_mapper=stream_mapper, **kw)
        self.out_dir = out_dir
        # map the destination ONCE so the write path and the receipt name
        # the same hub (a receipt naming a hub no data went to breaks any
        # metrics keyed by destination)
        self.hub_name = self.stream_mapper(hub_name)
        self.partition_id = partition_id
        self.partition_key = partition_key
        self.max_batch_bytes = max_batch_bytes   # 0 = unlimited, like the ref
        os.makedirs(out_dir, exist_ok=True)
        # producer client built once per actor (≙ @PostConstruct, :83-100);
        # unbuffered so each batch goes down in one O_APPEND write — the
        # single-send batch grain survives concurrent pool actors
        self._path = os.path.join(out_dir, f"{self.hub_name}.hub.jsonl")
        self._fh = open(self._path, "ab", buffering=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = self._pre(batch)
        if batch.num_rows == 0:
            return self.receipt(self.hub_name, 0, 0)
        if "payload" in batch.column_names:      # serializer ran upstream
            values = batch["payload"].to_pylist()
        else:
            values = self.to_json_lines(batch).to_pylist()
        # phase 1 — tryAdd loop: build the whole EventDataBatch in memory;
        # nothing is sent yet, a too-large event fails the WHOLE batch
        buf = bytearray()
        records = 0
        routing = {"partition_id": self.partition_id or None,
                   "partition_key": self.partition_key or None}
        for v in values:
            if v is None:                        # null value → skip (:133)
                continue
            entry = (json.dumps({"value": v, **routing}) + "\n").encode()
            if self.max_batch_bytes and \
                    len(buf) + len(entry) > self.max_batch_bytes:
                raise EventTooLargeError(
                    "Event data was too large to fit in the batch")
            buf += entry
            records += 1
        # phase 2 — ONE send for the whole batch (:166)
        self._fh.write(bytes(buf))
        return self.receipt(self.hub_name, records, len(buf))

    def __del__(self):
        try:
            self._fh.close()
        except Exception:
            pass


def read_hub(out_dir: str, hub_name: str = "events") -> list[dict]:
    path = os.path.join(out_dir, f"{hub_name}.hub.jsonl")
    with open(path, "rb") as f:
        return [json.loads(line) for line in f]
