"""HTTP webhook sink (K2) — per-record POST with skip-on-failure.

Reference: ``HttpChangeConsumer``
(/root/reference/cdcsdk-server/cdcsdk-server-http/src/main/java/io/debezium/server/http/HttpChangeConsumer.java:96-124):
one POST per record; the record is marked processed ONLY on 200/202/204;
any other status is logged and the record skipped while the batch still
finishes (committer.markBatchFinished runs regardless); records with a
null value (tombstones) are skipped before sending; transport-level
IOExceptions abort the batch so the engine's retry path re-runs it
(:107-113 wraps IOException into InterruptedException). Content-type
follows the configured value format (json / cloudevents / avro,
:77-92).

Ray-Data form: an actor-pool ``map_batches`` stage — the client is built
once per actor in ``__init__``; ``__call__`` delivers one Arrow batch
row-by-row (the per-record contract is the reference's, not a batching
shortcut) and returns an extended receipt carrying the success/failure
split so lineage can account skipped records.
"""

from __future__ import annotations

import pyarrow as pa

from cdcsdk_server_ray.sinks.base import BaseSink, identity_stream_mapper

HTTP_RECEIPT_SCHEMA = pa.schema([
    ("destination", pa.string()),
    ("records_written", pa.int64()),
    ("records_failed", pa.int64()),
    ("bytes_written", pa.int64()),
])

_CONTENT_TYPES = {  # ≙ the format→content-type switch (:77-92)
    "json": "application/json",
    "cloudevents": "application/cloudevents+json",
    "avro": "avro/bytes",
}


class HttpSinkTransportError(RuntimeError):
    """Transport-level failure (connect/timeout) — aborts the batch so the
    task retries, like IOException → InterruptedException in the
    reference (:107-113). HTTP error STATUSES do NOT raise — they skip."""


class HttpSink(BaseSink):
    STATUS_OK = (200, 202, 204)   # HTTP_OK / HTTP_ACCEPTED / HTTP_NO_CONTENT

    def __init__(self, url: str, value_format: str = "json",
                 timeout_s: float = 60.0,
                 stream_mapper=identity_stream_mapper,
                 drop_tombstones: bool = False):
        super().__init__(stream_mapper=stream_mapper,
                         drop_tombstones=drop_tombstones)
        import urllib.request
        self.url = url
        self.content_type = _CONTENT_TYPES.get(value_format,
                                               "application/json")
        self.timeout_s = timeout_s
        self._opener = urllib.request.build_opener()   # once per actor
        self.records_failed = 0

    def _post(self, data: bytes) -> int:
        import urllib.error
        import urllib.request
        req = urllib.request.Request(
            self.url, data=data,
            headers={"content-type": self.content_type}, method="POST")
        try:
            with self._opener.open(req, timeout=self.timeout_s) as r:
                return r.status
        except urllib.error.HTTPError as e:
            return e.code                      # a status, not a transport error
        except urllib.error.URLError as e:
            raise HttpSinkTransportError(str(e)) from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = self._pre(batch)
        if "payload" in batch.column_names:    # serializer ran upstream
            payloads = batch["payload"].to_pylist()
        else:
            payloads = BaseSink.to_json_lines(batch).to_pylist()
        sent = failed = nbytes = 0
        for v in payloads:
            if v is None:                      # null value → skip (:101)
                continue
            data = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            code = self._post(data)
            if code in self.STATUS_OK:
                sent += 1                      # ≙ committer.markProcessed
                nbytes += len(data)
            else:
                failed += 1                    # logged + skipped (:119-121)
        self.records_written += sent
        self.bytes_written += nbytes
        self.records_failed += failed
        dest = self.stream_mapper("http")
        return pa.Table.from_pylist(
            [{"destination": dest, "records_written": sent,
              "records_failed": failed, "bytes_written": nbytes}],
            schema=HTTP_RECEIPT_SCHEMA)
