"""Redis-streams sink (K4) — XADD semantics without a broker.

Reference: ``RedisStreamChangeConsumer.handleBatch``
(/root/reference/cdcsdk-server/cdcsdk-server-redis/src/main/java/io/debezium/server/redis/RedisStreamChangeConsumer.java:109-131):
per record, ``XADD <mapped destination> * {key: value}`` — one stream per
destination, one single-field entry per record, entry ids assigned
monotonically per stream by the server, records marked processed in
order, null keys replaced by a sentinel ("default").

Stand-in (no broker in the sandbox): one append-only JSONL file per
stream; entry ids are ``<seq>-0`` from a per-stream counter held by the
sink actor — monotonic per stream exactly like server-assigned XADD ids
(the real client swaps ``_xadd`` for ``jedis.xadd``; everything else —
destination mapping, null-key sentinel, per-record commit accounting,
batch-finish barrier — is the reference's contract). ``xrange`` gives
the consumer-side read for tests.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from cdcsdk_server_ray.sinks.base import BaseSink, identity_stream_mapper

NULL_KEY = "default"   # ≙ the reference's nullKey ("redis.null.key" config)


class RedisStreamSink(BaseSink):
    def __init__(self, out_dir: str, key_cols=("repo", "path"),
                 topic_col: str | None = None,
                 stream_mapper=identity_stream_mapper, **kw):
        super().__init__(stream_mapper=stream_mapper, **kw)
        self.out_dir = out_dir
        self.key_cols = tuple(key_cols)
        self.topic_col = topic_col
        self._files: dict[str, object] = {}   # stream → file handle
        self._seq: dict[str, int] = {}        # stream → next entry seq
        os.makedirs(out_dir, exist_ok=True)

    def _file(self, stream: str):
        fh = self._files.get(stream)
        if fh is None:
            path = os.path.join(self.out_dir, f"{stream}.stream.jsonl")
            fh = open(path, "ab")
            self._files[stream] = fh
            self._seq[stream] = self._count_entries(path)
        return fh

    @staticmethod
    def _count_entries(path: str) -> int:
        try:
            with open(path, "rb") as f:
                return sum(1 for _ in f)
        except FileNotFoundError:
            return 0

    def _xadd(self, stream: str, key: str, value: str) -> int:
        """≙ client.xadd(stream, null, {key: value}) — swap for a real
        client here."""
        seq = self._seq[stream]
        entry = {"id": f"{seq}-0", "key": key, "value": value}
        data = (json.dumps(entry) + "\n").encode()
        self._file(stream).write(data)
        self._seq[stream] = seq + 1
        return len(data)

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
        values = self.to_json_lines(batch).to_pylist()
        nbytes = 0
        for i in range(batch.num_rows):
            stream = self.stream_mapper(dests[i])
            parts = [p[i] for p in key_parts]
            key = "\x1f".join(str(p) for p in parts) \
                if parts and not all(p is None for p in parts) else NULL_KEY
            self._file(stream)          # ensure counter loaded
            nbytes += self._xadd(stream, key, values[i])
        for fh in self._files.values():  # ≙ markBatchFinished barrier
            fh.flush()
        return self.receipt(self.stream_mapper(dests[0]),
                            batch.num_rows, nbytes)

    def __del__(self):
        for fh in self._files.values():
            try:
                fh.close()
            except Exception:
                pass


def xrange(out_dir: str, stream: str, lo: int = 0,
           hi: int | None = None) -> list[dict]:
    """Consumer-side XRANGE analogue: entries of ``stream`` with seq in
    [lo, hi] in id order (the file IS id-ordered by construction)."""
    path = os.path.join(out_dir, f"{stream}.stream.jsonl")
    out = []
    with open(path, "rb") as f:
        for raw in f:
            e = json.loads(raw)
            seq = int(e["id"].split("-")[0])
            if seq < lo or (hi is not None and seq > hi):
                continue
            out.append(e)
    return out
