"""Pravega sink (K10) — transactional and non-transactional writers.

Reference: ``PravegaChangeConsumer``
(/root/reference/cdcsdk-server/cdcsdk-server-pravega/src/main/java/io/debezium/server/pravega/PravegaChangeConsumer.java:77-147):
two implementations behind one ``transaction`` flag (default false).

- Non-txn (:86-108): one ``EventStreamWriter`` per mapped stream,
  ``writeEvent(key, value)`` when the record has a key (routing key →
  per-key ordering) else ``writeEvent(value)``; records marked processed
  as they are written.
- Txn (:118-147): one ``Transaction`` per stream per batch; every record
  is written INTO the txn; at batch end every stream's txn COMMITS (or
  the failure propagates and nothing becomes visible) — batch-atomic
  visibility per stream, the strongest delivery contract in the
  reference's sink family.

Stand-in (no broker in the sandbox): a stream is a directory of
committed ``segment-<n>-<writer>.jsonl`` files — the writer token makes
segment names collision-free when several pool actors commit to the
same stream concurrently (two writers may claim the same ``n``; neither
rename can clobber the other, and Pravega guarantees no cross-writer
order anyway). A transaction is a staged file
(``txn-<token>.jsonl.staged``) invisible to :func:`read_stream`; commit
is an fsync + atomic rename into the segment sequence — the same
staged-then-publish move the engine's manifest uses (state/lake.py),
which is exactly why Pravega's txn API maps onto this engine so
cleanly. Abort (or a crash before commit) leaves only ``.staged``
garbage that readers never see.

Atomicity grain, exactly like the reference: per STREAM txn. The Java
loop (:135-146) commits each stream's txn in turn, so a failure midway
leaves earlier streams' txns durably committed while later ones abort;
this stand-in mirrors that (prepare all → publish all, aborting only
unpublished txns on failure) and reports which streams committed in the
raised error instead of claiming nothing became visible.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa

from cdcsdk_server_ray.sinks.base import BaseSink, identity_stream_mapper


class TxnFailedError(RuntimeError):
    """≙ TxnFailedException — the batch aborts; nothing became visible."""


def _stream_dir(out_dir: str, stream: str) -> str:
    return os.path.join(out_dir, stream)


def _next_segment(d: str) -> int:
    try:
        segs = [int(f.split("-")[1].split(".")[0]) for f in os.listdir(d)
                if f.startswith("segment-") and f.endswith(".jsonl")]
    except FileNotFoundError:
        return 0
    return max(segs) + 1 if segs else 0


class _Txn:
    """One open transaction on one stream: buffered writes, staged file,
    commit = prepare (fsync + close) then publish (atomic rename into
    the visible segment sequence under a writer-unique name — two
    concurrent committers can pick the same segment number without
    either rename clobbering the other)."""

    def __init__(self, out_dir: str, stream: str):
        self.dir = _stream_dir(out_dir, stream)
        os.makedirs(self.dir, exist_ok=True)
        self._token = uuid.uuid4().hex[:12]
        self.staged = os.path.join(self.dir,
                                   f"txn-{self._token}.jsonl.staged")
        self._fh = open(self.staged, "wb")
        self.nbytes = 0
        self.records = 0
        self._open = True
        self._prepared = False
        self.published = False

    def write_event(self, value: str, key: str | None = None) -> None:
        if not self._open:
            raise TxnFailedError("write on a closed transaction")
        data = (json.dumps({"key": key, "value": value}) + "\n").encode()
        self._fh.write(data)
        self.nbytes += len(data)
        self.records += 1

    def prepare(self) -> None:
        if not self._open:
            raise TxnFailedError("prepare on a closed transaction")
        self._fh.flush()
        os.fsync(self._fh.fileno())
        self._fh.close()
        self._open = False
        self._prepared = True

    def publish(self) -> None:
        if not self._prepared:
            raise TxnFailedError("publish before prepare")
        final = os.path.join(
            self.dir,
            f"segment-{_next_segment(self.dir):09d}-{self._token}.jsonl")
        os.replace(self.staged, final)
        self.published = True

    def commit(self) -> None:
        self.prepare()
        self.publish()

    def abort(self) -> None:
        if self.published:
            return                    # already durably visible; no-op
        if self._open:
            self._fh.close()
            self._open = False
        try:
            os.unlink(self.staged)
        except FileNotFoundError:
            pass


class PravegaSink(BaseSink):
    """Actor-pool sink; ``txn=True`` selects the transactional writer
    (≙ the ``transaction`` config flag, default false like the
    reference's)."""

    def __init__(self, out_dir: str, txn: bool = False,
                 key_cols=("repo", "path"), topic_col: str | None = None,
                 stream_mapper=identity_stream_mapper, **kw):
        super().__init__(stream_mapper=stream_mapper, **kw)
        self.out_dir = out_dir
        self.txn = txn
        self.key_cols = tuple(key_cols)
        self.topic_col = topic_col
        self._writers: dict[str, object] = {}   # non-txn: stream → open segment
        self._token = uuid.uuid4().hex[:12]     # writer-unique segment suffix
        os.makedirs(out_dir, exist_ok=True)

    # -- txn API (exposed so tests/users can drive begin/write/abort) ------
    def begin_txn(self, stream: str) -> _Txn:
        return _Txn(self.out_dir, self.stream_mapper(stream))

    def _rows(self, batch: pa.Table):
        if self.topic_col and self.topic_col in batch.column_names:
            dests = batch[self.topic_col].to_pylist()
        else:
            dests = ["events"] * batch.num_rows
        key_parts = [batch[c].to_pylist() for c in self.key_cols
                     if c in batch.column_names]
        if "payload" in batch.column_names:    # serializer ran upstream
            values = batch["payload"].to_pylist()
        else:
            values = self.to_json_lines(batch).to_pylist()
        for i in range(batch.num_rows):
            parts = [p[i] for p in key_parts]
            key = "\x1f".join(str(p) for p in parts) \
                if parts and not all(p is None for p in parts) else None
            yield dests[i], key, values[i]

    def _writer(self, stream: str):
        """Non-txn: a long-lived open segment per stream per actor (≙ one
        EventStreamWriter per stream, :87-92) — events visible as written."""
        fh = self._writers.get(stream)
        if fh is None:
            d = _stream_dir(self.out_dir, stream)
            os.makedirs(d, exist_ok=True)
            path = os.path.join(
                d, f"segment-{_next_segment(d):09d}-{self._token}.jsonl")
            fh = self._writers[stream] = open(path, "ab")
        return fh

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = self._pre(batch)
        if batch.num_rows == 0:
            return self.receipt("empty", 0, 0)
        total_records = total_bytes = 0
        dest0 = None
        if self.txn:
            # one txn per stream per batch (≙ txns.computeIfAbsent, :125);
            # commits at batch end (≙ the :135-146 commit loop). Atomicity
            # is PER STREAM, as in the reference: prepare every txn first
            # (fsync — the only failure-prone phase), then publish
            # (renames); a failure aborts every UNPUBLISHED txn and the
            # error names any streams whose txns already committed.
            txns: dict[str, _Txn] = {}
            try:
                for dest, key, value in self._rows(batch):
                    stream = self.stream_mapper(dest)
                    dest0 = dest0 or stream
                    t = txns.get(stream)
                    if t is None:
                        t = txns[stream] = _Txn(self.out_dir, stream)
                    t.write_event(value, key=key)
                for t in txns.values():
                    t.prepare()
                for t in txns.values():        # ≙ txns.values().forEach(commit)
                    total_records += t.records
                    total_bytes += t.nbytes
                    t.publish()
            except Exception:
                committed = [s for s, t in txns.items() if t.published]
                for t in txns.values():
                    t.abort()                  # no-op on published txns
                raise TxnFailedError(
                    "batch aborted; no events visible" if not committed
                    else f"batch failed after streams {committed} committed"
                         " (per-stream txn atomicity, as the reference)")
        else:
            # per-record writer: events are visible as written (:96-103)
            for dest, key, value in self._rows(batch):
                stream = self.stream_mapper(dest)
                dest0 = dest0 or stream
                data = (json.dumps({"key": key, "value": value}) + "\n").encode()
                self._writer(stream).write(data)
                total_records += 1
                total_bytes += len(data)
            for fh in self._writers.values():  # ≙ markBatchFinished barrier
                fh.flush()
        return self.receipt(dest0, total_records, total_bytes)

    def __del__(self):
        for fh in self._writers.values():
            try:
                fh.close()
            except Exception:
                pass


def read_stream(out_dir: str, stream: str) -> list[dict]:
    """Consumer-side read: committed segments only, in segment order
    (``.staged`` transactions are invisible — the visibility contract)."""
    d = _stream_dir(out_dir, stream)
    out: list[dict] = []
    try:
        names = sorted(f for f in os.listdir(d)
                       if f.startswith("segment-") and f.endswith(".jsonl"))
    except FileNotFoundError:
        return out
    for name in names:
        with open(os.path.join(d, name), "rb") as f:
            out.extend(json.loads(line) for line in f)
    return out
