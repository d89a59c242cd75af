"""Sink stage base — the Ray-Data form of BaseChangeConsumer.

Reference: every sink implements
``ChangeConsumer.handleBatch(List<ChangeEvent>, RecordCommitter)`` and
extends ``BaseChangeConsumer`` (/root/reference/cdcsdk-server/cdcsdk-server-core/src/main/java/io/debezium/server/BaseChangeConsumer.java:29-95)
with: per-record metrics (Metrics.java:14-24), a ``StreamNameMapper``
(destination → stream name, StreamNameMapper.java:14-16) and payload
coercion helpers (``getBytes``/``getString``, BaseChangeConsumer.java:74-94).

Here a sink is a callable CLASS used as an actor pool:

    receipts = events.map_batches(JsonlDirSink(dir), batch_format="pyarrow",
                                  concurrency=N, batch_size=B)

``__init__`` builds connections/buffers once per actor (≙ @PostConstruct
connect(), S3ChangeConsumer.java:84-121); ``__call__`` delivers one Arrow
batch and returns a small receipt table (destination, records, bytes) —
the lineage/metrics stream. Delivery is at-least-once, exactly like the
reference (offsets commit after delivery); the lake path (engine.py) is
where exactly-once lives.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

RECEIPT_SCHEMA = pa.schema([
    ("destination", pa.string()),
    ("records_written", pa.int64()),
    ("bytes_written", pa.int64()),
])


def identity_stream_mapper(destination: str) -> str:
    """Default StreamNameMapper (identity); override per sink
    (≙ CDI custom StreamNameMapper, BaseChangeConsumer.java:33-47)."""
    return destination


def claim_single_writer(path: str) -> str:
    """Claim exclusive ownership of a log file (O_EXCL ``.owner`` marker).

    The broker-sequence stand-ins (Pulsar message ids, NATS channel
    sequences) mint per-log sequences that only a single writer can keep
    monotonic without a broker to coordinate; a second concurrent writer
    would silently interleave duplicate sequence numbers. This turns
    that misconfiguration into a LOUD error instead: route disjoint
    topics per actor (``topic_col``) or run the sink stage with
    ``concurrency=1``. Returns the marker path for release."""
    import os
    marker = path + ".owner"
    try:
        fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise RuntimeError(
            f"{path} already has a live writer (single-writer broker "
            "stand-in): give each sink actor disjoint topics or run the "
            "stage with concurrency=1") from None
    os.write(fd, str(os.getpid()).encode())
    os.close(fd)
    return marker


def release_single_writer(marker: str) -> None:
    import os
    try:
        os.unlink(marker)
    except (FileNotFoundError, OSError):
        pass


class BaseSink:
    """Shared sink machinery: metrics + destination mapping + serializer."""

    def __init__(self, stream_mapper=identity_stream_mapper,
                 drop_tombstones: bool = False):
        self.stream_mapper = stream_mapper
        self.drop_tombstones = drop_tombstones
        self.records_written = 0   # ≙ cdcsdk.sink.total.recordsWritten
        self.bytes_written = 0     # ≙ cdcsdk.sink.total.bytesWritten

    # -- payload helpers (≙ getBytes/getString coercion) --------------------
    @staticmethod
    def to_json_lines(batch: pa.Table) -> pa.Array:
        """Serialize each row to a canonical JSON line (T7 boundary
        serializer): fixed key order = column order, vectorized via
        pandas string ops for the hot path."""
        import numpy as np
        import pandas as pd

        df = batch.to_pandas()
        parts = []
        for col in df.columns:
            s = df[col]
            if s.dtype.kind in "iu":
                # ints FIRST ('i' used to fall into the float branch,
                # where '%g' truncates to 6 significant digits — an
                # lsn/position ≥ 1e6 came out as 1.23457e+09, corrupting
                # every consumer that resumes from it)
                vals = s.astype(str).to_numpy()
            elif s.dtype.kind == "f":
                # numpy str-cast = shortest round-trip repr, exact
                vals = np.where(s.isna(), "null",
                                s.fillna(0).to_numpy().astype(str))
            else:
                esc = (s.fillna("").astype(str)
                       .str.replace("\\", "\\\\", regex=False)
                       .str.replace('"', '\\"', regex=False)
                       .str.replace("\n", "\\n", regex=False)
                       .str.replace("\r", "\\r", regex=False)
                       .str.replace("\t", "\\t", regex=False))
                vals = np.where(s.isna(), "null", '"' + esc + '"')
            parts.append('"' + str(col) + '":' + pd.Series(vals, index=df.index))
        line = parts[0]
        for p in parts[1:]:
            line = line + "," + p
        return pa.array("{" + line + "}")

    def _pre(self, batch: pa.Table) -> pa.Table:
        if self.drop_tombstones:
            if "op" in batch.column_names:
                batch = batch.filter(pc.not_equal(batch["op"], "d"))
            elif batch.num_rows:
                # a serializer upstream collapsed the record to a payload
                # column — tombstones are no longer identifiable here, so
                # silently honoring the flag is impossible: fail loudly
                # (filter BEFORE serializing, or drop the flag)
                raise ValueError(
                    "drop_tombstones=True but the batch has no 'op' "
                    "column (serialized upstream?) — apply "
                    "drop_tombstones before the serializer instead")
        return batch

    def receipt(self, destination: str, records: int, nbytes: int) -> pa.Table:
        self.records_written += records
        self.bytes_written += nbytes
        return pa.Table.from_pylist(
            [{"destination": destination, "records_written": records,
              "bytes_written": nbytes}], schema=RECEIPT_SCHEMA)
