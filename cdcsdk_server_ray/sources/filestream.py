"""File-stream source — tail a growing text file as a change stream.

Reference analogue: Kafka Connect's ``FileStreamSourceConnector`` as the
reference engine's own test harness drives it
(/root/reference/cdcsdk-engine/src/test/java/com/yugabyte/cdcsdk/engine/EmbeddedEngineTest.java:104-119
and :194-240): every line of a text file is one record on a configured
topic, the source offset is the BYTE position after the last consumed
line, and a restarted engine resumes from the stored offset — lines
already delivered are not re-emitted, lines appended while the engine was
down are.

Ray-Data-first shape: a poll snapshots the file size, splits the
``[from_offset, eof)`` byte span into newline-aligned chunks, and reads
each chunk in its own Ray task (``from_items`` of ranges →
``map_batches``), so a cold start over a huge backlog file parallelises
instead of funnelling through the driver. Chunk ownership uses the
standard distributed-text-split protocol: a line belongs to the chunk
containing its FIRST byte; a reader that does not start at a line
boundary skips to its first newline, and the final straddling line is
completed by reading past the chunk end. Only complete (``\\n``-terminated)
lines are consumed — a trailing partial line stays pending for the next
poll, exactly like the reference connector's tail behaviour.

Offsets are persisted as an atomically-replaced JSON sidecar, mirroring
the reference's ``OFFSET_STORAGE_FILE_FILENAME_CONFIG`` standalone file
store (EmbeddedEngineTest.java:118,157).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

import ray
import ray.data

_READ_STEP = 1 << 16


def _chunk_lines(path: str, start: int, end: int, eof: int,
                 at_line_start: bool) -> tuple[bytes, int]:
    """Return (raw bytes of the complete lines owned by [start, end), and
    the absolute offset of the first owned line). Lines are owned by the
    chunk containing their first byte; the final straddling line is read
    past ``end`` (never past ``eof``)."""
    with open(path, "rb") as f:
        if not at_line_start:
            f.seek(start - 1)
            if f.read(1) != b"\n":
                # mid-line: the previous chunk owns it; skip to the next
                # newline (scanning forward, possibly past end).
                pos = start
                while pos < eof:
                    step = f.read(min(_READ_STEP, eof - pos))
                    if not step:
                        return b"", start
                    i = step.find(b"\n")
                    if i >= 0:
                        start = pos + i + 1
                        break
                    pos += len(step)
                else:
                    return b"", start
                if start >= end:
                    # the skipped line covered the whole chunk
                    return b"", start
        if start >= end:
            return b"", start
        f.seek(start)
        data = bytearray(f.read(end - start))
        # complete the final straddling line from the next chunk's bytes
        while (not data or data[-1] != 0x0A) and f.tell() < eof:
            step = f.read(min(_READ_STEP, eof - f.tell()))
            if not step:
                break
            i = step.find(b"\n")
            if i >= 0:
                data += step[: i + 1]
                break
            data += step
        # drop a trailing unterminated line (pending until the writer
        # finishes it)
        if data and data[-1] != 0x0A:
            nl = data.rfind(b"\n")
            data = data[: nl + 1] if nl >= 0 else bytearray()
        return bytes(data), start


def _lines_table(raw: bytes, start: int, topic: str) -> pa.Table:
    """Vectorized split of a newline-terminated byte span into the record
    schema (topic, value, position); position = byte offset AFTER each
    line — the connector's resumable source offset."""
    if not raw:
        return pa.table({"topic": pa.array([], pa.string()),
                         "value": pa.array([], pa.string()),
                         "position": pa.array([], pa.int64())})
    lines = raw.split(b"\n")[:-1]
    lens = np.fromiter((len(l) for l in lines), dtype=np.int64,
                       count=len(lines))
    position = start + np.cumsum(lens + 1)
    value = pa.array([l.decode("utf-8", errors="replace") for l in lines],
                     pa.string())
    return pa.table({
        "topic": pa.array([topic] * len(lines), pa.string()),
        "value": value,
        "position": pa.array(position, pa.int64()),
    })


class FileStreamSource:
    """Tail ``path`` line-by-line with byte-offset resume.

    ``poll(from_offset)`` returns ``(dataset, next_offset)``: a
    ``ray.data.Dataset`` with columns ``(topic, value, position)`` of every
    complete line in ``[from_offset, size-at-poll)``, and the offset to
    resume from (after the last complete line). Polling again from
    ``next_offset`` never re-delivers a line.
    """

    def __init__(self, path: str, topic: str = "topicX",
                 chunk_bytes: int = 64 << 20):
        if chunk_bytes <= 0:
            raise ValueError("chunk_bytes must be positive")
        self.path = path
        self.topic = topic
        self.chunk_bytes = chunk_bytes

    def poll(self, from_offset: int = 0) -> tuple[ray.data.Dataset, int]:
        eof = os.path.getsize(self.path)
        if eof < from_offset:
            raise ValueError(
                f"{self.path} truncated below stored offset "
                f"({eof} < {from_offset}); refusing to re-deliver")
        next_offset = self._last_line_end(from_offset, eof)
        span = next_offset - from_offset
        if span <= 0:
            return ray.data.from_arrow(_lines_table(b"", 0, self.topic)), \
                from_offset
        n_chunks = max(1, -(-span // self.chunk_bytes))
        bounds = np.linspace(from_offset, next_offset, n_chunks + 1,
                             dtype=np.int64)
        ranges = [{"start": int(bounds[i]), "end": int(bounds[i + 1]),
                   "at_line_start": i == 0}
                  for i in range(n_chunks)]
        path, topic, eof_cap = self.path, self.topic, next_offset

        def read_range(batch: dict) -> pa.Table:
            tables = []
            for s, e, als in zip(batch["start"], batch["end"],
                                 batch["at_line_start"]):
                raw, line_start = _chunk_lines(path, int(s), int(e),
                                               eof_cap, bool(als))
                tables.append(_lines_table(raw, line_start, topic))
            return pa.concat_tables(tables)

        ds = (ray.data.from_items(ranges, override_num_blocks=n_chunks)
              .map_batches(read_range, batch_format="numpy",
                           batch_size=None))
        return ds, next_offset

    def _last_line_end(self, from_offset: int, eof: int) -> int:
        """Offset just after the last ``\\n`` in [from_offset, eof), or
        ``from_offset`` if none — scans backwards in small steps."""
        with open(self.path, "rb") as f:
            pos = eof
            while pos > from_offset:
                step = min(_READ_STEP, pos - from_offset)
                f.seek(pos - step)
                buf = f.read(step)
                i = buf.rfind(b"\n")
                if i >= 0:
                    return pos - step + i + 1
                pos -= step
        return from_offset


def save_file_offset(store_path: str, offset: int) -> None:
    """Atomic offset persistence (write temp + fsync + rename), the
    standalone file offset store's durability contract
    (EmbeddedEngineTest.java:118)."""
    tmp = store_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"position": int(offset)}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, store_path)


def load_file_offset(store_path: str) -> int:
    """Stored resume offset, or 0 when no offset has been committed."""
    try:
        with open(store_path) as f:
            return int(json.load(f)["position"])
    except FileNotFoundError:
        return 0
