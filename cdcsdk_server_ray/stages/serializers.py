"""Boundary serializers — the key/value converter family (T7).

Reference: ``ConvertingEngineBuilder`` converts each record's key/value to
JSON / Avro / Protobuf / CloudEvents at the sink boundary
(/root/reference/cdcsdk-engine/src/main/java/com/yugabyte/cdcsdk/engine/ConvertingEngineBuilder.java:150-234;
format selection ServerApp.java:255-267). Internally this engine stays
Arrow (the converters exist only at the edge); each serializer here is a
``pa.Table → pa.Table`` batch op emitting a ``payload`` column.

Coverage in this sandbox:
- JSON: full (vectorized; sinks/base.py::to_json_lines)
- CloudEvents v1.0 structured-JSON: full (it's a JSON envelope)
- Protobuf: wire-format encoding of the flat record via the installed
  ``google.protobuf`` runtime (a generic struct message — no codegen in
  the sandbox, schema registry is out of scope)
- Avro: binary encoding of the flat record against an Arrow-derived
  writer schema (stages/avro.py — pure-Python, spec-direct; no container
  framing, matching the converter's bare byte[] contract).
- Avro + registry: ``stages/schema_registry.py::to_avro_registry`` adds
  the Apicurio/Confluent wiring (subject registration, content-hash
  schema ids, 0x00+id wire framing) over a shared-directory registry.
"""

from __future__ import annotations

import pyarrow as pa

from cdcsdk_server_ray.sinks.base import BaseSink


def to_json(batch: pa.Table) -> pa.Table:
    """value.converter=json with schemas.enable=false (payload only)."""
    return pa.table({"payload": BaseSink.to_json_lines(batch)})


def to_cloudevents(batch: pa.Table, *, source: str = "/cdcsdk-ray",
                   event_type: str = "io.cdcsdk.changeevent",
                   id_col: str = "lsn") -> pa.Table:
    """CloudEvents v1.0 structured JSON (≙ CloudEventsConverter).

    Envelope attrs: specversion/id/source/type + data = the flat record.
    id = the record's LSN — deterministic, replay-stable (no UUIDs).
    """
    import json as _json

    import pyarrow.compute as pc

    data = BaseSink.to_json_lines(batch)
    ids = pc.cast(batch[id_col], pa.string())
    # json.dumps the caller-supplied attrs: a quote/backslash in source
    # or type must not break every payload in the batch. Constants pass
    # as SCALARS (broadcast by the kernel) — no per-row constant arrays.
    head = pa.scalar('{"specversion":"1.0","id":"')
    mid = pa.scalar('","source":' + _json.dumps(source)
                    + ',"type":' + _json.dumps(event_type)
                    + ',"datacontenttype":"application/json","data":')
    tail = pa.scalar("}")
    payload = pc.binary_join_element_wise(head, ids, mid, data, tail, "")
    return pa.table({"payload": payload})


def _to_protobuf_rows(batch: pa.Table) -> pa.Table:
    """Reference per-row path (pre-vectorization): struct_pb2 +
    json_format per row. Kept as the fallback for types the columnar
    encoder doesn't cover and as the parity baseline in tests."""
    from google.protobuf import json_format, struct_pb2

    rows = batch.to_pylist()
    payloads = []
    for row in rows:
        s = struct_pb2.Struct()
        json_format.ParseDict(
            {k: (v if not hasattr(v, "isoformat") else v.isoformat())
             for k, v in row.items() if v is not None}, s)
        payloads.append(s.SerializeToString())
    return pa.table({"payload": pa.array(payloads, pa.binary())})


_PB_EMPTY = pa.scalar(b"", pa.binary())


def _pb_entry_for_column(col, name: str) -> "pa.Array":
    """google.protobuf.Struct map-entry wire bytes per row for one
    column (b'' for null rows — ParseDict skips None keys). Fixed-width
    values (number/bool) collapse to one flat-buffer build; strings use
    Arrow join kernels around the zero-copy content buffer."""
    import numpy as np
    import pyarrow.compute as pc

    from cdcsdk_server_ray.stages.avro import (_bin_from_flat,
                                               varint_encode)

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    typ = arr.type
    valid = arr.is_valid()
    key = name.encode()
    if len(key) > 100:
        # single-byte length prefixes below assume short keys; longer
        # ones take the per-row fallback
        raise TypeError(f"column name too long for fast path: {name!r}")
    keypart = b"\x0a" + bytes([len(key)]) + key       # field 1: map key

    def fixed_entry(vmsg_mat: np.ndarray) -> pa.Array:
        # entry = 0x0A varint(len) keypart 0x12 varint(|vmsg|) vmsg —
        # everything but vmsg's payload bytes is constant per column
        vlen = vmsg_mat.shape[1]
        valpart_head = b"\x12" + bytes([vlen])
        entry_len = len(keypart) + len(valpart_head) + vlen
        head = b"\x0a" + bytes([entry_len]) + keypart + valpart_head
        hb = np.frombuffer(head, np.uint8)
        flat = np.empty((n, len(head) + vlen), np.uint8)
        flat[:, :len(head)] = hb
        flat[:, len(head):] = vmsg_mat
        return _bin_from_flat(flat.reshape(-1),
                              np.full(n, flat.shape[1], np.int64))

    if pa.types.is_boolean(typ):
        vmsg = np.empty((n, 2), np.uint8)
        vmsg[:, 0] = 0x20                              # Value.bool_value
        vmsg[:, 1] = np.asarray(arr.fill_null(False)).astype(np.uint8)
        entry = fixed_entry(vmsg)
    elif pa.types.is_integer(typ) or pa.types.is_floating(typ):
        v = arr.fill_null(0).to_numpy(zero_copy_only=False) \
            .astype(np.float64)                        # ParseDict: double
        vmsg = np.empty((n, 9), np.uint8)
        vmsg[:, 0] = 0x11                              # Value.number_value
        vmsg[:, 1:] = v.view(np.uint8).reshape(n, 8)
        entry = fixed_entry(vmsg)
    elif (pa.types.is_string(typ) or pa.types.is_large_string(typ)
          or pa.types.is_timestamp(typ)):
        if pa.types.is_timestamp(typ):
            # ISO-8601 text like the per-row path's .isoformat(); the
            # vectorized convention always carries 6-digit microseconds
            # (Arrow's %S renders the unit's full fractional part)
            content = pc.strftime(arr.cast(pa.timestamp("us")),
                                  format="%Y-%m-%dT%H:%M:%S")
        else:
            content = arr
        content = content.fill_null("").cast(pa.binary())
        s_len = pc.binary_length(content).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v1_flat, v1_lens = varint_encode(s_len.astype(np.uint64))
        vmsg_len = 1 + v1_lens + s_len                 # 0x1A v1 content
        v2_flat, v2_lens = varint_encode(vmsg_len.astype(np.uint64))
        entry_len = len(keypart) + 1 + v2_lens + vmsg_len
        v3_flat, v3_lens = varint_encode(entry_len.astype(np.uint64))
        entry = pc.binary_join_element_wise(
            pa.scalar(b"\x0a", pa.binary()),
            _bin_from_flat(v3_flat, v3_lens),
            pa.scalar(keypart + b"\x12", pa.binary()),
            _bin_from_flat(v2_flat, v2_lens),
            pa.scalar(b"\x1a", pa.binary()),           # Value.string_value
            _bin_from_flat(v1_flat, v1_lens),
            content, _PB_EMPTY)
    else:
        raise TypeError(f"unsupported Arrow type for Struct: {typ}")

    return pc.if_else(valid, entry, _PB_EMPTY)


def to_protobuf(batch: pa.Table) -> pa.Table:
    """Generic protobuf encoding of each row as a
    google.protobuf.Struct (map<string, Value> wire format) — the
    no-codegen analogue of the reference's ProtobufConverter. Vectorized:
    per-column wire kernels + Arrow join (the per-row
    json_format.ParseDict path was the sink hot-path bottleneck,
    VERDICT r03); falls back to it for uncovered types. Output: binary
    payload column, parseable by struct_pb2.Struct.FromString."""
    import pyarrow.compute as pc

    try:
        entries = [_pb_entry_for_column(batch[name], name)
                   for name in batch.column_names]
    except TypeError:
        return _to_protobuf_rows(batch)
    if batch.num_rows == 0:
        return pa.table({"payload": pa.array([], pa.binary())})
    payload = entries[0] if len(entries) == 1 else \
        pc.binary_join_element_wise(*entries, _PB_EMPTY)
    return pa.table({"payload": payload})


def to_avro(batch: pa.Table) -> pa.Table:
    """value.converter=avro (≙ ConvertingEngineBuilder.java:207-226):
    one Avro-binary record per row, writer schema derived from the Arrow
    schema. Pure-Python spec encoder — see stages/avro.py."""
    from cdcsdk_server_ray.stages.avro import encode_batch_arrow

    return pa.table({"payload": encode_batch_arrow(batch)})
