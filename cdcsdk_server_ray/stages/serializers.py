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


def to_protobuf(batch: pa.Table) -> pa.Table:
    """Generic protobuf encoding via google.protobuf.struct_pb2.Struct
    (map<string, Value> wire format) — the no-codegen analogue of the
    reference's ProtobufConverter. Output: binary payload column."""
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


def to_avro(batch: pa.Table) -> pa.Table:
    """value.converter=avro (≙ ConvertingEngineBuilder.java:207-226):
    one Avro-binary record per row, writer schema derived from the Arrow
    schema. Pure-Python spec encoder — see stages/avro.py."""
    from cdcsdk_server_ray.stages.avro import encode_batch

    return pa.table({"payload": pa.array(encode_batch(batch), pa.binary())})
