"""Schema-registry analogue for the Avro converter (T7 completion).

Reference: the converting engine wires an Apicurio/Confluent registry
URL into the Avro converter
(/root/reference/cdcsdk-engine/src/main/java/com/yugabyte/cdcsdk/engine/ConvertingEngineBuilder.java:207-226,
ServerApp.java:255-267): the converter registers each writer schema
under a subject, gets back a numeric schema id, and frames every
message with it (Confluent wire format: magic byte 0x00 + 4-byte
big-endian schema id + Avro body) so consumers can fetch the writer
schema by id.

Stand-in (no registry service in the sandbox): a shared-directory
registry where the schema id is derived from the CONTENT HASH of the
canonical schema JSON (low 31 bits of sha256). That makes registration
coordination-free — every node/actor computes the same id for the same
schema with no sequencer to contend on (a deliberate improvement over
sequential ids for a 256-node cluster; the registry directory is only
written for id→schema lookup, with O_EXCL create so concurrent
registrations are idempotent). Subjects record their version history
like the real registry's subject→versions model.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa

MAGIC = b"\x00"   # Confluent wire-format magic byte


def _canonical(schema_json: str) -> str:
    """Canonical form: parsed + re-dumped with sorted keys, no spaces —
    equal schemas hash equal regardless of formatting."""
    return json.dumps(json.loads(schema_json), sort_keys=True,
                      separators=(",", ":"))


def schema_id_of(schema_json: str) -> int:
    canon = _canonical(schema_json)
    digest = hashlib.sha256(canon.encode()).digest()
    return int.from_bytes(digest[:4], "big") & 0x7FFFFFFF


# Avro's promotion lattice (widening reads allowed; spec §Schema
# Resolution). (old, new) pairs a NEW READER may widen old data into.
_PROMOTABLE = {("int", "long"), ("int", "float"), ("int", "double"),
               ("long", "float"), ("long", "double"), ("float", "double")}


def _field_types(schema_json: str) -> dict[str, str]:
    """field → base Avro type name for this repo's flat nullable records
    (type = ["null", T]; logical types resolve to their base)."""
    out = {}
    for f in json.loads(schema_json)["fields"]:
        t = f["type"][1] if isinstance(f["type"], list) else f["type"]
        out[f["name"]] = t["type"] if isinstance(t, dict) else t
    return out


def _reader_can_read(reader_json: str, writer_json: str) -> list[str]:
    """Violations preventing ``reader`` from decoding ``writer`` data.
    Flat nullable records: added reader fields default to null (fine),
    dropped writer fields are skipped (fine); shared fields must match
    or promote writer→reader."""
    reader, writer = _field_types(reader_json), _field_types(writer_json)
    bad = []
    for name, wt in writer.items():
        rt = reader.get(name)
        if rt is None or rt == wt or (wt, rt) in _PROMOTABLE:
            continue
        bad.append(f"field {name!r}: {wt} -> {rt} is a narrowing")
    return bad


def check_compatibility(old_json: str, new_json: str, mode: str) -> None:
    """≙ the registry compatibility gate the reference's Apicurio/
    Confluent wiring implies (ConvertingEngineBuilder.java:207-226):
    BACKWARD = new schema reads old data, FORWARD = old schema reads new
    data, FULL = both, NONE = skip. Raises ValueError on violation."""
    mode = mode.lower()
    if mode == "none":
        return
    bad: list[str] = []
    if mode in ("backward", "full"):
        bad += [f"BACKWARD: {v}"
                for v in _reader_can_read(new_json, old_json)]
    if mode in ("forward", "full"):
        bad += [f"FORWARD: {v}"
                for v in _reader_can_read(old_json, new_json)]
    if mode not in ("backward", "forward", "full"):
        raise ValueError(f"unknown compatibility mode {mode!r}")
    if bad:
        raise ValueError("schema incompatible with latest subject "
                         "version: " + "; ".join(bad))


class SchemaRegistry:
    """File-backed registry: ``register`` is idempotent and
    coordination-free; ``get`` resolves id → schema for consumers.
    ``compatibility`` gates registration against the subject's LATEST
    version (Confluent's default mode is backward)."""

    def __init__(self, root: str, compatibility: str = "backward"):
        self.root = root
        self.compatibility = compatibility
        os.makedirs(root, exist_ok=True)

    def _schema_path(self, schema_id: int) -> str:
        return os.path.join(self.root, f"schema-{schema_id}.json")

    def _subject_dir(self, subject: str) -> str:
        return os.path.join(self.root, "subjects", subject)

    def _latest_path(self, subject: str) -> str:
        return os.path.join(self._subject_dir(subject), "latest")

    def latest(self, subject: str) -> str | None:
        """Canonical JSON of the subject's most recently registered
        schema (None = fresh subject)."""
        try:
            with open(self._latest_path(subject)) as f:
                return self.get(int(f.read().strip()))
        except FileNotFoundError:
            return None

    def register(self, subject: str, schema_json: str) -> int:
        canon = _canonical(schema_json)
        sid = schema_id_of(canon)
        prev = self.latest(subject)
        if prev is not None and prev != canon:
            check_compatibility(prev, canon, self.compatibility)
        path = self._schema_path(sid)
        if os.path.exists(path):
            # a 31-bit id collision between DIFFERENT schemas must fail
            # loudly here — silently sharing an id would decode every
            # later message against the wrong writer schema
            with open(path) as f:
                if f.read() != canon:
                    raise ValueError(
                        f"schema id {sid} collision: different schema "
                        "already registered under this content hash")
        else:
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                f.write(canon)
            os.replace(tmp, path)     # concurrent same-content races benign
        sdir = self._subject_dir(subject)
        os.makedirs(sdir, exist_ok=True)
        try:
            # one marker per (subject, schema): version = registration order
            fd = os.open(os.path.join(sdir, f"{sid}.v"),
                         os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
        except FileExistsError:
            pass                      # already registered under this subject
        # atomic latest pointer — what the NEXT register compat-checks
        lp = self._latest_path(subject)
        tmp = f"{lp}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(str(sid))
        os.replace(tmp, lp)
        return sid

    def get(self, schema_id: int) -> str:
        with open(self._schema_path(schema_id)) as f:
            return f.read()

    def versions(self, subject: str) -> list[int]:
        try:
            return sorted(int(f[:-2]) for f in
                          os.listdir(self._subject_dir(subject))
                          if f.endswith(".v"))
        except FileNotFoundError:
            return []


def frame(schema_id: int, body: bytes) -> bytes:
    """Confluent wire format: 0x00 + 4-byte BE schema id + payload."""
    return MAGIC + schema_id.to_bytes(4, "big") + body


def unframe(msg: bytes) -> tuple[int, bytes]:
    if msg[:1] != MAGIC:
        raise ValueError("not a registry-framed message (bad magic byte)")
    return int.from_bytes(msg[1:5], "big"), msg[5:]


def to_avro_registry(batch: pa.Table, *, registry_root: str,
                     subject: str = "cdcsdk-events-value") -> pa.Table:
    """value.converter=avro WITH registry framing: the writer schema is
    registered once per actor per schema shape (content-hash id, cached),
    and every record is emitted as a framed Confluent message. Output:
    one ``payload: binary`` column (+ passthrough key columns if present,
    like the other converters in stages/serializers.py)."""
    import pyarrow.compute as pc

    from cdcsdk_server_ray.stages.avro import avro_schema, encode_batch_arrow

    schema_json = avro_schema(batch.schema)
    reg = SchemaRegistry(registry_root)
    sid = reg.register(subject, schema_json)
    bodies = encode_batch_arrow(batch)
    # the 5-byte header is constant per batch — one vectorized prepend
    framed = pc.binary_join_element_wise(
        pa.scalar(frame(sid, b""), pa.binary()), bodies,
        pa.scalar(b"", pa.binary()))
    return pa.table({"payload": framed})
