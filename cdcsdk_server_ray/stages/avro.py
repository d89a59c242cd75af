"""Pure-Python Avro binary encoder/decoder for FLAT records.

Closes the one declared hole in the converter family (T7): the reference
selects an Avro converter by config (ConvertingEngineBuilder.java:207-226,
ServerApp.java:255-267) and no Avro library is baked into this sandbox —
but Avro's binary encoding for flat records is a tiny public spec
(https://avro.apache.org/docs/current/specification/): zigzag-varint
longs, length-prefixed utf-8/bytes, IEEE little-endian floats, and
union-index prefixes for nullable fields. Records are field values
concatenated in schema order; no container framing here (the sink owns
framing, as the reference's converter returns bare byte[] per record).

The writer schema is derived from the Arrow schema; every field is the
nullable union ``["null", T]`` (CDC payload columns are nullable by
construction — deletes null the payload). The decoder exists for tests
(round-trip) and for a consumer-side unwrap.
"""

from __future__ import annotations

import json
import struct

import numpy as np
import pyarrow as pa

_ARROW_TO_AVRO = [
    (pa.types.is_boolean, "boolean"),
    (lambda t: pa.types.is_integer(t) and t.bit_width <= 32, "int"),
    (pa.types.is_integer, "long"),
    (pa.types.is_float32, "float"),
    (pa.types.is_floating, "double"),
    (pa.types.is_string, "string"),
    (pa.types.is_large_string, "string"),
    (pa.types.is_binary, "bytes"),
    (pa.types.is_large_binary, "bytes"),
]


def _avro_type(t: pa.DataType) -> str | dict:
    if pa.types.is_timestamp(t):
        # logical types ride on long (spec: timestamp-millis/micros);
        # s/ns units are CAST to the declared unit at encode time
        # (encode_batch) — declaring micros while writing raw ns counts
        # would put consumers off by 1000×
        unit = ("timestamp-millis" if t.unit in ("s", "ms")
                else "timestamp-micros")
        return {"type": "long", "logicalType": unit}
    for pred, name in _ARROW_TO_AVRO:
        if pred(t):
            return name
    raise TypeError(f"unsupported Arrow type for flat Avro record: {t}")


def avro_schema(schema: pa.Schema, name: str = "ChangeEvent") -> str:
    """Writer schema JSON for a flat Arrow schema; all fields nullable."""
    fields = [{"name": f.name, "type": ["null", _avro_type(f.type)],
               "default": None} for f in schema]
    return json.dumps({"type": "record", "name": name, "fields": fields})


def _zigzag(n: int) -> bytes:
    """Avro long: zigzag then base-128 varint, little-endian groups."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_value(t: pa.DataType, v) -> bytes:
    if pa.types.is_boolean(t):
        return b"\x01" if v else b"\x00"
    if pa.types.is_integer(t):
        return _zigzag(int(v))
    if pa.types.is_float32(t):
        return struct.pack("<f", float(v))
    if pa.types.is_floating(t):
        return struct.pack("<d", float(v))
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        b = v.encode("utf-8")
        return _zigzag(len(b)) + b
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return _zigzag(len(v)) + v
    if pa.types.is_timestamp(t):
        return _zigzag(int(v.value if hasattr(v, "value") else v))
    raise TypeError(f"unsupported Arrow type: {t}")


def _encode_batch_rows(batch: pa.Table) -> list[bytes]:
    """Reference per-row encoder (the pre-vectorization path) — kept as
    the parity baseline and the fallback for types the columnar kernel
    doesn't cover. Avro binary is canonical, so the two paths must agree
    byte-for-byte (pinned by test_avro_vectorized_matches_rows)."""
    cols = []
    for f in batch.schema:
        col = batch[f.name]
        if pa.types.is_timestamp(f.type):
            # cast to the unit the writer schema DECLARES (s→ms, ns→us;
            # ms/us pass through) so the long matches the logicalType
            declared = "ms" if f.type.unit in ("s", "ms") else "us"
            vals = (col.cast(pa.timestamp(declared))
                    .cast(pa.int64()).to_pylist())
        else:
            vals = col.to_pylist()
        cols.append((f.type, vals))
    out = []
    for i in range(batch.num_rows):
        buf = bytearray()
        for t, vals in cols:
            v = vals[i]
            if v is None:
                buf += b"\x00"          # union branch 0: null
            else:
                buf += b"\x02"          # union branch 1: the value
                buf += _encode_value(t if not pa.types.is_timestamp(t)
                                     else pa.int64(), v)
        out.append(bytes(buf))
    return out


# ---- vectorized columnar encoder ------------------------------------------
# The per-row loop above is far too slow to sit on the sink hot path of
# a changefeed export (VERDICT r03): the kernels below build each
# column's wire bytes with numpy (vectorized zigzag-varint) and do ALL
# byte interleaving with Arrow C++ kernels (binary_join_element_wise /
# if_else) — no per-row Python, no giant gather-index arrays (a scatter
# design measured SLOWER here: this box page-faults on fresh 100MB+
# numpy allocations, see BASELINE.md's fault-path probes).

def zigzag64(v: np.ndarray) -> np.ndarray:
    """Vectorized Avro zigzag for int64 → uint64."""
    v = v.astype(np.int64, copy=False)
    return ((v.astype(np.uint64) << np.uint64(1))
            ^ (v >> np.int64(63)).astype(np.uint64))


def varint_encode(z: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized base-128 varint of uint64 values: returns
    (flat_bytes row-major, per-value byte lengths)."""
    n = len(z)
    if n == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int64)
    groups = np.empty((n, 10), np.uint8)
    zz = z.copy()
    for k in range(10):
        groups[:, k] = (zz & np.uint64(0x7F)).astype(np.uint8)
        zz >>= np.uint64(7)
    nz = groups != 0
    has = nz.any(axis=1)
    last = np.where(has, 9 - np.argmax(nz[:, ::-1], axis=1), 0)
    ar = np.arange(10)[None, :]
    groups |= ((ar < last[:, None]).astype(np.uint8) << 7)  # continuation
    valid = ar <= last[:, None]
    return groups[valid], (last + 1).astype(np.int64)


def _bin_from_flat(flat: np.ndarray, lens: np.ndarray) -> pa.Array:
    """Binary array over a row-major flat byte stream: value i =
    flat[cumsum(lens)[i-1] : cumsum(lens)[i]] — zero-copy buffers.

    Batches whose encoded column exceeds int32 offset range (2 GiB)
    switch to large_binary with int64 offsets instead of silently
    overflowing the offsets into corrupt payloads."""
    total = int(lens.sum())
    if total < 2**31:
        offsets = np.empty(len(lens) + 1, np.int32)
        typ = pa.binary()
    else:
        offsets = np.empty(len(lens) + 1, np.int64)
        typ = pa.large_binary()
    offsets[0] = 0
    np.cumsum(lens, out=offsets[1:])
    # py_buffer over the ndarrays is zero-copy (the buffer holds a
    # reference); .tobytes() here copied the full payload once per batch
    return pa.Array.from_buffers(
        typ, len(lens),
        [None, pa.py_buffer(offsets),
         pa.py_buffer(np.ascontiguousarray(flat))])


_EMPTY_BIN = pa.scalar(b"", pa.binary())
_EMPTY_LARGE = pa.scalar(b"", pa.large_binary())


def _join_bin(*arrs: pa.Array) -> pa.Array:
    """binary_join_element_wise over arrays that may mix binary /
    large_binary: when any input carries int64 offsets (an encoded
    column past 2 GiB) every input is upcast to large_binary with the
    matching separator, so the overflow fallback actually flows through
    the joins instead of tripping Arrow's same-type requirement."""
    import pyarrow.compute as pc

    if any(pa.types.is_large_binary(a.type) for a in arrs):
        arrs = tuple(a if pa.types.is_large_binary(a.type)
                     else a.cast(pa.large_binary()) for a in arrs)
        return pc.binary_join_element_wise(*arrs, _EMPTY_LARGE)
    return pc.binary_join_element_wise(*arrs, _EMPTY_BIN)


def _column_wire(col: pa.ChunkedArray | pa.Array,
                 typ: pa.DataType) -> pa.Array:
    """One column's Avro wire bytes per row as a binary array, INCLUDING
    the nullable-union prefix byte (0x00 null / 0x02 value). All byte
    interleaving happens in Arrow C++ kernels (binary_join / if_else) —
    no per-row Python and no giant gather-index arrays."""
    import pyarrow.compute as pc

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if pa.types.is_timestamp(typ):
        declared = "ms" if typ.unit in ("s", "ms") else "us"
        arr = arr.cast(pa.timestamp(declared)).cast(pa.int64())
        typ = pa.int64()
    valid = arr.is_valid()
    valid_np = np.asarray(valid)
    prefix = _bin_from_flat(np.where(valid_np, 0x02, 0x00).astype(np.uint8),
                            np.ones(n, np.int64))

    if pa.types.is_boolean(typ):
        body = _bin_from_flat(
            np.asarray(arr.fill_null(False)).astype(np.uint8),
            np.ones(n, np.int64))
    elif pa.types.is_integer(typ):
        v = arr.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        body = _bin_from_flat(*varint_encode(zigzag64(v)))
    elif pa.types.is_float32(typ):
        v = arr.fill_null(0.0).to_numpy(zero_copy_only=False) \
            .astype(np.float32)
        body = _bin_from_flat(v.view(np.uint8), np.full(n, 4, np.int64))
    elif pa.types.is_floating(typ):
        v = arr.fill_null(0.0).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        body = _bin_from_flat(v.view(np.uint8), np.full(n, 8, np.int64))
    elif (pa.types.is_string(typ) or pa.types.is_large_string(typ)
          or pa.types.is_binary(typ) or pa.types.is_large_binary(typ)):
        content = arr.fill_null(b"")
        if pa.types.is_string(content.type):
            content = content.cast(pa.binary())
        elif pa.types.is_large_string(content.type):
            content = content.cast(pa.large_binary())
        lens = pc.binary_length(content).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if pa.types.is_large_binary(content.type) \
                and int(lens.sum()) < 2**31:
            # small data in a large-offset container: narrow so the
            # common case keeps the stable binary output type
            content = content.cast(pa.binary())
        len_prefix = _bin_from_flat(*varint_encode(zigzag64(lens)))
        body = _join_bin(len_prefix, content)
    else:
        raise TypeError(f"unsupported Arrow type: {typ}")

    # null rows contribute only the union prefix byte
    empty = _EMPTY_LARGE if pa.types.is_large_binary(body.type) \
        else _EMPTY_BIN
    body = pc.if_else(valid, body, empty)
    return _join_bin(prefix, body)


def encode_batch_arrow(batch: pa.Table) -> pa.Array:
    """Vectorized batch encode → a zero-copy Arrow binary array (the
    offsets/data buffers are built directly; no per-row bytes objects).
    Falls back to the per-row reference path on types the columnar
    kernels don't cover."""
    import pyarrow.compute as pc

    try:
        cols = [_column_wire(batch[f.name], f.type) for f in batch.schema]
    except TypeError:
        return pa.array(_encode_batch_rows(batch), pa.binary())
    if batch.num_rows == 0:
        return pa.array([], pa.binary())
    if len(cols) == 1:
        return cols[0]
    # a 2 GiB+ encoded column upgrades the whole record array to
    # large_binary (int64 offsets) — correct bytes instead of silently
    # overflowed int32 offsets; sub-bound batches keep plain binary
    return _join_bin(*cols)


def encode_batch(batch: pa.Table) -> list[bytes]:
    """One Avro-binary record per row (fields in schema order; nullable
    union prefix 0x00=null / 0x02=value). List-of-bytes convenience over
    :func:`encode_batch_arrow`."""
    return encode_batch_arrow(batch).to_pylist()


# ---- decoder (tests / consumer-side unwrap) ------------------------------

def _read_zigzag(buf: bytes, pos: int) -> tuple[int, int]:
    shift = z = 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos


def _decode_value(name: str, buf: bytes, pos: int):
    if name == "boolean":
        return buf[pos] == 1, pos + 1
    if name in ("int", "long"):
        return _read_zigzag(buf, pos)
    if name == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if name == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if name == "string":
        n, pos = _read_zigzag(buf, pos)
        return buf[pos:pos + n].decode("utf-8"), pos + n
    if name == "bytes":
        n, pos = _read_zigzag(buf, pos)
        return bytes(buf[pos:pos + n]), pos + n
    raise TypeError(f"unsupported Avro type: {name}")


def decode_record(payload: bytes, schema_json: str) -> dict:
    """Decode one flat record against its writer schema (tests)."""
    schema = json.loads(schema_json)
    pos, out = 0, {}
    for f in schema["fields"]:
        branch, pos = _read_zigzag(payload, pos)
        if branch == 0:
            out[f["name"]] = None
            continue
        t = f["type"][1]
        name = t["type"] if isinstance(t, dict) else t
        out[f["name"]], pos = _decode_value(name, payload, pos)
    if pos != len(payload):
        raise ValueError(f"trailing bytes: {len(payload) - pos}")
    return out
