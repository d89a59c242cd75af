"""Envelope batch operators — the Ray-Data form of the reference SMT chain.

Reference analogues:

- ``unwrap`` ≙ YBExtractNewRecordState: collapse the YugabyteDB per-cell
  ``{value: x}`` wrapper (wired at
  /root/reference/cdcsdk-server/cdcsdk-server-core/src/main/java/com/yugabyte/cdcsdk/server/ServerApp.java:173-177).
- ``flatten`` ≙ ExtractNewRecordState (Debezium "FLATTEN"): replace the
  envelope with the flat ``after`` image plus key/ordering columns
  (/root/reference/README.md:317-328, chain wiring ServerApp.java:167-185).
- ``drop_tombstones`` ≙ sink tombstone opt-out
  (ServerApp.java:214-216, PubSubChangeConsumer.java:158-161).
- ``route_destination`` ≙ RegexRouter / StreamNameMapper
  (EmbeddedEngineTest.java:437-441, io/debezium/server/StreamNameMapper.java:14-16).

All operators are ``pa.Table → pa.Table`` and run inside
``ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)`` —
struct-child extraction is zero-copy in Arrow.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from cdcsdk_server_ray.stages.validity import with_validity


def _as_array(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        if col.num_chunks == 1:
            return col.chunk(0)
        return col.combine_chunks()
    return col


def unwrap_yb(batch: pa.Table) -> pa.Table:
    """Collapse ``struct<value: T>`` cells inside before/after structs to T.

    Cell-level nulls (a null wrapper) become null payload values; the
    struct-level validity (a deleted row's null ``after``) is preserved.
    """
    out = batch
    for name in ("before", "after"):
        if name not in batch.column_names:
            continue
        col = _as_array(batch[name])
        typ = col.type
        if not pa.types.is_struct(typ):
            continue
        new_children, changed = [], False
        for i, field in enumerate(typ):
            child = col.field(i)
            if pa.types.is_struct(field.type) and field.type.num_fields == 1 \
                    and field.type.field(0).name == "value":
                inner = child.field(0)
                # cell-wrapper null ⇒ null value (zero-copy revalidation)
                wrapper_valid = pc.is_valid(child).to_numpy(zero_copy_only=False)
                new_children.append(with_validity(_as_array(inner), wrapper_valid))
                changed = True
            else:
                new_children.append(child)
        if changed:
            mask = pc.invert(pc.is_valid(col))
            unwrapped = pa.StructArray.from_arrays(
                new_children, [f.name for f in typ], mask=_as_array(mask))
            out = out.set_column(out.column_names.index(name),
                                 name, unwrapped)
    return out


def flatten(batch: pa.Table) -> pa.Table:
    """Envelope → flat after-image + key + ordering columns.

    Input: key struct, before/after structs, source struct, op, ts_ms.
    Output: lsn, tx_id, op, ts_ms, <key cols>, <after payload cols>.
    Parent-null ``after`` (deletes) yields null payload columns —
    ``pc.struct_field`` propagates struct-level validity.
    """
    cols: dict[str, pa.ChunkedArray | pa.Array] = {}
    source = _as_array(batch["source"])
    cols["lsn"] = source.field("lsn")
    cols["tx_id"] = source.field("tx_id")
    cols["op"] = batch["op"]
    cols["ts_ms"] = batch["ts_ms"]
    key = _as_array(batch["key"])
    for i, f in enumerate(key.type):
        cols[f.name] = key.field(i)
    after = _as_array(batch["after"])
    parent_valid = pc.is_valid(after).to_numpy(zero_copy_only=False)
    for i, f in enumerate(after.type):
        # struct-level (delete) nulls propagate to the payload columns via
        # a zero-copy validity AND — never a data copy
        cols[f.name] = with_validity(_as_array(after.field(i)), parent_valid)
    return pa.table(cols)


def drop_tombstones(batch: pa.Table) -> pa.Table:
    """Drop delete events (null-payload records) for sinks without
    tombstone support. Filter semantics ≙ a transform returning null
    (Transformations.java:74-82 short-circuit)."""
    return batch.filter(pc.not_equal(batch["op"], "d"))


def route_destination(batch: pa.Table, pattern: str, replacement: str,
                      column: str = "destination",
                      source_column: str = "repo") -> pa.Table:
    """RegexRouter: derive/rewrite a destination column by regex.

    ≙ io.debezium.transforms.RegexRouter exercised at
    EmbeddedEngineTest.java:437-441.
    """
    base = batch[column] if column in batch.column_names else batch[source_column]
    routed = pc.replace_substring_regex(base, pattern=pattern,
                                        replacement=replacement)
    if column in batch.column_names:
        return batch.set_column(batch.column_names.index(column), column, routed)
    return batch.append_column(column, routed)


def route_outbox(batch: pa.Table, type_column: str = "repo",
                 id_column: str = "path",
                 payload_column: str = "content",
                 route_prefix: str = "outbox.event.") -> pa.Table:
    """Outbox event router ≙ io.debezium.transforms.outbox.EventRouter
    (the transactional-outbox SMT the reference inherits through its
    Debezium ``transforms=`` surface): each INSERT row of an outbox
    table re-emits with

    - ``destination`` = ``route_prefix`` + the aggregate-type column
      (``route.topic.prefix`` + ``route.by.field`` semantics),
    - ``key``         = the aggregate-id column (message key → per-key
      ordering at the broker, the outbox pattern's contract),
    - ``payload``     = the payload column, passed through untouched.

    Non-insert ops are DROPPED (EventRouter's default
    ``table.op.invalid.behavior=warn`` treats updates/deletes on an
    outbox table as non-events; the outbox is append-only by design).
    Fully vectorized: one filter + one ``binary_join_element_wise`` —
    never per-row Python."""
    ins = batch.filter(pc.equal(batch["op"], "c"))
    dest = pc.binary_join_element_wise(
        pa.array([route_prefix] * ins.num_rows, pa.string()),
        ins[type_column].cast(pa.string()), "")
    out = ins.append_column("destination", dest)
    out = out.append_column("key", ins[id_column].cast(pa.string()))
    return out.append_column("payload", ins[payload_column])


def filter_regex(batch: pa.Table, column: str, pattern: str,
                 keep_matches: bool = False) -> pa.Table:
    """FilterTransform analogue (EmbeddedEngineTest.java:76-95): drop (or
    keep) rows whose ``column`` matches ``pattern``."""
    m = pc.match_substring_regex(batch[column].cast(pa.string()), pattern)
    m = pc.fill_null(m, False)
    return batch.filter(m if keep_matches else pc.invert(m))


# ---------------------------------------------------------------------------
# Transformations chain ≙ cdcsdk-engine Transformations.java:36-82: ordered,
# configurable, null-return (here: empty-batch) short-circuits naturally.
# ---------------------------------------------------------------------------

_REGISTRY: dict[str, object] = {
    "unwrap": unwrap_yb,
    "flatten": flatten,
    "drop_tombstones": drop_tombstones,
    "route": route_destination,
    "route_outbox": route_outbox,
    "filter_regex": filter_regex,
}


def register_transform(name: str, fn) -> None:
    """Plug-in point ≙ transforms=<name> reflective instantiation
    (Transformations.java:57-72)."""
    _REGISTRY[name] = fn


def build_chain(specs: list[str | tuple[str, dict]]):
    """Build a single composed ``pa.Table → pa.Table`` callable from an
    ordered spec list, e.g. ``["unwrap", "flatten", ("route", {...})]``.

    Composing into ONE map_batches body (instead of N dataset stages)
    keeps the chain a single zero-copy pass per block.
    """
    steps = []
    for spec in specs:
        if isinstance(spec, str):
            name, kwargs = spec, {}
        else:
            name, kwargs = spec
        fn = _REGISTRY[name]
        steps.append((fn, kwargs))

    def chain(batch: pa.Table) -> pa.Table:
        # no empty-batch short-circuit: a 0-row batch must still flow
        # through every transform so its SCHEMA matches non-empty blocks
        # (an early return left e.g. a routed 'destination' column off
        # one block, failing downstream schema unification); the
        # reference's per-record short-circuit is an optimization, not a
        # semantics change, and 0-row batches cost nothing anyway
        for fn, kwargs in steps:
            batch = fn(batch, **kwargs) if kwargs else fn(batch)
        return batch

    return chain


def flatten_chain(yb: bool = True):
    """The reference's FLATTEN config: ``unwrap,flatten`` for YB sources,
    ``flatten`` alone otherwise (ServerApp.java:167-185)."""
    return build_chain(["unwrap", "flatten"] if yb else ["flatten"])
