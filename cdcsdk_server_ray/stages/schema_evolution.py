"""Schema evolution: unify / widen / cast across evolving event batches.

Reference analogue: the converter layer tolerates per-record schemas with a
bounded schema cache (schemas.cache.config default 1000,
StorageSinkConnectorConfig.java:76-78) and registry-based Avro evolution
(ConvertingEngineBuilder.java:207-226) — schemas are expected to change
mid-stream. Here evolution is handled structurally with
``pa.unify_schemas`` plus an explicit, lossless promotion lattice
(FIXTURES.md F6): int8→…→int64→float64, float32→float64,
string→large_string, and column-add (null-filled for older rows).
"""

from __future__ import annotations

import pyarrow as pa

_NUMERIC_RANK = {
    pa.int8(): 0, pa.int16(): 1, pa.int32(): 2, pa.int64(): 3,
    pa.float32(): 4, pa.float64(): 5,
}


def promote_types(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """Least common losslessly-promotable type of two field types."""
    if a.equals(b):
        return a
    if a in _NUMERIC_RANK and b in _NUMERIC_RANK:
        # int64 + float32 would be lossy in float32 → promote to float64
        hi, lo = (a, b) if _NUMERIC_RANK[a] >= _NUMERIC_RANK[b] else (b, a)
        if pa.types.is_floating(hi) and pa.types.is_integer(lo) \
                and lo.bit_width > hi.bit_width:
            return pa.float64()
        return hi
    strings = (pa.string(), pa.large_string())
    if a in strings and b in strings:
        return pa.large_string()
    if pa.types.is_null(a):
        return b
    if pa.types.is_null(b):
        return a
    raise TypeError(f"no lossless promotion for {a} vs {b}")


def unify(schemas: list[pa.Schema]) -> pa.Schema:
    """Unified schema: union of columns (order of first appearance), field
    types promoted pairwise. Unlike bare ``pa.unify_schemas`` this widens
    int64→float64 etc. instead of erroring."""
    fields: dict[str, pa.DataType] = {}
    for schema in schemas:
        for f in schema:
            if f.name in fields:
                fields[f.name] = promote_types(fields[f.name], f.type)
            else:
                fields[f.name] = f.type
    return pa.schema([pa.field(n, t) for n, t in fields.items()])


def conform(table: pa.Table, target: pa.Schema) -> pa.Table:
    """Cast/extend a table to the target schema: missing columns null-fill,
    mismatched types cast (losslessly, per the promotion lattice)."""
    cols = []
    for f in target:
        if f.name in table.column_names:
            col = table[f.name]
            if not col.type.equals(f.type):
                col = col.cast(f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(table.num_rows, f.type))
    return pa.table(dict(zip(target.names, cols)))


def concat_unified(tables: list[pa.Table]) -> pa.Table:
    """Concatenate tables with evolving schemas under the promotion rules."""
    tables = [t for t in tables if t.num_rows or t.num_columns]
    if not tables:
        return pa.table({})
    target = unify([t.schema for t in tables])
    return pa.concat_tables([conform(t, target) for t in tables])
