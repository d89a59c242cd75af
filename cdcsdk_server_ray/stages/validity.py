"""Zero-copy null-masking helpers.

``pc.if_else(mask, null, arr)`` materializes a full copy of ``arr`` just
to flip validity bits — on a 900 MB content column that's the single
largest memory-traffic term in the pipeline. These helpers rebuild the
array around the ORIGINAL buffers with a new validity bitmap (O(n/8)
bitmap bytes instead of O(data) copies). Nested types fall back to the
copying kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _bitmap(valid: np.ndarray) -> pa.Buffer:
    return pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())


def with_validity(arr: pa.Array, valid: np.ndarray) -> pa.Array:
    """Return ``arr`` with validity = ``valid`` (AND-ed with any existing
    nulls), sharing the data buffers. ``valid``: bool ndarray, len(arr)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.offset:
        # a SLICED array's buffers() are the unsliced physical buffers;
        # rebuilding around them with a fresh bitmap would shift every
        # value to the buffer start — silent row-misalignment corruption
        # (reachable via Table.slice → _as_array's zero-copy chunk(0)
        # shortcut whenever the slice contains nulls). Compact first;
        # only sliced inputs pay the copy.
        arr = pa.concat_arrays([arr])
    if pa.types.is_nested(arr.type) or pa.types.is_dictionary(arr.type):
        return pc.if_else(pa.array(~valid), pa.scalar(None, arr.type), arr)
    if arr.null_count:
        valid = valid & pc.is_valid(arr).to_numpy(zero_copy_only=False)
    n_null = int(len(valid) - valid.sum())
    if n_null == 0 and arr.null_count == 0:
        return arr
    bufs = arr.buffers()
    return pa.Array.from_buffers(arr.type, len(arr),
                                 [_bitmap(valid)] + bufs[1:],
                                 null_count=n_null)


def null_where(arr: pa.Array, null_mask: np.ndarray) -> pa.Array:
    """Null out positions where ``null_mask`` is True — zero-copy."""
    return with_validity(arr, ~null_mask)
