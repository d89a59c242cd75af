"""Final presentation sort for query results.

Every query pipeline ends with a deterministic sort so results are
reproducible across partitioning/resume and comparable to the SQL
oracle. ``Dataset.sort`` is an AllToAll operator whose fixed cost is
per-BLOCK (sample + range-partition + reduce): on a result of a few MB
spread over ~100 tiny post-groupby blocks it was measured at 3-5
SECONDS while the two sort kernels inside it ran for under 1 s total
(join_full_outer stats, BASELINE.md round-5 close). The same arithmetic
as `_topk_finish` and the engine's fused spill side: at small-output
scale the exchange's fixed cost dominates its payload.

``finish_sorted`` therefore materializes the result (the sort consumes
the whole pipeline anyway, so this adds no extra execution) and
branches on the ACTUAL result size, known for free from the
materialized metadata:

- at or below ``bound_bytes`` (default 256 MiB): coalesce to one block
  and run one vectorized ``sort_values`` — a single cheap non-sampling
  exchange instead of Sort's two-phase machinery. Aggregates, pair
  lists, top-k prunes and stats tables live here at every corpus scale.
- above the bound: the distributed ``Dataset.sort`` — corpus-row-sized
  outputs (per-doc scores at 10^9 docs) keep the scale-honest path;
  a one-task sort on an unbounded result would be the real smell.
"""

from __future__ import annotations

import pandas as pd

FINISH_SORT_BOUND_BYTES = 256 * 2**20


def finish_sorted(ds, keys, bound_bytes: int = FINISH_SORT_BOUND_BYTES):
    """Deterministic final sort of a result Dataset by ``keys`` —
    one-task kernel for small results, ``Dataset.sort`` above the byte
    bound. All sort keys in this repo are unique per row (ids or full
    aggregate group keys), so the two paths order identically."""
    keys_l = [keys] if isinstance(keys, str) else list(keys)
    m = ds.materialize()
    if m.count() == 0:
        # already trivially sorted; repartition(1)+map would drop the
        # empty blocks' schema, failing downstream schema checks
        return m
    if (m.size_bytes() or 0) <= bound_bytes:
        def sort_kernel(df: pd.DataFrame) -> pd.DataFrame:
            return df.sort_values(keys_l).reset_index(drop=True)
        return m.repartition(1).map_batches(
            sort_kernel, batch_format="pandas", batch_size=None)
    return m.sort(keys_l)
