"""Per-process allocator tuning for the fault-bound hot path.

This box's measured pathology (tools/probe_memory_scaling.py): steady
state memory bandwidth scales with CPUs, but the page-fault/zeroing path
has NEGATIVE concurrency scaling — 32 processes faulting fresh pages are
collectively SLOWER than 8. pyarrow's bundled jemalloc defaults to
``decay_ms = 0``: every freed Arrow buffer's pages are madvised back to
the OS immediately, so each subsequent allocation faults fresh zeroed
pages — precisely the anti-scaling resource. glibc (numpy / Python
object allocations) similarly returns large blocks via munmap/trim.

``tune_process_memory()`` flips both allocators to PAGE REUSE:

- jemalloc ``dirty/muzzy decay_ms = -1``: freed pages stay resident and
  are reused by future Arrow allocations (bounded by the pool's high
  -water mark per worker — fine: Ray caps workers per node, and a
  worker's working set is a few batches);
- glibc ``M_TRIM_THRESHOLD``/``M_MMAP_THRESHOLD`` raised so the sbrk
  heap keeps its faulted pages and sub-256 MiB allocations reuse them
  instead of round-tripping through mmap.

Call sites: Ray's ``worker_process_setup_hook`` (bench.py owns that
init) and lazily from the engine's hot ``map_batches`` closures — the
jemalloc knob only affects arenas created AFTER the call, so earlier is
better, but a late call still covers the long tail of a run. Disable
with ``CDCSDK_MEMTUNE=0`` (A/B evidence lives in BASELINE.md).

On a real multi-node cluster each node owns its fault path and this is
simply a mild win; on this shared box it is the difference between the
32-CPU leg scaling and collapsing.
"""

from __future__ import annotations

import os

_done = False

# glibc mallopt parameter codes (malloc.h)
_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def tune_process_memory() -> bool:
    """Idempotent; safe on any platform (every step is best-effort).
    Returns True when tuning was applied (or already had been)."""
    global _done
    if _done:
        return True
    if os.environ.get("CDCSDK_MEMTUNE", "1") in ("0", "off", "false"):
        return False
    _done = True
    try:
        import pyarrow as pa
        pa.jemalloc_set_decay_ms(-1)     # never decay: reuse freed pages
    except Exception:
        pass
    try:
        import ctypes
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30)
        libc.mallopt(_M_MMAP_THRESHOLD, 256 * 1024 * 1024)
    except Exception:
        pass
    return True
