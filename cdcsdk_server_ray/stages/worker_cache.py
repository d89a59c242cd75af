"""Worker-cached stage wrapper: once-per-process state WITHOUT actors.

The analytics/dedup signer stages (MinHashSigner, SimHasher, the text
scorers, the media decoders) hold small, DETERMINISTIC state — permutation
coefficients, compiled regexes, vocab caches — built from constructor args
alone. Running them as Ray Data ACTOR pools (``map_batches(Cls,
concurrency=(lo, hi))``) buys once-per-actor setup but pays fresh actor
*processes* per query: on this box each query spent ~1-2 s of its
wall-clock spinning up 2-8 new workers while the already-warm task-pool
workers sat idle (minhash_lsh_pairs at sf0.1 measured 3.8 s actor-pool vs
2.6 s task-pool, same plan otherwise).

``worker_cached(Cls, *args)`` keeps the class (its __init__-owned state and
tests are unchanged) but runs the stage as a plain function on the TASK
pool: the instance is built lazily on a worker's first batch and cached in
the worker process keyed by (class, args), so every later batch — and every
later QUERY in the same session — reuses it. Same once-per-process setup
semantics as an actor pool, zero process spin-up.

Use actor pools only where the state is non-deterministic, heavy enough to
need placement control, or must be pinned (the ordered sinks, which need
``concurrency=1`` for delivery order). Reference framing: the signer is
the analogue of a Debezium SMT's configure()-once/apply()-per-record
contract (cdcsdk-server transforms), not a stateful consumer.
"""
from __future__ import annotations

_CACHE: dict = {}


def worker_cached(cls, *args, **kwargs):
    """Return a batch fn running ``cls(*args, **kwargs).__call__`` with
    the instance cached per worker process. Constructor arguments must be
    hashable and fully determine the instance's behavior (an ObjectRef to
    broadcast state qualifies: same ref ⇒ same state)."""
    key = (cls.__module__, cls.__qualname__, args,
           tuple(sorted(kwargs.items())))

    def stage(batch):
        inst = _CACHE.get(key)
        if inst is None:
            inst = _CACHE.setdefault(key, cls(*args, **kwargs))
        return inst(batch)

    stage.__name__ = stage.__qualname__ = cls.__name__
    return stage
