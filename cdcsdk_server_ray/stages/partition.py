"""Key-space partitioning — the Ray-Data form of tablet/task sharding.

Reference analogue: the server splits tablets into deterministic groups
across N engine tasks (ServerApp.java:192-234, MTEngine.java:104-113,
README.md:54-56 "MT mode"); per-key ordering at the sinks is preserved by
key-hash partitioning (KinesisChangeConsumer.java:108-112,
PubSubChangeConsumer.java:124-135 orderingKey).

Here: ``partition_id = siphash(repo, path) % P`` as an explicit column.
P is fixed for the lifetime of a lake so per-partition watermarks stay
stable (SURVEY.md §4 "Partitioning key"). The hash is pandas'
``hash_pandas_object`` (SipHash-1-3 with a pinned 16-byte key) — C-vectorized
and process/run-stable for a pinned key.

Hot-key mitigation (north rule): ``salt_column`` splits a partition's rows
into ``(partition_id, salt)`` sub-groups for a first-level reduce; a
second, per-partition reduce merges the salted winners. Because LWW
(max-lsn per key) is associative+commutative, the two-level reduce yields
the identical winner set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_HASH_KEY = "cdcsdk-ray-hash0"  # exactly 16 bytes; pinned ⇒ stable partitioning
_SEP = "\x1f"
_ESC = "\x1f\x02"


def escape_key_cols(cols: list) -> list:
    """Make the \\x1f-joined key UNAMBIGUOUS: a literal \\x1f inside a
    component becomes \\x1f\\x02, so a bare \\x1f in the joined string is
    always the separator — without this, ('a\\x1fb','c') and
    ('a','b\\x1fc') join identically and two DISTINCT keys silently
    LWW-merge (one vanishes from current state). Keys without \\x1f —
    the overwhelmingly common case — are returned untouched (a cheap
    match scan, no allocation), which also keeps their joined bytes,
    hashes, and therefore existing lakes' partition placement identical
    to the pre-escape format."""
    out = []
    for c in cols:
        if pc.any(pc.match_substring(c, _SEP)).as_py():
            c = pc.replace_substring(c, pattern=_SEP, replacement=_ESC)
        out.append(c)
    return out


def key_hash(repo, path) -> np.ndarray:
    """Stable uint64 hash of the (repo, path) key, vectorized."""
    repo, path = escape_key_cols([repo, path])
    joined = pc.binary_join_element_wise(repo, path, _SEP)
    s = pd.Series(joined.to_pandas(), copy=False)
    return pd.util.hash_pandas_object(s, index=False, hash_key=_HASH_KEY).to_numpy()


def add_partition_column(batch: pa.Table, num_partitions: int,
                         key_cols: tuple[str, str] = ("repo", "path"),
                         column: str = "partition_id") -> pa.Table:
    h = key_hash(batch[key_cols[0]], batch[key_cols[1]])
    pid = (h % np.uint64(num_partitions)).astype(np.int32)
    return batch.append_column(column, pa.array(pid))


def add_salt_column(batch: pa.Table, num_partitions: int, salt_buckets: int,
                    key_cols: tuple[str, str] = ("repo", "path"),
                    column: str = "salt") -> pa.Table:
    """Salt derived from higher hash bits — same key ⇒ same salt, so a
    salted first-level LWW still sees every event of a key in one group."""
    h = key_hash(batch[key_cols[0]], batch[key_cols[1]])
    salt = ((h // np.uint64(num_partitions)) % np.uint64(salt_buckets)).astype(np.int32)
    return batch.append_column(column, pa.array(salt))
