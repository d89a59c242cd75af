"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry and compare against ``oracle_sql()`` via DuckDB
(row count + sorted-column value equality). Usage:

    python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (list, np.ndarray)):
            df[c] = df[c].map(lambda v: tuple(np.asarray(v).tolist()))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if len(a) != len(b):
        return f"row count {len(a)} vs {len(b)}"
    a, b = _canon(a), _canon(b)
    if list(a.columns) != list(b.columns):
        return f"columns {list(a.columns)} vs {list(b.columns)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if {av.dtype.kind, bv.dtype.kind} == {"i", "f"}:
            # the driver hashes exact values: int64 123 vs float64 123.0
            # mismatch there even though allclose passes here (this hid the
            # r01 media_stats failure — DuckDB HUGEINT sums come back as
            # float64; cast the SQL to BIGINT or the Ray side to float)
            return (f"col {c} dtype kind mismatch: {av.dtype} vs {bv.dtype}"
                    " (driver hash would differ)")
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            if not np.allclose(av.astype(float), bv.astype(float),
                               rtol=0, atol=1e-9, equal_nan=True):
                bad = np.where(~np.isclose(av.astype(float), bv.astype(float),
                                           rtol=0, atol=1e-9, equal_nan=True))[0][:3]
                return f"float col {c} differs at rows {bad.tolist()}: {av.iloc[bad].tolist()} vs {bv.iloc[bad].tolist()}"
        else:
            if not av.astype(str).equals(bv.astype(str)):
                bad = np.where(av.astype(str) != bv.astype(str))[0][:3]
                return f"col {c} differs at rows {bad.tolist()}: {av.iloc[bad].tolist()} vs {bv.iloc[bad].tolist()}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(sf_dir)
            if not isinstance(got, pd.DataFrame):
                got = got.to_pandas()
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_bad += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"  ok {name}: rows-only ({len(got)} rows, {dt:.1f}s)")
            n_ok += 1
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL raised {e}")
            n_bad += 1
            continue
        diff = compare(got, want)
        if diff:
            print(f"FAIL {name}: {diff} ({dt:.1f}s)")
            n_bad += 1
        else:
            print(f"  OK {name}: {len(got)} rows match oracle ({dt:.1f}s)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
