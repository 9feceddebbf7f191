"""Driver-style self-check: run every queries() entry at a given sf and
compare SQL-expressible ones against DuckDB (row count + column names/dtypes +
order-insensitive value hash, columns sorted by name — mirroring the
CORRECTNESS harness described in the driver contract).

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd


def to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def value_hash(df: pd.DataFrame) -> int:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
    rows = pd.util.hash_pandas_object(df, index=False).to_numpy()
    return int(np.sort(rows).sum() % (1 << 61))


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_df(fn(sf))
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            continue
        wall = time.time() - t0
        if name not in oracles:
            print(f"ok    {name}: rows={len(got)} cols={list(got.columns)} ({wall:.1f}s, rows-only)")
            continue
        exp = con.execute(oracles[name]).fetchdf()
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(exp.columns)}")
        else:
            gd = {c: str(got[c].dtype) for c in sorted(got.columns)}
            ed = {c: str(exp[c].dtype) for c in sorted(exp.columns)}
            if gd != ed:
                problems.append(f"dtypes {gd} != {ed}")
            if value_hash(got) != value_hash(exp):
                problems.append("value hash mismatch")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)} ({wall:.1f}s)")
        else:
            print(f"ok    {name}: rows={len(got)} oracle MATCH ({wall:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
