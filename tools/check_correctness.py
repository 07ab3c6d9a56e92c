"""Local stand-in for the driver's correctness gate: run every queries()
entry at the given sf and compare against oracle_sql() via DuckDB
(row-count + schema + order-insensitive value hash).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

# resolve the repo from THIS file, not a hardcoded path — a checkout
# elsewhere must validate its own code, never a stray /root/repo copy
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    rows = sorted(df.itertuples(index=False, name=None))
    return hashlib.md5(repr(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name silently matching nothing would exit 0 = false pass
        print(f"ERROR: unknown query name(s): {sorted(unknown)}", file=sys.stderr)
        return 2
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(sf_dir)
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        got_df = got.to_pandas() if hasattr(got, "to_pandas") else pd.DataFrame(got)
        dt = time.time() - t0
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(got_df)} rows, cols={list(got_df.columns)} ({dt:.1f}s)")
            continue
        exp_df = con.execute(oracles[name]).df()
        ok_rows = len(got_df) == len(exp_df)
        ok_cols = sorted(got_df.columns) == sorted(exp_df.columns)
        ok_hash = ok_rows and ok_cols and norm_hash(got_df) == norm_hash(exp_df)
        status = "OK" if ok_hash else "FAIL"
        if not ok_hash:
            failures += 1
        print(f"{status} {name}: rows {len(got_df)}/{len(exp_df)} cols_match={ok_cols} hash_match={ok_hash} ({dt:.1f}s)")
        if not ok_hash and ok_cols and ok_rows:
            m = got_df.merge(exp_df, how="outer", indicator=True)
            diff = m[m._merge != "both"]
            print(diff.head(6).to_string())
    ray.shutdown()
    n_run = len(only) if only else len(qs)
    print(f"SWEEP-COMPLETE: {n_run} queries, {failures} failures")
    return failures


if __name__ == "__main__":
    sys.exit(main())
