"""Local mirror of the driver's correctness gate.

Runs every ``__ray_entry__.queries()`` entry at a given sf_dir, compares the
SQL-twinned ones against DuckDB exactly (row multiset equality — stronger
than the driver's order-insensitive value hash), and prints a per-query
verdict. Owns its Ray session (the real driver inits Ray itself).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def to_table(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pa.Table):
        return res
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res, preserve_index=False)
    # ray Dataset
    import ray

    refs = res.to_arrow_refs()
    tables = [t for t in ray.get(refs) if t.num_rows >= 0]
    return pa.concat_tables(tables) if tables else pa.table({})


def canon(t):
    """Sorted-by-all-columns pandas frame with sorted column order."""
    df = t.to_pandas()
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    con = duckdb.connect()
    for name in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_table(fn(sf_dir)))
        except Exception as e:
            failures.append(name)
            print(f"[ERR ] {name}: {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        sql = sqls.get(name)
        if sql is None:
            print(f"[rows] {name}: {len(got)} rows ({dt:.1f}s) — no oracle (rows-only)")
            continue
        try:
            want = canon(con.execute(sql).fetch_arrow_table())
        except Exception as e:
            failures.append(name)
            print(f"[ERR ] {name}: oracle SQL failed: {e}")
            continue
        ok_rows = len(got) == len(want)
        ok_cols = list(got.columns) == list(want.columns)
        ok_vals = ok_rows and ok_cols and got.equals(want)
        if not ok_vals and ok_rows and ok_cols:
            # allow tiny float differences to show up clearly
            import pandas as pd

            diffs = (got != want) & ~(got.isna() & want.isna())
            ncell = int(diffs.to_numpy().sum())
            print(
                f"[FAIL] {name}: rows={len(got)} cols ok, {ncell} differing cells"
            )
            bad = diffs.any(axis=1)
            print(pd.concat([got[bad].head(3), want[bad].head(3)], axis=1))
            failures.append(name)
        elif not ok_vals:
            print(
                f"[FAIL] {name}: rows {len(got)} vs {len(want)}, "
                f"cols {list(got.columns)} vs {list(want.columns)}"
            )
            failures.append(name)
        else:
            print(f"[ OK ] {name}: {len(got)} rows match ({dt:.1f}s)")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all checks passed")


if __name__ == "__main__":
    main()
