"""Local pre-verification of queries() vs oracle_sql() via DuckDB.

Mirrors the driver's correctness gate so mismatches are caught before a
round ends.  Usage:  python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e
    from kgray.oracle_check import compare, register_views, to_pandas

    con = duckdb.connect()
    register_views(con, sf_dir)

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as ex:
            failed.append(name)
            print(f"[FAIL] {name}: query raised {type(ex).__name__}: {ex}", flush=True)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"[rows-only] {name}: {len(ray_df)} rows", flush=True)
            continue
        try:
            sql_df = con.sql(sql).df()
        except Exception as ex:
            failed.append(name)
            print(f"[FAIL] {name}: oracle raised {type(ex).__name__}: {ex}", flush=True)
            continue
        problems = compare(ray_df, sql_df)
        if problems:
            failed.append(name)
            print(f"[FAIL] {name}: " + "; ".join(problems), flush=True)
        else:
            print(f"[ok] {name}: {len(ray_df)} rows match", flush=True)
    print("FAILED:", failed if failed else "none", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
