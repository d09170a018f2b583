"""Shared Ray-vs-DuckDB comparison logic (mirrors the driver's correctness
gate: row count + column names + order-insensitive value compare).

Used by scripts/check_oracle.py and tests/test_queries_oracle.py so every
``queries()`` entry is pre-verified locally before a round ends.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def register_views(con, sf_dir: str) -> None:
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    """Empty list = match; else human-readable problem descriptions."""
    problems: list[str] = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        return [f"columns differ: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}"]
    if len(ray_df) != len(sql_df):
        problems.append(f"row count differs: ray={len(ray_df)} sql={len(sql_df)}")
        return problems
    a, b = normalize(ray_df), normalize(sql_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            if not np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-9, equal_nan=True):
                problems.append(f"values differ in float col {c}")
        elif not av.astype(str).equals(bv.astype(str)):
            bad = (av.astype(str) != bv.astype(str)).idxmax()
            problems.append(
                f"values differ in col {c} (e.g. row {bad}: {av[bad]!r} vs {bv[bad]!r})"
            )
    return problems
