"""Every SQL-expressible queries() entry vs its DuckDB oracle at sf0.001.

This mirrors the driver's correctness gate (row count + column names +
order-insensitive values) so regressions surface in CI, not in the round
report.  Rows-only queries are covered by their dedicated test modules.
"""

from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _entry():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    return e


@pytest.fixture(scope="module")
def con():
    from kgray.oracle_check import register_views

    c = duckdb.connect()
    register_views(c, SF_DIR)
    return c


def _oracle_names():
    return sorted(_entry().oracle_sql())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(ray_session, con, name):
    from kgray.oracle_check import compare, to_pandas

    e = _entry()
    ray_df = to_pandas(e.queries()[name](SF_DIR))
    sql_df = con.sql(e.oracle_sql()[name]).df()
    problems = compare(ray_df, sql_df)
    assert not problems, f"{name}: {problems}"


def test_every_oracle_has_query():
    e = _entry()
    missing = set(e.oracle_sql()) - set(e.queries())
    assert not missing


def test_every_query_has_oracle():
    """The full board is oracled: no rows-only queries remain (VERDICT r2
    'next round' #1 — the 9 former no_oracle entries carry expected-table
    oracles from kgray.expected)."""
    e = _entry()
    missing = set(e.queries()) - set(e.oracle_sql())
    assert not missing


def test_entry_smoke(ray_session):
    ds = _entry().entry()
    n = ds.count()
    assert n > 0
    names = set(ds.schema().names)
    assert {"subj", "pred", "obj", "op"} <= names
