"""Snapshot diff stage: distributed EXCEPT semantics (ttl_compare analog)."""

from __future__ import annotations

import pyarrow as pa


def _snap(rows):
    cols = ["entity", "subj", "pred", "obj", "obj_type", "lang", "datatype"]
    return pa.Table.from_pylist(
        [dict(zip(cols, r + ("",) * (len(cols) - len(r)))) for r in rows]
    )


def _ops(ds):
    df = ds.to_pandas()
    return {(r.op, r.subj, r.pred, r.obj) for r in df.itertuples()}


def test_diff_both_directions(ray_session):
    import ray.data as rd

    from kgray.stages.diff import diff_snapshots

    old = rd.from_arrow(_snap([
        ("Q1", "wd:Q1", "wdt:P1", "a", "literal"),
        ("Q1", "wd:Q1", "wdt:P2", "b", "literal"),   # unchanged
    ]))
    new = rd.from_arrow(_snap([
        ("Q1", "wd:Q1", "wdt:P2", "b", "literal"),   # unchanged
        ("Q1", "wd:Q1", "wdt:P3", "c", "literal"),
    ]))
    got = _ops(diff_snapshots(old, new))
    assert got == {
        ("DELETE", "wd:Q1", "wdt:P1", "a"),
        ("INSERT", "wd:Q1", "wdt:P3", "c"),
    }


def test_diff_no_prior_snapshot_is_pure_inserts(ray_session):
    import ray.data as rd

    from kgray.stages.diff import diff_snapshots

    new = rd.from_arrow(_snap([
        ("Q1", "wd:Q1", "wdt:P1", "x", "literal"),
        ("Q2", "wd:Q2", "wdt:P1", "y", "literal"),
    ]))
    got = _ops(diff_snapshots(None, new))
    assert {op for op, *_ in got} == {"INSERT"}
    assert len(got) == 2


def test_diff_filters_owl_foreign_and_wdp(ray_session):
    import ray.data as rd

    from kgray.stages.diff import diff_snapshots

    new = rd.from_arrow(_snap([
        ("Q1", "wd:Q1", "wdt:P1", "keep", "literal"),
        ("Q1", "wd:Q1", "http://www.w3.org/2002/07/owl#sameAs", "drop", "iri"),
        ("Q1", "wd:Q99", "wdt:P1", "foreign-drop", "literal"),
        ("Q1", "wd:P42", "wdt:P1", "prop-drop", "literal"),
    ]))
    got = _ops(diff_snapshots(None, new))
    assert got == {("INSERT", "wd:Q1", "wdt:P1", "keep")}
