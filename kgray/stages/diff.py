"""Snapshot diff stage: old-vs-new triple sets -> INSERT/DELETE ops
(SURVEY.md §2.4/§2.7 — the ``ttl_compare.diff_ttls`` analog).

The reference computes ``g_new - g_old`` / ``g_old - g_new`` with rdflib set
difference in memory (ttl_compare.py:168-183).  Distributed, that is a
hash anti-join in both directions, expressed as ONE shuffle:

    union(old tagged side=0, new tagged side=1)
      -> per-batch combiner: collapse to (key, side_mask) partials
      -> groupby(triple key) -> rows present on exactly one side
           side=new only -> INSERT;  side=old only -> DELETE

An absent old side degenerates to pure INSERTs, matching the
``old_revision_id == 0`` shortcut (ttl_compare.py:339-340).  The owl /
foreign-subject filters (M17, ttl_compare.py:211-228) are applied before the
shuffle so filtered rows never pay exchange cost.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_KEY_COLS = ("entity", "subj", "pred", "obj", "lang", "datatype")
_SEP = "\x1f"


def filter_triples(batch: pa.Table) -> pa.Table:
    """M17 filters: drop /owl# triples, foreign wd:Q* subjects, wd:P* subjects
    (ttl_compare.py:211-228) — vectorized boolean masks."""
    subj = batch["subj"]
    owl = pc.or_(
        pc.match_substring(subj, "/owl#"),
        pc.or_(
            pc.match_substring(batch["pred"], "/owl#"),
            pc.match_substring(batch["obj"], "/owl#"),
        ),
    )
    wd_p = pc.starts_with(subj, "wd:P")
    own = pc.binary_join_element_wise(pa.array(["wd:"] * len(batch)), batch["entity"], "")
    foreign = pc.and_(pc.starts_with(subj, "wd:Q"), pc.not_equal(subj, own))
    keep = pc.invert(pc.or_(pc.or_(owl, wd_p), foreign))
    return batch.filter(keep)


def _tag_side(side: int):
    def fn(batch: pa.Table) -> pa.Table:
        batch = filter_triples(batch)
        key = pc.binary_join_element_wise(*[batch[c] for c in _KEY_COLS], _SEP)
        # local combiner: one row per (key, side) per batch
        t = pa.Table.from_pydict({"key": key}).group_by("key").aggregate([])
        n = len(t)
        return pa.Table.from_pydict(
            {
                "key": t["key"],
                "side_mask": pa.array([side] * n, type=pa.int32()),
            }
        )

    return fn


def _emit_ops(group: pa.Table) -> pa.Table:
    mask = 0
    for v in group["side_mask"].to_pylist():
        mask |= v
    if mask == 3:  # both sides -> unchanged
        return group.schema.empty_table().append_column("op", pa.array([], pa.string()))
    op = "INSERT" if mask == 2 else "DELETE"
    one = group.take([0])
    return one.append_column("op", pa.array([op], pa.string()))


def diff_snapshots(old, new):
    """old/new triple Datasets (SNAPSHOTS columns incl. ``entity``) ->
    ops Dataset with columns (key parts..., op).

    ``old`` may be None (no prior snapshot -> pure INSERTs).
    """
    if old is None:
        tagged = new.map_batches(_tag_side(2), batch_format="pyarrow")
    else:
        tagged = old.map_batches(_tag_side(1), batch_format="pyarrow").union(
            new.map_batches(_tag_side(2), batch_format="pyarrow")
        )
    ops = tagged.groupby("key").map_groups(_emit_ops, batch_format="pyarrow")

    def unpack(batch: pa.Table) -> pa.Table:
        keys = batch["key"].to_pylist()
        ops_col = batch["op"].to_pylist()
        cols = {c: [] for c in _KEY_COLS}
        for k in keys:
            parts = k.split(_SEP)
            for c, v in zip(_KEY_COLS, parts):
                cols[c].append(v)
        cols["op"] = ops_col
        return pa.Table.from_pydict(cols)

    return ops.map_batches(unpack, batch_format="pyarrow")
