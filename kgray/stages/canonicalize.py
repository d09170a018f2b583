"""Canonicalize stage: exact triple dedup with a local combiner (SURVEY.md
§2.5 A4, §2.7).

The reference gets set semantics for free from ``rdflib.Graph`` on a single
machine (ttl_compare.py:168-183).  At scale that is a distributed distinct:

  1. **local pre-dedup** inside ``map_batches`` (``pyarrow.Table.group_by``
     on the full triple key per batch) — the combiner that cuts shuffle
     volume before any exchange, per SURVEY.md §4;
  2. **global dedup** via ``groupby(key).map_groups(first)`` — the one
     all-to-all shuffle this stage pays.

The dedup key is the full canonical triple identity ``(op, subj, pred, obj,
lang, datatype)``; ``src_url``/``warc_ts`` are lineage, not identity, and the
survivor is the deterministic minimum ``(warc_ts, src_url)`` so reruns
produce byte-identical output.  Because the key is the whole content, group
sizes are bounded by the duplicate count per triple — head-entity skew
(SURVEY.md §4) inflates the number of *duplicates* of a few triples, which
the local combiner collapses before the shuffle, so no salting is needed
here (salting applies to per-entity aggregations, see pipelines.kg.stats).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_KEY_COLS = ("op", "subj", "pred", "obj", "lang", "datatype")
_SEP = "\x1f"


def _with_key(batch: pa.Table) -> pa.Table:
    key = pc.binary_join_element_wise(*[batch[c] for c in _KEY_COLS], _SEP)
    return batch.append_column("key", key)


def local_dedup(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: keep the (warc_ts, src_url)-minimal row per key."""
    batch = _with_key(batch)
    idx = pa.Table.from_pydict(
        {
            "key": batch["key"],
            "warc_ts": batch["warc_ts"],
            "src_url": batch["src_url"],
            "i": pa.array(range(len(batch)), type=pa.int64()),
        }
    )
    idx = idx.sort_by([("key", "ascending"), ("warc_ts", "ascending"), ("src_url", "ascending")])
    first = idx.group_by("key", use_threads=False).aggregate([("i", "first")])
    return batch.take(first["i_first"])


def _group_first(group: pa.Table) -> pa.Table:
    idx = pa.Table.from_pydict(
        {
            "warc_ts": group["warc_ts"],
            "src_url": group["src_url"],
            "i": pa.array(range(len(group)), type=pa.int64()),
        }
    ).sort_by([("warc_ts", "ascending"), ("src_url", "ascending")])
    return group.take([idx["i"][0].as_py()])


def canonicalize_stage(ops, *, batch_size: int = 65536, drop_key: bool = True):
    """ops Dataset -> deduped ops Dataset (set semantics over triples)."""
    pre = ops.map_batches(local_dedup, batch_format="pyarrow", batch_size=batch_size)
    deduped = pre.groupby("key").map_groups(_group_first, batch_format="pyarrow")
    if drop_key:
        deduped = deduped.drop_columns(["key"])
    return deduped
