"""Canonicalize stage: exact triple dedup with a local combiner (SURVEY.md
§2.5 A4, §2.7).

The reference gets set semantics for free from ``rdflib.Graph`` on a single
machine (ttl_compare.py:168-183).  At scale that is a distributed distinct:

  1. **local pre-dedup** inside ``map_batches`` (``pyarrow.Table.group_by``
     on the full triple key per batch) — the combiner that cuts shuffle
     volume before any exchange, per SURVEY.md §4;
  2. **global dedup** via the hash-bucket exchange (stages/shuffle.py): ONE
     shuffle keyed on a bounded bucket id, then Arrow-native ``group_by``
     min-aggregation inside each bucket.  Neither ``map_groups(first)`` (one
     interpreter call per unique triple) nor ``groupby(...).aggregate(Min)``
     (per-ROW Python accumulation in Ray's aggregate path) — both measured
     pathological at sf0.1 (77 s / 36 s vs ~3 s for this shape).

The dedup identity is the full canonical triple ``(op, subj, pred, obj,
lang, datatype)`` plus the functionally-dependent ``obj_type``;
``src_url`` / ``warc_ts`` are lineage, not identity, and the surviving
lineage is the column-wise minimum over the duplicate set — deterministic
across reruns and partitionings, which is what checkpoint-resume and the
P/R comparison need.  Because the key is the whole content, group sizes are
bounded by the duplicate count per triple — head-entity skew (SURVEY.md §4)
inflates the number of *duplicates* of a few triples, which the local
combiner collapses before the shuffle, so no salting is needed here
(salting applies to per-entity aggregations, e.g. relational.salted_groupby).
"""

from __future__ import annotations

import pyarrow as pa

from .shuffle import arrow_min_dedup, bucket_groupby

KEY_COLS = ("op", "subj", "pred", "obj", "lang", "datatype", "obj_type")
LINEAGE_COLS = ("warc_ts", "src_url")


def local_dedup(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: one row per triple key, column-min lineage."""
    return arrow_min_dedup(KEY_COLS, LINEAGE_COLS)(batch)


def canonicalize_stage(ops, *, batch_size: int = 65536, num_buckets: int = 64):
    """ops Dataset -> deduped ops Dataset (set semantics over triples)."""
    pre = ops.map_batches(local_dedup, batch_format="pyarrow", batch_size=batch_size)
    return bucket_groupby(
        pre, KEY_COLS, arrow_min_dedup(KEY_COLS, LINEAGE_COLS),
        num_buckets=num_buckets,
    )
