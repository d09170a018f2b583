"""Canonicalize stage: exact triple dedup with a local combiner (SURVEY.md
§2.5 A4, §2.7).

The reference gets set semantics for free from ``rdflib.Graph`` on a single
machine (ttl_compare.py:168-183).  At scale that is a distributed distinct:

  1. **local pre-dedup** inside ``map_batches`` — the combiner that cuts
     shuffle volume before any exchange, per SURVEY.md §4;
  2. **global dedup** via the hash-bucket exchange (stages/shuffle.py): ONE
     shuffle keyed on a bounded bucket id, then a vectorized first-per-key
     pass inside each bucket.

Physical design notes (each alternative was measured and rejected):
  * ``groupby(keys).aggregate(Min)`` — per-ROW Python accumulation in Ray's
    aggregate path (36-77 s at sf0.1);
  * ``map_groups(first)`` — one interpreter call per unique triple;
  * Arrow ``group_by`` over the 7 raw key columns — multi-column string
    hashing per bucket cost ~197 s remote at 160k pages.
  The shipped shape concatenates the key ONCE into a single binary column,
  then per bucket does sort(key, lineage) + boundary-mask filter — all
  Arrow/numpy kernels, ~tens of ms per bucket.

The dedup identity is the full canonical triple ``(op, subj, pred, obj,
lang, datatype, obj_type)``; ``src_url``/``warc_ts`` are lineage, not
identity, and the survivor is the lexicographically (warc_ts, src_url)-
smallest ROW per key — deterministic across reruns and partitionings,
which is what checkpoint-resume and the P/R comparison need.  Head-entity
skew inflates duplicate counts of a few triples; the local combiner
collapses those before the exchange, so no salting is needed here (salting
applies to per-entity aggregations, e.g. relational.salted_groupby).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc



KEY_COLS = ("op", "subj", "pred", "obj", "lang", "datatype", "obj_type")
LINEAGE_COLS = ("warc_ts", "src_url")
_KEY = "__triple_key"
_SEP = "\x1f"


def _with_key(batch: pa.Table) -> pa.Table:
    """Concatenated dedup key with LENGTH-PREFIXED components: ``obj`` comes
    from extracted page text and could itself contain the separator byte,
    which would let two distinct triples alias into one key.  Prefixing each
    component with its length makes the encoding injective regardless of
    content (still one vectorized join, no hashing)."""
    parts: list = []
    for c in KEY_COLS:
        col = batch[c]
        parts.append(pc.cast(pc.binary_length(col), pa.string()))
        parts.append(col)
    key = pc.binary_join_element_wise(*parts, _SEP)
    return batch.append_column(_KEY, key)


def _first_per_key(t: pa.Table) -> pa.Table:
    """Keep the (warc_ts, src_url)-min row per key.

    Grouping needs key EQUALITY only, never key order, so the ~250-byte key
    column is hash-grouped (``dictionary_encode``) instead of sorted — the
    previous ``sort_by(key, ts, url)`` paid a long-string comparison sort
    that dominated the whole flagship pipeline (measured 1160 s remote wall
    in the bucket pass at 40k pages, ~36% of total compute).  Survivor
    selection is then a vectorized per-group reduction: ``np.minimum.at``
    finds each key's min timestamp, and only (key, min-ts) TIES — same
    triple captured at the same instant from different pages — fall through
    to a small lexsort on ``src_url`` to finish the lexicographic
    (warc_ts, src_url) rule.  Output row SET is identical to the sort-based
    implementation (same survivor per key); row ORDER within the batch is
    input order, which nothing downstream depends on (materialize applies
    the canonical sort; the driver compare is order-insensitive)."""
    if len(t) == 0:
        return t
    codes = pc.dictionary_encode(t[_KEY].combine_chunks()).indices.to_numpy(
        zero_copy_only=False
    )
    n_codes = int(codes.max()) + 1
    ts = t["warc_ts"].combine_chunks().to_numpy(
        zero_copy_only=False).view("i8")
    min_ts = np.full(n_codes, np.iinfo(np.int64).max)
    np.minimum.at(min_ts, codes, ts)
    cand = np.flatnonzero(ts == min_ts[codes])
    counts = np.bincount(codes[cand], minlength=n_codes)
    if int(counts.max()) > 1:
        tie = counts[codes[cand]] > 1
        hard = cand[tie]
        urls = np.asarray(
            pc.take(t["src_url"].combine_chunks(),
                    pa.array(hard, pa.int64())).to_pylist(),
            dtype=object,
        )
        order = np.lexsort((urls, codes[hard]))
        hs = hard[order]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = codes[hs][1:] != codes[hs][:-1]
        cand = np.sort(np.concatenate([cand[~tie], hs[first]]))
    return t.take(pa.array(cand, pa.int64()))


def local_dedup(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: one (min-lineage) row per triple key."""
    return _first_per_key(_with_key(batch)).drop_columns([_KEY])


def canonicalize_stage(ops, *, batch_size: int = 65536, num_buckets: int = 4096,
                       size_hint_bytes: int | None = None):
    """ops Dataset -> deduped ops Dataset (set semantics over triples).

    The ~250-byte composite key is NEVER shipped through the exchange: the
    combiner derives it, dedups, converts it to a 4-byte bucket id and drops
    it; the per-bucket pass re-derives it locally.  At 20M+ rows the key
    column would otherwise dominate shuffle bytes (measured: the exchange was
    ~60% of pipeline compute on the 40k x 26KB corpus before this)."""
    from .shuffle import (
        BUCKET_COL, add_bucket, dict_decode_columns, dict_encode_columns,
        exchange_map,
    )

    def combine(batch: pa.Table) -> pa.Table:
        batch = _first_per_key(_with_key(batch))
        batch = add_bucket(batch, [_KEY], num_buckets)
        # dictionary-encode the repeated string columns so the exchange
        # ships int32 indices + per-block dictionaries instead of one
        # string copy per row (VERDICT r4 #2: fan-in VOLUME was the
        # width-resistant residual at 160k pages).  `obj` stays raw — it's
        # the near-unique literal payload, where a dictionary only adds
        # overhead.  Exactness is untouched: per_bucket decodes and re-runs
        # the full-key dedup on the raw strings.
        batch = dict_encode_columns(
            batch, ["op", "subj", "pred", "lang", "datatype", "obj_type",
                    "src_url"])
        return batch.drop_columns([_KEY])

    def per_bucket(group: pa.Table) -> pa.Table:
        group = dict_decode_columns(group.drop_columns([BUCKET_COL]))
        return _first_per_key(_with_key(group)).drop_columns([_KEY])

    # Physical plan: hash exchange by default (see shuffle.exchange_map) —
    # round 3 localized the width-dependent scaling residual in the SORT
    # exchange's reduce fan-in (range-boundary sampling + chunked-string
    # concat behind a barrier); hash routing streams the fan-in instead.
    # Whole-partition map, not groupby().map_groups: _first_per_key groups
    # by the full key itself, so one call per partition suffices (see
    # stages/shuffle.bucket_groupby for the per-group-overhead math).
    pre = ops.map_batches(combine, batch_format="pyarrow", batch_size=batch_size)
    return exchange_map(pre, per_bucket, size_hint_bytes=size_hint_bytes)
