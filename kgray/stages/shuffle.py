"""Hash-bucket exchange: the engine's workhorse for high-cardinality
grouped operations.

Ray Data's ``groupby(cols).aggregate(...)`` sorts fast but then accumulates
PER ROW in Python, and ``map_groups`` pays one interpreter call PER GROUP —
both pathological when the key cardinality approaches the row count
(exact dedup, pair dedup, set diff: millions of single-row groups at scale).

``bucket_groupby`` keeps the exchange but bounds the Python surface:

    rows -> add __bucket = hash(key cols) % num_buckets        (vectorized)
         -> groupby(__bucket)                                   (ONE shuffle)
         -> map_groups(fn)  with  #buckets ≪ #keys              (few calls)

``fn`` sees every row of a bucket as one Arrow table and does its grouped
work with Arrow-native kernels (``Table.group_by``), so the per-key cost is
C, not Python.  Same-key rows always share a bucket, so any per-key
reduction computed inside ``fn`` is globally correct.

``num_buckets`` must stay WELL ABOVE both the core count and any plausible
sort-partition count:

* buckets ≲ cores quantizes the per-bucket pass into few scheduling waves
  (64 uniform buckets on 32 cores = 2 waves; the ~24 s straggler tail only
  bites at full width);
* buckets ≲ sort partitions is far worse: Ray's sort-based ``groupby``
  samples range boundaries from the bucket column, and with fewer distinct
  values than partitions the duplicate boundaries collapse entire
  multi-bucket row ranges into a handful of reduce partitions (measured:
  multi-GB, 15-minute reduce tasks at 58 M rows / 256 buckets / 384
  partitions, while 14 M rows / 256 buckets / 122 partitions was fine).

The 4096 default clears both for any single-node width and for the
several-hundred-partition exchanges of cluster-scale runs; per-group fn
call overhead is sub-ms, so over-bucketing is cheap.  The hash is uniform,
so only aggregate-key skew (not row skew) matters — and key skew was
already collapsed by the caller's local combiner.
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

BUCKET_COL = "__bucket"
_SEP = "\x1f"

# Exchange physical strategy.  "hash" routes the co-location through Ray's
# HASH_SHUFFLE repartition-by-key (map tasks partition by hash(bucket) and
# push to aggregator actors that concat each partition — no sort barrier,
# no range-boundary sampling, streaming fan-in); "sort" is the legacy
# sort(__bucket) exchange.  Default is SIZE-ADAPTIVE ("auto"): hash above
# _HASH_MIN_BYTES of estimated input, sort below — measured on the 40k-page
# scaling corpus the hash exchange is 20-25% faster at 32 cpus (it removes
# the width-dependent sort-reduce fan-in, VERDICT r3 #1) but pays a fixed
# ~3-5 s aggregator-pool spawn per exchange that dominates small queries
# (interleaved A/B: t32 62.7/94.6 s hash vs 83.5/119.1 s sort; sf0.1
# headline total 77.7 s hash vs 55.0 s sort).  KGRAY_EXCHANGE=hash|sort
# overrides for A/B campaigns.
_EXCHANGE_ENV = "KGRAY_EXCHANGE"
# auto mode: estimated in-memory input bytes above which an exchange takes
# the hash path (the fixed aggregator spawn amortizes; the sort fan-in it
# replaces grows with input while the spawn cost does not)
_HASH_MIN_BYTES = 512 * 1024 * 1024
# Scheduler CPU reservation budget for ONE exchange's aggregator-actor
# pool as a fraction of cluster CPUs.  Round-3's HASH_SHUFFLE probe stalled
# because the default reservation — min(1, (CPU/2)/partitions) per
# partition — put 16 of 32 cpus on aggregators and starved the extract/link
# actor pool; see _tune_hash_shuffle for the deadlock arithmetic.
_AGG_CPU_FRACTION = 16

try:  # Rust-vectorized row hash; seeded => deterministic across the
    # processes of one session (all an exchange needs).  polars must run
    # single-threaded here: its default rayon pool is one thread per core
    # PER PROCESS, and hash_rows inside 32 concurrent Ray map tasks then
    # runs ~cores^2 runnable threads — measured t32 SLOWER than t8 on the
    # scaling corpus.  The env var only binds before the first polars
    # import in each process; kgray/__init__ sets it too, so in practice
    # every Ray worker caps the pool (the kgray UDF import precedes any
    # other polars use in our pipelines).  If some other library still
    # imports polars first with a wide pool we ACCEPT it anyway: hash
    # VALUES are pool-size-independent, and the hash choice must be
    # uniform across every worker of an exchange — a polars/fallback mix
    # would put the same key in different buckets.
    import os as _os

    _os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as _pl
except ImportError:  # pragma: no cover - polars ships in this env
    _pl = None

# polynomial segment hash over the Arrow string buffers, mod 2^64
_HB = np.uint64(1099511628211)  # FNV-1a prime
_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)
_MIX3 = np.uint64(0x94D049BB133111EB)
# rows longer than this take a per-row hashlib path (rare: a triple key is
# tens of bytes; only pathological literal payloads exceed it), bounding
# the (maxlen x rows) scratch matrix of the vectorized path
_LONG_ROW = 1024


def _hash_key(batch: pa.Table, key_cols: Sequence[str]) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of the key-column tuple.

    Primary path: polars ``hash_rows`` straight off the Arrow buffers —
    Rust-vectorized (measured ~10x the numpy fallback AND the old pandas
    detour), and with a fixed seed the value is identical across the worker
    processes of a session, which is the only determinism a bucket exchange
    needs (nothing persisted depends on bucket assignment).

    Fallback (no polars): the joined key column's (offsets, data) buffers
    feed a Horner polynomial evaluated positionally — rows sorted by length
    descending so pass ``p`` updates only the contiguous prefix of rows
    still inside their segment (``h = h*B + byte``, exactly ``len`` steps
    per row, so the value is batch-independent) — then a splitmix64 mix of
    (hash, length).  O(total_bytes) work in ~maxlen vectorized passes; no
    pandas/object-dtype detour in the hottest exchange path (VERDICT r2
    "what's wrong" #5), and no per-byte O(L) power tables (numpy's uint64
    ``multiply.accumulate`` has no fast inner loop)."""
    if _pl is not None:
        return _pl.from_arrow(batch.select(list(key_cols))).hash_rows(
            seed=0).to_numpy()
    key = pc.binary_join_element_wise(
        *[pc.cast(batch[c], pa.string()) for c in key_cols], _SEP,
        null_handling="replace", null_replacement="\x00<null>",
    )
    if isinstance(key, pa.ChunkedArray):
        key = key.combine_chunks()
    n = len(key)
    if n == 0:
        return np.empty(0, np.uint64)
    bufs = key.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int32)[
        key.offset: key.offset + n + 1].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)[offsets[0]: offsets[-1]]
        if bufs[2] is not None else np.empty(0, np.uint8)
    )
    starts = offsets[:-1] - offsets[0]
    lengths = offsets[1:] - offsets[0] - starts
    h = np.zeros(n, np.uint64)
    long_rows = np.flatnonzero(lengths > _LONG_ROW)
    if len(long_rows):
        import hashlib

        for i in long_rows:
            seg = data[starts[i]: starts[i] + lengths[i]].tobytes()
            h[i] = int.from_bytes(
                hashlib.blake2b(seg, digest_size=8).digest(), "big")
    norm = (np.flatnonzero(lengths <= _LONG_ROW)
            if len(long_rows) else np.arange(n))
    if len(norm):
        # length-descending order: at pass p only rows with len > p are
        # live, and they form the prefix [:k] — contiguous slice updates
        order = norm[np.argsort(-lengths[norm], kind="stable")]
        sl = lengths[order]
        maxlen = int(sl[0]) if len(sl) else 0
        # transposed scratch (pass p reads a contiguous row)
        mat = np.zeros((maxlen, len(order)), np.uint8)
        rowpos = np.arange(int(sl.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(sl[:-1]))), sl)
        mat[rowpos, np.repeat(np.arange(len(order)), sl)] = data[
            np.repeat(starts[order], sl) + rowpos]
        asc = np.sort(sl)
        hh = np.zeros(len(order), np.uint64)
        for p in range(maxlen):
            k = len(order) - np.searchsorted(asc, p, side="right")
            hh[:k] *= _HB
            hh[:k] += mat[p, :k]
        h[order] = hh
    # splitmix64 finalizer so low bits (the % num_buckets) avalanche
    h = h ^ (lengths.astype(np.uint64) * _MIX1)
    h ^= h >> np.uint64(30)
    h *= _MIX2
    h ^= h >> np.uint64(27)
    h *= _MIX3
    h ^= h >> np.uint64(31)
    return h


def add_bucket(batch: pa.Table, key_cols: Sequence[str], num_buckets: int) -> pa.Table:
    h = _hash_key(batch, key_cols) % np.uint64(num_buckets)
    return batch.append_column(BUCKET_COL, pa.array(h.astype(np.int32)))


def _cluster_cpus() -> int:
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", 32))
    except Exception:  # pragma: no cover - ray import/cluster race
        pass
    return 32


def default_exchange_partitions(cpus: int | None = None) -> int:
    """Reduce width of an exchange: ~2 partitions per cluster core, floored
    at 64 (enough waves to absorb per-partition variance) and capped at 1024
    (keeps O(maps x partitions) shuffle-object metadata bounded).
    ``KGRAY_EXCHANGE_PARTS`` overrides for A/B campaigns."""
    env = os.environ.get("KGRAY_EXCHANGE_PARTS")
    if env:
        return int(env)
    if cpus is None:
        cpus = _cluster_cpus()
    return min(1024, max(64, 2 * cpus))


def exchange_mode(size_hint_bytes: int | None = None) -> str:
    """Physical exchange selection: env override, else size-adaptive.

    ``size_hint_bytes`` is the caller's estimate of the exchange input
    (``Dataset.size_bytes()`` on the SOURCE read — free parquet-metadata
    arithmetic there; on a mapped dataset it would execute the pipeline,
    so callers hint from the read, not from the tagged stream)."""
    mode = os.environ.get(_EXCHANGE_ENV, "auto")
    if mode != "auto":
        return mode
    if size_hint_bytes is not None and size_hint_bytes >= _HASH_MIN_BYTES:
        return "hash"
    return "sort"


def source_size_hint(ds) -> int | None:
    """Best-effort input-size estimate for exchange_mode.

    Only answers when the estimate is FREE: a bare read (parquet metadata
    arithmetic) or an already-materialized dataset.  On a lazy transformed
    dataset ``size_bytes()`` would execute the pipeline, so this returns
    None there (auto mode then picks the sort exchange — the conservative
    small-input default)."""
    try:
        from ray.data._internal.logical.operators.read_operator import Read

        dag = ds._logical_plan.dag
        if not (isinstance(dag, Read) or ds._plan.has_computed_output()):
            return None
        return ds.size_bytes()
    except Exception:  # pragma: no cover - ray internals moved
        return None


def _tune_hash_shuffle(ctx, num_partitions: int, cpus: int) -> None:
    """Bound the aggregator pool's scheduler footprint on ``ctx`` (the
    DATASET's own context copy — the process-global DataContext is never
    touched, so unrelated pipelines keep the default sort strategy).

    The reservation must stay SMALL: aggregator actors only concat arriving
    partition blocks (bandwidth-bound, mostly idle), but their num_cpus is
    reserved for the life of the shuffle op.  A pipeline can hold TWO live
    exchanges plus a linker actor pool; if actor reservations ever sum to
    the node's CPUs, the shuffle's own map tasks (num_cpus=1 each) can
    never schedule and the pipeline deadlocks — measured at num_cpus=4
    with the previous max(1.0, cpus/8) budget (2 exchanges x 1.0 + 2 pool
    actors = 4/4 reserved, zero task slots)."""
    from ray.data.context import ShuffleStrategy

    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    budget = max(0.2, cpus / _AGG_CPU_FRACTION)
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = (
        budget / num_partitions)
    # one aggregator per core (each is a single concat thread): the fan-in
    # width IS the aggregator count — 8 actors measured 815 s on the 160k
    # t32 run (8-wide concat wall) where the sort exchange's full-width
    # reduce ran 270-650 s.  The RESERVATION stays tiny (budget/partitions
    # x partitions-per-actor), so task pools keep their CPUs; it's the
    # actor COUNT that buys parallel fan-in.
    ctx.max_hash_shuffle_aggregators = max(2, min(64, cpus))


def exchange_map(
    tagged,
    per_partition: Callable[[pa.Table], pa.Table],
    *,
    num_partitions: int | None = None,
    size_hint_bytes: int | None = None,
):
    """Co-locate equal ``__bucket`` values and run ``per_partition`` exactly
    once over each co-located partition (a union of whole buckets, Arrow
    table, ``__bucket`` still attached).

    hash mode (default): ``repartition(num_partitions, keys=[__bucket])``
    under Ray's HASH_SHUFFLE — map tasks hash-route rows to aggregator
    actors, each finalized partition is emitted as ONE block, and
    ``map_batches(batch_size=None)`` therefore calls ``per_partition`` once
    per partition.  Exactly-once-per-bucket holds by hash routing (same
    bucket value -> same partition) and is pinned by a regression test that
    forces a tiny ``target_max_block_size`` with multi-block-sized buckets
    (tests/test_shuffle_exchange.py).  Unlike the sort path there is no
    range-boundary sampling to collapse partitions and no sort barrier —
    fan-in streams as map tasks finish.

    sort mode (``KGRAY_EXCHANGE=sort``): the legacy ``sort(__bucket)``
    exchange.  Ray's sort places every bucket value wholly inside one merged
    reduce block (rows equal to a boundary fall on one consistent side;
    merge_sorted_blocks returns a single block in the pinned ray 2.49.2),
    pinned by the same regression test."""
    if num_partitions is None:
        num_partitions = default_exchange_partitions()
    if exchange_mode(size_hint_bytes) == "hash":
        _tune_hash_shuffle(tagged.context, num_partitions, _cluster_cpus())
        return tagged.repartition(
            num_partitions, keys=[BUCKET_COL]
        ).map_batches(per_partition, batch_format="pyarrow", batch_size=None)
    return tagged.sort(BUCKET_COL).map_batches(
        per_partition, batch_format="pyarrow", batch_size=None
    )


def bucket_groupby(
    ds,
    key_cols: Sequence[str],
    fn: Callable[[pa.Table], pa.Table],
    *,
    num_buckets: int = 4096,
    spread: bool = False,
    spread_blocks: int | None = None,
    size_hint_bytes: int | None = None,
):
    """Hash-partition ``ds`` by ``key_cols`` and apply vectorized ``fn`` to
    each bucket (all rows of a bucket in one Arrow table, ``__bucket``
    already dropped).

    Physical plan: see ``exchange_map`` — hash repartition-by-bucket by
    default, legacy sort exchange via ``KGRAY_EXCHANGE=sort``.  Either way
    every ``fn`` here does its own per-key grouping internally (a hash
    bucket always contained many keys), so ``fn`` runs ONCE per partition
    over a union of whole buckets; ``groupby().map_groups`` would provide
    the same partitions but then pays a slice + batch-format conversion +
    Python call + output block PER GROUP, which at 4096 buckets doubled the
    small-corpus bench (minhash_lsh 13.4 s -> 26.5 s) for machinery no
    consumer needed.

    ``spread=True`` asks for a wide reduce because ``fn`` is CPU-heavy per
    bucket (pairwise verification).  In hash mode reduce width IS the
    partition count, so this just sets it explicitly; in sort mode it
    repartitions ahead of the sort (the sort's reduce width follows its
    input block count).  ``spread_blocks`` is deliberately decoupled from
    ``num_buckets`` (see module docstring: buckets must dominate partition
    counts, while the useful reduce width is a few × cores)."""
    key_cols = list(key_cols)

    def tag(batch: pa.Table) -> pa.Table:
        return add_bucket(batch, key_cols, num_buckets)

    def per_partition(part: pa.Table) -> pa.Table:
        return fn(part.drop_columns([BUCKET_COL]))

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    if spread_blocks is None:
        spread_blocks = default_exchange_partitions()
    if spread and exchange_mode(size_hint_bytes) != "hash":
        tagged = tagged.repartition(spread_blocks)
    return exchange_map(tagged, per_partition, num_partitions=spread_blocks,
                        size_hint_bytes=size_hint_bytes)


def dict_encode_columns(batch: pa.Table, cols: Sequence[str]) -> pa.Table:
    """Dictionary-encode ``cols`` so repeated string values ship through an
    exchange as int32 indices + one small dictionary per block, not one copy
    of the string per row (VERDICT r4 #2: exchange fan-in VOLUME was the
    width-resistant scaling residual; low-cardinality columns like ``pred``
    / ``lang`` / ``op`` compress 10-50x).  Arrow IPC — the object-store
    block format — serializes dictionary arrays natively, so the saving is
    real shuffle bytes, not just heap."""
    for c in cols:
        col = batch[c]
        if not pa.types.is_dictionary(col.type):
            i = batch.schema.get_field_index(c)
            batch = batch.set_column(i, c, pc.dictionary_encode(col))
    return batch


def dict_decode_columns(batch: pa.Table) -> pa.Table:
    """Decode every dictionary column back to its value type (the inverse
    of dict_encode_columns, applied on the receive side of an exchange so
    per-bucket kernels and downstream consumers see plain columns)."""
    for i, f in enumerate(batch.schema):
        if pa.types.is_dictionary(f.type):
            batch = batch.set_column(
                i, f.name, pc.cast(batch[f.name], f.type.value_type))
    return batch


def arrow_min_dedup(
    key_cols: Sequence[str], lineage_cols: Sequence[str]
) -> Callable[[pa.Table], pa.Table]:
    """Bucket fn: one row per key, column-wise min over the other columns."""
    key_cols, lineage_cols = list(key_cols), list(lineage_cols)

    def fn(t: pa.Table) -> pa.Table:
        return (
            t.group_by(key_cols, use_threads=False)
            .aggregate([(c, "min") for c in lineage_cols])
            .rename_columns(key_cols + lineage_cols)
        )

    return fn
