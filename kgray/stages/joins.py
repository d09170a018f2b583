"""Distributed join operators (SURVEY.md §2.4).

The reference has no relational join — its "joins" are per-record HTTP
lookups (S4, ST1-ST3 at get_updates.py:668-881).  The engine provides the
two scale-shaped join families:

* ``broadcast_join`` — small-side hash join: the dim table is materialized
  once on the driver (small by contract), shipped to the object store ONCE
  via ``ray.put``, and the per-task probe index is built once per
  actor/task (never per batch).  No shuffle; the fact side streams.  This is
  the alias-table pattern of SURVEY.md §2.4 generalized.
* ``hash_semi_join`` / ``hash_anti_join`` — big-big existence joins on
  Ray Data's native hash-shuffle join, with the right side first reduced to
  DISTINCT keys by a per-batch combiner so only unique keys pay exchange
  cost (the diff stage in stages/diff.py shares this physical shape).
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import ray


def _materialize_small(dim, columns: Sequence[str]) -> pa.Table:
    """Driver-side materialize of a SMALL dataset (dims: region/nation/...).
    Deliberate: broadcast joins only make sense when one side fits in one
    object; big-big joins go through hash_semi/anti or Dataset.join."""
    if isinstance(dim, pa.Table):
        return dim.select(list(columns))
    refs = dim.select_columns(list(columns)).to_arrow_refs()
    return pa.concat_tables([ray.get(r) for r in refs])


def broadcast_join(facts, dim, *, on: str, right_on: str | None = None,
                   dim_cols: Sequence[str], how: str = "inner",
                   batch_size: int = 65536, concurrency=(1, 8)):
    """facts ⋈ small-dim via object-store broadcast (no shuffle).

    ``dim`` may be a Dataset or a pyarrow Table; ``dim_cols`` are the dim
    columns appended to each matching fact row.  ``how`` ∈ {'inner','left'}.
    """
    right_on = right_on or on
    dim_cols = list(dim_cols)
    dim_ref = ray.put(_materialize_small(dim, [right_on, *dim_cols]))

    class Probe:
        """Per-actor state: the dim table as Arrow (no Python dict).  The
        probe is fully vectorized — ``pc.index_in`` for the gather index,
        ``pc.is_valid`` for the inner-join mask, ``pc.take`` for the column
        gather.  ``take`` with null indices yields typed nulls, so an
        all-miss / zero-row batch keeps the dim columns' declared types and
        every block has an identical schema."""

        def __init__(self):
            import pyarrow.compute as pc

            self.dim: pa.Table = ray.get(dim_ref).combine_chunks()
            self.key_col = self.dim[right_on]
            # pc.index_in returns the FIRST matching dim row; a dim with
            # duplicate keys would silently join arbitrary values — fail
            # loudly instead (small table by contract, so this is cheap)
            n_unique = len(pc.unique(self.key_col))
            if n_unique != len(self.dim):
                raise ValueError(
                    f"broadcast_join dim has duplicate '{right_on}' keys "
                    f"({len(self.dim)} rows, {n_unique} distinct)"
                )

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            idx = pc.index_in(batch[on], value_set=self.key_col)
            if how == "inner":
                valid = pc.is_valid(idx)
                batch = batch.filter(valid)
                idx = idx.filter(valid)
            for c in dim_cols:
                batch = batch.append_column(c, pc.take(self.dim[c], idx))
            return batch

    return facts.map_batches(Probe, batch_format="pyarrow",
                             batch_size=batch_size, concurrency=concurrency)


def distinct_keys(ds, key: str):
    """Reduce a dataset to its unique key values: per-batch combiner (local
    ``pyarrow`` group_by) so only unique keys cross the wire, then the global
    distinct happens inside the downstream hash join / groupby."""

    def local(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({key: batch[key]}).group_by(key).aggregate([])

    return ds.map_batches(local, batch_format="pyarrow")


def hash_semi_join(left, right, *, on: str, num_partitions: int = 8):
    """Rows of ``left`` whose key appears in ``right`` (one hash exchange).

    ``num_partitions`` defaults small for test-scale tables (a 32-way
    exchange of 100k rows is per-partition overhead, measured 4x slower in
    the bench); at cluster scale pass a value sized to data volume /
    target partition bytes (≈ several × cluster cores)."""
    return left.join(distinct_keys(right, on), join_type="left_semi",
                     num_partitions=num_partitions, on=(on,))


def hash_anti_join(left, right, *, on: str, num_partitions: int = 8):
    """Rows of ``left`` whose key does NOT appear in ``right``."""
    return left.join(distinct_keys(right, on), join_type="left_anti",
                     num_partitions=num_partitions, on=(on,))
