"""TTL ingest stage: snapshot documents -> triples Dataset (SURVEY.md M12).

The reference reads whole-entity TTL revisions into rdflib graphs one HTTP
response at a time (ttl_compare.py:150-183).  Distributed, a snapshot is a
Dataset of (entity, ttl-text) rows; parsing is a stateless ``map_batches``
over the pure ``kernels.ttl`` codec with ~1->hundreds row fan-out, exactly
like the HTML extract stage — so TTL snapshots stream through the same
downstream machinery (diff_snapshots, canonicalize, serialize) as pages.
"""

from __future__ import annotations

import pyarrow as pa

from ..kernels.ttl import parse_ttl

PARSED_SCHEMA = pa.schema(
    [
        ("entity", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_type", pa.string()),
        ("lang", pa.string()),
        ("datatype", pa.string()),
    ]
)


def parse_ttl_batch(batch: pa.Table, *, text_col: str = "ttl",
                    entity_col: str = "entity") -> pa.Table:
    cols: dict[str, list] = {name: [] for name in PARSED_SCHEMA.names}
    ents = batch[entity_col].to_pylist()
    texts = batch[text_col].to_pylist()
    for ent, text in zip(ents, texts):
        for (s, p, o, ot, lg, dt) in parse_ttl(text or ""):
            cols["entity"].append(ent)
            cols["subj"].append(s)
            cols["pred"].append(p)
            cols["obj"].append(o)
            cols["obj_type"].append(ot)
            cols["lang"].append(lg)
            cols["datatype"].append(dt)
    return pa.Table.from_pydict(cols, schema=PARSED_SCHEMA)


def parse_ttl_stage(snapshots, *, text_col: str = "ttl",
                    entity_col: str = "entity", batch_size: int = 64):
    """(entity, ttl) Dataset -> parsed triples Dataset.

    ``batch_size`` is small because one TTL document fans out into hundreds
    of rows and dump snapshots run to MBs per entity."""
    import functools

    fn = functools.partial(parse_ttl_batch, text_col=text_col,
                           entity_col=entity_col)
    return snapshots.map_batches(fn, batch_format="pyarrow",
                                 batch_size=batch_size)
