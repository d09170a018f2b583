"""Assemble stage: raw-claim rows -> typed triple rows (SURVEY.md M5-M11).

Stateless ``map_batches``; all ids (statement / value-node / reference) are
deterministic content hashes minted row-locally (kernels.ids), so this stage
needs no joins, no lookups, no shared state — the key architectural departure
from the reference's SPARQL-endpoint resolution (get_updates.py:734-881).
Fan-out is ~1->4..12 rows (claim scaffolds, time-node quads).
"""

from __future__ import annotations

import pyarrow as pa

from ..kernels.assemble import raw_claim_to_triples

OPS_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_type", pa.string()),
        ("lang", pa.string()),
        ("datatype", pa.string()),
        ("src_url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("op", pa.string()),
    ]
)

_ROW_FIELDS = ("entity", "kind", "prop", "vtype", "value", "lang", "rank",
               "parent_prop", "parent_value", "op")


def assemble_batch(batch: pa.Table) -> pa.Table:
    cols = {name: [] for name in OPS_SCHEMA.names}
    data = {f: batch[f].to_pylist() for f in _ROW_FIELDS}
    urls = batch["url"].to_pylist()
    tss = batch["warc_ts"].to_pylist()
    n = len(urls)
    for i in range(n):
        row = {f: data[f][i] for f in _ROW_FIELDS}
        for (s, p, o, ot, lg, dt, op) in raw_claim_to_triples(row):
            cols["subj"].append(s)
            cols["pred"].append(p)
            cols["obj"].append(o)
            cols["obj_type"].append(ot)
            cols["lang"].append(lg)
            cols["datatype"].append(dt)
            cols["src_url"].append(urls[i])
            cols["warc_ts"].append(tss[i])
            cols["op"].append(op)
    return pa.Table.from_pydict(cols, schema=OPS_SCHEMA)


def assemble_stage(raw_claims, *, batch_size: int = 8192):
    return raw_claims.map_batches(
        assemble_batch, batch_format="pyarrow", batch_size=batch_size
    )
