"""Serialize stage: ops rows -> per-triple SPARQL command text (SURVEY.md
M16/M18).

The canonical output contract is the per-triple command
``{INSERT|DELETE} DATA { s p o . };`` established by the reference's tests
and golden file (test_ttl_compare.py:142-147, sample_result.txt) — NOT the
drifted block format at ttl_compare.py:239-240 (see SURVEY.md §5 format-drift
finding).  Serialization is a final projection over structured columns; text
never exists mid-pipeline.
"""

from __future__ import annotations

import pyarrow as pa

from ..kernels.rdf import PREFIX_HEADER, format_object, triple_to_command


def serialize_batch(batch: pa.Table) -> pa.Table:
    subj = batch["subj"].to_pylist()
    pred = batch["pred"].to_pylist()
    obj = batch["obj"].to_pylist()
    ot = batch["obj_type"].to_pylist()
    lang = batch["lang"].to_pylist()
    dt = batch["datatype"].to_pylist()
    op = batch["op"].to_pylist()
    cmds = [
        triple_to_command(op[i], subj[i], pred[i],
                          format_object(obj[i], ot[i], lang[i] or None, dt[i] or None))
        for i in range(len(subj))
    ]
    return pa.Table.from_pydict({"command": pa.array(cmds, pa.string())})


def serialize_stage(ops, *, batch_size: int = 65536):
    """ops Dataset -> one-column ``command`` Dataset."""
    return ops.map_batches(serialize_batch, batch_format="pyarrow", batch_size=batch_size)


def write_conformance_file(ops, path: str) -> int:
    """Small-scale conformance sink: prefix header then one command per line
    (write_to_file analog, sparql_updates.py:313-333).  Driver-side iteration
    is deliberate — this sink is for test-sized outputs only."""
    n = 0
    with open(path, "w") as f:
        f.write(PREFIX_HEADER + "\n\n")
        for b in serialize_stage(ops).iter_batches(batch_size=65536, batch_format="pyarrow"):
            for cmd in b["command"].to_pylist():
                f.write(cmd + "\n")
                n += 1
    return n


def console_sink(ops, n: int = 20) -> int:
    """S6 console sink: print the first ``n`` commands (the reference's
    PRINT_OUTPUT debug path, get_updates.py:565-571).  Bounded by
    ``Dataset.limit`` — never pulls more than ``n`` rows to the driver."""
    shown = 0
    for b in serialize_stage(ops.limit(n)).iter_batches(
        batch_size=max(1, n), batch_format="pyarrow"
    ):
        for cmd in b["command"].to_pylist():
            print(cmd)
            shown += 1
    return shown
