"""Presentation views over the canonical ops (SURVEY.md A1 rendering).

The reference renders per-entity "changes for entity: X ..." blocks
(get_updates.py:517-572) and writes one change log merged newest-first
(get_updates.py:1171-1176, sample_result.txt).  The engine keeps commands
structured end-to-end and derives both presentations as final projections:

* ``kg_blocks``    — one row per source page: header + its commands joined
                     newest-first-sortable (entity/rev in the header like
                     the golden file), via the bucket exchange so rendering
                     stays one Arrow pass per bucket, not a Python call per
                     page.
* ``kg_changelog`` — one row per command with provenance (warc_ts, entity,
                     op), globally sorted newest-first (O1 sort shuffle) —
                     the write_to_file ordering as a streaming Dataset.

Both restate cleanly in SQL (string_agg / ORDER BY over the shared raw-ops
table), so the driver's hash compare covers the rendering too.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.serialize import serialize_batch

_ENTITY_PAT = r"^.*/wiki/(Q\d+)\?.*$"
_REV_PAT = r"^.*rev=(\d+)$"
_OLD_PAT = r"^.*old=(\d+)&.*$"


def _command_rows(b: pa.Table) -> pa.Table:
    """ops batch -> (entity, old_rev, rev, src_url, warc_ts_us, op, command)."""
    cmds = serialize_batch(b)["command"]
    return pa.Table.from_pydict(
        {
            "entity": pc.replace_substring_regex(
                b["src_url"], pattern=_ENTITY_PAT, replacement=r"\1"),
            "old_rev": pc.cast(pc.replace_substring_regex(
                b["src_url"], pattern=_OLD_PAT, replacement=r"\1"), pa.int64()),
            "rev": pc.cast(pc.replace_substring_regex(
                b["src_url"], pattern=_REV_PAT, replacement=r"\1"), pa.int64()),
            "src_url": b["src_url"],
            "warc_ts_us": pc.cast(b["warc_ts"], pa.int64()),
            "op": b["op"],
            "command": cmds,
        }
    )


def kg_blocks(ops):
    """canonical ops Dataset -> per-page block rows
    (entity, old_rev, rev, warc_ts_us, n_commands, block).

    The header matches the reference's golden block contract —
    ``changes for entity: {X} between old_revid: {old} and new_revid: {new}``
    (sparql_updates.py:443, every block of sample_result.txt)."""
    from ..stages.shuffle import bucket_groupby

    cmds = ops.map_batches(_command_rows, batch_format="pyarrow")

    def render(t: pa.Table) -> pa.Table:
        t = t.sort_by([("src_url", "ascending"), ("command", "ascending")])
        urls = t["src_url"].to_pylist()
        ents = t["entity"].to_pylist()
        olds = t["old_rev"].to_pylist()
        revs = t["rev"].to_pylist()
        tss = t["warc_ts_us"].to_pylist()
        commands = t["command"].to_pylist()
        out = {k: [] for k in
               ("entity", "old_rev", "rev", "warc_ts_us", "n_commands", "block")}
        start = 0
        n = len(urls)
        for end in range(1, n + 1):
            if end < n and urls[end] == urls[start]:
                continue
            header = (f"changes for entity: {ents[start]} between old_revid: "
                      f"{olds[start]} and new_revid: {revs[start]}")
            out["entity"].append(ents[start])
            out["old_rev"].append(olds[start])
            out["rev"].append(revs[start])
            out["warc_ts_us"].append(tss[start])
            out["n_commands"].append(end - start)
            out["block"].append(header + "\n\n" + "\n".join(commands[start:end]))
            start = end
        return pa.Table.from_pydict(
            {
                "entity": pa.array(out["entity"], pa.string()),
                "old_rev": pa.array(out["old_rev"], pa.int64()),
                "rev": pa.array(out["rev"], pa.int64()),
                "warc_ts_us": pa.array(out["warc_ts_us"], pa.int64()),
                "n_commands": pa.array(out["n_commands"], pa.int64()),
                "block": pa.array(out["block"], pa.string()),
            }
        )

    return bucket_groupby(cmds, ["src_url"], render)


def kg_changelog(ops):
    """canonical ops Dataset -> newest-first command log
    (warc_ts_us, entity, op, command)."""
    cmds = ops.map_batches(_command_rows, batch_format="pyarrow")
    log = cmds.drop_columns(["src_url", "rev", "old_rev"])
    return log.sort(["warc_ts_us", "command"], descending=[True, False])
