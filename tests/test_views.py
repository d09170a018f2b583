"""Block / change-log presentation views (reference get_updates.py:517-572
block shape, :1171-1176 newest-first ordering; sample_result.txt)."""

from __future__ import annotations


def _ops(small_corpus):
    from kgray.pipelines.kg import read_pages, kg_triples

    return kg_triples(read_pages(small_corpus))


def test_blocks_reconcile_with_commands(ray_session, small_corpus):
    from kgray.pipelines.views import kg_blocks
    from kgray.stages.serialize import serialize_stage

    ops = _ops(small_corpus)
    blocks = kg_blocks(ops).to_pandas()
    n_cmds = serialize_stage(_ops(small_corpus)).materialize().count()
    assert blocks["n_commands"].sum() == n_cmds
    # golden-file shape (sparql_updates.py:443 / sample_result.txt):
    # header line, blank line, one command per line
    row = blocks.iloc[0]
    lines = row["block"].split("\n")
    assert lines[0] == (
        f"changes for entity: {row['entity']} between old_revid: "
        f"{row['old_rev']} and new_revid: {row['rev']}"
    )
    assert 0 <= row["old_rev"] <= row["rev"]
    assert lines[1] == ""
    body = lines[2:]
    assert len(body) == row["n_commands"]
    assert all(l.endswith(" . };") for l in body)
    assert all(l.startswith(("INSERT DATA { ", "DELETE DATA { ")) for l in body)
    assert body == sorted(body)


def test_changelog_newest_first(ray_session, small_corpus):
    from kgray.pipelines.views import kg_changelog

    log = kg_changelog(_ops(small_corpus)).to_pandas()
    assert (log["warc_ts_us"].diff().dropna() <= 0).all()
    assert set(log.columns) == {"warc_ts_us", "entity", "op", "command"}
