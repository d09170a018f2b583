"""Independent extraction oracle (VERDICT r2 "what's missing" #1).

tests/golden/extract_expected.parquet is frozen output of
scripts/golden_extract.py — a from-scratch second extractor (regex grammar
parse, alternation-regex linker, inline sha1 ids) that imports NOTHING from
kgray.kernels / kgray.stages.  The distributed pipeline must reproduce it
exactly; a bug inside the shared extraction kernels now fails here instead
of self-validating through the raw-ops oracle (model: the reference's
golden corpus, sample_result.txt + test_ttl_compare.py:128-206).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "extract_expected.parquet")
N_PAGES = 50


def test_pipeline_matches_independent_golden(ray_session, tmp_path):
    from kgray.fixtures import write_pages_corpus
    from kgray.pipelines.kg import kg_triples, read_pages

    def stable(b: pa.Table) -> pa.Table:  # closure: pickles by value
        i = b.column_names.index("warc_ts")
        return b.set_column(i, pa.field("warc_ts_us", pa.int64()),
                            pc.cast(b["warc_ts"], pa.int64()))

    # sharded input so the comparison exercises the distributed path
    paths = write_pages_corpus(str(tmp_path / "pages"), N_PAGES, shard_rows=10)
    got = (
        kg_triples(read_pages(paths))
        .map_batches(stable, batch_format="pyarrow")
        .to_pandas()
    )
    want = pq.read_table(GOLDEN).to_pandas()
    assert len(got) == len(want)
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols, ignore_index=True)
    b = want[cols].sort_values(cols, ignore_index=True)
    assert a.equals(b), "pipeline diverges from the independent golden extractor"


def test_golden_regenerates_identically():
    """The generator script is deterministic: rebuilding in-process yields
    the checked-in bytes (guards against silent fixture drift)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "golden_extract",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "golden_extract.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rebuilt = mod.build_golden(N_PAGES)
    frozen = pq.read_table(GOLDEN)
    assert rebuilt.equals(frozen)
