"""kgray — a Ray-Data-native knowledge-graph construction engine.

Re-expresses the query/data-processing capabilities of the reference
(``sinaazimii/Wikidata-tools``, a single-threaded HTTP-driven CLI) as
streaming ``ray.data.Dataset`` pipelines over zero-copy Arrow batches:

    pages (url, warc_ts, html, text, lang)
      -> extract   (HTML -> text + raw claims + mention candidates)   [stateless map_batches]
      -> link      (alias-table + context-score QID linking)          [actor pool]
      -> assemble  (claims -> typed RDF triples, scaffolds, ids)      [stateless map_batches]
      -> canonicalize (exact dedup, salted groupby for head keys)     [shuffle]
      -> diff      (old vs new snapshot anti-join -> INSERT/DELETE)   [shuffle]
      -> materialize (sort, partitioned parquet, lineage manifests)   [shuffle + sink]

Everything is built on public APIs only: Ray Data, pyarrow, pandas, numpy.
No module-global state; all shared state rides in actor constructors or
``ray.put`` broadcasts (the reference's module globals at
``get_updates.py:95-102`` are designed out, per SURVEY.md §2.3/ST4).
"""

import os as _os

# polars (used by stages.shuffle for the exchange row hash, and by Ray Data
# itself for sorts) defaults to a rayon pool of one thread per core PER
# PROCESS; under 32 concurrent Ray tasks that oversubscribes the node
# ~cores-fold.  Binding is first-import-wins, so claim it as early as
# possible in every process that imports kgray (drivers and Ray workers
# alike).  Deliberately setdefault: an explicit user setting wins.
_os.environ.setdefault("POLARS_MAX_THREADS", "1")

__version__ = "0.1.0"
