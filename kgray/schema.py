"""Declared Arrow schemas for every logical table (SURVEY.md §1.2).

The reference is stringly-typed record-at-a-time Python; the engine fixes a
columnar schema per stage so every ``map_batches`` can run
``batch_format="pyarrow"`` zero-copy.
"""

from __future__ import annotations

import pyarrow as pa

# Primary input — authoritative shape from BASELINE.json input_hint.
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)

# Output of the extract stage: one row per raw claim/fact found on a page.
# Flat columns (not structs) so downstream shuffles can key on them directly.
# kind: label | desc | alias | claim | qualifier | reference | diff | mention
RAW_CLAIMS = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("entity", pa.string()),  # page subject QID
        ("kind", pa.string()),
        ("prop", pa.string()),  # P-id or schema section name
        ("vtype", pa.string()),  # wikibase-entityid|string|time|quantity|monolingualtext
        ("value", pa.string()),
        ("lang", pa.string()),  # nullable language tag
        ("rank", pa.string()),  # normal|preferred|deprecated ('' for non-claims)
        # for qualifier/reference rows: identity of the parent claim so the
        # deterministic statement id can be minted row-locally (no join)
        ("parent_prop", pa.string()),
        ("parent_value", pa.string()),
        # for diff rows: 'insert' | 'delete'; '' otherwise
        ("op", pa.string()),
    ]
)

# Output of mention detection (extract stage) before linking.
MENTIONS = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("entity", pa.string()),  # page subject QID
        ("mention", pa.string()),  # surface form as found
        ("span_start", pa.int32()),
        ("span_end", pa.int32()),
        ("context", pa.string()),  # window of surrounding text
        ("qid_hint", pa.string()),  # exact QID when the mention was an href link
    ]
)

# The core triples table (SURVEY.md §1.2): flat columns beat a struct for
# shuffle keys.  obj_type: 'iri' | 'literal'.
TRIPLES = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_type", pa.string()),
        ("lang", pa.string()),
        ("datatype", pa.string()),
        ("src_url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
    ]
)

# ops table = triples + op column ('INSERT' | 'DELETE').
OPS = pa.schema(list(TRIPLES) + [pa.field("op", pa.string())])

# Broadcast side tables.
ALIASES = pa.schema(
    [
        ("surface_form", pa.string()),
        ("qid", pa.string()),
        ("prior", pa.float32()),
        ("context_keywords", pa.string()),  # space-joined disambiguation vocab
    ]
)

PROPERTIES = pa.schema(
    [
        ("pid", pa.string()),
        ("label", pa.string()),
        ("datatype", pa.string()),
    ]
)

# Snapshot table for the diff engine (ttl_compare semantics).
SNAPSHOTS = pa.schema(
    [
        ("entity", pa.string()),
        ("side", pa.string()),  # 'old' | 'new'
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_type", pa.string()),
        ("lang", pa.string()),
        ("datatype", pa.string()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
