"""Mention detection + QID disambiguation kernels (SURVEY.md ST1/M19, §2.4).

The reference resolves surface forms to QIDs by mining hrefs and querying
live endpoints (extract_href get_updates.py:883-916, get_entity_json
:668-674).  The engine replaces that with a broadcast alias table probed
locally: exact-match surface lookup + a context score for ambiguous
surfaces (token overlap between the mention's context window and the
candidate sense's keyword vocabulary), ties broken by prior then QID.

Pure functions; the alias index is built once (driver or actor ``__init__``)
and shipped via ``ray.put`` — the broadcast small-side join of SURVEY.md §2.4.
"""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(r"[A-Za-z][A-Za-z0-9'-]*")


def build_alias_index(
    rows: list[dict],
) -> dict[str, list[tuple[str, float, frozenset[str]]]]:
    """surface_form -> [(qid, prior, context_keyword_set)], prior-descending.

    ~10^7-row scale: this dict is built once on the driver and broadcast via
    ``ray.put``; each linker actor gets it zero-copy-ish from the local
    object store instead of re-shipping per batch.
    """
    index: dict[str, list[tuple[str, float, frozenset[str]]]] = {}
    for r in rows:
        index.setdefault(r["surface_form"], []).append(
            (r["qid"], float(r["prior"]), frozenset(r["context_keywords"].split()))
        )
    for cands in index.values():
        cands.sort(key=lambda c: (-c[1], c[0]))
    return index


def compile_surface_pattern(surfaces: list[str]) -> re.Pattern:
    """One alternation regex over all known surfaces, longest-first so the
    longest surface wins at a position (compiled once per actor, ST1)."""
    parts = sorted((re.escape(s) for s in set(surfaces)), key=len, reverse=True)
    return re.compile(r"(?<![\w])(" + "|".join(parts) + r")(?![\w])")


def tokenize(text: str) -> frozenset[str]:
    return frozenset(t.lower() for t in _TOKEN_RE.findall(text))


def score_candidates(
    candidates: list[tuple[str, float, frozenset[str]]], context_tokens: frozenset[str]
) -> str:
    """Pick the QID whose keyword set overlaps the context most; break ties
    by prior (descending) then QID (candidates arrive prior-sorted)."""
    best_qid, best_key = "", None
    for qid, prior, kws in candidates:
        overlap = len(kws & context_tokens) if kws else 0
        key = (overlap, prior, qid)
        if best_key is None or key > best_key:
            best_qid, best_key = qid, key
    return best_qid


def detect_and_link(
    body_text: str,
    index: dict[str, list[tuple[str, float, frozenset[str]]]],
    pattern: re.Pattern,
    linked_spans: list[tuple[int, int]] | None = None,
) -> list[tuple[str, str, int, int]]:
    """Find alias surfaces in free text and resolve each to a QID.

    Returns [(surface, qid, start, end)].  Spans already consumed by exact
    href mentions are skipped (they carry their own qid_hint).
    """
    if not body_text:
        return []
    taken = sorted(linked_spans or [])
    ctx = tokenize(body_text)
    out: list[tuple[str, str, int, int]] = []
    for m in pattern.finditer(body_text):
        s, e = m.span(1)
        if any(ts < e and s < te for ts, te in taken):
            continue
        cands = index.get(m.group(1))
        if not cands:
            continue
        out.append((m.group(1), score_candidates(cands, ctx), s, e))
    return out
