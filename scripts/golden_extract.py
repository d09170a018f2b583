"""Independent golden extractor: freezes the expected canonical triples for
a 50-page fixture subset WITHOUT touching the pipeline's extraction code.

This is the second-implementation oracle of VERDICT r2 "what's missing" #1
(modeled on the reference's golden corpus, sample_result.txt +
test_ttl_compare.py:128-206): kgray's own extraction chain
(kernels/htmltext.py -> stages/link.py -> kernels/assemble.py ->
stages/canonicalize.py) is NOT imported here.  Everything is restated from
scratch:

* parsing is regex-over-the-known-fixture-grammar (no DOM walk);
* entity linking is the original longest-first regex alternation with
  word-boundary lookarounds (the spec SurfaceMatcher restates);
* statement / time-node / reference ids are inline sha1 restatements;
* claim scaffolds, time-node expansion, link normalization and the
  canonical (warc_ts, src_url)-min dedup are re-derived from SURVEY.md §2
  semantics (reference: get_updates.py:490-658, new_entity_rdf.py:85-108).

A divergence between the distributed pipeline and this file's frozen output
(tests/golden/extract_expected.parquet) therefore catches bugs INSIDE the
shared kernels, which the raw-ops oracle (fixtures.raw_ops_table) cannot —
that one runs the same kernels sequentially and only verifies the plumbing.

Regenerate (only when fixture content or extraction semantics change):
    python scripts/golden_extract.py
then review the diff of the checked-in parquet before committing.
"""

from __future__ import annotations

import hashlib
import os
import re
import sys
from datetime import datetime
from html import unescape

import pyarrow as pa
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# input data only: the page generator and the alias table ARE the corpus
from kgray.fixtures import ALIASES, gen_page  # noqa: E402

N_PAGES = 50
GOLDEN_PATH = os.path.join(_REPO, "tests", "golden", "extract_expected.parquet")
_EPOCH = datetime(1970, 1, 1)

# --- inline id / normalization restatements (NOT imported from kgray) ---


def _sha(parts: tuple[str, ...]) -> str:
    return hashlib.sha1("\x1f".join(parts).encode("utf-8")).hexdigest()


def _stmt_id(ent: str, prop: str, value: str) -> str:
    h = _sha((ent, prop, value))
    return f"s:{ent}-{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def _time_vid(tv: str) -> str:
    return "v:" + _sha((tv, "11", "0", "wd:Q1985727"))


def _ref_id(ent: str, pprop: str, rprop: str, rval: str) -> str:
    return "ref:" + _sha((ent, pprop, rprop, rval))


def _fix_tz(v: str) -> str:
    return v.replace("+00:00", "Z")


def _norm_lang(tag: str) -> str:
    return tag.replace("_", "-")


_WS = re.compile(r"\s+")
_TAGS = re.compile(r"<[^>]+>")


def _clean(s: str) -> str:
    return _WS.sub(" ", unescape(s)).strip()


def _strip_tags(s: str) -> str:
    return _clean(_TAGS.sub("", s))


# --- fixture-grammar regexes ---

_BODY = re.compile(r'<body data-entity="([^"]*)" lang="([^"]*)">')
_H1 = re.compile(r'<h1 lang="([^"]*)">(.*?)</h1>')
_DESC = re.compile(r'<p class="description" lang="([^"]*)">(.*?)</p>')
_ALIAS_UL = re.compile(r'<ul class="aliases">(.*?)</ul>')
_LI = re.compile(r'<li lang="([^"]*)">(.*?)</li>')
_CLAIM = re.compile(
    r'<div class="claim" data-prop="([^"]*)" data-type="([^"]*)"'
    r' data-rank="([^"]*)">')
_DIV_TOK = re.compile(r"<div\b|</div>")
_SUBDIV = re.compile(
    r'<div class="(qualifier|reference)" data-prop="([^"]*)"'
    r' data-type="([^"]*)">(.*?)</div>')
_QLINK = re.compile(r'<a href="/wiki/(Q\d+)">')
_TIME = re.compile(r'<span class="wb-time-rendered">(.*?)</span>')
_QTY = re.compile(r'<span class="wb-quantity-rendered">(.*?)</span>')
_MONO = re.compile(r'<span class="monolingual" lang="([^"]*)">(.*?)</span>')
_SVAL = re.compile(r'<span class="value">(.*?)</span>')
_TABLE = re.compile(r'<table class="diff">(.*?)</table>')
_TR = re.compile(r"<tr>(.*?)</tr>")
_LINENO = re.compile(r'<td class="diff-lineno"><a href="/wiki/Property:(P\d+)">')
_DEL = re.compile(r'<td class="diff-deletedline">.*?<a href="/wiki/(Q\d+)">')
_ADD = re.compile(r'<td class="diff-addedline">.*?<a href="/wiki/(Q\d+)">')
_BODY_P = re.compile(r'<p class="body-text">(.*?)</p>')
_ALINK = re.compile(r'<a href="/wiki/(Q\d+)">(.*?)</a>')
_CTX_TOKEN = re.compile(r"[A-Za-z][A-Za-z0-9'-]*")


def _value_of(fragment: str, dtype: str) -> tuple[str, str]:
    """(value, lang) for a claim/qualifier/reference fragment, typed by the
    data-type attribute (the generator guarantees attr/content agreement;
    the pipeline sniffs content — two independent routes, same answer)."""
    if dtype == "wikibase-entityid":
        return _QLINK.search(fragment).group(1), ""
    if dtype == "time":
        return _clean(_TIME.search(fragment).group(1)), ""
    if dtype == "quantity":
        return _clean(_QTY.search(fragment).group(1)), ""
    if dtype == "monolingualtext":
        m = _MONO.search(fragment)
        return _clean(m.group(2)), m.group(1)
    return _clean(_SVAL.search(fragment).group(1)), ""


def _typed_object(dtype: str, value: str, lang: str) -> tuple[str, str, str, str]:
    """(obj, obj_type, lang, datatype) — new_entity_rdf.py:85-108 dispatch."""
    if dtype == "wikibase-entityid":
        return f"wd:{value}", "iri", "", ""
    if dtype == "time":
        return _fix_tz(value), "literal", "", "xsd:dateTime"
    if dtype == "quantity":
        return value, "literal", "", "xsd:decimal"
    if dtype == "monolingualtext":
        return value, "literal", _norm_lang(lang) if lang else "", ""
    return value, "literal", "", ""


def _time_rows(value: str) -> tuple[str, list[tuple]]:
    tv = _fix_tz(value)
    vid = _time_vid(tv)
    return vid, [
        (vid, "rdf:type", "wikibase:TimeValue", "iri", "", ""),
        (vid, "wikibase:timeValue", tv, "literal", "", "xsd:dateTime"),
        (vid, "wikibase:timePrecision", "11", "literal", "", "xsd:integer"),
        (vid, "wikibase:timeTimezone", "0", "literal", "", "xsd:integer"),
        (vid, "wikibase:timeCalendarModel", "wd:Q1985727", "iri", "", ""),
    ]


def _claim_blocks(html: str):
    """(prop, dtype, rank, inner_html) per claim div, via a depth counter —
    qualifier/reference sub-divs nest one level deep."""
    for m in _CLAIM.finditer(html):
        depth, pos = 1, m.end()
        end = pos
        while depth:
            t = _DIV_TOK.search(html, pos)
            depth += 1 if t.group() != "</div>" else -1
            end, pos = t.start(), t.end()
        yield m.group(1), m.group(2), m.group(3), html[m.end():end]


# --- the original alternation-regex linker (the SurfaceMatcher spec) ---

_ALIAS_INDEX: dict[str, list[tuple[str, float, frozenset[str]]]] = {}
for _s, _q, _p, _k in ALIASES:
    _ALIAS_INDEX.setdefault(_s, []).append((_q, _p, frozenset(_k.split())))
_SURFACE_RE = re.compile(
    r"(?<![\w])("
    + "|".join(sorted((re.escape(s) for s in _ALIAS_INDEX),
                      key=len, reverse=True))
    + r")(?![\w])"
)


def _link_mentions(body_text: str, taken: list[tuple[int, int]]) -> list[str]:
    """QIDs for alias surfaces in free text: longest-first finditer, skip
    spans consumed by href mentions, context-overlap scoring with
    (overlap, prior, qid)-max tie-breaking."""
    ctx = {t.lower() for t in _CTX_TOKEN.findall(body_text)}
    out = []
    for m in _SURFACE_RE.finditer(body_text):
        s0, e = m.span(1)
        if any(ts < e and s0 < te for ts, te in taken):
            continue
        best_qid, best_key = "", None
        for qid, prior, kws in _ALIAS_INDEX[m.group(1)]:
            key = (len(kws & ctx), prior, qid)
            if best_key is None or key > best_key:
                best_qid, best_key = qid, key
        out.append(best_qid)
    return out


def extract_page_triples(html: str) -> list[tuple]:
    """One page -> [(subj, pred, obj, obj_type, lang, datatype, op)]."""
    ent, page_lang = _BODY.search(html).groups()
    subj = f"wd:{ent}"
    rows: list[tuple] = []

    def add(s, p, o, ot, lg, dt, op="INSERT"):
        rows.append((s, p, o, ot, lg, dt, op))

    def scaffold(pid: str, dtype: str, value: str, lang: str, rank: str,
                 op: str) -> None:
        """Full claim scaffold (handle_claim_updates, get_updates.py:490-514)."""
        sid = _stmt_id(ent, pid, value)
        obj, ot, lg, dt = _typed_object(dtype, value, lang)
        add(subj, f"p:{pid}", sid, "iri", "", "", op)
        add(sid, "rdf:type", "wikibase:Statement", "iri", "", "", op)
        if rank in ("normal", "preferred", ""):
            add(sid, "rdf:type", "wikibase:BestRank", "iri", "", "", op)
        add(sid, f"ps:{pid}", obj, ot, lg, dt, op)
        add(subj, f"wdt:{pid}", obj, ot, lg, dt, op)
        if dtype == "string" and value.startswith("http"):
            link = value.replace("https", "http", 1) if value.startswith("https") else value
            add(sid, f"psn:{pid}", f"<{link}>", "iri", "", "", op)
            add(subj, f"wdtn:{pid}", f"<{link}>", "iri", "", "", op)
        if dtype == "time":
            vid, tn = _time_rows(value)
            add(sid, f"psv:{pid}", vid, "iri", "", "", op)
            for t in tn:
                add(*t, op)

    # label / descriptions / aliases (new_entity_rdf.py:58-71)
    h1 = _H1.search(html)
    add(subj, "rdf:type", "schema:Thing", "iri", "", "")
    add(subj, "schema:name", _clean(h1.group(2)), "literal",
        _norm_lang(h1.group(1)), "")
    for lang, text in _DESC.findall(html):
        add(subj, "schema:description", _clean(text), "literal",
            _norm_lang(lang), "")
    for ul in _ALIAS_UL.findall(html):
        for lang, text in _LI.findall(ul):
            add(subj, "skos:altLabel", _clean(text), "literal",
                _norm_lang(lang), "")

    # claims with qualifiers / references
    for pid, dtype, rank, inner in _claim_blocks(html):
        subs = list(_SUBDIV.finditer(inner))
        main = inner
        for sm in reversed(subs):
            main = main[:sm.start()] + main[sm.end():]
        value, vlang = _value_of(main, dtype)
        scaffold(pid, dtype, value, vlang, rank, "INSERT")
        sid = _stmt_id(ent, pid, value)
        for sm in subs:
            kind, sprop, sdtype, sinner = sm.groups()
            sval, slang = _value_of(sinner, sdtype)
            obj, ot, lg, dt = _typed_object(sdtype, sval, slang)
            if kind == "qualifier":
                add(sid, f"pq:{sprop}", obj, ot, lg, dt)
                if sdtype == "time":
                    vid, tn = _time_rows(sval)
                    add(sid, f"pqv:{sprop}", vid, "iri", "", "")
                    for t in tn:
                        add(*t)
            else:  # reference (handle_nested, get_updates.py:575-629)
                rid = _ref_id(ent, pid, sprop, sval)
                add(sid, "prov:wasDerivedFrom", rid, "iri", "", "")
                add(rid, "rdf:type", "wikibase:Reference", "iri", "", "")
                add(rid, f"pr:{sprop}", obj, ot, lg, dt)
                if sdtype == "time":
                    vid, tn = _time_rows(sval)
                    add(rid, f"prv:{sprop}", vid, "iri", "", "")
                    for t in tn:
                        add(*t)

    # diff tables: predicate cursor over tr rows (get_updates.py:191-358)
    for table in _TABLE.findall(html):
        cur = ""
        for tr in _TR.findall(table):
            ln = _LINENO.search(tr)
            if ln:
                cur = ln.group(1)
                continue
            for pat, op in ((_DEL, "DELETE"), (_ADD, "INSERT")):
                vm = pat.search(tr)
                if vm:
                    scaffold(cur, "wikibase-entityid", vm.group(1), "",
                             "normal", op)

    # free-text mentions: href qids + alias-surface linking
    for para in _BODY_P.findall(html):
        body_text = _strip_tags(para)
        taken: list[tuple[int, int]] = []
        for qid, surface_html in _ALINK.findall(para):
            add(subj, "schema:mentions", f"wd:{qid}", "iri", "", "")
            surface = _clean(surface_html)
            start = body_text.find(surface)
            if start >= 0:
                taken.append((start, start + len(surface)))
        for qid in _link_mentions(body_text, taken):
            add(subj, "schema:mentions", f"wd:{qid}", "iri", "", "")

    return rows


def build_golden(n_pages: int = N_PAGES) -> pa.Table:
    """Extract + canonical dedup ((warc_ts, src_url)-min survivor per
    (op, subj, pred, obj, lang, datatype, obj_type) key), sorted."""
    best: dict[tuple, tuple] = {}
    for i in range(n_pages):
        page = gen_page(i)
        url = page["url"]
        ts_us = (page["warc_ts"] - _EPOCH) // __import__("datetime").timedelta(
            microseconds=1)
        for s, p, o, ot, lg, dt, op in extract_page_triples(
                page["html"].decode("utf-8")):
            key = (op, s, p, o, lg, dt, ot)
            lineage = (ts_us, url)
            if key not in best or lineage < best[key][:2]:
                best[key] = (ts_us, url)
    rows = sorted(
        (k[1], k[2], k[3], k[6], k[4], k[5], v[1], v[0], k[0])
        for k, v in best.items()
    )
    cols = list(zip(*rows))
    names = ("subj", "pred", "obj", "obj_type", "lang", "datatype",
             "src_url", "warc_ts_us", "op")
    types = [pa.string()] * 7 + [pa.int64(), pa.string()]
    types[6] = pa.string()
    return pa.Table.from_arrays(
        [pa.array(list(c), t) for c, t in zip(cols, types)], names=list(names)
    )


def main() -> None:
    t = build_golden()
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    pq.write_table(t, GOLDEN_PATH)
    print(f"wrote {len(t)} expected triples for {N_PAGES} pages -> {GOLDEN_PATH}")


if __name__ == "__main__":
    main()
