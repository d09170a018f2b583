"""Unit tests for the pure kernel library (SURVEY.md §5 test plan, item 1).

Mirrors the reference's own unit coverage: formatter flavors
(test_ttl_compare.py:209-264), prefix compaction (:267-305), prefix
membership (:308-345), command serialization incl. skip rules (:128-206),
plus the scalar catalog (§2.8)."""

from __future__ import annotations

from kgray.kernels import rdf
from kgray.kernels.assemble import raw_claim_to_triples
from kgray.kernels.htmltext import extract_text, parse_page
from kgray.kernels.ids import reference_hash, statement_id, time_node_id
from kgray.kernels.link import (
    build_alias_index,
    compile_surface_pattern,
    detect_and_link,
    score_candidates,
    tokenize,
)


class TestFormatObject:
    def test_lang_literal(self):
        assert rdf.format_object("Bonjour", "literal", "fr", None) == '"Bonjour"@fr'

    def test_datatype_literal_xsd_compaction_and_tz(self):
        got = rdf.format_object(
            "2021-01-01T00:00:00+00:00", "literal", None,
            "http://www.w3.org/2001/XMLSchema#dateTime",
        )
        assert got == '"2021-01-01T00:00:00Z"^^xsd:dateTime'

    def test_quote_escaping(self):
        assert rdf.format_object('say "hi"', "literal", None, None) == '"say \\"hi\\""'

    def test_plain_literal(self):
        assert rdf.format_object("Hello World", "literal", None, None) == '"Hello World"'

    def test_full_uri(self):
        assert rdf.format_object("https://example.org/x", "iri", None, None) == "<https://example.org/x>"

    def test_known_uri_compacts(self):
        assert rdf.format_object("http://www.wikidata.org/entity/Q42", "iri", None, None) == "wd:Q42"

    def test_prefixed_passthrough(self):
        assert rdf.format_object("wd:Q42", "iri", None, None) == "wd:Q42"

    def test_blank_node(self):
        assert rdf.format_object("_:b0", "iri", None, None) == "_:b0"


class TestPrefixes:
    def test_compact_longest_wins(self):
        assert rdf.compact_uri("http://www.wikidata.org/prop/statement/P31") == "ps:P31"
        assert rdf.compact_uri("http://www.wikidata.org/prop/P31") == "p:P31"

    def test_has_prefix(self):
        assert rdf.has_prefix("wdt:P569")
        assert not rdf.has_prefix("unknown:x")
        assert not rdf.has_prefix("nocolon")

    def test_header_contains_all(self):
        for p in rdf.PREFIX_TO_URI:
            assert f"PREFIX {p}: <" in rdf.PREFIX_HEADER


class TestScalars:
    def test_camel_case(self):
        assert rdf.to_camel_case("preferred rank") == "PreferredRank"

    def test_lang_normalization(self):
        assert rdf.normalize_lang("pt_BR") == "pt-BR"

    def test_scheme_normalization(self):
        assert rdf.normalize_scheme("https://x.org") == "http://x.org"
        assert rdf.normalize_scheme("http://x.org") == "http://x.org"

    def test_bce_roundtrip(self):
        ttl = '"-0347-01-01T00:00:00Z"^^xsd:dateTime'
        enc = rdf.encode_bce(ttl)
        assert "BCE_0347" in enc and not enc.startswith('"-')
        assert rdf.decode_bce("BCE_0347-01-01T00:00:00Z") == "-0347-01-01T00:00:00Z"

    def test_command(self):
        got = rdf.triple_to_command("INSERT", "wd:Q42", "wdt:P569", '"1952-03-11"^^xsd:date')
        assert got == 'INSERT DATA { wd:Q42 wdt:P569 "1952-03-11"^^xsd:date . };'

    def test_rdf_type_renders_a(self):
        got = rdf.triple_to_command("DELETE", "wd:Q42", "rdf:type", "schema:Thing")
        assert got == "DELETE DATA { wd:Q42 a schema:Thing . };"


class TestFilters:
    def test_owl(self):
        assert rdf.is_owl_triple("http://www.w3.org/2002/07/owl#Thing", "p", "o")
        assert not rdf.is_owl_triple("wd:Q42", "wdt:P31", "wd:Q5")

    def test_foreign_subject(self):
        assert rdf.is_foreign_subject("wd:Q99", "Q42")
        assert rdf.is_foreign_subject("wd:P31", "Q42")
        assert not rdf.is_foreign_subject("wd:Q42", "Q42")
        assert not rdf.is_foreign_subject("s:Q42-abc", "Q42")


class TestIds:
    def test_deterministic(self):
        a = statement_id("Q42", "P31", "Q5")
        assert a == statement_id("Q42", "P31", "Q5")
        assert a.startswith("Q42-")
        assert statement_id("Q42", "P31", "Q6") != a
        assert len(time_node_id("2020-01-01T00:00:00Z", 11, 0, "wd:Q1985727")) == 40
        assert len(reference_hash("Q42", "P31", "P854", "x")) == 40


class TestHtml:
    HTML = (
        '<html><head><title>T</title></head><body data-entity="Q42" lang="en">'
        "<h1>Douglas Adams</h1>"
        '<p class="description" lang="pt_BR">escritor</p>'
        '<div class="claims"><div class="claim" data-prop="P569" data-type="time">'
        '<a href="/wiki/Property:P569">P569</a>: '
        '<span class="wb-time-rendered">1952-03-11T00:00:00+00:00</span></div></div>'
        '<p class="body-text">See <a href="/wiki/Q90">Paris</a> for more.</p>'
        '<table class="diff"><tr><td class="diff-lineno">'
        '<a href="/wiki/Property:P106">P106</a></td></tr>'
        '<tr><td class="diff-deletedline"><del class="diffchange">'
        '<a href="/wiki/Q36180">writer</a></del></td></tr></table>'
        "</body></html>"
    )

    def test_extract_text_rules(self):
        txt = extract_text("<p>a   b</p><div>c<span> d</span></div><p></p>")
        assert txt == "a b\nc d"

    def test_parse_page(self):
        p = parse_page(self.HTML, "u")
        assert p["entity"] == "Q42"
        kinds = [c["kind"] for c in p["claims"]]
        assert kinds.count("label") == 1 and "claim" in kinds and "diff" in kinds
        diff = [c for c in p["claims"] if c["kind"] == "diff"][0]
        assert diff == dict(entity="Q42", kind="diff", prop="P106",
                            vtype="wikibase-entityid", value="Q36180", lang="",
                            rank="normal", parent_prop="", parent_value="", op="delete")
        assert p["mentions"][0]["qid_hint"] == "Q90"

    def test_byte_identity_on_corpus(self):
        from kgray.fixtures import gen_page

        for i in range(30):
            page = gen_page(i)
            assert extract_text(page["html"]) == page["text"], page["url"]


class TestAssemble:
    def test_claim_scaffold(self):
        rows = raw_claim_to_triples(
            dict(entity="Q42", kind="claim", prop="P31", vtype="wikibase-entityid",
                 value="Q5", lang="", rank="normal", parent_prop="", parent_value="", op="")
        )
        sid = "s:" + statement_id("Q42", "P31", "Q5")
        trip = {(s, p, o) for (s, p, o, *_rest) in rows}
        assert ("wd:Q42", "p:P31", sid) in trip
        assert (sid, "rdf:type", "wikibase:Statement") in trip
        assert (sid, "rdf:type", "wikibase:BestRank") in trip
        assert (sid, "ps:P31", "wd:Q5") in trip
        assert ("wd:Q42", "wdt:P31", "wd:Q5") in trip

    def test_url_string_claim_gets_normalized_forms(self):
        rows = raw_claim_to_triples(
            dict(entity="Q42", kind="claim", prop="P856", vtype="string",
                 value="https://example.org", lang="", rank="normal",
                 parent_prop="", parent_value="", op="")
        )
        preds = {p for (_s, p, _o, *_r) in rows}
        assert {"psn:P856", "wdtn:P856"} <= preds
        objs = {o for (_s, p, o, *_r) in rows if p.endswith("n:P856")}
        assert objs == {"<http://example.org>"}

    def test_time_claim_expands_value_node(self):
        rows = raw_claim_to_triples(
            dict(entity="Q42", kind="claim", prop="P569", vtype="time",
                 value="1952-03-11T00:00:00+00:00", lang="", rank="normal",
                 parent_prop="", parent_value="", op="")
        )
        preds = [p for (_s, p, _o, *_r) in rows]
        assert "psv:P569" in preds and "wikibase:timeValue" in preds
        tv = [o for (_s, p, o, *_r) in rows if p == "wikibase:timeValue"]
        assert tv == ["1952-03-11T00:00:00Z"]  # +00:00 -> Z

    def test_diff_delete_op(self):
        rows = raw_claim_to_triples(
            dict(entity="Q42", kind="diff", prop="P106", vtype="wikibase-entityid",
                 value="Q36180", lang="", rank="normal", parent_prop="",
                 parent_value="", op="delete")
        )
        assert {op for (*_x, op) in rows} == {"DELETE"}

    def test_reference_nested(self):
        rows = raw_claim_to_triples(
            dict(entity="Q42", kind="reference", prop="P854", vtype="string",
                 value="https://src.net/1", lang="", rank="", parent_prop="P31",
                 parent_value="Q5", op="")
        )
        sid = "s:" + statement_id("Q42", "P31", "Q5")
        rid = "ref:" + reference_hash("Q42", "P31", "P854", "https://src.net/1")
        trip = {(s, p, o) for (s, p, o, *_r) in rows}
        assert (sid, "prov:wasDerivedFrom", rid) in trip
        assert (rid, "rdf:type", "wikibase:Reference") in trip
        assert (rid, "pr:P854", "https://src.net/1") in trip


class TestLinker:
    ALIASES = [
        dict(surface_form="Mercury", qid="Q308", prior=0.55,
             context_keywords="planet orbit sun"),
        dict(surface_form="Mercury", qid="Q925", prior=0.45,
             context_keywords="element metal chemistry"),
        dict(surface_form="Berlin", qid="Q64", prior=0.95,
             context_keywords="germany capital"),
    ]

    def test_context_disambiguation(self):
        idx = build_alias_index(self.ALIASES)
        pat = compile_surface_pattern(list(idx))
        got = detect_and_link("Mercury is a toxic metal element.", idx, pat)
        assert [(s, q) for s, q, *_ in got] == [("Mercury", "Q925")]
        got = detect_and_link("Mercury orbits the sun.", idx, pat)
        assert [(s, q) for s, q, *_ in got] == [("Mercury", "Q308")]

    def test_prior_tiebreak(self):
        idx = build_alias_index(self.ALIASES)
        assert score_candidates(idx["Mercury"], tokenize("no context words")) == "Q308"

    def test_linked_span_skipped(self):
        idx = build_alias_index(self.ALIASES)
        pat = compile_surface_pattern(list(idx))
        text = "Berlin and Berlin"
        got = detect_and_link(text, idx, pat, [(0, 6)])
        assert len(got) == 1 and got[0][2] == 11

    def test_word_boundaries(self):
        idx = build_alias_index(self.ALIASES)
        pat = compile_surface_pattern(list(idx))
        assert detect_and_link("Berliner things", idx, pat) == []


class TestConfigValidation:
    """M23: restated argument validators (sparql_updates.py:218-259)."""

    def test_change_count(self):
        import pytest

        from kgray.config import ConfigError, validate_change_count

        assert validate_change_count("500") == 500
        assert validate_change_count(1) == 1
        for bad in (0, 501, "x", None, -3):
            with pytest.raises(ConfigError):
                validate_change_count(bad)

    def test_entity_id(self):
        import pytest

        from kgray.config import ConfigError, validate_entity_id

        assert validate_entity_id("Q42") == "Q42"
        for bad in ("P31", "Q", "Q12x", "", "42"):
            with pytest.raises(ConfigError):
                validate_entity_id(bad)

    def test_window(self):
        import pytest

        from kgray.config import ConfigError, RunWindow

        w = RunWindow.from_args("2024-01-01 00:00:00", "2024-01-02 00:00:00")
        assert not w.latest and w.start < w.end
        assert RunWindow.from_args(None, "2024-01-02 00:00:00").latest
        with pytest.raises(ConfigError):
            RunWindow.from_args("2024-01-02 00:00:00", "2024-01-01 00:00:00")
        with pytest.raises(ConfigError):
            RunWindow.from_args("01/02/2024", None)


class TestVectorizedSerializer:
    """serialize_batch's pc-kernel fast path must be byte-identical to the
    scalar reference kernels (format_object/triple_to_command) on every
    input — canonical stored-form rows AND invariant violators that take
    the per-row fallback."""

    def _expected(self, rows):
        from kgray.kernels.rdf import format_object, triple_to_command

        return [
            triple_to_command(
                r["op"], r["subj"], r["pred"],
                format_object(r["obj"], r["obj_type"], r["lang"] or None,
                              r["datatype"] or None))
            for r in rows
        ]

    def _run(self, rows):
        import pyarrow as pa

        from kgray.stages.serialize import serialize_batch

        t = pa.Table.from_pylist(rows)
        return serialize_batch(t)["command"].to_pylist()

    def test_fixture_corpus_equivalence(self):
        """Every row of the 120-page fixture raw-ops table (all datavalue
        types, BCE dates, quotes, lang tags, qualifiers/references)."""
        from kgray.fixtures import gen_pages_table, raw_ops_table

        raw = raw_ops_table(gen_pages_table(120))
        rows = raw.select(
            ["op", "subj", "pred", "obj", "obj_type", "lang", "datatype"]
        ).to_pylist()
        assert self._run(rows) == self._expected(rows)

    def test_slow_path_rows(self):
        base = dict(op="INSERT", lang="", datatype="")
        rows = [
            # full-http subject (compacts)
            dict(base, subj="http://www.wikidata.org/entity/Q1",
                 pred="wdt:P31", obj="wd:Q5", obj_type="iri"),
            # full-http predicate
            dict(base, subj="wd:Q1",
                 pred="http://www.wikidata.org/prop/direct/P31",
                 obj="wd:Q5", obj_type="iri"),
            # bracketed KNOWN-namespace iri object (compacts)
            dict(base, subj="wd:Q1", pred="wdt:P31",
                 obj="<http://www.wikidata.org/entity/Q5>", obj_type="iri"),
            # bracketed unknown iri (fast path, stays bracketed)
            dict(base, subj="wd:Q1", pred="wdt:P856",
                 obj="<http://example.org/x>", obj_type="iri"),
            # bare non-prefixed non-http "iri" (scalar kernel quotes it)
            dict(base, subj="wd:Q1", pred="wdt:P856",
                 obj="not-an-iri", obj_type="iri"),
            # unknown full-uri datatype (compacts to xsd:)
            dict(base, subj="wd:Q1", pred="ps:P569",
                 obj="2020-01-01T00:00:00+00:00", obj_type="literal",
                 datatype="http://www.w3.org/2001/XMLSchema#dateTime"),
            # known prefixed datatype (fast path) with tz fix + escape
            dict(base, subj="wd:Q1", pred="ps:P569",
                 obj='say "hi" at 2020-01-01T00:00:00+00:00',
                 obj_type="literal", datatype="xsd:dateTime"),
            # lang wins over datatype
            dict(base, subj="wd:Q1", pred="rdfs:label", obj='quoted "x"',
                 obj_type="literal", lang="pt-BR", datatype="xsd:string"),
            # rdf:type in full-uri form renders as 'a'
            dict(base, subj="wd:Q1",
                 pred="http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                 obj="wd:Q5", obj_type="iri"),
            # blank node object
            dict(base, subj="wd:Q1", pred="prov:wasDerivedFrom", obj="_:b0",
                 obj_type="iri"),
            # DELETE op, plain literal
            dict(op="DELETE", subj="wd:Q1", pred="rdfs:label", obj="plain",
                 obj_type="literal", lang="", datatype=""),
        ]
        assert self._run(rows) == self._expected(rows)

    def test_empty_batch(self):
        import pyarrow as pa

        from kgray.stages.serialize import serialize_batch

        t = pa.Table.from_pydict(
            {c: pa.array([], pa.string())
             for c in ("op", "subj", "pred", "obj", "obj_type", "lang", "datatype")}
        )
        out = serialize_batch(t)
        assert out.num_rows == 0 and out.column_names == ["command"]


class TestCanonicalizeSurvivor:
    """The hash-group survivor kernel must implement the exact lexicographic
    (warc_ts, src_url)-min rule, including separator bytes in content and
    timestamp ties across pages (the small-lexsort tie path)."""

    def _table(self):
        import datetime as dt

        import numpy as np
        import pyarrow as pa

        rng = np.random.default_rng(3)
        keys = rng.integers(0, 400, 3000)
        return pa.table({
            "op": [("INSERT", "DELETE")[k % 2] for k in keys],
            "subj": [f"wd:Q{k}" for k in keys],
            "pred": [f"p:P{k % 11}" for k in keys],
            # separator byte inside content: the length-prefixed key must
            # not alias
            "obj": [f"v\x1fal{k % 5}" for k in keys],
            "lang": ["" for _ in keys],
            "datatype": ["" for _ in keys],
            "obj_type": ["iri" for _ in keys],
            "src_url": [f"https://x/{rng.integers(0, 40)}" for _ in keys],
            # coarse timestamps force (key, min-ts) ties resolved by url
            "warc_ts": [dt.datetime(2024, 1, 1)
                        + dt.timedelta(seconds=int(rng.integers(0, 3)))
                        for _ in keys],
        })

    def test_matches_bruteforce_lexicographic_min(self):
        from kgray.stages.canonicalize import (
            KEY_COLS, _first_per_key, _with_key,
        )

        t = self._table()
        got = _first_per_key(_with_key(t)).drop_columns(
            ["__triple_key"]).to_pylist()
        best = {}
        for r in t.to_pylist():
            k = tuple(r[c] for c in KEY_COLS)
            lin = (r["warc_ts"], r["src_url"])
            if k not in best or lin < (
                    best[k]["warc_ts"], best[k]["src_url"]):
                best[k] = r
        canon = lambda r: tuple(sorted(r.items()))
        assert sorted(map(canon, got)) == sorted(map(canon, best.values()))

    def test_empty_input(self):
        from kgray.stages.canonicalize import _first_per_key, _with_key

        t = self._table().slice(0, 0)
        assert len(_first_per_key(_with_key(t))) == 0


class TestFirstPerKeyHashed:
    """The hash-grouped dedup path (round 5) must produce EXACTLY the row
    set of the injective key-string path — including under forced 64-bit
    hash collisions, which the per-row representative guard must separate
    via the exact fallback."""

    def _table(self):
        return TestCanonicalizeSurvivor._table(self)

    def test_matches_exact_path(self):
        import pyarrow as pa

        from kgray.stages.canonicalize import (
            KEY_COLS, _KEY_HASH, _first_per_key, _first_per_key_hashed,
            _with_key,
        )
        from kgray.stages.shuffle import _hash_key

        t = self._table()
        exact = _first_per_key(_with_key(t)).drop_columns(["__triple_key"])
        th = t.append_column(_KEY_HASH,
                             pa.array(_hash_key(t, list(KEY_COLS))))
        hashed = _first_per_key_hashed(th).drop_columns([_KEY_HASH])
        canon = lambda r: tuple(sorted(r.items()))
        assert (sorted(map(canon, hashed.to_pylist()))
                == sorted(map(canon, exact.to_pylist())))

    def test_forced_collision_separated_exactly(self):
        import datetime as dt

        import numpy as np
        import pyarrow as pa

        from kgray.stages.canonicalize import (
            KEY_COLS, _KEY_HASH, _first_per_key, _first_per_key_hashed,
            _with_key,
        )

        # 6 rows over 3 DISTINCT keys, all crammed into 2 hash values so
        # each hash group holds two different keys
        rows = []
        for i in range(6):
            rows.append(dict(
                op="INSERT", subj=f"wd:Q{i % 3}", pred="p:P1",
                obj=f"val{i % 3}", lang="", datatype="", obj_type="iri",
                src_url=f"https://x/{i}",
                warc_ts=dt.datetime(2024, 1, 1, second=i % 2),
            ))
        t = pa.Table.from_pylist(rows)
        th = t.append_column(
            _KEY_HASH, pa.array(np.array([7, 7, 9, 9, 7, 9], np.uint64)))
        hashed = _first_per_key_hashed(th).drop_columns([_KEY_HASH])
        exact = _first_per_key(_with_key(t)).drop_columns(["__triple_key"])
        canon = lambda r: tuple(sorted(r.items()))
        assert (sorted(map(canon, hashed.to_pylist()))
                == sorted(map(canon, exact.to_pylist())))
        assert len(hashed) == 3  # one survivor per DISTINCT key

    def test_empty(self):
        import pyarrow as pa

        from kgray.stages.canonicalize import (
            _KEY_HASH, _first_per_key_hashed,
        )

        t = self._table().slice(0, 0).append_column(
            _KEY_HASH, pa.array([], pa.uint64()))
        assert len(_first_per_key_hashed(t)) == 0
