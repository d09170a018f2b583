"""TTL codec (M12) + distributed TTL-snapshot diff.

Mirrors the reference's diff tests (test_ttl_compare.py:86-126: addition,
deletion, no-change over two TTL revisions of wd:Q42) against the engine's
parse_ttl_stage -> diff_snapshots -> triple_to_command composition, plus
codec-level unit tests for the Turtle subset dump snapshots use.
"""

from __future__ import annotations

import pytest

PREFIXES = """@prefix wd: <http://www.wikidata.org/entity/> .
@prefix wdt: <http://www.wikidata.org/prop/direct/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
"""

OLD_TTL = PREFIXES + """
wd:Q42 wdt:P31 wd:Q5 .
wd:Q42 wdt:P21 wd:Q6581097 .
"""

NEW_TTL = PREFIXES + """
wd:Q42 wdt:P31 wd:Q5 .
wd:Q42 wdt:P21 wd:Q6581097 .
wd:Q42 wdt:P569 "1952-03-11"^^xsd:date .
"""


class TestParse:
    def test_prefixes_continuations_and_types(self):
        from kgray.kernels.ttl import parse_ttl

        ttl = PREFIXES + """
# comment with "quotes" and . dots
wd:Q42 a wd:Q5 ;
    wdt:P1448 "The \\"Answer\\""@pt-BR ;
    wdt:P569 "1952-03-11T00:00:00Z"^^xsd:dateTime, "-0347-01-01T00:00:00Z"^^xsd:dateTime ;
    wdt:P856 <http://example.org/x> .
"""
        got = parse_ttl(ttl)
        assert got == [
            ("wd:Q42", "rdf:type", "wd:Q5", "iri", "", ""),
            ("wd:Q42", "wdt:P1448", 'The "Answer"', "literal", "pt-BR", ""),
            ("wd:Q42", "wdt:P569", "1952-03-11T00:00:00Z", "literal", "", "xsd:dateTime"),
            # BCE year survives the encode/decode sentinel round-trip (M13)
            ("wd:Q42", "wdt:P569", "-0347-01-01T00:00:00Z", "literal", "", "xsd:dateTime"),
            ("wd:Q42", "wdt:P856", "<http://example.org/x>", "iri", "", ""),
        ]

    def test_full_iri_terms_compact_against_known_namespaces(self):
        from kgray.kernels.ttl import parse_ttl

        ttl = ('<http://www.wikidata.org/entity/Q42> '
               '<http://www.wikidata.org/prop/direct/P31> '
               '<http://www.wikidata.org/entity/Q5> .')
        assert parse_ttl(ttl) == [("wd:Q42", "wdt:P31", "wd:Q5", "iri", "", "")]

    def test_unsupported_construct_raises(self):
        from kgray.kernels.ttl import TTLParseError, parse_ttl

        with pytest.raises(TTLParseError):
            parse_ttl("wd:Q1 wdt:P1 [ a wd:Q2 ] .")
        with pytest.raises(TTLParseError):
            parse_ttl("wd:Q1 wdt:P1 wd:Q2")  # missing terminator

    def test_serialize_parse_roundtrip(self):
        from kgray.kernels.ttl import parse_ttl, serialize_ttl

        triples = [
            ("wd:Q42", "rdf:type", "schema:Thing", "iri", "", ""),
            ("wd:Q42", "schema:name", 'line\nbreak "q"', "literal", "en", ""),
            ("wd:Q42", "wdt:P1082", "331000000", "literal", "", "xsd:decimal"),
            ("s:abc", "ps:P569", "-0100-01-01T00:00:00Z", "literal", "", "xsd:dateTime"),
        ]
        assert parse_ttl(serialize_ttl(triples)) == triples


class TestDistributedDiff:
    """Reference parity: diff_ttls addition / deletion / no-change
    (test_ttl_compare.py:106-126), via the streaming stages."""

    def _diff_commands(self, ray, old_ttl: str, new_ttl: str) -> list[str]:
        import ray.data as rd

        from kgray.kernels.rdf import format_object, triple_to_command
        from kgray.stages.diff import diff_snapshots
        from kgray.stages.ttl import parse_ttl_stage

        def snap(ttl: str):
            ds = rd.from_items([{"entity": "Q42", "ttl": ttl}])
            return parse_ttl_stage(ds)

        old_rows = snap(old_ttl).to_pandas()
        new_rows = snap(new_ttl).to_pandas()
        # obj_type lookup for rendering (the diff key drops it)
        ot = {}
        for df in (old_rows, new_rows):
            for r in df.itertuples():
                ot[(r.subj, r.pred, r.obj)] = r.obj_type

        import ray.data as rd2

        old_ds = rd2.from_pandas(old_rows.drop(columns=["obj_type"]))
        new_ds = rd2.from_pandas(new_rows.drop(columns=["obj_type"]))
        out = diff_snapshots(old_ds, new_ds).to_pandas()
        cmds = []
        for r in out.itertuples():
            obj = format_object(r.obj, ot[(r.subj, r.pred, r.obj)],
                                r.lang or None, r.datatype or None)
            cmds.append(triple_to_command(r.op, r.subj, r.pred, obj))
        return cmds

    def test_addition(self, ray_session):
        cmds = self._diff_commands(ray_session, OLD_TTL, NEW_TTL)
        assert cmds == ['INSERT DATA { wd:Q42 wdt:P569 "1952-03-11"^^xsd:date . };']

    def test_deletion(self, ray_session):
        cmds = self._diff_commands(ray_session, NEW_TTL, OLD_TTL)
        assert cmds == ['DELETE DATA { wd:Q42 wdt:P569 "1952-03-11"^^xsd:date . };']

    def test_no_change(self, ray_session):
        assert self._diff_commands(ray_session, OLD_TTL, OLD_TTL) == []


class TestParseStrictness:
    """Malformed input must raise, never silently mis-parse (the module's
    design contract vs the reference's bare-except silent drops)."""

    def test_missing_separator_between_objects(self):
        from kgray.kernels.ttl import TTLParseError, parse_ttl

        with pytest.raises(TTLParseError):
            parse_ttl("wd:Q1 wdt:P1 wd:Q2 wd:Q3 .")

    def test_triple_quoted_literal_rejected(self):
        from kgray.kernels.ttl import TTLParseError, parse_ttl

        with pytest.raises(TTLParseError):
            parse_ttl('wd:Q1 wdt:P1 """long\ntext""" .')

    def test_punct_without_object(self):
        from kgray.kernels.ttl import TTLParseError, parse_ttl

        with pytest.raises(TTLParseError):
            parse_ttl("wd:Q1 wdt:P1 ; wdt:P2 .")
        with pytest.raises(TTLParseError):
            parse_ttl("wd:Q1 wdt:P1 , wd:Q2 .")


class TestPrefixCompaction:
    """Doc-declared prefixes must compact longest-namespace-first, matching
    compact_uri's longest-prefix rule — declaration order must not matter
    (ADVICE r2: 'p:' declared before 'ps:' produced 'p:statement/P31')."""

    def test_longest_prefix_wins_regardless_of_declaration_order(self):
        from kgray.kernels.ttl import parse_ttl

        for decls in (
            "@prefix p: <http://www.wikidata.org/prop/> .\n"
            "@prefix ps: <http://www.wikidata.org/prop/statement/> .\n",
            "@prefix ps: <http://www.wikidata.org/prop/statement/> .\n"
            "@prefix p: <http://www.wikidata.org/prop/> .\n",
        ):
            doc = decls + (
                "<http://www.wikidata.org/entity/Q1> "
                "<http://www.wikidata.org/prop/statement/P31> "
                "<http://www.wikidata.org/prop/P31> .\n"
            )
            triples = parse_ttl(doc)
            assert triples == [("wd:Q1", "ps:P31", "p:P31", "iri", "", "")]

    def test_full_iri_and_pname_spell_identically(self):
        """Real dump TTL mixes full IRIs and pnames for the same predicate;
        both spellings must land on one canonical string or dedup/diff keys
        split."""
        from kgray.kernels.ttl import parse_ttl

        doc = (
            "@prefix p: <http://www.wikidata.org/prop/> .\n"
            "@prefix ps: <http://www.wikidata.org/prop/statement/> .\n"
            "<http://www.wikidata.org/entity/Q1> ps:P31 <http://www.wikidata.org/entity/Q5> .\n"
            "<http://www.wikidata.org/entity/Q1> "
            "<http://www.wikidata.org/prop/statement/P31> "
            "<http://www.wikidata.org/entity/Q5> .\n"
        )
        t = parse_ttl(doc)
        assert t[0] == t[1]
