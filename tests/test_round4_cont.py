"""Round-4 continuation operators: co-citation / bibliographic coupling,
frequent predicate itemsets, class-level schema graph, join-key skew
report — each pinned by hand-computed expectations on tiny graphs."""

import pytest
from pyspark.sql import Row, functions as F


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


class TestCocitation:
    def test_cocitation_counts_and_jaccard(self, spark):
        from kgforge.operators.graph import cocitation

        # citers: s1 -> {a, b, c}; s2 -> {a, b}; s3 -> {b}; s4 -> {c}
        e = _edges(
            spark,
            [
                ("s1", "a"), ("s1", "b"), ("s1", "c"),
                ("s2", "a"), ("s2", "b"),
                ("s3", "b"), ("s4", "c"),
            ],
        )
        out = {(r.a, r.b): r for r in cocitation(e, top_n=10).collect()}
        # in-neighbor sets: a={s1,s2} b={s1,s2,s3} c={s1,s4}
        assert out[("a", "b")].n_common == 2
        assert out[("a", "b")].jaccard == pytest.approx(2 / 3, abs=1e-6)
        assert out[("a", "c")].n_common == 1
        assert out[("a", "c")].jaccard == pytest.approx(1 / 3, abs=1e-6)
        assert out[("b", "c")].n_common == 1
        assert out[("b", "c")].jaccard == pytest.approx(1 / 4, abs=1e-6)
        assert len(out) == 3

    def test_coupling_mode_and_dedup(self, spark):
        from kgforge.operators.graph import cocitation

        # duplicate edges collapse; s1 and s2 both cite {x, y} -> coupling 2
        e = _edges(
            spark,
            [("s1", "x"), ("s1", "x"), ("s1", "y"), ("s2", "x"), ("s2", "y"),
             ("s3", "y"), ("self", "self")],
        )
        out = {(r.a, r.b): r for r in cocitation(e, mode="coupling").collect()}
        assert out[("s1", "s2")].n_common == 2
        assert out[("s1", "s2")].jaccard == pytest.approx(1.0, abs=1e-6)
        assert out[("s1", "s3")].n_common == 1
        # self-loop never appears
        assert all("self" not in k for k in out)

    def test_center_degree_cap_drops_hub_wedges(self, spark):
        from kgforge.operators.graph import cocitation

        # hub cites 4 targets; tiny citer cites 2 of them
        e = _edges(
            spark,
            [("hub", "a"), ("hub", "b"), ("hub", "c"), ("hub", "d"),
             ("t", "a"), ("t", "b")],
        )
        capped = {(r.a, r.b): r.n_common
                  for r in cocitation(e, max_center_degree=3).collect()}
        # only t's wedge survives; jaccard still uses TRUE in-degrees
        assert capped == {("a", "b"): 1}

    def test_bad_mode_raises(self, spark):
        from kgforge.operators.graph import cocitation

        with pytest.raises(ValueError):
            cocitation(_edges(spark, [("a", "b")]), mode="nope")


class TestFrequentPairs:
    def test_support_and_lift(self, spark):
        from kgforge.operators.itemsets import frequent_pairs

        rows = [
            ("d1", "p"), ("d1", "q"), ("d1", "r"),
            ("d2", "p"), ("d2", "q"),
            ("d3", "p"), ("d3", "q"),
            ("d4", "r"),
        ]
        df = spark.createDataFrame(rows, "k string, item string")
        out = {(r.item_a, r.item_b): r
               for r in frequent_pairs(df, "k", "item", min_support=2).collect()}
        # N=4 baskets; supp(p)=3 supp(q)=3 supp(r)=2; pair pq in 3 baskets
        assert out[("p", "q")].n_baskets == 3
        assert out[("p", "q")].support == pytest.approx(0.75, abs=1e-6)
        assert out[("p", "q")].lift == pytest.approx(3 * 4 / 9, abs=1e-6)
        # pr/qr co-occur once only -> below min_support
        assert ("p", "r") not in out and ("q", "r") not in out

    def test_duplicates_collapse_and_mega_basket_guard(self, spark):
        from kgforge.operators.itemsets import frequent_pairs

        rows = [("d1", "a"), ("d1", "a"), ("d1", "b"),
                ("mega", "a"), ("mega", "b"), ("mega", "c"),
                ("d2", "a"), ("d2", "b")]
        df = spark.createDataFrame(rows, "k string, item string")
        out = {(r.item_a, r.item_b): r
               for r in frequent_pairs(df, "k", "item",
                                       min_support=1, max_basket=2).collect()}
        # mega basket (3 items) dropped from the PAIR join but still in N
        assert out[("a", "b")].n_baskets == 2
        assert out[("a", "b")].support == pytest.approx(2 / 3, abs=1e-6)
        assert ("a", "c") not in out


def _triple(url, s, p, v, kind="iri", datatype=None, lang=None):
    return Row(
        url=url, seq=0, subject=s, predicate=p,
        object=Row(value=v, kind=kind, datatype=datatype, lang=lang),
        fmt="turtle", status="ok", error=None,
    )


class TestSchemaGraph:
    def test_rollup_with_types_literals_and_untyped(self, spark):
        from kgforge.operators.profile import RDF_TYPE, schema_graph
        from kgforge.schema import TRIPLES_SCHEMA

        rows = [
            _triple("u", "e1", RDF_TYPE, "Person"),
            _triple("u", "e2", RDF_TYPE, "Person"),
            _triple("u", "c1", RDF_TYPE, "City"),
            _triple("u", "e1", "knows", "e2"),
            _triple("u", "e2", "knows", "e1"),
            _triple("u", "e1", "lives", "c1"),
            _triple("u", "e1", "name", "Ada", kind="literal"),
            _triple("u", "e1", "age", "36", kind="literal",
                    datatype="http://www.w3.org/2001/XMLSchema#integer"),
            _triple("u", "e1", "bio", "hi", kind="literal", lang="en"),
            _triple("u", "ghost", "knows", "e1"),   # untyped subject
            _triple("u", "e1", "sees", "nobody"),   # untyped object
        ]
        df = spark.createDataFrame(rows, TRIPLES_SCHEMA)
        out = {(r.subject_type, r.predicate, r.object_type): r.n
               for r in schema_graph(df).collect()}
        U = "urn:kgforge:untyped"
        XS = "http://www.w3.org/2001/XMLSchema#"
        RDFNS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        assert out[("Person", "knows", "Person")] == 2
        assert out[("Person", "lives", "City")] == 1
        assert out[("Person", "name", f"literal:{XS}string")] == 1
        assert out[("Person", "age", f"literal:{XS}integer")] == 1
        assert out[("Person", "bio", f"literal:{RDFNS}langString")] == 1
        assert out[(U, "knows", "Person")] == 1
        assert out[("Person", "sees", U)] == 1
        # rdf:type triples are input, never edges
        assert not any(p == RDF_TYPE for (_, p, _) in out)

    def test_multi_typed_term_fans_out(self, spark):
        from kgforge.operators.profile import RDF_TYPE, schema_graph
        from kgforge.schema import TRIPLES_SCHEMA

        rows = [
            _triple("u", "e1", RDF_TYPE, "A"),
            _triple("u", "e1", RDF_TYPE, "B"),
            _triple("u", "e1", "p", "e1"),
        ]
        df = spark.createDataFrame(rows, TRIPLES_SCHEMA)
        out = {(r.subject_type, r.predicate, r.object_type): r.n
               for r in schema_graph(df).collect()}
        assert out == {
            ("A", "p", "A"): 1, ("A", "p", "B"): 1,
            ("B", "p", "A"): 1, ("B", "p", "B"): 1,
        }


class TestKeySkew:
    def test_shares_and_salt(self, spark):
        from kgforge.operators.profile import key_skew

        rows = [("hot",)] * 6 + [("warm",)] * 3 + [("cold",)] * 1
        df = spark.createDataFrame(rows, "k string")
        out = {r.key: r for r in key_skew(df, "k", top_n=10).collect()}
        # 10 rows / 3 keys -> mean 10/3
        assert out["hot"].n_rows == 6
        assert out["hot"].share == pytest.approx(0.6, abs=1e-6)
        assert out["hot"].skew_factor == pytest.approx(1.8, abs=1e-6)
        assert out["hot"].suggested_salt == 2
        assert out["cold"].suggested_salt == 1

    def test_top_n_and_ordering(self, spark):
        from kgforge.operators.profile import key_skew

        rows = [(i % 5,) for i in range(50)] + [(99,)] * 12
        df = spark.createDataFrame(rows, "k int")
        got = key_skew(df, "k", top_n=2).collect()
        assert [r.key for r in got] == ["99", "0"]


class TestMentionSalience:
    def test_frequency_and_position(self, spark):
        from kgforge.operators.mentions import mention_salience

        rows = [
            ("u1", "E1", 0), ("u1", "E1", 500), ("u1", "E1", 900),
            ("u1", "E2", 1000),
            ("u2", "E3", 0),
        ]
        df = spark.createDataFrame(rows, "url string, entity_id string, start int")
        out = {(r.url, r.entity_id): r for r in mention_salience(df).collect()}
        e1 = out[("u1", "E1")]
        assert e1.n_mentions == 3 and e1.first_start == 0
        assert e1.share == pytest.approx(0.75, abs=1e-6)
        assert e1.salience == pytest.approx(0.75, abs=1e-6)  # no discount at pos 0
        e2 = out[("u1", "E2")]
        assert e2.share == pytest.approx(0.25, abs=1e-6)
        assert e2.salience == pytest.approx(0.25 / 2.0, abs=1e-6)  # pos 1000 -> /2
        # single-entity page: share 1, no discount
        assert out[("u2", "E3")].salience == pytest.approx(1.0, abs=1e-6)


class TestDegreePowerlaw:
    def test_mle_closed_form(self, spark):
        from math import log

        from kgforge.operators.graph import degree_powerlaw

        # star a-{b,c,d} plus edge b-c: degs a=3, b=2, c=2, d=1
        e = spark.createDataFrame(
            [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "c")],
            "a string, b string",
        )
        row = degree_powerlaw(e, kmin=2).collect()[0]
        assert row.n_nodes == 4 and row.n_tail == 3 and row.max_deg == 3
        assert row.mean_deg == pytest.approx(2.0, abs=1e-6)
        expected = 1.0 + 3.0 / (log(3 / 1.5) + log(2 / 1.5) + log(2 / 1.5))
        assert row.alpha == pytest.approx(expected, abs=1e-6)

    def test_kmin_guard(self, spark):
        from kgforge.operators.graph import degree_powerlaw

        with pytest.raises(ValueError):
            degree_powerlaw(
                spark.createDataFrame([("a", "b")], "a string, b string"), kmin=1
            )


class TestMarkdown:
    def test_conversion_rules(self, spark):
        from kgforge.operators.markdown import md_from_html, pages_to_markdown

        html = (
            "<html><head><title>T1</title></head><body>"
            "<nav><a href='/'>Home</a></nav>"
            "<h2>Head <b>X</b></h2>"
            "<p>Intro <em>em</em> &amp; more.</p>"
            '<ul><li>alpha</li><li><a href="/x/1">link 1</a></li></ul>'
            "<footer>foot</footer></body></html>"
        )
        md = md_from_html(html)
        assert md == (
            "T1\n\n## Head **X**\n\nIntro *em* & more.\n\n- alpha\n- [link 1](/x/1)"
        )
        # bytes input identical; None -> ""
        assert md_from_html(html.encode()) == md
        assert md_from_html(None) == ""
        # distributed wrapper round-trips
        df = spark.createDataFrame(
            [("u1", bytearray(html.encode()))], "url string, html binary"
        )
        row = pages_to_markdown(df).collect()[0]
        assert row.markdown == md

    def test_boilerplate_dropped_and_heading_levels(self, spark):
        from kgforge.operators.markdown import md_from_html

        assert md_from_html("<script>x</script><h6>t</h6>") == "###### t"
        assert md_from_html("<nav><ul><li>m</li></ul></nav><p>body</p>") == "body"


class TestMojibake:
    def test_repair_and_passthrough(self, spark):
        from kgforge.operators.cleaning import fix_mojibake

        clean = "Café — naïve"
        corrupt = clean.encode("utf-8").decode("cp1252")
        df = spark.createDataFrame(
            [("d1", corrupt), ("d2", clean), ("d3", "Â lone marker"), ("d4", None)],
            "doc string, text string",
        )
        out = {r.doc: r for r in fix_mojibake(df).collect()}
        assert out["d1"].text == clean and out["d1"].was_fixed
        assert out["d2"].text == clean and not out["d2"].was_fixed
        # marker present but bytes aren't valid UTF-8 -> untouched
        assert out["d3"].text == "Â lone marker" and not out["d3"].was_fixed
        assert out["d4"].text is None


class TestRepetitionBudget:
    def test_cap_binds_and_shortfall_visible(self, spark):
        from kgforge.operators.sampling import repetition_budget

        d = spark.createDataFrame(
            [("web", 600.0), ("code", 300.0), ("books", 100.0)],
            "domain string, n_tokens double",
        )
        # budget 10x unique total, cap 4 epochs -> shortfall
        out = {r.domain: r for r in
               repetition_budget(d, budget_tokens=10_000, max_epochs=4.0).collect()}
        assert out["web"].epochs == pytest.approx(4.0, abs=1e-6)
        assert out["web"].alloc_tokens == pytest.approx(2400.0, abs=1e-6)
        assert out["web"].share == pytest.approx(0.6, abs=1e-6)
        total_share = sum(r.budget_share for r in out.values())
        assert total_share == pytest.approx(0.4, abs=1e-4)  # 4000/10000

    def test_uncapped_epochs(self, spark):
        from kgforge.operators.sampling import repetition_budget

        d = spark.createDataFrame([("a", 500.0), ("b", 500.0)],
                                  "domain string, n_tokens double")
        out = {r.domain: r for r in
               repetition_budget(d, budget_tokens=2000, max_epochs=4.0).collect()}
        assert out["a"].epochs == pytest.approx(2.0, abs=1e-6)
        assert out["a"].budget_share == pytest.approx(0.5, abs=1e-6)

    def test_budget_guard(self, spark):
        from kgforge.operators.sampling import repetition_budget

        with pytest.raises(ValueError):
            repetition_budget(
                spark.createDataFrame([("a", 1.0)], "domain string, n_tokens double"),
                budget_tokens=0,
            )


class TestScriptShares:
    def test_mixed_scripts(self, spark):
        from kgforge.operators.text_stats import script_shares

        rows = [
            ("d1", "abc привет"),          # 3 latin + 6 cyrillic
            ("d2", "你好 world"),           # 2 cjk + 5 latin
            ("d3", "!!! 123"),             # no letters
            ("d4", "αβγ"),                 # greek only
            ("d5", None),
        ]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        out = {r.doc_id: r for r in script_shares(df, id_col="doc_id").collect()}
        d1 = out["d1"]
        assert d1.n_letters == 9
        assert d1.latin_share == pytest.approx(3 / 9, abs=1e-6)
        assert d1.cyrillic_share == pytest.approx(6 / 9, abs=1e-6)
        assert d1.dominant_script == "cyrillic" and d1.n_scripts == 2
        d2 = out["d2"]
        assert d2.dominant_script == "latin"
        assert d2.cjk_share == pytest.approx(2 / 7, abs=1e-6)
        assert out["d3"].dominant_script == "none" and out["d3"].n_scripts == 0
        assert out["d4"].dominant_script == "greek"
        assert out["d5"].n_letters == 0 and out["d5"].dominant_script == "none"

    def test_tie_resolves_by_declaration_order(self, spark):
        from kgforge.operators.text_stats import script_shares

        df = spark.createDataFrame([("d", "abс")], "doc_id string, text string")
        # 'ab' latin + 'с' cyrillic -> latin 2, cyrillic 1; make a real tie:
        df2 = spark.createDataFrame([("d", "aб")], "doc_id string, text string")
        out = script_shares(df2, id_col="doc_id").collect()[0]
        assert out.latin_share == pytest.approx(0.5, abs=1e-6)
        assert out.dominant_script == "latin"  # declaration order wins ties


class TestHarmonicCentrality:
    def test_landmark_distances_and_harmonic(self, spark):
        from kgforge.operators.graph import harmonic_centrality, landmark_distances

        # chain a->b->c->d plus shortcut a->c; landmarks a and c
        e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")])
        lm = spark.createDataFrame([("a",), ("c",)], "node string")
        d = {(r.landmark, r.node): r.dist
             for r in landmark_distances(e, lm).collect()}
        assert d[("a", "a")] == 0 and d[("a", "b")] == 1
        assert d[("a", "c")] == 1          # shortcut beats the 2-hop chain
        assert d[("a", "d")] == 2
        assert d[("c", "d")] == 1 and ("c", "a") not in d  # directed
        h = {r.node: r for r in harmonic_centrality(e, lm).collect()}
        # d: from a at 2, from c at 1 -> 1/2 + 1 = 1.5, reached by both
        assert h["d"].harmonic == pytest.approx(1.5, abs=1e-6)
        assert h["d"].n_reached == 2
        # c: from a at 1 only (its own 0 excluded)
        assert h["c"].harmonic == pytest.approx(1.0, abs=1e-6)
        assert "a" not in h  # nothing reaches a at dist >= 1

    def test_max_depth_truncates(self, spark):
        from kgforge.operators.graph import landmark_distances

        e = _edges(spark, [("a", "b"), ("b", "c")])
        lm = spark.createDataFrame([("a",)], "node string")
        d = landmark_distances(e, lm, max_depth=1).collect()
        assert {(r.landmark, r.node, r.dist) for r in d} == {
            ("a", "a", 0), ("a", "b", 1)
        }


class TestRdfStar:
    def _parse(self, ttl):
        from kgforge.rdf.turtle import parse_turtle
        return parse_turtle(ttl)[0]

    def test_parser_quoted_subject_and_object(self):
        t = self._parse(
            '@prefix ex: <http://e/> .\n'
            '<< ex:a ex:p ex:b >> ex:conf "0.9" .\n'
            'ex:x ex:says << ex:a ex:p "hi"@en >> .\n'
        )
        assert t[0][0] == ("<< <http://e/a> <http://e/p> <http://e/b> >>",
                           "triple", "", "")
        assert t[1][2] == ('<< <http://e/a> <http://e/p> "hi"@en >>',
                           "triple", "", "")

    def test_parser_nested_and_errors(self):
        import pytest as _pt

        from kgforge.rdf.turtle import TurtleParseError
        t = self._parse(
            "<< << <u:a> <u:p> <u:b> >> <u:q> <u:c> >> <u:r> <u:d> ."
        )
        assert t[0][0][0] == "<< << <u:a> <u:p> <u:b> >> <u:q> <u:c> >>"
        with _pt.raises(TurtleParseError):
            self._parse("<< <u:a> <u:p> <u:b> <u:r> <u:d> .")

    def test_unstar_reification(self, spark):
        import hashlib

        from kgforge.operators.rdfstar import unstar
        from kgforge.schema import TRIPLES_SCHEMA

        qt = '<< <u:a> <u:p> "5"^^<u:int> >>'
        stmt = "urn:star:" + hashlib.md5(qt.encode()).hexdigest()
        rows = [
            _triple("u", qt, "u:conf", "0.9", kind="literal"),
            _triple("u", "u:x", "u:says", qt, kind="triple"),
            _triple("u", "u:plain", "u:p", "u:o"),
        ]
        df = spark.createDataFrame(rows, TRIPLES_SCHEMA)
        out = unstar(df).collect()
        by_pred = {}
        for r in out:
            by_pred.setdefault(r.predicate, []).append(r)
        # in-place lowering
        conf = by_pred["u:conf"][0]
        assert conf.subject == stmt
        says = by_pred["u:says"][0]
        assert says.object.value == stmt and says.object.kind == "iri"
        # plain passthrough
        assert by_pred["u:p"][0].subject == "u:plain"
        # ONE reification quadruple despite two occurrences
        rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        assert len(by_pred[rdf + "type"]) == 1
        robj = by_pred[rdf + "object"][0]
        assert robj.subject == stmt
        assert robj.object.value == "5" and robj.object.datatype == "u:int"
        assert by_pred[rdf + "subject"][0].object.value == "u:a"
        assert len(out) == 3 + 4


class TestJoins:
    def test_salted_join_equals_plain(self, spark):
        from kgforge.operators.joins import salted_join

        left = spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (1, "e")], "k int, v string"
        )
        right = spark.createDataFrame([(1, "X"), (2, "Y")], "k int, w string")
        got = sorted((r.k, r.v, r.w) for r in
                     salted_join(left, right, "k", salt=4).collect())
        want = sorted((r.k, r.v, r.w) for r in left.join(right, "k").collect())
        assert got == want
        # left join keeps unmatched rows exactly once
        lj = sorted((r.k, r.v, r.w) for r in
                    salted_join(left, right, "k", salt=3, how="left").collect())
        wantl = sorted((r.k, r.v, r.w) for r in
                       left.join(right, "k", "left").collect())
        assert lj == wantl

    def test_salted_join_guards(self, spark):
        from kgforge.operators.joins import salted_join

        df = spark.createDataFrame([(1, "a")], "k int, v string")
        with pytest.raises(ValueError):
            salted_join(df, df, "k", how="full")
        with pytest.raises(ValueError):
            salted_join(df, df, "k", salt=0)

    def test_bloom_semijoin_exact(self, spark):
        from kgforge.operators.joins import bloom_semijoin

        probe = spark.createDataFrame(
            [(i, f"v{i}") for i in range(200)], "k bigint, v string"
        )
        build = spark.createDataFrame([(i * 7,) for i in range(10)], "k bigint")
        got = sorted(r.k for r in
                     bloom_semijoin(probe, build, "k", m_bits=1 << 12).collect())
        want = sorted(r.k for r in probe.join(build, "k", "left_semi").collect())
        assert got == want and len(got) > 0


class TestBowtie:
    def test_components(self, spark):
        from kgforge.operators.graph import bowtie_classify

        # i1 -> c1 <-> c2 -> o1 ; d1 -> d2 disconnected from the seed
        e = _edges(spark, [
            ("i1", "c1"), ("c1", "c2"), ("c2", "c1"), ("c2", "o1"),
            ("d1", "d2"),
        ])
        seeds = spark.createDataFrame([("c1",)], "node string")
        out = {r.node: r for r in bowtie_classify(e, seeds).collect()}
        assert out["c1"].component == "core"
        assert out["c1"].dist_fwd == 0 and out["c1"].dist_bwd == 0
        assert out["c2"].component == "core"
        assert out["i1"].component == "in" and out["i1"].dist_bwd == 1
        assert out["i1"].dist_fwd is None
        assert out["o1"].component == "out" and out["o1"].dist_fwd == 2
        assert out["d1"].component == "disconnected"
        assert len(out) == 6


class TestStreamingSessions:
    def test_sessions_close_across_batches(self, spark, tmp_path):
        import os

        import pandas as pd

        from kgforge.streaming.stateful import streaming_sessions

        landing = str(tmp_path / "landing_sessions")
        os.makedirs(landing, exist_ok=True)
        # user 1: events at 0, 100 (batch 1) then 5000 (batch 2) -> session
        # [0,100]x2 closes when 5000 arrives (gap 1800). user 2: one event
        # per batch inside the gap -> never closes.
        b1 = pd.DataFrame({"user_id": [1, 1, 2], "ts_epoch": [0, 100, 50]})
        b2 = pd.DataFrame({"user_id": [1, 2], "ts_epoch": [5000, 900]})
        spark.createDataFrame(b1).coalesce(1).write.parquet(landing + "/f1")
        spark.createDataFrame(b2).coalesce(1).write.parquet(landing + "/f2")
        stream = (
            spark.readStream.schema("user_id long, ts_epoch long")
            .option("maxFilesPerTrigger", 1)
            .parquet(landing + "/f*")
        )
        out = streaming_sessions(stream, gap_seconds=1800)
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("sessions_t")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        rows = spark.sql(
            "SELECT user_id, session_start, session_end, n_events FROM sessions_t"
        ).collect()
        assert [(r.user_id, r.session_start, r.session_end, r.n_events)
                for r in rows] == [(1, 0, 100, 2)]

    def test_unordered_within_batch(self, spark, tmp_path):
        import os

        import pandas as pd

        from kgforge.streaming.stateful import streaming_sessions

        landing = str(tmp_path / "landing_sessions2")
        os.makedirs(landing, exist_ok=True)
        # one batch, out of order: 3000, 0, 100 -> session [0,100] closes
        # when the sorted fold reaches 3000 (gap 1000)
        b1 = pd.DataFrame({"user_id": [7, 7, 7], "ts_epoch": [3000, 0, 100]})
        spark.createDataFrame(b1).coalesce(1).write.parquet(landing + "/f1")
        stream = (
            spark.readStream.schema("user_id long, ts_epoch long")
            .option("maxFilesPerTrigger", 1)
            .parquet(landing + "/f*")
        )
        out = streaming_sessions(stream, gap_seconds=1000)
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("sessions_u")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        rows = spark.sql(
            "SELECT session_start, session_end, n_events FROM sessions_u"
        ).collect()
        assert [(r.session_start, r.session_end, r.n_events) for r in rows] == [
            (0, 100, 2)
        ]


class TestNtriplesStar:
    def test_quoted_line_delegates_to_turtle(self):
        from kgforge.rdf.ntriples import parse_ntriples

        t, _ = parse_ntriples(
            '<u:a> <u:p> <u:b> .\n'
            '<< <u:a> <u:p> <u:b> >> <u:conf> "0.9" .\n'
            '# comment\n'
        )
        assert len(t) == 2
        assert t[1][0] == ("<< <u:a> <u:p> <u:b> >>", "triple", "", "")

    def test_bad_star_line_still_structured_error(self):
        import pytest as _pt

        from kgforge.rdf.ntriples import parse_ntriples
        from kgforge.rdf.turtle import TurtleParseError

        with _pt.raises(TurtleParseError):
            parse_ntriples("<< <u:a> <u:p> .\n")


class TestSerializeStar:
    def test_star_terms_round_trip_through_ntriples(self, spark):
        from kgforge.rdf.ntriples import parse_ntriples
        from kgforge.rdf.serialize import ntriples_invalid_col, ntriples_line_col
        from kgforge.schema import TRIPLES_SCHEMA

        qt = "<< <u:a> <u:p> <u:b> >>"
        rows = [
            _triple("u", qt, "u:conf", "0.9", kind="literal"),
            _triple("u", "u:x", "u:says", qt, kind="triple"),
        ]
        df = spark.createDataFrame(rows, TRIPLES_SCHEMA)
        lines = [
            r.line
            for r in df.select(
                ntriples_line_col(
                    F.col("subject"), F.col("predicate"), F.col("object")
                ).alias("line"),
                ntriples_invalid_col(
                    F.col("subject"), F.col("predicate"), F.col("object")
                ).alias("bad"),
            ).collect()
        ]
        assert lines[0] == f'{qt} <u:conf> "0.9" .'
        assert lines[1] == f"<u:x> <u:says> {qt} ."
        # and the emitted lines re-parse to the same terms
        t, _ = parse_ntriples("\n".join(lines))
        assert t[0][0] == (qt, "triple", "", "")
        assert t[1][2] == (qt, "triple", "", "")
