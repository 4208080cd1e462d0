"""Property-based cross-checks for the fourth-wave operators: randomized
small inputs vs pure-Python references (the Spark plan and the reference
must agree on EVERY random instance, not just the hand pins)."""

import math

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

_small_graph = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=1,
    max_size=25,
)


def _py_closure(edges):
    clo = set(edges)
    while True:
        new = {(a, d) for a, b in clo for c, d in clo if b == c} - clo
        if not new:
            return clo
        clo |= new


class TestOwlTransitiveProperty:
    @settings(max_examples=25, deadline=None)
    @given(_small_graph)
    def test_matches_python_closure(self, spark, pairs):
        from kgforge.operators.inference import owl_transitive_inference

        P = "urn:p"
        rows = [
            (f"n{a}", P, {"kind": "iri", "value": f"n{b}"})
            for a, b in pairs
        ]
        tri = spark.createDataFrame(
            rows,
            "subject string, predicate string, "
            "object struct<kind: string, value: string>",
        )
        got = {
            (r.subject, r.object)
            for r in owl_transitive_inference(tri, [P]).collect()
        }
        base = {(f"n{a}", f"n{b}") for a, b in pairs}
        assert got == _py_closure(base) - base


class TestResolveChainsProperty:
    @settings(max_examples=25, deadline=None)
    @given(
        st.dictionaries(
            st.integers(0, 11), st.integers(0, 11), min_size=1, max_size=12
        )
    )
    def test_matches_python_walk(self, spark, fmap):
        from kgforge.operators.urlops import resolve_chains

        fmap = {a: b for a, b in fmap.items() if a != b}
        if not fmap:
            return
        m = spark.createDataFrame(
            [(f"n{a}", f"n{b}") for a, b in fmap.items()],
            "src string, dst string",
        )
        out = {r.src: r for r in resolve_chains(m, max_hops=16).collect()}
        for a in fmap:
            cur, hops, seen = a, 0, set()
            while cur in fmap and hops <= 16 and cur not in seen:
                seen.add(cur)
                cur = fmap[cur]
                hops += 1
            r = out[f"n{a}"]
            if cur not in fmap and hops <= 16:
                assert r.resolved and r.final == f"n{cur}" and r.n_hops == hops
            else:
                assert not r.resolved and r.final is None


class TestModularityProperty:
    @settings(max_examples=20, deadline=None)
    @given(
        _small_graph,
        st.lists(st.integers(0, 2), min_size=10, max_size=10),
    )
    def test_matches_python_formula_and_bounds(self, spark, pairs, labels):
        from kgforge.operators.community import modularity

        edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
        if not edges:
            return
        e = spark.createDataFrame(
            [(f"n{a}", f"n{b}") for a, b in edges], "src string, dst string"
        )
        assign = spark.createDataFrame(
            [(f"n{i}", str(labels[i])) for i in range(10)],
            "node string, label string",
        )
        r = modularity(e, assign).collect()[0]
        m = len(edges)
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        ec, dc = {}, {}
        for a, b in edges:
            if labels[a] == labels[b]:
                ec[labels[a]] = ec.get(labels[a], 0) + 1
        for n, d in deg.items():
            dc[labels[n]] = dc.get(labels[n], 0) + d
        q = sum(
            ec.get(c, 0) / m - (dc[c] / (2 * m)) ** 2 for c in dc
        )
        assert r.n_edges == m
        assert r.modularity == pytest.approx(q, abs=1e-6)
        assert -0.5 - 1e-9 <= r.modularity < 1.0


class TestBowCosineProperty:
    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.sampled_from(["apple", "banana", "cherry", "mango"]),
                min_size=1,
                max_size=6,
            ),
            min_size=2,
            max_size=5,
        )
    )
    def test_matches_python_cosine(self, spark, docs):
        from collections import Counter

        from kgforge.operators.similarity import bow_cosine_join

        df = spark.createDataFrame(
            [(i, " ".join(ws)) for i, ws in enumerate(docs)],
            "doc_id bigint, text string",
        )
        got = {
            (r.a, r.b): r.cosine
            for r in bow_cosine_join(df, threshold=0.0, max_df=None).collect()
        }
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                ca, cb = Counter(docs[i]), Counter(docs[j])
                dot = sum(ca[t] * cb[t] for t in ca)
                exp = dot / math.sqrt(
                    sum(v * v for v in ca.values())
                    * sum(v * v for v in cb.values())
                )
                if dot == 0:
                    assert (i, j) not in got
                else:
                    assert got[(i, j)] == pytest.approx(exp, abs=1e-6)
