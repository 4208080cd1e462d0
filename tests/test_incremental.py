"""Incremental merge == full rebuild: accepted set, canonical mapping, and
S/P/O graph identical when the corpus arrives in two batches.

The split point is chosen so near-duplicate/sameAs relationships CROSS the
batch boundary (fixture mirrors pair i with i-1, and alias entities recur
across pages), exercising the part that makes incremental merging hard:
a new edge bridging two previously-separate components."""

from __future__ import annotations

import pytest

from kgforge.fixtures import pages_df
from kgforge.pipeline.incremental import merge_increment
from kgforge.pipeline.run import run_pipeline

N, SPLIT = 120, 80


def _rows(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


@pytest.fixture(scope="module")
def full_vs_incremental(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("inc")
    full = run_pipeline(pages_df(spark, N), str(root / "full"), run_id="full")
    first = pages_df(spark, N).where(
        # deterministic id split: fixture url ends with /page/<i>
        f"CAST(regexp_extract(url, '/page/([0-9]+)$', 1) AS INT) < {SPLIT}"
    )
    second = pages_df(spark, N).where(
        f"CAST(regexp_extract(url, '/page/([0-9]+)$', 1) AS INT) >= {SPLIT}"
    )
    prev = run_pipeline(first, str(root / "prev"), run_id="prev")
    merged = merge_increment(second, str(root / "prev"), str(root / "inc"), run_id="inc")
    return full, prev, merged


TRIPLE_COLS = ["url", "subject", "predicate", "object.value"]


def test_accepted_union_is_exact(spark, full_vs_incremental):
    full, _prev, merged = full_vs_incremental
    assert _rows(merged["accepted"], TRIPLE_COLS) == _rows(full["accepted"], TRIPLE_COLS)


def test_canonical_mapping_identical(spark, full_vs_incremental):
    full, _prev, merged = full_vs_incremental
    assert _rows(merged["mapping"], ["node", "component"]) == _rows(
        full["mapping"], ["node", "component"]
    )


def test_components_bridge_the_batch_boundary(spark, full_vs_incremental):
    """The merge must have JOINED components across batches: nodes first
    seen in batch 2 land in components that already existed in the prev
    run's mapping — i.e. the increment's edges attach to old clusters,
    which a naive per-batch canonicalization could never produce."""
    full, prev, merged = full_vs_incremental
    prev_map = {r["node"]: r["component"] for r in prev["mapping"].collect()}
    merged_map = {r["node"]: r["component"] for r in merged["mapping"].collect()}
    assert set(prev_map) <= set(merged_map)
    new_nodes = set(merged_map) - set(prev_map)
    old_components = set(prev_map.values())
    bridged = [n for n in new_nodes if merged_map[n] in old_components]
    assert bridged, "expected new nodes attached to pre-existing components"


def test_spo_graph_identical(spark, full_vs_incremental):
    full, _prev, merged = full_vs_incremental
    assert _rows(merged["spo"]["s"], ["subject", "predicate"]) == _rows(
        full["spo"]["s"], ["subject", "predicate"]
    )


def test_incremental_entailment_matches_rebuild(spark, tmp_path):
    """merge_increment(infer_rules=...) maintains the entailed layer via
    DRed delta maintenance; the merged entailed set and S/P/O graph must
    equal a full rebuild with the same rules — including derivations whose
    focus entities only exist once canonicalization has merged components
    ACROSS the batch boundary (entity spellings rewrite on merge)."""
    from kgforge.rdf.detect import parse_rdf
    from kgforge.shacl.rules import extract_rules

    ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
    @prefix schema: <http://schema.org/> .
    <urn:shape:p> a sh:NodeShape ; sh:targetClass schema:Person ;
      sh:rule [ a sh:TripleRule ;
                sh:subject sh:this ; sh:predicate rdf:type ; sh:object schema:Agent ] .
    <urn:shape:a> a sh:NodeShape ; sh:targetClass schema:Agent ;
      sh:rule [ a sh:TripleRule ;
                sh:subject sh:this ; sh:predicate schema:audited ; sh:object true ] .
    """
    triples, _, _ = parse_rdf(ttl)
    rules = extract_rules(triples)

    n, split = 40, 26
    full = run_pipeline(
        pages_df(spark, n), str(tmp_path / "full"), run_id="full", infer_rules=rules
    )
    first = pages_df(spark, n).where(
        f"CAST(regexp_extract(url, '/page/([0-9]+)$', 1) AS INT) < {split}"
    )
    second = pages_df(spark, n).where(
        f"CAST(regexp_extract(url, '/page/([0-9]+)$', 1) AS INT) >= {split}"
    )
    run_pipeline(first, str(tmp_path / "prev"), run_id="prev", infer_rules=rules)
    merged = merge_increment(
        second, str(tmp_path / "prev"), str(tmp_path / "inc"), run_id="inc",
        infer_rules=rules,
    )
    ent_cols = ["subject", "predicate", "object.value"]
    assert _rows(merged["entailed"], ent_cols) == _rows(full["entailed"], ent_cols)
    assert merged["entailed"].count() > 0
    assert _rows(merged["spo"]["s"], ["subject", "predicate"]) == _rows(
        full["spo"]["s"], ["subject", "predicate"]
    )


def test_ifp_merge_bridges_batches(spark, tmp_path):
    """A new batch's page sharing an inverse-functional key with an entity
    from the PREVIOUS crawl merges into its component — key-based ER
    evidence recomputes over the merged accepted set."""
    import datetime as dt

    from kgforge.pipeline.incremental import merge_increment
    from kgforge.pipeline.run import run_pipeline

    EM = "http://schema.org/email"

    def page(url, subj):
        ttl = (
            f'<{subj}> <{EM}> "k@x.org" ; '
            f'<http://schema.org/name> "K" .'
        )
        html = (
            '<html><body><script type="text/turtle">'
            f"{ttl}</script><p>t</p></body></html>"
        )
        from kgforge.html import extract_text

        ts = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
        return (url, ts, html.encode(), extract_text(html), "en")

    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    first = spark.createDataFrame(
        [page("https://a.example.org/1", "urn:p:old")], schema
    )
    second = spark.createDataFrame(
        [page("https://b.example.org/2", "urn:p:new")], schema
    )
    run_pipeline(
        first, str(tmp_path / "prev"), run_id="r1", gazetteer=[],
        ifp_props=[EM],
    )
    merged = merge_increment(
        second, str(tmp_path / "prev"), str(tmp_path / "inc"),
        run_id="inc", gazetteer=[], ifp_props=[EM],
    )
    comp = {r.node: r.component for r in merged["mapping"].collect()}
    assert comp["urn:p:old"] == comp["urn:p:new"] == "urn:p:new"
