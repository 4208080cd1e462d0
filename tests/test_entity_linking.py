"""Entity-link disambiguation (link_mentions / detect_mention_candidates)
value-asserted against an INDEPENDENT pure-Python reimplementation — the
correctness gate for the non-SQL-expressible argmax choice (the candidate
half is driver-oracled as q_entity_candidates).

Reference semantics source: the linking stage generalizes the reference's
per-file entity handling (parser-shacl resolves each surface to exactly one
URI per parse unit) to ambiguous corpus-scale gazetteers; scoring formula
mirrors detect_mentions (mentions.py): prior * (0.5 + 0.5 * cosine).
"""

from __future__ import annotations

import numpy as np
import pytest

from kgforge.fixtures import ambiguous_gazetteer_rows, gazetteer_rows, pages_df
from kgforge.operators.mentions import (
    GazetteerMatcher,
    detect_mention_candidates,
    hash_embedding,
    link_mentions,
)

N_PAGES = 60
CTX = 80


def _pure_python_links(texts_by_url, gaz):
    """Independent reimplementation: plain dict grouping + per-mention loop
    (no matcher internals beyond span detection, no numpy batching)."""
    by_surface: dict[str, list[tuple[str, str, float]]] = {}
    for eid, surf, type_uri, prior in sorted(gaz):
        by_surface.setdefault(surf.lower(), []).append((eid, type_uri, prior))
    matcher = GazetteerMatcher(gaz)  # span detection only
    out = []
    for url, text in texts_by_url:
        for surf, s, e, _eid, _t, _p in matcher.find(text):
            ctx = text[max(0, s - CTX) : e + CTX]
            cv = hash_embedding(ctx)
            scored = []
            for ceid, ctype, cprior in by_surface[surf.lower()]:
                ev = hash_embedding(f"{_canon_surf(gaz, ceid)} {ctype}")
                cos = float(np.clip(np.dot(cv, ev), -1.0, 1.0))
                scored.append((round(cprior * (0.5 + 0.5 * cos), 6), ceid))
            scored.sort(key=lambda t: (-t[0], t[1]))
            best_score, best_eid = scored[0]
            runner = scored[1][0] if len(scored) > 1 else 0.0
            out.append(
                (url, surf, s, e, best_eid, best_score,
                 round(best_score - runner, 6), len(scored))
            )
    return sorted(out)


def _canon_surf(gaz, eid):
    for g_eid, surf, _t, _p in gaz:
        if g_eid == eid:
            return surf
    raise KeyError(eid)


@pytest.fixture(scope="module")
def pages(spark):
    return pages_df(spark, N_PAGES, partitions=4).persist()


def test_link_mentions_matches_pure_python(spark, pages):
    gaz = ambiguous_gazetteer_rows()
    got = sorted(
        tuple(r) for r in link_mentions(pages, gaz, context_window=CTX).collect()
    )
    texts = [(r["url"], r["text"]) for r in pages.select("url", "text").collect()]
    want = _pure_python_links(sorted(texts), gaz)
    assert len(got) == len(want) and len(got) > 0
    assert got == want


def test_ambiguous_surfaces_pick_context_dependent_winner(spark, pages):
    """The disambiguation must not be constant per surface-key: with rival
    candidates at every k%5==0 surface, at least one surface must resolve
    to DIFFERENT entities on different pages (context actually matters),
    and both A- and E- winners must occur overall."""
    gaz = ambiguous_gazetteer_rows()
    rows = link_mentions(pages, gaz).filter("n_candidates = 2").collect()
    assert rows, "fixture must produce ambiguous mentions"
    winners = {r["entity_id"][0] for r in rows}
    assert winners == {"A", "E"}, f"one-sided disambiguation: {winners}"
    by_surface: dict[str, set[str]] = {}
    for r in rows:
        by_surface.setdefault(r["surface"], set()).add(r["entity_id"])
    assert any(len(v) > 1 for v in by_surface.values()), (
        "every surface resolved identically on every page - context signal dead"
    )


def test_margin_and_score_invariants(spark, pages):
    gaz = ambiguous_gazetteer_rows()
    for r in link_mentions(pages, gaz).collect():
        assert 0.0 <= r["score"] <= 1.0 + 1e-9
        assert r["margin"] >= 0.0
        if r["n_candidates"] == 1:
            assert r["margin"] == r["score"]


def test_candidates_unambiguous_gazetteer_degenerates_to_mentions(spark, pages):
    """With the plain gazetteer every span has exactly one candidate and the
    candidate set equals detect_mentions' output projection."""
    from kgforge.operators.mentions import detect_mentions

    gaz = gazetteer_rows()
    cand = detect_mention_candidates(pages, gaz)
    assert cand.filter("n_candidates != 1").count() == 0
    a = sorted(
        tuple(r)
        for r in cand.select("url", "surface", "start", "end", "entity_id").collect()
    )
    b = sorted(
        tuple(r)
        for r in detect_mentions(pages, gaz)
        .select("url", "surface", "start", "end", "entity_id")
        .collect()
    )
    assert a == b


def test_candidate_counts_match_fixture_closed_form(spark, pages):
    """k%5==0 surfaces carry exactly the E+A pair, eid-ordered."""
    gaz = ambiguous_gazetteer_rows()
    rows = detect_mention_candidates(pages, gaz).collect()
    by_span: dict[tuple, list[str]] = {}
    for r in rows:
        by_span.setdefault((r["url"], r["start"]), []).append(r["entity_id"])
    for eids in by_span.values():
        ks = {int(e[1:]) for e in eids}
        assert len(ks) == 1
        k = ks.pop()
        if k % 5 == 0:
            assert eids == [f"A{k:04d}", f"E{k:04d}"]
        else:
            assert eids == [f"E{k:04d}"]
