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
    link_mentions,
)

N_PAGES = 120  # >=120 so both A- and E- winners occur under the md5 hash
CTX = 80


def _spec_counts(text: str, dim: int = 16) -> np.ndarray:
    """Independent restatement of the feature-hash spec: signed integer
    trigram counts, bucket/sign from md5(trigram)[:15 hex] (the repo's
    cross-engine key convention)."""
    import hashlib

    v = np.zeros(dim, dtype=np.int64)
    t = " " + text.lower() + " "
    for i in range(len(t) - 2):
        h = int(hashlib.md5(t[i : i + 3].encode("utf-8")).hexdigest()[:15], 16)
        v[h % dim] += 1 if h % 2 == 0 else -1
    return v


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
            cv = _spec_counts(ctx)
            scored = []
            for ceid, ctype, cprior in by_surface[surf.lower()]:
                ev = _spec_counts(f"{_canon_surf(gaz, ceid)} {ctype}")
                na, nb = float(np.dot(cv, cv)), float(np.dot(ev, ev))
                cos = (
                    float(np.dot(cv, ev)) / (np.sqrt(na) * np.sqrt(nb))
                    if na > 0 and nb > 0
                    else 0.0
                )
                cos = max(-1.0, min(1.0, cos))
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


def test_ambiguous_surfaces_score_context_dependent(spark, pages):
    """The disambiguation must not collapse to a surface-keyed lookup:
    with rival candidates at every k%5==0 surface, both A- and E- winners
    must occur overall, and the same surface must receive DIFFERENT
    scores on different pages (the context term is alive in the formula —
    the argmax itself is value-pinned against the DuckDB oracle and the
    pure-Python reimplementation, so context-driven argmax flips are not
    additionally required of the fixture statistics)."""
    gaz = ambiguous_gazetteer_rows()
    rows = link_mentions(pages, gaz).filter("n_candidates = 2").collect()
    assert rows, "fixture must produce ambiguous mentions"
    winners = {r["entity_id"][0] for r in rows}
    assert winners == {"A", "E"}, f"one-sided disambiguation: {winners}"
    by_surface: dict[str, set[float]] = {}
    pages_per_surface: dict[str, int] = {}
    for r in rows:
        by_surface.setdefault(r["surface"], set()).add(r["score"])
        pages_per_surface[r["surface"]] = pages_per_surface.get(r["surface"], 0) + 1
    repeated = [s for s, n in pages_per_surface.items() if n > 1]
    assert repeated, "fixture must repeat some surface across pages"
    assert any(len(by_surface[s]) > 1 for s in repeated), (
        "every surface scored identically on every page - context signal dead"
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
