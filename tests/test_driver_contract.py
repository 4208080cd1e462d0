"""Driver-contract invariants that need no Spark session."""


# Queries DELIBERATELY without a DuckDB oracle (the driver records its
# weaker rows-only check): each must justify itself in its docstring and
# carry an independent value-level pytest instead. Anything else missing
# an oracle is drift that silently downgrades the correctness gate.
# EMPTY since round 5: q_entity_linking's feature hashing moved to
# md5-keyed integer counts (cosine = one fixed IEEE expression over exact
# integers, SQL-replayable) and q_bpe_merges' 10 merge iterations are
# unrolled as CTEs with the fold replayed via delimiter-string replace.
ROWS_ONLY: set[str] = set()


def test_queries_and_oracles_key_parity():
    """Every queries() entry outside the documented rows-only set has an
    oracle_sql() twin, and every oracle names a real query."""
    import __spark_entry__ as e

    queries, oracles = set(e.queries().keys()), set(e.oracle_sql().keys())
    assert queries - oracles == ROWS_ONLY
    assert oracles <= queries


def test_pseudo_paragraph_contract():
    """The fixture's page-unique filler must stay deterministic, lowercase
    (no gazetteer-surface collision), and free of the token 'the' (the i%29
    near-dup branch rewrites the first 'the'); distinct pages must share
    few 3-grams (that is its entire purpose)."""
    from kgforge.fixtures import _pseudo_paragraph

    a, a2, b = _pseudo_paragraph(7), _pseudo_paragraph(7), _pseudo_paragraph(1007)
    assert a == a2
    assert a != b
    assert a == a.lower()
    assert "the" not in a and "the" not in b
    grams = lambda t: {t[i : i + 3] for i in range(len(t) - 2)}
    inter, union = len(grams(a) & grams(b)), len(grams(a) | grams(b))
    assert inter / union < 0.5
