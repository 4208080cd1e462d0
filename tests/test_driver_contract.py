"""Driver-contract invariants that need no Spark session."""


# Queries DELIBERATELY without a DuckDB oracle (the driver records its
# weaker rows-only check): each must justify itself in its docstring and
# carry an independent value-level pytest instead. Anything else missing
# an oracle is drift that silently downgrades the correctness gate.
ROWS_ONLY = {
    # argmax over crc32 feature-hash embeddings — not ANSI-SQL-expressible;
    # value-asserted against a pure-Python reimpl in test_entity_linking.py
    "q_entity_linking",
    # iterative argmax + re-symbolization (each merge rewrites the symbol
    # sequences the next iteration counts) — a sequential fold SQL cannot
    # express; value-asserted against the published BPE algorithm in
    # test_bpe.py (iteration-0 statistic IS fully oracled as q_bpe_pairs)
    "q_bpe_merges",
}


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
