"""Driver-contract invariants that need no Spark session."""


def test_queries_and_oracles_key_parity():
    """Every queries() entry has an oracle_sql() twin and vice versa — the
    driver records a weaker rows-only check for any query missing its
    oracle, so drift here silently downgrades the correctness gate."""
    import __spark_entry__ as e

    assert set(e.oracle_sql().keys()) == set(e.queries().keys())


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
