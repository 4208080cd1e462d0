"""Regression tests for the round-3 review findings (ADVICE.md r4):

1. serialize.py: grammar validation for N-Triples terms — IRIs with
   forbidden chars / no scheme, bad LANGTAG ('en_US'), and bare
   (un-prefixed) bnode labels in subject position are detectable
   (``ntriples_invalid_col``), droppable, or fail the job; the sink
   (``write_ntriples``) guards the round-trip invariant by default.
2. serialize.py: subject/object bnode handling is symmetric — a subject
   bnode must be spelled ``_:label`` and a bare label is flagged invalid
   rather than silently wrapped as an IRI ``<label>``.
3. dedup.containment_join: no session-lifetime persist leak (grams are
   localCheckpointed, reference-counted) — output unchanged.
4. sampling.domain_mix: all-empty corpus (0 total tokens) yields defined
   shares (0.0) and uniform weights instead of NULLs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
)

TRIPLES_SCHEMA = StructType(
    [
        StructField("subject", StringType()),
        StructField("predicate", StringType()),
        StructField(
            "object",
            StructType(
                [
                    StructField("value", StringType()),
                    StructField("kind", StringType()),
                    StructField("datatype", StringType()),
                    StructField("lang", StringType()),
                ]
            ),
        ),
    ]
)


def _obj(value, kind="literal", datatype=None, lang=None):
    return Row(value=value, kind=kind, datatype=datatype, lang=lang)


GOOD = [
    ("http://ex.org/s", "http://ex.org/p", _obj("hello")),
    ("_:b0", "http://ex.org/p", _obj("http://ex.org/o", kind="iri")),
    ("http://ex.org/s", "http://ex.org/p", _obj("bonjour", lang="fr")),
    ("http://ex.org/s", "http://ex.org/p", _obj("en-US-tag ok", lang="en-US")),
]
BAD = [
    # IRI with a raw space (IRIREF exclusion set)
    ("http://ex.org/has space", "http://ex.org/p", _obj("x")),
    # IRI with '>' — would truncate the term for any loader
    ("http://ex.org/s", "http://ex.org/p>oops", _obj("x")),
    # schemeless subject == the old silent <label> wrapping of a bare bnode
    ("label", "http://ex.org/p", _obj("x")),
    # underscore lang tag (LANGTAG requires hyphen)
    ("http://ex.org/s", "http://ex.org/p", _obj("x", lang="en_US")),
    # object IRI with control char
    ("http://ex.org/s", "http://ex.org/p", _obj("http://ex.org/\x01", kind="iri")),
    # malformed datatype IRI
    ("http://ex.org/s", "http://ex.org/p", _obj("5", datatype="not an iri")),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, TRIPLES_SCHEMA)


def test_invalid_col_flags_each_bad_arm(spark):
    from kgforge.rdf.serialize import ntriples_invalid_col

    flags = [
        r["bad"]
        for r in _df(spark, GOOD + BAD)
        .select(
            ntriples_invalid_col(
                F.col("subject"), F.col("predicate"), F.col("object")
            ).alias("bad")
        )
        .collect()
    ]
    assert flags == [False] * len(GOOD) + [True] * len(BAD)


def test_drop_mode_keeps_only_valid_lines(spark):
    from kgforge.rdf.serialize import to_ntriples_lines

    lines = to_ntriples_lines(_df(spark, GOOD + BAD), on_invalid="drop").collect()
    assert len(lines) == len(GOOD)
    # keep mode is unchanged (precondition asserted by caller): emits all
    assert to_ntriples_lines(_df(spark, GOOD + BAD)).count() == len(GOOD) + len(BAD)


def test_error_mode_and_sink_guard(spark, tmp_path):
    from kgforge.rdf.serialize import to_ntriples_lines, write_ntriples

    # valid-only input passes through error mode byte-identically to keep
    keep = [r["line"] for r in to_ntriples_lines(_df(spark, GOOD)).collect()]
    strict = [
        r["line"]
        for r in to_ntriples_lines(_df(spark, GOOD), on_invalid="error").collect()
    ]
    assert keep == strict
    # a single bad row fails the job (sink default)
    with pytest.raises(Exception, match="invalid N-Triples term"):
        write_ntriples(_df(spark, GOOD + BAD[:1]), str(tmp_path / "nt"))
    with pytest.raises(ValueError):
        to_ntriples_lines(_df(spark, GOOD), on_invalid="bogus")


def test_bare_bnode_subject_not_silently_iri_wrapped(spark):
    """The old _resource wrapped a bare subject label as <label>; now the
    row is flagged invalid and never reaches a loader via the sink."""
    from kgforge.rdf.serialize import to_ntriples_lines

    rows = [("b0", "http://ex.org/p", _obj("x"))]
    assert to_ntriples_lines(_df(spark, rows), on_invalid="drop").count() == 0
    # the _: spelling is valid in subject position (symmetric with objects)
    ok = [("_:b0", "http://ex.org/p", _obj("x"))]
    lines = to_ntriples_lines(_df(spark, ok), on_invalid="drop").collect()
    assert lines[0]["line"] == '_:b0 <http://ex.org/p> "x" .'


def test_containment_join_exact_after_checkpoint_change(spark):
    """containment_join switched persist() -> localCheckpoint(); output must
    stay exact: doc B fully contained in A at word-4-shingle level."""
    from kgforge.operators.dedup import containment_join

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base + " lambda mu nu xi omicron pi rho sigma tau upsilon"),
            (2, base),  # strict prefix of 1 -> containment(2->1) == 1.0
            (3, "completely different words nothing shared here at all ok"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["src"], r["dst"]): r["containment"]
        for r in containment_join(docs, threshold=0.8).collect()
    }
    assert out == {(2, 1): 1.0}


def test_domain_mix_all_empty_corpus_defined(spark):
    from kgforge.operators.sampling import domain_mix

    docs = spark.createDataFrame(
        [("a", ""), ("a", ""), ("b", "")], "source string, text string"
    )
    rows = {r["domain"]: r for r in domain_mix(docs).collect()}
    assert set(rows) == {"a", "b"}
    for r in rows.values():
        assert r["token_share"] == 0.0
        assert r["sample_weight"] == 0.5  # uniform over 2 domains
    # non-degenerate path unchanged: shares sum to ~1
    docs2 = spark.createDataFrame(
        [("a", "one two three"), ("b", "four")], "source string, text string"
    )
    rows2 = {r["domain"]: r for r in domain_mix(docs2).collect()}
    assert rows2["a"]["token_share"] == 0.75
    assert rows2["b"]["token_share"] == 0.25
    assert abs(sum(r["sample_weight"] for r in rows2.values()) - 1.0) < 1e-6
