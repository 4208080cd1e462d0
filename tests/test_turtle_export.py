"""Turtle export: prefix compression, grouped blocks, parse round-trip."""

from kgforge.rdf.serialize import to_turtle_lines, write_turtle
from kgforge.rdf.turtle import parse_turtle

from tests.test_turtle import _RT_ROWS, _rt_df

PREFIXES = {
    "https://a.example/": "ex",
    "http://www.w3.org/2001/XMLSchema#": "xsd",
}


def _norm(rows):
    # parse_turtle terms: subject/predicate are (value, kind) tuples,
    # object is (value, kind, datatype, lang); xsd:string normalizes away
    out = []
    for s, p, (v, k, d, l) in rows:
        d = "" if d == "http://www.w3.org/2001/XMLSchema#string" else d
        out.append((s, p, (v, k, d, l)))
    return sorted(out)


def _parse_back(text):
    parsed, _ = parse_turtle(text)
    return sorted((s[0], p[0], o) for s, p, o in parsed)


def test_turtle_flat_roundtrip(spark):
    lines = [r["line"] for r in to_turtle_lines(_rt_df(spark), PREFIXES).collect()]
    assert lines[0].startswith("@prefix ex:")
    assert _parse_back("\n".join(lines)) == _norm(_RT_ROWS)
    # prefix compression actually happened
    assert any(l.startswith("ex:s ex:p ex:o .") for l in lines)
    # typed literal uses the xsd curie
    assert any('"42"^^xsd:integer' in l for l in lines)
    # rdf:type would render as 'a' — not in fixture; check the curie fallback
    assert all("<https://a.example/s>" not in l for l in lines)


def test_turtle_grouped_roundtrip(spark):
    lines = [
        r["line"]
        for r in to_turtle_lines(_rt_df(spark), PREFIXES, group_subjects=True).collect()
    ]
    text = "\n".join(lines)
    assert _parse_back(text) == _norm(_RT_ROWS)
    # ex:s block carries its 6 predicate-object pairs joined with ';'
    block = next(l for l in lines if l.startswith("ex:s "))
    assert block.count(" ;\n  ") == 5 and block.endswith(" .")


def test_turtle_rdf_type_shortcut(spark):
    rows = [
        (
            "https://a.example/s",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            ("https://a.example/T", "iri", "", ""),
        )
    ]
    df = spark.createDataFrame(rows, _rt_df(spark).schema)
    lines = [
        r["line"]
        for r in to_turtle_lines(df, PREFIXES, include_header=False).collect()
    ]
    assert lines == ["ex:s a ex:T ."]
    assert _parse_back("@prefix ex: <https://a.example/> .\n" + lines[0]) == _norm(rows)


def test_turtle_pn_local_fallback(spark):
    # local part with a '/' is not PN_LOCAL-safe -> full IRI in angles
    rows = [
        (
            "https://a.example/s/x",
            "https://a.example/p",
            ("https://other.example/o", "iri", "", ""),
        )
    ]
    df = spark.createDataFrame(rows, _rt_df(spark).schema)
    lines = [
        r["line"]
        for r in to_turtle_lines(df, PREFIXES, include_header=False).collect()
    ]
    assert lines == ["<https://a.example/s/x> ex:p <https://other.example/o> ."]


def test_write_turtle_sink(spark, tmp_path):
    import glob as _glob

    out = str(tmp_path / "graph.ttl")
    write_turtle(_rt_df(spark), out, PREFIXES, group_subjects=True, partitions=2)
    text = "\n".join(
        open(f).read().rstrip("\n")
        for f in sorted(_glob.glob(f"{out}/part-*"))
        if open(f).read().strip()
    )
    # header may land in any one part; move @prefix lines to the front
    hdr = [l for l in text.splitlines() if l.startswith("@prefix")]
    body = [l for l in text.splitlines() if not l.startswith("@prefix")]
    assert _parse_back("\n".join(hdr + body)) == _norm(_RT_ROWS)
