"""W3C Direct Mapping (relational -> RDF) — hand-computed golden triples."""

import datetime

import pytest
from pyspark.sql import functions as F

from kgforge.operators.direct_mapping import XSD, direct_map_table

BASE = "http://kg.example.org/dm/"


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [
            (1, "Ada", 36.5, True, datetime.date(1990, 1, 2), 10),
            (2, "Bo b", None, None, None, None),
        ],
        "id int, name string, score double, active boolean, born date, dept int",
    )


def rows(df):
    return {
        (r.subject, r.predicate, r.object, r.object_kind, r.datatype)
        for r in df.collect()
    }


def test_literal_type_and_ref_triples(spark, people):
    out = rows(
        direct_map_table(
            people, "People", ["id"], fks={"dept": ("Dept", "dept_id")}
        )
    )
    s1 = BASE + "People/id=1"
    assert (
        s1,
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        BASE + "People",
        "iri",
        "",
    ) in out
    assert (s1, BASE + "People#id", "1", "literal", XSD + "integer") in out
    assert (s1, BASE + "People#name", "Ada", "literal", "") in out
    assert (s1, BASE + "People#score", "36.5", "literal", XSD + "double") in out
    assert (s1, BASE + "People#active", "true", "literal", XSD + "boolean") in out
    assert (s1, BASE + "People#born", "1990-01-02", "literal", XSD + "date") in out
    assert (s1, BASE + "People#ref-dept", BASE + "Dept/dept_id=10", "iri", "") in out


def test_null_columns_emit_no_triple(spark, people):
    out = direct_map_table(people, "People", ["id"], fks={"dept": ("Dept", "dept_id")})
    r2 = out.filter(F.col("subject").endswith("id=2"))
    preds = {r.predicate for r in r2.collect()}
    # score/active/born/dept are NULL -> only type + id + name survive
    assert preds == {
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        BASE + "People#id",
        BASE + "People#name",
    }
    # triple count per row is exact: row 1 = type + 6 cols + 1 ref = 8
    assert out.count() == 8 + 3


def test_percent_encoding_in_key_values(spark):
    df = spark.createDataFrame([("a b;c=d%e", 1)], "k string, v int")
    out = direct_map_table(df, "T", ["k"])
    subj = out.select("subject").first()[0]
    assert subj == BASE + "T/k=a%20b%3Bc%3Dd%25e"
    # but the literal object keeps the raw value
    raw = out.filter(F.col("predicate") == BASE + "T#k").first()
    assert raw.object == "a b;c=d%e"


def test_composite_primary_key(spark):
    df = spark.createDataFrame([(1, 2, "x")], "a int, b int, c string")
    out = direct_map_table(df, "T", ["a", "b"])
    assert out.select("subject").first()[0] == BASE + "T/a=1;b=2"


def test_timestamp_iso8601(spark):
    df = spark.createDataFrame(
        [(1, datetime.datetime(2026, 1, 2, 3, 4, 5))], "id int, ts timestamp"
    )
    out = direct_map_table(df, "T", ["id"])
    ts = out.filter(F.col("predicate") == BASE + "T#ts").first()
    assert ts.object == "2026-01-02T03:04:05"
    assert ts.datatype == XSD + "dateTime"


def test_plan_is_map_only(spark, people):
    plan = direct_map_table(people, "People", ["id"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


class TestR2rmlMapTable:
    def _df(self, spark):
        return spark.createDataFrame(
            [(1, "Ada", 10), (2, None, None)],
            "id bigint, name string, nat int",
        )

    def test_full_map_shapes(self, spark):
        from kgforge.operators.direct_mapping import r2rml_map_table

        out = r2rml_map_table(
            self._df(spark),
            subject_template="http://x.org/c/{id}",
            subject_class="http://x.org/C",
            predicate_object_maps=[
                {"predicate": "http://x.org/name", "column": "name"},
                {"predicate": "http://x.org/nat",
                 "template": "http://x.org/n/{nat}"},
                {"predicate": "http://x.org/src", "constant": "t",
                 "kind": "literal"},
            ],
        ).collect()
        got = {(r.subject, r.predicate, r.object, r.object_kind) for r in out}
        assert ("http://x.org/c/1", "http://x.org/name", "Ada", "literal") in got
        assert (
            "http://x.org/c/1", "http://x.org/nat", "http://x.org/n/10", "iri"
        ) in got
        # row 2: NULL name and NULL nat emit nothing (R2RML §11)
        assert not any(
            r.subject == "http://x.org/c/2"
            and r.predicate in ("http://x.org/name", "http://x.org/nat")
            for r in out
        )
        # but type + constant still emitted for row 2
        assert ("http://x.org/c/2",
                "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                "http://x.org/C", "iri") in got
        assert len(out) == 4 + 2  # row1: type+name+nat+constant, row2: type+constant

    def test_null_subject_suppresses_row(self, spark):
        from kgforge.operators.direct_mapping import r2rml_map_table

        df = spark.createDataFrame([(None, "x")], "id bigint, name string")
        out = r2rml_map_table(
            df,
            subject_template="http://x.org/c/{id}",
            predicate_object_maps=[
                {"predicate": "http://x.org/name", "column": "name"}
            ],
        ).collect()
        assert out == []

    def test_template_percent_encoding(self, spark):
        from kgforge.operators.direct_mapping import r2rml_map_table

        df = spark.createDataFrame([("a b#c",)], "k string")
        [r] = r2rml_map_table(
            df,
            subject_template="http://x.org/{k}",
            predicate_object_maps=[
                {"predicate": "http://x.org/p", "constant": "v",
                 "kind": "literal"}
            ],
        ).collect()
        assert r.subject == "http://x.org/a%20b%23c"

    def test_datatype_inference_and_override(self, spark):
        from kgforge.operators.direct_mapping import XSD, r2rml_map_table

        df = spark.createDataFrame([(7,)], "n bigint")
        [r] = r2rml_map_table(
            df,
            subject_template="http://x.org/{n}",
            predicate_object_maps=[{"predicate": "http://x.org/n", "column": "n"}],
        ).collect()
        assert r.datatype == XSD + "integer" and r.object == "7"
        [r2] = r2rml_map_table(
            df,
            subject_template="http://x.org/{n}",
            predicate_object_maps=[
                {"predicate": "http://x.org/n", "column": "n",
                 "datatype": XSD + "gYear"}
            ],
        ).collect()
        assert r2.datatype == XSD + "gYear"

    def test_unknown_column_raises(self, spark):
        import pytest as _pytest

        from kgforge.operators.direct_mapping import r2rml_map_table

        with _pytest.raises(ValueError, match="unknown column"):
            r2rml_map_table(
                self._df(spark),
                subject_template="http://x.org/c/{id}",
                predicate_object_maps=[
                    {"predicate": "http://x.org/p", "column": "nope"}
                ],
            )
