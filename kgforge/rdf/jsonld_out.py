"""JSON-LD export: one compact node object per (page, subject).

The engine already PARSES four embedded RDF syntaxes; JSON-LD is the one
the modern web republishes with (schema.org tooling, search-engine
ingestion), so the export side matters for interchange: serialize the
triple stream back to JSON-LD node objects that this engine's own parser
(kgforge.rdf.jsonld.parse_jsonld) — and any JSON-LD 1.0 processor —
re-expands to the identical triples. The round trip through our parser is
the correctness gate (q_kg_jsonld re-parses every emitted line and
reproduces the corpus per-predicate counts value-for-value).

Output shape per (url, subject): a single compact JSON line —

    {"@id": s, "@type": [c1, c2], "<pred>": [v1, v2], ...}

- rdf:type IRI objects lift into ``@type`` (JSON-LD idiom);
- IRI / bnode objects become ``{"@id": v}`` (bnodes keep their ``_:``
  labels — re-expansion may relabel them, which preserves graph shape and
  per-predicate counts, the invariant we gate on);
- plain literals are bare strings; language/datatype literals are value
  objects ``{"@value": v, "@language": l}`` / ``{"@value": v, "@type": d}``;
- keys sort (json.dumps sort_keys: ``@id`` < ``@type`` < IRIs), value
  lists sort by (kind, value, datatype, lang) — byte-deterministic output.

Scale shape: ONE (url, subject)-keyed combinable collect_list (bounded by
a subject's per-page fact count) + an Arrow-batched pandas UDF doing pure
json.dumps — serialization is the one place the repo accepts Python in
the row path (like the multimodal decoders): the payload is strings
either way and Arrow moves them in batches, not rows.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .terms import RDF_TYPE

__all__ = ["jsonld_objects", "reparse_jsonld"]


def _node_json(subject: str, pos: list) -> str:
    node: dict = {"@id": subject}
    types = []
    by_pred: dict[str, list] = {}
    for po in pos:
        pred = po["predicate"]
        obj = po["object"]
        kind = obj["kind"]
        value = obj["value"]
        if pred == RDF_TYPE and kind == "iri":
            types.append(value)
            continue
        by_pred.setdefault(pred, []).append(
            (kind, value, obj["datatype"] or "", obj["lang"] or "")
        )
    if types:
        node["@type"] = sorted(types)
    for pred, vals in by_pred.items():
        out = []
        for kind, value, datatype, lang in sorted(vals):
            if kind in ("iri", "bnode"):
                out.append({"@id": value})
            elif lang:
                out.append({"@value": value, "@language": lang})
            elif datatype:
                out.append({"@value": value, "@type": datatype})
            else:
                out.append(value)
        node[pred] = out
    return json.dumps(
        node, sort_keys=True, ensure_ascii=False, separators=(",", ":")
    )


def jsonld_objects(triples: DataFrame) -> DataFrame:
    """Triples -> (url, subject, jsonld) with one compact JSON-LD node
    object per page-subject (see module docstring for the mapping and
    determinism rules)."""

    @pandas_udf("string")
    def build(subject: pd.Series, po: pd.Series) -> pd.Series:
        return pd.Series(
            [_node_json(s, list(p)) for s, p in zip(subject, po)]
        )

    g = (
        triples.filter(F.col("subject").isNotNull())
        .groupBy("url", "subject")
        .agg(F.collect_list(F.struct("predicate", "object")).alias("_po"))
    )
    return g.select(
        "url", "subject", build("subject", "_po").alias("jsonld")
    )


def reparse_jsonld(docs: DataFrame) -> DataFrame:
    """(url, jsonld) -> triples-shaped rows (url, subject, predicate,
    object struct) by running the engine's own JSON-LD expander over each
    line — distributed via Arrow batches, one parse per node object."""

    def gen(batches):
        from .jsonld import parse_jsonld

        for pdf in batches:
            rows = []
            for url, text in zip(pdf["url"], pdf["jsonld"]):
                triples, _ = parse_jsonld(text)
                for s, p, o in triples:
                    rows.append(
                        (
                            url,
                            s[0],
                            p[0],
                            {
                                "value": o[0],
                                "kind": {
                                    "iri": "iri",
                                    "bnode": "bnode",
                                    "literal": "literal",
                                }.get(o[1], o[1]),
                                "datatype": o[2],
                                "lang": o[3],
                            },
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["url", "subject", "predicate", "object"]
            )

    schema = (
        "url string, subject string, predicate string, "
        "object struct<value: string, kind: string, "
        "datatype: string, lang: string>"
    )
    return docs.select("url", "jsonld").mapInPandas(gen, schema=schema)
