"""Canonical N-Triples: deterministic blank-node labels per document.

The RDF canonicalization problem (W3C RDF-CANON / URDNA2015's territory):
two serializations of the same graph can differ only in blank-node labels
and triple order, so byte-level diffing, content-addressed storage, and
cross-crawl graph comparison all need a CANONICAL form. This module
derives canonical bnode labels from the value-AWARE 1-WL colors
(``operators.graphsig.wl_colors``): bnodes sort by their final color and
relabel ``_:c0, _:c1, ...`` per document; ties between WL-equivalent
bnodes break on the original label, which is label-dependent ONLY when
the tied nodes are automorphic — and swapping automorphic nodes maps the
line SET to itself, so the canonical text is still label-invariant.
Known limit (disclosed, same as any refinement-only canonicalizer): a
graph whose distinct-but-WL-equivalent bnodes are NOT automorphic (e.g.
two disconnected 3-cycles of bnodes) can canonicalize relabelings to
different texts; URDNA2015 resolves those with recursive exploration.
Embedded web metadata (tree-shaped anonymous nodes) never hits this.

Reference scope: parser-shacl consumes bnode-bearing shape graphs
(src/ShaclParser.php) but never re-emits them; canonical export is part
of the corpus-scale sink surface.

Scale: wl_colors shuffles key on (url, node) — document-confined; the
label rank is a per-document window over that document's BNODES only
(bounded by per-doc graph size, never corpus-wide); relabeling is two
hash joins back onto the triple table; canonical ordering is a
rangepartition sort on (url, line).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..operators.graphsig import _SEP, wl_colors


def canonical_bnode_labels(triples: DataFrame, rounds: int = 4) -> DataFrame:
    """(url, label, canon): canonical label (``c0``, ``c1``, ...) for every
    blank node, ordered by (WL color, original label) within the doc."""
    colors = wl_colors(triples, rounds=rounds, value_blind=False)
    bn = colors.filter(F.col("nid").startswith("bnode" + _SEP)).select(
        "url",
        F.substring_index(F.col("nid"), _SEP, -1).alias("label"),
        "color",
    )
    w = Window.partitionBy("url").orderBy("color", "label")
    return bn.select(
        "url",
        "label",
        F.concat(F.lit("c"), (F.row_number().over(w) - 1).cast("string")).alias(
            "canon"
        ),
    )


def canonical_ntriples(triples: DataFrame, rounds: int = 4) -> DataFrame:
    """(url, line): canonical N-Triples — bnodes relabeled canonically,
    one sorted line per triple. Equal graphs (up to bnode labels and
    triple order) produce byte-identical (url, line) sets; downstream,
    ``sort(url, line)`` + write gives a content-addressable export."""
    from .serialize import ntriples_line_col

    labels = canonical_bnode_labels(triples, rounds=rounds)
    t = triples.filter(
        F.col("subject").isNotNull() & F.col("predicate").isNotNull()
    )

    s_label = F.regexp_replace(F.col("subject"), "^_:", "")
    slab = labels.select(
        F.col("url").alias("s_url"),
        F.col("label").alias("s_label"),
        F.col("canon").alias("s_canon"),
    )
    t = t.join(
        slab,
        (t["url"] == slab["s_url"])
        & F.col("subject").startswith("_:")
        & (s_label == slab["s_label"]),
        "left",
    ).drop("s_url", "s_label")

    o_is_bnode = F.col("object")["kind"] == "bnode"
    o_label = F.regexp_replace(F.col("object")["value"], "^_:", "")
    olab = labels.select(
        F.col("url").alias("o_url"),
        F.col("label").alias("o_label"),
        F.col("canon").alias("o_canon"),
    )
    t = t.join(
        olab,
        (t["url"] == olab["o_url"]) & o_is_bnode & (o_label == olab["o_label"]),
        "left",
    ).drop("o_url", "o_label")

    subject = F.when(
        F.col("s_canon").isNotNull(), F.concat(F.lit("_:"), F.col("s_canon"))
    ).otherwise(F.col("subject"))
    obj = F.when(
        F.col("o_canon").isNotNull(),
        F.struct(
            F.concat(F.lit("_:"), F.col("o_canon")).alias("value"),
            F.lit("bnode").alias("kind"),
            F.lit(None).cast("string").alias("datatype"),
            F.lit(None).cast("string").alias("lang"),
        ),
    ).otherwise(F.col("object"))

    line = ntriples_line_col(subject, F.col("predicate"), obj)
    return t.select("url", line.alias("line")).orderBy("url", "line")
