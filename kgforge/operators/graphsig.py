"""Per-document RDF graph fingerprints via 1-WL color refinement.

Structural duplicate detection the TEXT dedup family cannot express:
mirror pages and template farms emit the SAME RDF graph shape under
renamed IRIs / relabeled blank nodes / reworded literals, so hashing the
serialized triples misses them. The Weisfeiler-Leman (color-refinement)
fingerprint hashes the graph's STRUCTURE instead: every node starts from
a local color, then k rounds of "my color + the sorted multiset of
(direction, predicate, neighbor color) messages" refine it; the document
fingerprint is the hash of the final color multiset. Two isomorphic
graphs always collide (WL is isomorphism-invariant); non-isomorphic
graphs separate unless they are 1-WL-equivalent (rare outside regular
graphs — and never for the tree-ish shapes embedded metadata produces).

Two coloring regimes:

- ``value_blind=True`` — IRI and literal LEXICAL values are hidden from
  the color (only term kind + literal datatype/lang remain; predicate
  labels always stay, they carry the schema). Fingerprints are then
  invariant to site renaming: a mirror of a page under another host and
  different entity names collides with the original. The mirror/template
  detection regime.
- ``value_blind=False`` — IRIs and literals keep their values, ONLY
  blank-node labels are anonymized: a canonical graph hash in the spirit
  of RDF dataset canonicalization (URDNA2015's problem), collapsing
  re-serializations that differ only in bnode labels / triple order.

Node IDENTITY is always value-based (terms equal iff their RDF terms are
equal — literals by (value, datatype, lang), bnodes by label within the
document); only the COLOR may be blind. Identity drives the topology
(shared objects really are shared nodes); color drives what the hash can
see.

Scale design: everything is keyed by (url, node) — graphs are
document-confined, so every shuffle co-partitions by url and no document
ever sees another's rows; rounds are a FIXED unroll (k joins + k aggs,
one action at the end), message lists are per-node sorted arrays (bounded
by node degree, capped by ``max_degree_messages`` against pathological
hub nodes), and hashing is JVM-side md5 — no Python in the plan. For
deep refinements at cluster scale, localCheckpoint every few rounds to
cut lineage (k here is 2-4: embedded-metadata graphs have tiny
diameter).

Reference scope: parser-shacl has no graph-level dedup at all; this
generalizes its per-file parse unit (ShaclParser.php processes one
document's graph at a time) into a corpus-scale structural-equivalence
operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SEP = "\x1f"  # field separator inside a node id / color preimage
_MSEP = "\x1e"  # message separator when folding sorted message lists


def _nodes_and_edges(
    triples: DataFrame, value_blind: bool
) -> tuple[DataFrame, DataFrame]:
    """Triples (url, subject, predicate, object struct) -> node table
    (url, nid, color0) and labeled edge table (url, s, p, o)."""
    t = triples.filter(
        F.col("subject").isNotNull() & F.col("predicate").isNotNull()
    ).select("url", "subject", "predicate", "object")

    subj_label = F.regexp_replace(F.col("subject"), "^_:", "")
    subj_kind = F.when(F.col("subject").startswith("_:"), F.lit("bnode")).otherwise(
        F.lit("iri")
    )
    s_nid = F.concat_ws(_SEP, subj_kind, subj_label)

    o = F.col("object")
    o_kind = o["kind"]
    o_label = F.regexp_replace(o["value"], "^_:", "")
    o_dt = F.coalesce(o["datatype"], F.lit(""))
    o_lang = F.coalesce(o["lang"], F.lit(""))
    o_nid = F.when(
        o_kind == "literal",
        F.concat_ws(_SEP, F.lit("literal"), o["value"], o_dt, o_lang),
    ).otherwise(F.concat_ws(_SEP, o_kind, o_label))

    edges = t.select(
        "url", s_nid.alias("s"), F.col("predicate").alias("p"), o_nid.alias("o")
    )

    if value_blind:
        s_color = subj_kind
        o_color = F.when(
            o_kind == "literal", F.concat_ws(_SEP, F.lit("literal"), o_dt, o_lang)
        ).otherwise(o_kind)
    else:
        s_color = F.when(subj_kind == "bnode", F.lit("bnode")).otherwise(s_nid)
        o_color = F.when(o_kind == "bnode", F.lit("bnode")).otherwise(o_nid)

    nodes = (
        t.select("url", s_nid.alias("nid"), s_color.alias("color"))
        .unionByName(t.select("url", o_nid.alias("nid"), o_color.alias("color")))
        .groupBy("url", "nid")
        # identity determines color, so any row's color works; min() makes
        # the agg map-side-combinable and deterministic
        .agg(F.min("color").alias("color"))
    )
    return nodes, edges


def wl_colors(
    triples: DataFrame,
    rounds: int = 3,
    value_blind: bool = False,
    max_degree_messages: int = 10000,
) -> DataFrame:
    """(url, nid, color) after ``rounds`` of 1-WL refinement. Each round:

        color'(v) = md5(color(v) | sort[(dir, p, color(u)) for edges at v])

    Messages flow BOTH ways (an edge colors its subject with the object's
    color and vice versa, tagged 'o'/'i'), so direction is part of the
    structure. Per-node message lists are sorted (multiset semantics,
    deterministic under any partitioning) and capped at
    ``max_degree_messages`` AFTER sorting — a disclosed, deterministic
    degradation on pathological hubs instead of an unbounded array.
    """
    nodes, edges = _nodes_and_edges(triples, value_blind)
    # EAGER checkpoints, not lazy persists: edges feed TWO joins per round
    # (subject-side and object-side messages) and nothing materializes the
    # cache before the caller's single action — lazily, 32 concurrent
    # tasks would race to run the upstream mapInPandas corpus parse
    # several times inside one job (the q_host_ppr failure mode).
    nodes = nodes.localCheckpoint(eager=True)
    edges = edges.localCheckpoint(eager=True)
    for _ in range(rounds):
        # edges and nodes share lineage (both derive from `triples`), so
        # rename the node side before joining to keep attributes distinct
        nsrc = nodes.select(
            F.col("url").alias("n_url"),
            F.col("nid").alias("n_nid"),
            F.col("color").alias("n_color"),
        )
        to_subject = edges.join(
            nsrc, (edges["url"] == nsrc["n_url"]) & (edges["o"] == nsrc["n_nid"])
        ).select(
            edges["url"],
            edges["s"].alias("nid"),
            F.concat_ws(_SEP, F.lit("o"), edges["p"], nsrc["n_color"]).alias("msg"),
        )
        to_object = edges.join(
            nsrc, (edges["url"] == nsrc["n_url"]) & (edges["s"] == nsrc["n_nid"])
        ).select(
            edges["url"],
            edges["o"].alias("nid"),
            F.concat_ws(_SEP, F.lit("i"), edges["p"], nsrc["n_color"]).alias("msg"),
        )
        msgs = (
            to_subject.unionByName(to_object)
            .groupBy("url", "nid")
            .agg(
                F.slice(
                    F.array_sort(F.collect_list("msg")), 1, max_degree_messages
                ).alias("msgs")
            )
        )
        nodes = (
            nodes.join(msgs, ["url", "nid"], "left")
            .select(
                "url",
                "nid",
                F.md5(
                    F.concat_ws(
                        _MSEP,
                        F.col("color"),
                        F.coalesce(
                            F.array_join("msgs", _MSEP), F.lit("")
                        ),
                    )
                ).alias("color"),
            )
            .persist()
        )
    # per-round node tables stay persisted: the unrolled plan references
    # each round's colors; the single caller action fills the caches.
    return nodes


def wl_fingerprints(
    triples: DataFrame,
    rounds: int = 3,
    value_blind: bool = False,
    max_degree_messages: int = 10000,
) -> DataFrame:
    """(url, fingerprint, n_nodes): the document-level structural hash =
    md5 over the sorted multiset of final node colors. Isomorphic
    document graphs (up to bnode labels; up to ALL values when
    ``value_blind``) get identical fingerprints."""
    colors = wl_colors(triples, rounds, value_blind, max_degree_messages)
    return colors.groupBy("url").agg(
        F.md5(F.array_join(F.array_sort(F.collect_list("color")), _MSEP)).alias(
            "fingerprint"
        ),
        F.count("*").cast("bigint").alias("n_nodes"),
    )


def fingerprint_classes(fps: DataFrame, id_col: str = "url") -> DataFrame:
    """Group documents by structural fingerprint -> one row per
    equivalence class: (class_rep = min id, n_docs). The representation-
    free view of the partition (class labels are hashes, so cross-engine
    comparison uses the induced partition, not the hash spelling)."""
    return fps.groupBy("fingerprint").agg(
        F.min(id_col).alias("class_rep"),
        F.count("*").cast("bigint").alias("n_docs"),
    )
