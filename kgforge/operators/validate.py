"""Stage 05: SHACL-shape-driven validation of emitted triples.

Executes the constraints the parser extracts as *declarative DataFrame
plans* over the corpus triples — the reference only ever stores them as
metadata (sh:pattern regexes are data there, ShaclPropertyAnalyzer.php:34,
250-255); executing them is the engine's validation stage per the north
rule (accepted + reject streams, SURVEY §7.1). Coverage:

- row-local: datatype, nodeKind, pattern(+flags), in, languageIn, string
  lengths, value ranges, plus property-level sh:or/and/xone/not over inline
  member shapes (``validate_triples``)
- focus-node set: min/maxCount, uniqueLang, hasValue (same pass, per-rule
  windows); sh:closed (``closed_shape_violations``); pair constraints
  (``pair_constraint_violations``); qualified cardinality; one-level
  sh:node conformance; node-level sh:and/or/xone/not over referenced
  shapes (``node_logical_violations``)
- non-predicate paths: inverse / sequence / alternative / zeroOrOne /
  zeroOrMore / oneOrMore (``path_constraint_violations``)
Only SPARQL constraints remain extraction-only (documented non-goal).

Scale design:
- the constraint table (exploded property shapes) joins against the triples
  fact table with AQE choosing the strategy at runtime: broadcast when the
  rule side is actually small, shuffle join when per-url shapes scale with
  the corpus (``broadcast_rules=True`` forces the hint for a known-small
  global catalog).
- cardinality checks ride a window over the same stream (one sort), and the
  per-triple collapse is a codegen HashAggregate over an int violation
  bitmask — no ObjectHashAggregate, no array-valued shuffles.
- everything row-local runs in WholeStageCodegen (built-in expressions only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..rdf.terms import RDF_TYPE, SH

XSD = "http://www.w3.org/2001/XMLSchema#"

_NUMERIC_DTS = [XSD + t for t in ("integer", "decimal", "double", "float", "int", "long", "short", "byte")]


def _nodekind_conforms(nk, kind):
    """One shared sh:nodeKind conformance expression covering ALL SIX W3C
    kinds (sh:IRI / sh:BlankNode / sh:Literal and the three unions) — every
    executor uses this so no copy can drop an arm. ``kind`` is the parse
    schema's term kind ('iri' | 'bnode' | 'literal')."""
    return (
        ((nk == SH + "IRI") & (kind == "iri"))
        | ((nk == SH + "BlankNode") & (kind == "bnode"))
        | ((nk == SH + "Literal") & (kind == "literal"))
        | ((nk == SH + "BlankNodeOrIRI") & kind.isin("bnode", "iri"))
        | ((nk == SH + "BlankNodeOrLiteral") & kind.isin("bnode", "literal"))
        | ((nk == SH + "IRIOrLiteral") & kind.isin("iri", "literal"))
    )


def _resource_kind(col):
    """Term kind for a resource-position term (subject / focus node):
    blank-node labels are ``_:``-prefixed in the parse schema
    (rdf/terms.py), everything else is an IRI; NULL stays NULL (no value
    row). Needed so sh:nodeKind sh:BlankNode on inverse-path values and
    closure focus nodes doesn't falsely violate (and sh:IRI falsely pass)
    for blank nodes."""
    return F.when(
        col.isNotNull(),
        F.when(col.startswith("_:"), F.lit("bnode")).otherwise(F.lit("iri")),
    )


def property_constraints(shapes: DataFrame) -> DataFrame:
    """Explode shape records into one row per (target_class, property
    constraint) — the broadcastable rule table."""
    ps = shapes.select(
        "url",
        F.col("uri").alias("shape_uri"),
        F.col("deactivated").alias("shape_deactivated"),
        F.col("severity"),
        F.explode_outer("target_classes").alias("target_class"),
        F.col("property_shapes"),
    ).select(
        "url",
        "shape_uri",
        "shape_deactivated",
        "severity",
        "target_class",
        F.posexplode("property_shapes").alias("ps_idx", "ps"),
    )
    return ps.select(
        "url",
        "shape_uri",
        "shape_deactivated",
        "severity",
        "target_class",
        # stable per-rule discriminator: a shape may carry several property
        # shapes on the SAME sh:path (different minCount/hasValue/...); the
        # focus-node windows must not mix their rows (one rule's values would
        # inflate another's n_vals / has_required)
        F.col("ps_idx"),
        F.col("ps.path_type").alias("path_type"),
        F.col("ps.path").alias("path"),
        F.col("ps.datatype").alias("c_datatype"),
        F.col("ps.class").alias("c_class"),
        F.col("ps.nodeKind").alias("c_nodeKind"),
        F.col("ps.pattern").alias("c_pattern"),
        F.col("ps.flags").alias("c_flags"),
        F.col("ps.in").alias("c_in"),
        F.col("ps.languageIn").alias("c_languageIn"),
        F.col("ps.minLength").cast("int").alias("c_minLength"),
        F.col("ps.maxLength").cast("int").alias("c_maxLength"),
        F.col("ps.minInclusive").cast("double").alias("c_minInclusive"),
        F.col("ps.maxInclusive").cast("double").alias("c_maxInclusive"),
        F.col("ps.minExclusive").cast("double").alias("c_minExclusive"),
        F.col("ps.maxExclusive").cast("double").alias("c_maxExclusive"),
        F.col("ps.minCount").cast("int").alias("c_minCount"),
        F.col("ps.maxCount").cast("int").alias("c_maxCount"),
        F.col("ps.uniqueLang").alias("c_uniqueLang"),
        F.col("ps.hasValue").alias("c_hasValue"),
        F.col("ps.sh_or").alias("c_or"),
        F.col("ps.sh_and").alias("c_and"),
        F.col("ps.sh_xone").alias("c_xone"),
        F.col("ps.sh_not").alias("c_not"),
        F.col("ps.deactivated").alias("ps_deactivated"),
    ).filter(
        # only predicate paths are executable ROW-LOCAL; the other six path
        # types execute as joins in path_constraint_violations
        F.col("path_type") == "predicate"
    ).filter(
        ~F.col("shape_deactivated") & (F.col("ps_deactivated").isNull() | ~F.col("ps_deactivated").isin("true", "1"))
    )


def _typed_subjects(triples: DataFrame) -> DataFrame:
    """(url, subject, class) from rdf:type triples."""
    return (
        triples.filter((F.col("predicate") == RDF_TYPE) & (F.col("object.kind") == "iri"))
        .select("url", "subject", F.col("object.value").alias("cls"))
        .distinct()
    )


def validate_triples(
    triples: DataFrame,
    shapes: DataFrame,
    same_url_scope: bool = True,
    broadcast_rules: bool = False,
) -> DataFrame:
    """-> triples + (violations: array<string>) column; callers split into
    accepted (empty) / rejected (non-empty) streams.

    Constraint applicability: a data triple (s, p, o) is checked against
    property constraints whose target_class matches a type of s and whose
    path == p. Row-local checks happen in one broadcast-join pass; count
    constraints in one aggregate pass.
    """
    rules = property_constraints(shapes)
    data = triples.filter(F.col("status") == "ok").filter(F.col("subject").isNotNull())
    typed = _typed_subjects(data)

    fact = data.alias("t").join(
        typed.alias("ty"),
        (F.col("t.subject") == F.col("ty.subject")) & ((F.col("t.url") == F.col("ty.url")) if same_url_scope else F.lit(True)),
        "left",
    ).select("t.*", F.col("ty.cls").alias("subj_class"))

    rule_cond = (F.col("r.target_class") == F.col("f.subj_class")) & (F.col("r.path") == F.col("f.predicate"))
    if same_url_scope:
        rule_cond = rule_cond & (F.col("r.url") == F.col("f.url"))
    # No forced broadcast by default: with same_url_scope the rule table
    # scales WITH the corpus (per-url shapes), so a static broadcast hint
    # OOMs at 10^12 pages. AQE converts the join to broadcast at runtime
    # whenever the built side is actually small (measured identical wall
    # time at bench scale). Pass broadcast_rules=True only for a known-small
    # global shapes catalog.
    r = F.broadcast(rules.alias("r")) if broadcast_rules else rules.alias("r")
    joined = fact.alias("f").join(r, rule_cond, "left")

    o_val = F.col("f.object.value")
    o_kind = F.col("f.object.kind")
    o_dt = F.coalesce(
        F.when(F.col("f.object.datatype") != "", F.col("f.object.datatype")), F.lit(XSD + "string")
    )
    o_lang = F.col("f.object.lang")
    num_val = F.when(
        (o_kind == "literal") & o_val.rlike(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"), o_val.cast("double")
    )

    def _inline_conforms(m):
        """Does the value node conform to one INLINE member shape (the
        row-local subset of W3C §4.6 logical members: datatype / nodeKind /
        minLength / maxLength / pattern — the fields the reference extracts
        into sh_or/sh_and/sh_xone/sh_not, ShaclPropertyAnalyzer.php:
        extractInlineShape)? Members carrying only non-row-local fields
        (class/node, needing a typing join) conform vacuously — documented
        permissive scope for or/and/xone, mirroring the executable-subset
        rule above. For sh:not, vacuous conformance would INVERT into
        flagging every value, so the 'not' check below additionally
        requires ``_inline_executable``."""
        nk = m["nodeKind"]
        return (
            F.when(
                m["datatype"].isNotNull(), (o_kind == "literal") & (o_dt == m["datatype"])
            ).otherwise(F.lit(True))
            & F.when(
                nk.isNotNull(), _nodekind_conforms(nk, o_kind)
            ).otherwise(F.lit(True))
            & F.when(
                m["minLength"].isNotNull(), F.length(o_val) >= m["minLength"].cast("int")
            ).otherwise(F.lit(True))
            & F.when(
                m["maxLength"].isNotNull(), F.length(o_val) <= m["maxLength"].cast("int")
            ).otherwise(F.lit(True))
            & F.when(
                m["pattern"].isNotNull(), F.regexp_like(o_val, m["pattern"])
            ).otherwise(F.lit(True))
        )

    def _n_conforming(arr_col):
        return F.size(F.filter(arr_col, _inline_conforms))

    def _inline_executable(m):
        """At least one ROW-LOCAL field is set, i.e. _inline_conforms
        actually evaluates something. A member carrying only class/node/
        min-maxCount (join-needing fields) is non-executable here."""
        return (
            m["datatype"].isNotNull()
            | m["nodeKind"].isNotNull()
            | m["minLength"].isNotNull()
            | m["maxLength"].isNotNull()
            | m["pattern"].isNotNull()
        )

    checks = [
        (
            "datatype",
            F.col("r.c_datatype").isNotNull()
            & ((o_kind != "literal") | (o_dt != F.col("r.c_datatype"))),
        ),
        (
            "nodeKind",
            F.col("r.c_nodeKind").isNotNull() & ~_nodekind_conforms(F.col("r.c_nodeKind"), o_kind),
        ),
        ("pattern", F.col("r.c_pattern").isNotNull() & ~F.regexp_like(o_val, F.col("r.c_pattern"))),
        ("in", F.col("r.c_in").isNotNull() & ~F.array_contains(F.col("r.c_in"), o_val)),
        (
            "languageIn",
            F.col("r.c_languageIn").isNotNull() & ~F.array_contains(F.col("r.c_languageIn"), o_lang),
        ),
        ("minLength", F.col("r.c_minLength").isNotNull() & (F.length(o_val) < F.col("r.c_minLength"))),
        ("maxLength", F.col("r.c_maxLength").isNotNull() & (F.length(o_val) > F.col("r.c_maxLength"))),
        (
            "minInclusive",
            F.col("r.c_minInclusive").isNotNull()
            & (num_val.isNull() | (num_val < F.col("r.c_minInclusive"))),
        ),
        (
            "maxInclusive",
            F.col("r.c_maxInclusive").isNotNull()
            & (num_val.isNull() | (num_val > F.col("r.c_maxInclusive"))),
        ),
        (
            "minExclusive",
            F.col("r.c_minExclusive").isNotNull()
            & (num_val.isNull() | (num_val <= F.col("r.c_minExclusive"))),
        ),
        (
            "maxExclusive",
            F.col("r.c_maxExclusive").isNotNull()
            & (num_val.isNull() | (num_val >= F.col("r.c_maxExclusive"))),
        ),
        # logical combinators over inline member shapes (W3C §4.6), executed
        # per value node: or = >=1 member conforms, and = all conform,
        # xone = exactly one conforms, not = the member must NOT conform
        ("or", F.col("r.c_or").isNotNull() & (_n_conforming(F.col("r.c_or")) < 1)),
        (
            "and",
            F.col("r.c_and").isNotNull()
            & (_n_conforming(F.col("r.c_and")) < F.size(F.col("r.c_and"))),
        ),
        ("xone", F.col("r.c_xone").isNotNull() & (_n_conforming(F.col("r.c_xone")) != 1)),
        # sh:not is only executable when the member has >=1 row-local field:
        # a member whose only fields are class/node/min-maxCount conforms
        # vacuously in _inline_conforms, which for 'not' would invert into
        # rejecting EVERY value — skip the check instead (ADVICE r2)
        (
            "not",
            F.col("r.c_not").isNotNull()
            & _inline_executable(F.col("r.c_not"))
            & _inline_conforms(F.col("r.c_not")),
        ),
    ]
    # Violations travel as an int BITMASK, not array<string>: the arrays
    # forced ObjectHashAggregate (collect_list is a TypedImperativeAggregate
    # — row-based, outside whole-stage codegen) and rode two full-width
    # shuffles. A mask keeps the agg a codegen HashAggregate (bit_or) and
    # shuffles 8 bytes instead of an array per row; the string array is
    # reconstructed in one final projection.
    bit_of = {name: 1 << i for i, (name, _c) in enumerate(checks)}
    bit_of["minCount"] = 1 << len(checks)
    bit_of["maxCount"] = 1 << (len(checks) + 1)
    bit_of["uniqueLang"] = 1 << (len(checks) + 2)
    bit_of["hasValue"] = 1 << (len(checks) + 3)
    mask = None
    for name, cond in checks:
        piece = F.when(cond, F.lit(bit_of[name])).otherwise(F.lit(0))
        mask = piece if mask is None else mask + piece
    mask = F.when(F.col("r.shape_uri").isNotNull(), mask).otherwise(F.lit(0))

    per_rule = joined.select(
        "f.*",
        F.col("r.shape_uri").alias("shape_uri"),
        # single 8-byte per-rule discriminator for the focus-node windows:
        # (shape_uri, ps_idx, target_class) pins the exact rule, but carrying
        # two long URI strings in the window sort keys measurably slows the
        # two window sorts — hash them once (collision = two rules of the
        # same focus sharing 64 bits: negligible)
        F.xxhash64(F.col("r.shape_uri"), F.col("r.ps_idx"), F.col("r.target_class")).alias(
            "rule_key"
        ),
        F.col("r.severity").alias("severity"),
        mask.alias("vmask"),
        F.col("r.c_minCount").alias("c_minCount"),
        F.col("r.c_maxCount").alias("c_maxCount"),
        F.col("r.c_uniqueLang").alias("c_uniqueLang"),
        F.col("r.c_hasValue").alias("c_hasValue"),
    )

    # cardinality via a window over the SAME per_rule stream (count of value
    # rows per (url, subject, predicate, shape)) — a linear plan. The earlier
    # formulation aggregated per_rule twice and joined the branches back
    # together; that diamond recomputes the whole parse->join lineage per
    # branch when the input is not materialized, which dominated pipeline
    # wall time.
    from pyspark.sql.window import Window

    # PER-RULE partitioning: rule_key = hash(shape_uri, ps_idx, target_class)
    # pins the exact property-shape rule (two rules on the same sh:path — or
    # one shape matched via two target classes — must each see only their own
    # rows, else n_vals counts k*n and has_required/dup_lang mix across rules).
    # The remaining window keys (url, subject, predicate) are long URI
    # strings; hashing THEM too shrinks the window exchange + sort keys from
    # ~100+ bytes of string comparisons to 16 bytes of int64 — the same
    # measured win as rule_key (round 2: 17.1 s -> 4.3 s on this stage).
    # TWO independently-seeded xxhash64 keys make the effective key 128-bit:
    # a single 64-bit key would see real collisions at 10^12-document group
    # cardinality (~10^13 groups -> millions of expected 64-bit collisions,
    # each silently merging two focus-node windows), while 128 bits puts the
    # expectation at ~1e-13 corpus-wide. Output values are bit-identical
    # (oracle-checked by q_kg_validate).
    wk1 = F.xxhash64("url", "subject", "predicate", "rule_key")
    wk2 = F.xxhash64(F.lit("wk2"), "url", "subject", "predicate", "rule_key")
    w = Window.partitionBy(wk1, wk2)
    # focus-node-set constraints share the one window: value count
    # (min/maxCount), language-tag multiplicity (uniqueLang: some language
    # tag on >1 value), and existence of the required value (hasValue)
    lang_tag = F.when(
        (F.col("object.kind") == "literal") & (F.col("object.lang") != ""), F.col("object.lang")
    )
    # per-language multiplicity via a FINER window sharing the same
    # partitioning prefix (no extra exchange, no object-based collect_set):
    # uniqueLang is violated iff some language tag appears on >1 value
    w_lang = Window.partitionBy(wk1, wk2, lang_tag)
    with_counts = (
        per_rule.withColumn("n_vals", F.count("*").over(w))
        .withColumn("n_same_lang", F.count(lang_tag).over(w_lang))
        .withColumn("dup_lang", F.max(F.when(F.col("n_same_lang") > 1, 1)).over(w))
        .withColumn("has_required", F.max(F.when(F.col("object.value") == F.col("c_hasValue"), 1)).over(w))
        .withColumn(
            "vmask",
            F.col("vmask")
            + F.when(
                F.col("shape_uri").isNotNull()
                & F.col("c_minCount").isNotNull()
                & (F.col("n_vals") < F.col("c_minCount")),
                F.lit(bit_of["minCount"]),
            ).otherwise(F.lit(0))
            + F.when(
                F.col("shape_uri").isNotNull()
                & F.col("c_maxCount").isNotNull()
                & (F.col("n_vals") > F.col("c_maxCount")),
                F.lit(bit_of["maxCount"]),
            ).otherwise(F.lit(0))
            + F.when(
                F.col("shape_uri").isNotNull()
                & F.col("c_uniqueLang").isin("true", "1")
                & (F.col("dup_lang") == 1),
                F.lit(bit_of["uniqueLang"]),
            ).otherwise(F.lit(0))
            + F.when(
                F.col("shape_uri").isNotNull()
                & F.col("c_hasValue").isNotNull()
                & F.col("has_required").isNull(),
                F.lit(bit_of["hasValue"]),
            ).otherwise(F.lit(0)),
        )
    )

    # collapse multiple matching rules / subject classes back to one row per
    # triple — all-declarative aggregates, stays in whole-stage codegen
    # severity of the worst violated rule, by EXPLICIT rank (violation >
    # warning > info) — the strings happen to sort that way only partially
    # (lexicographic max would pick 'warning' OVER 'violation'), so rank
    # explicitly. The max runs over the INT rank and maps back to the label
    # after the aggregate: max over a struct would be semantically identical
    # but structs are not mutable aggregation-buffer types, so it demotes
    # the whole collapse from codegen HashAggregate to ObjectHashAggregate
    # (measured ~1.8x on the pipeline stage — same trap as collect_list).
    sev_rank = (
        F.when(F.col("severity") == "violation", 3)
        .when(F.col("severity") == "warning", 2)
        .when(F.col("severity") == "info", 1)
        .otherwise(0)
    )
    row = with_counts.groupBy("url", "seq", "subject", "predicate").agg(
        F.first("object").alias("object"),
        F.first("fmt").alias("fmt"),
        F.first("status").alias("status"),
        F.first("error").alias("error"),
        F.bit_or("vmask").alias("vmask"),
        F.max(F.when(F.col("vmask") > 0, sev_rank)).alias("_sev_rank"),
    ).withColumn(
        "violation_severity",
        F.when(F.col("_sev_rank") == 3, "violation")
        .when(F.col("_sev_rank") == 2, "warning")
        .when(F.col("_sev_rank") == 1, "info"),
    ).drop("_sev_rank")
    names_in_order = [name for name, _c in checks] + ["minCount", "maxCount", "uniqueLang", "hasValue"]
    violations = F.array_compact(
        F.array(
            *[
                F.when(F.col("vmask").bitwiseAND(F.lit(bit_of[n])) != 0, F.lit(n))
                for n in names_in_order
            ]
        )
    )
    return row.withColumn("violations", violations).drop("vmask")


def closed_shape_violations(
    triples: DataFrame, shapes: DataFrame, same_url_scope: bool = True
) -> DataFrame:
    """Triples violating ``sh:closed`` shapes (W3C §4.8.1): a focus node
    (subject typed as a closed shape's target class) may only use predicates
    that appear as predicate-paths of the shape's property shapes or in
    ``sh:ignoredProperties``. rdf:type itself must be ignored/listed to be
    allowed, per spec.

    Composable with ``validate_triples`` (union the reject streams): kept
    separate because closedness is a *set-membership* check per focus node,
    not a per-(rule, triple) check — one extra equi-join on (url, subject),
    AQE-managed.
    """
    data = triples.filter(F.col("status") == "ok").filter(F.col("subject").isNotNull())
    empty = F.array().cast("array<string>")
    allowed = F.array_union(
        F.coalesce(
            F.transform(
                F.filter(F.col("property_shapes"), lambda p: p["path_type"] == "predicate"),
                lambda p: p["path"],
            ),
            empty,
        ),
        F.coalesce(F.col("constraints.ignoredProperties"), empty),
    )
    closed = (
        shapes.filter(F.coalesce(F.col("constraints.closed"), F.lit(False)) & ~F.col("deactivated"))
        .select(
            F.col("url").alias("shape_url"),
            F.col("uri").alias("shape_uri"),
            F.explode("target_classes").alias("target_class"),
            allowed.alias("allowed"),
        )
    )
    typed = _typed_subjects(data)
    focus_cond = typed.cls == closed.target_class
    if same_url_scope:
        focus_cond = focus_cond & (typed.url == closed.shape_url)
    focus = typed.join(closed, focus_cond).select(
        "url", "subject", "shape_uri", "allowed"
    )
    viol_cond = (F.col("t.subject") == F.col("fo.subject")) & (
        (F.col("t.url") == F.col("fo.url")) if same_url_scope else F.lit(True)
    )
    return (
        data.alias("t")
        .join(focus.alias("fo"), viol_cond)
        .filter(~F.array_contains(F.col("fo.allowed"), F.col("t.predicate")))
        .select(
            "t.*",
            F.col("fo.shape_uri").alias("closed_shape_uri"),
            F.array(F.lit("closed")).alias("violations"),
        )
    )


def pair_constraint_violations(
    triples: DataFrame, shapes: DataFrame, same_url_scope: bool = True
) -> DataFrame:
    """Focus-node pair constraints (W3C §4.6): sh:equals, sh:disjoint,
    sh:lessThan, sh:lessThanOrEquals — the extracted-as-metadata parameters
    (ShaclPropertyAnalyzer.php:27-30) executed as value-set comparisons
    between two predicates of the same focus node.

    One row per (focus node, constraint) violation:
    (url, subject, path, other_path, constraint, shape_uri).

    Plan shape: the rule table is exploded to (target_class, path,
    constraint, other_path); focus values of both predicates join on
    (url, subject) — two AQE-managed equi-joins, aggregation collapses to
    per-focus verdicts (full-outer on value for equals so asymmetric
    differences surface).
    """
    data = triples.filter(F.col("status") == "ok").filter(F.col("subject").isNotNull())
    typed = _typed_subjects(data)

    pair_rules = None
    ps = shapes.select(
        F.col("url").alias("shape_url"),
        F.col("uri").alias("shape_uri"),
        F.col("deactivated").alias("shape_deactivated"),
        F.explode("target_classes").alias("target_class"),
        F.explode("property_shapes").alias("ps"),
    ).filter(~F.col("shape_deactivated") & (F.col("ps.path_type") == "predicate"))
    for cname in ("equals", "disjoint", "lessThan", "lessThanOrEquals"):
        r = ps.filter(F.col(f"ps.{cname}").isNotNull()).select(
            "shape_url",
            "shape_uri",
            "target_class",
            F.col("ps.path").alias("path"),
            F.col(f"ps.{cname}").alias("other_path"),
            F.lit(cname).alias("constraint"),
        )
        pair_rules = r if pair_rules is None else pair_rules.unionByName(r)

    # focus nodes of each rule
    focus_cond = typed.cls == pair_rules.target_class
    if same_url_scope:
        focus_cond = focus_cond & (typed.url == pair_rules.shape_url)
    focus = typed.join(pair_rules, focus_cond).select(
        "url", "subject", "shape_uri", "path", "other_path", "constraint"
    )

    vals = data.select("url", "subject", "predicate", F.col("object.value").alias("val"))
    lhs_cond = (F.col("fo.subject") == F.col("lv.subject")) & (F.col("fo.path") == F.col("lv.predicate"))
    rhs_cond = (F.col("fo.subject") == F.col("rv.subject")) & (F.col("fo.other_path") == F.col("rv.predicate"))
    if same_url_scope:
        lhs_cond = lhs_cond & (F.col("fo.url") == F.col("lv.url"))
        rhs_cond = rhs_cond & (F.col("fo.url") == F.col("rv.url"))

    lhs = focus.alias("fo").join(vals.alias("lv"), lhs_cond, "left").select(
        "fo.*", F.col("lv.val").alias("lval")
    )
    both = lhs.alias("fo").join(vals.alias("rv"), rhs_cond, "left").select(
        "fo.*", F.col("rv.val").alias("rval")
    )

    def num(c):
        return F.when(c.rlike(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"), c.cast("double"))

    agg = both.groupBy("url", "subject", "shape_uri", "path", "other_path", "constraint").agg(
        # equals: value sets must be identical — any lhs value absent from
        # rhs (or vice versa) violates; compare via per-side distinct sets
        F.collect_set("lval").alias("lset"),
        F.collect_set("rval").alias("rset"),
        # lessThan(/OrEquals): EVERY (lhs, rhs) cross pair must satisfy;
        # max lhs vs min rhs decides (numeric when both parse, else string)
        F.max(num(F.col("lval"))).alias("lmax_n"),
        F.min(num(F.col("rval"))).alias("rmin_n"),
        F.max("lval").alias("lmax_s"),
        F.min("rval").alias("rmin_s"),
        F.count("lval").alias("n_l"),
        F.count("rval").alias("n_r"),
    )

    def _violated():
        set_eq = (F.size(F.array_except("lset", "rset")) == 0) & (
            F.size(F.array_except("rset", "lset")) == 0
        )
        overlap = F.size(F.array_intersect("lset", "rset")) > 0
        numeric = F.col("lmax_n").isNotNull() & F.col("rmin_n").isNotNull()
        lt_ok = F.when(numeric, F.col("lmax_n") < F.col("rmin_n")).otherwise(
            F.col("lmax_s") < F.col("rmin_s")
        )
        lte_ok = F.when(numeric, F.col("lmax_n") <= F.col("rmin_n")).otherwise(
            F.col("lmax_s") <= F.col("rmin_s")
        )
        has_pairs = (F.col("n_l") > 0) & (F.col("n_r") > 0)
        return (
            F.when(F.col("constraint") == "equals", ~set_eq)
            .when(F.col("constraint") == "disjoint", overlap)
            .when(F.col("constraint") == "lessThan", has_pairs & ~lt_ok)
            .when(F.col("constraint") == "lessThanOrEquals", has_pairs & ~lte_ok)
        )

    return (
        agg.filter(_violated())
        .select(
            "url",
            "subject",
            "path",
            "other_path",
            "constraint",
            "shape_uri",
            F.array(F.col("constraint")).alias("violations"),
        )
    )


def qualified_cardinality_violations(
    triples: DataFrame, qrules: DataFrame, same_url_scope: bool = True
) -> DataFrame:
    """sh:qualifiedValueShape + qualifiedMin/MaxCount execution (W3C §4.5.3)
    for the row-local-checkable value-shape subset (sh:class / sh:datatype /
    sh:nodeKind — covers the reference fixture pattern).

    Per focus node: count values of ``path`` conforming to the qualified
    shape; violate when the count falls outside [q_min, q_max]. One output
    row per (focus node, rule) violation.

    sh:qualifiedValueShapesDisjoint (W3C §4.5.3; the reference extracts the
    flag at ShaclPropertyAnalyzer.php:33-38): when set, a value only counts
    if it conforms to THIS qualified shape and to NO sibling qualified
    shape (the rule rows carry their executable siblings' row-local fields
    as an array, dereferenced doc-confined at extraction time)."""
    data = triples.filter(F.col("status") == "ok").filter(F.col("subject").isNotNull())
    typed = _typed_subjects(data)

    focus_cond = (typed.cls == qrules.target_class)
    if same_url_scope:
        focus_cond = focus_cond & (typed.url == qrules.url)
    focus = typed.alias("ty").join(qrules.alias("qr"), focus_cond).select(
        F.col("ty.url").alias("url"),
        F.col("ty.subject").alias("subject"),
        "qr.shape_uri", "qr.ps_idx", "qr.path", "qr.q_class", "qr.q_datatype", "qr.q_nodeKind",
        "qr.q_min", "qr.q_max", "qr.siblings",
    )

    vals = data.select(
        "url", "subject", "predicate",
        F.col("object.value").alias("val"),
        F.col("object.kind").alias("val_kind"),
        F.coalesce(
            F.when(F.col("object.datatype") != "", F.col("object.datatype")), F.lit(XSD + "string")
        ).alias("val_dt"),
    )
    v_cond = (F.col("fo.subject") == F.col("v.subject")) & (F.col("fo.path") == F.col("v.predicate"))
    if same_url_scope:
        v_cond = v_cond & (F.col("fo.url") == F.col("v.url"))
    with_vals = focus.alias("fo").join(vals.alias("v"), v_cond, "left")

    # per-value class SET (one small agg over rdf:type triples) — serves
    # both this rule's sh:class conformance and every sibling's
    vt = typed.groupBy("url", "subject").agg(F.collect_set("cls").alias("val_classes"))
    vt = vt.select(
        F.col("url").alias("vt_url"), F.col("subject").alias("vt_subject"), "val_classes"
    )
    t_cond = F.col("v.val") == F.col("vt_subject")
    if same_url_scope:
        t_cond = t_cond & (F.col("fo.url") == F.col("vt_url"))
    with_types = with_vals.join(vt, t_cond, "left")
    classes = F.coalesce(F.col("val_classes"), F.array())

    def _qvs_conforms(q_class, q_datatype, q_nodeKind):
        return (
            (q_class.isNull() | F.array_contains(classes, q_class))
            & (
                q_datatype.isNull()
                | ((F.col("v.val_kind") == "literal") & (F.col("v.val_dt") == q_datatype))
            )
            & (q_nodeKind.isNull() | _nodekind_conforms(q_nodeKind, F.col("v.val_kind")))
        )

    sib_conforms = F.exists(
        F.coalesce(F.col("fo.siblings"), F.array()),
        lambda s: _qvs_conforms(s["q_class"], s["q_datatype"], s["q_nodeKind"]),
    )
    conforms = (
        F.col("v.val").isNotNull()
        & _qvs_conforms(F.col("fo.q_class"), F.col("fo.q_datatype"), F.col("fo.q_nodeKind"))
        & ~sib_conforms  # siblings array is empty unless disjoint is set
    )
    agg = with_types.groupBy(
        "fo.url", "fo.subject", "fo.shape_uri", "fo.ps_idx", "fo.path", "fo.q_min", "fo.q_max"
    ).agg(F.sum(F.when(conforms, 1).otherwise(0)).alias("n_conforming"))
    return (
        agg.filter(
            (F.col("q_min").isNotNull() & (F.col("n_conforming") < F.col("q_min")))
            | (F.col("q_max").isNotNull() & (F.col("n_conforming") > F.col("q_max")))
        )
        .select(
            "url", "subject", "path", "shape_uri", "ps_idx", "n_conforming", "q_min", "q_max",
            F.array(
                F.when(
                    F.col("q_min").isNotNull() & (F.col("n_conforming") < F.col("q_min")),
                    F.lit("qualifiedMinCount"),
                ).otherwise(F.lit("qualifiedMaxCount"))
            ).alias("violations"),
        )
    )


def node_shape_violations(
    triples: DataFrame, shapes: DataFrame, same_url_scope: bool = True
) -> DataFrame:
    """sh:node execution (W3C §4.5.1, one level): values of a property shape
    carrying ``sh:node <S>`` must conform to shape S — S's predicate-path
    property constraints (datatype / nodeKind / min/maxCount subset) are
    applied with the VALUE as focus node.

    One row per (value node, child constraint) violation. The reference
    extracts sh:node as a URI only (URI_CONSTRAINTS,
    ShaclPropertyAnalyzer.php:232-237; fixture node-001.ttl).
    """
    data = triples.filter(F.col("status") == "ok").filter(F.col("subject").isNotNull())
    typed = _typed_subjects(data)

    # (url, parent target_class, parent path, referenced shape)
    refs = (
        shapes.select(
            F.col("url").alias("shape_url"),
            F.explode("target_classes").alias("target_class"),
            F.explode("property_shapes").alias("ps"),
        )
        .filter(F.col("ps.node").isNotNull() & (F.col("ps.path_type") == "predicate"))
        .select("shape_url", "target_class", F.col("ps.path").alias("parent_path"), F.col("ps.node").alias("node_shape"))
    )
    # the referenced shape's own predicate-path constraints
    child = (
        shapes.select(
            F.col("url").alias("c_url"),
            F.col("uri").alias("c_shape_uri"),
            F.explode("property_shapes").alias("cps"),
        )
        .filter(F.col("cps.path_type") == "predicate")
        .select(
            "c_url",
            "c_shape_uri",
            F.col("cps.path").alias("child_path"),
            F.col("cps.datatype").alias("cc_datatype"),
            F.col("cps.nodeKind").alias("cc_nodeKind"),
            F.col("cps.minCount").cast("int").alias("cc_minCount"),
            F.col("cps.maxCount").cast("int").alias("cc_maxCount"),
        )
    )
    ref_cond = (refs.node_shape == child.c_shape_uri)
    if same_url_scope:
        ref_cond = ref_cond & (refs.shape_url == child.c_url)
    rules = refs.join(child, ref_cond).select(
        "shape_url", "target_class", "parent_path", "node_shape",
        "child_path", "cc_datatype", "cc_nodeKind", "cc_minCount", "cc_maxCount",
    )

    # child focus nodes: values of parent_path on subjects typed target_class
    f_cond = (typed.cls == rules.target_class)
    if same_url_scope:
        f_cond = f_cond & (typed.url == rules.shape_url)
    focus_parents = typed.alias("ty").join(rules.alias("ru"), f_cond).select(
        F.col("ty.url").alias("url"), F.col("ty.subject").alias("parent"), "ru.*"
    )
    pv_cond = (F.col("fp.parent") == F.col("pv.subject")) & (F.col("fp.parent_path") == F.col("pv.predicate"))
    if same_url_scope:
        pv_cond = pv_cond & (F.col("fp.url") == F.col("pv.url"))
    child_focus = (
        focus_parents.alias("fp")
        .join(data.alias("pv"), pv_cond)
        .filter(F.col("pv.object.kind").isin("iri", "bnode"))
        .select("fp.*", F.col("pv.object.value").alias("value_node"))
    )

    # child facts: triples of the value node on child_path (left join keeps
    # zero-value nodes for minCount)
    cf_cond = (F.col("cf.value_node") == F.col("cd.subject")) & (F.col("cf.child_path") == F.col("cd.predicate"))
    if same_url_scope:
        cf_cond = cf_cond & (F.col("cf.url") == F.col("cd.url"))
    joined = child_focus.alias("cf").join(data.alias("cd"), cf_cond, "left")

    o_val = F.col("cd.object.value")
    o_kind = F.col("cd.object.kind")
    o_dt = F.coalesce(
        F.when(F.col("cd.object.datatype") != "", F.col("cd.object.datatype")), F.lit(XSD + "string")
    )
    row_viol = F.when(
        o_val.isNotNull()
        & F.col("cf.cc_datatype").isNotNull()
        & ((o_kind != "literal") | (o_dt != F.col("cf.cc_datatype"))),
        F.lit("datatype"),
    ).when(
        o_val.isNotNull()
        & F.col("cf.cc_nodeKind").isNotNull()
        & ~_nodekind_conforms(F.col("cf.cc_nodeKind"), o_kind),
        F.lit("nodeKind"),
    )
    agg = joined.groupBy(
        "cf.url", "cf.value_node", "cf.node_shape", "cf.child_path", "cf.cc_minCount", "cf.cc_maxCount"
    ).agg(
        F.count(o_val).alias("n_vals"),
        F.array_compact(F.array_distinct(F.collect_list(row_viol))).alias("row_violations"),
    )
    card = F.when(
        F.col("cc_minCount").isNotNull() & (F.col("n_vals") < F.col("cc_minCount")), F.lit("minCount")
    ).when(
        F.col("cc_maxCount").isNotNull() & (F.col("n_vals") > F.col("cc_maxCount")), F.lit("maxCount")
    )
    out = agg.withColumn(
        "violations", F.array_compact(F.concat("row_violations", F.array(card)))
    ).filter(F.size("violations") > 0)
    return out.select(
        "url",
        F.col("value_node").alias("subject"),
        F.col("child_path").alias("predicate"),
        F.col("node_shape").alias("node_shape_uri"),
        "violations",
    )


def node_logical_violations(
    triples: DataFrame, shapes: DataFrame, same_url_scope: bool = True
) -> DataFrame:
    """Execute NODE-level logical combinators — sh:and / sh:or / sh:xone /
    sh:not referencing OTHER shapes (W3C §4.6; the reference extracts them
    as URI lists only, constraints.and/or/xone/not).

    A focus node conforms to a referenced member shape iff it satisfies the
    member's row-local predicate-path constraints (datatype / nodeKind /
    min-maxCount — the same executable subset as ``node_shape_violations``);
    a member with no such constraints conforms vacuously. Then per focus:
    and = all members conform, or = at least one, xone = exactly one,
    not = the member must NOT conform.

    Plan shape: combinator rules and member rules are shape METADATA
    (small); the only corpus-sized work is one join from focus nodes to
    their candidate values and three layered aggregates (rule -> member ->
    combinator), all codegen HashAggregates over ints.
    """
    data = triples.filter(F.col("status") == "ok").filter(F.col("subject").isNotNull())
    typed = _typed_subjects(data)

    base = (
        shapes.filter(~F.col("deactivated"))
        .select(
            F.col("url").alias("shape_url"),
            F.col("uri").alias("shape_uri"),
            F.explode("target_classes").alias("target_class"),
            F.col("constraints"),
        )
    )
    combs = None
    for name in ("and", "or", "xone"):
        r = base.filter(F.size(F.col(f"constraints.{name}")) > 0).select(
            "shape_url",
            "shape_uri",
            "target_class",
            F.lit(name).alias("comb"),
            F.col(f"constraints.{name}").alias("members"),
        )
        combs = r if combs is None else combs.unionByName(r)
    combs = combs.unionByName(
        base.filter(F.col("constraints.not").isNotNull()).select(
            "shape_url",
            "shape_uri",
            "target_class",
            F.lit("not").alias("comb"),
            F.array(F.col("constraints.not")).alias("members"),
        )
    )

    member_rules = (
        shapes.select(
            F.col("url").alias("m_url"),
            F.col("uri").alias("m_uri"),
            F.posexplode("property_shapes").alias("m_ps_idx", "mps"),
        )
        .filter(F.col("mps.path_type") == "predicate")
        .select(
            "m_url",
            "m_uri",
            "m_ps_idx",
            F.col("mps.path").alias("m_path"),
            F.col("mps.datatype").alias("m_datatype"),
            F.col("mps.nodeKind").alias("m_nodeKind"),
            F.col("mps.minCount").cast("int").alias("m_minCount"),
            F.col("mps.maxCount").cast("int").alias("m_maxCount"),
        )
    )

    f_cond = typed.cls == combs.target_class
    if same_url_scope:
        f_cond = f_cond & (typed.url == combs.shape_url)
    focus = typed.alias("ty").join(combs.alias("cb"), f_cond).select(
        F.col("ty.url").alias("url"),
        F.col("ty.subject").alias("focus"),
        "cb.shape_uri",
        "cb.comb",
        F.size("cb.members").alias("n_members"),
        F.explode("cb.members").alias("member"),
    )

    mr_cond = F.col("fm.member") == F.col("mr.m_uri")
    if same_url_scope:
        mr_cond = mr_cond & (F.col("fm.url") == F.col("mr.m_url"))
    # left: members with no executable property constraints conform vacuously
    with_rules = focus.alias("fm").join(member_rules.alias("mr"), mr_cond, "left")

    v_cond = (F.col("d.subject") == F.col("fm.focus")) & (
        F.col("d.predicate") == F.col("mr.m_path")
    )
    if same_url_scope:
        v_cond = v_cond & (F.col("d.url") == F.col("fm.url"))
    with_vals = with_rules.join(data.alias("d"), v_cond, "left")

    o_val = F.col("d.object.value")
    o_kind = F.col("d.object.kind")
    o_dt = F.coalesce(
        F.when(F.col("d.object.datatype") != "", F.col("d.object.datatype")), F.lit(XSD + "string")
    )
    row_bad = (
        o_val.isNotNull()
        & (
            (
                F.col("mr.m_datatype").isNotNull()
                & ((o_kind != "literal") | (o_dt != F.col("mr.m_datatype")))
            )
            | (
                F.col("mr.m_nodeKind").isNotNull()
                & ~_nodekind_conforms(F.col("mr.m_nodeKind"), o_kind)
            )
        )
    )
    # a member rule is EXECUTABLE when it carries at least one enforced
    # field; a member with no executable rules conforms vacuously, which is
    # fine for and/or/xone (documented permissive scope) but would invert
    # for sh:not — 'not' over such a member must be SKIPPED, not fired on
    # every focus node (ADVICE r2)
    rule_exec = (
        F.col("mr.m_datatype").isNotNull()
        | F.col("mr.m_nodeKind").isNotNull()
        | F.col("mr.m_minCount").isNotNull()
        | F.col("mr.m_maxCount").isNotNull()
    )
    # layer 1: per (focus, combinator, member, member-rule) -> rule_ok
    per_rule = with_vals.groupBy(
        "fm.url", "fm.focus", "fm.shape_uri", "fm.comb", "fm.n_members", "fm.member",
        "mr.m_ps_idx", "mr.m_minCount", "mr.m_maxCount",
    ).agg(
        F.count(o_val).alias("n_vals"),
        F.max(F.when(row_bad, 1).otherwise(0)).alias("any_row_bad"),
        F.max(F.when(rule_exec, 1).otherwise(0)).alias("rule_exec"),
    ).withColumn(
        "rule_ok",
        F.when(
            (F.col("any_row_bad") == 1)
            | (F.col("m_minCount").isNotNull() & (F.col("n_vals") < F.col("m_minCount")))
            | (F.col("m_maxCount").isNotNull() & (F.col("n_vals") > F.col("m_maxCount"))),
            0,
        ).otherwise(1),
    )
    # layer 2: member conforms iff every rule ok (vacuous when no rules);
    # member_exec tracks whether ANY of its rules is executable
    per_member = per_rule.groupBy(
        "url", "focus", "shape_uri", "comb", "n_members", "member"
    ).agg(
        F.min("rule_ok").alias("member_ok"),
        F.max("rule_exec").alias("member_exec"),
    )
    # layer 3: combinator verdict
    agg = per_member.groupBy("url", "focus", "shape_uri", "comb", "n_members").agg(
        F.sum("member_ok").alias("n_conf"),
        F.min("member_exec").alias("min_exec"),
    )
    violated = (
        F.when(F.col("comb") == "and", F.col("n_conf") < F.col("n_members"))
        .when(F.col("comb") == "or", F.col("n_conf") < 1)
        .when(F.col("comb") == "xone", F.col("n_conf") != 1)
        # 'not' has exactly one member: only fire when that member has
        # executable rules — otherwise its vacuous conformance would reject
        # every focus node (ADVICE r2)
        .when(F.col("comb") == "not", (F.col("n_conf") > 0) & (F.col("min_exec") == 1))
    )
    return agg.filter(violated).select(
        "url",
        F.col("focus").alias("subject"),
        "shape_uri",
        F.col("comb").alias("constraint"),
        F.array(F.col("comb")).alias("violations"),
    )


def path_constraint_violations(
    triples: DataFrame,
    shapes: DataFrame,
    same_url_scope: bool = True,
    max_closure_hops: int = 10,
) -> DataFrame:
    """Execute property shapes with NON-predicate paths — sh:inversePath,
    sequence, sh:alternativePath, and sh:zeroOrOnePath (W3C §2.3.1) —
    extending the executable subset beyond ``path_type == 'predicate'``
    (the reference extracts all seven path types as structured metadata
    only, ShaclPropertyAnalyzer.php:326-437; fixtures path-*-001.ttl).

    Value-node semantics:
    - inverse ^p : values(f) = { s | (s, p, f) }   — one reversed equi-join
    - sequence (p1..pL) : values(f) = { o | f -p1-> x1 ... -pL-> o } — L
      chained equi-joins, built per distinct L (the rule table is shape
      METADATA — tiny and bounded — so collecting the length set is O(1);
      each chain is a static plan, unioned)
    - alternative (p1|..|pk) : union of the members' one-hop value sets,
      counted per RULE (explode members, left join, shared aggregate)
    - zeroOrOne p? : { f } ∪ { o | (f, p, o) } — the focus node itself is
      always a value (so minCount 1 is vacuous, per spec)
    - zeroOrMore p* / oneOrMore p+ : transitive closure via a bounded
      iterative frontier loop (the same driver-loop pattern as
      connected_components and the reference's own ≤10/≤100 iteration
      caps): each round one equi-join extends the frontier, an anti-join
      against the reached set guarantees termination on cycles,
      ``localCheckpoint`` cuts lineage per round (``max_closure_hops``
      bounds depth). Traversal continues through resources; literal
      objects are values but not traversable, per spec.

    Executed constraints on the value nodes: sh:datatype, sh:nodeKind,
    sh:class (one typing join), sh:minCount / sh:maxCount (per focus node,
    counting zero-value focus nodes via the left side of the final join).
    Returns one row per (focus, rule) violation with a ``violations`` array,
    composable with validate_triples like the other focus-level executors.
    """
    data = triples.filter(F.col("status") == "ok").filter(F.col("subject").isNotNull())
    typed = _typed_subjects(data)

    base_rules = (
        shapes.select(
            F.col("url").alias("shape_url"),
            F.col("uri").alias("shape_uri"),
            F.col("deactivated").alias("shape_deactivated"),
            F.explode("target_classes").alias("target_class"),
            F.posexplode("property_shapes").alias("ps_idx", "ps"),
        )
        .filter(~F.col("shape_deactivated"))
        .filter(
            F.col("ps.path_type").isin(
                "inverse", "sequence", "alternative", "zeroOrOne", "zeroOrMore", "oneOrMore"
            )
        )
        .select(
            "shape_url",
            "shape_uri",
            "ps_idx",
            "target_class",
            F.col("ps.path_type").alias("path_type"),
            F.col("ps.path").alias("path"),
            F.col("ps.paths").alias("paths"),
            F.col("ps.datatype").alias("c_datatype"),
            F.col("ps.class").alias("c_class"),
            F.col("ps.nodeKind").alias("c_nodeKind"),
            F.col("ps.minCount").cast("int").alias("c_minCount"),
            F.col("ps.maxCount").cast("int").alias("c_maxCount"),
        )
    )

    def focus_of(rules):
        cond = typed.cls == rules.target_class
        if same_url_scope:
            cond = cond & (typed.url == rules.shape_url)
        return typed.alias("ty").join(rules.alias("ru"), cond).select(
            F.col("ty.url").alias("url"), F.col("ty.subject").alias("focus"), "ru.*"
        )

    def value_checks(vals):
        """vals: focus rows left-joined with their value nodes (value struct
        columns v_value/v_kind/v_dt nullable for zero-value focus nodes)."""
        vt = typed.select(
            F.col("url").alias("vt_url"),
            F.col("subject").alias("vt_subject"),
            F.col("cls").alias("vt_cls"),
        )
        t_cond = (F.col("v_value") == F.col("vt_subject")) & (
            F.col("c_class") == F.col("vt_cls")
        )
        if same_url_scope:
            t_cond = t_cond & (F.col("url") == F.col("vt_url"))
        with_types = vals.join(vt, t_cond, "left")
        row_viol = F.when(
            F.col("v_value").isNotNull()
            & F.col("c_datatype").isNotNull()
            & ((F.col("v_kind") != "literal") | (F.col("v_dt") != F.col("c_datatype"))),
            F.lit("datatype"),
        ).when(
            F.col("v_value").isNotNull()
            & F.col("c_nodeKind").isNotNull()
            & ~_nodekind_conforms(F.col("c_nodeKind"), F.col("v_kind")),
            F.lit("nodeKind"),
        ).when(
            F.col("v_value").isNotNull()
            & F.col("c_class").isNotNull()
            & F.col("vt_cls").isNull(),
            F.lit("class"),
        )
        agg = with_types.groupBy(
            "url", "focus", "shape_uri", "ps_idx", "target_class", "path_type",
            "c_minCount", "c_maxCount",
        ).agg(
            F.count("v_value").alias("n_vals"),
            F.array_compact(F.array_distinct(F.collect_list(row_viol))).alias("row_violations"),
        )
        card = F.when(
            F.col("c_minCount").isNotNull() & (F.col("n_vals") < F.col("c_minCount")),
            F.lit("minCount"),
        ).when(
            F.col("c_maxCount").isNotNull() & (F.col("n_vals") > F.col("c_maxCount")),
            F.lit("maxCount"),
        )
        return (
            agg.withColumn("violations", F.array_compact(F.concat("row_violations", F.array(card))))
            .filter(F.size("violations") > 0)
            .select(
                "url",
                F.col("focus").alias("subject"),
                "shape_uri",
                "ps_idx",
                "path_type",
                "violations",
            )
        )

    # ONE driver-side probe of the tiny rule-metadata table, persisted so
    # the shape-extraction plan executes once — not once per branch probe.
    # (ADVICE r2: the old tc limit(1).count() + sequence-lengths collect()
    # ran 2+ eager jobs at plan-construction time even when no such rules
    # existed, re-executing an unmaterialized shapes plan each time.)
    # Branches below are only CONSTRUCTED for path types actually present,
    # so a corpus with plain predicate paths pays zero plan overhead here.
    base_rules = base_rules.persist()
    meta = base_rules.select("path_type", F.size("paths").alias("L")).distinct().collect()
    types_present = {r["path_type"] for r in meta}

    outs = []

    # ---- inverse: value nodes are SUBJECTS pointing at the focus ----------
    if "inverse" in types_present:
        inv_focus = focus_of(base_rules.filter(F.col("path_type") == "inverse"))
        iv_cond = (F.col("d.object.value") == F.col("fo.focus")) & (
            F.col("d.predicate") == F.col("fo.path")
        ) & F.col("d.object.kind").isin("iri", "bnode")
        if same_url_scope:
            iv_cond = iv_cond & (F.col("d.url") == F.col("fo.url"))
        inv_vals = inv_focus.alias("fo").join(data.alias("d"), iv_cond, "left").select(
            "fo.*",
            F.col("d.subject").alias("v_value"),
            # subjects are resources (iri OR bnode — '_:'-prefixed labels);
            # literal-only constraints can't hold on them
            _resource_kind(F.col("d.subject")).alias("v_kind"),
            F.lit(None).cast("string").alias("v_dt"),
        )
        outs.append(value_checks(inv_vals))

    # ---- alternative: union of one-hop value sets over the member paths ---
    # (W3C §2.3.1: values are reachable through ANY member; counts are per
    # RULE, so the per-member left joins aggregate together in value_checks)
    if "alternative" in types_present:
        alt_focus = focus_of(
            base_rules.filter((F.col("path_type") == "alternative") & F.col("paths").isNotNull())
        )
        alt_m = alt_focus.select("*", F.explode("paths").alias("member")).alias("fo")
        am_cond = (F.col("d.subject") == F.col("fo.focus")) & (
            F.col("d.predicate") == F.col("fo.member")
        )
        if same_url_scope:
            am_cond = am_cond & (F.col("d.url") == F.col("fo.url"))
        alt_vals = alt_m.join(data.alias("d"), am_cond, "left").select(
            "fo.*",
            F.col("d.object.value").alias("v_value"),
            F.col("d.object.kind").alias("v_kind"),
            F.coalesce(
                F.when(F.col("d.object.datatype") != "", F.col("d.object.datatype")),
                F.lit(XSD + "string"),
            ).alias("v_dt"),
        ).drop("member")
        outs.append(value_checks(alt_vals))

    # ---- zeroOrOne: the focus node itself (zero hops) UNION one hop -------
    if "zeroOrOne" in types_present:
        zo_focus = focus_of(
            base_rules.filter((F.col("path_type") == "zeroOrOne") & F.col("path").isNotNull())
        )
        zo_cond = (F.col("d.subject") == F.col("fo.focus")) & (
            F.col("d.predicate") == F.col("fo.path")
        )
        if same_url_scope:
            zo_cond = zo_cond & (F.col("d.url") == F.col("fo.url"))
        zo_hop = zo_focus.alias("fo").join(data.alias("d"), zo_cond, "inner").select(
            "fo.*",
            F.col("d.object.value").alias("v_value"),
            F.col("d.object.kind").alias("v_kind"),
            F.coalesce(
                F.when(F.col("d.object.datatype") != "", F.col("d.object.datatype")),
                F.lit(XSD + "string"),
            ).alias("v_dt"),
        )
        zo_zero = zo_focus.select(
            "*",
            F.col("focus").alias("v_value"),
            # focus nodes are resources (iri or '_:'-prefixed bnode)
            _resource_kind(F.col("focus")).alias("v_kind"),
            F.lit(None).cast("string").alias("v_dt"),
        )
        outs.append(value_checks(zo_hop.unionByName(zo_zero)))

    # ---- zeroOrMore / oneOrMore: bounded transitive-closure frontier loop -
    tc_rules = base_rules.filter(
        F.col("path_type").isin("zeroOrMore", "oneOrMore") & F.col("path").isNotNull()
    )
    if types_present & {"zeroOrMore", "oneOrMore"}:  # branch on collected metadata, no extra job
        tc_focus = focus_of(tc_rules)
        group_keys = [
            "url", "focus", "shape_uri", "ps_idx", "target_class", "path_type", "path",
            "c_datatype", "c_class", "c_nodeKind", "c_minCount", "c_maxCount",
        ]
        # rule identity for equi-joins: ONLY the non-null columns — the c_*
        # constraint columns are nullable and NULL join keys never match
        # (which would both break the cycle-guard anti-join and orphan
        # zero-value focus nodes); they are functionally determined by this
        # subset anyway
        rule_keys = ["url", "focus", "shape_uri", "ps_idx", "target_class", "path_type", "path"]
        # persist (not localCheckpoint) as the per-round materialization
        # barrier: these plans are fully deterministic (no id-assignment
        # exprs), so cache-matching is sound — and localCheckpoint trips a
        # Spark attribute-rewrite bug on this mapInPandas+aliased-join plan
        # shape ("key not found" in AttributeMap during checkpoint planning)
        seed = tc_focus.select(
            *group_keys,
            F.col("focus").alias("v_value"),
            _resource_kind(F.col("focus")).alias("v_kind"),
            F.lit(None).cast("string").alias("v_dt"),
        ).distinct().persist()
        reached = seed  # depth-0 nodes (the focus itself)
        plus = None  # depth >= 1 values (the oneOrMore set)
        frontier = seed
        for _hop in range(max_closure_hops):
            h_cond = (F.col("d.subject") == F.col("fr.v_value")) & (
                F.col("d.predicate") == F.col("fr.path")
            ) & F.col("fr.v_kind").isin("iri", "bnode")
            if same_url_scope:
                h_cond = h_cond & (F.col("d.url") == F.col("fr.url"))
            nxt = (
                frontier.alias("fr")
                .join(data.alias("d"), h_cond, "inner")
                .select(
                    *[F.col(f"fr.{c}") for c in group_keys],
                    F.col("d.object.value").alias("v_value"),
                    F.col("d.object.kind").alias("v_kind"),
                    F.coalesce(
                        F.when(F.col("d.object.datatype") != "", F.col("d.object.datatype")),
                        F.lit(XSD + "string"),
                    ).alias("v_dt"),
                )
                .distinct()
                # cycle guard: only genuinely new (rule, focus, value) rows
                .join(
                    reached.select(*rule_keys, "v_value"),
                    rule_keys + ["v_value"],
                    "left_anti",
                )
                .persist()
            )
            if nxt.limit(1).count() == 0:
                break
            reached = reached.unionByName(nxt).persist()
            plus = nxt if plus is None else plus.unionByName(nxt)
            frontier = nxt
        star_vals = reached.filter(F.col("path_type") == "zeroOrMore")
        outs.append(value_checks(star_vals))
        if plus is not None:
            plus_vals = plus.filter(F.col("path_type") == "oneOrMore")
        else:
            plus_vals = seed.filter(F.lit(False))
        # oneOrMore focus nodes with ZERO reachable values must still appear
        # (minCount): left-join the focus set against its values
        plus_focus = tc_focus.filter(F.col("path_type") == "oneOrMore").select(*group_keys).distinct()
        plus_all = plus_focus.join(
            plus_vals.select(*rule_keys, "v_value", "v_kind", "v_dt"), rule_keys, "left"
        )
        outs.append(value_checks(plus_all))

    # ---- sequence: one static join chain per distinct path length ---------
    seq_rules = base_rules.filter(
        (F.col("path_type") == "sequence") & F.col("paths").isNotNull()
    )
    lengths = sorted(
        {r["L"] for r in meta if r["path_type"] == "sequence" and r["L"] is not None and r["L"] > 0}
    )
    for L in lengths:
        fo = focus_of(seq_rules.filter(F.size("paths") == L)).alias("fo")
        cur = fo
        for i in range(L):
            # hop source: the focus node for hop 0, else the previous hop's
            # object — which must be a RESOURCE to be traversable
            prev = (
                F.col("fo.focus")
                if i == 0
                else F.when(
                    F.col(f"d{i - 1}.object.kind").isin("iri", "bnode"),
                    F.col(f"d{i - 1}.object.value"),
                )
            )
            cond = (F.col(f"d{i}.subject") == prev) & (
                F.col(f"d{i}.predicate") == F.col("fo.paths")[i]
            )
            if same_url_scope:
                cond = cond & (F.col(f"d{i}.url") == F.col("fo.url"))
            # every hop is LEFT so zero-value focus nodes survive for minCount
            cur = cur.join(data.alias(f"d{i}"), cond, "left")
        last = f"d{L - 1}"
        seq_vals = cur.select(
            *[F.col(f"fo.{c}") for c in fo.columns],
            F.col(f"{last}.object.value").alias("v_value"),
            F.col(f"{last}.object.kind").alias("v_kind"),
            F.coalesce(
                F.when(F.col(f"{last}.object.datatype") != "", F.col(f"{last}.object.datatype")),
                F.lit(XSD + "string"),
            ).alias("v_dt"),
        )
        outs.append(value_checks(seq_vals))

    if not outs:
        # no non-predicate path rules anywhere in the shape catalog: return
        # a schema-stable empty report (the common web-corpus case — the
        # whole function then contributes nothing to the reports plan)
        from pyspark.sql import types as T

        return triples.sparkSession.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("url", T.StringType()),
                    T.StructField("subject", T.StringType()),
                    T.StructField("shape_uri", T.StringType()),
                    T.StructField("ps_idx", T.IntegerType()),
                    T.StructField("path_type", T.StringType()),
                    T.StructField("violations", T.ArrayType(T.StringType(), False)),
                ]
            ),
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


def split_validated(validated: DataFrame) -> tuple[DataFrame, DataFrame]:
    accepted = validated.filter(F.size("violations") == 0)
    rejected = validated.filter(F.size("violations") > 0)
    return accepted, rejected


# W3C SHACL §3.6 constraint-component IRIs whose spelling is not the
# plain initial-capitalization of the validator's violation code.
_COMPONENT_OVERRIDES = {
    "sparql": "SPARQL",
    "lessThan": "LessThan",
    "lessThanOrEquals": "LessThanOrEquals",
}


def validation_report_triples(rejected: DataFrame) -> DataFrame:
    """Materialize the validator's rejected rows as a standards-shaped
    SHACL validation report graph (W3C SHACL §3.6: sh:ValidationReport /
    sh:ValidationResult with sh:focusNode, sh:resultPath,
    sh:resultSeverity, sh:sourceConstraintComponent) — the interchange
    format every SHACL consumer understands, which the reference parser
    never produces because it never validates. Returns flat triple rows
    (subject, predicate, object, kind) ready for the N-Triples/Turtle
    serializers.

    One report node per url (urn:shacl:report:md5(url)), one result node
    per distinct (url, focus, path, code) — repeated violation instances
    (e.g. two maxCount-flagged assertions of the same path) collapse into
    one result, per the spec's set semantics. Component IRIs derive from
    the violation code by initial capitalization with a spec-spelling
    override table (sparql -> SPARQLConstraintComponent).

    Scale shape: one explode of the per-row violations array, one
    distinct on the result key, then a map-only 8-triple array+explode
    projection (the direct-mapping codegen idiom) and a final distinct
    that dedupes the per-url report header across that url's results —
    both shuffles are keyed on report-sized data, and nothing runs in
    Python.
    """
    v = (
        rejected.select(
            "url", "subject", "predicate", F.explode("violations").alias("code")
        )
        .filter(F.col("subject").isNotNull())
        .distinct()
    )
    rep = F.concat(F.lit("urn:shacl:report:"), F.md5(F.col("url")))
    res = F.concat(
        F.lit("urn:shacl:result:"),
        F.md5(F.concat_ws("|", "url", "subject", "predicate", "code")),
    )
    comp = F.concat(
        F.lit(SH),
        F.upper(F.substring("code", 1, 1)),
        F.expr("substring(code, 2)"),
        F.lit("ConstraintComponent"),
    )
    for code, spelled in _COMPONENT_OVERRIDES.items():
        comp = F.when(
            F.col("code") == code,
            F.lit(f"{SH}{spelled}ConstraintComponent"),
        ).otherwise(comp)

    def t(s, p, o, kind):
        return F.struct(
            s.alias("subject"),
            p.alias("predicate"),
            o.alias("object"),
            F.lit(kind).alias("kind"),
        )

    rows = F.array(
        t(rep, F.lit(RDF_TYPE), F.lit(f"{SH}ValidationReport"), "iri"),
        t(rep, F.lit(f"{SH}conforms"), F.lit("false"), "literal"),
        t(rep, F.lit(f"{SH}result"), res, "iri"),
        t(res, F.lit(RDF_TYPE), F.lit(f"{SH}ValidationResult"), "iri"),
        t(res, F.lit(f"{SH}focusNode"), F.col("subject"), "iri"),
        t(res, F.lit(f"{SH}resultPath"), F.col("predicate"), "iri"),
        t(res, F.lit(f"{SH}resultSeverity"), F.lit(f"{SH}Violation"), "iri"),
        t(res, F.lit(f"{SH}sourceConstraintComponent"), comp, "iri"),
    )
    return (
        v.select(F.explode(rows).alias("r"))
        .select("r.subject", "r.predicate", "r.object", "r.kind")
        .distinct()
    )
