"""RDFS forward-chaining inference over the corpus triples.

The reference parser extracts ontology metadata (classes, subClassOf,
domain/range — /root/reference/src/ShaclParser.php:65-74 reads the base
ontology graph) but never *infers* anything from it. At KG-construction
scale the standard materialization step is RDFS entailment: close the
class hierarchy and stamp every entity with its superclasses so that
downstream queries ("all Agents") are single-predicate scans instead of
per-query hierarchy walks.

Scale design — the asymmetry this module is built around: the ONTOLOGY is
schema-level metadata (10^2-10^5 classes, KBs), the INSTANCE data is the
corpus (10^12 typed subjects, TBs). So:

- the subclass transitive closure iterates on the ontology DataFrame only
  (path-doubling: O(log depth) self-join rounds on the tiny relation, each
  round's fixpoint probe is a count() on KB-scale data — bounded driver
  work, never a corpus job);
- instance expansion is ONE broadcast join of the corpus type triples
  against the closed hierarchy + a distinct — the corpus is scanned once,
  shuffled once (for the dedup), and nothing per-row runs in Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def subclass_closure(
    subclass: DataFrame, max_depth: int = 64, driver_cap: int = 20_000
) -> DataFrame:
    """(sub, sup) direct edges -> (sub, sup) transitive closure (irreflexive
    unless the input itself carries cycles, which fixpoint-terminate).

    Relations up to ``driver_cap`` edges (the overwhelmingly common case —
    the ontology is schema-scale by the module contract) close DRIVER-SIDE
    with the same doubling-round semantics: a distributed fixpoint on a
    50-edge relation costs 8+ tiny Spark jobs of pure scheduling latency
    (measured ~15 s inside a query at sf0.1), while the in-memory closure
    is microseconds and returns one createDataFrame. Larger relations keep
    the distributed path doubling: after r rounds all paths of length
    <= 2^r are present, so ``max_depth`` 64 costs at most 6 rounds; each
    round ends with a count() fixpoint probe — acceptable here and only
    here because the relation is never the corpus.
    """
    clo = subclass.select("sub", "sup").distinct()
    rounds = max(1, (max_depth - 1).bit_length())

    probe = clo.limit(driver_cap + 1).count()
    if probe <= driver_cap:
        rows = [(r["sub"], r["sup"]) for r in clo.collect()]
        closed: dict[str, set[str]] = {}
        for u, v in rows:
            closed.setdefault(u, set()).add(v)
        # identical doubling-round semantics to the distributed loop
        for _ in range(rounds):
            changed = False
            for u, vs in closed.items():
                add = set()
                for v in vs:
                    add |= closed.get(v, set())
                if not add <= vs:
                    vs |= add
                    changed = True
            if not changed:
                break
        out = [(u, v) for u, vs in sorted(closed.items()) for v in sorted(vs)]
        return subclass.sparkSession.createDataFrame(
            out, "sub string, sup string"
        )

    clo = clo.persist()
    n = clo.count()
    for _ in range(rounds):
        step = (
            clo.alias("x")
            .join(clo.alias("y"), F.col("x.sup") == F.col("y.sub"))
            .select(F.col("x.sub").alias("sub"), F.col("y.sup").alias("sup"))
        )
        nxt = clo.unionByName(step).distinct().persist()
        m = nxt.count()
        if m == n:
            nxt.unpersist()
            break
        clo.unpersist()
        clo, n = nxt, m
    return clo


def rdfs_type_closure(
    types: DataFrame, subclass: DataFrame, max_depth: int = 64
) -> DataFrame:
    """Materialize inferred types: (entity, cls) direct type assertions +
    ontology (sub, sup) -> (entity, cls) with every superclass stamped.

    The closed hierarchy is broadcast (it is ontology-sized by contract);
    the corpus side is scanned once. Output is distinct — an entity typed
    Person and Organization both subclassing Agent yields one Agent row.
    """
    clo = subclass_closure(subclass, max_depth=max_depth)
    inferred = types.join(
        F.broadcast(clo), types["cls"] == clo["sub"], "inner"
    ).select(types["entity"], clo["sup"].alias("cls"))
    return types.select("entity", "cls").unionByName(inferred).distinct()


def lower_equivalences(equiv: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """owl:equivalentClass / owl:equivalentProperty lowered to MUTUAL
    subsumption edges (OWL 2 RL: cax-eqc1/2 are exactly cax-sco over both
    directions; prp-eqp1/2 likewise over prp-spo1) — returns (sub, sup)
    rows with both orientations of every equivalence, ready to union into
    the subclass/subproperty relation before closure. The 2-cycles this
    creates are safe: the path-doubling closures fixpoint-terminate on
    cycles (see :func:`subclass_closure`)."""
    fwd = equiv.select(F.col(a).alias("sub"), F.col(b).alias("sup"))
    bwd = equiv.select(F.col(b).alias("sub"), F.col(a).alias("sup"))
    return fwd.unionByName(bwd).distinct()


def subproperty_inference(
    triples: DataFrame,
    subprop: DataFrame,
    equiv_props: DataFrame | None = None,
    max_depth: int = 64,
) -> DataFrame:
    """RDFS rules rdfs5 + rdfs7 (and, with ``equiv_props``, OWL 2 RL
    prp-eqp1/2): close the (sub, sup) subPropertyOf relation transitively
    — equivalences lowered to mutual edges first — then entail
    (s, q, o) for every asserted (s, p, o) with p ⊑ q strictly. Returns
    ONLY the newly-entailed delta (subject, predicate, object-struct),
    deduped and anti-joined against what the corpus asserts, mirroring
    :func:`owl_property_inference`'s contract. Literal-valued triples
    participate (rdfs7 applies to any triple, unlike the IRI-only
    inverse/symmetric rules).

    Scale shape: the property hierarchy is ontology-sized — the closure
    iterates on it alone (path doubling, the :func:`subclass_closure`
    machinery; the equivalence 2-cycles fixpoint-terminate) — and the
    corpus is scanned ONCE through a broadcast equi-join on predicate
    with an isin pushdown on the closure's subject properties; the final
    distinct + anti-join are the only corpus-keyed shuffles."""
    edges = subprop.select("sub", "sup")
    if equiv_props is not None:
        edges = edges.unionByName(lower_equivalences(equiv_props))
    clo = subclass_closure(edges, max_depth=max_depth).filter(
        F.col("sub") != F.col("sup")
    )
    # pushdown: only predicates that HAVE a strict super-property matter
    props = [r["sub"] for r in clo.select("sub").distinct().collect()]
    base = triples.filter(
        F.col("subject").isNotNull() & F.col("predicate").isin(props)
    ).select("subject", "predicate", "object")
    inferred = (
        base.join(F.broadcast(clo), base["predicate"] == clo["sub"])
        .select("subject", F.col("sup").alias("predicate"), "object")
        .distinct()
    )
    asserted = triples.filter(F.col("subject").isNotNull()).select(
        "subject", "predicate", "object"
    )
    return inferred.join(
        asserted, ["subject", "predicate", "object"], "left_anti"
    )


def domain_range_types(
    triples: DataFrame, domains: DataFrame, ranges: DataFrame | None = None
) -> DataFrame:
    """RDFS rules rdfs2/rdfs3: infer (entity, cls) from property usage.

    ``domains``: (predicate, cls) — every subject of that predicate is an
    instance of cls; ``ranges``: (predicate, cls) — every IRI object is.
    Both are ontology-sized broadcast dims; the corpus is scanned once per
    rule side with the predicate-equality join pushed into the scan.
    """
    ok = triples.filter(F.col("status") == "ok").filter(
        F.col("subject").isNotNull()
    )
    subj = ok.join(
        F.broadcast(domains.select(F.col("predicate").alias("p"), "cls")),
        ok["predicate"] == F.col("p"),
    ).select(F.col("subject").alias("entity"), "cls")
    out = subj
    if ranges is not None:
        obj = (
            ok.filter(F.col("object.kind") == "iri")
            .join(
                F.broadcast(
                    ranges.select(F.col("predicate").alias("p"), "cls")
                ),
                ok["predicate"] == F.col("p"),
            )
            .select(F.col("object.value").alias("entity"), "cls")
        )
        out = out.unionByName(obj)
    return out.distinct()


def owl_property_inference(
    triples: DataFrame, axioms: DataFrame
) -> DataFrame:
    """Materialize OWL property-semantics entailments over IRI-valued
    triples: owl:inverseOf (from (s,p,o) infer (o,q,s), both directions)
    and owl:SymmetricProperty (from (s,p,o) infer (o,p,s)). ``axioms`` is
    a DataFrame (p, axiom, q) with axiom in {'inverseOf','symmetric'}
    (q NULL for symmetric) — the ontology side of the entailment rules,
    normally parsed from the schema graph.

    Returns ONLY the newly-entailed triples (subject, predicate, object),
    already deduped and anti-joined against what the corpus asserts — the
    delta a forward-chaining materializer appends.

    Scale shape: the axiom table is ontology-sized (broadcast); each rule
    is one broadcast equi-join on predicate + a projection that swaps
    subject/object — map-only over the triple scan. The final distinct +
    left-anti join are the only shuffles, both keyed on the full triple.
    Only IRI objects participate (a literal can't be a subject), enforced
    with a codegen filter, not Python.
    """
    base = triples.filter(
        F.col("subject").isNotNull() & (F.col("object.kind") == "iri")
    ).select("subject", "predicate", F.col("object.value").alias("object"))

    inv = axioms.filter(F.col("axiom") == "inverseOf").select("p", "q")
    sym = axioms.filter(F.col("axiom") == "symmetric").select("p")

    fwd = base.join(
        F.broadcast(inv), base["predicate"] == inv["p"]
    ).select(
        F.col("object").alias("subject"),
        F.col("q").alias("predicate"),
        F.col("subject").alias("object"),
    )
    bwd = base.join(
        F.broadcast(inv), base["predicate"] == inv["q"]
    ).select(
        F.col("object").alias("subject"),
        F.col("p").alias("predicate"),
        F.col("subject").alias("object"),
    )
    mirrored = base.join(
        F.broadcast(sym), base["predicate"] == sym["p"]
    ).select(
        F.col("object").alias("subject"),
        "predicate",
        F.col("subject").alias("object"),
    )
    inferred = fwd.unionByName(bwd).unionByName(mirrored).distinct()
    return inferred.join(base, ["subject", "predicate", "object"], "left_anti")


def owl_transitive_inference(
    triples: DataFrame, transitive_props: list[str], max_depth: int = 64
) -> DataFrame:
    """Materialize owl:TransitiveProperty entailments: for every declared
    transitive predicate p, close (s, p, o) under s-p->x-p->o chaining and
    return ONLY the newly-entailed triples (subject, predicate, object) —
    the delta a forward-chaining materializer appends (completes the OWL
    property-semantics trio next to :func:`owl_property_inference`'s
    inverseOf/symmetric rules; the reference extracts ontology metadata,
    /root/reference/src/ShaclParser.php:65-74, but never entails).

    Scale shape: the edge relation for ONE property (partOf, broader,
    subEventOf, ...) is link-shaped — orders of magnitude below the corpus
    triple count — and the closure never touches other predicates: the
    corpus scan happens once (a broadcastable isin filter on predicate
    that pushes into the columnar scan), then path doubling iterates on
    the filtered relation only, keyed (predicate, node) so multiple
    transitive properties close in the same rounds without cross-talk.
    Doubling reaches paths of length 2^r after r rounds — log(diameter)
    self-joins, not diameter — and every round ends with an eager
    localCheckpoint (lineage stays round-linear) + a count() fixpoint
    probe on the property-sized relation, never a corpus job. Cycles are
    safe: a node on a p-cycle entails (s, p, s) and the distinct-fixpoint
    terminates. Worst case the closure is quadratic in one property's
    node count — the well-known materialization trade-off; ``max_depth``
    bounds rounds at ceil(log2(max_depth)).
    """
    props = [p for p in transitive_props]
    base = (
        triples.filter(
            F.col("subject").isNotNull()
            & (F.col("object.kind") == "iri")
            & F.col("predicate").isin(props)
        )
        .select("subject", "predicate", F.col("object.value").alias("object"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    clo = base
    n = clo.count()
    rounds = max(1, (max(2, max_depth) - 1).bit_length())
    for _ in range(rounds):
        step = (
            clo.alias("x")
            .join(
                clo.alias("y"),
                (F.col("x.predicate") == F.col("y.predicate"))
                & (F.col("x.object") == F.col("y.subject")),
            )
            .select(
                F.col("x.subject").alias("subject"),
                F.col("x.predicate").alias("predicate"),
                F.col("y.object").alias("object"),
            )
        )
        nxt = (
            clo.unionByName(step).distinct().localCheckpoint(eager=True)
        )
        m = nxt.count()
        if m == n:
            break
        clo, n = nxt, m
    return clo.join(base, ["subject", "predicate", "object"], "left_anti")


def ifp_sameas_candidates(
    triples: DataFrame, ifp_props: list[str], max_group: int = 100
) -> DataFrame:
    """owl:InverseFunctionalProperty-driven entity-resolution candidates:
    two subjects sharing a value of an IFP (email, ISBN, tax id — here
    any declared predicate) are candidates for owl:sameAs, the classic
    KEY-BASED blocking step that feeds the MinHash/CC canonicalizer with
    high-precision pairs. Returns evidence rows (a, b, predicate, value)
    with a < b, one per shared key.

    Scale shape: one pushdown isin filter on the corpus scan, one
    distinct on (predicate, value, subject), then the group-size agg and
    the pair self-join are BOTH keyed on (predicate, value) — co-keyed,
    so AQE reuses the exchange. Junk keys (the empty string, 'unknown',
    a boilerplate title shared by 10^6 pages) are the skew killer: any
    value group larger than ``max_group`` is DROPPED ENTIRELY before the
    quadratic pair expansion (Papadakis-style block cleaning — an
    oversized key carries no linkage signal anyway), so the worst group
    costs max_group²/2 pairs by construction.
    """
    vals = (
        triples.filter(
            F.col("subject").isNotNull()
            & F.col("predicate").isin(list(ifp_props))
        )
        .select("predicate", F.col("object.value").alias("value"), "subject")
        .distinct()
    )
    ok = (
        vals.groupBy("predicate", "value")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter((F.col("_n") >= 2) & (F.col("_n") <= max_group))
        .select("predicate", "value")
    )
    kept = vals.join(ok, ["predicate", "value"], "left_semi")
    return (
        kept.alias("x")
        .join(
            kept.alias("y"),
            (F.col("x.predicate") == F.col("y.predicate"))
            & (F.col("x.value") == F.col("y.value"))
            & (F.col("x.subject") < F.col("y.subject")),
        )
        .select(
            F.col("x.subject").alias("a"),
            F.col("y.subject").alias("b"),
            F.col("x.predicate").alias("predicate"),
            F.col("x.value").alias("value"),
        )
    )


def functional_conflicts(
    triples: DataFrame, func_props: list[str]
) -> DataFrame:
    """owl:FunctionalProperty consistency check: subjects asserting MORE
    than one distinct value for a declared single-valued predicate —
    the data-quality report a KG builder runs before trusting a column
    for fusion or display (the executable sibling of SHACL's
    sh:maxCount 1, but ontology-driven instead of shape-driven).
    Returns (subject, predicate, n_values, values) with the conflicting
    values '|'-joined in sorted order so the row is deterministic and
    oracle-replayable.

    Scale shape: pushdown isin filter, one distinct, one combinable
    (subject, predicate)-keyed agg; collect_set is bounded by the
    per-subject assertion count for ONE predicate — conflict lists are
    small by nature (a subject with 10^4 'values' for a functional
    property is itself the finding).
    """
    vals = (
        triples.filter(
            F.col("subject").isNotNull()
            & F.col("predicate").isin(list(func_props))
        )
        .select("subject", "predicate", F.col("object.value").alias("value"))
        .distinct()
    )
    return (
        vals.groupBy("subject", "predicate")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_values"),
            F.array_join(F.sort_array(F.collect_set("value")), "|").alias(
                "values"
            ),
        )
        .filter(F.col("n_values") >= 2)
    )


def disjoint_violations(types: DataFrame, axioms: DataFrame) -> DataFrame:
    """owl:disjointWith consistency check: entities typed with BOTH
    classes of a declared-disjoint pair (Person ⊓ Organization = ⊥ —
    the standard sanity gate after entity linking / type inference).
    ``types`` is (entity, cls); ``axioms`` is (cls_a, cls_b) rows.
    Returns (entity, cls_a, cls_b) violation rows, one per axiom the
    entity breaks.

    Scale shape: the axiom table is ontology-sized — both hops are
    broadcast joins against the (entity, cls)-keyed typing relation, so
    the corpus-scale typing table is scanned twice and never shuffled
    on anything but its own key for the final distinct.
    """
    t = types.select(
        F.col("entity"), F.col("cls")
    ).distinct()
    left = t.join(
        F.broadcast(axioms), t["cls"] == axioms["cls_a"]
    ).select("entity", "cls_a", "cls_b")
    t2 = t.select(F.col("entity").alias("_e2"), F.col("cls").alias("_c2"))
    return (
        left.join(
            t2,
            (F.col("entity") == F.col("_e2"))
            & (F.col("cls_b") == F.col("_c2")),
        )
        .select("entity", "cls_a", "cls_b")
        .distinct()
    )


def property_axiom_violations(
    triples: DataFrame,
    irreflexive: list[str] | None = None,
    asymmetric: list[str] | None = None,
) -> DataFrame:
    """OWL 2 RL consistency rules prp-irp and prp-asyp: triples that
    violate owl:IrreflexiveProperty (s p s) or owl:AsymmetricProperty
    (s p o asserted together with o p s) — completing the executed
    consistency family next to :func:`functional_conflicts` and
    :func:`disjoint_violations`. Returns (subject, predicate, object,
    axiom) rows, axiom in {'irreflexive', 'asymmetric'}; BOTH directions
    of an asymmetric violation are reported (each asserted triple is a
    finding).

    Scale shape: one pushdown isin filter per rule family over the IRI-
    object triples; irreflexive is a pure codegen filter (no shuffle at
    all), asymmetric is ONE self-join of the property-sized relation on
    the reversed key — link-shaped inputs, never the corpus."""
    base = triples.filter(
        F.col("subject").isNotNull() & (F.col("object.kind") == "iri")
    ).select("subject", "predicate", F.col("object.value").alias("object"))
    outs = []
    if irreflexive:
        outs.append(
            base.filter(
                F.col("predicate").isin(list(irreflexive))
                & (F.col("subject") == F.col("object"))
            ).select(
                "subject",
                "predicate",
                "object",
                F.lit("irreflexive").alias("axiom"),
            )
        )
    if asymmetric:
        asym = base.filter(
            F.col("predicate").isin(list(asymmetric))
        ).distinct()
        rev = asym.select(
            F.col("object").alias("subject"),
            F.col("predicate").alias("predicate"),
            F.col("subject").alias("object"),
        )
        outs.append(
            asym.join(rev, ["subject", "predicate", "object"], "left_semi")
            .select(
                "subject",
                "predicate",
                "object",
                F.lit("asymmetric").alias("axiom"),
            )
        )
    if not outs:
        raise ValueError("no axioms given")
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.distinct()


def owl_chain_inference(
    triples: DataFrame, chains: list[tuple[str, list[str]]]
) -> DataFrame:
    """owl:propertyChainAxiom materialization (OWL 2 RL rule prp-spo2):
    for each axiom q ⊑ p1 ∘ p2 ∘ ... ∘ pn, entail q(x, z) whenever the
    chain p1...pn connects x to z. The general form of which
    owl:TransitiveProperty (p ⊑ p∘p) is the special case — together with
    inverseOf/symmetric/transitive this completes the OWL property
    semantics the engine executes. ``chains`` is a list of
    (q_predicate, [p1, ..., pn]); returns ONLY the newly-entailed
    (subject, predicate, object) delta.

    Scale shape: the corpus is scanned once through a pushdown isin
    filter over ALL predicates any chain mentions; each chain then
    composes property-sized edge relations with n−1 keyed joins
    (object = next subject) — link-shaped inputs, never the corpus. The
    final distinct + anti-join are keyed on the full triple.
    """
    props = sorted({p for _, ps in chains for p in ps} | {q for q, _ in chains})
    base = (
        triples.filter(
            F.col("subject").isNotNull()
            & (F.col("object.kind") == "iri")
            & F.col("predicate").isin(props)
        )
        .select("subject", "predicate", F.col("object.value").alias("object"))
        .distinct()
    )

    def edges(p):
        return base.filter(F.col("predicate") == p).select(
            F.col("subject").alias("s"), F.col("object").alias("o")
        )

    outs = []
    for q, ps in chains:
        if not ps:
            raise ValueError(f"empty chain for {q!r}")
        cur = edges(ps[0])
        for p in ps[1:]:
            nxt = edges(p).select(
                F.col("s").alias("_ns"), F.col("o").alias("_no")
            )
            cur = (
                cur.join(nxt, cur["o"] == nxt["_ns"])
                .select("s", F.col("_no").alias("o"))
                .distinct()
            )
        outs.append(
            cur.select(
                F.col("s").alias("subject"),
                F.lit(q).alias("predicate"),
                F.col("o").alias("object"),
            )
        )
    inferred = outs[0]
    for o in outs[1:]:
        inferred = inferred.unionByName(o)
    return inferred.distinct().join(
        base, ["subject", "predicate", "object"], "left_anti"
    )
