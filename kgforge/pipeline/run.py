"""Full KG-construction pipeline: pages -> validated, canonicalized,
materialized S/P/O graph (SURVEY §7.1), resumable per stage.

Every stage boundary writes a manifest; re-running with the same run_id
skips completed stages (exact resume). Intermediate tables persist under
``work_root`` so a resumed run never recomputes parsing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..fixtures import gazetteer_rows
from ..operators.canonicalize import canonicalize_entities, rewrite_to_canonical
from ..operators.mentions import detect_mentions, mention_triples
from ..operators.parse import extract_shapes_df, parse_pages
from ..operators.validate import closed_shape_violations, split_validated, validate_triples
from ..sinks.materialize import ManifestStore, materialize_spo, write_stage


def run_pipeline(
    pages: DataFrame,
    work_root: str,
    run_id: str = "run1",
    gazetteer: list | None = None,
    canonicalize: bool = True,
) -> dict:
    """Returns dict of stage DataFrames + metrics. All heavy stages write
    through ``write_stage`` (repartitionByRange + lineage + manifest)."""
    spark = pages.sparkSession
    manifests = ManifestStore(os.path.join(work_root, "_manifests"))
    gazetteer = gazetteer if gazetteer is not None else gazetteer_rows()

    triples = write_stage(
        parse_pages(pages), os.path.join(work_root, "triples"), "parse", run_id, manifests,
        range_cols=["url", "seq"],
    )
    shapes = write_stage(
        extract_shapes_df(pages), os.path.join(work_root, "shapes"), "shapes", run_id, manifests,
        range_cols=["url", "uri"],
    )
    mentions = write_stage(
        detect_mentions(pages, gazetteer), os.path.join(work_root, "mentions"), "mentions",
        run_id, manifests, range_cols=["url", "start"],
    )

    all_triples = triples.filter(F.col("subject").isNotNull()).unionByName(
        mention_triples(mentions)
    )
    validated = validate_triples(all_triples, shapes)
    accepted, rejected = split_validated(validated)
    closed_rejects = closed_shape_violations(all_triples, shapes).select(
        "url", "seq", "subject", "predicate", "object", "fmt", "status", "error",
        F.lit("violation").alias("violation_severity"), "violations",
    )
    rejected = rejected.unionByName(closed_rejects)
    # accepted/rejected must stay a true PARTITION of the validated stream:
    # a triple rejected by a closed shape may pass every row-local check, so
    # subtract the closed rejects from accepted (else the canonical graph
    # keeps triples the pipeline simultaneously reports as rejected, and
    # accepted+rejected double-counts)
    accepted = accepted.join(
        closed_rejects.select("url", "seq", "subject", "predicate").distinct(),
        ["url", "seq", "subject", "predicate"],
        "left_anti",
    )
    accepted = write_stage(
        accepted, os.path.join(work_root, "accepted"), "validate_accept", run_id, manifests,
        range_cols=["subject", "predicate"],
    )
    rejected = write_stage(
        rejected, os.path.join(work_root, "rejected"), "validate_reject", run_id, manifests,
        range_cols=["subject", "predicate"],
    )

    if canonicalize:
        mapping = write_stage(
            canonicalize_entities(accepted),
            os.path.join(work_root, "canonical_map"), "canonicalize", run_id, manifests,
            range_cols=["node"],
        )
        canonical = rewrite_to_canonical(accepted, mapping)
    else:
        mapping = None
        canonical = accepted

    spo = materialize_spo(canonical, os.path.join(work_root, "graph"), run_id, manifests)

    return {
        "triples": triples,
        "shapes": shapes,
        "mentions": mentions,
        "accepted": accepted,
        "rejected": rejected,
        "mapping": mapping,
        "spo": spo,
    }
