"""spark-submit entry point for the KG-construction pipeline (north rule:
`spark-submit --py-files kgforge.zip jobs/run_kg_pipeline.py ...`).

Build the archive and run locally:

    cd /root/repo && python -c "import shutil; shutil.make_archive('kgforge', 'zip', '.', 'kgforge')"
    spark-submit --master 'local[8]' --py-files kgforge.zip \
        jobs/run_kg_pipeline.py --pages-parquet <dir-or-synth:N> --out /tmp/kg_out

On a cluster, point --master at YARN/K8s and --pages-parquet at the Iceberg/
parquet pages table; everything else is identical (the pipeline carries its
own AQE/partitioning configuration).
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages-parquet", required=True,
                    help="pages parquet path, or 'synth:N' for an N-page deterministic corpus")
    ap.add_argument("--out", required=True, help="output work root")
    ap.add_argument("--run-id", default="run1")
    ap.add_argument("--extended-checks", action="store_true",
                    help="also materialize the focus-node constraint-report stream "
                         "(pair / qualified / sh:node / node-logical / path executors)")
    ap.add_argument("--dedup", choices=["exact", "near"], default=None,
                    help="insert a page-dedup stage before parsing (exact text hash, "
                         "or MinHash-LSH near-dup collapse with sig-prefiltered verify)")
    ap.add_argument("--rules-ttl", default=None,
                    help="path to a Turtle shapes graph whose SHACL-AF rules "
                         "(sh:TripleRule/sh:SPARQLRule) are forward-chained over the "
                         "canonical graph; the entailed delta lands in <out>/entailed "
                         "and in the materialized S/P/O tables (url=urn:kgforge:entailed)")
    ap.add_argument("--merge-from", default=None, metavar="PREV_ROOT",
                    help="incremental crawl merge: treat --pages-parquet as the NEW "
                         "batch only and fold it into the run materialized at "
                         "PREV_ROOT (old stages are read back, never recomputed; "
                         "canonicalization re-runs over the merged edge set; with "
                         "--rules-ttl the entailed layer is maintained by DRed "
                         "delta rules instead of a fixpoint replay)")
    ap.add_argument("--span-dedup", action="store_true",
                    help="rewrite surviving pages' text with duplicated spans "
                         "removed (ExactSubstr) before parse/mentions")
    ap.add_argument("--host-filter", action="store_true",
                    help="drop whole hosts failing the domain-level curation "
                         "rollup before any other stage")
    ap.add_argument("--ifp-props", default=None, metavar="IRI[,IRI...]",
                    help="comma-separated inverse-functional predicate IRIs: "
                         "subjects sharing a value merge during canonicalization "
                         "even without owl:sameAs (block-cleaned key-based ER)")
    ap.add_argument("--compact", action="store_true",
                    help="after materializing, compact the S/P/O stage directories to "
                         "~128MB range-clustered files (fingerprint-verified rewrite)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("kgforge-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from kgforge.fixtures import pages_df
    from kgforge.pipeline.run import run_pipeline

    if args.pages_parquet.startswith("synth:"):
        pages = pages_df(spark, int(args.pages_parquet.split(":", 1)[1]))
    else:
        pages = spark.read.parquet(args.pages_parquet)

    rules = None
    if args.rules_ttl:
        from kgforge.rdf.detect import parse_rdf
        from kgforge.shacl.rules import extract_rules

        with open(args.rules_ttl, encoding="utf-8") as fh:
            shape_triples, _, _ = parse_rdf(fh.read())
        rules = extract_rules(shape_triples)

    ifp_props = (
        [p.strip() for p in args.ifp_props.split(",") if p.strip()]
        if args.ifp_props
        else None
    )
    if args.merge_from:
        if args.span_dedup or args.host_filter:
            ap.error(
                "--span-dedup/--host-filter apply to full runs; an "
                "incremental --merge-from inherits the previous run's stages"
            )
        from kgforge.pipeline.incremental import merge_increment

        out = merge_increment(
            pages, args.merge_from, args.out, run_id=args.run_id,
            dedup=args.dedup, infer_rules=rules, ifp_props=ifp_props,
        )
    else:
        out = run_pipeline(
            pages, args.out, run_id=args.run_id,
            extended_checks=args.extended_checks, dedup=args.dedup,
            span_dedup=args.span_dedup, host_filter=args.host_filter,
            infer_rules=rules, ifp_props=ifp_props,
        )
    summary = {
        "accepted": out["accepted"].count(),
        "rejected": out["rejected"].count(),
        "canonical_nodes": out["mapping"].count() if out["mapping"] is not None else 0,
    }
    if out.get("entailed") is not None:
        summary["entailed"] = out["entailed"].count()
    if out["reports"] is not None:
        summary["constraint_reports"] = out["reports"].count()
    if args.compact:
        import os

        from kgforge.sinks.materialize import ManifestStore, compact_stage

        manifests = ManifestStore(os.path.join(args.out, "_manifests"))
        for name, cols in (("s", ["subject"]), ("p", ["predicate"]), ("o", ["obj_value"])):
            compact_stage(
                spark, os.path.join(args.out, "graph", f"spo_{name}"),
                f"materialize_{name}", args.run_id, manifests, range_cols=cols,
            )
        summary["compacted"] = True
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
