"""Per-stage scaling audit: time each KG-pipeline stage at one parallelism
level so 1-core vs 4-core runs expose which stages do NOT scale (the serial
fraction that caps overall scaling efficiency — see BENCH/BASELINE.md).

Usage: python tools/stage_profile.py <cpus> [n_pages]
Prints one JSON line: {"cpus": N, "stages": {name: sec, ...}, "total": sec}
"""

from __future__ import annotations

import json
import sys
import time

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from kgforge.session import get_spark  # noqa: E402
from kgforge.fixtures import pages_df, gazetteer_rows  # noqa: E402
from kgforge.operators.parse import parse_combined, split_parsed  # noqa: E402
from kgforge.operators.mentions import detect_mentions, mention_triples  # noqa: E402
from kgforge.operators.validate import validate_triples, split_validated  # noqa: E402
from kgforge.operators.canonicalize import canonicalize_entities  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 40000
    spark = get_spark(
        app_name=f"kgforge-stageprof-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )

    def run(pages, timings=None):
        def mark(name, t0):
            if timings is not None:
                timings[name] = round(time.time() - t0, 2)
            return time.time()

        t = time.time()
        combined = parse_combined(pages).persist()
        combined.count()
        t = mark("parse_combined", t)
        triples, shapes = split_parsed(combined)
        mentions = detect_mentions(pages, gazetteer_rows())
        all_triples = (
            triples.filter(F.col("subject").isNotNull())
            .unionByName(mention_triples(mentions))
            .persist()
        )
        all_triples.count()
        t = mark("mentions_union", t)
        validated = validate_triples(all_triples, shapes).persist()
        validated.count()
        t = mark("validate", t)
        accepted, _rejected = split_validated(validated)
        accepted.count()
        t = mark("accepted_split", t)
        mapping = canonicalize_entities(accepted)
        mapping.count()
        mark("canonicalize_cc", t)
        validated.unpersist()
        all_triples.unpersist()
        combined.unpersist()

    warm = pages_df(spark, 4000, partitions=2 * cpus).persist()
    warm.count()
    run(warm)
    warm.unpersist()

    pages = pages_df(spark, n_pages, partitions=2 * cpus).persist()
    pages.count()
    timings: dict[str, float] = {}
    t0 = time.time()
    run(pages, timings)
    total = round(time.time() - t0, 2)
    print(json.dumps({"cpus": cpus, "n_pages": n_pages, "stages": timings, "total": total}))
    spark.stop()


if __name__ == "__main__":
    main()
