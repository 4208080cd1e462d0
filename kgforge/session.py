"""SparkSession factory with the engine's scale-oriented defaults.

AQE (incl. skew-join splitting) is mandatory per the north rule; Arrow is the
transport for every pandas UDF. shuffle.partitions defaults to 2x cores for
local mode — on a real cluster set it to ~2-3x total executor cores or rely
on AQE coalescing (initialPartitionNum high, AQE shrinks).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kgforge",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] -> 2N keeps every core busy through AQE coalescing
        n = cpus if "local" in master else 200
        shuffle_partitions = max(8, 2 * n) if "local" in master else 200
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # keep parallelism on compute-heavy-but-byte-small shuffles (array
        # intersections, pair explosions): the 1 MB default lets AQE collapse
        # them to 1 task when the bytes are tiny even though the CPU isn't
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # DataFrame-debugging call-site capture costs ~4.5 ms of py4j
        # round-trips PER Column/DataFrame API call (getActiveSession +
        # conf.get + origin set/clear); a large plan like the validator's
        # bitmask tree makes thousands of such calls, turning plan
        # CONSTRUCTION into multi-second, purely-serial driver time that
        # caps scaling efficiency. Production posture is off.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", "67108864")
        # local mode = single JVM: the driver heap IS the executor memory.
        # 16g measured as fast as 8g with 2x headroom; 32g measured 3.7x
        # SLOWER on array-heavy stages (G1 region size doubles at 32g,
        # flipping large shuffle arrays into humongous allocations)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # bucketed saveAsTable target (kgforge.sinks.bucketed); keep the
        # in-memory catalog's files out of the repo working directory
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/kgforge-warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
