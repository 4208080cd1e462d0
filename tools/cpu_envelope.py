"""Platform CPU-scaling envelope control experiment (see BENCH/BASELINE.md).

Measures what scaling THIS machine can deliver for any Spark workload,
independent of pipeline design: a pure whole-stage-codegen hash aggregation
(zero shuffle, zero Python) and a pure Arrow-batched pandas-UDF numpy loop,
at a given thread count. Compare `triples_per_sec`-style wall times across
thread counts to get the achievable (hardware) speedup envelope that the
pipeline's scaling efficiency should be normalized against.

Usage: python tools/cpu_envelope.py [n_threads]
"""

import sys
import time

sys.path.insert(0, ".")

# module-level so the pandas_udf type hints resolve (with function-local
# imports + postponed annotations, pyspark's hint resolver can't see `pd`
# in the module globals and rejects the signature)
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from kgforge.session import get_spark

    spark = get_spark(app_name=f"cpu-envelope-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus)

    # pure JVM codegen: warmup then timed
    spark.range(0, 10_000_000, 1, 2 * cpus).select(F.sum(F.xxhash64("id") % 1000)).collect()
    t0 = time.time()
    spark.range(0, 2_000_000_000, 1, 2 * cpus).select(
        F.sum(F.xxhash64(F.col("id"), F.col("id") + 1) % 1000)
    ).collect()
    print(f"CPU cpus={cpus}: {time.time() - t0:.1f}s", flush=True)

    @pandas_udf("double")
    def crunch(x: pd.Series) -> pd.Series:
        v = x.to_numpy(dtype=np.float64)
        for _ in range(50):
            v = np.sqrt(v * v + 1.0)
        return pd.Series(v)

    spark.range(0, 20_000_000, 1, 2 * cpus).select(F.sum(crunch("id"))).collect()
    t0 = time.time()
    spark.range(0, 100_000_000, 1, 2 * cpus).select(F.sum(crunch("id"))).collect()
    print(f"PYUDF cpus={cpus}: {time.time() - t0:.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
