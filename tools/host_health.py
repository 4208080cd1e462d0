"""Go/no-go host check BEFORE a scaling measurement (see BENCH/BASELINE.md).

The sandbox VM runs on a burstable-credit budget whose depth is invisible
to `uptime`/load average: round-3's final 240k attempt launched at load
0.30 and still hit a degraded window (pipeline low leg 7.7k t/s vs its
9.0-9.8k healthy band). What IS predictive: the single-thread probe
wall-times from `tools/cpu_envelope.py`. In that same window they ran
JVM 19.7 s / pandas-UDF 58.4 s against healthy references of 14.8 / 38.9
— 33-50% slow, flagging the degradation BEFORE ~13 minutes of measurement
were spent confirming it.

This tool runs exactly those two single-thread probes (~90 core-seconds,
cheap enough to not meaningfully drain the budget) and prints a verdict:

    python tools/host_health.py
    -> {"jvm_sec": ..., "pyudf_sec": ..., "jvm_ratio": ..., "pyudf_ratio":
        ..., "verdict": "healthy" | "degraded"}

Playbook: only launch `tools/scaling_bench.py` when the verdict is
healthy (both ratios <= 1.15); otherwise idle and re-probe later. The
probe cannot see remaining budget DEPTH (a healthy probe does not
guarantee a 240k wide leg stays un-clamped — round-2 attempt 4 proved
that), but a degraded probe reliably means the measurement is wasted.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

# healthy-window single-thread references (round-1 clean window; the same
# workloads cpu_envelope.py times — keep in sync if its sizes change)
HEALTHY_JVM_SEC = 14.8
HEALTHY_PYUDF_SEC = 38.9
DEGRADED_RATIO = 1.15


def main() -> int:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from kgforge.session import get_spark

    spark = get_spark(app_name="host-health", master="local[1]", shuffle_partitions=2)

    spark.range(0, 10_000_000, 1, 2).select(F.sum(F.xxhash64("id") % 1000)).collect()
    t0 = time.time()
    spark.range(0, 2_000_000_000, 1, 2).select(
        F.sum(F.xxhash64(F.col("id"), F.col("id") + 1) % 1000)
    ).collect()
    jvm_sec = time.time() - t0

    @pandas_udf("double")
    def crunch(x: pd.Series) -> pd.Series:
        v = x.to_numpy(dtype=np.float64)
        for _ in range(50):
            v = np.sqrt(v * v + 1.0)
        return pd.Series(v)

    spark.range(0, 20_000_000, 1, 2).select(F.sum(crunch("id"))).collect()
    t0 = time.time()
    spark.range(0, 100_000_000, 1, 2).select(F.sum(crunch("id"))).collect()
    pyudf_sec = time.time() - t0
    spark.stop()

    jvm_ratio = jvm_sec / HEALTHY_JVM_SEC
    pyudf_ratio = pyudf_sec / HEALTHY_PYUDF_SEC
    verdict = (
        "healthy" if jvm_ratio <= DEGRADED_RATIO and pyudf_ratio <= DEGRADED_RATIO
        else "degraded"
    )
    print(json.dumps({
        "jvm_sec": round(jvm_sec, 1),
        "pyudf_sec": round(pyudf_sec, 1),
        "jvm_ratio": round(jvm_ratio, 3),
        "pyudf_ratio": round(pyudf_ratio, 3),
        "verdict": verdict,
    }))
    return 0 if verdict == "healthy" else 1


if __name__ == "__main__":
    raise SystemExit(main())
