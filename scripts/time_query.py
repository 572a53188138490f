#!/usr/bin/env python
"""Time individual queries in isolation with the noop sink (guide §1.4),
median of N runs after one warm-up run at the same SF.

Usage: python scripts/time_query.py q59_shortest_path [q23_dedup_clusters ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), RUNS (default 3).
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tegallega_spark.session import get_spark  # noqa: E402
from tegallega_spark.queries import SPARK_QUERIES  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("RUNS", "3"))
    spark = get_spark("time-query")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        q = SPARK_QUERIES[name]
        # warm-up (codegen/JIT/Arrow init), untimed
        spark.catalog.clearCache()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"time {name}")
            t0 = time.perf_counter()
            q(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        print(
            f"{name}: median {statistics.median(samples):.3f}s "
            f"min {samples[0]:.3f} max {samples[-1]:.3f} over {runs}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
