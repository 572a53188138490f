#!/usr/bin/env python
"""Scale-up stress check: replicate the sf0.1 tables N× (key-shifted so
cardinalities grow realistically), run the headline queries at 1× and N×,
and report the wall-clock ratio.  A query whose ratio tracks ≈N (or better,
sublinear for broadcast/top-k shapes) survives scale-up; a superlinear
ratio exposes a shuffle or candidate-space problem.

Usage: python scripts/stress_scale.py [N]          (default 8)
Writes the replicated dataset under /tmp/tegallega_stress_sf (reused if
present for the same N).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tegallega_spark.queries import SPARK_QUERIES  # noqa: E402
from tegallega_spark.scale_data import SHIFT_COLS, replicate_tables  # noqa: E402
from tegallega_spark.session import get_spark, load_table  # noqa: E402

BASE = "/root/testdata/sf0.1"
OUT = "/tmp/tegallega_stress_sf"

QUERIES = [
    "q01_pricing_summary",
    "q04_pii_redaction",
    "q05_region_revenue",
    "q08_argminmax_join",
    "q16_cumsum_offsets",
    "q17_sequence_packing",
    "q22_sessionize",
    "q23_dedup_clusters",
    "q25_decontaminate",
    "q29_stratified_sample",
    "q32_exact_dedup_docs",
    "q35_minhash_neardup",
    "q38_ann_topk",
]


def run(spark, sf_dir: str) -> dict[str, float]:
    timings = {}
    for name in QUERIES:
        t0 = time.perf_counter()
        SPARK_QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("stress-scale")
    spark.sparkContext.setLogLevel("ERROR")
    replicate_tables(spark, BASE, OUT, n)
    # warm both file indexes
    for t in SHIFT_COLS:
        load_table(spark, BASE, t).limit(1).collect()
        load_table(spark, OUT, t).limit(1).collect()
    base = run(spark, BASE)
    big = run(spark, OUT)
    report = {
        q: {
            "t_1x": base[q],
            f"t_{n}x": big[q],
            "ratio": round(big[q] / base[q], 2) if base[q] > 0 else None,
        }
        for q in QUERIES
    }
    print(json.dumps({"replication": n, "queries": report}, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
