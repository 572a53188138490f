"""N× replication of the synthetic tables — the shared scale-up fixture.

Key columns shift per copy so cardinalities grow with volume (a 4× corpus
has 4× the orders, not 4 copies of each order), and document text is
perturbed per copy so the dedup family sees near- not exact duplicates
across replicas.  Used by bench.py's secondary scale point and
scripts/stress_scale.py, so scale regressions show up in the driver's
per-round BENCH file, not only in ad-hoc race scripts.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from tegallega_spark.session import load_table

# id columns to shift per copy so key cardinality scales with volume
SHIFT_COLS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": [],
    "region": [],
}


def replicate_tables(spark, base: str, out: str, n: int) -> None:
    """Write an n× key-shifted replica of every table under `out`;
    idempotent via a completion marker keyed on (base, n)."""
    tag = base.rstrip("/").replace("/", "_")
    marker = os.path.join(out, f".complete_{tag}_{n}")
    if os.path.exists(marker):
        return
    os.makedirs(out, exist_ok=True)
    for table, shift_cols in SHIFT_COLS.items():
        df = load_table(spark, base, table)
        if not shift_cols:
            replicated = df
        else:
            shift = int(1e9)
            copies = []
            for i in range(n):
                c = df
                for col in shift_cols:
                    c = c.withColumn(col, F.col(col) + F.lit(i * shift))
                if table == "documents":
                    # perturb text so copies are near- not exact duplicates
                    c = c.withColumn(
                        "text", F.concat(F.col("text"), F.lit(f" replica{i}"))
                    )
                copies.append(c)
            replicated = copies[0]
            for c in copies[1:]:
                replicated = replicated.unionByName(c)
        replicated.write.mode("overwrite").parquet(os.path.join(out, f"{table}.parquet"))
    # a memoized plan for `out` from before this rewrite would hold the
    # OLD part-file listing — drop any such entries
    from tegallega_spark.session import invalidate_table_cache

    invalidate_table_cache(spark, out)
    open(marker, "w").close()
