"""Training-data export: deterministic global shuffle into N shards.

Training runs want the corpus in a shuffled order that is (a) uniform,
(b) reproducible bit-for-bit across re-runs and cluster sizes, and
(c) written as N similar-sized shards that loaders can stream
independently.  Spark's `ORDER BY rand()` fails (b); `repartition(N)`
fails (b) and gives no intra-shard order at all.

The deterministic recipe: shuffle key = xxhash64(id, seed).  Range-
partitioning on the key makes shard boundaries a pure function of the key
distribution (sampled exchange — no single-partition sort), and sorting
within each shard by the same key fixes the intra-shard order.  Changing
`seed` is a fresh epoch-level reshuffle; same seed ⇒ identical shards no
matter how the input was partitioned.

At 100 TB this is exactly one shuffle of the dataset — the same cost as
any repartition — and the sampled range exchange keeps shard sizes
balanced even when id distributions are lumpy.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["shuffled_shards", "write_training_shards"]


def shuffled_shards(
    df: DataFrame, id_col: str, n_shards: int, seed: int = 0
) -> DataFrame:
    """The shuffled layout as a DataFrame (no write): rows range-
    partitioned and ordered by the deterministic shuffle key, with the key
    kept as `__shuffle_key` for verification/debugging."""
    keyed = df.withColumn("__shuffle_key", F.xxhash64(F.col(id_col), F.lit(seed)))
    return keyed.repartitionByRange(n_shards, "__shuffle_key").sortWithinPartitions(
        "__shuffle_key"
    )


def write_training_shards(
    df: DataFrame, id_col: str, path: str, n_shards: int, seed: int = 0
) -> None:
    """Write the deterministic shuffle as n_shards parquet files (one file
    per range partition)."""
    shuffled_shards(df, id_col, n_shards, seed).drop("__shuffle_key").write.mode(
        "overwrite"
    ).parquet(path)
