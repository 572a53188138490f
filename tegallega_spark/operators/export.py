"""Training-data export: deterministic global shuffle into N shards.

Training runs want the corpus in a shuffled order that is (a) uniform,
(b) reproducible bit-for-bit across re-runs, input layouts, and cluster
sizes, and (c) written as N similar-sized shards that loaders can stream
independently.  Spark's `ORDER BY rand()` fails (b); `repartition(N)`
fails (b) and gives no intra-shard order at all.

The deterministic recipe: shuffle key = xxhash64(id, seed), and
**shard = fixed equal-width bucket of the key** — shard(key) =
(top 32 bits of key as unsigned) * n_shards >> 32.  Pure integer math on
the key alone, so shard membership is a function of (id, seed, n_shards)
and nothing else.  An earlier version used repartitionByRange on the key;
its boundaries come from per-partition reservoir sampling, so rows near a
boundary could change shards with the input's split layout once data
exceeds the sample — exactly the nondeterminism this module exists to
rule out.  Sorting within each shard by the same key fixes the intra-shard
order; xxhash64 is uniform, so equal-width buckets stay balanced.

At 100 TB this is exactly one hash shuffle of the dataset — the same cost
as any repartition — with no sampling pass at all (the range exchange
needed one).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["shard_of", "shuffled_shards", "write_training_shards"]


def shard_of(key_col, n_shards: int):
    """Equal-width int64 bucket of an xxhash64 key: treat the key as
    unsigned, take the top 32 bits, scale to [0, n_shards).  Exact integer
    arithmetic (no doubles, no sampling) — the same row lands in the same
    shard on any cluster, any input layout."""
    if not 0 < n_shards < 2**30:
        raise ValueError(f"n_shards must be in (0, 2^30), got {n_shards}")
    hi32 = F.shiftrightunsigned(key_col, 32)  # unsigned top half: [0, 2^32)
    return F.shiftrightunsigned(hi32 * F.lit(n_shards), 32)


def shuffled_shards(
    df: DataFrame, id_col: str, n_shards: int, seed: int = 0
) -> DataFrame:
    """The shuffled layout as a DataFrame (no write): one hash exchange on
    the deterministic `__shard` column (all rows of a shard co-locate),
    rows ordered (shard, key) within partitions; `__shuffle_key` and
    `__shard` are kept for verification/debugging."""
    keyed = df.withColumn(
        "__shuffle_key", F.xxhash64(F.col(id_col), F.lit(seed))
    ).withColumn("__shard", shard_of(F.col("__shuffle_key"), n_shards))
    # hash-repartition on the shard id groups each shard into exactly one
    # partition (a partition may host >1 shard; the composite sort keeps
    # shards contiguous so a partitioned write splits them cleanly)
    return keyed.repartition(n_shards, "__shard").sortWithinPartitions(
        "__shard", "__shuffle_key"
    )


def write_training_shards(
    df: DataFrame, id_col: str, path: str, n_shards: int, seed: int = 0
) -> None:
    """Write the deterministic shuffle as `__shard=K/` parquet directories,
    one file per shard (each shard's rows live in a single task), rows in
    shuffle-key order within the file."""
    shuffled_shards(df, id_col, n_shards, seed).drop("__shuffle_key").write.partitionBy(
        "__shard"
    ).mode("overwrite").parquet(path)
