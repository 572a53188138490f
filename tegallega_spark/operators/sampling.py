"""Deterministic hash-based sampling — reproducible subsets of a 100 TB corpus.

`df.sample()` is seed-dependent per partition layout, so the same logical
sample is NOT stable across repartitions, retries, or engine versions.
Training-data pipelines need the opposite: a sample that is a pure function
of the row key, so every rerun (and every other engine auditing the run)
selects the identical rows.

The trick: md5 of the key is a uniform 128-bit value; comparing its hex
PREFIX against a threshold string selects a deterministic fraction
(two hex chars → granularity 1/256).  No shuffle, no sort, no RNG state —
the sample predicate pushes down to a parquet scan filter, which is exactly
what you want when sampling 100 TB: the scan is the only cost.

Stratified variant: a per-stratum threshold (CASE over the stratum column)
up- or down-samples each stratum independently — e.g. cap 'en' at 12.5%
while keeping 50% of a low-resource language.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def hash_bucket(key: Column) -> Column:
    """Two-hex-char deterministic bucket ('00'..'ff') from a row key."""
    return F.substring(F.md5(key.cast("string").cast("binary")), 1, 2)


def hash_sample(df: DataFrame, key: str, threshold: str) -> DataFrame:
    """Keep rows whose md5-prefix bucket sorts below `threshold`.

    threshold: two lowercase hex chars; fraction kept = int(threshold,16)/256.
    """
    return df.filter(hash_bucket(F.col(key)) < threshold)


def stratified_hash_sample(
    df: DataFrame,
    key: str,
    stratum: str,
    thresholds: dict[str, str],
    default_threshold: str,
) -> DataFrame:
    """Per-stratum deterministic sampling; returns input rows + `bucket`.

    thresholds maps stratum value → two-hex-char threshold; strata absent
    from the map use default_threshold.
    """
    thr: Column = F.lit(default_threshold)
    for value, t in sorted(thresholds.items()):
        thr = F.when(F.col(stratum) == value, F.lit(t)).otherwise(thr)
    return df.withColumn("bucket", hash_bucket(F.col(key))).filter(F.col("bucket") < thr)
