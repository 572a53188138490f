"""Similarity search over embedding columns (array<float>).

North-star extension (BASELINE.json): approximate-nearest-neighbor over the
`embeddings` table.  Two tiers:

- brute-force cosine top-k: exact baseline; F.zip_with/F.aggregate dot
  product, JVM-side, no UDF.  O(N) per query but embarrassingly parallel
  and shuffle-free until the final top-k (a TakeOrdered, not a full sort).
- LSH-bucketed (random hyperplane signs) variant: at 100 TB, brute force
  per query is a full scan; bucketing by sign-pattern restricts candidates
  to colliding buckets.  Deterministic hyperplanes derived from xxhash64 so
  results are reproducible without a stored model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k against one query vector.

    The query vector is a literal array (broadcast into the plan); the scan
    is a single map stage + TakeOrdered — no shuffle of the big table.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        cosine(F.col(vec_col).cast("array<double>"), q).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def _hyperplane_sign(vec: Column, plane_seed: int, dim: int) -> Column:
    """Sign of <vec, h> for a deterministic pseudo-random hyperplane h whose
    component j is xxhash64(plane_seed, j) scaled to [-1, 1]."""
    h = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.xxhash64(F.lit(plane_seed).cast("string"), j.cast("string")) % 10000
        ).cast("double")
        / 10000.0,
    )
    return F.when(dot(vec.cast("array<double>"), h) >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_bucket(vec: Column, dim: int, num_planes: int = 8) -> Column:
    """Random-hyperplane LSH bucket id: the concatenated sign bits."""
    bucket = F.lit(0)
    for p in range(num_planes):
        bucket = bucket * 2 + _hyperplane_sign(vec, p, dim)
    return bucket


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    num_planes: int = 6,
) -> DataFrame:
    """ANN top-k: score only rows whose LSH bucket matches the query's.

    Bucket assignment is a pure column expression, so at scale it can also be
    used as a parquet partition column making the candidate fetch a
    partition-pruned scan instead of a full pass.
    """
    dim = len(query_vec)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    with_bucket = df.select(
        F.col(id_col),
        F.col(vec_col),
        lsh_bucket(F.col(vec_col), dim, num_planes).alias("__bucket"),
    )
    query_bucket = lsh_bucket(q, dim, num_planes)
    candidates = with_bucket.filter(F.col("__bucket") == query_bucket)
    scored = candidates.select(
        F.col(id_col),
        cosine(F.col(vec_col).cast("array<double>"), q).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def all_pairs_above(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.9,
    num_planes: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs: LSH-bucket self-join then exact cosine
    filter.  Returns (id_a, id_b, cos_sim)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    with_bucket = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        lsh_bucket(F.col(vec_col), dim, num_planes).alias("__bucket"),
    )
    a = with_bucket.select(
        F.col("__id").alias("id_a"), F.col("__vec").alias("vec_a"), "__bucket"
    )
    b = with_bucket.select(
        F.col("__id").alias("id_b"), F.col("__vec").alias("vec_b"), "__bucket"
    )
    pairs = a.join(b, "__bucket").filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a",
        "id_b",
        cosine(F.col("vec_a").cast("array<double>"), F.col("vec_b").cast("array<double>")).alias("cos_sim"),
    )
    return scored.filter(F.col("cos_sim") >= min_cosine)
