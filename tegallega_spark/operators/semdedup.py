"""SemDeDup-style semantic deduplication over embedding columns.

Method (public literature: Abbas et al., "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication", arXiv:2303.09540):
cluster embeddings with a k-means coarse quantizer, then look for
near-duplicate pairs ONLY within each cluster.  The cluster id plays the
same blocking-key role the band hash plays in MinHash-LSH
(operators/dedup.py) — it turns the O(N²) all-pairs search into
sum-of-squares over bounded buckets, at the documented cost of missing
pairs that straddle a cluster boundary (k_clusters is the recall knob;
SemDeDup uses k ∝ N so clusters stay small).

Spark-first composition — everything reuses existing pieces:
- clustering: `operators/ivf.train_ivf_index` (pyspark.ml KMeans, seeded);
- pair generation: self-equi-join on the cluster id.  Unlike the
  multi-table LSH families each row lives in exactly ONE bucket, so the
  join carries the vectors directly — no bare-id dedup pass, no second
  join to fetch vectors (those exist in all_pairs_above only because a
  row explodes into num_tables buckets there);
- verification: exact cosine on every candidate (same falsifiable
  contract as minhash_near_duplicates_verified);
- keeper selection: `operators/cc.dedup_cluster_assignments` (connected
  components, min-id canonical).

Hot-cluster guard: a degenerate corpus (10⁶ copies of one template) puts
everything in one cluster; all-pairs there is 10¹² join rows.  Clusters
larger than `max_cluster` switch to STAR linking — every member pairs
with the cluster's min id only, O(k) pairs instead of O(k²).  For dedup
(a transitive-closure consumer) the star is exactly as connective when
members truly are near-dups of each other; items NOT similar to the
representative survive (precision kept, recall traded on spam clusters —
the same trade the LSH families make with max_bucket, but without
dropping the bucket)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from tegallega_spark.operators.cc import dedup_cluster_assignments
from tegallega_spark.operators.ivf import train_ivf_index
from tegallega_spark.operators.similarity import cosine
from tegallega_spark.session import attach_intermediates

__all__ = ["semantic_pairs", "semantic_dedup"]


def semantic_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.95,
    k_clusters: int = 16,
    seed: int = 42,
    max_cluster: int = 4096,
) -> DataFrame:
    """Verified near-duplicate pairs (id_a, id_b, cos_sim) with
    cos_sim >= min_cosine, searched within k-means clusters only.

    k_clusters=1 + max_cluster >= N degenerates to exact all-pairs — the
    oracle-parity configuration the tests pin."""
    base = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    if k_clusters == 1:
        # degenerate blocking (exact all-pairs); pyspark.ml KMeans needs k>=2
        assigned = base.withColumn("ivf_list", F.lit(0)).persist()
    else:
        ivf = train_ivf_index(base, vec_col="__v", k=k_clusters, seed=seed)
        assigned = ivf.assigned  # (__id, __v, ivf_list), persisted by IVFIndex

    sizes = assigned.groupBy("ivf_list").agg(F.count("*").alias("__csize"))
    tagged = assigned.join(F.broadcast(sizes), "ivf_list")

    # normal clusters: exact all-pairs within the cluster
    small = tagged.filter(F.col("__csize") <= max_cluster)
    sa = small.select(
        "ivf_list", F.col("__id").alias("id_a"), F.col("__v").alias("vec_a")
    )
    sb = small.select(
        "ivf_list", F.col("__id").alias("id_b"), F.col("__v").alias("vec_b")
    )
    pairs_small = (
        sa.join(sb, "ivf_list")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "vec_a", "vec_b")
    )

    # oversized clusters: star against the min-id representative
    big = tagged.filter(F.col("__csize") > max_cluster)
    reps = (
        big.groupBy("ivf_list")
        .agg(F.min("__id").alias("id_a"))
        .join(
            big.select(
                "ivf_list", F.col("__id").alias("id_a"), F.col("__v").alias("vec_a")
            ),
            ["ivf_list", "id_a"],
        )
    )
    pairs_big = (
        big.select("ivf_list", F.col("__id").alias("id_b"), F.col("__v").alias("vec_b"))
        .join(F.broadcast(reps), "ivf_list")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "vec_a", "vec_b")
    )

    scored = pairs_small.unionByName(pairs_big).select(
        "id_a",
        "id_b",
        cosine(
            F.col("vec_a").cast("array<double>"), F.col("vec_b").cast("array<double>")
        ).alias("cos_sim"),
    )
    return attach_intermediates(
        scored.filter(F.col("cos_sim") >= min_cosine), assigned
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.95,
    k_clusters: int = 16,
    seed: int = 42,
    max_cluster: int = 4096,
) -> DataFrame:
    """Rows of `df` that survive semantic dedup: from every connected
    component of the verified pair graph, the min-id member is kept.
    One left-anti join against the (small) non-canonical set — the corpus
    itself is never shuffled."""
    pairs = semantic_pairs(
        df, id_col, vec_col, min_cosine, k_clusters, seed, max_cluster
    )
    assign = dedup_cluster_assignments(pairs, "id_a", "id_b")
    dupes = assign.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(dupes, id_col, "left_anti")
