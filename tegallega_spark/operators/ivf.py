"""IVF (inverted-file) approximate nearest neighbor — the scale path for
similarity search (north star; complements operators/similarity.py).

Structure: k-means coarse quantizer → every vector assigned to its nearest
centroid's list → a query probes only the `nprobe` nearest lists.  At
100 TB the centroid assignment is a parquet partition column, so a query
is a partition-pruned scan of nprobe/k of the data instead of a full pass.

Training uses pyspark.ml KMeans (Catalyst-side features via
array_to_vector, seeded → deterministic).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from tegallega_spark.operators.similarity import cosine


def _to_vec(col):
    from pyspark.ml.functions import array_to_vector

    return array_to_vector(col.cast("array<double>"))


def train_ivf_index(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    seed: int = 42,
) -> "IVFIndex":
    from pyspark.ml.clustering import KMeans

    feat = df.withColumn("__features", _to_vec(F.col(vec_col)))
    model = KMeans(k=k, seed=seed, featuresCol="__features").fit(feat)
    assigned = (
        model.transform(feat)
        .withColumnRenamed("prediction", "ivf_list")
        .drop("__features")
    )
    centroids = [c.tolist() for c in model.clusterCenters()]
    return IVFIndex(assigned, centroids, vec_col)


class IVFIndex:
    """assigned: the input rows + `ivf_list`; centroids: list[list[float]]."""

    def __init__(self, assigned: DataFrame, centroids: list[list[float]], vec_col: str):
        self.assigned = assigned.persist()
        self.centroids = centroids
        self.vec_col = vec_col

    def encode(
        self,
        codebooks,
        code_col: str = "pq_code",
        normalize: bool = False,
    ) -> "IVFIndex":
        """Attach PQ codes to the inverted lists in place (one call, no
        manual reassignment ritual) and return self so
        `train_ivf_index(df).encode(cb)` chains.  After this,
        operators.pq.ivfpq_topk(self, cb, q) works directly."""
        from tegallega_spark.operators.pq import encode_pq

        old = self.assigned
        self.assigned = encode_pq(
            old, codebooks, vec_col=self.vec_col, code_col=code_col, normalize=normalize
        ).persist()
        old.unpersist()
        return self

    def _nearest_lists(self, query_vec: list[float], nprobe: int) -> list[int]:
        import math

        def dist(c):
            return math.sqrt(sum((a - b) ** 2 for a, b in zip(c, query_vec)))

        order = sorted(range(len(self.centroids)), key=lambda i: dist(self.centroids[i]))
        return order[:nprobe]

    def search(
        self,
        query_vec: list[float],
        id_col: str = "vec_id",
        k: int = 10,
        nprobe: int = 4,
    ) -> DataFrame:
        """Cosine top-k over the nprobe nearest inverted lists only."""
        lists = self._nearest_lists(query_vec, nprobe)
        q = F.array(*[F.lit(float(x)) for x in query_vec])
        candidates = self.assigned.filter(F.col("ivf_list").isin(lists))
        scored = candidates.select(
            F.col(id_col),
            F.round(cosine(F.col(self.vec_col).cast("array<double>"), q), 6).alias("cos_sim"),
        )
        return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)

    def recall_against_exact(
        self, query_vec: list[float], id_col: str = "vec_id", k: int = 10, nprobe: int = 4
    ) -> float:
        """Fraction of the exact top-k recovered by the IVF search."""
        from tegallega_spark.operators.similarity import brute_force_topk

        exact = {
            r[id_col]
            for r in brute_force_topk(
                self.assigned, query_vec, id_col, self.vec_col, k
            ).collect()
        }
        approx = {r[id_col] for r in self.search(query_vec, id_col, k, nprobe).collect()}
        return len(exact & approx) / len(exact) if exact else 1.0
