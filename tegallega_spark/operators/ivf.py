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

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf

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


def _kmeans_blas(
    x: np.ndarray, k: int, iters: int, chunk: int = 65536
) -> np.ndarray:
    """Lloyd's with matmul distances: ||x||² - 2x·cᵀ + ||c||² as a BLAS
    GEMM — instead of broadcasting an (n, k, d) tensor (pq._kmeans's
    shape, fine at k=16 subspace codebooks, 32 GB at k≈1400 coarse
    quantizers).  Deterministic first-k init (callers pass a hash-ordered
    sample); empty clusters re-seed from distinct farthest points.

    The assignment step runs in row blocks of `chunk` (ADVICE r8): a
    monolithic (n, k) float64 distance matrix grows ~n·k·8 bytes — with
    semdedup's unclamped k = N/512 and sample = N/16 that is N²/1024
    bytes, ~4 GB per temporary at 2 M vectors and OOM shortly above — a
    silent scale cliff in the component introduced to REMOVE the
    superlinear-training wall.  Chunking caps peak memory at
    O(chunk·k) (~0.5 GB per temporary at k=8192) while the GEMMs stay
    BLAS-sized; only O(n) per-row state (assignments, min-distances)
    persists across chunks."""
    x = np.ascontiguousarray(x, dtype=np.float64)
    n = x.shape[0]
    centroids = x[:k].copy()
    x2 = (x * x).sum(axis=1)
    assign = np.empty(n, dtype=np.int64)
    mind2 = np.empty(n, dtype=np.float64)
    for _ in range(iters):
        c2 = (centroids * centroids).sum(axis=1)
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            d2 = x2[lo:hi, None] - 2.0 * (x[lo:hi] @ centroids.T) + c2[None, :]
            assign[lo:hi] = d2.argmin(axis=1)
            mind2[lo:hi] = np.take_along_axis(
                d2, assign[lo:hi, None], axis=1
            )[:, 0]
        counts = np.bincount(assign, minlength=k)
        sums = np.zeros((k, x.shape[1]))
        np.add.at(sums, assign, x)
        nonempty = counts > 0
        centroids[nonempty] = sums[nonempty] / counts[nonempty][:, None]
        empty = np.flatnonzero(~nonempty)
        if len(empty):
            far = np.argsort(-mind2)
            for rank, j in enumerate(empty):
                centroids[j] = x[far[rank % len(far)]]
    return centroids


def auto_k_lists(n: int) -> int:
    """The standard IVF sizing law: k_lists ≈ √N keeps per-list occupancy
    ≈ √N, so a fixed nprobe/k_lists probe fraction scans O(√N·nprobe)
    rows per query.  Clamped to [16, 4096]: below 16 pruning is
    pointless, above 4096 the centroid table stops being closure-sized
    (4096 × d floats ≈ 2 MB at d=64 — still kilobyte-per-task territory)."""
    return int(np.clip(int(np.sqrt(max(n, 1))), 16, 4096))


def train_ivf_index_sampled(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int | None = None,
    n: int | None = None,
    sample: int | None = None,
    iters: int = 8,
    sample_salt: int = 0,
) -> "IVFIndex":
    """Coarse quantizer trained on a bounded hash-ordered SAMPLE —
    the scale path `train_ivf_index` (full pyspark.ml KMeans) isn't.

    Full KMeans re-scans the corpus every iteration, so growing k_lists
    with N makes the build superlinear (measured: 441 s at 2 M vectors
    with k capped at 256 — the cap that eased the r7 ANN race's recall
    from 0.994 to 0.95 as occupancy doubled).  IVF's own literature
    trains the coarse quantizer on a learning subset (Jégou TPAMI 2011,
    §V — the same practice `train_pq_codebooks` already follows), which
    makes training cost a function of k alone:

    - sample `max(32·k, 8192)` vectors by hash order (deterministic,
      corpus-size-independent — one pruned scan);
    - Lloyd's driver-side with BLAS matmul distances (_kmeans_blas);
    - assign ALL vectors in one Arrow pass (per-batch argmin via GEMM
      against the closure's (k, d) centroid table).

    k=None applies the √N law (`auto_k_lists`); n=None counts the input
    (pass it when the caller already knows — saves an action).
    `sample_salt` draws an INDEPENDENT training sample (and therefore an
    independent centroid set / cell-boundary system) — callers that block
    with two quantizers so boundary-miss events multiply (semdedup r8)
    pass distinct salts; 0 keeps the original deterministic draw.
    """
    if k is None:
        if n is None:
            n = df.count()
        k = auto_k_lists(n)
    if sample is None:
        sample = max(32 * k, 8192)
    h = (
        F.xxhash64(vec_col)
        if not sample_salt
        else F.xxhash64(vec_col, F.lit(sample_salt))
    )
    rows = (
        df.select(F.col(vec_col).alias("v"), h.alias("h"))
        .orderBy("h")
        .limit(sample)
        .collect()
    )
    x = np.array([r.v for r in rows], dtype=np.float64)
    if len(x) < k:
        raise ValueError(
            f"IVF training sample has {len(x)} rows < k={k} lists; "
            "raise `sample` or lower k"
        )
    centroids = _kmeans_blas(x, k, iters)
    assigned = assign_ivf_lists(df, centroids, vec_col)
    return IVFIndex(assigned, [c.tolist() for c in centroids], vec_col)


def assign_ivf_lists(
    df: DataFrame, centroids: "np.ndarray | list[list[float]]",
    vec_col: str = "embedding", list_col: str = "ivf_list",
) -> DataFrame:
    """Nearest-centroid assignment as ONE Arrow pass: the (k, d) table
    rides the closure (≤ MB), each batch is a GEMM + argmin.  At 100 TB
    this is the embarrassingly-parallel half of the build — no shuffle,
    no iteration, scan-partitioned."""
    c = np.ascontiguousarray(centroids, dtype=np.float64)
    c2 = (c * c).sum(axis=1)

    @pandas_udf("int")
    def assign(vs: pd.Series) -> pd.Series:
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vs.to_numpy()])
        d2 = c2[None, :] - 2.0 * (x @ c.T)  # +||x||² is argmin-invariant
        return pd.Series(d2.argmin(axis=1).astype(np.int32))

    return df.withColumn(list_col, assign(F.col(vec_col)))


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
        # numpy, not a python loop: at √N-sized k_lists (thousands) a
        # per-centroid python distance would cost NQ·k·d interpreter ops
        # in the batched path
        c = np.asarray(self.centroids, dtype=np.float64)
        q = np.asarray(query_vec, dtype=np.float64)
        d2 = ((c - q[None, :]) ** 2).sum(axis=1)
        return [int(i) for i in np.argsort(d2, kind="stable")[:nprobe]]

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
