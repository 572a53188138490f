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
- clustering: bounded-sample Lloyd's (`operators/ivf`) — flat
  (`train_centroids_sampled`) up to TREE_QUANTIZER_MIN_K cells, the
  two-level `TreeQuantizer` above it (r9: with k ∝ N, flat probing is
  O(N·k) = O(N²); the tree probes O(√k·d) per vector and trains in
  O(sample·√k·d), which flattened the measured race curve from N^1.7
  to near-linear).  ONE Arrow pass per quantizer: the distance-ordered
  probe's element 1 is the assignment;
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

import math
import warnings

import pandas as pd  # noqa: F401 — resolved by pandas_udf type-hint inference

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from tegallega_spark.operators.cc import dedup_cluster_assignments
from tegallega_spark.operators.ivf import (
    train_centroids_sampled,
    train_tree_quantizer_sampled,
)
from tegallega_spark.operators.similarity import cosine
from tegallega_spark.session import attach_intermediates

__all__ = ["semantic_pairs", "semantic_dedup", "auto_k_clusters"]

# above this many cells the blocking switches from the flat quantizer to
# the two-level TreeQuantizer: flat probing is O(k·d) per vector, so with
# k ∝ N the blocking pass alone is O(N²/target_cell_size) — measured
# bending the r8 race to N^1.7 (512 k → 149 s, 1 M → 511 s, 2 M →
# 1,704 s).  The tree probes O(√k·d).  1024 keeps every sub-threshold
# configuration byte-identical to the flat path the earlier races pinned.
TREE_QUANTIZER_MIN_K = 1024


def auto_k_clusters(n: int, target_cell_size: int = 512) -> int:
    """SemDeDup's own scaling rule, k ∝ N: enough clusters that the
    EXPECTED cell holds ~target_cell_size vectors, so per-cell quadratic
    work stays constant as the corpus grows.  A fixed k is the scale trap:
    at 100 TB every cell blows past max_cluster and the operator silently
    degrades to all-star linking (recall collapses to similarity-to-the-
    representative).  512 matches the stress race's measured sweet spot
    (~500 vectors/cluster, scripts/stress_semdedup.py)."""
    return max(1, math.ceil(n / target_cell_size))


def _probe_cells_udf(
    centroids: list[list[float]],
    probes: int,
    margin: float | None = None,
    max_probes: int = 16,
):
    """Arrow-vectorized vector → its probed centroid ids.
    One numpy matmul per batch against the (tiny, closure-captured)
    centroid matrix — the same shape as similarity.make_bucket_udf.

    `probes` is the fixed floor (FAISS-style top-p multi-probe).  With
    `margin` = r set (r8), the set EXTENDS to every centroid within
    d_min + r of the vector, capped at max_probes — the radius rule that
    makes blocking PROVABLY lossless for pairs within distance r: for a
    pair (a, b) with ‖a−b‖ ≤ r, take WLOG d_min(b) ≤ d_min(a); b's
    nearest centroid c* satisfies d_a(c*) ≤ d_b(c*) + r = d_min(b) + r ≤
    d_min(a) + r, so c* is in a's probe ball and in b's trivially — they
    share a cell.  Fixed top-p has no such guarantee: near a q-way
    centroid tie, two near-identical vectors can rank the tied centroids
    differently and probe disjoint sets (measured: 2 of 110 961 planted
    pairs at cosine ≥ 0.99 missed at N=1 M with p=2).  The margin only
    adds cells near ties, so the expected probe count stays ≈ p; the cap
    bounds worst-case work (a cap hit degrades to top-max_probes, never
    below top-p)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)  # (k, d)
    c2 = (C * C).sum(axis=1)
    # KMeans may converge to fewer distinct centers than k (e.g. identical
    # inputs) — never ask for more probes than centers exist
    p = min(probes, C.shape[0])
    cap = min(max(max_probes, p), C.shape[0])

    @pandas_udf("array<int>")
    def probe(vs: pd.Series) -> pd.Series:
        X = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        x2 = (X * X).sum(axis=1)
        # TRUE squared distance — the margin rule needs absolute values,
        # not the rank-invariant form
        d2 = np.maximum(x2[:, None] + c2[None, :] - 2.0 * (X @ C.T), 0.0)
        take = cap if margin is not None else p
        if take >= d2.shape[1]:
            idx = np.argsort(d2, axis=1)
        else:
            idx = np.argpartition(d2, take - 1, axis=1)[:, :take]
        # order within the candidate set by actual distance (stable output)
        ordered = np.take_along_axis(
            idx, np.argsort(np.take_along_axis(d2, idx, 1), axis=1), axis=1
        )
        if margin is None:
            return pd.Series([row.tolist() for row in ordered])
        od2 = np.take_along_axis(d2, ordered, axis=1)
        lim = (np.sqrt(od2[:, :1]) + margin) ** 2
        out = []
        for row, rd2, rl in zip(ordered, od2, lim):
            n = max(p, int((rd2 <= rl).sum()))
            out.append(row[:n].tolist())
        return pd.Series(out)

    return probe


def _cell_pairs_kernel(threshold: float):
    """applyInPandas kernel: one cell's vectors → above-threshold pairs.
    Pairwise cosine = normalized-row matmul; upper triangle only; ids
    ordered id_a < id_b."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cos_sim": "float64"}
            )
        X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["__v"]])
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0  # zero vectors → cosine 0, not NaN
        Xn = X / norms
        S = Xn @ Xn.T
        iu, ju = np.triu_indices(n, k=1)
        sims = S[iu, ju]
        keep = sims >= threshold
        ids = pdf["__id"].to_numpy()
        a, b = ids[iu[keep]], ids[ju[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame(
            {"id_a": lo, "id_b": hi, "cos_sim": sims[keep]}
        )

    return fn


def semantic_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.95,
    k_clusters: int | None = None,
    seed: int = 42,
    max_cluster: int = 4096,
    probes: int = 2,
    target_cell_size: int = 512,
    warn_star_fraction: float | None = 0.25,
) -> DataFrame:
    """Verified near-duplicate pairs (id_a, id_b, cos_sim) with
    cos_sim >= min_cosine, searched within k-means cells only.

    `k_clusters=None` (default) sizes the blocking to the corpus:
    auto_k_clusters(count, target_cell_size) — one cheap parquet
    count() buys the k ∝ N scaling the method requires.  Pass an
    explicit k only to pin a specific configuration (k=1 degenerates
    to exact all-pairs — the oracle-parity configuration the tests pin).

    `seed` is a NO-OP since r8: the sampled trainer
    (train_ivf_index_sampled) is deterministic by construction
    (hash-ordered sample, first-k init) and consumes no RNG, so varying
    seed no longer varies the blocking.  The parameter is kept for
    signature stability; passing a non-default value emits a one-time
    warning so callers probing blocking sensitivity learn it's inert.

    `probes` is the boundary-recall knob: each vector blocks into its
    `probes` nearest centroids' cells (FAISS-style multi-probe), so two
    near-identical vectors that land on opposite sides of a k-means
    boundary still share their second-choice cell.  probes=1 is the
    plain SemDeDup assignment; the scale race (scripts/stress_semdedup.py)
    measured it missing ~0.3% of planted pairs at N=8k, which probes=2
    recovers for ~2× candidate work.

    Measured blocking ε (scripts/stress_semdedup.py, planted-pair
    ground truth, dual tree quantizers): probes=2 is planted-exact at
    every raced size up to 4 M, missed exactly 1 of 889,089 planted
    pairs at N=8 M (ε ≈ 1.1·10⁻⁶, reproduced in two serial runs) and 6
    of 1,778,260 at N=16 M (ε ≈ 3.4·10⁻⁶) — zero false positives at
    every size; probes=3 was exact at 8 M for ~1.5× the probes=2 wall.
    Pick probes=2 for the scaling default, probes=3 when the workload
    needs the measured-zero configuration.

    `max_cluster` is measured in TRUE cell population — distinct primary
    (nearest-centroid) members, NOT probe-inflated visitor rows — so a
    cell whose real membership is under the cap keeps full pairwise
    recall even when multi-probe visitors push its row count over.  The
    O(cell²) work bound is enforced separately: a cell whose
    probe-inflated row count exceeds max_cluster*probes star-links
    regardless (worst pairwise work is probes² × the single-probe bound —
    bounded, documented).  When more than `warn_star_fraction` of all
    blocked rows land in star-linked cells, a warning is emitted (one
    tiny aggregate over the persisted assignment) — on a healthy corpus
    with auto-k the fraction is ~0; a high value means the blocking is
    too coarse (raise k / lower target_cell_size) or the corpus is
    template spam.  None disables the check."""
    if seed != 42:
        warnings.warn(
            "semantic_pairs/semantic_dedup: `seed` has been a no-op since "
            "the r8 sampled trainer (deterministic hash-ordered sample); "
            "varying it does not vary the blocking",
            stacklevel=2,
        )
    base = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    n_count = None
    if k_clusters is None:
        n_count = df.count()
        k_clusters = auto_k_clusters(n_count, target_cell_size)
    p = 1
    if k_clusters == 1:
        # degenerate blocking (exact all-pairs); pyspark.ml KMeans needs k>=2
        cells = base.withColumn("__cell", F.lit(0)).persist()
        handles = [cells]
    else:
        # r8: the sample-trained coarse quantizer replaces full pyspark.ml
        # KMeans — with k ∝ N (auto_k_clusters) the full trainer's
        # per-iteration corpus rescans made the BLOCKING step superlinear
        # (the same wall the ANN race hit at 2 M vectors), while blocking
        # quality only needs approximate cells: the exactness contract
        # comes from the verify-every-candidate cosine, not from centroid
        # optimality.  Training is deterministic (hash-ordered sample,
        # first-k init) — `seed` is kept for signature stability but no
        # longer consumed.
        #
        # DUAL-QUANTIZER blocking (r8): two quantizers trained on
        # INDEPENDENT samples (sample_salt) give two independent
        # cell-boundary systems; a pair is blocked together if it shares
        # a probed cell in EITHER.  Fixed top-p probing of ONE quantizer
        # misses a pair when its members rank near-tied centroids
        # oppositely (measured: 2 of 110 961 planted pairs at N=1 M,
        # ~2·10⁻⁵); with independent boundary systems the events
        # multiply (~10⁻¹⁰ per pair) — the same ε-stance as minhash
        # banding, which the exact-parity races then falsify.  (The
        # provably-lossless d_min+r margin probe was measured first and
        # rejected: 64-d distance concentration puts ~70% of ALL
        # centroids inside the margin ball, inflating cells past the
        # star-link guard — see _probe_cells_udf.)  Composite cell id
        # q·width + cell keeps every downstream stage single-key.
        #
        # r9: ONE Arrow pass per quantizer.  The probe output is ordered
        # by distance, so element 1 IS the nearest-cell assignment the
        # star guard's true-population count needs — the separate
        # assign_ivf_lists pass (a second full-corpus GEMM against the
        # same centroid table) was redundant.  And above
        # TREE_QUANTIZER_MIN_K cells the quantizer itself goes
        # hierarchical (O(√k·d) per vector, O(sample·√k·d) training) —
        # together these remove every O(N·k) = O(N²) term from the
        # operator (the r8 verdict's N^1.7 curve item).
        p = min(probes, k_clusters)
        per_q = []
        handles = []
        for salt in (0, 1):
            if k_clusters > TREE_QUANTIZER_MIN_K:
                quant = train_tree_quantizer_sampled(
                    base, vec_col="__v", k=k_clusters, sample_salt=salt,
                    n=n_count,
                )
                width = quant.n_cells
                probe = quant.probe_udf(p)
            else:
                cents = train_centroids_sampled(
                    base, vec_col="__v", k=k_clusters, sample_salt=salt,
                    n=n_count,
                )
                width = k_clusters
                probe = _probe_cells_udf([c.tolist() for c in cents], p)
            probed = base.withColumn("__cells", probe(F.col("__v"))).persist()
            handles.append(probed)
            per_q.append((probed, width))
        # Quantizer-1 cell ids are offset by quantizer-0's width (ADVICE
        # r9: per_q[0][1], not per_q[1][1]) so the composite id spaces
        # cannot collide even if the two quantizers' widths ever diverge.
        cells = per_q[0][0].select(
            "__id", "__v", F.explode("__cells").alias("__cell")
        ).unionByName(
            per_q[1][0]
            .select("__id", "__v", F.explode("__cells").alias("__pc"))
            .select(
                "__id",
                "__v",
                (F.col("__pc") + F.lit(per_q[0][1])).alias("__cell"),
            )
        )

    # Two per-cell counts feed the star decision (VERDICT r4 #7):
    #   __tsize — TRUE population: primary (nearest-centroid) members only.
    #     max_cluster compares against THIS, so the name means what it
    #     says — a cell whose real membership is under the cap never loses
    #     pair recall just because probe visitors inflated its row count.
    #   __csize — probe-inflated rows: what the O(cell²) kernel actually
    #     receives.  A hard work bound of max_cluster*p rows per cell
    #     stays in force (worst quadratic work p² × the p=1 bound), so a
    #     pathologically attractive cell (few primaries, huge visitor
    #     in-flow) still can't trigger runaway pairwise work.
    sizes = cells.groupBy("__cell").agg(F.count("*").alias("__csize"))
    if k_clusters > 1:
        # primaries per COMPOSITE cell: each quantizer's nearest-cell
        # population (probe element 1 — the probe is distance-ordered)
        # under its own id offset
        true_sizes = (
            per_q[0][0]
            .groupBy(F.element_at("__cells", 1).alias("__cell"))
            .agg(F.count("*").alias("__tsize"))
            .unionByName(
                per_q[1][0]
                .groupBy(
                    (F.element_at("__cells", 1) + F.lit(per_q[0][1])).alias(
                        "__cell"
                    )
                )
                .agg(F.count("*").alias("__tsize"))
            )
        )
        # left join: a cell reached only by probes has zero primaries
        sizes = sizes.join(true_sizes, "__cell", "left").na.fill(
            0, subset=["__tsize"]
        )
    else:
        sizes = sizes.withColumn("__tsize", F.col("__csize"))
    star_cond = (F.col("__tsize") > max_cluster) | (
        F.col("__csize") > max_cluster * p
    )
    if warn_star_fraction is not None and k_clusters > 1:
        # one tiny agg over the persisted assignment (KMeans already ran
        # eagerly, so this adds a cache-backed job, not a corpus rescan):
        # the probe-inflated row share landing in star-linked cells
        tot, star = sizes.agg(
            F.sum("__csize"),
            F.sum(F.when(star_cond, F.col("__csize"))),
        ).first()
        frac = (star or 0) / tot if tot else 0.0
        if frac > warn_star_fraction:
            warnings.warn(
                f"semantic_pairs: {frac:.0%} of blocked rows fall in cells "
                f"larger than max_cluster={max_cluster} and will STAR-link "
                "(pair recall degrades to similarity-to-representative in "
                f"those cells). k_clusters={k_clusters} is too coarse for "
                "this corpus — raise it (or lower target_cell_size), or "
                "raise max_cluster if the quadratic work is acceptable.",
                stacklevel=2,
            )
    tagged = cells.join(F.broadcast(sizes), "__cell")

    # normal cells: all pairwise cosines per cell as ONE BLAS matmul inside
    # applyInPandas, emitting only rows >= threshold.  An earlier version
    # expanded candidates as a self-join and scored each row with the
    # interpreted F.aggregate cosine — correct, but the race script
    # measured it ~50× slower than DuckDB's native loop at N=8k: a cell of
    # c vectors is c²/2 interpreted 64-element folds as join ROWS, versus
    # microseconds as a (c×d)@(d×c) matmul.  Pair blowup is impossible by
    # construction (cells are capped at max_cluster).
    small = tagged.filter(~star_cond)
    pairs_small = small.select("__cell", "__id", "__v").groupBy("__cell").applyInPandas(
        _cell_pairs_kernel(min_cosine), "id_a long, id_b long, cos_sim double"
    )

    # oversized cells: star against the min-id representative — O(cell)
    # rows, scored with the same vectorized cosine
    big = tagged.filter(star_cond)
    reps = (
        big.groupBy("__cell")
        .agg(F.min("__id").alias("id_a"))
        .join(
            big.select(
                "__cell", F.col("__id").alias("id_a"), F.col("__v").alias("vec_a")
            ),
            ["__cell", "id_a"],
        )
    )
    pairs_big = (
        big.select("__cell", F.col("__id").alias("id_b"), F.col("__v").alias("vec_b"))
        .join(F.broadcast(reps), "__cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine(
                F.col("vec_a").cast("array<double>"),
                F.col("vec_b").cast("array<double>"),
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= min_cosine)
    )

    scored = pairs_small.unionByName(pairs_big)
    # multi-probe can produce the same pair from two shared cells (scored
    # identically in each) — keep one
    if k_clusters > 1:
        scored = scored.dropDuplicates(["id_a", "id_b"])
    return attach_intermediates(scored, *handles)


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.95,
    k_clusters: int | None = None,
    seed: int = 42,
    max_cluster: int = 4096,
    probes: int = 2,
    target_cell_size: int = 512,
    warn_star_fraction: float | None = 0.25,
) -> DataFrame:
    """Rows of `df` that survive semantic dedup: from every connected
    component of the verified pair graph, the min-id member is kept.
    One left-anti join against the (small) non-canonical set — the corpus
    itself is never shuffled.  The persisted cluster assignment rides out
    on the result (attach_intermediates) so callers can
    release_intermediates(result) once their action has run."""
    pairs = semantic_pairs(
        df, id_col, vec_col, min_cosine, k_clusters, seed, max_cluster,
        probes, target_cell_size, warn_star_fraction,
    )
    assign = dedup_cluster_assignments(pairs, "id_a", "id_b")
    dupes = assign.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return attach_intermediates(df.join(dupes, id_col, "left_anti"), pairs, assign)
