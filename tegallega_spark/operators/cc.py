"""Connected components over a pair graph — dedup-cluster construction.

Near-duplicate detection (MinHash / SimHash / exact-jaccard, operators/dedup.py)
emits PAIRS; a training-data pipeline needs CLUSTERS so it can keep one
canonical document per group (the reference's A1 "first wins" generalized to
transitive similarity: if A~B and B~C, all three are one cluster even when
A~C was never emitted).

Algorithm: iterative min-label propagation.  Every node starts labeled with
its own id; each round every node takes the min of its label and its
neighbors' labels; converged when no label changes.  Rounds needed = graph
diameter, and each round is ONE shuffle join keyed on node id.

Scale notes (100 TB):
- Dedup-similarity graphs are overwhelmingly short chains and small blobs
  (diameter ≤ ~5), so diameter-bounded propagation is the right trade — the
  O(log n)-round large-star/small-star variant (Kiveris et al., "Connected
  Components in MapReduce and Beyond") only wins on adversarially long
  chains.
- `localCheckpoint` after every round truncates lineage; without it the plan
  doubles per iteration and the driver OOMs on plan serialization long
  before the executors break a sweat.
- The convergence check is a count() of changed labels — one cheap action
  per round on an already-materialized (checkpointed) frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from tegallega_spark.session import CheckpointHandle, attach_intermediates


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label each node of an undirected pair graph with min(node id) of its
    component.

    Parameters
    ----------
    edges : DataFrame with two id columns (any orderable type); treated as
        undirected.  Isolated nodes (no edges) are not represented — callers
        that want singleton clusters union them in afterwards.
    Returns DataFrame(node, cluster_id).
    """
    und = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    und = und.union(und.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct()
    und = und.localCheckpoint()
    und_h = CheckpointHandle(und)

    labels = (
        und.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    labels_h = CheckpointHandle(labels)

    n_changed = 0
    for _ in range(max_iter):
        # min label among each node's neighbors, one shuffle keyed on node
        nbr_min = (
            und.join(labels.select(F.col("node").alias("s"), "label"), "s")
            .groupBy(F.col("d").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        proposed = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
                (F.coalesce("nbr_label", "label") < F.col("label")).alias("changed"),
            )
            .localCheckpoint()  # eager: materialized before the line below
        )
        # the superseded round's checkpoint is dead the moment its
        # successor materializes — free it NOW, not at ContextCleaner's
        # leisure (a 20-round run would otherwise hold 20 generations of
        # the full label set in block storage simultaneously)
        labels_h.unpersist()
        labels_h = CheckpointHandle(proposed)
        n_changed = proposed.filter("changed").count()
        labels = proposed.drop("changed")
        if n_changed == 0:
            break

    if n_changed:
        und_h.unpersist()
        labels_h.unpersist()
        # Returning unconverged labels would silently split one dup cluster
        # into several "canonical" near-duplicates downstream — fail loudly.
        raise RuntimeError(
            f"connected_components did not converge in max_iter={max_iter} "
            f"rounds ({n_changed} labels still changing); the graph diameter "
            "exceeds max_iter — raise it"
        )

    und_h.unpersist()  # only the final label set outlives the loop
    out = labels.select("node", F.col("label").alias("cluster_id"))
    out._tegallega_persisted = [labels_h]
    return out


def dedup_cluster_assignments(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Cluster assignment + size from a near-duplicate pair list.

    Returns DataFrame(doc_id, cluster_id, cluster_size) for every doc that
    appears in at least one pair; cluster_id = min doc id of the component,
    so `doc_id == cluster_id` marks the canonical keeper.
    """
    comp = connected_components(pairs, src=id_a, dst=id_b)
    sizes = comp.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return attach_intermediates(
        comp.join(sizes, "cluster_id").select(
            F.col("node").alias("doc_id"), "cluster_id", "cluster_size"
        ),
        comp,
    )
