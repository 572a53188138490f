"""Sequence packing — concat-then-chunk document → training-sequence layout.

LLM pretraining concatenates documents into fixed-length token sequences
("packs"); a 100 TB corpus needs the pack assignment computed distributed,
deterministically, and without a global sort.  This implements the standard
concat-and-chunk discipline (as in GPT/T5 data pipelines): documents are
laid end-to-end in a deterministic order inside each shard, and a document
belongs to the pack where its first token lands; a document whose tokens
straddle the boundary spills into the next pack (flagged, so the trainer
knows it gets split).

Shape: ONE window (partition by shard, order by the doc key) computes the
running token offset; pack id / offset / spill flag are pure column math on
it.  Shards bound the window partition size, so at 1000 executors each
shard's cumsum runs independently — no global ordering, no single-partition
exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_col: str,
    shard_col: str,
    budget: int = 512,
) -> DataFrame:
    """Assign each document a (shard, pack_id, pack_offset, spills_over).

    pack_offset is the document's start position within its pack;
    spills_over marks documents crossing the pack boundary.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(token_col).over(w) - F.col(token_col)).cast("long")
    return (
        df.withColumn("seq_start", start)
        .withColumn("pack_id", (F.col("seq_start") / budget).cast("long"))
        .withColumn("pack_offset", F.col("seq_start") % budget)
        .withColumn(
            "spills_over", (F.col("pack_offset") + F.col(token_col)) > budget
        )
        .drop("seq_start")
    )
