"""Streaming near-duplicate detection: MinHash-LSH banding as a stateful
stream.

The batch path (operators/dedup.py) bands MinHash signatures and
self-joins band buckets.  On a stream there is nothing to self-join —
instead each LSH bucket becomes a KEYED STATE CELL: the state for
(band_idx, band_hash) holds the doc ids previously seen in that bucket,
and a new arrival emits one candidate pair per stored id.  The union over
bands of the emitted pairs is EXACTLY the batch banded-LSH candidate set
(test-pinned parity), so downstream exact-verification (batch
exact_jaccard_for_pairs, or a per-pair check) keeps the same contract:
streamed-candidates ⊇ true near-dups with the standard banding recall.

Scale/state bound: bucket state holds ids from the configured retention
horizon only (`max_ids` newest per bucket) — a replay/dup detector for
ingestion, where a near-dup beyond the horizon is someone else's
compaction problem (same trade as dedup_stream's watermark).  Hot buckets
(template shingles) cap at max_ids, turning the O(bucket²) pair blowup the
batch path also guards against into a hard bound.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from tegallega_spark.operators.dedup import (
    exact_jaccard_for_pairs,
    make_band_hash_udf,
)
from tegallega_spark.session import release_intermediates

PAIR_SCHEMA = "id_a bigint, id_b bigint, band_idx int"
STATE_SCHEMA = "ids array<bigint>"


def _make_bucket_matcher(max_ids: int):
    def _match(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        ids: list[int] = list(state.get[0]) if state.exists else []
        # membership mirror of `ids`: the list scan was O(max_ids) per
        # arrival — a 1024-deep hot bucket paid a kiloscan per doc
        seen = set(ids)
        band_idx = key[0]
        out = []
        for pdf in pdfs:
            # deterministic arrival order inside a batch: by doc id
            for doc_id in sorted(int(x) for x in pdf["doc_id"]):
                if doc_id in seen:
                    continue
                for prev in ids:
                    a, b = (prev, doc_id) if prev < doc_id else (doc_id, prev)
                    out.append((a, b, band_idx))
                ids.append(doc_id)
                seen.add(doc_id)
                if len(ids) > max_ids:
                    seen.difference_update(ids[:-max_ids])
                    ids = ids[-max_ids:]
        state.update((ids,))
        if out:
            yield pd.DataFrame(out, columns=["id_a", "id_b", "band_idx"])

    return _match


def neardup_candidates_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    max_ids_per_bucket: int = 1024,
) -> DataFrame:
    """(id_a, id_b, band_idx) candidate pairs; distinct (id_a, id_b) over
    the stream equals the batch `_pairs_from_band_hashes` candidate set for
    the same corpus (while bucket state stays within max_ids_per_bucket).
    """
    bh_udf = make_band_hash_udf(shingle_n, num_hashes, bands)
    banded = docs.select(
        F.col(id_col).alias("doc_id"), bh_udf(F.col(text_col)).alias("__bh")
    ).select("doc_id", F.posexplode("__bh").alias("band_idx", "band_hash"))
    return banded.groupBy("band_idx", "band_hash").applyInPandasWithState(
        _make_bucket_matcher(max_ids_per_bucket),
        outputStructType=PAIR_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def verified_neardup_sink(
    candidates: DataFrame,
    corpus,
    out_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    jaccard_threshold: float = 0.7,
    available_now: bool = True,
):
    """Compose the candidate stream with EXACT Jaccard verification — the
    same falsifiable contract as the batch path: streamed verified pairs
    equal minhash_near_duplicates_verified on the delivered corpus
    (test-pinned).

    Each micro-batch of LSH candidates is re-scored via
    exact_jaccard_for_pairs against `corpus` — a batch DataFrame of all
    docs landed so far, or a zero-arg callable returning one (a callable
    re-reads the landed table per batch, picking up the delivery that
    produced the candidates).  A candidate pair is emitted in exactly one
    micro-batch (the one where its newer doc first arrives), so per-batch
    verification never double-scores; survivors append to `out_path` as
    (id_a, id_b, jaccard) parquet.  State/scale bounds are inherited from
    neardup_candidates_stream; verification cost is per-candidate, not
    per-corpus (semi-join pushdown in exact_jaccard_for_pairs).

    Returns the started StreamingQuery.
    """

    def _verify(batch_df, batch_id):
        pairs = batch_df.select("id_a", "id_b").dropDuplicates(["id_a", "id_b"])
        base = corpus() if callable(corpus) else corpus
        verified = exact_jaccard_for_pairs(pairs, base, id_col, text_col, shingle_n)
        out = verified.filter(F.col("jaccard") >= jaccard_threshold)
        out.write.mode("append").parquet(out_path)
        release_intermediates(verified)

    writer = (
        candidates.writeStream.foreachBatch(_verify)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
