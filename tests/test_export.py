"""Deterministic shuffle-shard export: reproducibility across input
partitionings, epoch independence, and shard balance."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from tegallega_spark.operators.export import shuffled_shards, write_training_shards
from tegallega_spark.session import load_table
from tests.conftest import SF_SMOKE


def _shard_contents(path):
    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        out.append(tuple(pq.read_table(f, columns=["doc_id"]).column("doc_id").to_pylist()))
    return out


def test_shuffle_is_reproducible_across_input_partitioning(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    write_training_shards(docs.repartition(3), "doc_id", a, n_shards=4, seed=7)
    write_training_shards(docs.repartition(17), "doc_id", b, n_shards=4, seed=7)
    sa, sb = _shard_contents(a), _shard_contents(b)
    assert len(sa) == len(sb) == 4
    assert sa == sb  # same shards, same order, regardless of input layout


def test_different_seed_reshuffles(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    a = str(tmp_path / "s0")
    b = str(tmp_path / "s1")
    write_training_shards(docs, "doc_id", a, n_shards=4, seed=0)
    write_training_shards(docs, "doc_id", b, n_shards=4, seed=1)
    sa, sb = _shard_contents(a), _shard_contents(b)
    assert sa != sb  # a new epoch order...
    assert sorted(x for s in sa for x in s) == sorted(x for s in sb for x in s)


def test_shards_are_balanced_and_complete(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    n = docs.count()
    sh = shuffled_shards(docs, "doc_id", 4)
    sizes = [
        r["count"] for r in sh.groupBy(F.spark_partition_id()).count().collect()
    ]
    assert sum(sizes) == n
    assert max(sizes) <= 2 * min(sizes), f"unbalanced shards: {sizes}"
