"""Deterministic shuffle-shard export: reproducibility across input
partitionings, epoch independence, shard balance, and the pure-function
shard-membership contract."""

from __future__ import annotations

import glob
import re

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from tegallega_spark.operators.export import shuffled_shards, write_training_shards
from tegallega_spark.session import load_table
from tests.conftest import SF_SMOKE


def _shard_contents(path):
    """{shard: (doc_id, ...)} in file order; asserts one file per shard."""
    out = {}
    for d in glob.glob(f"{path}/__shard=*"):
        shard = int(re.search(r"__shard=(\d+)", d).group(1))
        files = glob.glob(f"{d}/*.parquet")
        assert len(files) == 1, f"shard {shard} split across {len(files)} files"
        out[shard] = tuple(
            pq.read_table(files[0], columns=["doc_id"]).column("doc_id").to_pylist()
        )
    return out


def test_shuffle_is_reproducible_across_input_partitioning(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    write_training_shards(docs.repartition(3), "doc_id", a, n_shards=4, seed=7)
    write_training_shards(docs.repartition(17), "doc_id", b, n_shards=4, seed=7)
    sa, sb = _shard_contents(a), _shard_contents(b)
    assert sorted(sa) == sorted(sb) == [0, 1, 2, 3]
    assert sa == sb  # same shards, same order, regardless of input layout


def test_shard_membership_is_pure_function_of_key(spark, tmp_path):
    """The written shard of every row must equal the closed-form
    (unsigned-top-32-bits * n >> 32) bucket of xxhash64(id, seed) —
    membership depends on the key alone, never on sampling or layout."""
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    path = str(tmp_path / "p")
    write_training_shards(docs, "doc_id", path, n_shards=8, seed=3)
    expected = {
        r.doc_id: (((r.k + 2**64) % 2**64) >> 32) * 8 >> 32
        for r in docs.select(
            "doc_id", F.xxhash64("doc_id", F.lit(3)).alias("k")
        ).collect()
    }
    for shard, ids in _shard_contents(path).items():
        for doc_id in ids:
            assert expected[doc_id] == shard


def test_different_seed_reshuffles(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    a = str(tmp_path / "s0")
    b = str(tmp_path / "s1")
    write_training_shards(docs, "doc_id", a, n_shards=4, seed=0)
    write_training_shards(docs, "doc_id", b, n_shards=4, seed=1)
    sa, sb = _shard_contents(a), _shard_contents(b)
    assert sa != sb  # a new epoch order...
    assert sorted(x for s in sa.values() for x in s) == sorted(
        x for s in sb.values() for x in s
    )


def test_shards_are_balanced_and_complete(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    n = docs.count()
    sh = shuffled_shards(docs, "doc_id", 4)
    sizes = [r["count"] for r in sh.groupBy("__shard").count().collect()]
    assert len(sizes) == 4
    assert sum(sizes) == n
    assert max(sizes) <= 2 * min(sizes), f"unbalanced shards: {sizes}"
