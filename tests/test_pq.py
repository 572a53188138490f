"""Product-quantization ANN: code properties, exact-equality under full
re-rank, and measured recall of the bounded-re-rank scale path."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from tegallega_spark.operators.pq import encode_pq, pq_topk, train_pq_codebooks
from tegallega_spark.operators.similarity import brute_force_topk
from tegallega_spark.session import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")


@pytest.fixture(scope="module")
def codebooks(emb):
    return train_pq_codebooks(emb, m=8, k=16, normalize=True)


def test_codebook_shape_and_determinism(emb, codebooks):
    assert codebooks.shape == (8, 16, 8)
    again = train_pq_codebooks(emb, m=8, k=16, normalize=True)
    assert np.array_equal(codebooks, again)


def test_train_raises_when_sample_smaller_than_k(emb):
    """Fewer sample rows than centroids must fail loudly, not silently
    emit duplicated/degenerate codebooks (ADVICE r2)."""
    with pytest.raises(ValueError, match="rows < k"):
        train_pq_codebooks(emb, m=8, k=16, sample=8)


def test_codes_compress_32x(emb, codebooks):
    enc = encode_pq(emb, codebooks, normalize=True)
    row = enc.first()
    assert len(row.pq_code) == 8  # 8 bytes vs 64 float32 = 32x
    assert all(0 <= c < 16 for c in row.pq_code)
    assert enc.count() == emb.count()


def test_full_rerank_equals_exact(spark, emb, codebooks):
    """re-ranking ALL rows must reproduce brute-force exactly — pins the
    ADC candidate plumbing and the output contract."""
    n = emb.count()
    query = emb.orderBy("vec_id").first().embedding
    enc = encode_pq(emb, codebooks, normalize=True).persist()
    exact = brute_force_topk(emb, query, k=10).collect()
    viapq = pq_topk(
        enc, codebooks, query, k=10, rerank=n, normalize=True
    ).collect()
    assert [r.vec_id for r in viapq] == [r.vec_id for r in exact]
    for a, b in zip(viapq, exact):
        assert abs(a.cos_sim - b.cos_sim) < 1e-12


def test_bounded_rerank_recall(spark, emb, codebooks):
    """The scale path (re-rank 50 of 500 = 10%) must keep high recall@10
    averaged over queries — measured, not assumed."""
    enc = encode_pq(emb, codebooks, normalize=True).persist()
    queries = [r.embedding for r in emb.orderBy("vec_id").limit(5).collect()]
    hits = total = 0
    for q in queries:
        exact = {r.vec_id for r in brute_force_topk(emb, q, k=10).collect()}
        approx = {
            r.vec_id
            for r in pq_topk(enc, codebooks, q, k=10, rerank=50, normalize=True).collect()
        }
        hits += len(exact & approx)
        total += len(exact)
    recall = hits / total
    assert recall >= 0.6, f"recall@10 with 10% rerank = {recall}"


def test_ivfpq_composition(spark, emb, codebooks):
    """IVF pruning + PQ ADC + exact re-rank: with all lists probed and a
    full re-rank this must equal brute force; with real pruning it must
    keep usable recall."""
    from tegallega_spark.operators.ivf import train_ivf_index
    from tegallega_spark.operators.pq import ivfpq_topk

    idx = train_ivf_index(emb, k=8).encode(codebooks, normalize=True)
    n = emb.count()
    query = emb.orderBy("vec_id").first().embedding

    exact = [r.vec_id for r in brute_force_topk(emb, query, k=10).collect()]
    full = [
        r.vec_id
        for r in ivfpq_topk(
            idx, codebooks, query, k=10, nprobe=8, rerank=n, normalize=True
        ).collect()
    ]
    assert full == exact

    pruned = {
        r.vec_id
        for r in ivfpq_topk(
            idx, codebooks, query, k=10, nprobe=4, rerank=50, normalize=True
        ).collect()
    }
    recall = len(set(exact) & pruned) / 10
    assert recall >= 0.5, f"IVF-PQ recall@10 = {recall}"


def test_ivfpq_batch_matches_per_query(spark, emb, codebooks):
    """ivfpq_topk_batch (whole query set as ONE plan) must reproduce the
    per-query ivfpq_topk results EXACTLY for the same (nprobe, rerank) —
    both full-probe/full-rerank (≡ brute force) and the pruned
    production shape; tie-breaks are (dist, id) on both paths, so the
    match is deterministic equality, not set overlap."""
    from tegallega_spark.operators.ivf import train_ivf_index
    from tegallega_spark.operators.pq import ivfpq_topk, ivfpq_topk_batch

    idx = train_ivf_index(emb, k=8).encode(codebooks, normalize=True)
    n = emb.count()
    queries = [list(r.embedding) for r in emb.orderBy("vec_id").limit(3).collect()]

    for nprobe, rerank in ((8, n), (4, 50)):
        batch = ivfpq_topk_batch(
            idx, codebooks, queries, k=10, nprobe=nprobe, rerank=rerank,
            normalize=True,
        ).collect()
        got: dict[int, list] = {}
        for r in batch:
            got.setdefault(r.qid, []).append((r.vec_id, r.cos_sim))
        assert set(got) == {0, 1, 2}
        for qi, q in enumerate(queries):
            solo = ivfpq_topk(
                idx, codebooks, q, k=10, nprobe=nprobe, rerank=rerank,
                normalize=True,
            ).collect()
            b = sorted(got[qi], key=lambda t: (-t[1], t[0]))
            assert [v for v, _ in b] == [r.vec_id for r in solo]
            for (_, cs), r in zip(b, solo):
                assert abs(cs - r.cos_sim) < 1e-12


def test_sampled_ivf_trainer_assignment_and_determinism(spark, emb):
    """train_ivf_index_sampled (the √N scale path, r8): every vector's
    ivf_list must be the true argmin over the trained centroids (the
    Arrow GEMM assignment re-derived with plain numpy), training must be
    deterministic, and the sampled index must plug into the existing
    search/recall machinery unchanged."""
    from tegallega_spark.operators.ivf import (
        auto_k_lists,
        train_ivf_index_sampled,
    )

    idx = train_ivf_index_sampled(emb, k=8)
    rows = idx.assigned.select("vec_id", "embedding", "ivf_list").collect()
    c = np.asarray(idx.centroids, dtype=np.float64)
    for r in rows:
        x = np.asarray(r.embedding, dtype=np.float64)
        assert r.ivf_list == int(((c - x[None, :]) ** 2).sum(axis=1).argmin())

    again = train_ivf_index_sampled(emb, k=8)
    assert idx.centroids == again.centroids
    again.assigned.unpersist()

    # full-probe search over the sampled index == brute force
    query = emb.orderBy("vec_id").first().embedding
    exact = [r.vec_id for r in brute_force_topk(emb, query, k=10).collect()]
    got = [r.vec_id for r in idx.search(query, k=10, nprobe=8).collect()]
    assert got == exact
    idx.assigned.unpersist()

    # the √N law and its clamps
    assert auto_k_lists(100) == 16
    assert auto_k_lists(1_000_000) == 1000
    assert auto_k_lists(4_000_000) == 2000
    assert auto_k_lists(10**9) == 4096


def test_sampled_ivf_trainer_raises_when_sample_below_k(emb):
    from tegallega_spark.operators.ivf import train_ivf_index_sampled

    with pytest.raises(ValueError, match="rows < k"):
        train_ivf_index_sampled(emb, k=64, sample=8)


def test_sample_prefilter_bit_identical(spark, emb):
    """r9: the hash-cutoff prefilter in _sample_vectors (the fix for
    orderBy().limit() collecting whole partitions at corpus scale) must
    return exactly the same rows as the unfiltered top-N-by-hash path —
    the filter only narrows the sort input, never changes the winners."""
    from tegallega_spark.operators.ivf import _sample_vectors

    n = emb.count()
    sample = max(8, n // 16)  # small fraction → prefilter path fires
    for salt in (0, 1):
        filtered = _sample_vectors(emb, "embedding", sample, salt, n=n)
        full = _sample_vectors(emb, "embedding", sample, salt, n=None)
        assert np.array_equal(filtered, full)


def test_kmeans_blas_chunked_assignment_matches_monolithic():
    """ADVICE r9: the chunked assignment step (peak memory O(chunk·k)
    instead of a monolithic (n, k) float64 matrix — the N²/1024-byte
    driver-OOM cliff at semdedup's unclamped k ∝ N) must be bit-identical
    to the monolithic path, including the empty-cluster farthest-point
    re-seed that consumes the per-row min distances."""
    from tegallega_spark.operators.ivf import _kmeans_blas

    rng = np.random.default_rng(3)
    x = rng.normal(size=(500, 12))
    # duplicate the first row many times so first-k init starts with
    # coincident centroids → empty clusters → the re-seed path runs
    x[:40] = x[0]
    mono = _kmeans_blas(x, 16, 6, chunk=10**9)
    chunked = _kmeans_blas(x, 16, 6, chunk=37)  # ragged, < n
    assert np.array_equal(mono, chunked)
