"""Bigram-LM perplexity scoring (operators/ngram_lm.py): exact parity
with an independent pure-Python reference, smoothing edge cases, the
fluent-vs-gibberish ordering CCNet's filter depends on, and plan shape
(model joins broadcast)."""

import math
from collections import Counter

import pytest

from tegallega_spark.operators.ngram_lm import (
    UNK,
    perplexity_score,
    train_bigram_lm,
)


def ref_scores(texts: dict[int, str], min_count=2, alpha=0.1):
    """Independent reference: same formula, plain Python."""
    toks = {i: [w for w in t.split() if w] for i, t in texts.items()}
    counts = Counter(w for ws in toks.values() for w in ws)
    vocab = {w for w, c in counts.items() if c >= min_count}
    V = len(vocab) + 1

    def m(w):
        return w if w in vocab else UNK

    c12: Counter = Counter()
    for ws in toks.values():
        for a, b in zip(ws, ws[1:]):
            c12[(m(a), m(b))] += 1
    c1: Counter = Counter()
    for (a, _), c in c12.items():
        c1[a] += c
    out = {}
    for i, ws in toks.items():
        if len(ws) < 2:
            continue
        nlls = [
            -math.log((c12[(m(a), m(b))] + alpha) / (c1[m(a)] + alpha * V))
            for a, b in zip(ws, ws[1:])
        ]
        out[i] = (len(nlls), sum(nlls) / len(nlls))
    return out


def _score(spark, texts, **kw):
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    lm = train_bigram_lm(df, **kw)
    rows = perplexity_score(df, lm).collect()
    return {r.doc_id: (r.n_bigrams, r.avg_nll) for r in rows}, lm


def test_matches_python_reference_exactly(spark):
    texts = {
        1: "the cat sat on the mat",
        2: "the dog sat on the log",
        3: "the cat sat on the log again",
        4: "xyzzy plugh",          # both OOV -> <unk> <unk>
        5: "single",               # < 2 tokens: absent from output
        6: "",                     # empty: absent
    }
    got, _ = _score(spark, texts)
    want = ref_scores(texts)
    assert set(got) == set(want) == {1, 2, 3, 4}
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], rel=1e-12)


def test_real_corpus_parity(spark, sf_dir):
    from tegallega_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(80)
    texts = {r.doc_id: r.text for r in docs.collect()}
    lm = train_bigram_lm(docs)
    got = {
        r.doc_id: (r.n_bigrams, r.avg_nll)
        for r in perplexity_score(docs, lm).collect()
    }
    want = ref_scores(texts)
    assert set(got) == set(want) and want
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], rel=1e-12)


def test_shuffled_and_gibberish_score_worse_than_fluent(spark):
    """The filter's reason to exist: text drawn from the training
    distribution must sit below (better than) both shuffled in-vocab text
    and OOV gibberish.  (No ordering is asserted BETWEEN the two bad
    docs: all-OOV text collapses to <unk>-<unk> bigrams, which a smoothed
    <unk> model can rate as frequent — the known artifact CCNet pairs a
    separate OOV-ratio filter with; quality_score covers that axis
    here.)"""
    base = "the quick brown fox jumps over the lazy dog " * 5
    texts = {i: base for i in range(1, 9)}
    texts[100] = "the quick brown fox jumps over the lazy dog"
    texts[200] = "dog the over lazy jumps quick fox brown the"
    texts[300] = "qwfp zxcv bnml qwfp zxcv arst qwfp neio bnml"
    got, _ = _score(spark, texts)
    assert got[100][1] < got[200][1]
    assert got[100][1] < got[300][1]


def test_unseen_bigram_and_context_smoothing(spark):
    """Score a held-out doc: an unseen bigram of in-vocab words gets the
    smoothed floor; a fully-unseen context degrades toward uniform 1/V —
    both finite, both from the one formula."""
    import pyspark.sql.functions as F  # noqa: F401

    train_texts = {1: "aa bb aa bb aa", 2: "bb aa bb cc bb"}
    df = spark.createDataFrame(list(train_texts.items()), "doc_id long, text string")
    lm = train_bigram_lm(df, min_count=2, alpha=0.5)
    held = spark.createDataFrame([(9, "cc cc")], "doc_id long, text string")
    rows = perplexity_score(held, lm).collect()
    assert len(rows) == 1 and rows[0].n_bigrams == 1
    # reference: cc is in-vocab (appears 2x); bigram (cc,cc) unseen;
    # context cc unseen as a bigram START in training (cc->bb only... )
    toks = [w for t in train_texts.values() for w in t.split()]
    V = len({w for w, c in Counter(toks).items() if c >= 2}) + 1
    c12 = Counter()
    for t in train_texts.values():
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] += 1
    c1 = Counter()
    for (a, _), c in c12.items():
        c1[a] += c
    want = -math.log((c12[("cc", "cc")] + 0.5) / (c1["cc"] + 0.5 * V))
    assert rows[0].avg_nll == pytest.approx(want, rel=1e-12)
    assert math.isfinite(rows[0].avg_nll)


def test_model_joins_broadcast(spark, sf_dir):
    """The vocabulary-bounded model tables must broadcast — a sort-merge
    join on (w1,w2) would shuffle every bigram in a 100 TB corpus."""
    from tegallega_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # force the distributed (scale) shape: the auto gate would take the
    # single-task profile at this input size, which has no joins at all
    lm = train_bigram_lm(docs, single_task=False)
    plan = (
        perplexity_score(docs, lm)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") >= 4  # 2 unk-map + 2 model joins
    assert "SortMergeJoin" not in plan


def test_single_task_matches_distributed_bitwise(spark):
    """r13 single-task profile: the gated one-job counting pass must give
    BIT-identical scores to the distributed train+score (the floats come
    from the same JVM expressions over the same longs).  Edge rows: NULL
    text, empty text, single token, a literal '<unk>' colliding with the
    OOV sentinel, and Java-\\s whitespace variants."""
    import struct

    texts = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "the cat sat on the log again"),
        (4, "xyzzy plugh"),
        (5, "single"),
        (6, ""),
        (7, None),
        (8, "<unk> foo <unk> bar foo"),
        (9, "a\tb\nc\x0bd\x0ce\rf a\tb"),
        (10, "  leading and trailing  "),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")

    def run(st):
        lm = train_bigram_lm(df, min_count=2, alpha=0.1, single_task=st)
        assert lm.small_gate is st
        return sorted(
            (r.doc_id, r.n_bigrams, struct.pack("<d", r.avg_nll).hex())
            for r in perplexity_score(df, lm).collect()
        )

    dist, single = run(False), run(True)
    assert dist and dist == single


def test_single_task_gate_scan_rooted_only(spark, sf_dir):
    """The auto gate must NOT fire for shuffle-origin inputs (their size
    estimates are unreliable) and must fire for a small scan-rooted one."""
    from tegallega_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    assert train_bigram_lm(docs).small_gate is True
    shuffled = docs.repartition(4)
    assert train_bigram_lm(shuffled).small_gate is False
