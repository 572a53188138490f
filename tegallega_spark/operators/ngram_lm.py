"""N-gram language-model perplexity scoring for corpus quality filtering.

Method (public literature: the CCNet pipeline — Wenzek et al., "CCNet:
Extracting High Quality Monolingual Datasets from Web Crawl Data",
arXiv:1911.00359 — filters documents by LM perplexity; KenLM there, an
add-alpha-smoothed word-bigram model here, which keeps every stage a
DataFrame count/join and the whole contract SQL-expressible):

    p(w2 | w1) = (c(w1,w2) + alpha) / (c(w1) + alpha * V)

where c(w1) is the CONTEXT count (bigrams starting with w1, so the
distribution normalizes), V the vocabulary size including <unk>, and
words below `min_count` map to <unk> first (the OOV convention).  A
document's score is its mean negative log-probability over bigrams —
low = fluent/in-domain, high = gibberish — the exact quantity CCNet
thresholds into head/middle/tail buckets.

Scale shape: training is two map-side-combinable counts (tokens,
bigrams) — the same single-exchange shape as bpe.word_counts; scoring
joins each doc's bigrams against the model tables.  The model is
vocabulary-bounded (Heaps' law), so both model joins broadcast at any
corpus scale; token→<unk> mapping broadcasts the vocab the same way.
Nothing quadratic, nothing driver-side except the scalar V.
"""

from __future__ import annotations

from typing import NamedTuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["BigramLM", "train_bigram_lm", "perplexity_score"]

UNK = "<unk>"


class BigramLM(NamedTuple):
    """bigrams: (w1, w2, c12); contexts: (w1, c1); vocab: (word,);
    vocab_size includes <unk>; alpha is the smoothing mass.
    train_df/train_cols/doc_bigrams record the persisted unk-mapped
    (__id, w1, w2) frame training derived its counts from, so scoring the
    SAME frame reuses it instead of re-running the corpus tokenize +
    vocab joins a second time (identity-gated: scoring any other frame
    recomputes)."""

    bigrams: DataFrame
    contexts: DataFrame
    vocab: DataFrame
    vocab_size: int
    alpha: float
    train_df: DataFrame | None = None
    train_cols: tuple | None = None
    doc_bigrams: DataFrame | None = None


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) for every adjacent token pair — arrays_zip of the
    token array against itself shifted by one, all JVM-side."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    n = F.size(toks)
    return (
        df.select(F.col(id_col).alias("__id"), toks.alias("__t"), n.alias("__n"))
        .filter(F.col("__n") >= 2)
        .select(
            "__id",
            F.explode(
                F.arrays_zip(
                    F.slice("__t", 1, F.col("__n") - 1).alias("w1"),
                    F.slice("__t", 2, F.col("__n") - 1).alias("w2"),
                )
            ).alias("__bg"),
        )
        .select("__id", F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))
    )


def _unk_map(bg: DataFrame, vocab: DataFrame) -> DataFrame:
    """Map out-of-vocabulary words to <unk> on both bigram slots via two
    broadcast left joins (the vocab is language-bounded)."""
    v1 = F.broadcast(vocab.select(F.col("word").alias("w1"), F.lit(1).alias("__in1")))
    v2 = F.broadcast(vocab.select(F.col("word").alias("w2"), F.lit(1).alias("__in2")))
    return (
        bg.join(v1, "w1", "left")
        .join(v2, "w2", "left")
        .select(
            "__id",
            F.when(F.col("__in1").isNull(), F.lit(UNK)).otherwise(F.col("w1")).alias("w1"),
            F.when(F.col("__in2").isNull(), F.lit(UNK)).otherwise(F.col("w2")).alias("w2"),
        )
    )


def train_bigram_lm(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    alpha: float = 0.1,
) -> BigramLM:
    """Count-based smoothed bigram LM from the corpus.  Two single-
    exchange aggregates (token counts → vocab; bigram counts after <unk>
    mapping) plus one derived context-count aggregate."""
    tokens = (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    # the model tables are vocabulary-bounded — persist them so scoring
    # (and repeated scoring calls) reuse the trained counts instead of
    # re-scanning the corpus per consumer; the driver-side V count
    # doubles as the materialization action for vocab
    vocab = tokens.filter(F.col("c") >= min_count).select("word").persist()
    vocab_size = vocab.count() + 1  # V = in-vocab types + <unk>

    # persist the unk-mapped per-doc bigram frame: the model counts AND a
    # same-frame scoring pass both read it, saving scoring a second full
    # corpus tokenize + vocab-join pass (identical row multiset, so
    # results are unchanged)
    bg = _unk_map(_doc_bigrams(df, id_col, text_col), vocab).persist()
    bigrams = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12")).persist()
    contexts = bigrams.groupBy("w1").agg(F.sum("c12").alias("c1"))
    return BigramLM(
        bigrams, contexts, vocab, vocab_size, alpha,
        train_df=df, train_cols=(id_col, text_col), doc_bigrams=bg,
    )


def perplexity_score(
    df: DataFrame,
    lm: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, n_bigrams, avg_nll): mean negative ln p(w2|w1) per doc.
    Docs with fewer than 2 tokens have no bigrams and are absent (the
    caller decides their fate — CCNet drops them).  Unseen bigrams get
    the smoothed floor alpha/(c1 + alpha*V); unseen contexts degrade to
    the uniform 1/V — both from the same formula with zero counts, no
    special cases."""
    if (
        lm.doc_bigrams is not None
        and df is lm.train_df
        and (id_col, text_col) == lm.train_cols
    ):
        bg = lm.doc_bigrams  # persisted by train_bigram_lm — one pass total
    else:
        bg = _unk_map(_doc_bigrams(df, id_col, text_col), lm.vocab)
    scored = (
        bg.join(F.broadcast(lm.bigrams), ["w1", "w2"], "left")
        .join(F.broadcast(lm.contexts), "w1", "left")
        .select(
            "__id",
            (
                -F.log(
                    (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(lm.alpha))
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(lm.alpha * lm.vocab_size))
                )
            ).alias("nll"),
        )
    )
    out = scored.groupBy("__id").agg(
        F.count("*").alias("n_bigrams"), F.avg("nll").alias("avg_nll")
    ).select(F.col("__id").alias(id_col), "n_bigrams", "avg_nll")
    # ride the persisted model tables out for release_intermediates
    from tegallega_spark.session import attach_intermediates

    sources = [lm.vocab, lm.bigrams]
    if lm.doc_bigrams is not None:
        sources.append(lm.doc_bigrams)
    return attach_intermediates(out, *sources)
