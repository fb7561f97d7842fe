"""Document-level curation rules in the Gopher/C4 lineage.

``gopher_quality`` computes the repetition-free subset of the Gopher
rules (Rae et al. 2021, App. A1.1) that the synthetic corpus can
exercise — word count bounds, mean word length bounds, alphabetic-word
fraction, stopword presence — each as a pure Catalyst expression over one
scan: no Python, no shuffle, no UDF. The keep decision compares the
ROUNDED emitted metrics so the boolean is engine-stable.

``oov_rate`` measures each document against a vocabulary frame (top-K
corpus tokens or an external token list): fraction of token occurrences
outside the vocabulary — the tokenizer-coverage statistic a training
pipeline watches when the corpus drifts from the tokenizer's training
distribution. Scale shape: the vocabulary is top-K-sized (broadcast), the
token stream joins against it without shuffling documents, and the per-doc
aggregation combines map-side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from iniz_exporters_spark.pinning import pin

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _words(text: Column) -> Column:
    """Whitespace-delimited words, empties removed (raw words, not the
    lowercased alnum ``tokens`` — Gopher counts words as typed)."""
    return F.filter(
        F.split(F.trim(text), r"\s+"), lambda w: w != F.lit("")
    )


def gopher_quality(
    text: Column,
    min_words: int = 10,
    max_words: int = 100_000,
    min_mean_len: float = 2.0,
    max_mean_len: float = 12.0,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 1,
    round_to: int = 4,
) -> list[Column]:
    """Columns ``n_words, mean_word_len, frac_alpha_words, n_stopwords,
    keep`` implementing the Gopher word-statistics rules."""
    w = _words(text)
    n = F.size(w)
    total_chars = F.aggregate(
        F.transform(w, F.length), F.lit(0), lambda a, x: a + x
    )
    # decimal-space rounding (percentile_agg pattern) so a .xxxx5 quotient
    # rounds identically on both engines
    mean_len = (
        F.round(
            (total_chars.cast("double") / n).cast("decimal(28,6)"), round_to
        )
        .cast("double")
    )
    n_alpha = F.size(F.filter(w, lambda x: x.rlike("[a-zA-Z]")))
    frac_alpha = (
        F.round(
            (n_alpha.cast("double") / n).cast("decimal(28,6)"), round_to
        )
        .cast("double")
    )
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(w),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    keep = (
        n.between(min_words, max_words)
        & mean_len.between(min_mean_len, max_mean_len)
        & (frac_alpha >= min_alpha_frac)
        & (n_stop >= min_stopwords)
    )
    return [
        n.alias("n_words"),
        mean_len.alias("mean_word_len"),
        frac_alpha.alias("frac_alpha_words"),
        n_stop.alias("n_stopwords"),
        keep.alias("keep"),
    ]


def top_k_vocab(
    tokens_df: DataFrame, token_col: str, k: int
) -> DataFrame:
    """The ``k`` most frequent tokens (count desc, token asc tiebreak) —
    a deterministic corpus-derived vocabulary, TakeOrderedAndProject-sized."""
    return (
        tokens_df.groupBy(token_col)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .orderBy(F.col("__cnt").desc(), F.col(token_col).asc())
        .limit(k)
        .select(token_col)
    )


def oov_rate(
    tokens_df: DataFrame,
    id_col: str,
    token_col: str,
    vocab: DataFrame,
    round_to: int = 4,
) -> DataFrame:
    """(id, n_tokens, oov_rate): fraction of token OCCURRENCES outside
    ``vocab``. The vocab side broadcasts; documents never shuffle — only
    (id, token) rows reach the per-doc aggregation, which combines
    map-side."""
    marked = tokens_df.join(
        F.broadcast(vocab.select(F.col(token_col), F.lit(1).alias("__iv"))),
        token_col,
        "left",
    )
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(
            (
                F.sum(
                    F.when(F.col("__iv").isNull(), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1))
            ).cast("decimal(28,6)"),
            round_to,
        )
        .cast("double")
        .alias("oov_rate"),
    )


def dsir_weights(
    pool: DataFrame,
    target: DataFrame,
    id_col: str,
    tokens_col_fn,
    round_to: int = 6,
) -> DataFrame:
    """(id, avg_logratio, n_tokens) — importance weights for Data Selection
    via Importance Resampling (DSIR, Xie et al. 2023 §3, arXiv:2302.03169):
    score each raw-pool doc by the average unigram log-likelihood ratio
    ln(p_target(tok) / p_pool(tok)), add-1 smoothed over the joint vocab.
    High scores = pool docs that look like the target domain; a pipeline
    then samples the pool proportionally to exp(weight) or keeps top-k.

    ``tokens_col_fn(text_col_name) -> Column`` supplies the tokenizer so
    the caller controls the unigram feature space.

    Scale shape: two vocab aggregations (map-side combined, vocab-sized
    results) -> one broadcast join onto the pool's token stream -> one
    groupBy(doc). The pool corpus shuffles once, on the doc id, carrying
    (id, logratio) only; both unigram tables broadcast. The avg goes
    through the engine's decimal-round scheme so weights are stable under
    any partitioning.
    """
    pool_toks = pool.select(
        F.col(id_col), F.explode(tokens_col_fn("text")).alias("tok")
    )
    tgt_toks = target.select(F.explode(tokens_col_fn("text")).alias("tok"))

    pool_freq = (
        pool_toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c_pool"))
    ).transform(pin)
    tgt_freq = tgt_toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c_tgt"))

    # joint vocab with add-1 smoothing: tokens unseen on one side get c=0
    vocab = (
        pool_freq.join(tgt_freq, "tok", "full_outer")
        .select(
            "tok",
            F.coalesce("c_pool", F.lit(0)).alias("c_pool"),
            F.coalesce("c_tgt", F.lit(0)).alias("c_tgt"),
        )
    ).transform(pin)
    totals = vocab.agg(
        F.sum("c_pool").cast("double").alias("n_pool"),
        F.sum("c_tgt").cast("double").alias("n_tgt"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    ratio = vocab.crossJoin(F.broadcast(totals)).select(
        "tok",
        (
            F.log((F.col("c_tgt") + 1) / (F.col("n_tgt") + F.col("v")))
            - F.log((F.col("c_pool") + 1) / (F.col("n_pool") + F.col("v")))
        ).alias("logratio"),
    )
    return (
        pool_toks.join(F.broadcast(ratio), "tok")
        .groupBy(id_col)
        .agg(
            F.round(
                F.avg("logratio").cast("decimal(28,12)"), round_to
            )
            .cast("double")
            .alias("avg_logratio"),
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
        )
    )
