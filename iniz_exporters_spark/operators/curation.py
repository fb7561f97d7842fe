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
