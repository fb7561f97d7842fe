"""N-gram language-model and repeated-span operators over a text corpus.

The training-data uses: a smoothed bigram LM scores fluency (docs whose
cross-entropy under the corpus's own bigram statistics is an outlier are
boilerplate or gibberish), and repeated-span detection finds exact n-token
spans shared across documents (the cheap, shuffle-native cousin of
suffix-array substring dedup — Lee et al.'s "Deduplicating Training Data
Makes Language Models Better" motivates removing such spans).

All token/bigram extraction is per-row Catalyst (split + higher-order
functions, zero Python); the statistics are plain groupBy aggregations
with map-side partial counts, so each stage shuffles token-count rows —
never documents. Scoring joins are vocabulary-keyed; at web scale the
unigram/vocab frames are ~millions of rows (broadcastable or
AQE-handled), while the bigram join rides Zipf skew that AQE's skew-join
splitting absorbs (session default, see session.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from iniz_exporters_spark.functions.text import poly_hash, tokens


def doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair; docs with fewer than
    2 tokens contribute nothing."""
    toks = df.select(
        id_col, tokens(text_col).alias("__t")
    ).filter(F.size("__t") >= 2)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("__t") - 1),
        lambda i: F.struct(
            F.element_at(F.col("__t"), i).alias("w1"),
            F.element_at(F.col("__t"), i + 1).alias("w2"),
        ),
    )
    return toks.select(id_col, F.explode(pairs).alias("__p")).select(
        id_col, F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2")
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    round_to: int = 6,
) -> DataFrame:
    """(id, n_bigrams, logprob) — per-doc sum of log2 P(w2|w1) under an
    add-1-smoothed bigram model fit on the corpus itself:
    P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V).

    c(w1) counts w1 as a bigram LEFT (token occurrences minus doc-final
    positions); V is the distinct-token count over all positions. Each
    log-probability is cast to decimal(28,12) before summation so the
    per-doc sum is order-independent and the oracle hash-matches.
    """
    pairs = doc_bigrams(df, id_col, text_col)
    c12 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .agg(F.count_distinct("w").alias("V"))
    )
    logp = F.log2(
        (F.col("c12") + 1).cast("double") / (F.col("c1") + F.col("V"))
    )
    return (
        pairs.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(logp.cast("decimal(28,12)")).cast("decimal(28,12)"),
                round_to,
            )
            .cast("double")
            .alias("logprob"),
        )
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """(span_hash, n_occurrences, n_docs) — hashes of every ``span``-token
    window that appears in at least ``min_docs`` distinct documents.

    The hash is poly_hash of the space-joined window, computed per-row
    inside nested higher-order functions; only (id, hash) rows shuffle to
    the group stage. At corpus scale this is the candidate generator for
    span-level dedup: join the flagged hashes back to trim or drop spans.
    """
    toks = df.select(
        id_col, tokens(text_col).alias("__t")
    ).filter(F.size("__t") >= span)
    hashes = F.transform(
        F.sequence(F.lit(1), F.size("__t") - (span - 1)),
        lambda i: poly_hash(F.array_join(F.slice(F.col("__t"), i, span), " ")),
    )
    return (
        toks.select(id_col, F.explode(hashes).alias("span_hash"))
        .groupBy("span_hash")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct(id_col).alias("n_docs"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def merge_pair_counts(
    df: DataFrame, text_col: str, top_n: int = 20
) -> DataFrame:
    """(pair, cnt, rn) — the ``top_n`` most frequent adjacent character
    pairs inside tokens: the statistic a BPE tokenizer trainer computes to
    pick its next merge. One explode + groupBy (map-side partials); the
    ordered limit plans as TakeOrderedAndProject."""
    toks = df.select(F.explode(tokens(text_col)).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.length("w") - 1),
        lambda i: F.substring(F.col("w"), i, 2),
    )
    counted = (
        toks.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair").asc())
        .limit(top_n)
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("pair").asc())
    return counted.withColumn("rn", F.row_number().over(w))
