"""Text-relevance ranking operators: TF-IDF, BM25, inverted index, PMI.

These are the retrieval/feature side of a training-data pipeline: score
documents against queries, weight terms, build posting lists, and measure
token association. All four are pure DataFrame compositions — token rows
carry only ``(doc_id, tok)`` (never the document payload), vocabularies and
corpus-level scalars broadcast, and every per-document aggregation is the
single corpus-sized shuffle.

Cross-engine determinism: every fp score is rounded in decimal space
(order-independent exact sums, then one final ROUND) and every ranking
window carries a total tiebreak, per the conventions in queries.py.

Reference parity: the reference engine has no retrieval scoring; this module
is part of the LLM-data-pipeline extension surface (SURVEY.md §7).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from iniz_exporters_spark.functions.text import tokens
from iniz_exporters_spark.session import metadata_df


def _token_rows(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Explode documents to (id, tok) rows — the shared first stage."""
    return docs.select(id_col, F.explode(tokens(text_col)).alias("tok"))


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 3,
) -> DataFrame:
    """Top-``top_n`` terms per document by TF-IDF.

    Returns ``(doc_id, tok, term_rank, tfidf)``. tf is the raw in-document
    count, idf = ln(N / df) with N = documents containing ≥1 token.

    Scale shape: one explode pass feeds the per-(doc,tok) tf aggregation
    (map-side combined); df is a vocabulary-sized aggregate that BROADCASTS
    back onto the tf rows together with the scalar N, so the corpus-sized
    frame is shuffled exactly once (on doc_id, by the tf groupBy — the
    ranking window reuses that partitioning). The tfidf value is rounded in
    decimal space BEFORE ranking so the (tfidf desc, tok asc) tiebreak is
    engine-stable.
    """
    t = _token_rows(docs, id_col, text_col)
    tf = t.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n_docs = tf.select(id_col).distinct().agg(
        F.count("*").cast("double").alias("n_docs")
    )
    scored = (
        tf.join(F.broadcast(df_), "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).cast(
                    "decimal(28,12)"
                ),
                6,
            ).cast("double"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= top_n)
        .select(id_col, "tok", "term_rank", "tfidf")
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 score of every matching document against ``query_terms``.

    Returns ``(doc_id, bm25, n_hits)`` for documents containing at least one
    query term. idf uses the standard smoothed form
    ``ln(1 + (N - df + 0.5) / (df + 0.5))``.

    Scale shape: the token stream is filtered to the |query| terms FIRST
    (literal isin predicate — at a real deployment this reaches the scan as
    a pushed filter on a token-bucketed layout), so df/tf/dl aggregates run
    on a tiny slice; doc lengths come from one full-corpus pass that
    map-side combines to one row per doc. No full-vocabulary state anywhere.
    """
    t = _token_rows(docs, id_col, text_col)
    dl = t.groupBy(id_col).agg(F.count("*").alias("dl"))
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))
    n_docs = dl.agg(F.count("*").cast("double").alias("n_docs"))

    qt = t.filter(F.col("tok").isin(query_terms))
    tf = qt.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("tok").agg(F.count("*").cast("double").alias("df"))

    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (
        1.0 - b + b * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
    return (
        tf.join(F.broadcast(df_), "tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(avgdl))
        .crossJoin(F.broadcast(n_docs))
        .groupBy(id_col)
        .agg(
            F.round(F.sum(contrib.cast("decimal(28,12)")), 6)
            .cast("double")
            .alias("bm25"),
            F.count("*").cast("long").alias("n_hits"),
        )
    )


def bm25_multi_topk(
    docs: DataFrame,
    queries: list[tuple[str, list[str]]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Batch BM25 search: ``(query_id, doc_id, bm25, rn)`` — top-``top_k``
    docs per query over a literal query table. The serving shape of
    ``bm25_scores``: ONE pass over the token stream serves every query —
    the (query_id, term) table broadcasts, per-(doc, term) tf and global
    df/dl/avgdl are shared across queries, and the per-query ranking is a
    window over ≤ |queries|·|matching docs| rows. Ranking is on the
    ROUNDED decimal-summed score with doc-id tiebreak, so the top-k
    frontier is engine-stable."""
    from pyspark.sql import Window

    spark = docs.sparkSession
    qt = metadata_df(spark,
        [(qid, t) for qid, terms in queries for t in terms],
        "query_id string, tok string",
    )
    all_terms = sorted({t for _, terms in queries for t in terms})

    t = _token_rows(docs, id_col, text_col)
    dl = t.groupBy(id_col).agg(F.count("*").alias("dl"))
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))
    n_docs = dl.agg(F.count("*").cast("double").alias("n_docs"))

    hits = t.filter(F.col("tok").isin(all_terms))
    tf = hits.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("tok").agg(F.count("*").cast("double").alias("df"))

    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
    scored = (
        tf.join(F.broadcast(qt), "tok")
        .join(F.broadcast(df_), "tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(avgdl))
        .crossJoin(F.broadcast(n_docs))
        .groupBy("query_id", id_col)
        .agg(
            F.round(F.sum(contrib.cast("decimal(28,12)")), round_to)
            .cast("double")
            .alias("bm25")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select("query_id", id_col, "bm25", "rn")
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    max_postings: int = 100,
) -> DataFrame:
    """Posting lists: ``(tok, df, postings)`` with postings = the first
    ``max_postings`` doc ids (ascending) as a comma-joined string.

    Scale shape: df comes from the distinct (doc, tok) aggregate (map-side
    combined, vocabulary-sized result). The posting list is CAPPED BEFORE
    collection — a row_number window per token keeps only the first
    ``max_postings`` ids, so the final collect_list holds ≤ max_postings
    elements per group regardless of how hot the token is (an uncapped
    group_concat over a stopword's postings would be one unbounded state
    blob at 100 TB).
    """
    pairs = (
        _token_rows(docs, id_col, text_col)
        .groupBy("tok", id_col)
        .agg(F.count("*").alias("_tf"))
        .drop("_tf")
    )
    df_ = pairs.groupBy("tok").agg(F.count("*").cast("long").alias("df"))
    w = Window.partitionBy("tok").orderBy(F.asc(id_col))
    capped = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_postings)
    )
    postings = capped.groupBy("tok").agg(
        F.array_join(F.sort_array(F.collect_list(id_col)), ",").alias(
            "postings"
        )
    )
    return (
        df_.filter(F.col("df") >= min_df)
        .join(postings, "tok")
        .select("tok", "df", "postings")
    )


def token_pmi(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 50,
    min_pair_count: int = 10,
) -> DataFrame:
    """Pointwise mutual information between co-occurring top-vocabulary
    tokens: ``(tok_a, tok_b, pair_count, pmi)`` with tok_a < tok_b.

    PMI = ln(P(a,b) / (P(a) P(b))) over document-level presence
    probabilities.

    Scale shape: the vocabulary is PRUNED FIRST — only the ``vocab_size``
    most-frequent tokens (deterministic df desc, tok asc tiebreak) enter the
    pairing stage, so the per-document self-join fans out to at most
    C(vocab_size, 2) pairs per doc no matter how long the document is. The
    vocab broadcasts twice (once to filter, once implicitly in df lookups);
    the pair count is one map-side-combined aggregate over (tok_a, tok_b) —
    a ≤ C(50,2)-row result.
    """
    pairs = (
        _token_rows(docs, id_col, text_col)
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("_tf"))
        .drop("_tf")
    )
    vocab = (
        pairs.groupBy("tok")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.asc("tok"))
        .limit(vocab_size)
    )
    pv = pairs.join(F.broadcast(vocab), "tok")
    n_docs = pairs.select(id_col).distinct().agg(
        F.count("*").cast("double").alias("n_docs")
    )
    a = pv.select(
        F.col(id_col).alias("_id"),
        F.col("tok").alias("tok_a"),
        F.col("df").alias("df_a"),
    )
    b = pv.select(
        F.col(id_col).alias("_id"),
        F.col("tok").alias("tok_b"),
        F.col("df").alias("df_b"),
    )
    co = (
        a.join(b, "_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(
            F.count("*").cast("long").alias("pair_count"),
            F.first("df_a").alias("df_a"),
            F.first("df_b").alias("df_b"),
        )
        .filter(F.col("pair_count") >= min_pair_count)
    )
    pmi = F.log(
        F.col("pair_count") * F.col("n_docs")
        / (F.col("df_a") * F.col("df_b"))
    )
    return (
        co.crossJoin(F.broadcast(n_docs))
        .select(
            "tok_a",
            "tok_b",
            "pair_count",
            F.round(pmi.cast("decimal(28,12)"), 6).cast("double").alias("pmi"),
        )
    )


#: Fixed embedded stopword list for RAKE phrase splitting — deliberately
#: small and frozen so the DuckDB oracle replays identical candidate
#: boundaries (same policy as text.LANG_STOPWORDS).
RAKE_STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "on",
    "for", "with", "as", "at", "by", "be", "are", "was", "this", "that",
    "from",
)


def rake_keywords(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 3,
) -> DataFrame:
    """(id, phrase, score, rank) — RAKE keyword extraction (Rose et al.
    2010): candidate phrases are maximal stopword-free token runs; each
    word scores deg(w)/freq(w) within the document (deg = summed length
    of phrases containing w), and a phrase scores the sum of its words'
    scores. Top `top_n` phrases per doc (ties broken by phrase text).

    Determinism: per-word scores are exact rationals evaluated in double
    (identical both engines); the phrase-score sum is decimal(28,12)-cast
    per term so addition order cannot matter; final round to 6 dp.

    Scale: tokenization is per-row; the phrase grouping and word
    statistics shuffle (id, position/hash)-shaped rows keyed by doc —
    never full texts; the per-doc window for ranking rides the same
    doc-keyed partitioning. Everything is corpus-parallel because RAKE
    statistics are document-local.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(text_col)).alias("pos", "tok"),
    )
    stop = F.col("tok").isin(*RAKE_STOPWORDS)
    w_ord = Window.partitionBy("id").orderBy("pos")
    grouped = toks.withColumn(
        "grp", F.sum(stop.cast("int")).over(w_ord)
    ).filter(~stop)
    phrases = grouped.groupBy("id", "grp").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s.tok,
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    )
    wordstats = (
        grouped.join(phrases.select("id", "grp", "plen"), ["id", "grp"])
        .groupBy("id", "tok")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("plen").alias("deg"),
        )
    )
    scored = (
        grouped.join(wordstats, ["id", "tok"])
        .groupBy("id", "grp")
        .agg(
            F.round(
                F.sum(
                    (F.col("deg").cast("double") / F.col("freq"))
                    .cast("decimal(28,12)")
                ).cast("decimal(28,12)"),
                6,
            )
            .cast("double")
            .alias("score"),
        )
        .join(phrases, ["id", "grp"])
        .groupBy("id", "phrase")
        .agg(F.max("score").alias("score"))
    )
    w_rank = Window.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("phrase").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= top_n)
        .select(F.col("id").alias(id_col), "phrase", "score", "rank")
    )
