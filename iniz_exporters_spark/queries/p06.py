"""Registry chunk 6/9: 35 @register entries (anova_f_q .. partial_corr_q).

Mechanical split of the original queries.py (lines 18235-21868); statement order
and registration order are unchanged. See queries/__init__.py."""
from iniz_exporters_spark.catalog import Catalog
from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F
from iniz_exporters_spark.queries._base import _dec, register
from iniz_exporters_spark.functions.text import tokens as _tokens
from iniz_exporters_spark.functions.text import poly_hash
from iniz_exporters_spark.queries.p01 import _SQL_POLY, _SQL_TOKENS
from iniz_exporters_spark.queries.p03 import _dsum



# One-way ANOVA F of customer account balance across market segments:
# F = (SSB/(k-1)) / (SSW/(n-k)) via the sum-of-squares identity
# SST = Q - S^2/n, SSB = sum_g S_g^2/n_g - S^2/n. The corpus-scale pass
# is ONE aggregation producing per-group (n, sum x, sum x^2) with
# map-side partials; x is DECIMAL(18,6)-quantized before both sums so
# they are exact and order-independent, and every per-group float ratio
# is re-quantized to DECIMAL(28,12) before the cross-group fold (k=5
# rows — metadata scale, but deterministic on principle). Reports
# eta-squared (SSB/SST) as the effect size alongside the F statistic.
@register(
    "anova_f_q",
    """
    WITH g AS (
        SELECT c_mktsegment,
               COUNT(*) AS n,
               SUM(CAST(c_acctbal AS DECIMAL(19,6))) AS s,
               -- DuckDB: width >= 19 forces the int128 multiply path
               -- (width-18 products overflow for |x| >= ~1000); the
               -- Spark twin stays at decimal(16,6) where 16+16+1 <= 38
               -- keeps the product EXACT at scale 12 (19,6 would round
               -- to 11 dp). Both engines are exact, so values match.
               SUM(CAST(c_acctbal AS DECIMAL(19,6))
                   * CAST(c_acctbal AS DECIMAL(19,6))) AS q
        FROM customer GROUP BY c_mktsegment
    ),
    parts AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n_tot,
               COUNT(*) AS k,
               CAST(SUM(s) AS DOUBLE) AS s_tot,
               CAST(SUM(q) AS DOUBLE) AS q_tot,
               CAST(SUM(CAST(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n
                    AS DECIMAL(28,12))) AS DOUBLE) AS sum_s2n
        FROM g
    )
    SELECT n_tot, CAST(k AS BIGINT) AS k_groups,
           CAST(ROUND((sum_s2n - s_tot * s_tot / n_tot) / (k - 1)
               / ((q_tot - sum_s2n) / (n_tot - k)), 6) AS DOUBLE) + 0.0
               AS f_stat,
           CAST(ROUND((sum_s2n - s_tot * s_tot / n_tot)
               / (q_tot - s_tot * s_tot / n_tot), 6) AS DOUBLE) + 0.0
               AS eta_squared
    FROM parts
    """,
)
def anova_f_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parametric k-sample location test completing the family around
    kruskal_wallis_q (its rank-based twin) and brown_forsythe_q (its
    variance-homogeneity precondition check)."""
    c = Catalog(spark, sf_dir).customer
    x = _dec(F.col("c_acctbal"), 16, 6)
    g = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s"),
        F.sum(x * x).alias("q"),
    )
    parts = g.agg(
        F.sum("n").cast("long").alias("n_tot"),
        F.count(F.lit(1)).alias("k"),
        F.sum("s").cast("double").alias("s_tot"),
        F.sum("q").cast("double").alias("q_tot"),
        _dsum(
            F.col("s").cast("double")
            * F.col("s").cast("double")
            / F.col("n")
        )
        .cast("double")
        .alias("sum_s2n"),
    )
    ssb = F.col("sum_s2n") - F.col("s_tot") * F.col("s_tot") / F.col("n_tot")
    ssw = F.col("q_tot") - F.col("sum_s2n")
    sst = F.col("q_tot") - F.col("s_tot") * F.col("s_tot") / F.col("n_tot")
    return parts.select(
        "n_tot",
        F.col("k").cast("long").alias("k_groups"),
        (
            F.round(
                ssb / (F.col("k") - 1) / (ssw / (F.col("n_tot") - F.col("k"))),
                6,
            )
            + F.lit(0.0)
        ).alias("f_stat"),
        (F.round(ssb / sst, 6) + F.lit(0.0)).alias("eta_squared"),
    )


# t-closeness audit (Li et al. 2007) completing the k-anonymity /
# l-diversity privacy family: for each (nation, segment) equivalence
# class, the Earth Mover's Distance between the class's distribution of
# the ORDERED sensitive attribute (account-balance band 0..3) and the
# global distribution — EMD over an ordered categorical is the mean
# absolute difference of cumulative shares, D = sum_{i<m} |cumP_c(i) -
# cumP_g(i)| / (m-1). Scale shape: one corpus aggregation to (class,
# band) counts, a 4-row broadcast global table, and windows partitioned
# by CLASS (<=4 rows each). Missing bands are zero-filled via a
# class x band scaffold join so cumulative shares are always defined.
@register(
    "t_closeness_q",
    """
    WITH banded AS (
        SELECT c_nationkey, c_mktsegment,
               CASE WHEN c_acctbal < 0 THEN 0
                    WHEN c_acctbal < 3000 THEN 1
                    WHEN c_acctbal < 7000 THEN 2
                    ELSE 3 END AS band
        FROM customer
    ),
    cb AS (
        SELECT c_nationkey, c_mktsegment, band, COUNT(*) AS cnt
        FROM banded GROUP BY c_nationkey, c_mktsegment, band
    ),
    classes AS (
        SELECT c_nationkey, c_mktsegment, SUM(cnt) AS n_class
        FROM cb GROUP BY c_nationkey, c_mktsegment
    ),
    gl AS (
        SELECT band, SUM(cnt) AS gcnt FROM cb GROUP BY band
    ),
    scaffold AS (
        SELECT c.c_nationkey, c.c_mktsegment, c.n_class,
               b.band, COALESCE(cb.cnt, 0) AS cnt, g.gcnt,
               (SELECT SUM(gcnt) FROM gl) AS n_tot
        FROM classes c
        CROSS JOIN (SELECT unnest(range(0, 4)) AS band) b
        LEFT JOIN cb ON cb.c_nationkey = c.c_nationkey
                    AND cb.c_mktsegment = c.c_mktsegment
                    AND cb.band = b.band
        JOIN gl g ON g.band = b.band
    ),
    cums AS (
        SELECT c_nationkey, c_mktsegment, n_class, band,
               SUM(cnt) OVER (PARTITION BY c_nationkey, c_mktsegment
                              ORDER BY band) AS cum_c,
               SUM(gcnt) OVER (PARTITION BY c_nationkey, c_mktsegment
                               ORDER BY band) AS cum_g,
               n_tot
        FROM scaffold
    )
    SELECT c_nationkey, c_mktsegment,
           CAST(MAX(n_class) AS BIGINT) AS group_size,
           CAST(ROUND(CAST(SUM(CASE WHEN band < 3 THEN CAST(
               abs(CAST(cum_c AS DOUBLE) / n_class
                   - CAST(cum_g AS DOUBLE) / n_tot)
               AS DECIMAL(28,12)) ELSE CAST(0 AS DECIMAL(28,12)) END)
               AS DOUBLE) / 3, 6) AS DOUBLE) + 0.0 AS emd,
           CAST(SUM(CASE WHEN band < 3 THEN CAST(
               abs(CAST(cum_c AS DOUBLE) / n_class
                   - CAST(cum_g AS DOUBLE) / n_tot)
               AS DECIMAL(28,12)) ELSE CAST(0 AS DECIMAL(28,12)) END)
               AS DOUBLE) / 3 > 0.2 AS t_violation
    FROM cums
    GROUP BY c_nationkey, c_mktsegment
    """,
)
def t_closeness_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does any quasi-identifier class leak the sensitive attribute's
    distribution? EMD-per-class vs the global marginal, zero-filled over
    the full band scaffold so classes missing a band still audit."""
    c = Catalog(spark, sf_dir).customer.withColumn(
        "band",
        F.when(F.col("c_acctbal") < 0, 0)
        .when(F.col("c_acctbal") < 3000, 1)
        .when(F.col("c_acctbal") < 7000, 2)
        .otherwise(3),
    )
    cb = c.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    classes = cb.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("cnt").alias("n_class")
    )
    gl = cb.groupBy("band").agg(F.sum("cnt").alias("gcnt"))
    spark_bands = c.sparkSession.range(0, 4).select(
        F.col("id").cast("int").alias("band")
    )
    scaffold = (
        classes.crossJoin(F.broadcast(spark_bands))
        .join(cb, ["c_nationkey", "c_mktsegment", "band"], "left")
        .fillna({"cnt": 0})
        .join(F.broadcast(gl), "band")
    )
    wcum = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wclass = Window.partitionBy("c_nationkey", "c_mktsegment")
    cums = scaffold.select(
        "c_nationkey",
        "c_mktsegment",
        "n_class",
        "band",
        F.sum("cnt").over(wcum).alias("cum_c"),
        F.sum("gcnt").over(wcum).alias("cum_g"),
        # the 4-band scaffold carries the whole global marginal in every
        # class partition, so the corpus total needs no driver collect
        F.sum("gcnt").over(wclass).alias("n_tot"),
    )
    term = F.when(
        F.col("band") < 3,
        F.abs(
            F.col("cum_c").cast("double") / F.col("n_class")
            - F.col("cum_g").cast("double") / F.col("n_tot")
        ).cast("decimal(28,12)"),
    ).otherwise(F.lit(0).cast("decimal(28,12)"))
    emd = F.sum(term).cast("double") / 3
    return cums.groupBy("c_nationkey", "c_mktsegment").agg(
        F.max("n_class").cast("long").alias("group_size"),
        (F.round(emd, 6) + F.lit(0.0)).alias("emd"),
        (emd > 0.2).alias("t_violation"),
    )


# Hubness diagnostic of the embedding space: the k-occurrence N_5(x) —
# how often x appears in another point's 5-NN — and its skewness, the
# standard symptom score for the high-dimensional "hub" pathology that
# silently degrades ANN recall and kNN-classifier accuracy (hubs absorb
# neighbor slots, antihubs become unreachable). Every point is a probe,
# so sum N_5 = 5n exactly: the deviations d = N_5 - 5 are INTEGERS, the
# second/third moments are exact BIGINT sums, and the only float op is
# the final m3 / m2^1.5. Zero-filled via a left join so antihubs
# (N_5 = 0) count. Scale: brute-force n^2 is the test-scale oracle
# path; at corpus scale the same k-occurrence counting runs over the
# candidate pairs of the bucketed ANN (similarity.py ivf_flat_topk /
# ann_bucketed) — the downstream counting plan is unchanged.
@register(
    "hubness_q",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS (
        SELECT q.vec_id AS qid, c.vec_id AS cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ROUND(list_reduce(
                       list_transform(range(1, len(c.v)+1),
                           i -> (c.v[i] - q.v[i]) * (c.v[i] - q.v[i])),
                       (x, y) -> x + y), 6), c.vec_id) AS rn
        FROM e q CROSS JOIN e c WHERE c.vec_id <> q.vec_id
    ),
    kocc AS (
        SELECT e.vec_id, COUNT(s.cid) AS n5
        FROM e LEFT JOIN (SELECT cid FROM scored WHERE rn <= 5) s
            ON s.cid = e.vec_id
        GROUP BY e.vec_id
    ),
    m AS (
        SELECT COUNT(*) AS n,
               CAST(MAX(n5) AS BIGINT) AS max_kocc,
               CAST(SUM(CASE WHEN n5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_antihubs,
               SUM((n5 - 5) * (n5 - 5)) AS m2s,
               SUM((n5 - 5) * (n5 - 5) * (n5 - 5)) AS m3s
        FROM kocc
    )
    SELECT CAST(n AS BIGINT) AS n_points, max_kocc, n_antihubs,
           CAST(ROUND((CAST(m3s AS DOUBLE) / n)
               / pow(CAST(m2s AS DOUBLE) / n, 1.5), 4) AS DOUBLE) + 0.0
               AS skewness
    FROM m
    """,
)
def hubness_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-occurrence skewness of the 5-NN digraph (Radovanovic et al.):
    skewness >> 0 means a few hub vectors dominate neighbor lists.
    Distances tie-broken on (6-dp d2, vec_id) exactly like twonn_dim_q."""
    e = Catalog(spark, sf_dir).embeddings.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    q = e.select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"))
    d2 = F.round(
        F.aggregate(
            F.zip_with(
                F.col("qv"), F.col("v"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ),
        6,
    )
    # the probe table arrives as ONE parquet split and crossJoin keeps
    # the left partitioning — spread the n x n pair work across the
    # cluster before fanning out. The partition count must be EXPLICIT:
    # the pre-explosion table is tiny, so AQE would coalesce a bare
    # repartition back to one task and serialize the O(n^2 d) stage.
    e = e.repartition(
        spark.sparkContext.defaultParallelism, F.col("vec_id")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("cid"), d2.alias("d2"))
    )
    w = Window.partitionBy("qid").orderBy("d2", "cid")
    top5 = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("cid")
    )
    kocc = (
        e.select("vec_id")
        .join(
            top5.groupBy("cid").agg(F.count(F.lit(1)).alias("n5")),
            e["vec_id"] == F.col("cid"),
            "left",
        )
        .select("vec_id", F.coalesce("n5", F.lit(0)).alias("n5"))
    )
    dev = F.col("n5") - 5
    m = kocc.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("n5").cast("long").alias("max_kocc"),
        F.sum(F.when(F.col("n5") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_antihubs"),
        F.sum(dev * dev).alias("m2s"),
        F.sum(dev * dev * dev).alias("m3s"),
    )
    return m.select(
        F.col("n").cast("long").alias("n_points"),
        "max_kocc",
        "n_antihubs",
        (
            F.round(
                (F.col("m3s").cast("double") / F.col("n"))
                / F.pow(F.col("m2s").cast("double") / F.col("n"), 1.5),
                4,
            )
            + F.lit(0.0)
        ).alias("skewness"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 4 (continued): campaign-eval decile table,
# probabilistic-forecast decomposition, two classic nonparametric
# sequence tests, and the unit-root regression. The classifier-eval pair
# reuses the roc_auc_q scorer; the three time-series ops run on
# DECIMAL-quantized calendar-bounded daily frames.
# ---------------------------------------------------------------------------


# Decile lift & gain table for the mean-token-length scorer: rank all
# docs by score (best first), cut into 10 equal NTILE buckets, and
# report each decile's positive capture (gain) and lift over the base
# rate. The global rank comes from operators.indexing.global_ntile —
# range-partitioned rank + broadcast offsets, NEVER the corpus-scale
# single-partition window a plain NTILE() OVER (ORDER BY ...) would
# plan — while the DuckDB oracle keeps ANSI NTILE, whose semantics
# global_ntile reproduces bit-for-bit. Counts stay integral; the two
# ratios are the only float ops.
@register(
    "lift_gain_q",
    f"""
    WITH scored AS (
        SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               ROUND(CAST(list_sum(list_transform(t, x -> length(x)))
                          AS DOUBLE) / len(t), 4) AS s
        FROM (SELECT doc_id, lang, {_SQL_TOKENS} AS t FROM documents)
        WHERE len(t) > 0
    ),
    tiled AS (
        SELECT y, NTILE(10) OVER (ORDER BY s DESC, doc_id) AS decile
        FROM scored
    ),
    d AS (
        SELECT decile, COUNT(*) AS n, SUM(y) AS np
        FROM tiled GROUP BY decile
    )
    SELECT decile, CAST(n AS BIGINT) AS n_docs,
           CAST(np AS BIGINT) AS n_pos,
           CAST(ROUND(CAST(SUM(np) OVER (ORDER BY decile) AS DOUBLE)
               / SUM(np) OVER (), 6) AS DOUBLE) AS cum_gain,
           CAST(ROUND((CAST(np AS DOUBLE) / n)
               / (CAST(SUM(np) OVER () AS DOUBLE) / SUM(n) OVER ()), 6)
               AS DOUBLE) AS lift
    FROM d
    """,
)
def lift_gain_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Would contacting the top-k% of the ranking capture most of the
    positives? The campaign-targeting view of the same ranking that
    roc_auc_q/average_precision_q summarize to a scalar."""
    from iniz_exporters_spark.operators.indexing import global_ntile

    d = Catalog(spark, sf_dir).documents
    t = _tokens("text")
    scored = d.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.round(
            F.aggregate(
                t, F.lit(0), lambda a, x: a + F.length(x)
            ).cast("double")
            / F.size(t),
            4,
        ).alias("s"),
    ).filter(F.size(t) > 0)
    tiled = global_ntile(
        scored, [F.col("s").desc(), F.col("doc_id").asc()], 10, "decile"
    )
    dd = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("np")
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return dd.select(
        "decile",
        F.col("n").cast("long").alias("n_docs"),
        F.col("np").cast("long").alias("n_pos"),
        F.round(
            F.sum("np").over(wcum).cast("double") / F.sum("np").over(wt),
            6,
        ).alias("cum_gain"),
        F.round(
            (F.col("np").cast("double") / F.col("n"))
            / (F.sum("np").over(wt).cast("double") / F.sum("n").over(wt)),
            6,
        ).alias("lift"),
    )


# Murphy decomposition of the Brier score (Brier = reliability -
# resolution + uncertainty) for the calibrated-ish probability
# p = score/10: bins are the DISTINCT 4-dp score values (bounded
# cardinality — same key as roc_auc_q), so per-bin counts are exact and
# the three components come from one grouped pass. Each bin's float
# term is DECIMAL(28,12)-quantized before the cross-bin sum. The direct
# Brier mean-squared-error is reported too, pinning the identity
# numerically in both engines.
@register(
    "brier_decomposition_q",
    f"""
    WITH scored AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               ROUND(CAST(list_sum(list_transform(t, x -> length(x)))
                          AS DOUBLE) / len(t), 4) / 10 AS p
        FROM (SELECT lang, {_SQL_TOKENS} AS t FROM documents)
        WHERE len(t) > 0
    ),
    b AS (
        SELECT p, COUNT(*) AS n_k, SUM(y) AS pos_k,
               SUM(CAST((p - y) * (p - y) AS DECIMAL(28,12))) AS se_k
        FROM scored GROUP BY p
    ),
    yb AS (
        SELECT CAST(SUM(pos_k) AS DOUBLE) / SUM(n_k) AS ybar FROM b
    ),
    tot AS (
        SELECT CAST(SUM(n_k) AS BIGINT) AS n,
               MAX((SELECT ybar FROM yb)) AS ybar,
               CAST(SUM(se_k) AS DOUBLE) AS sse,
               CAST(SUM(CAST(n_k * (p - CAST(pos_k AS DOUBLE) / n_k)
                    * (p - CAST(pos_k AS DOUBLE) / n_k)
                    AS DECIMAL(28,12))) AS DOUBLE) AS rel_s,
               CAST(SUM(CAST(n_k * (CAST(pos_k AS DOUBLE) / n_k
                        - (SELECT ybar FROM yb))
                    * (CAST(pos_k AS DOUBLE) / n_k
                        - (SELECT ybar FROM yb))
                    AS DECIMAL(28,12))) AS DOUBLE) AS res_s
        FROM b
    )
    SELECT n,
           CAST(ROUND(sse / n, 6) AS DOUBLE) + 0.0 AS brier,
           CAST(ROUND(rel_s / n, 6) AS DOUBLE) + 0.0 AS reliability,
           CAST(ROUND(res_s / n, 6) AS DOUBLE) + 0.0 AS resolution,
           CAST(ROUND(ybar * (1 - ybar), 6) AS DOUBLE) + 0.0
               AS uncertainty
    FROM tot
    """,
)
def brier_decomposition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the probabilistic forecast bad because it is miscalibrated
    (reliability) or because it cannot discriminate (resolution)?
    Verifiable identity: brier ~= reliability - resolution +
    uncertainty up to the binning (exact here since bins ARE the
    distinct forecast values)."""
    d = Catalog(spark, sf_dir).documents
    t = _tokens("text")
    scored = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        (
            F.round(
                F.aggregate(
                    t, F.lit(0), lambda a, x: a + F.length(x)
                ).cast("double")
                / F.size(t),
                4,
            )
            / 10
        ).alias("p"),
    ).filter(F.size(t) > 0)
    b = scored.groupBy("p").agg(
        F.count(F.lit(1)).alias("n_k"),
        F.sum("y").alias("pos_k"),
        _dsum((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))).alias(
            "se_k"
        ),
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ybar_w = F.sum("pos_k").over(wt).cast("double") / F.sum("n_k").over(wt)
    ybar_k = F.col("pos_k").cast("double") / F.col("n_k")
    tot = b.select(
        "n_k",
        "pos_k",
        "se_k",
        (F.col("n_k") * (F.col("p") - ybar_k) * (F.col("p") - ybar_k))
        .cast("decimal(28,12)")
        .alias("rel_t"),
        (F.col("n_k") * (ybar_k - ybar_w) * (ybar_k - ybar_w))
        .cast("decimal(28,12)")
        .alias("res_t"),
    ).agg(
        F.sum("n_k").cast("long").alias("n"),
        (F.sum("pos_k").cast("double") / F.sum("n_k")).alias("ybar"),
        F.sum("se_k").cast("double").alias("sse"),
        F.sum("rel_t").cast("double").alias("rel_s"),
        F.sum("res_t").cast("double").alias("res_s"),
    )
    return tot.select(
        "n",
        (F.round(F.col("sse") / F.col("n"), 6) + F.lit(0.0)).alias("brier"),
        (F.round(F.col("rel_s") / F.col("n"), 6) + F.lit(0.0)).alias(
            "reliability"
        ),
        (F.round(F.col("res_s") / F.col("n"), 6) + F.lit(0.0)).alias(
            "resolution"
        ),
        (
            F.round(F.col("ybar") * (1 - F.col("ybar")), 6) + F.lit(0.0)
        ).alias("uncertainty"),
    )


# Friedman test across the five event types with calendar days as
# blocks: within each day, rank the types by their daily mean value,
# then chi2_F = 12/(n*k*(k+1)) * sum_j S_j^2 - 3*n*(k+1) from the
# per-type rank sums. Ranks use the deterministic total order
# (mean, type) — means carry 6 exact decimals so statistical ties are
# vanishingly rare, and BOTH engines break any that occur identically.
# Scale shape: one corpus aggregation to the (day x type) table
# (metadata scale: 150 rows here, 5 x 36.5k for a century); ranks
# partition by DAY (5 rows each); rank sums are exact BIGINTs and the
# only float op is the final statistic.
@register(
    "friedman_q",
    """
    WITH dt AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events GROUP BY CAST(ts AS DATE), event_type
    ),
    rk AS (
        SELECT day, event_type,
               ROW_NUMBER() OVER (PARTITION BY day
                   ORDER BY m, event_type) AS r
        FROM dt
    ),
    s AS (
        SELECT event_type, CAST(SUM(r) AS BIGINT) AS rank_sum,
               COUNT(*) AS n_blocks
        FROM rk GROUP BY event_type
    )
    SELECT CAST(MAX(n_blocks) AS BIGINT) AS n_blocks,
           CAST(COUNT(*) AS BIGINT) AS k_treatments,
           CAST(ROUND(12.0 * SUM(rank_sum * rank_sum)
                   / (MAX(n_blocks) * COUNT(*) * (COUNT(*) + 1))
               - 3.0 * MAX(n_blocks) * (COUNT(*) + 1), 6) AS DOUBLE)
               + 0.0 AS friedman_chi2
    FROM s
    """,
)
def friedman_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do the event types differ consistently in daily value once
    day-level shifts are blocked out? The repeated-measures companion
    to kruskal_wallis_q (independent groups)."""
    e = Catalog(spark, sf_dir).events
    dt = e.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(
        (
            F.sum(_dec(F.col("value"), 18, 6)).cast("double")
            / F.count(F.lit(1))
        )
        .cast("decimal(18,6)")
        .alias("m")
    )
    wday = Window.partitionBy("day").orderBy("m", "event_type")
    rk = dt.withColumn("r", F.row_number().over(wday))
    s = rk.groupBy("event_type").agg(
        F.sum("r").cast("long").alias("rank_sum"),
        F.count(F.lit(1)).alias("n_blocks"),
    )
    n = F.max("n_blocks")
    k = F.count(F.lit(1))
    return s.agg(
        n.cast("long").alias("n_blocks"),
        k.cast("long").alias("k_treatments"),
        (
            F.round(
                12.0
                * F.sum(F.col("rank_sum") * F.col("rank_sum"))
                / (n * k * (k + 1))
                - 3.0 * n * (k + 1),
                6,
            )
            + F.lit(0.0)
        ).alias("friedman_chi2"),
    )


# Wald–Wolfowitz runs test on the day-over-day direction of the daily
# purchase-revenue mean: count runs of consecutive same-sign moves, then
# z = (R - mu) / sigma with mu = 2 n+ n- / (n+ + n-) + 1. Direction
# comes from an exact DECIMAL difference (never float noise); runs are
# counted as sign-change indicators summed over the calendar-bounded
# daily frame. All counts integral; z is the single float op.
@register(
    "runs_test_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    moves AS (
        SELECT day, m - LAG(m) OVER (ORDER BY day) AS d
        FROM daily
    ),
    signs AS (
        SELECT day, CASE WHEN d > 0 THEN 1 ELSE -1 END AS sgn
        FROM moves WHERE d IS NOT NULL AND d <> 0
    ),
    runs AS (
        SELECT sgn,
               CASE WHEN sgn = LAG(sgn) OVER (ORDER BY day)
                    THEN 0 ELSE 1 END AS new_run
        FROM signs
    ),
    agg AS (
        SELECT CAST(SUM(CASE WHEN new_run IS NULL THEN 1
                             ELSE new_run END) AS BIGINT) AS n_runs,
               CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_up,
               CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_down
        FROM runs
    )
    SELECT n_runs, n_up, n_down,
           CAST(ROUND((n_runs - (2.0 * n_up * n_down / (n_up + n_down)
                   + 1))
               / sqrt((2.0 * n_up * n_down
                       * (2.0 * n_up * n_down - n_up - n_down))
                      / ((n_up + n_down) * (n_up + n_down)
                         * (n_up + n_down - 1))), 6) AS DOUBLE) + 0.0
               AS z_stat
    FROM agg
    """,
)
def runs_test_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the daily revenue direction serially random? Too few runs =
    trending, too many = oscillating; the distribution-free companion
    to ljung_box_q's parametric autocorrelation test."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        (
            F.sum(_dec(F.col("value"), 18, 6)).cast("double")
            / F.count(F.lit(1))
        )
        .cast("decimal(18,6)")
        .alias("m")
    )
    wday = Window.orderBy("day")
    moves = daily.select(
        "day", (F.col("m") - F.lag("m").over(wday)).alias("d")
    )
    signs = moves.filter(
        F.col("d").isNotNull() & (F.col("d") != 0)
    ).select("day", F.when(F.col("d") > 0, 1).otherwise(-1).alias("sgn"))
    runs = signs.select(
        "sgn",
        F.when(F.col("sgn") == F.lag("sgn").over(wday), 0)
        .otherwise(1)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum(F.coalesce(F.col("new_run"), F.lit(1)))
        .cast("long")
        .alias("n_runs"),
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_up"),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n_down"),
    )
    nu, nd, r = F.col("n_up"), F.col("n_down"), F.col("n_runs")
    mu = 2.0 * nu * nd / (nu + nd) + 1
    var = (
        2.0 * nu * nd * (2.0 * nu * nd - nu - nd)
        / ((nu + nd) * (nu + nd) * (nu + nd - 1))
    )
    return agg.select(
        "n_runs",
        "n_up",
        "n_down",
        (F.round((r - mu) / F.sqrt(var), 6) + F.lit(0.0)).alias("z_stat"),
    )


# Dickey–Fuller unit-root regression on daily purchase revenue:
# OLS of dy_t = alpha + beta * y_{t-1}; DF statistic = beta_hat / se.
# y is DECIMAL(18,6)-quantized at the daily aggregate so the lag
# difference and every cross-product are exact decimals; the five
# regression sums accumulate as DECIMAL(38,12) (order-independent), and
# the closed-form OLS on those five scalars is the only float stage.
# Scale shape: one corpus aggregation; the lag window and the sums run
# over the calendar-bounded daily frame.
@register(
    "dickey_fuller_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    lagged AS (
        SELECT day, m, LAG(m) OVER (ORDER BY day) AS y1
        FROM daily
    ),
    p AS (
        SELECT CAST(y1 AS DECIMAL(16,6)) AS x,
               CAST(m - y1 AS DECIMAL(16,6)) AS dy
        FROM lagged WHERE y1 IS NOT NULL
    ),
    s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(dy) AS DOUBLE) AS sy,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               CAST(SUM(x * dy) AS DOUBLE) AS sxy,
               CAST(SUM(dy * dy) AS DOUBLE) AS syy
        FROM p
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           CAST(ROUND((sxy - sx * sy / n) / (sxx - sx * sx / n), 6)
               AS DOUBLE) + 0.0 AS beta,
           CAST(ROUND(((sxy - sx * sy / n) / (sxx - sx * sx / n))
               / sqrt((((syy - sy * sy / n)
                        - (sxy - sx * sy / n) * (sxy - sx * sy / n)
                          / (sxx - sx * sx / n)) / (n - 2))
                      / (sxx - sx * sx / n)), 6) AS DOUBLE) + 0.0
               AS df_stat
    FROM s
    """,
)
def dickey_fuller_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """beta near 0 (df_stat small in magnitude) = random walk; strongly
    negative df_stat = mean-reverting level. The regression-based
    stationarity check alongside hurst_exponent_q's R/S view."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        (
            F.sum(_dec(F.col("value"), 18, 6)).cast("double")
            / F.count(F.lit(1))
        )
        .cast("decimal(18,6)")
        .alias("m")
    )
    wday = Window.orderBy("day")
    lagged = daily.select(
        "m", F.lag("m").over(wday).alias("y1")
    ).filter(F.col("y1").isNotNull())
    p = lagged.select(
        F.col("y1").cast("decimal(16,6)").alias("x"),
        (F.col("m") - F.col("y1")).cast("decimal(16,6)").alias("dy"),
    )
    s = p.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("dy").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("dy")).cast("double").alias("sxy"),
        F.sum(F.col("dy") * F.col("dy")).cast("double").alias("syy"),
    )
    n = F.col("n")
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / n
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    beta = cxy / cxx
    se = F.sqrt(((cyy - cxy * cxy / cxx) / (n - 2)) / cxx)
    return s.select(
        n.cast("long").alias("n_obs"),
        (F.round(beta, 6) + F.lit(0.0)).alias("beta"),
        (F.round(beta / se, 6) + F.lit(0.0)).alias("df_stat"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 4 (continued): monotone calibration (PAVA as a
# bounded minimax), scale reliability (Cronbach's alpha), deterministic
# randomization inference, multiple-testing control (Benjamini-Hochberg),
# and lag-regression causality (Granger). The shared discipline: every
# candidate-pair / replicate structure is bounded (score bins, 5 items,
# 64 replicates, 25 nations, calendar days), never corpus x corpus.
# ---------------------------------------------------------------------------


# Isotonic calibration curve via the minimax characterization of the
# pool-adjacent-violators fit: iso(i) = max_{j<=i} min_{k>=i}
# mean(y over bins j..k) — an O(m^2) formulation over the DISTINCT
# 2-dp score bins (m bounded ~160 by the score's range, independent of
# corpus size), so the notoriously sequential PAVA becomes two window
# passes over a bins x bins pair table: per-j suffix-min in k, then a
# per-k max over j. Bin counts are exact integers; interval means are
# single float divisions computed identically in both engines.
@register(
    "isotonic_calibration_q",
    f"""
    WITH scored AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               -- bin key is PURE INTEGER arithmetic (floor of 100 x the
               -- mean token length): no float op ever touches the key,
               -- so the binning cannot hit the cross-engine .5-boundary
               -- divergence that ROUND(double) keys risk
               CAST(100 * list_sum(list_transform(t, x -> length(x)))
                    // len(t) AS BIGINT) / 1000.0 AS p
        FROM (SELECT lang, {_SQL_TOKENS} AS t FROM documents)
        WHERE len(t) > 0
    ),
    bins AS (
        SELECT p, COUNT(*) AS n_k, SUM(y) AS pos_k
        FROM scored GROUP BY p
    ),
    c AS (
        SELECT p, n_k, pos_k,
               SUM(n_k) OVER (ORDER BY p) AS cn,
               SUM(pos_k) OVER (ORDER BY p) AS cp
        FROM bins
    ),
    pairs AS (
        SELECT j.p AS pj, k.p AS pk,
               CAST(k.cp - (j.cp - j.pos_k) AS DOUBLE)
                   / (k.cn - (j.cn - j.n_k)) AS mu
        FROM c j JOIN c k ON j.p <= k.p
    ),
    suff AS (
        SELECT pj, pk,
               MIN(mu) OVER (PARTITION BY pj ORDER BY pk DESC) AS sm
        FROM pairs
    ),
    iso AS (
        SELECT pk AS p, MAX(sm) AS iso_raw FROM suff GROUP BY pk
    )
    SELECT c.p AS p_bin, CAST(c.n_k AS BIGINT) AS n_k,
           CAST(c.pos_k AS BIGINT) AS pos_k,
           CAST(ROUND(iso.iso_raw, 6) AS DOUBLE) + 0.0 AS iso_p
    FROM c JOIN iso ON iso.p = c.p
    """,
)
def isotonic_calibration_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone-nondecreasing calibrated probability per score bin —
    the shape-constrained companion to brier_decomposition_q's
    diagnosis. iso_p is exactly the PAVA fit (minimax identity)."""
    d = Catalog(spark, sf_dir).documents
    t = _tokens("text")
    scored = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        (
            F.floor(
                (
                    100
                    * F.aggregate(
                        t, F.lit(0), lambda a, x: a + F.length(x)
                    ).cast("long")
                )
                / F.size(t)
            )  # exact: floor(100*tl / nt), integer-valued in both engines
            / F.lit(1000.0)
        ).alias("p"),
    ).filter(F.size(t) > 0)
    bins = scored.groupBy("p").agg(
        F.count(F.lit(1)).alias("n_k"), F.sum("y").alias("pos_k")
    )
    wp = Window.orderBy("p").rowsBetween(Window.unboundedPreceding, 0)
    c = bins.select(
        "p",
        "n_k",
        "pos_k",
        F.sum("n_k").over(wp).alias("cn"),
        F.sum("pos_k").over(wp).alias("cp"),
    )
    j = c.select(
        F.col("p").alias("pj"),
        (F.col("cp") - F.col("pos_k")).alias("cp_before"),
        (F.col("cn") - F.col("n_k")).alias("cn_before"),
    )
    k = c.select(
        F.col("p").alias("pk"),
        F.col("cp").alias("cp_k"),
        F.col("cn").alias("cn_k"),
    )
    pairs = j.join(k, F.col("pj") <= F.col("pk")).select(
        "pj",
        "pk",
        (
            (F.col("cp_k") - F.col("cp_before")).cast("double")
            / (F.col("cn_k") - F.col("cn_before"))
        ).alias("mu"),
    )
    wsuff = (
        Window.partitionBy("pj")
        .orderBy(F.col("pk").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    suff = pairs.select(
        "pj", "pk", F.min("mu").over(wsuff).alias("sm")
    )
    iso = suff.groupBy("pk").agg(F.max("sm").alias("iso_raw"))
    return (
        c.join(iso, c["p"] == iso["pk"])
        .select(
            F.col("p").alias("p_bin"),
            F.col("n_k").cast("long").alias("n_k"),
            F.col("pos_k").cast("long").alias("pos_k"),
            (F.round(F.col("iso_raw"), 6) + F.lit(0.0)).alias("iso_p"),
        )
    )


# Cronbach's alpha over the five event types as "items" and users as
# "subjects": alpha = k/(k-1) * (1 - sum_i var_i / var_total), with
# per-user item scores = summed event value (zero-filled via a
# user x item scaffold so a user missing an item scores 0, as the
# psychometric formula requires). Variances use population moments from
# exact DECIMAL sums: per-item and total-score sums of x and x^2 are
# order-independent, and the alpha arithmetic runs on k+1 scalars.
# Scale shape: one corpus aggregation to (user, item); the scaffold
# join fans out to users x 5 rows; moments reduce with map-side
# partials — no windows, no corpus-scale collect.
@register(
    "cronbach_alpha_q",
    """
    WITH ui AS (
        SELECT user_id, event_type,
               SUM(CAST(value AS DECIMAL(18,6))) AS x
        FROM events GROUP BY user_id, event_type
    ),
    scaffold AS (
        SELECT u.user_id, it.event_type,
               COALESCE(ui.x, CAST(0 AS DECIMAL(18,6))) AS x
        FROM (SELECT DISTINCT user_id FROM events) u
        CROSS JOIN (SELECT DISTINCT event_type FROM events) it
        LEFT JOIN ui ON ui.user_id = u.user_id
                    AND ui.event_type = it.event_type
    ),
    item_var AS (
        SELECT event_type,
               (CAST(SUM(CAST(x AS DECIMAL(19,6))
                         * CAST(x AS DECIMAL(19,6))) AS DOUBLE)
                - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)
                  / COUNT(*)) / COUNT(*) AS v
        FROM scaffold GROUP BY event_type
    ),
    totals AS (
        SELECT user_id, SUM(x) AS tot FROM scaffold GROUP BY user_id
    ),
    tot_var AS (
        SELECT COUNT(*) AS n_users,
               (CAST(SUM(CAST(tot AS DECIMAL(19,6))
                         * CAST(tot AS DECIMAL(19,6))) AS DOUBLE)
                - CAST(SUM(tot) AS DOUBLE) * CAST(SUM(tot) AS DOUBLE)
                  / COUNT(*)) / COUNT(*) AS vt
        FROM totals
    )
    SELECT CAST(tv.n_users AS BIGINT) AS n_users,
           CAST(iv.k AS BIGINT) AS k_items,
           CAST(ROUND(iv.k / (iv.k - 1.0)
               * (1 - iv.sv / tv.vt), 6) AS DOUBLE) + 0.0 AS alpha
    FROM (SELECT COUNT(*) AS k,
                 CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE) AS sv
          FROM item_var) iv, tot_var tv
    """,
)
def cronbach_alpha_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do the five engagement signals hang together as one scale?
    alpha > 0.7 is the conventional internal-consistency bar."""
    e = Catalog(spark, sf_dir).events
    ui = e.groupBy("user_id", "event_type").agg(
        F.sum(_dec(F.col("value"), 18, 6)).alias("x")
    )
    users = e.select("user_id").distinct()
    items = e.select("event_type").distinct()
    scaffold = (
        users.crossJoin(F.broadcast(items))
        .join(ui, ["user_id", "event_type"], "left")
        .select(
            "user_id",
            "event_type",
            F.coalesce(
                F.col("x"), F.lit(0).cast("decimal(18,6)")
            ).alias("x"),
        )
    )
    x16 = F.col("x").cast("decimal(16,6)")
    item_var = scaffold.groupBy("event_type").agg(
        (
            (
                F.sum(x16 * x16).cast("double")
                - F.sum("x").cast("double")
                * F.sum("x").cast("double")
                / F.count(F.lit(1))
            )
            / F.count(F.lit(1))
        ).alias("v")
    )
    totals = scaffold.groupBy("user_id").agg(F.sum("x").alias("tot"))
    t16 = F.col("tot").cast("decimal(16,6)")
    tot_var = totals.agg(
        F.count(F.lit(1)).alias("n_users"),
        (
            (
                F.sum(t16 * t16).cast("double")
                - F.sum("tot").cast("double")
                * F.sum("tot").cast("double")
                / F.count(F.lit(1))
            )
            / F.count(F.lit(1))
        ).alias("vt"),
    )
    iv = item_var.agg(
        F.count(F.lit(1)).alias("k"),
        _dsum(F.col("v")).cast("double").alias("sv"),
    )
    return iv.crossJoin(tot_var).select(
        F.col("n_users").cast("long").alias("n_users"),
        F.col("k").cast("long").alias("k_items"),
        (
            F.round(
                F.col("k")
                / (F.col("k") - 1.0)
                * (1 - F.col("sv") / F.col("vt")),
                6,
            )
            + F.lit(0.0)
        ).alias("alpha"),
    )


# Randomization (permutation-style) test for the difference in mean
# per-user purchase totals between the two user cohorts (user_id
# parity), with DETERMINISTIC reassignments: replicate b in 0..63
# flips each user by the content-keyed hash coin poly_hash('perm:' ||
# user_id || ':' || b) % 2 — the Fisher-randomization analogue of
# poisson_bootstrap_q's resampling, exactly replayable on any engine,
# any partitioning. p = (1 + #extreme) / (B + 1), the standard
# add-one randomization p-value. Scale shape: events reduce to ONE
# per-user row first (corpus-scale pass); the 64 replicates fan out
# from the USER table (metadata x 64) with map-side partial sums.
@register(
    "permutation_test_q",
    f"""
    WITH u AS (
        SELECT user_id, user_id % 2 AS grp,
               SUM(CAST(value AS DECIMAL(18,6))) AS tot
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    obs AS (
        SELECT CAST(SUM(CASE WHEN grp = 0 THEN tot END) AS DOUBLE)
                   / SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END)
               - CAST(SUM(CASE WHEN grp = 1 THEN tot END) AS DOUBLE)
                   / SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS d_obs
        FROM u
    ),
    reps AS (
        SELECT b,
               {_SQL_POLY.format(
                   s="'perm:' || user_id::VARCHAR || ':' || b::VARCHAR"
               )} % 2 AS g, tot
        FROM u, (SELECT unnest(range(0, 64)) AS b)
    ),
    rd AS (
        SELECT b,
               CAST(SUM(CASE WHEN g = 0 THEN tot END) AS DOUBLE)
                   / SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END)
               - CAST(SUM(CASE WHEN g = 1 THEN tot END) AS DOUBLE)
                   / SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS d
        FROM reps GROUP BY b
    )
    SELECT CAST((SELECT COUNT(*) FROM u) AS BIGINT) AS n_users,
           CAST(ROUND((SELECT d_obs FROM obs), 6) AS DOUBLE) + 0.0
               AS obs_diff,
           CAST(SUM(CASE WHEN abs(d) >= abs((SELECT d_obs FROM obs))
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
           CAST(ROUND((1.0 + SUM(CASE WHEN abs(d) >=
                    abs((SELECT d_obs FROM obs)) THEN 1 ELSE 0 END))
               / 65.0, 6) AS DOUBLE) AS p_value
    FROM rd
    """,
)
def permutation_test_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free significance for the cohort difference: how
    often does a hash-randomized relabeling produce a gap at least as
    large as the observed one?"""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    u = e.groupBy("user_id").agg(
        F.sum(_dec(F.col("value"), 18, 6)).alias("tot")
    ).withColumn("grp", F.col("user_id") % 2)

    def mean_diff(gcol):
        m0 = F.sum(
            F.when(gcol == 0, F.col("tot"))
        ).cast("double") / F.sum(F.when(gcol == 0, 1).otherwise(0))
        m1 = F.sum(
            F.when(gcol == 1, F.col("tot"))
        ).cast("double") / F.sum(F.when(gcol == 1, 1).otherwise(0))
        return m0 - m1

    obs = u.agg(
        mean_diff(F.col("grp")).alias("d_obs"),
        F.count(F.lit(1)).alias("n_users"),
    )
    b = u.sparkSession.range(0, 64).select(
        F.col("id").cast("int").alias("b")
    )
    reps = u.crossJoin(F.broadcast(b)).select(
        "b",
        "tot",
        (
            poly_hash(
                F.concat(
                    F.lit("perm:"),
                    F.col("user_id").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                )
            )
            % 2
        ).alias("g"),
    )
    rd = reps.groupBy("b").agg(mean_diff(F.col("g")).alias("d"))
    return (
        rd.crossJoin(F.broadcast(obs))
        .agg(
            F.max("n_users").cast("long").alias("n_users"),
            (F.round(F.max("d_obs"), 6) + F.lit(0.0)).alias("obs_diff"),
            F.sum(
                F.when(F.abs(F.col("d")) >= F.abs(F.col("d_obs")), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_extreme"),
            F.round(
                (
                    1.0
                    + F.sum(
                        F.when(
                            F.abs(F.col("d")) >= F.abs(F.col("d_obs")), 1
                        ).otherwise(0)
                    )
                )
                / 65.0,
                6,
            ).alias("p_value"),
        )
    )


# Benjamini-Hochberg FDR control over the 25-nation family of two-sided
# one-sample z-tests (does nation mean acctbal differ from the global
# mean?). The normal tail probability uses the Abramowitz & Stegun
# 7.1.26 erfc polynomial spelled IDENTICALLY in both engines (pure
# double arithmetic: exp + one polynomial — deterministic IEEE ops, no
# library-dependent erf). Scale shape: one corpus aggregation to
# per-nation moments; the BH step-up runs in a window over the
# 25-row FAMILY table. Ranks tie-break on nation for determinism.
@register(
    "bh_fdr_q",
    """
    WITH g AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) AS mu,
               sqrt((CAST(SUM(CAST(c_acctbal AS DECIMAL(19,6))
                              * CAST(c_acctbal AS DECIMAL(19,6)))
                          AS DOUBLE)
                     - CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6)))
                            AS DOUBLE)
                       * CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6)))
                              AS DOUBLE) / COUNT(*))
                    / COUNT(*)) AS sd
        FROM customer
    ),
    nat AS (
        SELECT c_nationkey, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) AS m
        FROM customer GROUP BY c_nationkey
    ),
    z AS (
        SELECT c_nationkey, n,
               abs((m - g.mu) / (g.sd / sqrt(n))) AS az
        FROM nat, g
    ),
    p AS (
        SELECT c_nationkey, n, az,
               (0.254829592 * (1 / (1 + 0.3275911 * az / sqrt(2.0)))
                - 0.284496736 * pow(1 / (1 + 0.3275911 * az / sqrt(2.0)), 2)
                + 1.421413741 * pow(1 / (1 + 0.3275911 * az / sqrt(2.0)), 3)
                - 1.453152027 * pow(1 / (1 + 0.3275911 * az / sqrt(2.0)), 4)
                + 1.061405429 * pow(1 / (1 + 0.3275911 * az / sqrt(2.0)), 5))
               * exp(-az * az / 2.0) AS pv
        FROM z
    ),
    ranked AS (
        SELECT c_nationkey, n, az, pv,
               ROW_NUMBER() OVER (ORDER BY pv, c_nationkey) AS i,
               COUNT(*) OVER () AS m_tests
        FROM p
    ),
    kstar AS (
        SELECT ranked.*,
               MAX(CASE WHEN pv <= 0.05 * i / m_tests THEN i END)
                   OVER () AS k
        FROM ranked
    )
    SELECT c_nationkey, CAST(n AS BIGINT) AS n_customers,
           CAST(ROUND(az, 4) AS DOUBLE) + 0.0 AS abs_z,
           CAST(ROUND(pv, 6) AS DOUBLE) + 0.0 AS p_value,
           CAST(i AS BIGINT) AS bh_rank,
           COALESCE(i <= k, FALSE) AS discovery
    FROM kstar
    """,
)
def bh_fdr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which nations' balance means differ from global, at 5% FALSE
    DISCOVERY RATE rather than per-test alpha? Step-up: largest i with
    p_(i) <= alpha*i/m; all ranks at or below are discoveries."""
    c = Catalog(spark, sf_dir).customer
    s6 = _dec(F.col("c_acctbal"), 18, 6)
    s16 = _dec(F.col("c_acctbal"), 16, 6)
    g = c.agg(
        (F.sum(s6).cast("double") / F.count(F.lit(1))).alias("mu"),
        F.sqrt(
            (
                F.sum(s16 * s16).cast("double")
                - F.sum(s6).cast("double")
                * F.sum(s6).cast("double")
                / F.count(F.lit(1))
            )
            / F.count(F.lit(1))
        ).alias("sd"),
    )
    nat = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(s6).cast("double") / F.count(F.lit(1))).alias("m"),
    )
    z = nat.crossJoin(F.broadcast(g)).select(
        "c_nationkey",
        "n",
        F.abs(
            (F.col("m") - F.col("mu"))
            / (F.col("sd") / F.sqrt(F.col("n")))
        ).alias("az"),
    )
    t = 1 / (1 + 0.3275911 * F.col("az") / F.sqrt(F.lit(2.0)))
    pv = (
        0.254829592 * t
        - 0.284496736 * F.pow(t, 2)
        + 1.421413741 * F.pow(t, 3)
        - 1.453152027 * F.pow(t, 4)
        + 1.061405429 * F.pow(t, 5)
    ) * F.exp(-F.col("az") * F.col("az") / 2.0)
    p = z.withColumn("pv", pv)
    wr = Window.orderBy("pv", "c_nationkey")
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = p.select(
        "c_nationkey",
        "n",
        "az",
        "pv",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wt).alias("m_tests"),
    )
    kstar = ranked.withColumn(
        "k",
        F.max(
            F.when(
                F.col("pv") <= 0.05 * F.col("i") / F.col("m_tests"),
                F.col("i"),
            )
        ).over(wt),
    )
    return kstar.select(
        "c_nationkey",
        F.col("n").cast("long").alias("n_customers"),
        (F.round(F.col("az"), 4) + F.lit(0.0)).alias("abs_z"),
        (F.round(F.col("pv"), 6) + F.lit(0.0)).alias("p_value"),
        F.col("i").cast("long").alias("bh_rank"),
        F.coalesce(F.col("i") <= F.col("k"), F.lit(False)).alias(
            "discovery"
        ),
    )


# Granger causality (1 lag): does yesterday's CLICK level improve the
# prediction of today's PURCHASE level beyond yesterday's purchase
# level alone? Unrestricted OLS y_t ~ a + b1*y_{t-1} + b2*x_{t-1} vs
# restricted y_t ~ a + b*y_{t-1}; F = (RSS_r - RSS_u) * (n-3) / RSS_u.
# Both regressions are closed-form (2x2 normal equations by Cramer's
# rule) over centered cross-moments; every input is DECIMAL-quantized
# at the daily aggregate so lagging, differencing, and the six cross
# products are exact, and each product is re-quantized to
# DECIMAL(28,12) before its sum. The windows run over the
# calendar-bounded daily frame.
@register(
    "granger_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(value AS DECIMAL(18,6)) END)
                    AS DOUBLE)
                    / SUM(CASE WHEN event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS DECIMAL(18,6)) AS y,
               CAST(CAST(SUM(CASE WHEN event_type = 'click'
                        THEN CAST(value AS DECIMAL(18,6)) END)
                    AS DOUBLE)
                    / SUM(CASE WHEN event_type = 'click'
                          THEN 1 ELSE 0 END) AS DECIMAL(18,6)) AS x
        FROM events WHERE event_type IN ('purchase', 'click')
        GROUP BY CAST(ts AS DATE)
    ),
    lagged AS (
        SELECT y AS w,
               LAG(y) OVER (ORDER BY day) AS z1,
               LAG(x) OVER (ORDER BY day) AS z2
        FROM daily
    ),
    pp AS (
        SELECT CAST(w AS DECIMAL(16,6)) AS w,
               CAST(z1 AS DECIMAL(16,6)) AS z1,
               CAST(z2 AS DECIMAL(16,6)) AS z2
        FROM lagged WHERE z1 IS NOT NULL AND z2 IS NOT NULL
    ),
    s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(w) AS DOUBLE) AS sw,
               CAST(SUM(z1) AS DOUBLE) AS s1,
               CAST(SUM(z2) AS DOUBLE) AS s2,
               CAST(SUM(w * w) AS DOUBLE) AS sww,
               CAST(SUM(z1 * z1) AS DOUBLE) AS s11,
               CAST(SUM(z2 * z2) AS DOUBLE) AS s22,
               CAST(SUM(z1 * z2) AS DOUBLE) AS s12,
               CAST(SUM(z1 * w) AS DOUBLE) AS s1w,
               CAST(SUM(z2 * w) AS DOUBLE) AS s2w
        FROM pp
    ),
    c AS (
        SELECT n,
               sww - sw * sw / n AS cww,
               s11 - s1 * s1 / n AS c11,
               s22 - s2 * s2 / n AS c22,
               s12 - s1 * s2 / n AS c12,
               s1w - s1 * sw / n AS c1w,
               s2w - s2 * sw / n AS c2w
        FROM s
    ),
    fit AS (
        SELECT n,
               (c1w * c22 - c2w * c12) / (c11 * c22 - c12 * c12) AS b1,
               (c2w * c11 - c1w * c12) / (c11 * c22 - c12 * c12) AS b2,
               cww, c1w, c2w, c11
        FROM c
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           CAST(ROUND(b1, 6) AS DOUBLE) + 0.0 AS beta_y_lag,
           CAST(ROUND(b2, 6) AS DOUBLE) + 0.0 AS beta_x_lag,
           CAST(ROUND(((cww - c1w * c1w / c11)
                       - (cww - b1 * c1w - b2 * c2w)) * (n - 3)
                   / (cww - b1 * c1w - b2 * c2w), 6) AS DOUBLE) + 0.0
               AS f_stat
    FROM fit
    """,
)
def granger_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F > ~4 at these df suggests clicks carry next-day predictive
    information for purchases. Pairs with dickey_fuller_q (run it
    first: Granger on unit-root series is spurious)."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type").isin("purchase", "click")
    )
    v6 = _dec(F.col("value"), 18, 6)
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        (
            F.sum(F.when(F.col("event_type") == "purchase", v6))
            .cast("double")
            / F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
        )
        .cast("decimal(18,6)")
        .alias("y"),
        (
            F.sum(F.when(F.col("event_type") == "click", v6))
            .cast("double")
            / F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            )
        )
        .cast("decimal(18,6)")
        .alias("x"),
    )
    wday = Window.orderBy("day")
    lagged = daily.select(
        F.col("y").alias("w0"),
        F.lag("y").over(wday).alias("l1"),
        F.lag("x").over(wday).alias("l2"),
    ).filter(F.col("l1").isNotNull() & F.col("l2").isNotNull())
    pp = lagged.select(
        F.col("w0").cast("decimal(16,6)").alias("w"),
        F.col("l1").cast("decimal(16,6)").alias("z1"),
        F.col("l2").cast("decimal(16,6)").alias("z2"),
    )
    s = pp.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("w").cast("double").alias("sw"),
        F.sum("z1").cast("double").alias("s1"),
        F.sum("z2").cast("double").alias("s2"),
        F.sum(F.col("w") * F.col("w")).cast("double").alias("sww"),
        F.sum(F.col("z1") * F.col("z1")).cast("double").alias("s11"),
        F.sum(F.col("z2") * F.col("z2")).cast("double").alias("s22"),
        F.sum(F.col("z1") * F.col("z2")).cast("double").alias("s12"),
        F.sum(F.col("z1") * F.col("w")).cast("double").alias("s1w"),
        F.sum(F.col("z2") * F.col("w")).cast("double").alias("s2w"),
    )
    n = F.col("n")
    cww = F.col("sww") - F.col("sw") * F.col("sw") / n
    c11 = F.col("s11") - F.col("s1") * F.col("s1") / n
    c22 = F.col("s22") - F.col("s2") * F.col("s2") / n
    c12 = F.col("s12") - F.col("s1") * F.col("s2") / n
    c1w = F.col("s1w") - F.col("s1") * F.col("sw") / n
    c2w = F.col("s2w") - F.col("s2") * F.col("sw") / n
    det = c11 * c22 - c12 * c12
    b1 = (c1w * c22 - c2w * c12) / det
    b2 = (c2w * c11 - c1w * c12) / det
    rss_u = cww - b1 * c1w - b2 * c2w
    rss_r = cww - c1w * c1w / c11
    return s.select(
        n.cast("long").alias("n_obs"),
        (F.round(b1, 6) + F.lit(0.0)).alias("beta_y_lag"),
        (F.round(b2, 6) + F.lit(0.0)).alias("beta_x_lag"),
        (
            F.round((rss_r - rss_u) * (n - 3) / rss_u, 6) + F.lit(0.0)
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 4 (continued): experimentation statistics
# (Welch's t, sequential SPRT, power analysis) and the seasonal-strength
# summary of the STL decomposition. One corpus pass each; everything
# after the per-group moments is scalar arithmetic.
# ---------------------------------------------------------------------------


# Welch's unequal-variance t-test with Cohen's d for the two user
# cohorts' per-user purchase totals (same cohorts and per-user
# reduction as permutation_test_q, so the parametric and randomization
# answers are directly comparable). Per-arm moments come from exact
# DECIMAL sums; t, the Welch-Satterthwaite df, and pooled-sd Cohen's d
# are scalar arithmetic on six numbers. Sample (n-1) variances.
@register(
    "welch_ttest_q",
    """
    WITH u AS (
        SELECT user_id % 2 AS arm,
               SUM(CAST(value AS DECIMAL(18,6))) AS tot
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    m AS (
        SELECT arm, COUNT(*) AS n,
               CAST(SUM(tot) AS DOUBLE) AS s,
               -- width >= 19 keeps DuckDB on the int128 multiply
               -- path (the Spark twin uses decimal(16,6): see anova_f_q)
               CAST(SUM(CAST(tot AS DECIMAL(19,6))
                        * CAST(tot AS DECIMAL(19,6))) AS DOUBLE) AS q
        FROM u GROUP BY arm
    ),
    w AS (
        SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
               MAX(CASE WHEN arm = 1 THEN n END) AS n1,
               MAX(CASE WHEN arm = 0 THEN s / n END) AS m0,
               MAX(CASE WHEN arm = 1 THEN s / n END) AS m1,
               MAX(CASE WHEN arm = 0 THEN (q - s * s / n) / (n - 1) END)
                   AS v0,
               MAX(CASE WHEN arm = 1 THEN (q - s * s / n) / (n - 1) END)
                   AS v1
        FROM m
    )
    SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           CAST(ROUND(m0 - m1, 6) AS DOUBLE) + 0.0 AS mean_diff,
           CAST(ROUND((m0 - m1) / sqrt(v0 / n0 + v1 / n1), 6)
               AS DOUBLE) + 0.0 AS t_stat,
           CAST(ROUND(pow(v0 / n0 + v1 / n1, 2)
               / (pow(v0 / n0, 2) / (n0 - 1)
                  + pow(v1 / n1, 2) / (n1 - 1)), 4) AS DOUBLE) + 0.0
               AS welch_df,
           CAST(ROUND((m0 - m1) / sqrt(((n0 - 1) * v0 + (n1 - 1) * v1)
               / (n0 + n1 - 2)), 6) AS DOUBLE) + 0.0 AS cohens_d
    FROM w
    """,
)
def welch_ttest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The parametric companion to permutation_test_q on the same
    cohort split: t, Welch-Satterthwaite df, and the pooled-sd effect
    size in one row."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    u = e.groupBy("user_id").agg(
        F.sum(_dec(F.col("value"), 18, 6)).alias("tot")
    ).withColumn("arm", F.col("user_id") % 2)
    t16 = F.col("tot").cast("decimal(16,6)")
    m = u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("tot").cast("double").alias("s"),
        F.sum(t16 * t16).cast("double").alias("q"),
    )

    def arm(col, a):
        return F.max(F.when(F.col("arm") == a, col))

    w = m.agg(
        arm(F.col("n"), 0).alias("n0"),
        arm(F.col("n"), 1).alias("n1"),
        arm(F.col("s") / F.col("n"), 0).alias("m0"),
        arm(F.col("s") / F.col("n"), 1).alias("m1"),
        arm(
            (F.col("q") - F.col("s") * F.col("s") / F.col("n"))
            / (F.col("n") - 1),
            0,
        ).alias("v0"),
        arm(
            (F.col("q") - F.col("s") * F.col("s") / F.col("n"))
            / (F.col("n") - 1),
            1,
        ).alias("v1"),
    )
    se2 = F.col("v0") / F.col("n0") + F.col("v1") / F.col("n1")
    dfw = F.pow(se2, 2) / (
        F.pow(F.col("v0") / F.col("n0"), 2) / (F.col("n0") - 1)
        + F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
    )
    pooled = F.sqrt(
        ((F.col("n0") - 1) * F.col("v0") + (F.col("n1") - 1) * F.col("v1"))
        / (F.col("n0") + F.col("n1") - 2)
    )
    diff = F.col("m0") - F.col("m1")
    return w.select(
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        (F.round(diff, 6) + F.lit(0.0)).alias("mean_diff"),
        (F.round(diff / F.sqrt(se2), 6) + F.lit(0.0)).alias("t_stat"),
        (F.round(dfw, 4) + F.lit(0.0)).alias("welch_df"),
        (F.round(diff / pooled, 6) + F.lit(0.0)).alias("cohens_d"),
    )


# Seasonal strength and trend strength of the daily view-event series,
# from the same STL-lite decomposition as stl_decompose_q:
# F_seasonal = max(0, 1 - var(resid)/var(seasonal+resid)),
# F_trend = max(0, 1 - var(resid)/var(detrended... trend+resid)) —
# Hyndman's definitions. Every component is DECIMAL-quantized (the
# stl_decompose_q discipline) and the variances reduce over the
# calendar-bounded daily frame; the max(0,·) clamp also normalizes any
# negative zero.
@register(
    "seasonal_strength_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7
                   AS dow,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events WHERE event_type = 'view'
        GROUP BY CAST(ts AS DATE),
                 date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7
    ),
    trended AS (
        SELECT day, dow, m,
               CAST(CAST(SUM(m) OVER (ORDER BY day
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                    AS DOUBLE)
                    / COUNT(*) OVER (ORDER BY day
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                    AS DECIMAL(18,6)) AS trend
        FROM daily
    ),
    seasoned AS (
        SELECT day, m, trend,
               CAST(CAST(SUM(m - trend) OVER (PARTITION BY dow)
                    AS DOUBLE) / COUNT(*) OVER (PARTITION BY dow)
                    AS DECIMAL(18,6)) AS seasonal
        FROM trended
    ),
    comp AS (
        SELECT CAST(m - trend - seasonal AS DOUBLE) AS r,
               CAST(m - trend AS DOUBLE) AS sr,
               CAST(m - seasonal AS DOUBLE) AS tr
        FROM seasoned
    ),
    v AS (
        SELECT COUNT(*) AS n,
               (SUM(r * r) - SUM(r) * SUM(r) / COUNT(*)) / COUNT(*)
                   AS vr,
               (SUM(sr * sr) - SUM(sr) * SUM(sr) / COUNT(*)) / COUNT(*)
                   AS vsr,
               (SUM(tr * tr) - SUM(tr) * SUM(tr) / COUNT(*)) / COUNT(*)
                   AS vtr
        FROM comp
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           greatest(0.0, CAST(ROUND(1 - vr / vsr, 6) AS DOUBLE))
               AS seasonal_strength,
           greatest(0.0, CAST(ROUND(1 - vr / vtr, 6) AS DOUBLE))
               AS trend_strength
    FROM v
    """,
)
def seasonal_strength_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row summary answering 'is this series worth deseasonalizing
    before anomaly detection?' — the scalar view of stl_decompose_q.
    Variance sums run over ~30 rows (centered-window means are already
    DECIMAL), so plain double sums are deterministic here only because
    the frame is single-partition calendar metadata; the quantized
    components keep both engines bit-identical."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "view"
    )
    daily = e.groupBy(
        F.to_date("ts").alias("day"),
        (F.datediff(F.to_date("ts"), F.lit("2024-01-01")) % 7).alias(
            "dow"
        ),
    ).agg(
        (
            F.sum(_dec(F.col("value"), 18, 6)).cast("double")
            / F.count(F.lit(1))
        )
        .cast("decimal(18,6)")
        .alias("m")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    trended = daily.withColumn(
        "trend",
        (
            F.sum("m").over(w7).cast("double")
            / F.count(F.lit(1)).over(w7)
        ).cast("decimal(18,6)"),
    )
    wdow = Window.partitionBy("dow")
    seasoned = trended.withColumn(
        "seasonal",
        (
            F.sum(F.col("m") - F.col("trend")).over(wdow).cast("double")
            / F.count(F.lit(1)).over(wdow)
        ).cast("decimal(18,6)"),
    )
    comp = seasoned.select(
        (F.col("m") - F.col("trend") - F.col("seasonal"))
        .cast("double")
        .alias("r"),
        (F.col("m") - F.col("trend")).cast("double").alias("sr"),
        (F.col("m") - F.col("seasonal")).cast("double").alias("tr"),
    )

    def pvar(c):
        return (
            F.sum(c * c) - F.sum(c) * F.sum(c) / F.count(F.lit(1))
        ) / F.count(F.lit(1))

    v = comp.agg(
        F.count(F.lit(1)).alias("n"),
        pvar(F.col("r")).alias("vr"),
        pvar(F.col("sr")).alias("vsr"),
        pvar(F.col("tr")).alias("vtr"),
    )
    return v.select(
        F.col("n").cast("long").alias("n_days"),
        F.greatest(
            F.lit(0.0), F.round(1 - F.col("vr") / F.col("vsr"), 6)
        ).alias("seasonal_strength"),
        F.greatest(
            F.lit(0.0), F.round(1 - F.col("vr") / F.col("vtr"), 6)
        ).alias("trend_strength"),
    )


# Wald SPRT on the user-level conversion stream (H0: p = 0.5 vs H1:
# p = 0.6 that a user converts, i.e. has >= 1 purchase event), walked
# in user_id order: LLR_t = n1_t*ln(p1/p0) + (t - n1_t)*ln(q1/q0),
# stop when LLR crosses ln((1-beta)/alpha) (accept H1) or
# ln(beta/(1-alpha)) (accept H0), alpha = beta = 0.05. The cumulative
# SUCCESS COUNT — the only corpus-scale running quantity — comes from
# operators.indexing.global_cumsum (range-partitioned, exact integers,
# never a single-partition window); the LLR is per-row arithmetic on
# two integers. The oracle keeps plain ANSI windows.
@register(
    "sprt_q",
    """
    WITH u AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS x
        FROM events GROUP BY user_id
    ),
    walk AS (
        SELECT user_id,
               ROW_NUMBER() OVER (ORDER BY user_id) AS t,
               SUM(x) OVER (ORDER BY user_id) AS n1
        FROM u
    ),
    llr AS (
        SELECT t, n1,
               n1 * ln(0.6 / 0.5) + (t - n1) * ln(0.4 / 0.5) AS l
        FROM walk
    )
    SELECT CAST(MAX(t) AS BIGINT) AS n_trials,
           CAST(MAX(CASE WHEN t = (SELECT MAX(t) FROM llr) THEN n1 END)
               AS BIGINT) AS n_success,
           CAST(ROUND(MAX(CASE WHEN t = (SELECT MAX(t) FROM llr)
               THEN l END), 6) AS DOUBLE) + 0.0 AS final_llr,
           CAST(MIN(CASE WHEN l >= ln(19.0) THEN t END) AS BIGINT)
               AS first_accept_h1_t,
           CAST(MIN(CASE WHEN l <= -ln(19.0) THEN t END) AS BIGINT)
               AS first_accept_h0_t
    FROM llr
    """,
)
def sprt_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential testing: how early would the conversion experiment
    have stopped? Crossing times are exact because the walk state is
    two integers; ln enters only per-row, as in zipf_fit_q."""
    from iniz_exporters_spark.operators.indexing import (
        global_cumsum,
        global_index,
    )

    e = Catalog(spark, sf_dir).events
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("x")
    )
    walk = global_index(u, "user_id", "t")
    walk = global_cumsum(walk, ["user_id"], "x", "n1")
    import math as _math

    la = _math.log(0.6 / 0.5)
    lb = _math.log(0.4 / 0.5)
    thr = _math.log(19.0)
    llr = walk.select(
        "t",
        "n1",
        (F.col("n1") * la + (F.col("t") - F.col("n1")) * lb).alias("l"),
    )
    tmax = llr.agg(F.max("t").alias("tm"))
    return (
        llr.crossJoin(F.broadcast(tmax))
        .agg(
            F.max("t").cast("long").alias("n_trials"),
            F.max(F.when(F.col("t") == F.col("tm"), F.col("n1")))
            .cast("long")
            .alias("n_success"),
            (
                F.round(
                    F.max(F.when(F.col("t") == F.col("tm"), F.col("l"))),
                    6,
                )
                + F.lit(0.0)
            ).alias("final_llr"),
            F.min(F.when(F.col("l") >= thr, F.col("t")))
            .cast("long")
            .alias("first_accept_h1_t"),
            F.min(F.when(F.col("l") <= -thr, F.col("t")))
            .cast("long")
            .alias("first_accept_h0_t"),
        )
    )


# Per-component structure report over the order-chain graph (the
# star_components_q edge set): nodes, edges, density 2m/(n(n-1)), and
# is_tree (m = n-1). Components come from the O(log n)-round
# star-contraction in plans/graph.py; edges re-join to their component
# by src endpoint (both endpoints agree by construction). The oracle
# exploits the STRUCTURAL ground truth instead of re-running a CC
# algorithm: the chain edges are built per customer, so each customer
# with k >= 2 orders is exactly one k-node path — a stronger
# independent check than a second traversal. Density buckets the
# report to one row per (n_nodes, n_edges) shape — metadata scale.
@register(
    "component_density_q",
    """
    WITH per_cust AS (
        SELECT o_custkey, COUNT(*) AS n
        FROM orders WHERE o_custkey % 100 = 0
        GROUP BY o_custkey
    )
    SELECT n AS n_nodes, n - 1 AS n_edges,
           CAST(COUNT(*) AS BIGINT) AS n_components,
           CAST(ROUND(2.0 / n, 6) AS DOUBLE) AS density,
           TRUE AS is_tree
    FROM per_cust WHERE n >= 2
    GROUP BY n
    """,
)
def component_density_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape census of the near-dup-style chain graph: how many
    components of each (nodes, edges) shape, their density, and
    whether they are trees. Grouping to shapes keeps the output
    component-count-free (metadata-scale rows)."""
    from iniz_exporters_spark.plans.graph import connected_components

    o = Catalog(spark, sf_dir).orders.filter(F.col("o_custkey") % 100 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    edges = (
        o.select(
            F.col("o_orderkey").alias("dst"),
            F.lag("o_orderkey").over(w).alias("src"),
        )
        .filter(F.col("src").isNotNull())
        .select("src", "dst")
    )
    comps = connected_components(edges, method="star")
    cn = comps.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_nodes")
    )
    ce = (
        edges.join(comps.withColumnRenamed("node", "src"), "src")
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    shaped = cn.join(ce, "component")
    return shaped.groupBy("n_nodes", "n_edges").agg(
        F.count(F.lit(1)).cast("long").alias("n_components"),
        F.round(
            2.0
            * F.first("n_edges")
            / (F.first("n_nodes") * (F.first("n_nodes") - 1)),
            6,
        ).alias("density"),
        (F.first("n_edges") == F.first("n_nodes") - 1).alias("is_tree"),
    )


# A/B power analysis sized FROM the observed data: n per arm to detect
# a 5% lift of the mean per-user purchase total at alpha = 0.05 (two-
# sided), power = 0.80, using the normal approximation
# n = 2 (z_{1-a/2} + z_{1-b})^2 sigma^2 / delta^2. Moments come from
# the same exact-DECIMAL per-user reduction as welch_ttest_q; the z
# quantiles are fixed literals (1.959963985, 0.8416212336), so the
# only data-dependent float math is the final scalar formula. ceil is
# applied to a 6-dp-rounded ratio so an engine ulp can never straddle
# the integer boundary.
@register(
    "power_analysis_q",
    """
    WITH u AS (
        SELECT SUM(CAST(value AS DECIMAL(18,6))) AS tot
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    m AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(tot) AS DOUBLE) / COUNT(*) AS mu,
               (CAST(SUM(CAST(tot AS DECIMAL(19,6))
                         * CAST(tot AS DECIMAL(19,6))) AS DOUBLE)
                - CAST(SUM(tot) AS DOUBLE) * CAST(SUM(tot) AS DOUBLE)
                  / COUNT(*)) / (COUNT(*) - 1) AS var_s
        FROM u
    )
    SELECT CAST(n AS BIGINT) AS n_observed,
           CAST(ROUND(mu, 6) AS DOUBLE) + 0.0 AS mean_total,
           CAST(ROUND(sqrt(var_s), 6) AS DOUBLE) + 0.0 AS sd_total,
           CAST(ROUND(0.05 * mu, 6) AS DOUBLE) + 0.0 AS mde_abs,
           CAST(ceil(ROUND(
               2 * pow(1.959963985 + 0.8416212336, 2) * var_s
               / pow(0.05 * mu, 2), 6)) AS BIGINT) AS n_per_arm
    FROM m
    """,
)
def power_analysis_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many users per arm would the purchase-total experiment need
    to see a 5% lift? Sizing computed from the corpus's own moments —
    the planning companion to welch_ttest_q / permutation_test_q."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    u = e.groupBy("user_id").agg(
        F.sum(_dec(F.col("value"), 18, 6)).alias("tot")
    )
    t16 = F.col("tot").cast("decimal(16,6)")
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("tot").cast("double") / F.count(F.lit(1))).alias("mu"),
        (
            (
                F.sum(t16 * t16).cast("double")
                - F.sum("tot").cast("double")
                * F.sum("tot").cast("double")
                / F.count(F.lit(1))
            )
            / (F.count(F.lit(1)) - 1)
        ).alias("var_s"),
    )
    za, zb = 1.959963985, 0.8416212336
    return m.select(
        F.col("n").cast("long").alias("n_observed"),
        (F.round(F.col("mu"), 6) + F.lit(0.0)).alias("mean_total"),
        (F.round(F.sqrt(F.col("var_s")), 6) + F.lit(0.0)).alias(
            "sd_total"
        ),
        (F.round(0.05 * F.col("mu"), 6) + F.lit(0.0)).alias("mde_abs"),
        F.ceil(
            F.round(
                2
                * F.pow(F.lit(za + zb), 2)
                * F.col("var_s")
                / F.pow(0.05 * F.col("mu"), 2),
                6,
            )
        )
        .cast("long")
        .alias("n_per_arm"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 4 (continued): the autocorrelation function,
# inequality decomposition, spatial autocorrelation, ANOVA post-hoc
# pairs, and a 3-iteration unrolled soft-clustering EM. The clustering
# one deliberately uses RATIONAL membership weights (fuzzy c-means'
# inverse-square-distance), not Gaussian responsibilities: +,-,x,/ are
# correctly rounded IEEE ops, bit-identical on every engine, whereas a
# per-row exp() could differ by an ulp between libms.
# ---------------------------------------------------------------------------


# Sample autocorrelation function of daily purchase revenue at lags
# 1..7: r_k = sum(dev_t * dev_{t+k}) / sum(dev_t^2) with deviations
# from the DECIMAL-quantized series mean, so every product in both
# sums is exact and order-independent. One corpus aggregation; the
# 7 lag passes are windows over the calendar-bounded daily frame.
@register(
    "acf_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    mu AS (
        SELECT CAST(CAST(SUM(m) AS DOUBLE) / COUNT(*) AS DECIMAL(18,6))
            AS ybar, COUNT(*) AS n
        FROM daily
    ),
    dev AS (
        SELECT day, CAST(m - (SELECT ybar FROM mu) AS DECIMAL(16,6))
            AS d
        FROM daily
    ),
    lags AS (
        SELECT l.lag, d1.d AS a, d2.d AS b
        FROM (SELECT unnest(range(1, 8)) AS lag) l
        JOIN dev d1 ON TRUE
        JOIN dev d2 ON d2.day = d1.day + CAST(l.lag AS INTEGER)
    ),
    den AS (
        SELECT CAST(SUM(d * d) AS DOUBLE) AS ss FROM dev
    )
    SELECT CAST(lag AS BIGINT) AS lag,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(ROUND(CAST(SUM(a * b) AS DOUBLE)
               / (SELECT ss FROM den), 6) AS DOUBLE) + 0.0 AS acf
    FROM lags GROUP BY lag
    """,
)
def acf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full short-lag correlogram (rolling_autocorr_q tracks only a
    windowed lag-1); feeds the ljung_box_q portmanteau and the weekly
    seasonality read (expect a bump at lag 7)."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        (
            F.sum(_dec(F.col("value"), 18, 6)).cast("double")
            / F.count(F.lit(1))
        )
        .cast("decimal(18,6)")
        .alias("m")
    )
    mu = daily.agg(
        (F.sum("m").cast("double") / F.count(F.lit(1)))
        .cast("decimal(18,6)")
        .alias("ybar")
    )
    dev = daily.crossJoin(F.broadcast(mu)).select(
        "day",
        (F.col("m") - F.col("ybar")).cast("decimal(16,6)").alias("d"),
    )
    den = dev.agg(
        F.sum(F.col("d") * F.col("d")).cast("double").alias("ss")
    )
    lags = daily.sparkSession.range(1, 8).select(
        F.col("id").cast("int").alias("lag")
    )
    d1 = dev.select(F.col("day").alias("day1"), F.col("d").alias("a"))
    d2 = dev.select(F.col("day").alias("day2"), F.col("d").alias("b"))
    pairs = (
        d1.crossJoin(F.broadcast(lags))
        .join(
            d2,
            F.col("day2")
            == F.date_add(F.col("day1"), F.col("lag")),
        )
    )
    return (
        pairs.groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("a") * F.col("b")).alias("sab"),
        )
        .crossJoin(F.broadcast(den))
        .select(
            F.col("lag").cast("long").alias("lag"),
            "n_pairs",
            (
                F.round(F.col("sab").cast("double") / F.col("ss"), 6)
                + F.lit(0.0)
            ).alias("acf"),
        )
    )


# Theil-T inequality index of order prices, decomposed by customer
# nation: T = T_between + T_within with
# T_between = sum_g (s_g) ln(mu_g/mu)  [s_g = group income share],
# T_within  = sum_g  s_g * T_g. Per-row work is one ln (the same
# accepted float class as ccnet/zipf); x ln x terms are
# DECIMAL(28,12)-quantized before their corpus-scale sums so addition
# order never moves the result. One shuffle keyed by nation.
@register(
    "theil_index_q",
    """
    WITH x AS (
        SELECT c.c_nationkey AS nat, o.o_totalprice AS x
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    g AS (
        SELECT nat, COUNT(*) AS n,
               CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS s,
               CAST(SUM(CAST(x * ln(x) AS DECIMAL(28,12))) AS DOUBLE)
                   AS sxlx
        FROM x GROUP BY nat
    ),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(CAST(s AS DECIMAL(28,12))) AS DOUBLE) AS s,
               CAST(SUM(CAST(sxlx AS DECIMAL(28,12))) AS DOUBLE) AS sxlx
        FROM g
    ),
    parts AS (
        SELECT (SELECT sxlx / s FROM tot) - ln((SELECT s / n FROM tot))
                   AS t_total,
               CAST(SUM(CAST((s / (SELECT s FROM tot))
                    * ln((s / n) / (SELECT s / n FROM tot))
                    AS DECIMAL(28,12))) AS DOUBLE) AS t_between
        FROM g
    )
    SELECT (SELECT n FROM tot) AS n_orders,
           CAST(ROUND(t_total, 6) AS DOUBLE) + 0.0 AS theil_total,
           CAST(ROUND(t_between, 6) AS DOUBLE) + 0.0 AS theil_between,
           CAST(ROUND(t_total - t_between, 6) AS DOUBLE) + 0.0
               AS theil_within
    FROM parts
    """,
)
def theil_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much order-value inequality lives BETWEEN nations vs within
    them? Uses the population-share identity T = E[x ln x]/mu/E[x] -
    ln(mu) so the corpus pass needs only (n, sum x, sum x ln x) per
    group — the decomposition is scalar arithmetic on the group table."""
    o = Catalog(spark, sf_dir).orders
    c = Catalog(spark, sf_dir).customer.select("c_custkey", "c_nationkey")
    x = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_nationkey").alias("nat"),
        F.col("o_totalprice").alias("x"),
    )
    g = x.groupBy("nat").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(F.col("x"), 18, 6)).cast("double").alias("s"),
        _dsum(F.col("x") * F.log(F.col("x"))).cast("double").alias("sxlx"),
    )
    tot = g.agg(
        F.sum("n").cast("long").alias("tn"),
        _dsum(F.col("s")).cast("double").alias("ts"),
        _dsum(F.col("sxlx")).cast("double").alias("tsxlx"),
    )
    parts = g.crossJoin(F.broadcast(tot)).agg(
        F.max("tn").alias("n_orders"),
        (
            F.max(F.col("tsxlx") / F.col("ts"))
            - F.log(F.max(F.col("ts") / F.col("tn")))
        ).alias("t_total"),
        _dsum(
            (F.col("s") / F.col("ts"))
            * F.log(
                (F.col("s") / F.col("n")) / (F.col("ts") / F.col("tn"))
            )
        )
        .cast("double")
        .alias("t_between"),
    )
    return parts.select(
        F.col("n_orders").cast("long").alias("n_orders"),
        (F.round(F.col("t_total"), 6) + F.lit(0.0)).alias("theil_total"),
        (F.round(F.col("t_between"), 6) + F.lit(0.0)).alias(
            "theil_between"
        ),
        (
            F.round(F.col("t_total") - F.col("t_between"), 6)
            + F.lit(0.0)
        ).alias("theil_within"),
    )


# Moran's I spatial autocorrelation of nation-level mean account
# balance over the "shares a region" adjacency graph:
# I = (n/W) * sum_ij w_ij z_i z_j / sum_i z_i^2, w_ij = 1 iff same
# region and i != j. One corpus aggregation to nation means; the
# z-scores, the 25x25 adjacency, and the double sum are all
# nation-table metadata (self-join on region).
@register(
    "moran_i_q",
    """
    WITH nm AS (
        SELECT c_nationkey AS nat,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) AS m
        FROM customer GROUP BY c_nationkey
    ),
    nz AS (
        SELECT nm.nat, n.n_regionkey AS region,
               m - (SELECT CAST(SUM(CAST(m AS DECIMAL(28,12)))
                        AS DOUBLE) / COUNT(*) FROM nm) AS z
        FROM nm JOIN nation n ON n.n_nationkey = nm.nat
    ),
    pairs AS (
        SELECT a.z AS za, b.z AS zb
        FROM nz a JOIN nz b
            ON a.region = b.region AND a.nat <> b.nat
    )
    SELECT CAST((SELECT COUNT(*) FROM nz) AS BIGINT) AS n_nations,
           CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_links,
           CAST(ROUND(
               (CAST((SELECT COUNT(*) FROM nz) AS DOUBLE)
                / (SELECT COUNT(*) FROM pairs))
               * CAST((SELECT SUM(CAST(za * zb AS DECIMAL(28,12)))
                       FROM pairs) AS DOUBLE)
               / CAST((SELECT SUM(CAST(z * z AS DECIMAL(28,12)))
                       FROM nz) AS DOUBLE), 6) AS DOUBLE) + 0.0
               AS moran_i
    """,
)
def moran_i_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do same-region nations have correlated balance levels? I > 0 =
    regional clustering, I < 0 = checkerboard; expectation under the
    null is -1/(n-1), not 0."""
    c = Catalog(spark, sf_dir).customer
    n = Catalog(spark, sf_dir).nation.select(
        F.col("n_nationkey").alias("nat"),
        F.col("n_regionkey").alias("region"),
    )
    nm = c.groupBy(F.col("c_nationkey").alias("nat")).agg(
        (
            F.sum(_dec(F.col("c_acctbal"), 18, 6)).cast("double")
            / F.count(F.lit(1))
        ).alias("m")
    )
    mbar = nm.agg(
        (_dsum(F.col("m")).cast("double") / F.count(F.lit(1))).alias(
            "mbar"
        )
    )
    nz = (
        nm.join(F.broadcast(n), "nat")
        .crossJoin(F.broadcast(mbar))
        .select(
            "nat", "region", (F.col("m") - F.col("mbar")).alias("z")
        )
    )
    a = nz.select(
        F.col("region").alias("ra"),
        F.col("nat").alias("na"),
        F.col("z").alias("za"),
    )
    b = nz.select(
        F.col("region").alias("rb"),
        F.col("nat").alias("nb"),
        F.col("z").alias("zb"),
    )
    pairs = a.join(
        b, (F.col("ra") == F.col("rb")) & (F.col("na") != F.col("nb"))
    )
    num = pairs.agg(
        F.count(F.lit(1)).alias("n_links"),
        _dsum(F.col("za") * F.col("zb")).cast("double").alias("cross"),
    )
    den = nz.agg(
        F.count(F.lit(1)).alias("n_nations"),
        _dsum(F.col("z") * F.col("z")).cast("double").alias("ss"),
    )
    return num.crossJoin(F.broadcast(den)).select(
        F.col("n_nations").cast("long").alias("n_nations"),
        F.col("n_links").cast("long").alias("n_links"),
        (
            F.round(
                (F.col("n_nations").cast("double") / F.col("n_links"))
                * F.col("cross")
                / F.col("ss"),
                6,
            )
            + F.lit(0.0)
        ).alias("moran_i"),
    )


# Tukey HSD post-hoc pairs after anova_f_q: for each of the 10 segment
# pairs, the mean difference and the studentized-range criterion
# |diff| > (q_crit/sqrt(2)) * sqrt(MSW*(1/ni+1/nj)) with the
# asymptotic q(k=5, inf, 0.05) = 3.858 as a fixed literal (the
# Tukey-Kramer unequal-n form). Group moments reduce in one pass
# (exact DECIMAL sums); the pair table is k(k-1)/2 rows of scalar
# arithmetic.
@register(
    "tukey_hsd_q",
    """
    WITH g AS (
        SELECT c_mktsegment AS seg, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                   AS s,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(19,6))
                        * CAST(c_acctbal AS DECIMAL(19,6))) AS DOUBLE)
                   AS q
        FROM customer GROUP BY c_mktsegment
    ),
    msw AS (
        SELECT CAST(SUM(CAST(q - s * s / n AS DECIMAL(28,12)))
                    AS DOUBLE)
               / (SUM(n) - COUNT(*)) AS v
        FROM g
    )
    SELECT a.seg AS seg_a, b.seg AS seg_b,
           CAST(ROUND(a.s / a.n - b.s / b.n, 6) AS DOUBLE) + 0.0
               AS mean_diff,
           CAST(ROUND(3.858 / sqrt(2.0)
               * sqrt((SELECT v FROM msw) * (1.0 / a.n + 1.0 / b.n)),
               6) AS DOUBLE) + 0.0 AS hsd_critical,
           abs(a.s / a.n - b.s / b.n)
               > 3.858 / sqrt(2.0)
                 * sqrt((SELECT v FROM msw) * (1.0 / a.n + 1.0 / b.n))
               AS significant
    FROM g a JOIN g b ON a.seg < b.seg
    """,
)
def tukey_hsd_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHICH segment pairs differ, after anova_f_q says SOME do —
    familywise-error-controlled pairwise comparisons."""
    c = Catalog(spark, sf_dir).customer
    s6 = _dec(F.col("c_acctbal"), 18, 6)
    s16 = _dec(F.col("c_acctbal"), 16, 6)
    g = c.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(s6).cast("double").alias("s"),
        F.sum(s16 * s16).cast("double").alias("q"),
    )
    msw = g.agg(
        (
            _dsum(
                F.col("q") - F.col("s") * F.col("s") / F.col("n")
            ).cast("double")
            / (F.sum("n") - F.count(F.lit(1)))
        ).alias("v")
    )
    a = g.select(
        F.col("seg").alias("seg_a"),
        F.col("n").alias("na"),
        (F.col("s") / F.col("n")).alias("ma"),
    )
    b = g.select(
        F.col("seg").alias("seg_b"),
        F.col("n").alias("nb"),
        (F.col("s") / F.col("n")).alias("mb"),
    )
    pairs = a.join(b, F.col("seg_a") < F.col("seg_b")).crossJoin(
        F.broadcast(msw)
    )
    crit = (
        3.858
        / F.sqrt(F.lit(2.0))
        * F.sqrt(F.col("v") * (1.0 / F.col("na") + 1.0 / F.col("nb")))
    )
    diff = F.col("ma") - F.col("mb")
    return pairs.select(
        "seg_a",
        "seg_b",
        (F.round(diff, 6) + F.lit(0.0)).alias("mean_diff"),
        (F.round(crit, 6) + F.lit(0.0)).alias("hsd_critical"),
        (F.abs(diff) > crit).alias("significant"),
    )


def _fcm_oracle(iters: int = 3) -> str:
    """Unrolled fuzzy-c-means oracle: one membership CTE + one centroid
    CTE per iteration, generated so the Spark loop and the SQL stay in
    lockstep. Memberships are inverse-square-distance ratios — pure
    +,-,x,/ on doubles (correctly-rounded IEEE ops, bit-identical
    across engines), never a libm call; weighted sums are
    DECIMAL(28,12)-quantized so partial-sum order cannot move the
    centroids."""
    parts = [
        "x AS (SELECT c_acctbal AS x FROM customer)",
        "c0 AS (SELECT CAST(0.0 AS DOUBLE) AS c1,"
        " CAST(8000.0 AS DOUBLE) AS c2)",
    ]
    for k in range(1, iters + 1):
        p = k - 1
        d1 = f"(x - (SELECT c1 FROM c{p})) * (x - (SELECT c1 FROM c{p}))"
        d2 = f"(x - (SELECT c2 FROM c{p})) * (x - (SELECT c2 FROM c{p}))"
        parts.append(
            f"m{k} AS (SELECT x, ({d2}) / (({d1}) + ({d2})) AS u1 FROM x)"
        )
        parts.append(
            f"""c{k} AS (
        SELECT CAST(SUM(CAST(u1 * u1 * x AS DECIMAL(28,12))) AS DOUBLE)
               / CAST(SUM(CAST(u1 * u1 AS DECIMAL(28,12))) AS DOUBLE)
                   AS c1,
               CAST(SUM(CAST((1 - u1) * (1 - u1) * x AS DECIMAL(28,12)))
                    AS DOUBLE)
               / CAST(SUM(CAST((1 - u1) * (1 - u1) AS DECIMAL(28,12)))
                      AS DOUBLE) AS c2
        FROM m{k})"""
        )
    last = f"c{iters}"
    joined = ",\n    ".join(parts)
    return f"""
    WITH {joined}
    SELECT CAST((SELECT COUNT(*) FROM x) AS BIGINT) AS n_points,
           CAST(ROUND(least(c1, c2), 4) AS DOUBLE) + 0.0 AS centroid_lo,
           CAST(ROUND(greatest(c1, c2), 4) AS DOUBLE) + 0.0
               AS centroid_hi
    FROM {last}
    """


# Fuzzy c-means (m = 2, two clusters, three unrolled iterations) on
# customer account balance. Soft k-means whose membership weights are
# RATIONAL functions of distance — u1 = d2^2/(d1^2+d2^2) — chosen over
# Gaussian-EM responsibilities precisely because they involve no
# exp()/libm call: every arithmetic step is a correctly-rounded IEEE
# op, so both engines walk bit-identical centroid trajectories. Each
# iteration is one corpus pass (map-side partial sums of quantized
# weighted moments); the centroid state between passes is a broadcast
# 1-row frame, never a collect.
@register("fuzzy_cmeans_q", _fcm_oracle(3))
def fuzzy_cmeans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative soft clustering expressed as a 3-stage declarative
    DAG — the 1-D pedagogical twin of operators/clustering.py's
    k-means (which owns the d-dimensional production path)."""
    c = Catalog(spark, sf_dir).customer
    x = c.select(F.col("c_acctbal").alias("x"))
    spark_ = x.sparkSession
    cent = spark_.range(1).select(
        F.lit(0.0).alias("c1"), F.lit(8000.0).alias("c2")
    )
    for _ in range(3):
        m = x.crossJoin(F.broadcast(cent))
        d1 = (F.col("x") - F.col("c1")) * (F.col("x") - F.col("c1"))
        d2 = (F.col("x") - F.col("c2")) * (F.col("x") - F.col("c2"))
        m = m.select("x", (d2 / (d1 + d2)).alias("u1"))
        w1 = F.col("u1") * F.col("u1")
        w2 = (1 - F.col("u1")) * (1 - F.col("u1"))
        cent = m.agg(
            (
                F.sum((w1 * F.col("x")).cast("decimal(28,12)"))
                .cast("double")
                / F.sum(w1.cast("decimal(28,12)")).cast("double")
            ).alias("c1"),
            (
                F.sum((w2 * F.col("x")).cast("decimal(28,12)"))
                .cast("double")
                / F.sum(w2.cast("decimal(28,12)")).cast("double")
            ).alias("c2"),
        )
    n = x.agg(F.count(F.lit(1)).alias("n_points"))
    return cent.crossJoin(F.broadcast(n)).select(
        F.col("n_points").cast("long").alias("n_points"),
        (
            F.round(F.least(F.col("c1"), F.col("c2")), 4) + F.lit(0.0)
        ).alias("centroid_lo"),
        (
            F.round(F.greatest(F.col("c1"), F.col("c2")), 4) + F.lit(0.0)
        ).alias("centroid_hi"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 4 (continued): collocation mining, drawdown,
# market concentration, Pareto ABC inventory classes on the distributed
# rank, and a fixed-basket price index. ABC is the scale showcase: a
# corpus-wide revenue rank + cumulative share with NO single-partition
# window (global_cumsum).
# ---------------------------------------------------------------------------


# Dunning log-likelihood-ratio collocations over document bigrams: the
# G2 statistic 2*sum(O*ln(O/E)) on each bigram's 2x2 contingency table
# — the robust big-counts companion to token_pmi_q (PMI overweights
# rare pairs; LLR doesn't). Counts are exact from two token-stream
# aggregations; the per-bigram G2 arithmetic runs on the BIGRAM
# VOCABULARY table. ln(0)-free by the 0*ln(0)=0 convention (terms with
# O=0 are dropped in both engines identically). Top 30 by (G2, bigram).
@register(
    "collocation_llr_q",
    f"""
    WITH t AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS w,
               generate_subscripts({_SQL_TOKENS}, 1) AS pos
        FROM documents
    ),
    bg AS (
        SELECT a.w AS w1, b.w AS w2, COUNT(*) AS o11
        FROM t a JOIN t b
            ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        GROUP BY a.w, b.w
    ),
    tot AS (SELECT CAST(SUM(o11) AS DOUBLE) AS n FROM bg),
    marg1 AS (SELECT w1, SUM(o11) AS c1 FROM bg GROUP BY w1),
    marg2 AS (SELECT w2, SUM(o11) AS c2 FROM bg GROUP BY w2),
    cells AS (
        SELECT bg.w1, bg.w2, bg.o11,
               m1.c1 - bg.o11 AS o12,
               m2.c2 - bg.o11 AS o21,
               (SELECT n FROM tot) - m1.c1 - m2.c2 + bg.o11 AS o22,
               m1.c1 AS c1, m2.c2 AS c2, (SELECT n FROM tot) AS n
        FROM bg JOIN marg1 m1 ON m1.w1 = bg.w1
                JOIN marg2 m2 ON m2.w2 = bg.w2
    ),
    g2 AS (
        SELECT w1, w2, o11,
               2 * ((CASE WHEN o11 > 0 THEN o11 * ln(o11 * n / (c1 * c2))
                          ELSE 0 END)
                  + (CASE WHEN o12 > 0 THEN o12 * ln(o12 * n / (c1 * (n - c2)))
                          ELSE 0 END)
                  + (CASE WHEN o21 > 0 THEN o21 * ln(o21 * n / ((n - c1) * c2))
                          ELSE 0 END)
                  + (CASE WHEN o22 > 0 THEN o22 * ln(o22 * n / ((n - c1) * (n - c2)))
                          ELSE 0 END)) AS llr
        FROM cells
    )
    SELECT w1, w2, CAST(o11 AS BIGINT) AS n_cooc,
           CAST(ROUND(llr, 4) AS DOUBLE) + 0.0 AS llr
    FROM g2
    ORDER BY llr DESC, w1, w2 LIMIT 30
    """,
)
def collocation_llr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which word pairs co-occur far beyond chance? Dunning 1993's G2
    over adjacent-token bigrams; scale shape is two vocabulary-keyed
    shuffles and scalar math on the bigram table."""
    d = Catalog(spark, sf_dir).documents
    t = d.select(
        "doc_id", F.posexplode(_tokens("text")).alias("pos", "w")
    )
    # adjacent pairs via LEAD over the per-document partition (bounded
    # by document length) — one shuffle of the token stream, not the
    # two a positional self-join would move
    wl = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        t.withColumn("w2", F.lead("w").over(wl))
        .filter(F.col("w2").isNotNull())
        .groupBy(F.col("w").alias("w1"), "w2")
        .agg(F.count(F.lit(1)).alias("o11"))
    )
    tot = bg.agg(F.sum("o11").cast("double").alias("n"))
    m1 = bg.groupBy("w1").agg(F.sum("o11").alias("c1"))
    m2 = bg.groupBy("w2").agg(F.sum("o11").alias("c2"))
    cells = (
        bg.join(m1, "w1")
        .join(m2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "o11",
            (F.col("c1") - F.col("o11")).alias("o12"),
            (F.col("c2") - F.col("o11")).alias("o21"),
            (F.col("n") - F.col("c1") - F.col("c2") + F.col("o11")).alias(
                "o22"
            ),
            "c1",
            "c2",
            "n",
        )
    )

    def term(o, e_num, e_den):
        return F.when(
            o > 0, o * F.log(o * F.col("n") / (e_num * e_den))
        ).otherwise(F.lit(0.0))

    llr = 2 * (
        term(F.col("o11"), F.col("c1"), F.col("c2"))
        + term(F.col("o12"), F.col("c1"), F.col("n") - F.col("c2"))
        + term(F.col("o21"), F.col("n") - F.col("c1"), F.col("c2"))
        + term(
            F.col("o22"), F.col("n") - F.col("c1"), F.col("n") - F.col("c2")
        )
    )
    g2 = cells.select(
        "w1",
        "w2",
        F.col("o11").cast("long").alias("n_cooc"),
        (F.round(llr, 4) + F.lit(0.0)).alias("llr"),
    )
    return g2.orderBy(F.col("llr").desc(), "w1", "w2").limit(30)


# Maximum drawdown of cumulative daily purchase revenue: running peak
# minus current equity, reported with peak/trough days. Equity is an
# exact DECIMAL cumulative sum, so peaks, troughs, and the argmax day
# are deterministic. Calendar-bounded windows only.
@register(
    "drawdown_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               SUM(CAST(value AS DECIMAL(18,6))) AS rev
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    pnl AS (
        -- demean so the curve is a trendless P&L with real drawdowns
        -- (raw revenue is positive-only: its cumsum is monotone and
        -- max drawdown would be identically zero at every scale)
        SELECT day,
               rev - (SELECT CAST(CAST(SUM(rev) AS DOUBLE) / COUNT(*)
                          AS DECIMAL(18,6)) FROM daily) AS rev
        FROM daily
    ),
    eq AS (
        SELECT day, SUM(rev) OVER (ORDER BY day) AS equity
        FROM pnl
    ),
    dd AS (
        SELECT day, equity,
               MAX(equity) OVER (ORDER BY day) AS peak
        FROM eq
    ),
    w AS (
        SELECT day, equity, peak, peak - equity AS draw
        FROM dd
    )
    SELECT CAST(ROUND(CAST(MAX(draw) AS DOUBLE), 2) AS DOUBLE) + 0.0
               AS max_drawdown,
           MIN(CASE WHEN draw = (SELECT MAX(draw) FROM w)
               THEN day END) AS trough_day,
           CAST(ROUND(CAST(MAX(equity) AS DOUBLE), 2) AS DOUBLE) + 0.0
               AS final_peak_equity
    FROM w
    """,
)
def drawdown_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst peak-to-trough slide of the revenue equity curve — the
    risk statistic every monitoring dashboard wants next to ohlc_bars_q."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(_dec(F.col("value"), 18, 6)).alias("rev")
    )
    mu = daily.agg(
        (F.sum("rev").cast("double") / F.count(F.lit(1)))
        .cast("decimal(18,6)")
        .alias("mu")
    )
    pnl = daily.crossJoin(F.broadcast(mu)).select(
        "day", (F.col("rev") - F.col("mu")).alias("rev")
    )
    wday = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w = pnl.select(
        "day", F.sum("rev").over(wday).alias("equity")
    ).withColumn("peak", F.max("equity").over(wday))
    w = w.withColumn("draw", F.col("peak") - F.col("equity"))
    mx = w.agg(F.max("draw").alias("mdraw"))
    return (
        w.crossJoin(F.broadcast(mx))
        .agg(
            (F.round(F.max("draw").cast("double"), 2) + F.lit(0.0)).alias(
                "max_drawdown"
            ),
            F.min(
                F.when(F.col("draw") == F.col("mdraw"), F.col("day"))
            ).alias("trough_day"),
            (
                F.round(F.max("equity").cast("double"), 2) + F.lit(0.0)
            ).alias("final_peak_equity"),
        )
    )


# Herfindahl–Hirschman concentration of supplier revenue within each
# supplier nation: HHI = sum_i share_i^2 over a nation's suppliers
# (1/n = perfect competition, 1 = monopoly; HHI > 0.25 is the antitrust
# red line). Revenue reduces exactly per supplier; shares and the HHI
# are per-nation scalar math. Effective competitor count 1/HHI comes
# along for free.
@register(
    "herfindahl_q",
    """
    WITH sr AS (
        SELECT s.s_nationkey AS nat, l.l_suppkey,
               SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS rev
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY s.s_nationkey, l.l_suppkey
    ),
    nt AS (
        SELECT nat, CAST(SUM(rev) AS DOUBLE) AS tot, COUNT(*) AS n_supp
        FROM sr GROUP BY nat
    )
    SELECT sr.nat AS nationkey, CAST(MAX(nt.n_supp) AS BIGINT) AS n_suppliers,
           CAST(ROUND(CAST(SUM(CAST(
               (CAST(rev AS DOUBLE) / nt.tot)
               * (CAST(rev AS DOUBLE) / nt.tot) AS DECIMAL(28,12)))
               AS DOUBLE), 6) AS DOUBLE) + 0.0 AS hhi,
           CAST(ROUND(1.0 / CAST(SUM(CAST(
               (CAST(rev AS DOUBLE) / nt.tot)
               * (CAST(rev AS DOUBLE) / nt.tot) AS DECIMAL(28,12)))
               AS DOUBLE), 4) AS DOUBLE) + 0.0 AS effective_n
    FROM sr JOIN nt ON nt.nat = sr.nat
    GROUP BY sr.nat
    """,
)
def herfindahl_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration census per supplier nation; the inequality
    lens on revenue that gini_q applies to documents."""
    li = Catalog(spark, sf_dir).lineitem
    s = Catalog(spark, sf_dir).supplier.select("s_suppkey", "s_nationkey")
    sr = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy(F.col("s_nationkey").alias("nat"), "l_suppkey")
        .agg(F.sum(_dec(F.col("l_extendedprice"), 18, 4)).alias("rev"))
    )
    nt = sr.groupBy("nat").agg(
        F.sum("rev").cast("double").alias("tot"),
        F.count(F.lit(1)).alias("n_supp"),
    )
    share = F.col("rev").cast("double") / F.col("tot")
    return (
        sr.join(F.broadcast(nt), "nat")
        .groupBy(F.col("nat").alias("nationkey"))
        .agg(
            F.max("n_supp").cast("long").alias("n_suppliers"),
            (
                F.round(_dsum(share * share).cast("double"), 6)
                + F.lit(0.0)
            ).alias("hhi"),
            (
                F.round(1.0 / _dsum(share * share).cast("double"), 4)
                + F.lit(0.0)
            ).alias("effective_n"),
        )
    )


# Pareto ABC inventory classification of parts by lineitem revenue:
# class A = parts covering the first 80% of cumulative revenue share,
# B = next 15%, C = the tail. The revenue rank and cumulative share
# run over the PART-scale table via global_cumsum (range partition +
# broadcast prefix offsets) — at 100 TB the part dimension is still
# millions of rows, and this plan never serializes it into one window
# task (the oracle keeps plain ANSI windows). Revenue is summed as
# exact DECIMAL cents so the cumulative shares are deterministic.
@register(
    "abc_analysis_q",
    """
    WITH pr AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) * 10000
                    AS BIGINT) AS rev_c
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(SUM(rev_c) AS DOUBLE) AS t FROM pr),
    c AS (
        SELECT l_partkey, rev_c,
               SUM(rev_c) OVER (ORDER BY rev_c DESC, l_partkey)
                   AS cum_c
        FROM pr
    ),
    cls AS (
        SELECT l_partkey, rev_c,
               CASE WHEN cum_c <= 0.80 * (SELECT t FROM tot) THEN 'A'
                    WHEN cum_c <= 0.95 * (SELECT t FROM tot) THEN 'B'
                    ELSE 'C' END AS abc
        FROM c
    )
    SELECT abc, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(ROUND(CAST(SUM(rev_c) AS DOUBLE)
               / (SELECT t FROM tot), 6) AS DOUBLE) AS revenue_share
    FROM cls GROUP BY abc
    """,
)
def abc_analysis_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80/15/5 inventory census. Cumulative revenue share over the
    ranked part table uses the distributed prefix-sum — the classic
    'Pareto cut needs a global running total' trap, solved the same
    way as seq_rank/sprt_q."""
    from iniz_exporters_spark.operators.indexing import global_cumsum

    li = Catalog(spark, sf_dir).lineitem
    pr = li.groupBy("l_partkey").agg(
        (F.sum(_dec(F.col("l_extendedprice"), 18, 4)) * 10000)
        .cast("long")
        .alias("rev_c")
    )
    tot = pr.agg(F.sum("rev_c").cast("double").alias("t"))
    c = global_cumsum(
        pr,
        [F.col("rev_c").desc(), F.col("l_partkey").asc()],
        "rev_c",
        "cum_c",
    )
    cls = c.crossJoin(F.broadcast(tot)).withColumn(
        "abc",
        F.when(F.col("cum_c") <= 0.80 * F.col("t"), "A")
        .when(F.col("cum_c") <= 0.95 * F.col("t"), "B")
        .otherwise("C"),
    )
    return (
        cls.groupBy("abc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            (F.sum("rev_c").cast("double") / F.max("t")).alias("rs"),
        )
        .select(
            "abc",
            "n_parts",
            F.round(F.col("rs"), 6).alias("revenue_share"),
        )
    )


# Laspeyres and Paasche price indices between the first and last
# calendar YEAR of lineitem shipments, over the parts traded in both:
# L = sum(p1 q0)/sum(p0 q0), P = sum(p1 q1)/sum(p0 q1), with
# per-part period prices = revenue/quantity and quantities as weights.
# Fisher's ideal index = sqrt(L*P). Every period aggregate is an exact
# DECIMAL sum; the index arithmetic runs on the common-parts join.
@register(
    "price_index_q",
    """
    WITH base AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                   AS DOUBLE) AS rev,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                   AS qty
        FROM lineitem WHERE year(l_shipdate) = 1995
        GROUP BY l_partkey
    ),
    cur AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                   AS DOUBLE) AS rev,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                   AS qty
        FROM lineitem WHERE year(l_shipdate) = 2001
        GROUP BY l_partkey
    ),
    j AS (
        SELECT b.rev / b.qty AS p0, b.qty AS q0,
               c.rev / c.qty AS p1, c.qty AS q1
        FROM base b JOIN cur c ON c.l_partkey = b.l_partkey
    ),
    s AS (
        SELECT COUNT(*) AS n_parts,
               CAST(SUM(CAST(p1 * q0 AS DECIMAL(28,12))) AS DOUBLE)
                   AS p1q0,
               CAST(SUM(CAST(p0 * q0 AS DECIMAL(28,12))) AS DOUBLE)
                   AS p0q0,
               CAST(SUM(CAST(p1 * q1 AS DECIMAL(28,12))) AS DOUBLE)
                   AS p1q1,
               CAST(SUM(CAST(p0 * q1 AS DECIMAL(28,12))) AS DOUBLE)
                   AS p0q1
        FROM j
    )
    SELECT CAST(n_parts AS BIGINT) AS n_common_parts,
           CAST(ROUND(p1q0 / p0q0, 6) AS DOUBLE) + 0.0 AS laspeyres,
           CAST(ROUND(p1q1 / p0q1, 6) AS DOUBLE) + 0.0 AS paasche,
           CAST(ROUND(sqrt((p1q0 / p0q0) * (p1q1 / p0q1)), 6)
               AS DOUBLE) + 0.0 AS fisher
    FROM s
    """,
)
def price_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did unit prices drift between the first and last shipment year?
    Base-weighted (Laspeyres), current-weighted (Paasche), and their
    geometric mean (Fisher ideal)."""
    li = Catalog(spark, sf_dir).lineitem

    def period(year):
        return (
            li.filter(F.year("l_shipdate") == year)
            .groupBy("l_partkey")
            .agg(
                F.sum(_dec(F.col("l_extendedprice"), 18, 4))
                .cast("double")
                .alias("rev"),
                F.sum(_dec(F.col("l_quantity"), 18, 4))
                .cast("double")
                .alias("qty"),
            )
        )

    base = period(1995).select(
        "l_partkey",
        (F.col("rev") / F.col("qty")).alias("p0"),
        F.col("qty").alias("q0"),
    )
    cur = period(2001).select(
        F.col("l_partkey").alias("pk"),
        (F.col("rev") / F.col("qty")).alias("p1"),
        F.col("qty").alias("q1"),
    )
    j = base.join(cur, base["l_partkey"] == cur["pk"])
    s = j.agg(
        F.count(F.lit(1)).alias("n_parts"),
        _dsum(F.col("p1") * F.col("q0")).cast("double").alias("p1q0"),
        _dsum(F.col("p0") * F.col("q0")).cast("double").alias("p0q0"),
        _dsum(F.col("p1") * F.col("q1")).cast("double").alias("p1q1"),
        _dsum(F.col("p0") * F.col("q1")).cast("double").alias("p0q1"),
    )
    return s.select(
        F.col("n_parts").cast("long").alias("n_common_parts"),
        (
            F.round(F.col("p1q0") / F.col("p0q0"), 6) + F.lit(0.0)
        ).alias("laspeyres"),
        (
            F.round(F.col("p1q1") / F.col("p0q1"), 6) + F.lit(0.0)
        ).alias("paasche"),
        (
            F.round(
                F.sqrt(
                    (F.col("p1q0") / F.col("p0q0"))
                    * (F.col("p1q1") / F.col("p0q1"))
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("fisher"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 4 (continued): exact 1-D distribution
# distances WITHOUT the pair explosion. Both energy distance and
# 1-Wasserstein over two cohorts are, naively, O(n^2) pairwise sums;
# the rank/prefix-sum identities below compute them EXACTLY from
# range-partitioned cumulative sums (operators/indexing.global_cumsum
# / global_index) — one sort-shuffle instead of n^2 pairs, the same
# trick exact_median_q uses. Values are quantized to integer cents so
# every cumulative quantity is an exact BIGINT. Plus tail risk (CVaR),
# the newsvendor quantile, and the cohort-LTV curve.
# ---------------------------------------------------------------------------


# Energy distance between the two user cohorts' purchase-total
# distributions: D^2 = 2 E|X-Y| - E|X-X'| - E|Y-Y'| (V-statistics).
# Each mean absolute difference comes from the sorted-merge identity
# sum_x |x - v| = v*cnt_le(v) - sum_le(v) + (tot - sum_le(v))
#                 - (cnt - cnt_le(v))*v,
# where cnt_le/sum_le are inclusive prefix sums over the MERGED value
# order — four global_cumsum passes (x-count, x-sum, y-count, y-sum),
# zero pairwise joins. The oracle keeps plain ANSI running windows.
@register(
    "energy_distance_q",
    """
    WITH u AS (
        SELECT user_id, user_id % 2 AS grp,
               CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
                   AS v
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    m AS (
        SELECT user_id, v,
               CASE WHEN grp = 0 THEN 1 ELSE 0 END AS ix,
               CASE WHEN grp = 1 THEN 1 ELSE 0 END AS iy
        FROM u
    ),
    c AS (
        SELECT v, ix, iy,
               SUM(ix) OVER w AS cxc, SUM(ix * v) OVER w AS cxs,
               SUM(iy) OVER w AS cyc, SUM(iy * v) OVER w AS cys,
               SUM(ix) OVER () AS nx, SUM(ix * v) OVER () AS sx,
               SUM(iy) OVER () AS ny, SUM(iy * v) OVER () AS sy
        FROM m
        WINDOW w AS (ORDER BY v, user_id
                     ROWS UNBOUNDED PRECEDING)
    ),
    terms AS (
        SELECT
            SUM(CASE WHEN iy = 1 THEN
                v * cxc - cxs + (sx - cxs) - (nx - cxc) * v
                ELSE 0 END) AS dxy,
            SUM(CASE WHEN ix = 1 THEN
                v * cxc - cxs + (sx - cxs) - (nx - cxc) * v
                ELSE 0 END) AS dxx,
            SUM(CASE WHEN iy = 1 THEN
                v * cyc - cys + (sy - cys) - (ny - cyc) * v
                ELSE 0 END) AS dyy,
            MAX(nx) AS nx, MAX(ny) AS ny
        FROM c
    )
    SELECT CAST(nx AS BIGINT) AS n_x, CAST(ny AS BIGINT) AS n_y,
           CAST(ROUND(CAST(dxy AS DOUBLE) / (nx * ny) / 100, 6)
               AS DOUBLE) + 0.0 AS e_xy,
           CAST(ROUND(CAST(dxx AS DOUBLE) / (nx * nx) / 100, 6)
               AS DOUBLE) + 0.0 AS e_xx,
           CAST(ROUND(CAST(dyy AS DOUBLE) / (ny * ny) / 100, 6)
               AS DOUBLE) + 0.0 AS e_yy,
           CAST(ROUND(sqrt(greatest(0.0,
               2.0 * CAST(dxy AS DOUBLE) / (nx * ny) / 100
               - CAST(dxx AS DOUBLE) / (nx * nx) / 100
               - CAST(dyy AS DOUBLE) / (ny * ny) / 100)), 6)
               AS DOUBLE) + 0.0 AS energy_dist
    FROM terms
    """,
)
def energy_distance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Are the two cohorts' spend distributions different IN SHAPE,
    not just in mean? Exact E-statistic from prefix sums — the
    pairwise |x-y| sums never materialize. The identity evaluated at
    every sample point already counts all ORDERED pairs, so each
    V-statistic is its raw sum over n^2 (no extra factor)."""
    from iniz_exporters_spark.operators.indexing import global_prefix

    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    u = e.groupBy("user_id").agg(
        (F.sum(_dec(F.col("value"), 18, 2)) * 100)
        .cast("long")
        .alias("v")
    )
    m = u.select(
        "user_id",
        "v",
        F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("ix"),
        F.when(F.col("user_id") % 2 == 1, 1).otherwise(0).alias("iy"),
    ).withColumn("ixv", F.col("ix") * F.col("v")).withColumn(
        "iyv", F.col("iy") * F.col("v")
    )
    order = [F.col("v").asc(), F.col("user_id").asc()]
    # all four running quantities share one fused range-partition pass
    c = global_prefix(
        m,
        order,
        {"cxc": "ix", "cxs": "ixv", "cyc": "iy", "cys": "iyv"},
    )
    tot = m.agg(
        F.sum("ix").alias("nx"),
        F.sum("ixv").alias("sx"),
        F.sum("iy").alias("ny"),
        F.sum("iyv").alias("sy"),
    )
    c = c.crossJoin(F.broadcast(tot))

    def absdiff_sum(cnt_le, sum_le, n, s):
        v = F.col("v")
        return (
            v * F.col(cnt_le)
            - F.col(sum_le)
            + (F.col(s) - F.col(sum_le))
            - (F.col(n) - F.col(cnt_le)) * v
        )

    terms = c.agg(
        F.sum(
            F.when(
                F.col("iy") == 1, absdiff_sum("cxc", "cxs", "nx", "sx")
            ).otherwise(0)
        ).alias("dxy"),
        F.sum(
            F.when(
                F.col("ix") == 1, absdiff_sum("cxc", "cxs", "nx", "sx")
            ).otherwise(0)
        ).alias("dxx"),
        F.sum(
            F.when(
                F.col("iy") == 1, absdiff_sum("cyc", "cys", "ny", "sy")
            ).otherwise(0)
        ).alias("dyy"),
        F.max("nx").alias("nx"),
        F.max("ny").alias("ny"),
    )
    exy = F.col("dxy").cast("double") / (F.col("nx") * F.col("ny")) / 100
    exx = F.col("dxx").cast("double") / (F.col("nx") * F.col("nx")) / 100
    eyy = F.col("dyy").cast("double") / (F.col("ny") * F.col("ny")) / 100
    return terms.select(
        F.col("nx").cast("long").alias("n_x"),
        F.col("ny").cast("long").alias("n_y"),
        (F.round(exy, 6) + F.lit(0.0)).alias("e_xy"),
        (F.round(exx, 6) + F.lit(0.0)).alias("e_xx"),
        (F.round(eyy, 6) + F.lit(0.0)).alias("e_yy"),
        (
            F.round(
                F.sqrt(F.greatest(F.lit(0.0), 2.0 * exy - exx - eyy)), 6
            )
            + F.lit(0.0)
        ).alias("energy_dist"),
    )


# 1-Wasserstein (earth mover) distance between the same two cohorts'
# purchase-total distributions: W1 = integral |F_X - F_Y| dt, computed
# exactly over the merged sorted values as
# sum_k |cxc_k/nx - cyc_k/ny| * (v_{k+1} - v_k). The merged rank and
# the two cumulative counts come from global_index/global_cumsum; the
# "next value" gap is a self-join on rank+1 (a shuffle join on the
# rank key — never a corpus-scale LEAD window). Integer-cent values
# make every CDF numerator exact.
@register(
    "wasserstein_q",
    """
    WITH u AS (
        SELECT user_id, user_id % 2 AS grp,
               CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
                   AS v
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    m AS (
        SELECT user_id, v,
               CASE WHEN grp = 0 THEN 1 ELSE 0 END AS ix,
               CASE WHEN grp = 1 THEN 1 ELSE 0 END AS iy
        FROM u
    ),
    c AS (
        SELECT v,
               ROW_NUMBER() OVER o AS t,
               SUM(ix) OVER (o ROWS UNBOUNDED PRECEDING) AS cxc,
               SUM(iy) OVER (o ROWS UNBOUNDED PRECEDING) AS cyc,
               SUM(ix) OVER () AS nx, SUM(iy) OVER () AS ny
        FROM m
        WINDOW o AS (ORDER BY v, user_id)
    ),
    gaps AS (
        SELECT a.cxc, a.cyc, a.nx, a.ny, b.v - a.v AS gap
        FROM c a JOIN c b ON b.t = a.t + 1
    )
    SELECT CAST(MAX(nx) AS BIGINT) AS n_x,
           CAST(MAX(ny) AS BIGINT) AS n_y,
           CAST(ROUND(SUM(abs(CAST(cxc AS DOUBLE) / nx
               - CAST(cyc AS DOUBLE) / ny) * gap) / 100, 6)
               AS DOUBLE) + 0.0 AS wasserstein_1
    FROM gaps
    """,
)
def wasserstein_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much 'work' separates the two spend distributions, in the
    money unit itself? The optimal-transport companion to
    energy_distance_q and ks_test_q over the same cohorts."""
    from iniz_exporters_spark.operators.indexing import global_prefix

    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    u = e.groupBy("user_id").agg(
        (F.sum(_dec(F.col("value"), 18, 2)) * 100)
        .cast("long")
        .alias("v")
    )
    m = u.select(
        "user_id",
        "v",
        F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("ix"),
        F.when(F.col("user_id") % 2 == 1, 1).otherwise(0).alias("iy"),
    )
    order = [F.col("v").asc(), F.col("user_id").asc()]
    # rank + both CDF numerators in one fused range-partition pass
    c = global_prefix(
        m, order, {"cxc": "ix", "cyc": "iy"}, idx_col="t"
    )
    tot = m.agg(F.sum("ix").alias("nx"), F.sum("iy").alias("ny"))
    a = c.select("t", "v", "cxc", "cyc")
    b = c.select((F.col("t") - 1).alias("t"), F.col("v").alias("v_next"))
    gaps = a.join(b, "t").crossJoin(F.broadcast(tot))
    w1 = (
        F.sum(
            F.abs(
                F.col("cxc").cast("double") / F.col("nx")
                - F.col("cyc").cast("double") / F.col("ny")
            )
            * (F.col("v_next") - F.col("v"))
        )
        / 100
    )
    return gaps.agg(
        F.max("nx").cast("long").alias("n_x"),
        F.max("ny").cast("long").alias("n_y"),
        (F.round(w1, 6) + F.lit(0.0)).alias("wasserstein_1"),
    )


# Value-at-Risk and expected shortfall (CVaR) of the demeaned daily
# revenue P&L (the drawdown_q series): losses are -pnl; VaR_95 is the
# ceil(0.95 n)-th smallest... equivalently the k-th largest loss with
# k = ceil(0.05 n) under the empirical upper-tail convention, and
# CVaR_95 averages the losses at or beyond VaR. All ranking happens on
# the calendar-bounded daily frame with exact DECIMAL P&L.
@register(
    "cvar_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               SUM(CAST(value AS DECIMAL(18,6))) AS rev
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    pnl AS (
        SELECT day,
               (SELECT CAST(CAST(SUM(rev) AS DOUBLE) / COUNT(*)
                    AS DECIMAL(18,6)) FROM daily) - rev AS loss
        FROM daily
    ),
    r AS (
        SELECT loss,
               ROW_NUMBER() OVER (ORDER BY loss DESC, day) AS k,
               COUNT(*) OVER () AS n
        FROM pnl
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_days,
           CAST(ROUND(CAST(MAX(CASE WHEN k = CAST(ceil(0.05 * n)
               AS BIGINT) THEN loss END) AS DOUBLE), 2) AS DOUBLE)
               + 0.0 AS var_95,
           CAST(ROUND(CAST(SUM(CASE WHEN k <= CAST(ceil(0.05 * n)
               AS BIGINT) THEN loss END) AS DOUBLE)
               / MAX(CASE WHEN n > 0
                     THEN CAST(ceil(0.05 * n) AS BIGINT) END), 2)
               AS DOUBLE) + 0.0 AS cvar_95
    FROM r
    """,
)
def cvar_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail risk of the daily P&L: the 95% loss threshold and the mean
    loss beyond it — the coherent-risk companion to drawdown_q."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(_dec(F.col("value"), 18, 6)).alias("rev")
    )
    mu = daily.agg(
        (F.sum("rev").cast("double") / F.count(F.lit(1)))
        .cast("decimal(18,6)")
        .alias("mu")
    )
    pnl = daily.crossJoin(F.broadcast(mu)).select(
        "day", (F.col("mu") - F.col("rev")).alias("loss")
    )
    wk = Window.orderBy(F.col("loss").desc(), F.col("day"))
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = pnl.select(
        "loss",
        F.row_number().over(wk).alias("k"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    kcut = F.ceil(0.05 * F.col("n")).cast("long")
    return r.agg(
        F.max("n").cast("long").alias("n_days"),
        (
            F.round(
                F.max(F.when(F.col("k") == kcut, F.col("loss"))).cast(
                    "double"
                ),
                2,
            )
            + F.lit(0.0)
        ).alias("var_95"),
        (
            F.round(
                F.sum(
                    F.when(F.col("k") <= kcut, F.col("loss"))
                ).cast("double")
                / F.max(F.when(F.col("n") > 0, kcut)),
                2,
            )
            + F.lit(0.0)
        ).alias("cvar_95"),
    )


# Newsvendor stocking quantile for daily purchase-event demand:
# critical ratio CR = cu/(cu+co) = 0.8 (understock costs 4x overstock
# with cu=4, co=1); q* = the smallest demand level whose empirical CDF
# reaches CR, and the expected daily overage/underage at q* replay the
# cost. The demand distribution is the calendar-bounded daily frame;
# ranks and tail sums are exact integers.
@register(
    "newsvendor_q",
    """
    WITH demand AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS d
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    r AS (
        SELECT d,
               ROW_NUMBER() OVER (ORDER BY d, day) AS k,
               COUNT(*) OVER () AS n
        FROM demand
    ),
    qstar AS (
        SELECT MIN(d) AS q FROM r
        WHERE k >= CAST(ceil(0.8 * n) AS BIGINT)
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_days,
           CAST((SELECT q FROM qstar) AS BIGINT) AS q_star,
           CAST(ROUND(CAST(SUM(greatest((SELECT q FROM qstar) - d, 0))
               AS DOUBLE) / MAX(n), 4) AS DOUBLE) AS expected_overage,
           CAST(ROUND(CAST(SUM(greatest(d - (SELECT q FROM qstar), 0))
               AS DOUBLE) / MAX(n), 4) AS DOUBLE) AS expected_underage
    FROM r
    """,
)
def newsvendor_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much to stock per day when shortage costs 4x leftover —
    the empirical-quantile answer plus the resulting cost split."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    demand = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("d")
    )
    wk = Window.orderBy("d", "day")
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = demand.select(
        "d",
        F.row_number().over(wk).alias("k"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    qstar = r.filter(
        F.col("k") >= F.ceil(0.8 * F.col("n")).cast("long")
    ).agg(F.min("d").alias("q"))
    return (
        r.crossJoin(F.broadcast(qstar))
        .agg(
            F.max("n").cast("long").alias("n_days"),
            F.max("q").cast("long").alias("q_star"),
            F.round(
                F.sum(
                    F.greatest(F.col("q") - F.col("d"), F.lit(0))
                ).cast("double")
                / F.max("n"),
                4,
            ).alias("expected_overage"),
            F.round(
                F.sum(
                    F.greatest(F.col("d") - F.col("q"), F.lit(0))
                ).cast("double")
                / F.max("n"),
                4,
            ).alias("expected_underage"),
        )
    )


# Cohort LTV curve: users grouped by first-activity week, cumulative
# purchase revenue per user tracked by weeks-since-first-activity.
# First-touch reduces per user (one corpus aggregation); the curve
# table is cohorts x ages (calendar-bounded); the running sum windows
# partition by cohort over <= 5 rows each.
@register(
    "ltv_cohort_q",
    """
    WITH first_seen AS (
        SELECT user_id,
               CAST(date_diff('day', DATE '2024-01-01',
                    CAST(MIN(ts) AS DATE)) // 7 AS BIGINT) AS cohort
        FROM events GROUP BY user_id
    ),
    sizes AS (
        SELECT cohort, COUNT(*) AS n_users
        FROM first_seen GROUP BY cohort
    ),
    rev AS (
        SELECT f.cohort,
               CAST(date_diff('day', DATE '2024-01-01',
                    CAST(e.ts AS DATE)) // 7 AS BIGINT) - f.cohort
                   AS age_weeks,
               SUM(CAST(e.value AS DECIMAL(18,6))) AS r
        FROM events e JOIN first_seen f ON f.user_id = e.user_id
        WHERE e.event_type = 'purchase'
        GROUP BY f.cohort,
                 CAST(date_diff('day', DATE '2024-01-01',
                      CAST(e.ts AS DATE)) // 7 AS BIGINT) - f.cohort
    )
    SELECT rev.cohort, age_weeks,
           CAST(s.n_users AS BIGINT) AS cohort_size,
           CAST(ROUND(CAST(SUM(r) OVER (PARTITION BY rev.cohort
                    ORDER BY age_weeks) AS DOUBLE) / s.n_users, 4)
               AS DOUBLE) AS cum_ltv_per_user
    FROM rev JOIN sizes s ON s.cohort = rev.cohort
    """,
)
def ltv_cohort_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The growth-analytics staple: does a later cohort monetize
    faster? Rows are (cohort week, age weeks) — calendar metadata."""
    e = Catalog(spark, sf_dir).events
    first_seen = e.groupBy("user_id").agg(
        F.floor(
            F.datediff(F.to_date(F.min("ts")), F.lit("2024-01-01")) / 7
        )
        .cast("long")
        .alias("cohort")
    )
    sizes = first_seen.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    rev = (
        e.filter(F.col("event_type") == "purchase")
        # first_seen is a PER-USER table — never broadcast it; the
        # shuffle join on user_id is the plan that survives 100 TB
        .join(first_seen, "user_id")
        .groupBy(
            "cohort",
            (
                F.floor(
                    F.datediff(F.to_date("ts"), F.lit("2024-01-01")) / 7
                ).cast("long")
                - F.col("cohort")
            ).alias("age_weeks"),
        )
        .agg(F.sum(_dec(F.col("value"), 18, 6)).alias("r"))
    )
    wcum = (
        Window.partitionBy("cohort")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        rev.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "age_weeks",
            F.col("n_users").cast("long").alias("cohort_size"),
            F.round(
                F.sum("r").over(wcum).cast("double") / F.col("n_users"),
                4,
            ).alias("cum_ltv_per_user"),
        )
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 5: modern dependence measures (Chatterjee's
# xi, partial correlation), U-shaped multi-touch attribution, the
# Hodges-Lehmann robust location estimate, and the log-rank survival
# comparison. xi is the scale showcase: both of its rankings come from
# global_index, and the adjacent-rank differences come from a rank+1
# self-join — no corpus-scale window anywhere.
# ---------------------------------------------------------------------------


# Chatterjee's xi rank correlation (2020) measuring how well per-user
# purchase spend is a FUNCTION of click spend (asymmetric, detects any
# functional dependence, not just monotone): sort by x, take y-ranks
# r_i along that order, xi = 1 - 3 sum|r_{i+1} - r_i| / (n^2 - 1).
# Both the y-rank and the x-position are range-partitioned global
# ranks; consecutive x-positions meet via a shuffle join on position
# +1. Continuous DECIMAL totals make ties measure-zero; the (value,
# user_id) tiebreak keeps both engines identical if one ever occurs.
@register(
    "xi_correlation_q",
    """
    WITH u AS (
        SELECT user_id,
               SUM(CASE WHEN event_type = 'click'
                   THEN CAST(value AS DECIMAL(18,6)) END) AS x,
               SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(value AS DECIMAL(18,6)) END) AS y
        FROM events GROUP BY user_id
        HAVING x IS NOT NULL AND y IS NOT NULL
    ),
    ranked AS (
        SELECT user_id, x,
               ROW_NUMBER() OVER (ORDER BY y, user_id) AS r
        FROM u
    ),
    ordered AS (
        SELECT r, ROW_NUMBER() OVER (ORDER BY x, user_id) AS s
        FROM ranked
    ),
    steps AS (
        SELECT abs(b.r - a.r) AS dr
        FROM ordered a JOIN ordered b ON b.s = a.s + 1
    )
    SELECT CAST((SELECT COUNT(*) FROM u) AS BIGINT) AS n_users,
           CAST(ROUND(1 - 3.0 * SUM(dr)
               / (CAST((SELECT COUNT(*) FROM u) AS DOUBLE)
                  * (SELECT COUNT(*) FROM u) - 1), 6) AS DOUBLE) + 0.0
               AS xi
    FROM steps
    """,
)
def xi_correlation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does click spend DETERMINE purchase spend? xi ~ 0 =
    independent, 1 = y is a measurable function of x — catches
    relationships spearman_corr_q (monotone-only) misses."""
    from iniz_exporters_spark.operators.indexing import global_index

    e = Catalog(spark, sf_dir).events
    u = (
        e.groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "click",
                    _dec(F.col("value"), 18, 6),
                )
            ).alias("x"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    _dec(F.col("value"), 18, 6),
                )
            ).alias("y"),
        )
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    ranked = global_index(
        u, [F.col("y").asc(), F.col("user_id").asc()], "r"
    )
    ordered = global_index(
        ranked, [F.col("x").asc(), F.col("user_id").asc()], "s"
    )
    a = ordered.select("s", "r")
    b = ordered.select((F.col("s") - 1).alias("s"), F.col("r").alias("r2"))
    steps = a.join(b, "s").select(
        F.abs(F.col("r2") - F.col("r")).alias("dr")
    )
    n = u.agg(F.count(F.lit(1)).alias("n"))
    return steps.crossJoin(F.broadcast(n)).agg(
        F.max("n").cast("long").alias("n_users"),
        (
            F.round(
                1
                - 3.0
                * F.sum("dr")
                / (F.max("n").cast("double") * F.max("n") - 1),
                6,
            )
            + F.lit(0.0)
        ).alias("xi"),
    )


# Partial correlation of per-user click vs purchase spend CONTROLLING
# for view spend: r_xy.z = (r_xy - r_xz r_yz) /
# sqrt((1-r_xz^2)(1-r_yz^2)). Zero-filled user totals; all nine
# moments come from one grouped pass with exact DECIMAL sums
# (products at decimal(16,6) — the exact-width convention).
@register(
    "partial_corr_q",
    """
    WITH u AS (
        SELECT user_id,
               COALESCE(SUM(CASE WHEN event_type = 'click'
                   THEN CAST(value AS DECIMAL(18,6)) END),
                   CAST(0 AS DECIMAL(18,6))) AS x,
               COALESCE(SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(value AS DECIMAL(18,6)) END),
                   CAST(0 AS DECIMAL(18,6))) AS y,
               COALESCE(SUM(CASE WHEN event_type = 'view'
                   THEN CAST(value AS DECIMAL(18,6)) END),
                   CAST(0 AS DECIMAL(18,6))) AS z
        FROM events GROUP BY user_id
    ),
    m AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(z) AS DOUBLE) AS sz,
               CAST(SUM(CAST(x AS DECIMAL(19,6))
                        * CAST(x AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(19,6))
                        * CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(z AS DECIMAL(19,6))
                        * CAST(z AS DECIMAL(19,6))) AS DOUBLE) AS szz,
               CAST(SUM(CAST(x AS DECIMAL(19,6))
                        * CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x AS DECIMAL(19,6))
                        * CAST(z AS DECIMAL(19,6))) AS DOUBLE) AS sxz,
               CAST(SUM(CAST(y AS DECIMAL(19,6))
                        * CAST(z AS DECIMAL(19,6))) AS DOUBLE) AS syz
        FROM u
    ),
    r AS (
        SELECT n,
               (sxy - sx * sy / n)
                   / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
                   AS rxy,
               (sxz - sx * sz / n)
                   / sqrt((sxx - sx * sx / n) * (szz - sz * sz / n))
                   AS rxz,
               (syz - sy * sz / n)
                   / sqrt((syy - sy * sy / n) * (szz - sz * sz / n))
                   AS ryz
        FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(ROUND(rxy, 6) AS DOUBLE) + 0.0 AS r_xy,
           CAST(ROUND(rxz, 6) AS DOUBLE) + 0.0 AS r_xz,
           CAST(ROUND(ryz, 6) AS DOUBLE) + 0.0 AS r_yz,
           CAST(ROUND((rxy - rxz * ryz)
               / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)), 6)
               AS DOUBLE) + 0.0 AS partial_r
    FROM r
    """,
)
def partial_corr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the click-purchase association real or just shared exposure
    (views)? First-order partial correlation from one moment pass."""
    e = Catalog(spark, sf_dir).events

    def tsum(et):
        return F.coalesce(
            F.sum(
                F.when(F.col("event_type") == et, _dec(F.col("value"), 18, 6))
            ),
            F.lit(0).cast("decimal(18,6)"),
        )

    u = e.groupBy("user_id").agg(
        tsum("click").alias("x"),
        tsum("purchase").alias("y"),
        tsum("view").alias("z"),
    )

    def p16(a, b):
        return F.sum(
            F.col(a).cast("decimal(16,6)") * F.col(b).cast("decimal(16,6)")
        ).cast("double")

    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("z").cast("double").alias("sz"),
        p16("x", "x").alias("sxx"),
        p16("y", "y").alias("syy"),
        p16("z", "z").alias("szz"),
        p16("x", "y").alias("sxy"),
        p16("x", "z").alias("sxz"),
        p16("y", "z").alias("syz"),
    )
    n = F.col("n")

    def corr(sab, sa, sb, saa, sbb):
        return (F.col(sab) - F.col(sa) * F.col(sb) / n) / F.sqrt(
            (F.col(saa) - F.col(sa) * F.col(sa) / n)
            * (F.col(sbb) - F.col(sb) * F.col(sb) / n)
        )

    r = m.select(
        "n",
        corr("sxy", "sx", "sy", "sxx", "syy").alias("rxy"),
        corr("sxz", "sx", "sz", "sxx", "szz").alias("rxz"),
        corr("syz", "sy", "sz", "syy", "szz").alias("ryz"),
    )
    part = (F.col("rxy") - F.col("rxz") * F.col("ryz")) / F.sqrt(
        (1 - F.col("rxz") * F.col("rxz"))
        * (1 - F.col("ryz") * F.col("ryz"))
    )
    return r.select(
        n.cast("long").alias("n_users"),
        (F.round(F.col("rxy"), 6) + F.lit(0.0)).alias("r_xy"),
        (F.round(F.col("rxz"), 6) + F.lit(0.0)).alias("r_xz"),
        (F.round(F.col("ryz"), 6) + F.lit(0.0)).alias("r_yz"),
        (F.round(part, 6) + F.lit(0.0)).alias("partial_r"),
    )
