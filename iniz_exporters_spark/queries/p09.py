"""Registry chunk 9/9: 9 @register entries (knee_point_q .. copeland_q).

Mechanical split of the original queries.py (lines 29193-30030); statement order
and registration order are unchanged. See queries/__init__.py."""
from iniz_exporters_spark.catalog import Catalog
from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F
from iniz_exporters_spark.queries._base import _dec, register
from iniz_exporters_spark.pinning import pin



# Kneedle-style knee point of the Pareto (cumulative revenue share vs
# part-rank share) curve: the rank maximizing the vertical distance
# to the diagonal chord — where "adding more parts stops paying".
# Rank and cumulative share ride the distributed prefix machinery
# (abc_analysis_q's plan); the argmax is one ordered pick with a rank
# tiebreak.
@register(
    "knee_point_q",
    """
    WITH pr AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) * 10000
                    AS BIGINT) AS rev_c
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (
        SELECT CAST(SUM(rev_c) AS DOUBLE) AS t,
               CAST(COUNT(*) AS DOUBLE) AS n
        FROM pr
    ),
    c AS (
        SELECT ROW_NUMBER() OVER (ORDER BY rev_c DESC, l_partkey)
                   AS rk,
               SUM(rev_c) OVER (ORDER BY rev_c DESC, l_partkey)
                   AS cum_c
        FROM pr
    ),
    scored AS (
        SELECT rk,
               CAST(cum_c AS DOUBLE) / (SELECT t FROM tot)
                   - rk / (SELECT n FROM tot) AS lift,
               CAST(cum_c AS DOUBLE) / (SELECT t FROM tot) AS share
        FROM c
    ),
    best AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY lift DESC, rk) AS b
        FROM scored
    )
    SELECT CAST(rk AS BIGINT) AS knee_rank,
           CAST(ROUND(rk / (SELECT n FROM tot), 6) AS DOUBLE) + 0.0
               AS rank_share,
           CAST(ROUND(share, 6) AS DOUBLE) + 0.0 AS revenue_share,
           CAST(ROUND(lift, 6) AS DOUBLE) + 0.0 AS max_chord_gap
    FROM best WHERE b = 1
    """,
)
def knee_point_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE to cut the long tail: the Pareto curve's knee (max gap
    above the diagonal) — the data-driven version of abc_analysis_q's
    fixed 80/95 thresholds."""
    from iniz_exporters_spark.operators.indexing import global_prefix

    li = Catalog(spark, sf_dir).lineitem
    pr = li.groupBy("l_partkey").agg(
        (F.sum(_dec(F.col("l_extendedprice"), 18, 4)) * 10000)
        .cast("long")
        .alias("rev_c")
    )
    tot = pr.agg(
        F.sum("rev_c").cast("double").alias("t"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    c = global_prefix(
        pr,
        [F.col("rev_c").desc(), F.col("l_partkey").asc()],
        {"cum_c": "rev_c"},
        idx_col="rk",
    )
    scored = c.crossJoin(F.broadcast(tot)).select(
        "rk",
        (
            F.col("cum_c").cast("double") / F.col("t")
            - F.col("rk") / F.col("n")
        ).alias("lift"),
        (F.col("cum_c").cast("double") / F.col("t")).alias("share"),
        "n",
    )
    wb = Window.orderBy(F.col("lift").desc(), F.col("rk"))
    return (
        scored.withColumn("b", F.row_number().over(wb))
        .filter(F.col("b") == 1)
        .select(
            F.col("rk").cast("long").alias("knee_rank"),
            (
                F.round(F.col("rk") / F.col("n"), 6) + F.lit(0.0)
            ).alias("rank_share"),
            (F.round(F.col("share"), 6) + F.lit(0.0)).alias(
                "revenue_share"
            ),
            (F.round(F.col("lift"), 6) + F.lit(0.0)).alias(
                "max_chord_gap"
            ),
        )
    )


# Cochran's Q for matched binary outcomes: did each user perform a
# view / click / purchase (three matched binary "treatments" per
# user-block)? Q = k(k-1) sum_j (C_j - Cbar)^2 / (k sum_i R_i -
# sum_i R_i^2) — the binary Friedman. Every term is an exact integer
# sum; users with all-0 or all-k rows contribute nothing (standard).
@register(
    "cochran_q_test",
    """
    WITH u AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   AS b1,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS b2,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS b3
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT COUNT(*) AS n,
               SUM(b1) AS c1, SUM(b2) AS c2, SUM(b3) AS c3,
               SUM(b1 + b2 + b3) AS sr,
               SUM((b1 + b2 + b3) * (b1 + b2 + b3)) AS sr2
        FROM u
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(c1 AS BIGINT) AS n_view,
           CAST(c2 AS BIGINT) AS n_click,
           CAST(c3 AS BIGINT) AS n_purchase,
           CAST(ROUND(3.0 * 2
               * ((c1 - CAST(sr AS DOUBLE) / 3)
                      * (c1 - CAST(sr AS DOUBLE) / 3)
                  + (c2 - CAST(sr AS DOUBLE) / 3)
                      * (c2 - CAST(sr AS DOUBLE) / 3)
                  + (c3 - CAST(sr AS DOUBLE) / 3)
                      * (c3 - CAST(sr AS DOUBLE) / 3))
               / NULLIF(3.0 * sr - sr2, 0), 6) AS DOUBLE) + 0.0
               AS cochran_q
    FROM s
    """,
)
def cochran_q_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do the three funnel actions have equal reach across the SAME
    users? The matched-binary companion to friedman_q (ranks) and
    mcnemar_q (two treatments)."""
    e = Catalog(spark, sf_dir).events
    u = e.groupBy("user_id").agg(
        *[
            F.max(
                F.when(F.col("event_type") == t, 1).otherwise(0)
            ).alias(f"b{i}")
            for i, t in enumerate(
                ["view", "click", "purchase"], start=1
            )
        ]
    )
    r = F.col("b1") + F.col("b2") + F.col("b3")
    s = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("b1").alias("c1"),
        F.sum("b2").alias("c2"),
        F.sum("b3").alias("c3"),
        F.sum(r).alias("sr"),
        F.sum(r * r).alias("sr2"),
    )
    cbar = F.col("sr").cast("double") / 3

    def dev(c):
        return (F.col(c) - cbar) * (F.col(c) - cbar)

    # all-or-nothing blocks carry no information: when every user has
    # R in {0, k} the denominator is 0 and Q is undefined (NULL)
    q = (
        3.0
        * 2
        * (dev("c1") + dev("c2") + dev("c3"))
        / F.nullif(3.0 * F.col("sr") - F.col("sr2"), F.lit(0.0))
    )
    return s.select(
        F.col("n").cast("long").alias("n_users"),
        F.col("c1").cast("long").alias("n_view"),
        F.col("c2").cast("long").alias("n_click"),
        F.col("c3").cast("long").alias("n_purchase"),
        (F.round(q, 6) + F.lit(0.0)).alias("cochran_q"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 7 (addendum 2): robust shape statistics,
# week-over-week audience stability, and Mood's median test.
# ---------------------------------------------------------------------------


# Robust distribution shape per cohort: Bowley skewness
# (Q3 + Q1 - 2 Q2)/(Q3 - Q1) and Moors kurtosis ((E7-E5)+(E3-E1))
# /(E6-E2) from octiles of per-user purchase spend — the
# outlier-proof counterparts of moment skew/kurt. Octiles come from
# grouped_ntile (ANSI semantics, range-partitioned); each octile
# boundary is the bucket's exact MAX.
@register(
    "robust_shape_q",
    """
    WITH u AS (
        SELECT user_id, user_id % 2 AS grp,
               SUM(CAST(value AS DECIMAL(18,6))) AS y
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    tiled AS (
        SELECT grp, y,
               NTILE(8) OVER (PARTITION BY grp ORDER BY y, user_id)
                   AS o
        FROM u
    ),
    oct AS (
        SELECT grp, o, CAST(MAX(y) AS DOUBLE) AS e
        FROM tiled GROUP BY grp, o
    ),
    w AS (
        SELECT grp,
               MAX(CASE WHEN o = 1 THEN e END) AS e1,
               MAX(CASE WHEN o = 2 THEN e END) AS e2,
               MAX(CASE WHEN o = 3 THEN e END) AS e3,
               MAX(CASE WHEN o = 4 THEN e END) AS e4,
               MAX(CASE WHEN o = 5 THEN e END) AS e5,
               MAX(CASE WHEN o = 6 THEN e END) AS e6,
               MAX(CASE WHEN o = 7 THEN e END) AS e7
        FROM oct GROUP BY grp
    )
    SELECT grp AS cohort,
           CAST(ROUND((e6 + e2 - 2 * e4) / NULLIF(e6 - e2, 0), 6)
               AS DOUBLE) + 0.0 AS bowley_skewness,
           CAST(ROUND(((e7 - e5) + (e3 - e1)) / NULLIF(e6 - e2, 0), 6)
               AS DOUBLE) + 0.0 AS moors_kurtosis
    FROM w
    """,
)
def robust_shape_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and kurtosis a single whale cannot move: quartile
    (Bowley) and octile (Moors) shape statistics per cohort — the
    robust sanity check on skew_profile's moment versions."""
    from iniz_exporters_spark.operators.indexing import grouped_ntile

    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    u = e.groupBy("user_id").agg(
        F.sum(_dec(F.col("value"), 18, 6)).alias("y")
    ).withColumn("grp", F.col("user_id") % 2)
    tiled = grouped_ntile(
        u, ["grp"], [F.col("y").asc(), F.col("user_id").asc()], 8, "o"
    )
    oct_ = tiled.groupBy("grp", "o").agg(
        F.max("y").cast("double").alias("e")
    )

    def at(k):
        return F.max(F.when(F.col("o") == k, F.col("e")))

    w = oct_.groupBy("grp").agg(
        *[at(k).alias(f"e{k}") for k in range(1, 8)]
    )
    iqr = F.nullif(F.col("e6") - F.col("e2"), F.lit(0.0))
    return w.select(
        F.col("grp").alias("cohort"),
        (
            F.round(
                (F.col("e6") + F.col("e2") - 2 * F.col("e4")) / iqr, 6
            )
            + F.lit(0.0)
        ).alias("bowley_skewness"),
        (
            F.round(
                (
                    (F.col("e7") - F.col("e5"))
                    + (F.col("e3") - F.col("e1"))
                )
                / iqr,
                6,
            )
            + F.lit(0.0)
        ).alias("moors_kurtosis"),
    )


# Week-over-week audience stability per event type: Jaccard overlap
# of the active-user sets between consecutive weeks — the retention
# read at the SET level (dau_wau_stickiness tracks sizes; this
# tracks identity). Exact distinct-user intersections via the
# (type, week, user) distinct table self-joined on week+1.
@register(
    "audience_stability_q",
    """
    WITH tw AS (
        SELECT DISTINCT event_type,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                   // 7 AS w,
               user_id
        FROM events
    ),
    inter AS (
        SELECT a.event_type, a.w AS week_from,
               COUNT(*) AS n_common
        FROM tw a JOIN tw b
            ON b.event_type = a.event_type AND b.w = a.w + 1
           AND b.user_id = a.user_id
        GROUP BY a.event_type, a.w
    ),
    sizes AS (
        SELECT event_type, w, COUNT(*) AS n
        FROM tw GROUP BY event_type, w
    )
    SELECT i.event_type, CAST(i.week_from AS BIGINT) AS week_from,
           CAST(i.n_common AS BIGINT) AS n_common,
           CAST(ROUND(CAST(i.n_common AS DOUBLE)
               / (sa.n + sb.n - i.n_common), 6) AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.event_type = i.event_type
                 AND sa.w = i.week_from
    JOIN sizes sb ON sb.event_type = i.event_type
                 AND sb.w = i.week_from + 1
    """,
)
def audience_stability_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is each channel reaching the SAME people week over week, or
    churning through new ones? Set-level Jaccard between consecutive
    weekly audiences."""
    e = Catalog(spark, sf_dir).events
    tw = e.select(
        "event_type",
        F.floor(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")) / 7
        )
        .cast("long")
        .alias("w"),
        "user_id",
    ).distinct()
    a = tw.select(
        F.col("event_type").alias("et"),
        F.col("w").alias("wa"),
        "user_id",
    )
    b = tw.select(
        F.col("event_type").alias("et2"),
        F.col("w").alias("wb"),
        F.col("user_id").alias("uid2"),
    )
    inter = (
        a.join(
            b,
            (F.col("et2") == F.col("et"))
            & (F.col("wb") == F.col("wa") + 1)
            & (F.col("uid2") == F.col("user_id")),
        )
        .groupBy(F.col("et").alias("event_type"), F.col("wa").alias("week_from"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = tw.groupBy("event_type", "w").agg(
        F.count(F.lit(1)).alias("n")
    )
    sa = sizes.select(
        F.col("event_type").alias("e1"),
        F.col("w").alias("w1"),
        F.col("n").alias("na"),
    )
    sb = sizes.select(
        F.col("event_type").alias("e2"),
        F.col("w").alias("w2"),
        F.col("n").alias("nb"),
    )
    return (
        inter.join(
            sa,
            (F.col("e1") == F.col("event_type"))
            & (F.col("w1") == F.col("week_from")),
        )
        .join(
            sb,
            (F.col("e2") == F.col("event_type"))
            & (F.col("w2") == F.col("week_from") + 1),
        )
        .select(
            "event_type",
            F.col("week_from").cast("long").alias("week_from"),
            F.col("n_common").cast("long").alias("n_common"),
            F.round(
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


# Mood's median test: does each market segment put the same share of
# customers above the POOLED median balance? Per-segment above/below
# counts vs the hypergeometric expectation, chi2 = sum (O-E)^2/E over
# the k x 2 table. The pooled median is the lower-median order
# statistic; counts are exact integers.
@register(
    "median_test_q",
    """
    WITH v AS (
        SELECT c_mktsegment AS seg, c_acctbal AS x, c_custkey
        FROM customer
    ),
    med AS (
        SELECT x AS m FROM (
            SELECT x, ROW_NUMBER() OVER (ORDER BY x, c_custkey) AS k,
                   COUNT(*) OVER () AS n
            FROM v
        ) WHERE k = (n + 1) // 2
    ),
    cells AS (
        SELECT seg, COUNT(*) AS n,
               SUM(CASE WHEN x > (SELECT m FROM med)
                   THEN 1 ELSE 0 END) AS above
        FROM v GROUP BY seg
    ),
    tot AS (
        SELECT CAST(SUM(above) AS DOUBLE) / SUM(n) AS p FROM cells
    )
    SELECT seg AS segment, CAST(n AS BIGINT) AS n_customers,
           CAST(above AS BIGINT) AS n_above,
           CAST(ROUND(n * (SELECT p FROM tot), 4) AS DOUBLE) + 0.0
               AS expected_above,
           CAST(ROUND(pow(above - n * (SELECT p FROM tot), 2)
                   / (n * (SELECT p FROM tot))
               + pow((n - above) - n * (1 - (SELECT p FROM tot)), 2)
                   / (n * (1 - (SELECT p FROM tot))), 6) AS DOUBLE)
               + 0.0 AS chi2_contribution
    FROM cells
    """,
)
def median_test_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bluntest k-sample location test — segment shares above the
    pooled median — useful exactly because it only assumes the
    median is well-defined (kruskal_wallis_q needs full rankings)."""
    c = Catalog(spark, sf_dir).customer
    v = c.select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("x"),
        "c_custkey",
    )
    wk = Window.orderBy("x", "c_custkey")
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    med = (
        v.select(
            "x",
            F.row_number().over(wk).alias("k"),
            F.count(F.lit(1)).over(wt).alias("n"),
        )
        .filter(F.col("k") == F.expr("(n + 1) div 2"))
        .select(F.col("x").alias("m"))
    )
    cells = (
        v.crossJoin(F.broadcast(med))
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("x") > F.col("m"), 1).otherwise(0)
            ).alias("above"),
        )
    )
    tot = cells.agg(
        (F.sum("above").cast("double") / F.sum("n")).alias("p")
    )
    j = cells.crossJoin(F.broadcast(tot))
    ea = F.col("n") * F.col("p")
    eb = F.col("n") * (1 - F.col("p"))
    chi = F.pow(F.col("above") - ea, 2) / ea + F.pow(
        (F.col("n") - F.col("above")) - eb, 2
    ) / eb
    return j.select(
        F.col("seg").alias("segment"),
        F.col("n").cast("long").alias("n_customers"),
        F.col("above").cast("long").alias("n_above"),
        (F.round(ea, 4) + F.lit(0.0)).alias("expected_above"),
        (F.round(chi, 6) + F.lit(0.0)).alias("chi2_contribution"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 7 (addendum 3): winsorization impact and
# the Simpson's-paradox audit.
# ---------------------------------------------------------------------------


# Winsorization impact report: mean and sample sd of per-user
# purchase spend before vs after clamping to the [5th, 95th]
# percentile values (exact order statistics via the distributed
# rank). Quantifies how much the whales distort the moments —
# winsorize_prices applies the transform; this measures what it
# changes.
@register(
    "winsor_effect_q",
    """
    WITH u AS (
        SELECT user_id, SUM(CAST(value AS DECIMAL(18,6))) AS y
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    r AS (
        SELECT y, ROW_NUMBER() OVER (ORDER BY y, user_id) AS k,
               COUNT(*) OVER () AS n
        FROM u
    ),
    cuts AS (
        SELECT MAX(CASE WHEN k = greatest(CAST(ceil(0.05 * n)
                   AS BIGINT), 1) THEN y END) AS lo,
               MAX(CASE WHEN k = CAST(ceil(0.95 * n) AS BIGINT)
                   THEN y END) AS hi
        FROM r
    ),
    w AS (
        SELECT y, least(greatest(y, (SELECT lo FROM cuts)),
                        (SELECT hi FROM cuts)) AS yw
        FROM u
    ),
    m AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(y) AS DOUBLE) AS s,
               CAST(SUM(CAST(y AS DECIMAL(19,6))
                        * CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS ss,
               CAST(SUM(yw) AS DOUBLE) AS sw,
               CAST(SUM(CAST(yw AS DECIMAL(19,6))
                        * CAST(yw AS DECIMAL(19,6))) AS DOUBLE) AS ssw
        FROM w
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(ROUND(s / n, 4) AS DOUBLE) + 0.0 AS mean_raw,
           CAST(ROUND(sw / n, 4) AS DOUBLE) + 0.0 AS mean_winsor,
           CAST(ROUND(sqrt((ss - s * s / n) / (n - 1)), 4) AS DOUBLE)
               + 0.0 AS sd_raw,
           CAST(ROUND(sqrt((ssw - sw * sw / n) / (n - 1)), 4)
               AS DOUBLE) + 0.0 AS sd_winsor,
           CAST(ROUND(1 - sqrt((ssw - sw * sw / n) / (n - 1))
               / sqrt((ss - s * s / n) / (n - 1)), 6) AS DOUBLE) + 0.0
               AS sd_reduction
    FROM m
    """,
)
def winsor_effect_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of the spend variance is four whales? The before/
    after moment sheet for a 5/95 winsorization — the report that
    justifies (or vetoes) winsorize_prices in a pipeline."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    u = e.groupBy("user_id").agg(
        F.sum(_dec(F.col("value"), 18, 6)).alias("y")
    )
    wk = Window.orderBy("y", "user_id")
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = u.select(
        "y",
        F.row_number().over(wk).alias("k"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    cuts = r.agg(
        F.max(
            F.when(
                F.col("k")
                == F.greatest(
                    F.ceil(0.05 * F.col("n")).cast("long"), F.lit(1)
                ),
                F.col("y"),
            )
        ).alias("lo"),
        F.max(
            F.when(
                F.col("k") == F.ceil(0.95 * F.col("n")).cast("long"),
                F.col("y"),
            )
        ).alias("hi"),
    )
    w = u.crossJoin(F.broadcast(cuts)).select(
        "y",
        F.least(
            F.greatest(F.col("y"), F.col("lo")), F.col("hi")
        ).alias("yw"),
    )
    y16 = F.col("y").cast("decimal(16,6)")
    yw16 = F.col("yw").cast("decimal(16,6)")
    m = w.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("double").alias("s"),
        F.sum(y16 * y16).cast("double").alias("ss"),
        F.sum("yw").cast("double").alias("sw"),
        F.sum(yw16 * yw16).cast("double").alias("ssw"),
    )
    n = F.col("n")
    sd_raw = F.sqrt(
        (F.col("ss") - F.col("s") * F.col("s") / n) / (n - 1)
    )
    sd_w = F.sqrt(
        (F.col("ssw") - F.col("sw") * F.col("sw") / n) / (n - 1)
    )
    return m.select(
        n.cast("long").alias("n_users"),
        (F.round(F.col("s") / n, 4) + F.lit(0.0)).alias("mean_raw"),
        (F.round(F.col("sw") / n, 4) + F.lit(0.0)).alias("mean_winsor"),
        (F.round(sd_raw, 4) + F.lit(0.0)).alias("sd_raw"),
        (F.round(sd_w, 4) + F.lit(0.0)).alias("sd_winsor"),
        (F.round(1 - sd_w / sd_raw, 6) + F.lit(0.0)).alias(
            "sd_reduction"
        ),
    )


# Simpson's-paradox audit: the cohort conversion-rate difference
# overall vs within each activity quartile — flags when the pooled
# direction contradicts every stratum (the aggregation trap
# mantel_haenszel_q and ipw_ate_q exist to defuse). One row per
# stratum plus the pooled row (stratum = -1).
@register(
    "simpson_paradox_q",
    """
    WITH u AS (
        SELECT user_id, user_id % 2 AS w, COUNT(*) AS act,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY user_id
    ),
    tiled AS (
        SELECT w, conv,
               NTILE(4) OVER (ORDER BY act, user_id) AS s
        FROM u
    ),
    stacked AS (
        SELECT s, w, conv FROM tiled
        UNION ALL SELECT -1, w, conv FROM tiled
    ),
    cells AS (
        SELECT s,
               SUM(CASE WHEN w = 1 THEN conv ELSE 0 END) AS c1,
               SUM(CASE WHEN w = 1 THEN 1 ELSE 0 END) AS n1,
               SUM(CASE WHEN w = 0 THEN conv ELSE 0 END) AS c0,
               SUM(CASE WHEN w = 0 THEN 1 ELSE 0 END) AS n0
        FROM stacked GROUP BY s
    )
    SELECT CAST(s AS BIGINT) AS stratum,
           CAST(ROUND(CAST(c1 AS DOUBLE) / NULLIF(n1, 0)
               - CAST(c0 AS DOUBLE) / NULLIF(n0, 0), 6) AS DOUBLE)
               + 0.0 AS rate_diff,
           CAST(c1 + c0 AS BIGINT) AS n_conversions,
           CAST(n1 + n0 AS BIGINT) AS n_users
    FROM cells
    """,
)
def simpson_paradox_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The aggregation trap, measured: pooled cohort rate difference
    (stratum -1) next to the within-quartile differences. A sign flip
    between the pooled row and all strata is Simpson's paradox —
    activity is confounding the cohort read."""
    from iniz_exporters_spark.operators.indexing import global_ntile

    e = Catalog(spark, sf_dir).events
    u = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("act"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    ).withColumn("w", F.col("user_id") % 2)
    tiled = global_ntile(
        u, [F.col("act").asc(), F.col("user_id").asc()], 4, "s"
    ).select("w", "conv", "s")
    both = tiled.unionByName(
        tiled.select("w", "conv", F.lit(-1).alias("s"))
    )
    cells = both.groupBy("s").agg(
        F.sum(F.when(F.col("w") == 1, F.col("conv")).otherwise(0)).alias(
            "c1"
        ),
        F.sum(F.when(F.col("w") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("w") == 0, F.col("conv")).otherwise(0)).alias(
            "c0"
        ),
        F.sum(F.when(F.col("w") == 0, 1).otherwise(0)).alias("n0"),
    )
    rd = F.col("c1").cast("double") / F.nullif(
        F.col("n1"), F.lit(0)
    ) - F.col("c0").cast("double") / F.nullif(F.col("n0"), F.lit(0))
    return cells.select(
        F.col("s").cast("long").alias("stratum"),
        (F.round(rd, 6) + F.lit(0.0)).alias("rate_diff"),
        (F.col("c1") + F.col("c0")).cast("long").alias("n_conversions"),
        (F.col("n1") + F.col("n0")).cast("long").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 7 (addendum 4): the u-chart for per-unit
# defect rates and Copeland tournament scores.
# ---------------------------------------------------------------------------


# u-chart: daily error events per ACTIVE USER with per-day
# variable-size control limits u-bar +- 3 sqrt(u-bar / n_day) — the
# SPC chart for rates whose denominator moves. Counts are exact; the
# centerline pools all days.
@register(
    "u_chart_q",
    """
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               COUNT(DISTINCT user_id) AS n_users,
               SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                   AS n_err
        FROM events GROUP BY CAST(ts AS DATE)
    ),
    bar AS (
        SELECT CAST(SUM(n_err) AS DOUBLE) / SUM(n_users) AS ubar
        FROM d
    )
    SELECT day,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(n_err AS BIGINT) AS n_errors,
           CAST(ROUND(CAST(n_err AS DOUBLE) / n_users, 6) AS DOUBLE)
               AS u_rate,
           CAST(ROUND((SELECT ubar FROM bar)
               + 3 * sqrt((SELECT ubar FROM bar) / n_users), 6)
               AS DOUBLE) AS ucl,
           CAST(n_err AS DOUBLE) / n_users
               > (SELECT ubar FROM bar)
                 + 3 * sqrt((SELECT ubar FROM bar) / n_users)
               AS violation
    FROM d
    """,
)
def u_chart_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error rate per active user with limits that widen on quiet
    days — the denominators-move SPC chart next to ewma_control_q
    (levels) and xbar_r_q (subgroups)."""
    e = Catalog(spark, sf_dir).events
    d = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("n_err"),
    )
    bar = d.agg(
        (
            F.sum("n_err").cast("double") / F.sum("n_users")
        ).alias("ubar")
    )
    j = d.crossJoin(F.broadcast(bar))
    ucl = F.col("ubar") + 3 * F.sqrt(F.col("ubar") / F.col("n_users"))
    rate = F.col("n_err").cast("double") / F.col("n_users")
    return j.select(
        "day",
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_err").cast("long").alias("n_errors"),
        F.round(rate, 6).alias("u_rate"),
        F.round(ucl, 6).alias("ucl"),
        (rate > ucl).alias("violation"),
    )


# Copeland tournament scores over the daily-mean win matrix (the
# bradley_terry_q games): score = #opponents beaten on majority of
# shared days - #opponents lost to. The zero-iteration ranking that
# sanity-checks bradley_terry_q's MM strengths (they should agree on
# order when wins are decisive).
@register(
    "copeland_q",
    """
    WITH dt AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events GROUP BY CAST(ts AS DATE), event_type
    ),
    duels AS (
        SELECT a.event_type AS ti, b.event_type AS tj,
               SUM(CASE WHEN a.m > b.m THEN 1 ELSE 0 END) AS w,
               COUNT(*) AS n
        FROM dt a JOIN dt b
            ON b.day = a.day AND a.event_type <> b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT ti AS event_type,
           CAST(SUM(CASE WHEN 2 * w > n THEN 1
                         WHEN 2 * w < n THEN -1
                         ELSE 0 END) AS BIGINT) AS copeland_score,
           CAST(SUM(w) AS BIGINT) AS days_won
    FROM duels GROUP BY ti
    """,
)
def copeland_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-duel standings for the event types: +1 per opponent
    beaten on most shared days, -1 per loss, 0 per tie — the
    iteration-free companion to bradley_terry_q."""
    e = Catalog(spark, sf_dir).events
    dt = e.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        (
            F.sum(_dec(F.col("value"), 18, 6)).cast("double")
            / F.count(F.lit(1))
        )
        .cast("decimal(18,6)")
        .alias("m")
    )
    a = dt.select(
        F.col("day").alias("da"),
        F.col("event_type").alias("ti"),
        F.col("m").alias("ma"),
    )
    b = dt.select(
        F.col("day").alias("db"),
        F.col("event_type").alias("tj"),
        F.col("m").alias("mb"),
    )
    duels = (
        a.join(
            b,
            (F.col("da") == F.col("db"))
            & (F.col("ti") != F.col("tj")),
        )
        .groupBy("ti", "tj")
        .agg(
            F.sum(
                F.when(F.col("ma") > F.col("mb"), 1).otherwise(0)
            ).alias("w"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    pt = (
        F.when(2 * F.col("w") > F.col("n"), 1)
        .when(2 * F.col("w") < F.col("n"), -1)
        .otherwise(0)
    )
    return duels.groupBy(F.col("ti").alias("event_type")).agg(
        F.sum(pt).cast("long").alias("copeland_score"),
        F.sum("w").cast("long").alias("days_won"),
    )


# ---------------------------------------------------------------------------
# Round-10 additions: training-corpus quality gates from the published
# pipelines — Gopher quality rules (Rae et al. 2021 §A1.1), repeated-n-gram
# fractions (ibid. Table A1), and GPT-3-style n-gram decontamination
# (Brown et al. 2020 appendix C). Registered at the chunk end per the
# frozen-registry growth protocol; every ratio is ROUND(CAST/CAST, 6) with
# the identical expression in both engines and every THRESHOLD decision is
# pure integer arithmetic (no rounded double ever reaches a boolean).
# ---------------------------------------------------------------------------
from iniz_exporters_spark.functions.text import tokens as _tokens_r10  # noqa: E402
from iniz_exporters_spark.queries.p01 import _SQL_TOKENS as _SQL_TOKENS_R10  # noqa: E402

# Gopher's stopword-presence rule uses a small fixed function-word list;
# this subset has nonzero variance on the synthetic corpus (0-22% of
# tokens per doc).
_GOPHER_STOPS = ("the", "a", "of", "to", "and", "in", "is", "it", "on", "for")
_SQL_STOPS = "('" + "', '".join(_GOPHER_STOPS) + "')"


@register(
    "gopher_rules_q",
    f"""
    WITH t AS (SELECT doc_id, unnest({_SQL_TOKENS_R10}) AS w FROM documents),
    ga AS (
        SELECT doc_id,
               COUNT(*) AS n_words,
               SUM(length(w)) AS sum_len,
               COUNT(DISTINCT w) AS n_uniq,
               SUM(CASE WHEN w IN {_SQL_STOPS} THEN 1 ELSE 0 END) AS n_stop
        FROM t GROUP BY doc_id
    ),
    ag AS (
        SELECT d.doc_id,
               COALESCE(ga.n_words, 0) AS n_words,
               COALESCE(ga.sum_len, 0) AS sum_len,
               COALESCE(ga.n_uniq, 0) AS n_uniq,
               COALESCE(ga.n_stop, 0) AS n_stop
        FROM documents d LEFT JOIN ga ON d.doc_id = ga.doc_id
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           ROUND(CAST(sum_len AS DOUBLE) / NULLIF(n_words, 0), 6)
               AS mean_word_len,
           ROUND(CAST(n_stop AS DOUBLE) / NULLIF(n_words, 0), 6)
               AS stop_frac,
           ROUND(CAST(n_uniq AS DOUBLE) / NULLIF(n_words, 0), 6)
               AS uniq_frac,
           n_words BETWEEN 50 AND 100000 AS word_count_ok,
           (n_words > 0
            AND sum_len >= 3 * n_words AND sum_len <= 10 * n_words)
               AS mean_len_ok,
           n_stop >= 2 AS stop_ok,
           (n_words BETWEEN 50 AND 100000
            AND sum_len >= 3 * n_words AND sum_len <= 10 * n_words
            AND n_stop >= 2) AS passes_all
    FROM ag
    """,
)
def gopher_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-filter composite (Rae et al. 2021 §A1.1), the rules
    with variance on an all-alphanumeric corpus: word count in [50, 1e5],
    mean word length in [3, 10], and >= 2 stopwords present. Per-doc flags
    plus the measured ratios; every flag compares INTEGERS (mean-length
    bounds as 3n <= sum_len <= 10n) so no float rounding reaches a
    boolean. Every doc is emitted — zero-token docs left-join back with
    n_words=0 and passes_all=false (ADVICE r10: the explode path must not
    let an empty/garbage doc slip past the gate unflagged; matches the
    repo's emit-every-doc rule). Scale shape: token explode -> ONE
    map-side-combining aggregation keyed on doc_id, then a doc_id-keyed
    left join back to the narrow doc_id spine."""
    d = Catalog(spark, sf_dir).documents
    t = d.select("doc_id", F.explode(_tokens_r10("text")).alias("w"))
    ga = t.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.length("w")).alias("sum_len"),
        F.count_distinct("w").alias("n_uniq"),
        F.sum(
            F.when(F.col("w").isin(*_GOPHER_STOPS), 1).otherwise(0)
        ).alias("n_stop"),
    )
    ag = d.select("doc_id").join(ga, "doc_id", "left").select(
        "doc_id",
        *[
            F.coalesce(F.col(c), F.lit(0)).alias(c)
            for c in ("n_words", "sum_len", "n_uniq", "n_stop")
        ],
    )
    nw = F.col("n_words")
    wc_ok = (nw >= 50) & (nw <= 100000)
    ml_ok = (
        (nw > 0)
        & (F.col("sum_len") >= 3 * nw)
        & (F.col("sum_len") <= 10 * nw)
    )
    st_ok = F.col("n_stop") >= 2
    return ag.select(
        "doc_id",
        nw.cast("long").alias("n_words"),
        F.round(
            F.col("sum_len").cast("double") / F.nullif(nw, F.lit(0)), 6
        ).alias("mean_word_len"),
        F.round(
            F.col("n_stop").cast("double") / F.nullif(nw, F.lit(0)), 6
        ).alias("stop_frac"),
        F.round(
            F.col("n_uniq").cast("double") / F.nullif(nw, F.lit(0)), 6
        ).alias("uniq_frac"),
        wc_ok.alias("word_count_ok"),
        ml_ok.alias("mean_len_ok"),
        st_ok.alias("stop_ok"),
        (wc_ok & ml_ok & st_ok).alias("passes_all"),
    )


@register(
    "rep_ngram_fractions_q",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS_R10} AS ts FROM documents),
    b AS (
        SELECT doc_id,
               list_aggregate(ts[i:i+1], 'string_agg', ' ') AS g
        FROM t, LATERAL (SELECT unnest(range(1, len(ts))) AS i)
        WHERE len(ts) >= 2
    ),
    g3 AS (
        SELECT doc_id,
               list_aggregate(ts[i:i+2], 'string_agg', ' ') AS g
        FROM t, LATERAL (SELECT unnest(range(1, len(ts) - 1)) AS i)
        WHERE len(ts) >= 3
    ),
    top2 AS (SELECT doc_id, MAX(c) AS c2 FROM (
        SELECT doc_id, g, COUNT(*) AS c FROM b GROUP BY doc_id, g)
        GROUP BY doc_id),
    top3 AS (SELECT doc_id, MAX(c) AS c3 FROM (
        SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY doc_id, g)
        GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(len(t.ts) AS BIGINT) AS n_tokens,
           CAST(COALESCE(top2.c2, 0) AS BIGINT) AS top2_count,
           CAST(COALESCE(top3.c3, 0) AS BIGINT) AS top3_count,
           ROUND(CAST(2 * COALESCE(top2.c2, 0) AS DOUBLE)
                 / NULLIF(len(t.ts), 0), 6) AS top2_frac,
           ROUND(CAST(3 * COALESCE(top3.c3, 0) AS DOUBLE)
                 / NULLIF(len(t.ts), 0), 6) AS top3_frac
    FROM t LEFT JOIN top2 ON t.doc_id = top2.doc_id
           LEFT JOIN top3 ON t.doc_id = top3.doc_id
    """,
)
def rep_ngram_fractions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-n-gram repetition signals (Rae et al. 2021 Table A1): the
    fraction of a doc's tokens covered by its single most frequent bigram
    and trigram (the unigram case is ``repetition_ratio``). Near-1 values
    mark looping/boilerplate text. Scale shape: n-grams come from pure
    array expressions over the token array (whole-stage codegen, no
    window, no self-join); each explode feeds one (doc_id, gram)
    aggregation and the per-doc maxima join back doc-keyed. The guarded
    ``when(size >= n)`` matters: Spark's ``sequence(1, 0)`` DESCENDS
    rather than returning empty, so short docs must never reach it."""
    d = Catalog(spark, sf_dir).documents
    t = d.select("doc_id", _tokens_r10("text").alias("ts")).transform(pin)
    empty = F.array().cast("array<string>")

    def grams(n: int):
        return F.when(
            F.size("ts") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("ts") - (n - 1)),
                lambda i: F.array_join(F.slice("ts", i, n), " "),
            ),
        ).otherwise(empty)

    def top(n: int, out: str):
        return (
            t.select("doc_id", F.explode(grams(n)).alias("g"))
            .groupBy("doc_id", "g")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("doc_id")
            .agg(F.max("c").alias(out))
        )

    base = t.select("doc_id", F.size("ts").alias("n_tokens"))
    c2, c3 = F.col("top2_count"), F.col("top3_count")
    nt = F.col("n_tokens")
    return (
        base.join(top(2, "c2"), "doc_id", "left")
        .join(top(3, "c3"), "doc_id", "left")
        .select(
            "doc_id",
            nt.cast("long").alias("n_tokens"),
            F.coalesce(F.col("c2"), F.lit(0)).cast("long").alias("top2_count"),
            F.coalesce(F.col("c3"), F.lit(0)).cast("long").alias("top3_count"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "top2_count",
            "top3_count",
            F.round(
                (2 * c2).cast("double") / F.nullif(nt, F.lit(0)), 6
            ).alias("top2_frac"),
            F.round(
                (3 * c3).cast("double") / F.nullif(nt, F.lit(0)), 6
            ).alias("top3_frac"),
        )
    )


@register(
    "token_ngram_decontam_q",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS_R10} AS ts FROM documents),
    g AS (
        SELECT doc_id,
               list_aggregate(ts[i:i+12], 'string_agg', ' ') AS g
        FROM t, LATERAL (SELECT unnest(range(1, len(ts) - 11)) AS i)
        WHERE len(ts) >= 13
    ),
    te AS (SELECT DISTINCT doc_id, g FROM g WHERE doc_id % 50 = 0),
    tr AS (SELECT doc_id, g FROM g WHERE doc_id % 50 <> 0),
    hits AS (
        SELECT te.doc_id, COUNT(DISTINCT te.g) AS n_hits
        FROM te JOIN tr ON te.g = tr.g
        GROUP BY te.doc_id
    ),
    ng AS (SELECT doc_id, COUNT(DISTINCT g) AS n_grams FROM g
           WHERE doc_id % 50 = 0 GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(COALESCE(ng.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(hits.n_hits, 0) AS BIGINT) AS n_hits,
           COALESCE(hits.n_hits, 0) > 0 AS is_contaminated
    FROM t LEFT JOIN ng ON t.doc_id = ng.doc_id
           LEFT JOIN hits ON t.doc_id = hits.doc_id
    WHERE t.doc_id % 50 = 0
    """,
)
def token_ngram_decontam_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style train/test decontamination (Brown et al. 2020 app. C):
    a held-out doc is contaminated if any of its 13-token-grams appears in
    the training split. Emits EVERY test doc with its distinct-13-gram
    count, hit count, and flag (the violations-only shape would be empty
    at small scales and unverifiable — DETERMINISM.md rule). Scale shape:
    the TEST gram set is benchmark-sized, so it broadcasts and the
    training corpus streams past it — the train side is never globally
    distinct-ed and never shuffles on the gram; the only shuffle is the
    per-test-doc hit aggregation, bounded by |test grams|. At 100 TB,
    swap the gram string for its poly_hash to shrink the broadcast."""
    d = Catalog(spark, sf_dir).documents
    t = d.select("doc_id", _tokens_r10("text").alias("ts"))
    grams = F.when(
        F.size("ts") >= 13,
        F.transform(
            F.sequence(F.lit(1), F.size("ts") - 12),
            lambda i: F.array_join(F.slice("ts", i, 13), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = t.select("doc_id", F.explode(grams).alias("g"))
    # the test-split gram set is read three times (ng, the broadcast join
    # build, the base outline) — pin it so the test docs tokenize once
    # (the r10 review measured 4 FileScans without). The TRAIN side stays
    # UNPINNED deliberately: it streams once, and checkpointing the
    # corpus-scale gram stream would materialize ~13× the corpus bytes.
    te = (
        g.filter(F.col("doc_id") % 50 == 0)
        .select(F.col("doc_id").alias("test_id"), "g")
        .distinct()
        .transform(pin)
    )
    tr = g.filter(F.col("doc_id") % 50 != 0).select("g")
    hits = (
        tr.join(F.broadcast(te), "g")
        .groupBy("test_id")
        .agg(F.count_distinct("g").alias("n_hits"))
    )
    ng = te.groupBy("test_id").agg(F.count(F.lit(1)).alias("n_grams"))
    base = d.filter(F.col("doc_id") % 50 == 0).select("doc_id")
    return (
        base.join(ng, base["doc_id"] == ng["test_id"], "left")
        .drop("test_id")
        .join(hits, base["doc_id"] == hits["test_id"], "left")
        .drop("test_id")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias(
                "is_contaminated"
            ),
        )
    )


@register(
    "split_doc_boundary_q",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS_R10} AS ts FROM documents),
    el AS (SELECT doc_id, ts FROM t WHERE len(ts) >= 3),
    suf AS (SELECT doc_id,
                   list_aggregate(ts[len(ts)-2:len(ts)], 'string_agg', ' ')
                       AS g
            FROM el),
    pre AS (SELECT doc_id,
                   list_aggregate(ts[1:3], 'string_agg', ' ') AS g
            FROM el),
    cont AS (SELECT suf.doc_id, COUNT(*) AS n_continuations
             FROM suf JOIN pre ON suf.g = pre.g AND suf.doc_id <> pre.doc_id
             GROUP BY suf.doc_id),
    pred AS (SELECT pre.doc_id, COUNT(*) AS n_predecessors
             FROM pre JOIN suf ON pre.g = suf.g AND pre.doc_id <> suf.doc_id
             GROUP BY pre.doc_id)
    SELECT t.doc_id,
           CAST(COALESCE(cont.n_continuations, 0) AS BIGINT)
               AS n_continuations,
           CAST(COALESCE(pred.n_predecessors, 0) AS BIGINT)
               AS n_predecessors,
           (COALESCE(cont.n_continuations, 0)
            + COALESCE(pred.n_predecessors, 0)) > 0 AS has_boundary_link
    FROM t LEFT JOIN cont ON t.doc_id = cont.doc_id
           LEFT JOIN pred ON t.doc_id = pred.doc_id
    """,
)
def split_doc_boundary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-boundary split-document detection: doc A's trailing 3-gram
    equaling doc B's leading 3-gram marks a candidate A->B continuation
    (a document cut in two during corpus construction). Emits EVERY doc
    with its continuation/predecessor counts and a flag (rule 11 — never
    violations-only). Scale shape: each side reduces to ONE (doc_id,
    boundary-gram) row per document, so the match join shuffles exactly
    one row per doc on the gram key regardless of document length —
    metadata-scale at any corpus size."""
    d = Catalog(spark, sf_dir).documents
    t = d.select("doc_id", _tokens_r10("text").alias("ts"))
    # ONE tokenizing scan: both boundary grams come out of the same pass
    # and the (doc_id, 2 short strings) frame is pinned — without it the
    # cont/pred branches re-tokenize the corpus once each per side
    # (measured 5 FileScans; the r10 review caught it)
    sp = (
        t.filter(F.size("ts") >= 3)
        .select(
            "doc_id",
            F.array_join(F.slice("ts", F.size("ts") - 2, 3), " ").alias(
                "suf_g"
            ),
            F.array_join(F.slice("ts", 1, 3), " ").alias("pre_g"),
        )
        .transform(pin)
    )
    suf = sp.select("doc_id", F.col("suf_g").alias("g"))
    pre = sp.select("doc_id", F.col("pre_g").alias("g"))
    cont = (
        suf.alias("s")
        .join(pre.alias("p"), "g")
        .filter(F.col("s.doc_id") != F.col("p.doc_id"))
        .groupBy(F.col("s.doc_id").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_continuations"))
    )
    pred = (
        pre.alias("p")
        .join(suf.alias("s"), "g")
        .filter(F.col("p.doc_id") != F.col("s.doc_id"))
        .groupBy(F.col("p.doc_id").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_predecessors"))
    )
    nc = F.coalesce(F.col("n_continuations"), F.lit(0))
    np_ = F.coalesce(F.col("n_predecessors"), F.lit(0))
    return (
        t.select("doc_id")
        .join(cont, "doc_id", "left")
        .join(pred, "doc_id", "left")
        .select(
            "doc_id",
            nc.cast("long").alias("n_continuations"),
            np_.cast("long").alias("n_predecessors"),
            ((nc + np_) > 0).alias("has_boundary_link"),
        )
    )


@register(
    "mixture_domain_weights_q",
    f"""
    WITH t AS (
        SELECT source, COUNT(*) AS n_docs,
               SUM(len({_SQL_TOKENS_R10})) AS n_tokens
        FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS total FROM t),
    w AS (
        SELECT source, n_docs, n_tokens,
               CAST(n_tokens AS DOUBLE) / tot.total AS share,
               CAST(CAST(pow(CAST(n_tokens AS DOUBLE) / tot.total, 0.3)
                         AS DECIMAL(18,12)) AS DECIMAL(18,12)) AS w_raw
        FROM t CROSS JOIN tot
    ),
    s AS (SELECT CAST(SUM(w_raw) AS DECIMAL(28,12)) AS wsum FROM w)
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(share, 6) AS token_share,
           ROUND(CAST(w_raw AS DOUBLE) / CAST(s.wsum AS DOUBLE), 6)
               AS mix_weight
    FROM w CROSS JOIN s
    ORDER BY source
    """,
)
def mixture_domain_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture sampling weights per source domain, the
    alpha-smoothed multinomial of GPT-3/The Pile (weight proportional to
    token_share^0.3 — upweights small domains, normalized to 1). The
    pow() runs once per SOURCE (domain-cardinality, not corpus), and its
    double output is quantized to DECIMAL(18,12) BEFORE the normalizing
    sum so the sum is order-invariant across partitions/engines (a raw
    double sum of the weights would be ulp-sensitive to partition order —
    DETERMINISM.md rule 1 applied to a libm output). Scale shape: one
    map-side-combining aggregation keyed on source; everything after is
    domain-cardinality arithmetic."""
    d = Catalog(spark, sf_dir).documents
    # pinned: t feeds tot, w, s, and the final select — without the pin
    # the corpus tokenize+agg re-runs once per consumer (the r10 review
    # measured 4 FileScans). After the agg this is domain-cardinality.
    t = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_tokens_r10("text"))).alias("n_tokens"),
    ).transform(pin)
    tot = t.agg(F.sum("n_tokens").cast("double").alias("total"))
    w = t.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("total")).alias("share"),
        F.pow(
            F.col("n_tokens").cast("double") / F.col("total"), F.lit(0.3)
        )
        .cast("decimal(18,12)")
        .alias("w_raw"),
    )
    s = w.agg(F.sum("w_raw").cast("decimal(28,12)").alias("wsum"))
    return (
        w.crossJoin(F.broadcast(s))
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round("share", 6).alias("token_share"),
            F.round(
                F.col("w_raw").cast("double") / F.col("wsum").cast("double"),
                6,
            ).alias("mix_weight"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Round-11 additions: duplicate-removal ACCOUNTING in the two shapes the
# published pipelines actually deploy — Dolma's Bloom-filter dedup (Soldaini
# et al. 2024 §2.3, first-occurrence-wins over 13-grams; exact variant here
# so the oracle is deterministic) and C4's paragraph-level exact dedup
# (Raffel et al. 2020 §2.2, keep-first over text chunks). Both emit EVERY
# doc (violations-only would be unverifiable at small scales), every ratio
# is ROUND(CAST/CAST, 6), and every flag decision is pure integer
# arithmetic. Registered at the chunk end per the growth protocol.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.session import spread_for_kernel as _spread_r11  # noqa: E402


@register(
    "bff_dedup_q",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS_R10} AS ts FROM documents),
    gr AS (
        SELECT doc_id,
               list_aggregate(ts[i:i+12], 'string_agg', ' ') AS g
        FROM t, LATERAL (SELECT unnest(range(1, len(ts) - 11)) AS i)
        WHERE len(ts) >= 13
    ),
    own AS (SELECT g, MIN(doc_id) AS owner FROM gr GROUP BY g),
    ag AS (
        SELECT gr.doc_id,
               COUNT(*) AS n_grams,
               SUM(CASE WHEN own.owner < gr.doc_id THEN 1 ELSE 0 END)
                   AS n_dup
        FROM gr JOIN own ON gr.g = own.g
        GROUP BY gr.doc_id
    )
    SELECT t.doc_id,
           CAST(COALESCE(ag.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(ag.n_dup, 0) AS BIGINT) AS n_dup,
           ROUND(CAST(COALESCE(ag.n_dup, 0) AS DOUBLE)
                 / NULLIF(COALESCE(ag.n_grams, 0), 0), 6) AS dup_frac,
           (COALESCE(ag.n_grams, 0) > 0
            AND 5 * COALESCE(ag.n_dup, 0) >= 4 * COALESCE(ag.n_grams, 0))
               AS drop_flag
    FROM t LEFT JOIN ag ON t.doc_id = ag.doc_id
    """,
)
def bff_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dolma BFF dedup accounting (Soldaini et al. 2024 §2.3), exact
    variant: scanning docs in doc_id order, a 13-gram occurrence is a
    duplicate iff some earlier doc already contains that gram; a doc is
    dropped when >= 80% of its gram occurrences are duplicates (the 4/5
    test is integer: 5*n_dup >= 4*n_grams). The probabilistic filter is
    replaced by the exact first-owner (min doc_id per gram) so both
    engines agree bit-for-bit. Docs under 13 tokens emit n_grams=0 /
    NULL frac / false flag. Scale shape: ONE shuffle on the gram for a
    whole-partition min window (no agg+self-join pass over the gram
    stream), then one doc-keyed aggregation; only (doc_id, gram) rows
    ever shuffle. At 100 TB swap the gram string for its poly_hash to
    shrink the exchange (collision odds documented at dup_spans)."""
    d = Catalog(spark, sf_dir).documents
    t = _spread_r11(d.select("doc_id", "text")).select(
        "doc_id", _tokens_r10("text").alias("ts")
    )
    grams = F.when(
        F.size("ts") >= 13,
        F.transform(
            F.sequence(F.lit(1), F.size("ts") - 12),
            lambda i: F.array_join(F.slice("ts", i, 13), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    gr = t.select("doc_id", F.explode(grams).alias("g"))
    w = Window.partitionBy("g")
    occ = gr.select(
        "doc_id",
        (F.col("doc_id") > F.min("doc_id").over(w)).alias("is_dup"),
    )
    ag = occ.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("n_dup"),
    )
    ng, nd = F.col("n_grams"), F.col("n_dup")
    return (
        d.select("doc_id")
        .join(ag, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(ng, F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(nd, F.lit(0)).cast("long").alias("n_dup"),
            F.round(
                F.coalesce(nd, F.lit(0)).cast("double")
                / F.nullif(F.coalesce(ng, F.lit(0)), F.lit(0)),
                6,
            ).alias("dup_frac"),
            (
                (F.coalesce(ng, F.lit(0)) > 0)
                & (5 * F.coalesce(nd, F.lit(0)) >= 4 * F.coalesce(ng, F.lit(0)))
            ).alias("drop_flag"),
        )
    )


@register(
    "chunk_dedup_q",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS_R10} AS ts FROM documents),
    c AS (
        SELECT doc_id, ci,
               list_aggregate(ts[20*(ci-1)+1 : 20*ci], 'string_agg', ' ')
                   AS g,
               least(20, len(ts) - 20*(ci-1)) AS clen
        FROM t, LATERAL (
            SELECT unnest(range(1, (len(ts) + 19) // 20 + 1)) AS ci)
        WHERE len(ts) >= 1
    ),
    own AS (SELECT g, MIN(doc_id) AS od FROM c GROUP BY g),
    fst AS (
        SELECT c.g, own.od, MIN(c.ci) AS oc
        FROM c JOIN own ON c.g = own.g AND c.doc_id = own.od
        GROUP BY c.g, own.od
    ),
    ag AS (
        SELECT c.doc_id,
               COUNT(*) AS n_chunks,
               SUM(CASE WHEN c.doc_id = fst.od AND c.ci = fst.oc
                        THEN 0 ELSE 1 END) AS n_dup_chunks,
               SUM(CASE WHEN c.doc_id = fst.od AND c.ci = fst.oc
                        THEN 0 ELSE c.clen END) AS n_trimmed
        FROM c JOIN fst ON c.g = fst.g
        GROUP BY c.doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.ts) AS BIGINT) AS n_tokens,
           CAST(COALESCE(ag.n_chunks, 0) AS BIGINT) AS n_chunks,
           CAST(COALESCE(ag.n_dup_chunks, 0) AS BIGINT) AS n_dup_chunks,
           CAST(len(t.ts) - COALESCE(ag.n_trimmed, 0) AS BIGINT)
               AS n_kept_tokens
    FROM t LEFT JOIN ag ON t.doc_id = ag.doc_id
    """,
)
def chunk_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style exact chunk dedup accounting (Raffel et al. 2020 §2.2 —
    paragraph-level keep-first, over fixed 20-token chunks since the
    synthetic corpus has no line structure): every occurrence of a chunk
    except its global first (min doc_id, then min chunk index within that
    doc) is removed; per doc, the chunks lost and the tokens surviving.
    The ragged tail chunk participates (its length is least(20, n-20i)).
    Scale shape: non-overlapping chunks mean the chunk stream is ~n/20
    rows of <=20-token strings — one shuffle keyed on the chunk for the
    owner resolution (two whole-partition windows over ONE exchange+sort:
    min doc, then min index within that doc), one doc-keyed aggregation,
    and a doc-spine left join. No agg+self-join pass over the chunk
    stream; nothing corpus-scale is pinned."""
    d = Catalog(spark, sf_dir).documents
    t = _spread_r11(d.select("doc_id", "text")).select(
        "doc_id", _tokens_r10("text").alias("ts")
    )
    n = F.size("ts")
    chunks = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), F.ceil(n / F.lit(20)).cast("int")),
            lambda ci: F.struct(
                ci.alias("ci"),
                F.array_join(
                    F.slice("ts", (ci - 1) * 20 + 1, 20), " "
                ).alias("g"),
                F.least(F.lit(20), n - (ci - 1) * 20).alias("clen"),
            ),
        ),
    ).otherwise(
        F.array().cast(
            "array<struct<ci:int,g:string,clen:int>>"
        )
    )
    c = t.select("doc_id", F.explode(chunks).alias("__c")).select(
        "doc_id",
        F.col("__c.ci").alias("ci"),
        F.col("__c.g").alias("g"),
        F.col("__c.clen").alias("clen"),
    )
    w = Window.partitionBy("g")
    c1 = c.select(
        "doc_id", "ci", "g", "clen", F.min("doc_id").over(w).alias("od")
    )
    c2 = c1.select(
        "doc_id",
        "ci",
        "clen",
        "od",
        F.min(
            F.when(F.col("doc_id") == F.col("od"), F.col("ci"))
        )
        .over(w)
        .alias("oc"),
    )
    kept = (F.col("doc_id") == F.col("od")) & (F.col("ci") == F.col("oc"))
    ag = c2.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(kept, 0).otherwise(1)).alias("n_dup_chunks"),
        F.sum(F.when(kept, 0).otherwise(F.col("clen"))).alias("n_trimmed"),
    )
    return (
        t.select("doc_id", n.alias("n_tokens"))
        .join(ag, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_chunks"), F.lit(0))
            .cast("long")
            .alias("n_chunks"),
            F.coalesce(F.col("n_dup_chunks"), F.lit(0))
            .cast("long")
            .alias("n_dup_chunks"),
            (F.col("n_tokens") - F.coalesce(F.col("n_trimmed"), F.lit(0)))
            .cast("long")
            .alias("n_kept_tokens"),
        )
    )


@register(
    "holt_linear_q",
    """
    WITH daily AS (
        SELECT o_orderpriority AS pri,
               CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
               SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
        FROM orders GROUP BY pri, day
    ),
    ser AS (
        SELECT pri,
               list(CAST(rev AS DOUBLE) ORDER BY day ASC) AS v,
               COUNT(*) AS n
        FROM daily GROUP BY pri
    ),
    st AS (
        -- state rides a DOUBLE[2] list [l, b], NOT a struct: DuckDB 1.0's
        -- list_reduce evaluates struct-lambda fields IN PLACE (field 2
        -- sees field 1's updated value), which silently corrupts any
        -- coupled recurrence; list accumulators fold honestly
        -- (DETERMINISM.md rule 15)
        SELECT pri, n,
               list_reduce(
                   list_prepend(
                       [v[1], CAST(0.0 AS DOUBLE)],
                       list_transform(v[2:],
                                      x -> [x, CAST(0.0 AS DOUBLE)])),
                   (acc, x) -> [
                       CAST(0.5 AS DOUBLE) * x[1]
                           + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]),
                       CAST(0.25 AS DOUBLE)
                           * ((CAST(0.5 AS DOUBLE) * x[1]
                               + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]))
                              - acc[1])
                           + CAST(0.75 AS DOUBLE) * acc[2]]) AS s
        FROM ser
    )
    SELECT pri,
           CAST(n AS BIGINT) AS n_days,
           CAST(ROUND(CAST(s[1] AS DECIMAL(28,12)), 6) AS DOUBLE) AS level,
           CAST(ROUND(CAST(s[2] AS DECIMAL(28,12)), 6) AS DOUBLE) AS trend,
           CAST(ROUND(CAST(s[1] + 7 * s[2] AS DECIMAL(28,12)), 6) AS DOUBLE)
               AS forecast_7d
    FROM st
    """,
)
def holt_linear_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend exponential smoothing (the two-state member of
    the smoothing family next to ewma_q/stl_decompose): per order
    priority, fold the day-ordered daily-revenue series through
    l_t = a*y + (1-a)(l+b), b_t = B(l_t - l) + (1-B)b with DYADIC
    coefficients a=1/2, B=1/4 — every multiply is an exact power-of-two
    scaling, so the fold is bit-identical wherever IEEE doubles are
    (DETERMINISM.md rule: rational schedules over libm). Seed l_1 = y_1,
    b_1 = 0; both engines run the identical sequential schedule. Output
    is decimal-space rounded. Scale shape: the fact-scale work is ONE
    map-side-combining (pri, day) aggregation; the fold runs over the
    calendar-bounded daily series (~2.4k doubles per key), which is
    metadata-sized regardless of corpus size — same rationale as
    pareto_frontier_q's per-day window."""
    o = Catalog(spark, sf_dir).orders
    daily = o.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev"))
    ser = daily.groupBy("pri").agg(
        F.sort_array(
            F.collect_list(F.struct("day", "rev"))
        ).alias("sd"),
        F.count(F.lit(1)).alias("n"),
    )
    v = F.transform("sd", lambda e: e["rev"].cast("double"))
    ser = ser.select("pri", "n", v.alias("v"))
    half, quart, three_q = F.lit(0.5), F.lit(0.25), F.lit(0.75)

    def step(acc, x):
        lnew = half * x + half * (acc["l"] + acc["b"])
        return F.struct(
            lnew.alias("l"),
            (quart * (lnew - acc["l"]) + three_q * acc["b"]).alias("b"),
        )

    state = F.aggregate(
        F.slice("v", 2, F.greatest(F.size("v") - 1, F.lit(0))),
        F.struct(
            F.element_at("v", 1).alias("l"),
            F.lit(0.0).alias("b"),
        ),
        step,
    )
    s = ser.select("pri", "n", state.alias("s"))
    def dround(c):
        return F.round(c.cast("decimal(28,12)"), 6).cast("double")
    return s.select(
        "pri",
        F.col("n").cast("long").alias("n_days"),
        dround(F.col("s.l")).alias("level"),
        dround(F.col("s.b")).alias("trend"),
        dround(F.col("s.l") + 7 * F.col("s.b")).alias("forecast_7d"),
    )


@register(
    "binary_quantize_recall_q",
    """
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               list_reduce(list_transform(range(0, 32), d ->
                   CASE WHEN embedding[d + 1] >= 0
                        THEN (1::BIGINT << d) ELSE 0::BIGINT END),
                   (x, y) -> x + y) AS w0,
               list_reduce(list_transform(range(32, 64), d ->
                   CASE WHEN embedding[d + 1] >= 0
                        THEN (1::BIGINT << (d - 32)) ELSE 0::BIGINT END),
                   (x, y) -> x + y) AS w1
        FROM embeddings
    ),
    q AS (SELECT * FROM e WHERE vec_id < 10),
    exact5 AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY ROUND(list_cosine_similarity(q.v, c.v), 4)
                                DESC, c.vec_id) AS rn
            FROM q JOIN e c ON c.vec_id <> q.vec_id) WHERE rn <= 5
    ),
    bin5 AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY bit_count(xor(q.w0, c.w0))
                                + bit_count(xor(q.w1, c.w1)) ASC,
                                c.vec_id) AS rn
            FROM q JOIN e c ON c.vec_id <> q.vec_id) WHERE rn <= 5
    ),
    hit AS (
        SELECT exact5.query_id, COUNT(*) AS n_hit
        FROM exact5 JOIN bin5
          ON exact5.query_id = bin5.query_id
         AND exact5.neighbor_id = bin5.neighbor_id
        GROUP BY exact5.query_id
    )
    SELECT q.vec_id AS query_id,
           CAST(COALESCE(hit.n_hit, 0) AS BIGINT) AS n_hit,
           CAST(ROUND(CAST(COALESCE(hit.n_hit, 0) AS DECIMAL(18,6)) / 5, 6)
                AS DOUBLE) AS recall_at_5
    FROM q LEFT JOIN hit ON q.vec_id = hit.query_id
    """,
)
def binary_quantize_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantization retrieval eval (the 1-bit member of the
    quantization family next to int8_quantize_check / pq_adc_topk /
    ann_recall_check): sign-bit-pack each 64-dim embedding into two
    32-bit words, rank neighbors by Hamming distance, and measure
    recall@5 against the exact rounded-cosine top-5 (both rankings
    id-tiebroken — DETERMINISM.md rule 12). Emits every query with its
    overlap count; recall is an exact n/5 division rounded in decimal
    space. Scale shape: the sign-pack is a per-row fold (codegen, no
    shuffle); scoring broadcasts the bounded query set against the
    corpus exactly like knn_bruteforce, so the corpus side streams —
    at 100 TB the Hamming leg scans 16 bytes/vector instead of 512,
    which is the point of the quantization."""
    e = Catalog(spark, sf_dir).embeddings
    emb = F.col("embedding")

    def word(lo: int) -> F.Column:
        return F.aggregate(
            F.sequence(F.lit(lo), F.lit(lo + 31)),
            F.lit(0).cast("long"),
            lambda acc, d: acc
            + F.when(
                F.element_at(emb, d + 1) >= 0,
                # shiftleft takes a literal count; 2^k via pow is exact
                # in doubles for k <= 52 and casts back losslessly
                F.pow(F.lit(2.0), (d - lo).cast("double")).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )

    sig = e.select(
        "vec_id",
        emb.cast("array<double>").alias("v"),
        word(0).alias("w0"),
        word(32).alias("w1"),
    )
    q = sig.filter(F.col("vec_id") < 10)
    qb = F.broadcast(
        q.select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("w0").alias("qw0"),
            F.col("w1").alias("qw1"),
        )
    )
    c = sig.select(
        F.col("vec_id").alias("neighbor_id"), "v", "w0", "w1"
    )
    from iniz_exporters_spark.operators.similarity import cosine as _cos

    pairs = c.crossJoin(qb).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    we = Window.partitionBy("query_id").orderBy(
        F.round(_cos(F.col("qv"), F.col("v")), 4).desc(),
        F.col("neighbor_id").asc(),
    )
    wb = Window.partitionBy("query_id").orderBy(
        (
            F.bit_count(F.col("qw0").bitwiseXOR(F.col("w0")))
            + F.bit_count(F.col("qw1").bitwiseXOR(F.col("w1")))
        ).asc(),
        F.col("neighbor_id").asc(),
    )
    exact5 = (
        pairs.withColumn("rn", F.row_number().over(we))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id")
    )
    bin5 = (
        pairs.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id")
    )
    hit = exact5.join(bin5, ["query_id", "neighbor_id"]).groupBy(
        "query_id"
    ).agg(F.count(F.lit(1)).alias("n_hit"))
    nh = F.coalesce(F.col("n_hit"), F.lit(0))
    return (
        q.select(F.col("vec_id").alias("query_id"))
        .join(hit, "query_id", "left")
        .select(
            "query_id",
            nh.cast("long").alias("n_hit"),
            F.round(nh.cast("decimal(18,6)") / 5, 6)
            .cast("double")
            .alias("recall_at_5"),
        )
    )


@register(
    "croston_q",
    """
    WITH daily AS (
        SELECT l_partkey AS pk,
               CAST(date_trunc('day', l_shipdate) AS DATE) AS day,
               SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty
        FROM lineitem
        WHERE l_partkey % 97 = 0
        GROUP BY pk, day
    ),
    ser AS (
        SELECT pk,
               list(CAST(qty AS DOUBLE) ORDER BY day ASC) AS q,
               list(CAST(epoch(CAST(day AS TIMESTAMP)) / 86400 AS DOUBLE)
                    ORDER BY day ASC) AS d,
               COUNT(*) AS n
        FROM daily GROUP BY pk
    ),
    st AS (
        -- state is a DOUBLE[3] list [z, p, prev_day] (DETERMINISM.md
        -- rule 15: never struct state in a DuckDB fold); elements are
        -- [qty, day, 0]
        SELECT pk, n,
               list_reduce(
                   list_prepend(
                       [q[1], CAST(1.0 AS DOUBLE), d[1]],
                       list_transform(range(2, len(q) + 1),
                                      i -> [q[i], d[i], CAST(0.0 AS DOUBLE)])),
                   (acc, x) -> [
                       CAST(0.25 AS DOUBLE) * x[1]
                           + CAST(0.75 AS DOUBLE) * acc[1],
                       CAST(0.25 AS DOUBLE) * (x[2] - acc[3])
                           + CAST(0.75 AS DOUBLE) * acc[2],
                       x[2]]) AS s
        FROM ser
    )
    SELECT pk AS partkey,
           CAST(n AS BIGINT) AS n_demands,
           CAST(ROUND(CAST(s[1] AS DECIMAL(28,12)), 6) AS DOUBLE)
               AS demand_size,
           CAST(ROUND(CAST(s[2] AS DECIMAL(28,12)), 6) AS DOUBLE)
               AS demand_interval,
           CAST(ROUND(CAST(s[1] / s[2] AS DECIMAL(28,12)), 6) AS DOUBLE)
               AS demand_rate
    FROM st
    """,
)
def croston_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's intermittent-demand forecast (the sparse-series member
    of the smoothing family next to holt_linear_q): per sampled part,
    fold the nonzero-demand events in ship-date order, smoothing demand
    SIZE and inter-demand INTERVAL separately with dyadic a=1/4 —
    z' = a*q + (1-a)z, p' = a*(day - prev_day) + (1-a)p — then forecast
    rate z/p. Seeds: z_1 = q_1, p_1 = 1, prev = day_1; day arithmetic is
    exact (integer day numbers in doubles). State rides a 3-slot list on
    both engines so the schedules are bit-identical (DETERMINISM.md
    rules 7 + 15). The part sample (partkey % 97 = 0) keeps the output
    partition-count-independent and scale-proportional. Scale shape: the
    fact-scale work is ONE (part, day) aggregation behind a pushed-down
    modulo filter; each fold runs over that part's bounded event list."""
    li = Catalog(spark, sf_dir).lineitem
    daily = (
        li.filter(F.col("l_partkey") % 97 == 0)
        .groupBy(
            F.col("l_partkey").alias("pk"),
            F.to_date("l_shipdate").alias("day"),
        )
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("qty"))
    )
    ser = daily.groupBy("pk").agg(
        F.sort_array(F.collect_list(F.struct("day", "qty"))).alias("sd"),
        F.count(F.lit(1)).alias("n"),
    )
    # exact integer day number as double; Spark datediff from epoch day 0
    q = F.transform("sd", lambda e: e["qty"].cast("double"))
    d = F.transform(
        "sd",
        lambda e: F.datediff(e["day"], F.lit("1970-01-01").cast("date"))
        .cast("double"),
    )
    ser = ser.select("pk", "n", q.alias("q"), d.alias("d"))
    quart, three_q = F.lit(0.25), F.lit(0.75)
    state = F.aggregate(
        F.zip_with(
            F.slice("q", 2, F.greatest(F.size("q") - 1, F.lit(0))),
            F.slice("d", 2, F.greatest(F.size("d") - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("q"), b.alias("d")),
        ),
        F.struct(
            F.element_at("q", 1).alias("z"),
            F.lit(1.0).alias("p"),
            F.element_at("d", 1).alias("prev"),
        ),
        lambda acc, x: F.struct(
            (quart * x["q"] + three_q * acc["z"]).alias("z"),
            (quart * (x["d"] - acc["prev"]) + three_q * acc["p"]).alias("p"),
            x["d"].alias("prev"),
        ),
    )
    s = ser.select("pk", "n", state.alias("s"))

    def dround(c):
        return F.round(c.cast("decimal(28,12)"), 6).cast("double")

    return s.select(
        F.col("pk").alias("partkey"),
        F.col("n").cast("long").alias("n_demands"),
        dround(F.col("s.z")).alias("demand_size"),
        dround(F.col("s.p")).alias("demand_interval"),
        dround(F.col("s.z") / F.col("s.p")).alias("demand_rate"),
    )


from iniz_exporters_spark.queries.p01 import _SQL_POLY as _SQL_POLY_R11  # noqa: E402
from iniz_exporters_spark.functions.text import poly_hash as _poly_r11  # noqa: E402


@register(
    "winnowing_fingerprints_q",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS_R10} AS ts FROM documents),
    h AS (
        SELECT doc_id, len(ts) AS n_tokens,
               CASE WHEN len(ts) >= 5 THEN
                   list_transform(range(1, len(ts) - 3),
                       i -> {_SQL_POLY_R11.format(
                           s="list_aggregate(ts[i:i+4], 'string_agg', ' ')")})
               ELSE [] END AS hs
        FROM t
    ),
    fp AS (
        SELECT doc_id, n_tokens,
               len(hs) AS n_grams,
               CASE WHEN len(hs) >= 4 THEN
                   len(list_distinct(list_transform(range(1, len(hs) - 2),
                       j -> list_min(hs[j:j+3]))))
               ELSE 0 END AS n_fingerprints
        FROM h
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_grams AS BIGINT) AS n_grams,
           CAST(n_fingerprints AS BIGINT) AS n_fingerprints,
           ROUND(CAST(n_fingerprints AS DOUBLE) / NULLIF(n_grams, 0), 6)
               AS fingerprint_density
    FROM fp
    """,
)
def winnowing_fingerprints_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer et al. 2003, the MOSS
    scheme): hash every 5-token gram, slide a window of w=4 hashes, keep
    each window's MINIMUM, and count the distinct selected fingerprints —
    the guaranteed-coverage sparse sketch used for plagiarism/overlap
    detection at scale (every match of length >= w+k-1 shares a
    fingerprint). Emits every doc: docs under 5 tokens have 0 grams,
    docs with fewer than w grams select 0 fingerprints; density is
    fingerprints/grams (NULL when gramless). Distinct from
    doc_fingerprint (one rolling hash per doc) and minhash (random
    permutations): winnowing's selection is position-windowed minima.
    Scale shape: the whole selection is per-row Catalyst HOF work
    (no shuffle anywhere but the scan) — kernel-spread like the span
    family so a single-split scan cannot serialize it."""
    d = Catalog(spark, sf_dir).documents
    t = _spread_r11(d.select("doc_id", "text")).select(
        "doc_id", _tokens_r10("text").alias("ts")
    )
    n = F.size("ts")
    empty_l = F.array().cast("array<bigint>")
    hs = F.when(
        n >= 5,
        F.transform(
            F.sequence(F.lit(1), n - 4),
            lambda i: _poly_r11(F.array_join(F.slice("ts", i, 5), " ")),
        ),
    ).otherwise(empty_l)
    h = t.select("doc_id", n.alias("n_tokens"), hs.alias("hs"))
    m = F.size("hs")
    fps = F.when(
        m >= 4,
        F.size(
            F.array_distinct(
                F.transform(
                    # w = 4 hashes per window; DuckDB's hs[j:j+3] slice is
                    # INCLUSIVE (4 elements) — Spark's length arg must be 4
                    F.sequence(F.lit(1), m - 3),
                    lambda j: F.array_min(F.slice("hs", j, 4)),
                )
            )
        ),
    ).otherwise(F.lit(0))
    return h.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        m.cast("long").alias("n_grams"),
        fps.cast("long").alias("n_fingerprints"),
        F.round(
            fps.cast("double") / F.nullif(m, F.lit(0)), 6
        ).alias("fingerprint_density"),
    )


@register(
    "lateness_audit_q",
    """
    WITH ev AS (
        SELECT user_id, event_id,
               event_id + (event_id % 5) * 3 AS arr,
               epoch_us(ts) AS tus
        FROM events
    ),
    w AS (
        SELECT user_id, tus,
               MAX(tus) OVER (PARTITION BY user_id
                              ORDER BY arr ASC, event_id ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS mx
        FROM ev
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN mx > tus THEN 1 ELSE 0 END) AS BIGINT)
               AS n_late,
           CAST(MAX(CASE WHEN mx > tus THEN mx - tus ELSE 0 END) AS BIGINT)
               AS max_lateness_us,
           ROUND(CAST(SUM(CASE WHEN mx > tus THEN mx - tus ELSE 0 END)
                      AS DOUBLE)
                 / NULLIF(SUM(CASE WHEN mx > tus THEN 1 ELSE 0 END), 0), 6)
               AS avg_lateness_us
    FROM w GROUP BY user_id
    """,
)
def lateness_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time lateness audit — the measurement that SIZES a streaming
    watermark (`withWatermark` delay) before deploying it: per user
    stream, compare each event's event-time against the running max of
    events that ARRIVED earlier, and report how many events came in
    late, the worst lateness, and the mean lateness among late events.
    The synthetic events table is perfectly ts-ordered at every scale
    (verified: zero naturally-late rows), so arrival order is a
    DOCUMENTED deterministic jitter of the ingest sequence —
    arr = event_id + (event_id % 5) * 3, a local reshuffle simulating
    network reordering — spelled identically in both engines; the
    operator's math is what is under test. All lateness arithmetic is
    exact integer microseconds (epoch_us/unix_micros — the
    window_lag_gaps rule; no per-engine epoch truncation); the only
    division is the final mean, NULLIF-guarded for users with no late
    events (emit-every-user). Scale shape: one shuffle on user_id
    drives both the running-max window and the per-user aggregate
    (co-partitioned — the agg reuses the window's exchange); nothing is
    global, so key cardinality scales freely."""
    ev = Catalog(spark, sf_dir).events.select(
        "user_id",
        "event_id",
        (F.col("event_id") + (F.col("event_id") % 5) * 3).alias("arr"),
        F.unix_micros("ts").alias("tus"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("arr", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late = F.col("mx") > F.col("tus")
    lateness = F.when(late, F.col("mx") - F.col("tus")).otherwise(F.lit(0))
    return (
        ev.select("user_id", "tus", F.max("tus").over(w).alias("mx"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.when(late, 1).otherwise(0)).cast("long").alias("n_late"),
            F.max(lateness).cast("long").alias("max_lateness_us"),
            F.round(
                F.sum(lateness).cast("double")
                / F.nullif(
                    F.sum(F.when(late, 1).otherwise(0)), F.lit(0)
                ),
                6,
            ).alias("avg_lateness_us"),
        )
    )


@register(
    "gumbel_pwm_q",
    """
    WITH daily AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
               SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
        FROM orders GROUP BY day
    ),
    blocks AS (
        SELECT CAST(date_trunc('month', day) AS DATE) AS block,
               MAX(rev) AS mx
        FROM daily GROUP BY block
    ),
    r AS (
        SELECT mx,
               ROW_NUMBER() OVER (ORDER BY mx ASC, block ASC) AS rk,
               COUNT(*) OVER () AS n
        FROM blocks
    ),
    m AS (
        -- sums stay EXACT decimal (mx is DECIMAL(18,4), rk-1 integer);
        -- the only inexact ops are the final double divisions, identical
        -- on both engines — no double->decimal round-trip ties
        SELECT MAX(n) AS n,
               CAST(SUM(CAST(mx AS DECIMAL(28,6))) AS DOUBLE)
                   / MAX(n) AS b0,
               CAST(SUM(CAST(mx * (rk - 1) AS DECIMAL(28,6))) AS DOUBLE)
                   / (MAX(n) - 1) / MAX(n) AS b1
        FROM r
    )
    -- raw doubles, NO decimal-space re-round (the ewma_q convention):
    -- every op below is +,-,*,/ over bit-identical doubles, and the
    -- transcendental constants (1/ln 2, ln(-ln .99)) are INLINED double
    -- literals so no per-engine libm call ever runs; a decimal re-round
    -- here would reintroduce the .xxx5 repr-tie (Spark casts
    -- double->decimal via the shortest string repr, DuckDB via the
    -- binary value — they split exactly at half boundaries)
    SELECT CAST(n AS BIGINT) AS n_blocks,
           b0 AS pwm_b0,
           b1 AS pwm_b1,
           (2 * b1 - b0) * 1.4426950408889634 AS gumbel_scale,
           b0 - 0.5772156649015329 * ((2 * b1 - b0) * 1.4426950408889634)
               AS gumbel_loc,
           (b0 - 0.5772156649015329
                * ((2 * b1 - b0) * 1.4426950408889634))
           - ((2 * b1 - b0) * 1.4426950408889634) * -4.600149226776579
               AS return_level_p99
    FROM m
    """,
)
def gumbel_pwm_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel fit of MONTHLY block maxima of daily revenue via
    probability-weighted moments (Greenwood et al. 1979; Hosking's
    unbiased b1 with the (rank-1)/(n-1) plotting position): scale =
    (2*b1 - b0)/ln 2, location = b0 - gamma*scale, plus the 99%
    return level loc - scale*ln(-ln .99) — the block-maxima member of
    the EVT family next to pot_evt_q's peaks-over-threshold GPD.
    Determinism: both PWM sums stay EXACT decimal (mx is DECIMAL(18,4),
    rk-1 integer) and convert to double once; everything after is
    +,-,*,/ over bit-identical doubles with 1/ln2 and ln(-ln .99)
    INLINED as double literals (no per-engine libm call), and the
    outputs ship as raw doubles — a decimal-space re-round here would
    reintroduce the .xxx5 repr tie this query actually hit at sf0.01
    (Spark casts double->decimal via the shortest string repr, DuckDB
    via the binary value). Scale shape: fact-scale work is one
    (day) then one (month) aggregation; the rank window runs over
    calendar-bounded month blocks (~12/decade), metadata-sized at any
    corpus scale (pareto_frontier_q's rationale)."""
    o = Catalog(spark, sf_dir).orders
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev")
    )
    blocks = daily.groupBy(
        F.trunc("day", "month").alias("block")
    ).agg(F.max("rev").alias("mx"))
    wr = Window.orderBy(F.col("mx").asc(), F.col("block").asc())
    r = blocks.select(
        "mx",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(
            Window.partitionBy()
        ).alias("n"),
    )
    m = r.agg(
        F.max("n").alias("n"),
        (
            F.sum(F.col("mx").cast("decimal(28,6)")).cast("double")
            / F.max("n")
        ).alias("b0"),
        (
            F.sum(
                (F.col("mx") * (F.col("rk") - 1)).cast("decimal(28,6)")
            ).cast("double")
            / (F.max("n") - 1)
            / F.max("n")
        ).alias("b1"),
    )

    scale = (2 * F.col("b1") - F.col("b0")) * F.lit(1.4426950408889634)
    loc = F.col("b0") - 0.5772156649015329 * scale
    return m.select(
        F.col("n").cast("long").alias("n_blocks"),
        F.col("b0").alias("pwm_b0"),
        F.col("b1").alias("pwm_b1"),
        scale.alias("gumbel_scale"),
        loc.alias("gumbel_loc"),
        (loc - scale * F.lit(-4.600149226776579)).alias(
            "return_level_p99"
        ),
    )


_BLOOM_M = 65536  # bits; 2^16 keeps every fill-ratio division exact-dyadic


@register(
    "bloom_fpr_check_q",
    f"""
    WITH mem AS (
        SELECT DISTINCT l_orderkey AS k FROM lineitem
        WHERE l_orderkey % 2 = 0
    ),
    prb AS (
        SELECT DISTINCT l_orderkey AS k FROM lineitem
        WHERE l_orderkey % 2 = 1
    ),
    mb AS (
        SELECT DISTINCT b FROM (
            SELECT {_SQL_POLY_R11.format(s="k::VARCHAR")} % {_BLOOM_M} AS b
            FROM mem
            UNION ALL
            SELECT {_SQL_POLY_R11.format(s="k::VARCHAR || '#'")}
                   % {_BLOOM_M} AS b
            FROM mem)
    ),
    fp AS (
        SELECT COUNT(*) AS n_fp FROM prb
        WHERE {_SQL_POLY_R11.format(s="k::VARCHAR")} % {_BLOOM_M}
                  IN (SELECT b FROM mb)
          AND {_SQL_POLY_R11.format(s="k::VARCHAR || '#'")} % {_BLOOM_M}
                  IN (SELECT b FROM mb)
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM mem) AS n_members,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM prb) AS n_probes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM mb) AS n_bits_set,
           CAST(n_fp AS BIGINT) AS n_fp,
           CAST(n_fp AS DOUBLE)
               / (SELECT COUNT(*) FROM prb) AS measured_fpr,
           ((SELECT CAST(COUNT(*) AS DOUBLE) FROM mb) / {_BLOOM_M})
               * ((SELECT CAST(COUNT(*) AS DOUBLE) FROM mb) / {_BLOOM_M})
               AS expected_fpr
    FROM fp
    """,
)
def bloom_fpr_check_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter false-positive-rate audit — the set-membership member
    of the sketch-audit family (cms_error_check: counts; hll_error_check:
    cardinality; ann_recall_check: neighbors): build a deterministic
    Bloom (m = 2^16 bits, k = 2 poly_hash functions, second salted with
    '#') over the EVEN orderkeys, probe with the disjoint ODD orderkeys
    (every hit is a false positive by construction), and compare the
    measured FPR against the fill-ratio approximation (bits_set/m)^k —
    pure multiplication since k = 2, and /2^16 is an exact power-of-two
    scaling, so no libm and no rounding anywhere (raw doubles per
    DETERMINISM.md rule 16). Scale shape: member/probe key sets reduce
    map-side to DISTINCT keys; the bit set is capped at m = 65536 rows
    whatever the corpus size, so both membership probes are broadcast
    semi-joins against a fixed-size build — the fact table streams."""
    li = Catalog(spark, sf_dir).lineitem
    m = _BLOOM_M

    def h(col, salt=""):
        return (
            _poly_r11(F.concat(col.cast("string"), F.lit(salt))) % m
        )

    mem = (
        li.filter(F.col("l_orderkey") % 2 == 0)
        .select(F.col("l_orderkey").alias("k"))
        .distinct()
    )
    prb = (
        li.filter(F.col("l_orderkey") % 2 == 1)
        .select(F.col("l_orderkey").alias("k"))
        .distinct()
        .transform(pin)
    )
    bits = (
        mem.select(h(F.col("k")).alias("b"))
        .unionAll(mem.select(h(F.col("k"), "#").alias("b")))
        .distinct()
        .transform(pin)
    )
    probed = prb.select("k", h(F.col("k")).alias("h1"), h(F.col("k"), "#").alias("h2"))
    fp = (
        probed.join(
            F.broadcast(bits.select(F.col("b").alias("h1"))), "h1", "semi"
        )
        .join(
            F.broadcast(bits.select(F.col("b").alias("h2"))), "h2", "semi"
        )
        .agg(F.count(F.lit(1)).alias("n_fp"))
    )
    counts = (
        mem.agg(F.count(F.lit(1)).alias("n_members"))
        .crossJoin(prb.agg(F.count(F.lit(1)).alias("n_probes")))
        .crossJoin(bits.agg(F.count(F.lit(1)).alias("n_bits_set")))
    )
    fill = F.col("n_bits_set").cast("double") / m
    return fp.crossJoin(F.broadcast(counts)).select(
        F.col("n_members").cast("long").alias("n_members"),
        F.col("n_probes").cast("long").alias("n_probes"),
        F.col("n_bits_set").cast("long").alias("n_bits_set"),
        F.col("n_fp").cast("long").alias("n_fp"),
        (
            F.col("n_fp").cast("double")
            / F.col("n_probes").cast("double")
        ).alias("measured_fpr"),
        (fill * fill).alias("expected_fpr"),
    )


@register(
    "mattr_q",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS_R10} AS ts FROM documents),
    w AS (
        SELECT doc_id, len(ts) AS n_tokens,
               CASE WHEN len(ts) >= 25 THEN
                   list_transform(range(1, len(ts) - 23),
                       i -> len(list_distinct(ts[i:i+24])))
               ELSE [] END AS wd
        FROM t
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(len(wd) AS BIGINT) AS n_windows,
           CAST(list_reduce(list_prepend(0::BIGINT, wd),
                            (a, b) -> a + b) AS BIGINT) AS sum_types,
           ROUND(CAST(list_reduce(list_prepend(0::BIGINT, wd),
                                  (a, b) -> a + b) AS DOUBLE)
                 / NULLIF(len(wd) * 25, 0), 6) AS mattr
    FROM w
    """,
)
def mattr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-Average Type-Token Ratio (Covington & McFall 2010): mean
    TTR over every sliding 25-token window — the length-robust lexical
    diversity read (plain TTR falls with doc length; yule_k /
    distinct_ngram_diversity are corpus/global measures, this one is
    windowed per doc). Every window's distinct count is an INTEGER, so
    the statistic is a ratio of exact integers — one guarded division at
    the sink, no float accumulation anywhere (DETERMINISM.md rule 1 by
    construction). Docs under 25 tokens emit 0 windows / NULL mattr
    (emit-every-doc). Scale shape: all work is per-row Catalyst HOF
    (windows over the token array, no shuffle but the scan) behind the
    same kernel spread as the span family."""
    d = Catalog(spark, sf_dir).documents
    t = _spread_r11(d.select("doc_id", "text")).select(
        "doc_id", _tokens_r10("text").alias("ts")
    )
    n = F.size("ts")
    wd = F.when(
        n >= 25,
        F.transform(
            F.sequence(F.lit(1), n - 24),
            lambda i: F.size(F.array_distinct(F.slice("ts", i, 25))),
        ),
    ).otherwise(F.array().cast("array<int>"))
    w = t.select("doc_id", n.alias("n_tokens"), wd.alias("wd"))
    sum_types = F.aggregate(
        "wd", F.lit(0).cast("long"), lambda a, b: a + b
    )
    nw = F.size("wd")
    return w.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        nw.cast("long").alias("n_windows"),
        sum_types.alias("sum_types"),
        F.round(
            sum_types.cast("double")
            / F.nullif((nw * 25).cast("long"), F.lit(0)),
            6,
        ).alias("mattr"),
    )


@register(
    "asof_nearest_q",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click'),
    ranked AS (
        SELECT p.event_id AS purchase_id, p.user_id,
               c.event_id AS click_id,
               epoch_us(c.ts) - epoch_us(p.ts) AS delta_us,
               ROW_NUMBER() OVER (
                   PARTITION BY p.event_id
                   ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)) ASC,
                            (epoch_us(c.ts) > epoch_us(p.ts)) ASC,
                            c.event_id ASC) AS rn
        FROM p JOIN c ON p.user_id = c.user_id
    )
    SELECT p.event_id AS purchase_id, p.user_id,
           ranked.click_id,
           CAST(ranked.delta_us AS BIGINT) AS delta_us
    FROM p LEFT JOIN ranked
      ON p.event_id = ranked.purchase_id AND ranked.rn = 1
    """,
)
def asof_nearest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join (the third member after the
    operator's backward/forward modes, and the first registry user of
    ``direction='forward'``): each purchase gets the click closest in
    event time on EITHER side, ties to the earlier click (backward),
    emit-every-purchase. The oracle is the quadratic formulation (per-key
    join + rank) — fine for a checker; the Spark plan is the SCALE shape:
    one backward and one forward pass of operators/asof.asof_join (each
    a single key shuffle + ordered window, no range explosion), then a
    per-row pick of the smaller |delta|. Delta arithmetic is exact
    integer microseconds (the window_lag_gaps rule)."""
    from iniz_exporters_spark.operators.asof import asof_join as _asof

    e = Catalog(spark, sf_dir).events
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    back = _asof(
        p, c, on="user_id", left_time="ts", right_time="ts",
        right_cols={"event_id": "b_id", "ts": "b_ts"},
        direction="backward",
    )
    both = _asof(
        back, c, on="user_id", left_time="ts", right_time="ts",
        right_cols={"event_id": "f_id", "ts": "f_ts"},
        direction="forward",
    )
    db = F.unix_micros("ts") - F.unix_micros("b_ts")   # >= 0
    df_ = F.unix_micros("f_ts") - F.unix_micros("ts")  # >= 0
    use_b = F.col("b_id").isNotNull() & (
        F.col("f_id").isNull() | (db <= df_)
    )
    return both.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(use_b, F.col("b_id")).otherwise(F.col("f_id")).alias(
            "click_id"
        ),
        F.when(use_b, -db)
        .otherwise(df_)
        .cast("long")
        .alias("delta_us"),
    )
