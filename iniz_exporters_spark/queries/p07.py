"""Registry chunk 7/9: 32 @register entries (multi_touch_attribution_q .. mutual_knn_q).

Mechanical split of the original queries.py (lines 21869-25493); statement order
and registration order are unchanged. See queries/__init__.py."""
from iniz_exporters_spark.catalog import Catalog
from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F
from iniz_exporters_spark.queries._base import _dec, register
from iniz_exporters_spark.functions.text import tokens as _tokens
from iniz_exporters_spark.functions.text import poly_hash
from iniz_exporters_spark.queries.p01 import _SQL_POLY, _SQL_TOKENS
from iniz_exporters_spark.queries.p03 import _dsum
from iniz_exporters_spark.session import metadata_df



# U-shaped (position-based) multi-touch attribution: each purchase
# splits 1.0 of credit over the user's non-purchase touches in the 3
# days before it — 40% first touch, 40% last touch, 20% spread over
# the middle (k=1 -> 100%, k=2 -> 50/50). The purchase-touch pair
# table is bounded by the 3-day window predicate (pushed into the
# join); ranks partition by (user, purchase). Credits are exact
# decimals built from integer rank arithmetic; one final group by
# channel.
@register(
    "multi_touch_attribution_q",
    """
    WITH p AS (
        SELECT user_id, event_id AS pid, ts AS pts FROM events
        WHERE event_type = 'purchase'
    ),
    touch AS (
        SELECT p.pid, e.event_type AS channel, e.ts, e.event_id
        FROM events e JOIN p ON p.user_id = e.user_id
        WHERE e.event_type <> 'purchase'
          AND e.ts < p.pts
          AND e.ts >= p.pts - INTERVAL 3 DAY
    ),
    ranked AS (
        SELECT pid, channel,
               ROW_NUMBER() OVER (PARTITION BY pid
                   ORDER BY ts, event_id) AS k,
               COUNT(*) OVER (PARTITION BY pid) AS m
        FROM touch
    ),
    credit AS (
        SELECT channel,
               CASE WHEN m = 1 THEN CAST(1.0 AS DECIMAL(18,12))
                    WHEN m = 2 THEN CAST(0.5 AS DECIMAL(18,12))
                    WHEN k = 1 OR k = m THEN CAST(0.4 AS DECIMAL(18,12))
                    ELSE CAST(CAST(0.2 AS DECIMAL(18,12)) / (m - 2)
                         AS DECIMAL(18,12))
               END AS c
        FROM ranked
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(ROUND(CAST(SUM(c) AS DOUBLE), 4) AS DOUBLE)
               AS total_credit
    FROM credit GROUP BY channel
    """,
)
def multi_touch_attribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which channels EARN conversions once credit is split across the
    journey (vs attribution_q's winner-takes-all last touch)? Credits
    are decimal so channel totals are order-independent; the 3-day
    lookback bounds the pair fan-out at any corpus size."""
    e = Catalog(spark, sf_dir).events
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("pid"),
        F.col("ts").alias("pts"),
    )
    t = e.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_type").alias("channel"),
        "ts",
        "event_id",
    )
    touch = t.join(p, "user_id").filter(
        (F.col("ts") < F.col("pts"))
        & (F.col("ts") >= F.col("pts") - F.expr("INTERVAL 3 DAY"))
    )
    wk = Window.partitionBy("pid").orderBy("ts", "event_id")
    wm = Window.partitionBy("pid")
    ranked = touch.select(
        "pid",
        "channel",
        F.row_number().over(wk).alias("k"),
        F.count(F.lit(1)).over(wm).alias("m"),
    )
    c = (
        F.when(F.col("m") == 1, F.lit(1.0).cast("decimal(18,12)"))
        .when(F.col("m") == 2, F.lit(0.5).cast("decimal(18,12)"))
        .when(
            (F.col("k") == 1) | (F.col("k") == F.col("m")),
            F.lit(0.4).cast("decimal(18,12)"),
        )
        .otherwise(
            (F.lit(0.2).cast("decimal(18,12)") / (F.col("m") - 2)).cast(
                "decimal(18,12)"
            )
        )
    )
    return (
        ranked.select("channel", c.alias("c"))
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.round(F.sum("c").cast("double"), 4).alias("total_credit"),
        )
    )


# Hodges-Lehmann location estimate of the demeaned daily P&L: the
# median of all Walsh averages (x_i + x_j)/2, i <= j — the robust,
# rank-based "typical level" with 29% breakdown. The pair table is
# n(n+1)/2 rows of the CALENDAR-bounded daily frame; averages are
# exact DECIMAL(19,7)s so the median element is deterministic.
@register(
    "hodges_lehmann_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               SUM(CAST(value AS DECIMAL(18,6))) AS rev
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    pnl AS (
        SELECT day,
               rev - (SELECT CAST(CAST(SUM(rev) AS DOUBLE) / COUNT(*)
                          AS DECIMAL(18,6)) FROM daily) AS v
        FROM daily
    ),
    walsh AS (
        SELECT CAST((a.v + b.v) AS DECIMAL(19,7)) / 2 AS w
        FROM pnl a JOIN pnl b ON a.day <= b.day
    ),
    r AS (
        SELECT w, ROW_NUMBER() OVER (ORDER BY w) AS k,
               COUNT(*) OVER () AS n
        FROM walsh
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_walsh,
           CAST(ROUND(CAST(AVG(CASE WHEN k = (n + 1) // 2
                    OR k = n // 2 + 1 THEN w END) AS DOUBLE), 4)
               AS DOUBLE) + 0.0 AS hodges_lehmann
    FROM r
    """,
)
def hodges_lehmann_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pseudo-median of daily P&L — robust companion to cvar_q's
    tail view. Walsh-average ties resolve identically in both engines
    because the averages are exact decimals."""
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
        "day", (F.col("rev") - F.col("mu")).alias("v")
    )
    a = pnl.select(F.col("day").alias("da"), F.col("v").alias("va"))
    b = pnl.select(F.col("day").alias("db"), F.col("v").alias("vb"))
    walsh = a.join(b, F.col("da") <= F.col("db")).select(
        (
            (F.col("va") + F.col("vb")).cast("decimal(19,7)") / 2
        ).alias("w")
    )
    wk = Window.orderBy("w")
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = walsh.select(
        "w",
        F.row_number().over(wk).alias("k"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    mid = F.when(
        (F.col("k") == F.expr("(n + 1) div 2"))
        | (F.col("k") == F.expr("n div 2 + 1")),
        F.col("w"),
    )
    return r.agg(
        F.max("n").cast("long").alias("n_walsh"),
        (F.round(F.avg(mid).cast("double"), 4) + F.lit(0.0)).alias(
            "hodges_lehmann"
        ),
    )


# Log-rank test comparing signup->purchase conversion survival between
# the two user cohorts (user_id parity): at each distinct event time,
# observed cohort-0 events vs the hypergeometric expectation
# d * n0/n, variance d (n0/n)(1-n0/n)(n-d)/(n-1); z = (O-E)/sqrt(V).
# Builds on km_survival_q's duration frame; the per-time table is
# calendar-bounded, at-risk counts are running-sum integers, and the
# only float stage is the final z.
@register(
    "log_rank_test_q",
    """
    WITH su AS (
        SELECT user_id, MIN(ts) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    la AS (SELECT user_id, MAX(ts) AS tl FROM events GROUP BY user_id),
    pu AS (
        SELECT e.user_id, MIN(e.ts) AS tp
        FROM events e JOIN su USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= su.t0
        GROUP BY e.user_id
    ),
    b AS (
        SELECT su.user_id, su.user_id % 2 AS grp,
               CASE WHEN tp IS NOT NULL
                    THEN date_diff('day', CAST(t0 AS DATE), CAST(tp AS DATE))
                    ELSE date_diff('day', CAST(t0 AS DATE), CAST(tl AS DATE))
               END AS t,
               CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS obs
        FROM su JOIN la USING (user_id)
        LEFT JOIN pu ON pu.user_id = su.user_id
    ),
    g AS (
        SELECT t,
               SUM(obs) AS d,
               SUM(CASE WHEN grp = 0 THEN obs ELSE 0 END) AS d0,
               COUNT(*) AS m,
               SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS m0
        FROM b GROUP BY t
    ),
    tot AS (
        SELECT COUNT(*) AS nn,
               SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS nn0
        FROM b
    ),
    k AS (
        SELECT t, d, d0,
               nn - (SUM(m) OVER (ORDER BY t) - m) AS n_risk,
               nn0 - (SUM(m0) OVER (ORDER BY t) - m0) AS n0_risk
        FROM g CROSS JOIN tot
    ),
    terms AS (
        SELECT CAST(SUM(d0) AS BIGINT) AS o0,
               CAST(SUM(CAST(d * (CAST(n0_risk AS DOUBLE) / n_risk)
                    AS DECIMAL(28,12))) AS DOUBLE) AS e0,
               CAST(SUM(CASE WHEN n_risk > 1 THEN CAST(
                    d * (CAST(n0_risk AS DOUBLE) / n_risk)
                      * (1 - CAST(n0_risk AS DOUBLE) / n_risk)
                      * (n_risk - d) / (n_risk - 1)
                    AS DECIMAL(28,12)) ELSE CAST(0 AS DECIMAL(28,12))
                    END) AS DOUBLE) AS v
        FROM k WHERE d > 0
    )
    SELECT o0 AS observed_g0,
           CAST(ROUND(e0, 4) AS DOUBLE) + 0.0 AS expected_g0,
           CAST(ROUND((o0 - e0) / sqrt(v), 6) AS DOUBLE) + 0.0
               AS logrank_z,
           CAST(ROUND((o0 - e0) * (o0 - e0) / v, 6) AS DOUBLE) + 0.0
               AS logrank_chi2
    FROM terms
    """,
)
def log_rank_test_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do the two cohorts convert at different speeds, accounting for
    censoring? The hypothesis test behind km_survival_q's curves."""
    ev = Catalog(spark, sf_dir).events
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    la = ev.groupBy("user_id").agg(F.max("ts").alias("tl"))
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    b = (
        su.join(la, "user_id")
        .join(pu, "user_id", "left")
        .select(
            (F.col("user_id") % 2).alias("grp"),
            F.when(
                F.col("tp").isNotNull(),
                F.datediff(F.to_date("tp"), F.to_date("t0")),
            )
            .otherwise(F.datediff(F.to_date("tl"), F.to_date("t0")))
            .alias("t"),
            F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("obs"),
        )
    )
    g = b.groupBy("t").agg(
        F.sum("obs").alias("d"),
        F.sum(F.when(F.col("grp") == 0, F.col("obs")).otherwise(0)).alias(
            "d0"
        ),
        F.count(F.lit(1)).alias("m"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("m0"),
    )
    tot = b.agg(
        F.count(F.lit(1)).alias("nn"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("nn0"),
    )
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    k = g.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        "d0",
        (
            F.col("nn") - (F.sum("m").over(wcum) - F.col("m"))
        ).alias("n_risk"),
        (
            F.col("nn0") - (F.sum("m0").over(wcum) - F.col("m0"))
        ).alias("n0_risk"),
    )
    frac = F.col("n0_risk").cast("double") / F.col("n_risk")
    terms = k.filter(F.col("d") > 0).agg(
        F.sum("d0").cast("long").alias("o0"),
        _dsum(F.col("d") * frac).cast("double").alias("e0"),
        F.sum(
            F.when(
                F.col("n_risk") > 1,
                (
                    F.col("d")
                    * frac
                    * (1 - frac)
                    * (F.col("n_risk") - F.col("d"))
                    / (F.col("n_risk") - 1)
                ).cast("decimal(28,12)"),
            ).otherwise(F.lit(0).cast("decimal(28,12)"))
        )
        .cast("double")
        .alias("v"),
    )
    return terms.select(
        F.col("o0").alias("observed_g0"),
        (F.round(F.col("e0"), 4) + F.lit(0.0)).alias("expected_g0"),
        (
            F.round(
                (F.col("o0") - F.col("e0")) / F.sqrt(F.col("v")), 6
            )
            + F.lit(0.0)
        ).alias("logrank_z"),
        (
            F.round(
                (F.col("o0") - F.col("e0"))
                * (F.col("o0") - F.col("e0"))
                / F.col("v"),
                6,
            )
            + F.lit(0.0)
        ).alias("logrank_chi2"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 5 (continued): Greenwood confidence bands for
# the KM curve, seasonal-ESD anomaly days, leave-one-out kNN label
# accuracy, split-conformal prediction intervals, and a breadth query
# exercising Spark's higher-order array functions against DuckDB's
# list_* twins.
# ---------------------------------------------------------------------------


# Kaplan-Meier curve with Greenwood 95% confidence band:
# Var[ln S(t)] ~= sum_{s<=t} d/(n(n-d)), CI = S(t)^exp(+-1.96 se /
# ln S(t))... the simpler plain Greenwood band S +- 1.96 S sqrt(V) is
# used here (clamped to [0,1]) — the textbook form. Greenwood terms
# are DECIMAL-quantized before their running sum; the frame is the
# same duration-distinct table as km_survival_q.
@register(
    "km_greenwood_q",
    """
    WITH su AS (
        SELECT user_id, MIN(ts) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    la AS (SELECT user_id, MAX(ts) AS tl FROM events GROUP BY user_id),
    pu AS (
        SELECT e.user_id, MIN(e.ts) AS tp
        FROM events e JOIN su USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= su.t0
        GROUP BY e.user_id
    ),
    b AS (
        SELECT su.user_id,
               CASE WHEN tp IS NOT NULL
                    THEN date_diff('day', CAST(t0 AS DATE), CAST(tp AS DATE))
                    ELSE date_diff('day', CAST(t0 AS DATE), CAST(tl AS DATE))
               END AS t,
               CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS obs
        FROM su JOIN la USING (user_id)
        LEFT JOIN pu ON pu.user_id = su.user_id
    ),
    g AS (SELECT t, SUM(obs) AS d, COUNT(*) AS m FROM b GROUP BY t),
    tot AS (SELECT COUNT(*) AS nn FROM b),
    k AS (
        SELECT t, d, nn - (SUM(m) OVER (ORDER BY t) - m) AS n_risk
        FROM g CROSS JOIN tot
    ),
    c AS (
        SELECT t, d, n_risk,
               SUM(CASE WHEN n_risk > d
                        THEN LN(CAST(n_risk - d AS DOUBLE)
                                / CAST(n_risk AS DOUBLE))
                   END) OVER (ORDER BY t) AS sl,
               SUM(CASE WHEN n_risk > d THEN CAST(
                        CAST(d AS DOUBLE) / (n_risk
                            * CAST(n_risk - d AS BIGINT))
                        AS DECIMAL(28,12)) END)
                   OVER (ORDER BY t) AS gv
        FROM k
    )
    SELECT CAST(t AS BIGINT) AS duration_days,
           CAST(ROUND(EXP(sl), 6) AS DOUBLE) AS survival,
           greatest(0.0, CAST(ROUND(EXP(sl) - 1.96 * EXP(sl)
               * sqrt(CAST(gv AS DOUBLE)), 6) AS DOUBLE)) AS ci_lo,
           least(1.0, CAST(ROUND(EXP(sl) + 1.96 * EXP(sl)
               * sqrt(CAST(gv AS DOUBLE)), 6) AS DOUBLE)) AS ci_hi
    FROM c WHERE d > 0 AND n_risk > d
    """,
)
def km_greenwood_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """km_survival_q's curve with its sampling uncertainty — the band
    a dashboard needs before calling two cohort curves 'different'
    (log_rank_test_q answers that formally)."""
    ev = Catalog(spark, sf_dir).events
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    la = ev.groupBy("user_id").agg(F.max("ts").alias("tl"))
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    b = (
        su.join(la, "user_id")
        .join(pu, "user_id", "left")
        .select(
            F.when(
                F.col("tp").isNotNull(),
                F.datediff(F.to_date("tp"), F.to_date("t0")),
            )
            .otherwise(F.datediff(F.to_date("tl"), F.to_date("t0")))
            .alias("t"),
            F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("obs"),
        )
    )
    g = b.groupBy("t").agg(
        F.sum("obs").alias("d"), F.count(F.lit(1)).alias("m")
    )
    tot = b.agg(F.count(F.lit(1)).alias("nn"))
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    k = g.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        (F.col("nn") - (F.sum("m").over(wcum) - F.col("m"))).alias(
            "n_risk"
        ),
    )
    surv_term = F.when(
        F.col("n_risk") > F.col("d"),
        F.log(
            (F.col("n_risk") - F.col("d")).cast("double")
            / F.col("n_risk").cast("double")
        ),
    )
    green_term = F.when(
        F.col("n_risk") > F.col("d"),
        (
            F.col("d").cast("double")
            / (
                F.col("n_risk")
                * (F.col("n_risk") - F.col("d")).cast("long")
            )
        ).cast("decimal(28,12)"),
    )
    c = k.select(
        "t",
        "d",
        "n_risk",
        F.sum(surv_term).over(wcum).alias("sl"),
        F.sum(green_term).over(wcum).alias("gv"),
    )
    s = F.exp(F.col("sl"))
    half = 1.96 * s * F.sqrt(F.col("gv").cast("double"))
    return c.filter(
        (F.col("d") > 0) & (F.col("n_risk") > F.col("d"))
    ).select(
        F.col("t").cast("long").alias("duration_days"),
        F.round(s, 6).alias("survival"),
        F.greatest(F.lit(0.0), F.round(s - half, 6)).alias("ci_lo"),
        F.least(F.lit(1.0), F.round(s + half, 6)).alias("ci_hi"),
    )


# Seasonal-ESD-lite anomaly days: remove the stl_decompose_q trend and
# weekly seasonal from the daily view-value series, then flag days
# whose |residual| exceeds 3 x MAD (scaled by 1.4826). The residual
# frame is calendar-bounded; MAD uses an exact rank over it. Reports
# only flagged days (metadata-scale output).
@register(
    "seasonal_esd_q",
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
    resid AS (
        SELECT day, CAST(m - trend - seasonal AS DECIMAL(18,6)) AS r
        FROM seasoned
    ),
    med AS (
        SELECT r AS med_r FROM (
            SELECT r, ROW_NUMBER() OVER (ORDER BY r, day) AS k,
                   COUNT(*) OVER () AS n
            FROM resid
        ) WHERE k = (n + 1) // 2
    ),
    adev AS (
        SELECT day, r,
               abs(r - (SELECT med_r FROM med)) AS ad
        FROM resid
    ),
    mad AS (
        SELECT ad AS mad_r FROM (
            SELECT ad, ROW_NUMBER() OVER (ORDER BY ad, day) AS k,
                   COUNT(*) OVER () AS n
            FROM adev
        ) WHERE k = (n + 1) // 2
    )
    SELECT day,
           CAST(ROUND(CAST(r AS DOUBLE), 4) AS DOUBLE) + 0.0
               AS residual,
           CAST(ROUND(1.4826 * CAST((SELECT mad_r FROM mad) AS DOUBLE),
               4) AS DOUBLE) + 0.0 AS sigma_robust,
           CAST(ROUND(CAST(r AS DOUBLE)
               / (1.4826 * CAST((SELECT mad_r FROM mad) AS DOUBLE)), 4)
               AS DOUBLE) + 0.0 AS esd_score
    FROM adev
    WHERE abs(CAST(r AS DOUBLE))
        > 3 * 1.4826 * CAST((SELECT mad_r FROM mad) AS DOUBLE)
    """,
)
def seasonal_esd_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which days are anomalous AFTER the weekly rhythm is removed?
    Twitter-style seasonal-ESD with a single robust-sigma pass; raw
    z-scores would flag every weekend (mad_outliers_q's failure mode
    on seasonal series)."""
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
    resid = trended.withColumn(
        "seasonal",
        (
            F.sum(F.col("m") - F.col("trend")).over(wdow).cast("double")
            / F.count(F.lit(1)).over(wdow)
        ).cast("decimal(18,6)"),
    ).select(
        "day",
        (F.col("m") - F.col("trend") - F.col("seasonal"))
        .cast("decimal(18,6)")
        .alias("r"),
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )

    def lower_median(df, col, out):
        wk = Window.orderBy(col, "day")
        return (
            df.select(
                F.col(col),
                F.row_number().over(wk).alias("k"),
                F.count(F.lit(1)).over(wt).alias("n"),
            )
            .filter(F.col("k") == F.expr("(n + 1) div 2"))
            .select(F.col(col).alias(out))
        )

    med = lower_median(resid, "r", "med_r")
    adev = resid.crossJoin(F.broadcast(med)).select(
        "day", "r", F.abs(F.col("r") - F.col("med_r")).alias("ad")
    )
    mad = lower_median(adev, "ad", "mad_r")
    sig = 1.4826 * F.col("mad_r").cast("double")
    return (
        adev.crossJoin(F.broadcast(mad))
        .filter(F.abs(F.col("r").cast("double")) > 3 * sig)
        .select(
            "day",
            (F.round(F.col("r").cast("double"), 4) + F.lit(0.0)).alias(
                "residual"
            ),
            (F.round(sig, 4) + F.lit(0.0)).alias("sigma_robust"),
            (
                F.round(F.col("r").cast("double") / sig, 4) + F.lit(0.0)
            ).alias("esd_score"),
        )
    )


# Leave-one-out 5-NN label accuracy over the embedding corpus: predict
# each vector's label by majority vote of its five nearest neighbors
# (ties broken toward the SMALLEST label id — spelled identically in
# both engines), report per-label and overall accuracy. Same bounded
# pair stage as hubness_q (explicit pre-explosion repartition).
#
# SCALE GUARD (VERDICT r11 #2): LOO is quadratic BY SPEC — every vector
# is a query — so the broadcast side here is the WHOLE corpus. The query
# now routes through the operator library's `_broadcast_guard` (the same
# mechanism `knn_bruteforce` enforces, operators/similarity.py; cap
# lowered 100k → 20k at r13 after the isolated slope re-measure): past
# the cap it fails loudly BEFORE the job with the actionable fix, instead of
# silently OOMing executors with an n×n plan. At corpus scale the
# identical vote plan runs over the bucketed ANN's candidate pairs
# (sign-bucket / ivf_topk in operators/similarity.py) instead of the
# full cross join — the exact-oracle contract stays pinned to the gated
# scales (500–2000 vectors), where the guard admits the exact plan.
@register(
    "knn_loo_accuracy_q",
    """
    WITH e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS qid, q.label AS true_label,
               c.label AS cand_label,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ROUND(list_reduce(
                       list_transform(range(1, len(c.v)+1),
                           i -> (c.v[i] - q.v[i]) * (c.v[i] - q.v[i])),
                       (x, y) -> x + y), 6), c.vec_id) AS rn
        FROM e q JOIN e c ON c.vec_id <> q.vec_id
    ),
    votes AS (
        SELECT qid, true_label, cand_label, COUNT(*) AS nv
        FROM scored WHERE rn <= 5
        GROUP BY qid, true_label, cand_label
    ),
    pred AS (
        SELECT qid, true_label, cand_label AS pred_label,
               ROW_NUMBER() OVER (PARTITION BY qid
                   ORDER BY nv DESC, cand_label) AS pr
        FROM votes
    )
    SELECT true_label AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN pred_label = true_label
                THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           CAST(ROUND(CAST(SUM(CASE WHEN pred_label = true_label
                THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
               AS DOUBLE) AS accuracy
    FROM pred WHERE pr = 1
    GROUP BY true_label
    """,
)
def knn_loo_accuracy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the embedding space label-coherent? LOO 5-NN accuracy per
    class — the intrinsic-quality read that pairs with hubness_q
    (hubs are exactly the points that poison these votes)."""
    e = Catalog(spark, sf_dir).embeddings.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    from iniz_exporters_spark.operators.similarity import _broadcast_guard

    q = e.select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("true_label"),
        F.col("v").alias("qv"),
    )
    # Loud cap on the broadcast side (the whole corpus under LOO) — same
    # guard, same remedy message as knn_bruteforce. 20k, not the generic
    # 100k (VERDICT r12 #5): the r13 isolated re-measure read the
    # cross-scale slope at 2.45–2.80 (500→2000 vectors = 16× pair work),
    # i.e. the quadratic term is already visible through fixed overhead
    # at gate scales, so the exact-plan ceiling is set where n² stays
    # bounded work (20k² = 4e8 pair evals ≈ minutes, ~10 MB broadcast);
    # past it the loud message routes to the bucketed ANN machinery.
    q = _broadcast_guard(q, 20_000, "knn_loo_accuracy_q")
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
    e = e.repartition(
        spark.sparkContext.defaultParallelism, F.col("vec_id")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "true_label",
            F.col("label").alias("cand_label"),
            F.col("vec_id").alias("cid"),
            d2.alias("d2"),
        )
    )
    wnn = Window.partitionBy("qid").orderBy("d2", "cid")
    votes = (
        scored.withColumn("rn", F.row_number().over(wnn))
        .filter(F.col("rn") <= 5)
        .groupBy("qid", "true_label", "cand_label")
        .agg(F.count(F.lit(1)).alias("nv"))
    )
    wv = Window.partitionBy("qid").orderBy(
        F.col("nv").desc(), F.col("cand_label")
    )
    pred = votes.withColumn("pr", F.row_number().over(wv)).filter(
        F.col("pr") == 1
    )
    hit = F.when(F.col("cand_label") == F.col("true_label"), 1).otherwise(
        0
    )
    return pred.groupBy(F.col("true_label").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum(hit).cast("long").alias("n_correct"),
        F.round(
            F.sum(hit).cast("double") / F.count(F.lit(1)), 6
        ).alias("accuracy"),
    )


# Split-conformal prediction interval for per-user purchase totals:
# proper training/calibration/test split by content-keyed hash of
# user_id (40/30/30); the point model is the TRAIN mean, the
# nonconformity score is |y - mean|, q_hat is the ceil((n_cal+1)
# (1-alpha))-th smallest calibration score (alpha = 0.1), and the
# guarantee is checked as empirical coverage on TEST. Distribution-
# free — the marginal coverage bound holds whatever the spend
# distribution is. All ranks run on the CALIBRATION subset.
@register(
    "conformal_interval_q",
    f"""
    WITH u AS (
        SELECT user_id,
               {_SQL_POLY.format(s="'conf:' || user_id::VARCHAR")} % 10
                   AS fold,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS y
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    train AS (
        SELECT CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE)
               / COUNT(*) AS mu
        FROM u WHERE fold < 4
    ),
    cal AS (
        SELECT abs(y - (SELECT mu FROM train)) AS score,
               ROW_NUMBER() OVER (ORDER BY
                   abs(y - (SELECT mu FROM train)), user_id) AS k,
               COUNT(*) OVER () AS n
        FROM u WHERE fold >= 4 AND fold < 7
    ),
    qhat AS (
        -- finite-sample clamp: when ceil((n+1)(1-alpha)) > n the exact
        -- conformal interval is infinite; use the max score instead so
        -- tiny calibration sets stay well-defined (and deterministic)
        SELECT score AS q FROM cal
        WHERE k = CAST(least(n, ceil(0.9 * (n + 1))) AS BIGINT)
    )
    SELECT CAST((SELECT COUNT(*) FROM u WHERE fold < 4) AS BIGINT)
               AS n_train,
           CAST(MAX(CASE WHEN TRUE THEN (SELECT MAX(n) FROM cal) END)
               AS BIGINT) AS n_cal,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(ROUND((SELECT mu FROM train), 4) AS DOUBLE) + 0.0
               AS point_pred,
           CAST(ROUND((SELECT q FROM qhat), 4) AS DOUBLE) + 0.0
               AS q_hat,
           CAST(ROUND(CAST(SUM(CASE WHEN
                abs(y - (SELECT mu FROM train)) <= (SELECT q FROM qhat)
                THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
               AS DOUBLE) AS test_coverage
    FROM u WHERE fold >= 7
    """,
)
def conformal_interval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free +-q_hat interval around the train-mean
    predictor, with its promised >= 90% coverage verified on held-out
    users. The hash-fold split replays exactly on any engine."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    u = e.groupBy("user_id").agg(
        F.sum(_dec(F.col("value"), 18, 6)).cast("double").alias("y")
    ).withColumn(
        "fold",
        poly_hash(
            F.concat(F.lit("conf:"), F.col("user_id").cast("string"))
        )
        % 10,
    )
    train = u.filter(F.col("fold") < 4).agg(
        (
            _dsum(F.col("y")).cast("double") / F.count(F.lit(1))
        ).alias("mu"),
        F.count(F.lit(1)).alias("n_train"),
    )
    cal = u.filter((F.col("fold") >= 4) & (F.col("fold") < 7)).crossJoin(
        F.broadcast(train)
    )
    score = F.abs(F.col("y") - F.col("mu"))
    wk = Window.orderBy(score.asc(), F.col("user_id"))
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = cal.select(
        score.alias("score"),
        F.row_number().over(wk).alias("k"),
        F.count(F.lit(1)).over(wt).alias("n"),
        "mu",
        "n_train",
    )
    qhat = ranked.filter(
        F.col("k")
        == F.least(
            F.col("n"), F.ceil(0.9 * (F.col("n") + 1))
        ).cast("long")
    ).select(
        F.col("score").alias("q"),
        F.col("n").alias("n_cal"),
        "mu",
        "n_train",
    )
    test = u.filter(F.col("fold") >= 7).crossJoin(F.broadcast(qhat))
    covered = F.when(
        F.abs(F.col("y") - F.col("mu")) <= F.col("q"), 1
    ).otherwise(0)
    return test.agg(
        F.max("n_train").cast("long").alias("n_train"),
        F.max("n_cal").cast("long").alias("n_cal"),
        F.count(F.lit(1)).cast("long").alias("n_test"),
        (F.round(F.max("mu"), 4) + F.lit(0.0)).alias("point_pred"),
        (F.round(F.max("q"), 4) + F.lit(0.0)).alias("q_hat"),
        F.round(
            F.sum(covered).cast("double") / F.count(F.lit(1)), 6
        ).alias("test_coverage"),
    )


# Higher-order array-function breadth: per order, build the sorted
# array of its line-item quantities, then exercise transform / filter
# / exists / forall / reduce (aggregate) / slice / array_distinct /
# zip_with against DuckDB's list_* twins. Output one row per order
# bucket with every derived scalar, so a wrong corner in ANY of the
# eight functions diverges the hash. Array construction is one
# grouped collect_list (bounded by the 7-line order cap); everything
# after is per-row expression work.
@register(
    "array_hof_breadth",
    """
    WITH arr AS (
        SELECT l_orderkey,
               list_sort(list(CAST(l_quantity AS BIGINT))) AS qs
        FROM lineitem GROUP BY l_orderkey
    ),
    hof AS (
        SELECT l_orderkey % 97 AS bucket,
               len(qs) AS n_items,
               list_sum(list_transform(qs, x -> x * x)) AS sum_sq,
               len(list_filter(qs, x -> x > 25)) AS n_large,
               CASE WHEN len(list_filter(qs, x -> x % 2 = 0)) > 0
                    THEN 1 ELSE 0 END AS has_even,
               CASE WHEN len(list_filter(qs, x -> x > 0)) = len(qs)
                    THEN 1 ELSE 0 END AS all_positive,
               list_reduce(qs, (a, b) -> (a * 31 + b) % 1000003)
                   AS fold_hash,
               list_sum(qs[1:2]) AS head2_sum,
               len(list_distinct(qs)) AS n_distinct,
               list_sum(list_transform(range(1, len(qs) + 1),
                   i -> qs[i] * i)) AS weighted_sum
        FROM arr
    )
    SELECT bucket,
           CAST(SUM(n_items) AS BIGINT) AS items,
           CAST(SUM(sum_sq) AS BIGINT) AS sum_sq,
           CAST(SUM(n_large) AS BIGINT) AS n_large,
           CAST(SUM(has_even) AS BIGINT) AS n_has_even,
           CAST(SUM(all_positive) AS BIGINT) AS n_all_positive,
           CAST(SUM(fold_hash) AS BIGINT) AS fold_hash_sum,
           CAST(SUM(head2_sum) AS BIGINT) AS head2_sum,
           CAST(SUM(n_distinct) AS BIGINT) AS n_distinct,
           CAST(SUM(weighted_sum) AS BIGINT) AS weighted_sum
    FROM hof GROUP BY bucket
    """,
)
def array_hof_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's lambda-expression surface (transform/filter/exists/
    forall/aggregate/slice/array_distinct + an indexed zip via
    transform-with-index) pinned value-for-value against DuckDB's
    list_* functions. Complements array_set_ops (set algebra) and
    map_funcs (map surface)."""
    li = Catalog(spark, sf_dir).lineitem
    arr = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(F.col("l_quantity").cast("long"))
        ).alias("qs")
    )
    qs = F.col("qs")
    hof = arr.select(
        (F.col("l_orderkey") % 97).alias("bucket"),
        F.size(qs).alias("n_items"),
        F.aggregate(
            F.transform(qs, lambda x: x * x),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("sum_sq"),
        F.size(F.filter(qs, lambda x: x > 25)).alias("n_large"),
        F.when(F.exists(qs, lambda x: x % 2 == 0), 1)
        .otherwise(0)
        .alias("has_even"),
        F.when(F.forall(qs, lambda x: x > 0), 1)
        .otherwise(0)
        .alias("all_positive"),
        F.aggregate(
            F.slice(qs, 2, 1000000),
            F.element_at(qs, 1),
            lambda a, x: (a * 31 + x) % 1000003,
        ).alias("fold_hash"),
        F.aggregate(
            F.slice(qs, 1, 2),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("head2_sum"),
        F.size(F.array_distinct(qs)).alias("n_distinct"),
        F.aggregate(
            F.zip_with(
                qs,
                F.sequence(F.lit(1), F.size(qs)),
                lambda x, i: x * i.cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("weighted_sum"),
    )
    return hof.groupBy("bucket").agg(
        F.sum("n_items").cast("long").alias("items"),
        F.sum("sum_sq").cast("long").alias("sum_sq"),
        F.sum("n_large").cast("long").alias("n_large"),
        F.sum("has_even").cast("long").alias("n_has_even"),
        F.sum("all_positive").cast("long").alias("n_all_positive"),
        F.sum("fold_hash").cast("long").alias("fold_hash_sum"),
        F.sum("head2_sum").cast("long").alias("head2_sum"),
        F.sum("n_distinct").cast("long").alias("n_distinct"),
        F.sum("weighted_sum").cast("long").alias("weighted_sum"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 5 (continued): grid-DBSCAN re-expressed as
# relational algebra, difference-in-differences, per-step funnel
# significance, an optimizer-style join-cardinality audit, and
# cross-source quantile normalization on the distributed rank.
# ---------------------------------------------------------------------------


# Grid-DBSCAN over the first two embedding dimensions: a cell is CORE
# when its 3x3 neighborhood holds >= 8 points (grid_density_q's
# criterion); clusters are connected components of the adjacency graph
# over core cells (8-neighborhood), reported as (cluster, n_cells,
# n_points). The expensive phase is cell counting (one corpus
# aggregation); the graph lives on OCCUPIED CELLS (bounded by the
# grid, not the corpus) via plans/graph star contraction. The oracle
# walks the same closure with a recursive CTE over the cell graph.
@register(
    "grid_dbscan_q",
    """
    WITH RECURSIVE pts AS (
        SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) / 0.1) AS BIGINT)
                   AS cx,
               CAST(floor(CAST(embedding[2] AS DOUBLE) / 0.1) AS BIGINT)
                   AS cy
        FROM embeddings
    ),
    cells AS (SELECT cx, cy, COUNT(*) AS c FROM pts GROUP BY cx, cy),
    nbr AS (
        SELECT cells.cx + dx.d AS cx, cells.cy + dy.d AS cy,
               SUM(c) AS nbr_count
        FROM cells
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy
        GROUP BY 1, 2
    ),
    core AS (
        SELECT cells.cx, cells.cy, cells.c,
               (cells.cx + 1000) * 100000 + (cells.cy + 1000) AS cid
        FROM cells JOIN nbr USING (cx, cy)
        WHERE nbr.nbr_count >= 8
    ),
    edges AS (
        SELECT a.cid AS src, b.cid AS dst
        FROM core a JOIN core b
            ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
           AND a.cid <> b.cid
    ),
    reach(a, b) AS (
        SELECT cid, cid FROM core
        UNION
        SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
    ),
    comp AS (SELECT a AS cid, MIN(b) AS cluster FROM reach GROUP BY a)
    SELECT comp.cluster,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(core.c) AS BIGINT) AS n_points
    FROM core JOIN comp USING (cid)
    GROUP BY comp.cluster
    """,
)
def grid_dbscan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN's density clustering without any pairwise distances:
    count, threshold, connect adjacent cells, take components — every
    phase a bounded relational op (the cell graph can't outgrow the
    grid). Isolated core cells become their own singleton clusters."""
    from iniz_exporters_spark.plans.graph import connected_components

    e = Catalog(spark, sf_dir).embeddings
    pts = e.select(
        F.floor(F.element_at("embedding", 1).cast("double") / 0.1)
        .cast("long")
        .alias("cx"),
        F.floor(F.element_at("embedding", 2).cast("double") / 0.1)
        .cast("long")
        .alias("cy"),
    )
    cells = pts.groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("c"))
    sh = metadata_df(spark,
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
        "dx int, dy int",
    )
    nbr = (
        cells.crossJoin(F.broadcast(sh))
        .groupBy(
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
        )
        .agg(F.sum("c").alias("nbr_count"))
    )
    core = (
        cells.join(nbr, ["cx", "cy"])
        .filter(F.col("nbr_count") >= 8)
        .select(
            "cx",
            "cy",
            "c",
            ((F.col("cx") + 1000) * 100000 + F.col("cy") + 1000).alias(
                "cid"
            ),
        )
    )
    a = core.select(
        F.col("cx").alias("ax"), F.col("cy").alias("ay"),
        F.col("cid").alias("src"),
    )
    b = core.select(
        F.col("cx").alias("bx"), F.col("cy").alias("by"),
        F.col("cid").alias("dst"),
    )
    edges = a.join(
        b,
        (F.abs(F.col("ax") - F.col("bx")) <= 1)
        & (F.abs(F.col("ay") - F.col("by")) <= 1)
        & (F.col("src") != F.col("dst")),
    ).select("src", "dst")
    comps = connected_components(edges, method="star").withColumnRenamed(
        "node", "cid"
    )
    # isolated core cells never appear in the edge list — they are
    # their own singleton clusters
    labeled = core.join(comps, "cid", "left").select(
        "cid",
        "c",
        F.coalesce(F.col("component"), F.col("cid")).alias("cluster"),
    )
    return labeled.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("c").cast("long").alias("n_points"),
    )


# Difference-in-differences for the mid-month change in mean purchase
# value: treated = odd users, control = even users, post = on/after
# 2024-01-16. DiD = (T_post - T_pre) - (C_post - C_pre) from four
# exact-DECIMAL cell means — the 2x2 causal workhorse. One corpus
# aggregation; the estimate is scalar arithmetic on eight numbers.
@register(
    "did_q",
    """
    WITH cells AS (
        SELECT user_id % 2 AS treated,
               CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END
                   AS post,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ),
    w AS (
        SELECT MAX(CASE WHEN treated = 1 AND post = 0 THEN s / n END)
                   AS t_pre,
               MAX(CASE WHEN treated = 1 AND post = 1 THEN s / n END)
                   AS t_post,
               MAX(CASE WHEN treated = 0 AND post = 0 THEN s / n END)
                   AS c_pre,
               MAX(CASE WHEN treated = 0 AND post = 1 THEN s / n END)
                   AS c_post,
               CAST(SUM(n) AS BIGINT) AS n_events
        FROM cells
    )
    SELECT n_events,
           CAST(ROUND(t_post - t_pre, 6) AS DOUBLE) + 0.0
               AS treated_delta,
           CAST(ROUND(c_post - c_pre, 6) AS DOUBLE) + 0.0
               AS control_delta,
           CAST(ROUND((t_post - t_pre) - (c_post - c_pre), 6)
               AS DOUBLE) + 0.0 AS did_estimate
    FROM w
    """,
)
def did_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did the 'treatment' cohort's purchase value move differently
    after the cutoff than the control's parallel trend predicts?"""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    cells = e.groupBy(
        (F.col("user_id") % 2).alias("treated"),
        F.when(F.col("ts") >= F.lit("2024-01-16"), 1)
        .otherwise(0)
        .alias("post"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(F.col("value"), 18, 6)).cast("double").alias("s"),
    )

    def cell(t, p):
        return F.max(
            F.when(
                (F.col("treated") == t) & (F.col("post") == p),
                F.col("s") / F.col("n"),
            )
        )

    w = cells.agg(
        cell(1, 0).alias("t_pre"),
        cell(1, 1).alias("t_post"),
        cell(0, 0).alias("c_pre"),
        cell(0, 1).alias("c_post"),
        F.sum("n").cast("long").alias("n_events"),
    )
    td = F.col("t_post") - F.col("t_pre")
    cd = F.col("c_post") - F.col("c_pre")
    return w.select(
        "n_events",
        (F.round(td, 6) + F.lit(0.0)).alias("treated_delta"),
        (F.round(cd, 6) + F.lit(0.0)).alias("control_delta"),
        (F.round(td - cd, 6) + F.lit(0.0)).alias("did_estimate"),
    )


# Per-step funnel drop-off significance: at each signup->view->click->
# purchase step, the two cohorts' step-conversion proportions get a
# two-proportion pooled z. User-level step flags reduce in one pass;
# the step table is 3 rows of scalar arithmetic.
@register(
    "funnel_significance_q",
    """
    WITH u AS (
        SELECT user_id, user_id % 2 AS grp,
               MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                   AS s1,
               MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   AS s2,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS s3,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS s4
        FROM events GROUP BY user_id
    ),
    steps AS (
        SELECT step, grp,
               SUM(reached_prev) AS n_prev, SUM(reached) AS n_cur
        FROM (
            SELECT grp, 'view_of_signup' AS step, s1 AS reached_prev,
                   CASE WHEN s1 = 1 AND s2 = 1 THEN 1 ELSE 0 END
                       AS reached FROM u
            UNION ALL
            SELECT grp, 'click_of_view', s2,
                   CASE WHEN s2 = 1 AND s3 = 1 THEN 1 ELSE 0 END FROM u
            UNION ALL
            SELECT grp, 'purchase_of_click', s3,
                   CASE WHEN s3 = 1 AND s4 = 1 THEN 1 ELSE 0 END FROM u
        ) GROUP BY step, grp
    ),
    wide AS (
        SELECT step,
               MAX(CASE WHEN grp = 0 THEN n_prev END) AS n0,
               MAX(CASE WHEN grp = 0 THEN n_cur END) AS c0,
               MAX(CASE WHEN grp = 1 THEN n_prev END) AS n1,
               MAX(CASE WHEN grp = 1 THEN n_cur END) AS c1
        FROM steps GROUP BY step
    )
    SELECT step,
           CAST(ROUND(CAST(c0 AS DOUBLE) / NULLIF(n0, 0), 6) AS DOUBLE)
               AS rate_g0,
           CAST(ROUND(CAST(c1 AS DOUBLE) / NULLIF(n1, 0), 6) AS DOUBLE)
               AS rate_g1,
           CAST(ROUND((CAST(c0 AS DOUBLE) / NULLIF(n0, 0)
                       - CAST(c1 AS DOUBLE) / NULLIF(n1, 0))
               / NULLIF(sqrt((CAST(c0 + c1 AS DOUBLE)
                          / NULLIF(n0 + n1, 0))
                      * (1 - CAST(c0 + c1 AS DOUBLE)
                             / NULLIF(n0 + n1, 0))
                      * (1.0 / NULLIF(n0, 0) + 1.0 / NULLIF(n1, 0))),
                 0), 6) AS DOUBLE) + 0.0 AS z_stat
    FROM wide
    """,
)
def funnel_significance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE in the funnel do the cohorts actually diverge? Pooled
    two-proportion z per step, conditioned on reaching the prior
    step (so later steps aren't confounded by earlier drop-off)."""
    e = Catalog(spark, sf_dir).events
    flags = [
        F.max(
            F.when(F.col("event_type") == t, 1).otherwise(0)
        ).alias(f"s{i}")
        for i, t in enumerate(
            ["signup", "view", "click", "purchase"], start=1
        )
    ]
    u = e.groupBy("user_id").agg(*flags).withColumn(
        "grp", F.col("user_id") % 2
    )
    steps = None
    for name, prev, cur in [
        ("view_of_signup", "s1", "s2"),
        ("click_of_view", "s2", "s3"),
        ("purchase_of_click", "s3", "s4"),
    ]:
        part = u.select(
            "grp",
            F.lit(name).alias("step"),
            F.col(prev).alias("reached_prev"),
            F.when(
                (F.col(prev) == 1) & (F.col(cur) == 1), 1
            )
            .otherwise(0)
            .alias("reached"),
        )
        steps = part if steps is None else steps.unionByName(part)
    agg = steps.groupBy("step", "grp").agg(
        F.sum("reached_prev").alias("n_prev"),
        F.sum("reached").alias("n_cur"),
    )

    def side(col, g):
        return F.max(F.when(F.col("grp") == g, F.col(col)))

    wide = agg.groupBy("step").agg(
        side("n_prev", 0).alias("n0"),
        side("n_cur", 0).alias("c0"),
        side("n_prev", 1).alias("n1"),
        side("n_cur", 1).alias("c1"),
    )
    n0 = F.nullif(F.col("n0"), F.lit(0))
    n1 = F.nullif(F.col("n1"), F.lit(0))
    r0 = F.col("c0").cast("double") / n0
    r1 = F.col("c1").cast("double") / n1
    pool = (F.col("c0") + F.col("c1")).cast("double") / F.nullif(
        F.col("n0") + F.col("n1"), F.lit(0)
    )
    z = (r0 - r1) / F.nullif(
        F.sqrt(pool * (1 - pool) * (1.0 / n0 + 1.0 / n1)), F.lit(0.0)
    )
    return wide.select(
        "step",
        F.round(r0, 6).alias("rate_g0"),
        F.round(r1, 6).alias("rate_g1"),
        (F.round(z, 6) + F.lit(0.0)).alias("z_stat"),
    )


# Optimizer-style join-cardinality audit: for the orders |><| lineitem
# equi-join bucketed by order-key residue, compare the textbook
# estimate |R| * |S| / max(ndv_R, ndv_S) against the TRUE join output
# count, reporting the q-error max(est/act, act/est) that optimizer
# papers grade estimators by. Everything reduces with map-side
# partials; the audit table is one row per residue bucket.
@register(
    "join_cardinality_audit_q",
    """
    WITH r AS (
        SELECT o_orderkey % 16 AS b, COUNT(*) AS n_r,
               COUNT(DISTINCT o_orderkey) AS ndv_r
        FROM orders GROUP BY 1
    ),
    s AS (
        SELECT l_orderkey % 16 AS b, COUNT(*) AS n_s,
               COUNT(DISTINCT l_orderkey) AS ndv_s
        FROM lineitem GROUP BY 1
    ),
    act AS (
        SELECT o.o_orderkey % 16 AS b, COUNT(*) AS actual
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
    )
    SELECT r.b AS bucket,
           CAST(r.n_r AS BIGINT) AS n_orders,
           CAST(s.n_s AS BIGINT) AS n_lineitems,
           CAST(ROUND(CAST(r.n_r AS DOUBLE) * s.n_s
               / greatest(r.ndv_r, s.ndv_s), 2) AS DOUBLE)
               AS estimated,
           CAST(act.actual AS BIGINT) AS actual,
           CAST(ROUND(greatest(
               (CAST(r.n_r AS DOUBLE) * s.n_s
                / greatest(r.ndv_r, s.ndv_s)) / act.actual,
               act.actual / (CAST(r.n_r AS DOUBLE) * s.n_s
                / greatest(r.ndv_r, s.ndv_s))), 4) AS DOUBLE)
               AS q_error
    FROM r JOIN s ON s.b = r.b JOIN act ON act.b = r.b
    """,
)
def join_cardinality_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How wrong would the uniform-frequency independence estimate be
    on this join? q-error per bucket — the sanity check a lakehouse
    stats pipeline runs after ANALYZE (analyze_table_stats feeds the
    same inputs)."""
    o = Catalog(spark, sf_dir).orders
    li = Catalog(spark, sf_dir).lineitem
    r = o.groupBy((F.col("o_orderkey") % 16).alias("b")).agg(
        F.count(F.lit(1)).alias("n_r"),
        F.countDistinct("o_orderkey").alias("ndv_r"),
    )
    s = li.groupBy((F.col("l_orderkey") % 16).alias("b")).agg(
        F.count(F.lit(1)).alias("n_s"),
        F.countDistinct("l_orderkey").alias("ndv_s"),
    )
    act = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy((F.col("o_orderkey") % 16).alias("b"))
        .agg(F.count(F.lit(1)).alias("actual"))
    )
    est = (
        F.col("n_r").cast("double")
        * F.col("n_s")
        / F.greatest(F.col("ndv_r"), F.col("ndv_s"))
    )
    return (
        r.join(s, "b")
        .join(act, "b")
        .select(
            F.col("b").alias("bucket"),
            F.col("n_r").cast("long").alias("n_orders"),
            F.col("n_s").cast("long").alias("n_lineitems"),
            F.round(est, 2).alias("estimated"),
            F.col("actual").cast("long").alias("actual"),
            F.round(
                F.greatest(
                    est / F.col("actual"), F.col("actual") / est
                ),
                4,
            ).alias("q_error"),
        )
    )


# Cross-source quantile normalization of document lengths (the
# bioinformatics batch-correction standard): rank documents WITHIN
# each source, average the values at each rank ACROSS sources, and
# replace every document's length with the cross-source mean at its
# rank. Per-source ranks come from grouped_index (range partition +
# broadcast offsets — no per-source corpus-scale window); the
# rank-profile join is rank-keyed. Output: per (source, rank-decile)
# mean of normalized values — identical across sources afterward by
# construction, which the oracle verifies value-for-value.
@register(
    "quantile_normalize_q",
    """
    WITH ranked AS (
        SELECT source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY n_chars, doc_id) AS r,
               COUNT(*) OVER (PARTITION BY source) AS n_src
        FROM documents
    ),
    profile AS (
        SELECT r, CAST(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*)
                   AS DECIMAL(18,6)) AS qmean,
               COUNT(*) AS n_sources_at_rank
        FROM ranked GROUP BY r
    ),
    norm AS (
        SELECT ranked.source, ranked.r, ranked.n_src, profile.qmean
        FROM ranked JOIN profile USING (r)
    )
    SELECT source,
           CAST((r - 1) * 10 // n_src AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(ROUND(CAST(SUM(qmean) AS DOUBLE) / COUNT(*), 4)
               AS DOUBLE) AS mean_normalized
    FROM norm
    GROUP BY source, (r - 1) * 10 // n_src
    """,
)
def quantile_normalize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove per-source length-distribution shifts before mixing
    corpora: after normalization every source shares the SAME value
    distribution (its rank profile), summarized here per decile."""
    from iniz_exporters_spark.operators.indexing import grouped_index

    d = Catalog(spark, sf_dir).documents.select(
        "source", "n_chars", "doc_id"
    )
    ranked = grouped_index(
        d,
        ["source"],
        [F.col("n_chars").asc(), F.col("doc_id").asc()],
        idx_col="r",
        size_col="n_src",
    )
    profile = ranked.groupBy("r").agg(
        (F.sum("n_chars").cast("double") / F.count(F.lit(1)))
        .cast("decimal(18,6)")
        .alias("qmean")
    )
    norm = ranked.join(profile, "r")
    decile = F.expr("(r - 1) * 10 div n_src")
    return norm.groupBy(
        "source", decile.cast("long").alias("decile")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(
            F.sum("qmean").cast("double") / F.count(F.lit(1)), 4
        ).alias("mean_normalized"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 5 (continued): breakpoint regression, the
# ABC x XYZ inventory census, Haar wavelet band energies, the
# gaps-and-islands longest streak, and the Welford/Chan parallel
# variance merge that underlies every distributed STDDEV.
# ---------------------------------------------------------------------------


# Single-breakpoint trend segmentation of daily purchase revenue: for
# every candidate split day, fit OLS lines to both sides and pick the
# split minimizing total SSE (>= 3 points per side). The candidate x
# day table is calendar x calendar (bounded); each side's SSE comes
# from closed-form moments of DECIMAL-quantized values. Ties on the
# 6-dp-rounded SSE break toward the earliest split in both engines.
@register(
    "trend_break_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               ROW_NUMBER() OVER (ORDER BY CAST(ts AS DATE)) AS t,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS y
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    cand AS (SELECT t AS split FROM daily),
    sides AS (
        SELECT c.split, d.t <= c.split AS left_side,
               COUNT(*) AS n,
               CAST(SUM(d.t) AS DOUBLE) AS sx,
               CAST(SUM(d.y) AS DOUBLE) AS sy,
               CAST(SUM(CAST(d.t AS BIGINT) * d.t) AS DOUBLE) AS sxx,
               CAST(SUM(d.t * d.y) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(d.y AS DECIMAL(16,6))
                        * CAST(d.y AS DECIMAL(16,6))) AS DOUBLE) AS syy
        FROM cand c JOIN daily d ON TRUE
        GROUP BY c.split, d.t <= c.split
    ),
    sse AS (
        SELECT split, left_side, n,
               syy - sy * sy / n
                 - CASE WHEN sxx - sx * sx / n > 0
                        THEN (sxy - sx * sy / n) * (sxy - sx * sy / n)
                             / (sxx - sx * sx / n)
                        ELSE 0 END AS e
        FROM sides
    ),
    scored AS (
        SELECT split,
               ROUND(SUM(e), 6) AS total_sse,
               MIN(n) AS min_side
        FROM sse GROUP BY split
        HAVING COUNT(*) = 2 AND MIN(n) >= 3
    ),
    best AS (
        SELECT split, total_sse,
               ROW_NUMBER() OVER (ORDER BY total_sse, split) AS rk
        FROM scored
    )
    SELECT d.day AS break_day,
           CAST(b.split AS BIGINT) AS break_t,
           CAST(b.total_sse AS DOUBLE) + 0.0 AS total_sse
    FROM best b JOIN daily d ON d.t = b.split
    WHERE b.rk = 1
    """,
)
def trend_break_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where does the revenue trend change slope? Exhaustive single-
    breakpoint piecewise OLS — the regression view of what
    cusum_changepoint_q detects sequentially."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    wday = Window.orderBy("day")
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(
            (
                F.sum(_dec(F.col("value"), 18, 6)).cast("double")
                / F.count(F.lit(1))
            )
            .cast("decimal(18,6)")
            .alias("y")
        )
        .withColumn("t", F.row_number().over(wday))
    )
    cand = daily.select(F.col("t").alias("split"))
    sides = (
        cand.join(daily)
        .groupBy("split", (F.col("t") <= F.col("split")).alias("left_side"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("t").cast("double").alias("sx"),
            F.sum("y").cast("double").alias("sy"),
            F.sum(F.col("t").cast("long") * F.col("t"))
            .cast("double")
            .alias("sxx"),
            F.sum(F.col("t") * F.col("y")).cast("double").alias("sxy"),
            F.sum(
                F.col("y").cast("decimal(16,6)")
                * F.col("y").cast("decimal(16,6)")
            )
            .cast("double")
            .alias("syy"),
        )
    )
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    sse = sides.select(
        "split",
        "n",
        (
            cyy - F.when(cxx > 0, cxy * cxy / cxx).otherwise(F.lit(0.0))
        ).alias("e"),
    )
    scored = (
        sse.groupBy("split")
        .agg(
            F.round(F.sum("e"), 6).alias("total_sse"),
            F.min("n").alias("min_side"),
            F.count(F.lit(1)).alias("n_sides"),
        )
        .filter((F.col("n_sides") == 2) & (F.col("min_side") >= 3))
    )
    wbest = Window.orderBy("total_sse", "split")
    best = scored.withColumn("rk", F.row_number().over(wbest)).filter(
        F.col("rk") == 1
    )
    return best.join(daily, best["split"] == daily["t"]).select(
        F.col("day").alias("break_day"),
        F.col("split").cast("long").alias("break_t"),
        (F.col("total_sse") + F.lit(0.0)).alias("total_sse"),
    )


# ABC x XYZ inventory census: ABC classes from abc_analysis_q's
# cumulative revenue cut, XYZ classes from each part's weekly demand
# variability (CV = sd/mean of weekly quantities over the part's
# active weeks: X < 0.5, Y < 1.0, Z otherwise). The 3 x 3 census is
# the stocking-policy planning table. Revenue ranks reuse
# global_cumsum; CVs come from exact per-(part, week) DECIMAL sums.
@register(
    "abc_xyz_q",
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
               SUM(rev_c) OVER (ORDER BY rev_c DESC, l_partkey) AS cum_c
        FROM pr
    ),
    abc AS (
        SELECT l_partkey,
               CASE WHEN cum_c <= 0.80 * (SELECT t FROM tot) THEN 'A'
                    WHEN cum_c <= 0.95 * (SELECT t FROM tot) THEN 'B'
                    ELSE 'C' END AS abc
        FROM c
    ),
    wk AS (
        SELECT l_partkey,
               date_diff('day', DATE '1995-01-01',
                   CAST(l_shipdate AS DATE)) // 7 AS w,
               SUM(CAST(l_quantity AS DECIMAL(18,4))) AS q
        FROM lineitem GROUP BY 1, 2
    ),
    cv AS (
        SELECT l_partkey,
               COUNT(*) AS n,
               CAST(SUM(q) AS DOUBLE) AS s,
               CAST(SUM(CAST(q AS DECIMAL(16,4))
                        * CAST(q AS DECIMAL(16,4))) AS DOUBLE) AS ss
        FROM wk GROUP BY l_partkey
    ),
    xyz AS (
        SELECT l_partkey,
               CASE WHEN n < 2 THEN 'Z'
                    WHEN sqrt(greatest(ss / n - (s / n) * (s / n), 0.0))
                         / (s / n) < 0.5 THEN 'X'
                    WHEN sqrt(greatest(ss / n - (s / n) * (s / n), 0.0))
                         / (s / n) < 1.0 THEN 'Y'
                    ELSE 'Z' END AS xyz
        FROM cv
    )
    SELECT abc.abc, xyz.xyz, CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM abc JOIN xyz USING (l_partkey)
    GROUP BY abc.abc, xyz.xyz
    """,
)
def abc_xyz_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which parts are high-value AND unpredictable (the A-Z corner
    that breaks stocking policies)? Crosses abc_analysis_q's revenue
    cut with weekly-demand CV classes."""
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
    abc = c.crossJoin(F.broadcast(tot)).select(
        "l_partkey",
        F.when(F.col("cum_c") <= 0.80 * F.col("t"), "A")
        .when(F.col("cum_c") <= 0.95 * F.col("t"), "B")
        .otherwise("C")
        .alias("abc"),
    )
    wk = li.groupBy(
        "l_partkey",
        (
            F.datediff(F.to_date("l_shipdate"), F.lit("1995-01-01")) / 7
        )
        .cast("long")
        .alias("w"),
    ).agg(F.sum(_dec(F.col("l_quantity"), 18, 4)).alias("q"))
    cv = wk.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").cast("double").alias("s"),
        F.sum(
            F.col("q").cast("decimal(16,4)")
            * F.col("q").cast("decimal(16,4)")
        )
        .cast("double")
        .alias("ss"),
    )
    mean = F.col("s") / F.col("n")
    sd = F.sqrt(
        F.greatest(
            F.col("ss") / F.col("n") - mean * mean, F.lit(0.0)
        )
    )
    xyz = cv.select(
        "l_partkey",
        F.when(F.col("n") < 2, "Z")
        .when(sd / mean < 0.5, "X")
        .when(sd / mean < 1.0, "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    return abc.join(xyz, "l_partkey").groupBy("abc", "xyz").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts")
    )


# Haar wavelet band energies of the daily purchase-revenue series:
# missing dyadic slots simply contribute zero (absent from the block
# sums — no explicit padding needed); energy at
# level k = sum over blocks of (left-half sum - right-half sum)^2
# / 2^k — the unnormalized Haar detail energy, RATIONAL in the block
# sums so no sqrt(2) ever enters. Block sums are exact DECIMALs built
# by bit-shifted grouping; the level table is 5 rows.
@register(
    "haar_energy_q",
    """
    WITH daily AS (
        SELECT ROW_NUMBER() OVER (ORDER BY CAST(ts AS DATE)) - 1 AS i,
               SUM(CAST(value AS DECIMAL(18,6))) AS v
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    lv AS (SELECT unnest(range(1, 6)) AS k),
    blocks AS (
        SELECT lv.k, d.i // (1 << lv.k) AS blk,
               SUM(CASE WHEN (d.i // (1 << (lv.k - 1))) % 2 = 0
                        THEN d.v ELSE -d.v END) AS diff
        FROM daily d CROSS JOIN lv
        GROUP BY lv.k, d.i // (1 << lv.k)
    )
    SELECT CAST(k AS BIGINT) AS level,
           CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(ROUND(CAST(SUM(CAST(CAST(diff AS DOUBLE)
                    * CAST(diff AS DOUBLE) AS DECIMAL(38,6)))
                    AS DOUBLE) / (1 << k), 4) AS DOUBLE) + 0.0
               AS band_energy
    FROM blocks GROUP BY k
    """,
)
def haar_energy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which time scale carries the revenue variance — day-to-day
    (level 1), weekly-ish (level 3), or fortnight+ (level 5)? The
    multiresolution companion to acf_q/seasonal_strength_q."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    wday = Window.orderBy("day")
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(_dec(F.col("value"), 18, 6)).alias("v"))
        .select((F.row_number().over(wday) - 1).alias("i"), "v")
    )
    lv = daily.sparkSession.range(1, 6).select(
        F.col("id").cast("int").alias("k")
    )
    sign = F.when(
        (
            F.col("i").cast("long")
            / F.pow(F.lit(2), F.col("k") - 1).cast("long")
        ).cast("long")
        % 2
        == 0,
        F.col("v"),
    ).otherwise(-F.col("v"))
    blocks = (
        daily.crossJoin(F.broadcast(lv))
        .groupBy(
            "k",
            (
                F.col("i").cast("long")
                / F.pow(F.lit(2), F.col("k")).cast("long")
            )
            .cast("long")
            .alias("blk"),
        )
        .agg(F.sum(sign).alias("diff"))
    )
    d = F.col("diff").cast("double")
    return blocks.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
    ).join(
        blocks.groupBy("k").agg(
            F.sum((d * d).cast("decimal(38,6)"))
            .cast("double")
            .alias("se")
        ),
        "k",
    ).select(
        F.col("k").cast("long").alias("level"),
        "n_blocks",
        (
            F.round(
                F.col("se") / F.pow(F.lit(2), F.col("k")), 4
            )
            + F.lit(0.0)
        ).alias("band_energy"),
    )


# Longest strictly-increasing streak of daily purchase revenue — the
# canonical gaps-and-islands pattern: mark streak starts with LAG,
# cumulative-sum the starts into island ids, then take the longest
# island (ties -> earliest start). Every window runs on the
# calendar-bounded daily frame; revenue comparisons are exact
# DECIMALs.
@register(
    "longest_streak_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               SUM(CAST(value AS DECIMAL(18,6))) AS rev
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    marks AS (
        SELECT day, rev,
               CASE WHEN rev > LAG(rev) OVER (ORDER BY day)
                    THEN 0 ELSE 1 END AS is_start
        FROM daily
    ),
    islands AS (
        SELECT day, rev,
               SUM(is_start) OVER (ORDER BY day) AS island
        FROM marks
    ),
    sized AS (
        SELECT island, COUNT(*) AS len,
               MIN(day) AS start_day, MAX(day) AS end_day
        FROM islands GROUP BY island
    ),
    best AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY len DESC, start_day) AS rk
        FROM sized
    )
    SELECT CAST(len AS BIGINT) AS streak_len,
           start_day, end_day
    FROM best WHERE rk = 1
    """,
)
def longest_streak_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The longest run of day-over-day revenue growth — SQL's
    gaps-and-islands idiom (LAG marks + running-sum island ids)."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(_dec(F.col("value"), 18, 6)).alias("rev")
    )
    wday = Window.orderBy("day")
    wcum = wday.rowsBetween(Window.unboundedPreceding, 0)
    marks = daily.select(
        "day",
        "rev",
        F.when(F.col("rev") > F.lag("rev").over(wday), 0)
        .otherwise(1)
        .alias("is_start"),
    )
    islands = marks.select(
        "day", F.sum("is_start").over(wcum).alias("island")
    )
    sized = islands.groupBy("island").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("day").alias("start_day"),
        F.max("day").alias("end_day"),
    )
    wbest = Window.orderBy(F.col("len").desc(), F.col("start_day"))
    return (
        sized.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select(
            F.col("len").cast("long").alias("streak_len"),
            "start_day",
            "end_day",
        )
    )


# Welford/Chan parallel variance merge, audited: compute per-nation
# partial (n, mean, M2) statistics, merge them pairwise-fold style
# with the Chan update M2 = M2a + M2b + delta^2 * na*nb/(na+nb), and
# pin the merged result against the direct two-pass variance. This is
# the algebra that lets distributed STDDEV avoid a second scan; the
# audit reports both paths and their 9-dp agreement. Merge order is
# fixed (nation ascending) so the float fold is identical in both
# engines.
@register(
    "welford_merge_q",
    """
    WITH parts AS (
        SELECT c_nationkey AS nat, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) AS mean,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(19,6))
                        * CAST(c_acctbal AS DECIMAL(19,6))) AS DOUBLE)
               - CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                 * CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6)))
                        AS DOUBLE) / COUNT(*) AS m2
        FROM customer GROUP BY c_nationkey
    ),
    merged AS (
        SELECT n, mean, m2, rk FROM (
            SELECT parts.*,
                   ROW_NUMBER() OVER (ORDER BY nat) AS rk
            FROM parts
        )
    ),
    fold AS (
        WITH RECURSIVE f(rk, n, mean, m2) AS (
            SELECT rk, CAST(n AS BIGINT), mean, m2
            FROM merged WHERE rk = 1
            UNION ALL
            SELECT m.rk, f.n + m.n,
                   (f.mean * f.n + m.mean * m.n) / (f.n + m.n),
                   f.m2 + m.m2
                     + (m.mean - f.mean) * (m.mean - f.mean)
                       * f.n * m.n / (f.n + m.n)
            FROM f JOIN merged m ON m.rk = f.rk + 1
        )
        SELECT n, m2 FROM f
        WHERE rk = (SELECT MAX(rk) FROM merged)
    ),
    direct AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(19,6))
                        * CAST(c_acctbal AS DECIMAL(19,6))) AS DOUBLE)
               - CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                 * CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6)))
                        AS DOUBLE) / COUNT(*) AS m2
        FROM customer
    )
    SELECT CAST(direct.n AS BIGINT) AS n_rows,
           CAST(ROUND(direct.m2 / (direct.n - 1), 4) AS DOUBLE) + 0.0
               AS var_direct,
           CAST(ROUND(fold.m2 / (fold.n - 1), 4) AS DOUBLE) + 0.0
               AS var_merged,
           abs(direct.m2 - fold.m2) / direct.m2 < 1e-9
               AS merge_agrees
    FROM direct, fold
    """,
)
def welford_merge_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proof-by-query that partial-moment merging reproduces the
    global variance: the identity every map-side-combine STDDEV rests
    on, folded in a FIXED nation order so both engines walk the same
    float path. The 25-row partial table is collected to the driver
    (metadata scale — the same class as k x d centroids) and folded
    there, mirroring the oracle's recursive CTE step for step."""
    c = Catalog(spark, sf_dir).customer
    s6 = _dec(F.col("c_acctbal"), 18, 6)
    s16 = _dec(F.col("c_acctbal"), 16, 6)
    parts = (
        c.groupBy(F.col("c_nationkey").alias("nat"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(s6).cast("double") / F.count(F.lit(1))).alias("mean"),
            (
                F.sum(s16 * s16).cast("double")
                - F.sum(s6).cast("double")
                * F.sum(s6).cast("double")
                / F.count(F.lit(1))
            ).alias("m2"),
        )
        .orderBy("nat")
    )
    # metadata-scale sequential fold (25 rows) — same order as the
    # oracle's recursive CTE
    rows = parts.collect()
    n, mean, m2 = rows[0]["n"], rows[0]["mean"], rows[0]["m2"]
    for r in rows[1:]:
        nb, mb, m2b = r["n"], r["mean"], r["m2"]
        delta = mb - mean
        m2 = m2 + m2b + delta * delta * n * nb / (n + nb)
        mean = (mean * n + mb * nb) / (n + nb)
        n = n + nb
    direct = c.agg(
        F.count(F.lit(1)).alias("nd"),
        (
            F.sum(s16 * s16).cast("double")
            - F.sum(s6).cast("double")
            * F.sum(s6).cast("double")
            / F.count(F.lit(1))
        ).alias("m2d"),
    )
    return direct.select(
        F.col("nd").cast("long").alias("n_rows"),
        (
            F.round(F.col("m2d") / (F.col("nd") - 1), 4) + F.lit(0.0)
        ).alias("var_direct"),
        (
            F.round(F.lit(m2) / (F.lit(n) - 1), 4) + F.lit(0.0)
        ).alias("var_merged"),
        (
            F.abs(F.col("m2d") - F.lit(m2)) / F.col("m2d") < 1e-9
        ).alias("merge_agrees"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 5 (continued): restricted mean survival,
# Dunn's post-hoc with BH control, deterministic exhaustive RANSAC,
# Bradley-Terry strengths via rational MM iterations, and a Weiszfeld
# geometric median (sqrt is IEEE-correctly-rounded, so the iterate
# trajectory is bit-identical across engines).
# ---------------------------------------------------------------------------


# Restricted mean survival time (RMST) to the 14-day horizon: the area
# under the Kaplan-Meier curve, sum of S(t_k) x (t_{k+1} - t_k) over
# the step function clipped at tau = 14 — the one-number survival
# summary that stays valid under censoring. Reuses km_survival_q's
# duration frame; the step integration is a window pass over it.
@register(
    "rmst_q",
    """
    WITH su AS (
        SELECT user_id, MIN(ts) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    la AS (SELECT user_id, MAX(ts) AS tl FROM events GROUP BY user_id),
    pu AS (
        SELECT e.user_id, MIN(e.ts) AS tp
        FROM events e JOIN su USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= su.t0
        GROUP BY e.user_id
    ),
    b AS (
        SELECT su.user_id,
               CASE WHEN tp IS NOT NULL
                    THEN date_diff('day', CAST(t0 AS DATE), CAST(tp AS DATE))
                    ELSE date_diff('day', CAST(t0 AS DATE), CAST(tl AS DATE))
               END AS t,
               CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS obs
        FROM su JOIN la USING (user_id)
        LEFT JOIN pu ON pu.user_id = su.user_id
    ),
    g AS (SELECT t, SUM(obs) AS d, COUNT(*) AS m FROM b GROUP BY t),
    tot AS (SELECT COUNT(*) AS nn FROM b),
    k AS (
        SELECT t, d, nn - (SUM(m) OVER (ORDER BY t) - m) AS n_risk
        FROM g CROSS JOIN tot
    ),
    c AS (
        SELECT t,
               EXP(SUM(CASE WHEN n_risk > d
                       THEN LN(CAST(n_risk - d AS DOUBLE)
                               / CAST(n_risk AS DOUBLE)) END)
                   OVER (ORDER BY t)) AS s
        FROM k WHERE d > 0 AND t < 14
    ),
    steps AS (
        SELECT t, s,
               COALESCE(LEAD(t) OVER (ORDER BY t), 14) AS t_next,
               LAG(t) OVER (ORDER BY t) IS NULL AS is_first
        FROM c WHERE t < 14
    )
    SELECT CAST(ROUND(
               MAX(CASE WHEN is_first THEN t ELSE 0 END)
               + CAST(SUM(CAST(s * (least(t_next, 14) - t)
                     AS DECIMAL(28,12))) AS DOUBLE), 4) AS DOUBLE)
               + 0.0 AS rmst_14d,
           CAST(COUNT(*) AS BIGINT) AS n_steps
    FROM steps
    """,
)
def rmst_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected conversion-free days within the first two weeks —
    the integral summary of km_survival_q (S = 1 before the first
    event time, so that span contributes its full width)."""
    ev = Catalog(spark, sf_dir).events
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    la = ev.groupBy("user_id").agg(F.max("ts").alias("tl"))
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    b = (
        su.join(la, "user_id")
        .join(pu, "user_id", "left")
        .select(
            F.when(
                F.col("tp").isNotNull(),
                F.datediff(F.to_date("tp"), F.to_date("t0")),
            )
            .otherwise(F.datediff(F.to_date("tl"), F.to_date("t0")))
            .alias("t"),
            F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("obs"),
        )
    )
    g = b.groupBy("t").agg(
        F.sum("obs").alias("d"), F.count(F.lit(1)).alias("m")
    )
    tot = b.agg(F.count(F.lit(1)).alias("nn"))
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    k = g.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        (F.col("nn") - (F.sum("m").over(wcum) - F.col("m"))).alias(
            "n_risk"
        ),
    )
    c = (
        k.filter((F.col("d") > 0) & (F.col("t") < 14))
        .select(
            "t",
            "d",
            "n_risk",
        )
        .withColumn(
            "s",
            F.exp(
                F.sum(
                    F.when(
                        F.col("n_risk") > F.col("d"),
                        F.log(
                            (F.col("n_risk") - F.col("d")).cast("double")
                            / F.col("n_risk").cast("double")
                        ),
                    )
                ).over(wcum)
            ),
        )
    )
    wlead = Window.orderBy("t")
    steps = c.select(
        "t",
        "s",
        F.coalesce(F.lead("t").over(wlead), F.lit(14)).alias("t_next"),
        F.lag("t").over(wlead).isNull().alias("is_first"),
    )
    return steps.agg(
        (
            F.round(
                F.max(
                    F.when(F.col("is_first"), F.col("t")).otherwise(0)
                )
                + _dsum(
                    F.col("s")
                    * (
                        F.least(F.col("t_next"), F.lit(14)) - F.col("t")
                    )
                ).cast("double"),
                4,
            )
            + F.lit(0.0)
        ).alias("rmst_14d"),
        F.count(F.lit(1)).cast("long").alias("n_steps"),
    )


# Dunn's post-hoc test after kruskal_wallis_q, BH-corrected: pairwise
# mean-rank z statistics between market segments on the SHARED
# midrank table (z_ij = (Rbar_i - Rbar_j) / sqrt(N(N+1)/12 (1/ni +
# 1/nj)), rank2 = doubled midranks keep rank sums integral), then the
# Benjamini-Hochberg step-up over the 10 pairwise A&S-erfc p-values
# (the bh_fdr_q machinery). Rank sums come from avg_rank2_table
# (range-partitioned); the pair table is k(k-1)/2 rows.
@register(
    "dunn_test_q",
    """
    WITH v AS (
        SELECT c_mktsegment AS seg, c_acctbal AS x FROM customer
    ),
    cnt AS (SELECT x, COUNT(*) AS cnt FROM v GROUP BY x),
    rk AS (
        SELECT x, 2 * SUM(cnt) OVER (ORDER BY x) - cnt + 1 AS rank2
        FROM cnt
    ),
    seg AS (
        SELECT v.seg, COUNT(*) AS n,
               CAST(SUM(rk.rank2) AS DOUBLE) / (2 * COUNT(*))
                   AS mean_rank
        FROM v JOIN rk ON rk.x = v.x
        GROUP BY v.seg
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM seg),
    pairs AS (
        SELECT a.seg AS seg_a, b.seg AS seg_b,
               abs(a.mean_rank - b.mean_rank)
               / sqrt((SELECT nn * (nn + 1) / 12.0 FROM tot)
                      * (1.0 / a.n + 1.0 / b.n)) AS az
        FROM seg a JOIN seg b ON a.seg < b.seg
    ),
    p AS (
        SELECT seg_a, seg_b, az,
               (0.254829592 * (1 / (1 + 0.3275911 * az / sqrt(2.0)))
                - 0.284496736 * pow(1 / (1 + 0.3275911 * az / sqrt(2.0)), 2)
                + 1.421413741 * pow(1 / (1 + 0.3275911 * az / sqrt(2.0)), 3)
                - 1.453152027 * pow(1 / (1 + 0.3275911 * az / sqrt(2.0)), 4)
                + 1.061405429 * pow(1 / (1 + 0.3275911 * az / sqrt(2.0)), 5))
               * exp(-az * az / 2.0) AS pv
        FROM pairs
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY pv, seg_a, seg_b) AS i,
               COUNT(*) OVER () AS m
        FROM p
    ),
    kstar AS (
        SELECT ranked.*,
               MAX(CASE WHEN pv <= 0.05 * i / m THEN i END) OVER () AS k
        FROM ranked
    )
    SELECT seg_a, seg_b,
           CAST(ROUND(az, 4) AS DOUBLE) + 0.0 AS abs_z,
           CAST(ROUND(pv, 6) AS DOUBLE) + 0.0 AS p_value,
           COALESCE(i <= k, FALSE) AS significant
    FROM kstar
    """,
)
def dunn_test_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHICH segments differ in rank location after kruskal_wallis_q
    rejects — the nonparametric sibling of tukey_hsd_q, with FDR
    control instead of the studentized range."""
    from iniz_exporters_spark.operators.indexing import avg_rank2_table

    c = Catalog(spark, sf_dir).customer
    v = c.select(F.col("c_mktsegment").alias("seg"), F.col("c_acctbal").alias("x"))
    cnt = v.groupBy("x").agg(F.count(F.lit(1)).alias("cnt"))
    rk = avg_rank2_table(cnt, "x")
    seg = (
        v.join(rk, "x")
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum("rank2").cast("double") / (2 * F.count(F.lit(1)))
            ).alias("mean_rank"),
        )
    )
    tot = seg.agg(F.sum("n").cast("long").alias("nn"))
    a = seg.select(
        F.col("seg").alias("seg_a"),
        F.col("n").alias("na"),
        F.col("mean_rank").alias("ra"),
    )
    b = seg.select(
        F.col("seg").alias("seg_b"),
        F.col("n").alias("nb"),
        F.col("mean_rank").alias("rb"),
    )
    pairs = a.join(b, F.col("seg_a") < F.col("seg_b")).crossJoin(
        F.broadcast(tot)
    )
    az = F.abs(F.col("ra") - F.col("rb")) / F.sqrt(
        (F.col("nn") * (F.col("nn") + 1) / 12.0)
        * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    )
    p = pairs.select("seg_a", "seg_b", az.alias("az"))
    t = 1 / (1 + 0.3275911 * F.col("az") / F.sqrt(F.lit(2.0)))
    pv = (
        0.254829592 * t
        - 0.284496736 * F.pow(t, 2)
        + 1.421413741 * F.pow(t, 3)
        - 1.453152027 * F.pow(t, 4)
        + 1.061405429 * F.pow(t, 5)
    ) * F.exp(-F.col("az") * F.col("az") / 2.0)
    p = p.withColumn("pv", pv)
    wr = Window.orderBy("pv", "seg_a", "seg_b")
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = p.select(
        "seg_a",
        "seg_b",
        "az",
        "pv",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wt).alias("m"),
    )
    kstar = ranked.withColumn(
        "k",
        F.max(
            F.when(
                F.col("pv") <= 0.05 * F.col("i") / F.col("m"), F.col("i")
            )
        ).over(wt),
    )
    return kstar.select(
        "seg_a",
        "seg_b",
        (F.round(F.col("az"), 4) + F.lit(0.0)).alias("abs_z"),
        (F.round(F.col("pv"), 6) + F.lit(0.0)).alias("p_value"),
        F.coalesce(F.col("i") <= F.col("k"), F.lit(False)).alias(
            "significant"
        ),
    )


# Exhaustive deterministic RANSAC line fit on the daily revenue
# series: every day PAIR proposes the line through its two points;
# the consensus score counts days within eps = 2 x MAD of residuals
# from theil_sen-style center... here a fixed eps = 50.0 value units.
# Winner = most inliers, ties -> smallest (i, j). O(days^2 x days)
# work on the calendar-bounded frame — the exhaustive version of
# sampling RANSAC, fully replayable. Slopes are exact-decimal ratios
# evaluated in double identically on both engines.
@register(
    "ransac_trend_q",
    """
    WITH daily AS (
        SELECT ROW_NUMBER() OVER (ORDER BY CAST(ts AS DATE)) AS t,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS y
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    cand AS (
        SELECT a.t AS i, b.t AS j,
               CAST(b.y - a.y AS DOUBLE) / (b.t - a.t) AS slope,
               CAST(a.y AS DOUBLE)
                   - CAST(b.y - a.y AS DOUBLE) / (b.t - a.t) * a.t
                   AS intercept
        FROM daily a JOIN daily b ON b.t > a.t
    ),
    scored AS (
        SELECT c.i, c.j, c.slope, c.intercept,
               SUM(CASE WHEN abs(CAST(d.y AS DOUBLE)
                        - (c.slope * d.t + c.intercept)) <= 50.0
                   THEN 1 ELSE 0 END) AS inliers
        FROM cand c JOIN daily d ON TRUE
        GROUP BY c.i, c.j, c.slope, c.intercept
    ),
    best AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY inliers DESC, i, j) AS rk
        FROM scored
    )
    SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
           CAST(ROUND(slope, 6) AS DOUBLE) + 0.0 AS slope,
           CAST(ROUND(intercept, 4) AS DOUBLE) + 0.0 AS intercept,
           CAST(inliers AS BIGINT) AS n_inliers
    FROM best WHERE rk = 1
    """,
)
def ransac_trend_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consensus line through daily revenue, immune to anomaly
    days that bend OLS — exhaustive over all day pairs, so no RNG and
    no iteration count to tune (theil_sen_q is the median-slope
    cousin; this one reports its supporting set size)."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    wday = Window.orderBy("day")
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(
            (
                F.sum(_dec(F.col("value"), 18, 6)).cast("double")
                / F.count(F.lit(1))
            )
            .cast("decimal(18,6)")
            .alias("y")
        )
        .select(F.row_number().over(wday).alias("t"), "y")
    )
    a = daily.select(F.col("t").alias("i"), F.col("y").alias("ya"))
    b = daily.select(F.col("t").alias("j"), F.col("y").alias("yb"))
    slope = (F.col("yb") - F.col("ya")).cast("double") / (
        F.col("j") - F.col("i")
    )
    cand = a.join(b, F.col("j") > F.col("i")).select(
        "i",
        "j",
        slope.alias("slope"),
        (F.col("ya").cast("double") - slope * F.col("i")).alias(
            "intercept"
        ),
    )
    scored = (
        cand.join(daily)
        .groupBy("i", "j", "slope", "intercept")
        .agg(
            F.sum(
                F.when(
                    F.abs(
                        F.col("y").cast("double")
                        - (F.col("slope") * F.col("t") + F.col("intercept"))
                    )
                    <= 50.0,
                    1,
                ).otherwise(0)
            ).alias("inliers")
        )
    )
    wbest = Window.orderBy(F.col("inliers").desc(), "i", "j")
    return (
        scored.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            (F.round(F.col("slope"), 6) + F.lit(0.0)).alias("slope"),
            (F.round(F.col("intercept"), 4) + F.lit(0.0)).alias(
                "intercept"
            ),
            F.col("inliers").cast("long").alias("n_inliers"),
        )
    )


# Bradley-Terry strengths for the five event types from daily-mean
# "matches" (type i beats type j on a day its mean value is higher):
# three unrolled MM iterations pi' = W_i / sum_j n_ij/(pi_i + pi_j)
# from a uniform start — every step a RATIONAL function of integer
# win counts (the fuzzy_cmeans_q determinism trick), normalized to
# sum 1 at the end. The win matrix is 5x5 metadata; iterations are
# scalar passes over it.
@register(
    "bradley_terry_q",
    """
    WITH dt AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events GROUP BY CAST(ts AS DATE), event_type
    ),
    games AS (
        SELECT a.event_type AS ti, b.event_type AS tj,
               SUM(CASE WHEN a.m > b.m THEN 1 ELSE 0 END) AS w
        FROM dt a JOIN dt b
            ON b.day = a.day AND a.event_type <> b.event_type
        GROUP BY a.event_type, b.event_type
    ),
    p0 AS (
        SELECT DISTINCT ti AS t, 1.0 AS pi FROM games
    ),
    it1 AS (
        SELECT g.ti AS t,
               SUM(g.w) / SUM((g.w + g2.w)
                   / (pa.pi + pb.pi)) AS pi
        FROM games g
        JOIN games g2 ON g2.ti = g.tj AND g2.tj = g.ti
        JOIN p0 pa ON pa.t = g.ti JOIN p0 pb ON pb.t = g.tj
        GROUP BY g.ti
    ),
    it2 AS (
        SELECT g.ti AS t,
               SUM(g.w) / SUM((g.w + g2.w)
                   / (pa.pi + pb.pi)) AS pi
        FROM games g
        JOIN games g2 ON g2.ti = g.tj AND g2.tj = g.ti
        JOIN it1 pa ON pa.t = g.ti JOIN it1 pb ON pb.t = g.tj
        GROUP BY g.ti
    ),
    it3 AS (
        SELECT g.ti AS t,
               SUM(g.w) / SUM((g.w + g2.w)
                   / (pa.pi + pb.pi)) AS pi
        FROM games g
        JOIN games g2 ON g2.ti = g.tj AND g2.tj = g.ti
        JOIN it2 pa ON pa.t = g.ti JOIN it2 pb ON pb.t = g.tj
        GROUP BY g.ti
    )
    SELECT t AS event_type,
           CAST(ROUND(pi / (SELECT SUM(pi) FROM it3), 6) AS DOUBLE)
               + 0.0 AS strength
    FROM it3
    """,
)
def bradley_terry_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which event type 'wins' the daily value contest once every
    pairing is accounted for? Paired-comparison strengths, MM-
    iterated; rational arithmetic end to end so the trajectory is
    engine-exact."""
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
    bb = dt.select(
        F.col("day").alias("db"),
        F.col("event_type").alias("tj"),
        F.col("m").alias("mb"),
    )
    games = (
        a.join(
            bb,
            (F.col("da") == F.col("db"))
            & (F.col("ti") != F.col("tj")),
        )
        .groupBy("ti", "tj")
        .agg(
            F.sum(
                F.when(F.col("ma") > F.col("mb"), 1).otherwise(0)
            ).alias("w")
        )
    )
    g2 = games.select(
        F.col("ti").alias("tj2"),
        F.col("tj").alias("ti2"),
        F.col("w").alias("w2"),
    )
    full = games.join(
        g2,
        (F.col("ti") == F.col("ti2")) & (F.col("tj") == F.col("tj2")),
    ).select("ti", "tj", "w", "w2")
    pi = full.select(F.col("ti").alias("t")).distinct().withColumn(
        "pi", F.lit(1.0)
    )
    for _ in range(3):
        pa = pi.select(F.col("t").alias("ti"), F.col("pi").alias("pa"))
        pb = pi.select(F.col("t").alias("tj"), F.col("pi").alias("pb"))
        pi = (
            full.join(F.broadcast(pa), "ti")
            .join(F.broadcast(pb), "tj")
            .groupBy(F.col("ti").alias("t"))
            .agg(
                (
                    F.sum("w")
                    / F.sum(
                        (F.col("w") + F.col("w2"))
                        / (F.col("pa") + F.col("pb"))
                    )
                ).alias("pi")
            )
        )
    tot = pi.agg(F.sum("pi").alias("s"))
    return pi.crossJoin(F.broadcast(tot)).select(
        F.col("t").alias("event_type"),
        (
            F.round(F.col("pi") / F.col("s"), 6) + F.lit(0.0)
        ).alias("strength"),
    )


# Geometric median of the 2-D embedding cloud (dims 1-2) by three
# unrolled Weiszfeld iterations from the coordinate mean:
# x' = sum(p_i / d_i) / sum(1 / d_i), d_i = euclidean distance to the
# current iterate. sqrt is IEEE-correctly-rounded, so — like
# fuzzy_cmeans_q's rational memberships — the whole trajectory is
# bit-identical across engines. Each iteration is one corpus pass with
# DECIMAL(28,12)-quantized weighted sums; the iterate is a broadcast
# 1-row frame.
@register(
    "geometric_median_q",
    """
    WITH p AS (
        SELECT CAST(embedding[1] AS DOUBLE) AS x,
               CAST(embedding[2] AS DOUBLE) AS y
        FROM embeddings
    ),
    c0 AS (
        SELECT CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
                   / COUNT(*) AS cx,
               CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE)
                   / COUNT(*) AS cy
        FROM p
    ),
    c1 AS (
        SELECT CAST(SUM(CAST(x / d AS DECIMAL(28,12))) AS DOUBLE)
               / CAST(SUM(CAST(1 / d AS DECIMAL(28,12))) AS DOUBLE)
                   AS cx,
               CAST(SUM(CAST(y / d AS DECIMAL(28,12))) AS DOUBLE)
               / CAST(SUM(CAST(1 / d AS DECIMAL(28,12))) AS DOUBLE)
                   AS cy
        FROM (SELECT x, y,
                     sqrt((x - (SELECT cx FROM c0))
                          * (x - (SELECT cx FROM c0))
                          + (y - (SELECT cy FROM c0))
                            * (y - (SELECT cy FROM c0))) AS d
              FROM p) WHERE d > 0
    ),
    c2 AS (
        SELECT CAST(SUM(CAST(x / d AS DECIMAL(28,12))) AS DOUBLE)
               / CAST(SUM(CAST(1 / d AS DECIMAL(28,12))) AS DOUBLE)
                   AS cx,
               CAST(SUM(CAST(y / d AS DECIMAL(28,12))) AS DOUBLE)
               / CAST(SUM(CAST(1 / d AS DECIMAL(28,12))) AS DOUBLE)
                   AS cy
        FROM (SELECT x, y,
                     sqrt((x - (SELECT cx FROM c1))
                          * (x - (SELECT cx FROM c1))
                          + (y - (SELECT cy FROM c1))
                            * (y - (SELECT cy FROM c1))) AS d
              FROM p) WHERE d > 0
    ),
    c3 AS (
        SELECT CAST(SUM(CAST(x / d AS DECIMAL(28,12))) AS DOUBLE)
               / CAST(SUM(CAST(1 / d AS DECIMAL(28,12))) AS DOUBLE)
                   AS cx,
               CAST(SUM(CAST(y / d AS DECIMAL(28,12))) AS DOUBLE)
               / CAST(SUM(CAST(1 / d AS DECIMAL(28,12))) AS DOUBLE)
                   AS cy
        FROM (SELECT x, y,
                     sqrt((x - (SELECT cx FROM c2))
                          * (x - (SELECT cx FROM c2))
                          + (y - (SELECT cy FROM c2))
                            * (y - (SELECT cy FROM c2))) AS d
              FROM p) WHERE d > 0
    )
    SELECT CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_points,
           CAST(ROUND(cx, 6) AS DOUBLE) + 0.0 AS median_x,
           CAST(ROUND(cy, 6) AS DOUBLE) + 0.0 AS median_y
    FROM c3
    """,
)
def geometric_median_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The L1-optimal center of the embedding cloud — the robust
    anchor centroid_drift_q should diff against when outliers poison
    the mean. Points exactly AT the iterate are dropped from that
    step's weights (the standard Weiszfeld guard), identically in
    both engines."""
    emb = Catalog(spark, sf_dir).embeddings
    p = emb.select(
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    cent = p.agg(
        (
            F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cx"),
        (
            F.sum(F.col("y").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cy"),
    )
    for _ in range(3):
        j = p.crossJoin(F.broadcast(cent))
        d = F.sqrt(
            (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))
            + (F.col("y") - F.col("cy")) * (F.col("y") - F.col("cy"))
        )
        wj = j.withColumn("d", d).filter(F.col("d") > 0)
        cent = wj.agg(
            (
                F.sum((F.col("x") / F.col("d")).cast("decimal(28,12)"))
                .cast("double")
                / F.sum(
                    (F.lit(1) / F.col("d")).cast("decimal(28,12)")
                ).cast("double")
            ).alias("cx"),
            (
                F.sum((F.col("y") / F.col("d")).cast("decimal(28,12)"))
                .cast("double")
                / F.sum(
                    (F.lit(1) / F.col("d")).cast("decimal(28,12)")
                ).cast("double")
            ).alias("cy"),
        )
    n = p.agg(F.count(F.lit(1)).alias("n_points"))
    return cent.crossJoin(F.broadcast(n)).select(
        F.col("n_points").cast("long").alias("n_points"),
        (F.round(F.col("cx"), 6) + F.lit(0.0)).alias("median_x"),
        (F.round(F.col("cy"), 6) + F.lit(0.0)).alias("median_y"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 6: OLS influence diagnostics, Box-Cox
# transform selection, the Youden-J operating point, expected
# calibration error on integer-keyed bins, and the Lorenz curve.
# ---------------------------------------------------------------------------


# Influence diagnostics for the daily-revenue-vs-time OLS: leverage
# h_i = 1/n + (t - tbar)^2 / Sxx, internally studentized residual
# r_i = e_i / (s sqrt(1 - h_i)), Cook's D = r_i^2 h_i / (2 (1 - h_i)).
# Fit moments come from DECIMAL-quantized sums; the per-day
# diagnostics are window-free arithmetic against the broadcast fit.
# Flags days with D > 4/n — the standard screening cut.
@register(
    "regression_diagnostics_q",
    """
    WITH daily AS (
        SELECT ROW_NUMBER() OVER (ORDER BY CAST(ts AS DATE)) AS t,
               CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS y
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    m AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(t) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(CAST(t AS BIGINT) * t) AS DOUBLE) AS sxx,
               CAST(SUM(t * y) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(y AS DECIMAL(16,6))
                        * CAST(y AS DECIMAL(16,6))) AS DOUBLE) AS syy
        FROM daily
    ),
    fit AS (
        SELECT n,
               (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b,
               sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n)
                   * sx / n AS a,
               sxx - sx * sx / n AS cxx, sx / n AS xbar,
               ((syy - sy * sy / n)
                - (sxy - sx * sy / n) * (sxy - sx * sy / n)
                  / (sxx - sx * sx / n)) / (n - 2) AS s2
        FROM m
    ),
    diag AS (
        SELECT d.day, d.t,
               CAST(d.y AS DOUBLE) - (fit.a + fit.b * d.t) AS e,
               1.0 / fit.n + (d.t - fit.xbar) * (d.t - fit.xbar)
                   / fit.cxx AS h,
               fit.s2, fit.n
        FROM daily d, fit
    )
    SELECT day,
           CAST(ROUND(e, 4) AS DOUBLE) + 0.0 AS residual,
           CAST(ROUND(h, 6) AS DOUBLE) + 0.0 AS leverage,
           CAST(ROUND(e / sqrt(s2 * (1 - h)), 4) AS DOUBLE) + 0.0
               AS studentized,
           CAST(ROUND((e / sqrt(s2 * (1 - h)))
                * (e / sqrt(s2 * (1 - h))) * h / (2 * (1 - h)), 6)
               AS DOUBLE) + 0.0 AS cooks_d,
           (e / sqrt(s2 * (1 - h))) * (e / sqrt(s2 * (1 - h)))
               * h / (2 * (1 - h)) > 4.0 / n AS influential
    FROM diag
    """,
)
def regression_diagnostics_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHICH days drive the fitted trend — the leverage/Cook's D sheet
    that should accompany any slope claim from theil_sen_q or
    trend_break_q."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    wday = Window.orderBy("day")
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(
            (
                F.sum(_dec(F.col("value"), 18, 6)).cast("double")
                / F.count(F.lit(1))
            )
            .cast("decimal(18,6)")
            .alias("y")
        )
        .withColumn("t", F.row_number().over(wday))
    )
    m = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("t").cast("long") * F.col("t"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("t") * F.col("y")).cast("double").alias("sxy"),
        F.sum(
            F.col("y").cast("decimal(16,6)")
            * F.col("y").cast("decimal(16,6)")
        )
        .cast("double")
        .alias("syy"),
    )
    n = F.col("n")
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / n
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    fit = m.select(
        "n",
        (cxy / cxx).alias("b"),
        (F.col("sy") / n - cxy / cxx * F.col("sx") / n).alias("a"),
        cxx.alias("cxx"),
        (F.col("sx") / n).alias("xbar"),
        ((cyy - cxy * cxy / cxx) / (n - 2)).alias("s2"),
    )
    diag = daily.crossJoin(F.broadcast(fit)).select(
        "day",
        (
            F.col("y").cast("double")
            - (F.col("a") + F.col("b") * F.col("t"))
        ).alias("e"),
        (
            1.0 / F.col("n")
            + (F.col("t") - F.col("xbar"))
            * (F.col("t") - F.col("xbar"))
            / F.col("cxx")
        ).alias("h"),
        "s2",
        "n",
    )
    stud = F.col("e") / F.sqrt(F.col("s2") * (1 - F.col("h")))
    cd = stud * stud * F.col("h") / (2 * (1 - F.col("h")))
    return diag.select(
        "day",
        (F.round(F.col("e"), 4) + F.lit(0.0)).alias("residual"),
        (F.round(F.col("h"), 6) + F.lit(0.0)).alias("leverage"),
        (F.round(stud, 4) + F.lit(0.0)).alias("studentized"),
        (F.round(cd, 6) + F.lit(0.0)).alias("cooks_d"),
        (cd > 4.0 / F.col("n")).alias("influential"),
    )


# Box-Cox lambda selection for order prices by profile log-likelihood
# over the standard grid {-1, -0.5, 0, 0.5, 1}: LL(lambda) =
# -n/2 ln(var(y_lambda)) + (lambda - 1) sum(ln x). Per-lambda moments
# come from one corpus pass fanned out over the 5-row grid; the
# transform and variance are the accepted per-row float class
# (pow/ln), with DECIMAL-quantized sums.
@register(
    "boxcox_q",
    """
    WITH x AS (SELECT o_totalprice AS v FROM orders),
    lam AS (SELECT CAST(unnest([-1.0, -0.5, 0.0, 0.5, 1.0]) AS DOUBLE) AS l),
    t AS (
        SELECT lam.l, x.v,
               CASE WHEN lam.l = 0 THEN ln(x.v)
                    ELSE (pow(x.v, lam.l) - 1) / lam.l END AS y
        FROM x CROSS JOIN lam
    ),
    m AS (
        SELECT l, COUNT(*) AS n,
               CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE)
                   AS syy,
               CAST(SUM(CAST(ln(v) AS DECIMAL(28,12))) AS DOUBLE)
                   AS slnx
        FROM t GROUP BY l
    ),
    ll AS (
        SELECT l, n,
               -n / 2.0 * ln((syy - sy * sy / n) / n)
                   + (l - 1) * slnx AS loglik
        FROM m
    )
    SELECT l AS lambda,
           CAST(ROUND(loglik, 2) AS DOUBLE) + 0.0 AS profile_ll,
           loglik = (SELECT MAX(loglik) FROM ll) AS is_best
    FROM ll
    """,
)
def boxcox_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which power transform makes order prices most Gaussian? The
    winsorize/log decision (winsorize_prices, lang of skew_profile)
    made principled: profile likelihood over the canonical grid."""
    o = Catalog(spark, sf_dir).orders.select(
        F.col("o_totalprice").alias("v")
    )
    lam = metadata_df(o.sparkSession,
        [(-1.0,), (-0.5,), (0.0,), (0.5,), (1.0,)], "l double"
    )
    t = o.crossJoin(F.broadcast(lam)).select(
        "l",
        "v",
        F.when(F.col("l") == 0, F.log("v"))
        .otherwise((F.pow(F.col("v"), F.col("l")) - 1) / F.col("l"))
        .alias("y"),
    )
    m = t.groupBy("l").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("decimal(28,12)"))
        .cast("double")
        .alias("sy"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,12)"))
        .cast("double")
        .alias("syy"),
        F.sum(F.log("v").cast("decimal(28,12)"))
        .cast("double")
        .alias("slnx"),
    )
    n = F.col("n")
    ll = m.select(
        "l",
        (
            -n / 2.0
            * F.log((F.col("syy") - F.col("sy") * F.col("sy") / n) / n)
            + (F.col("l") - 1) * F.col("slnx")
        ).alias("loglik"),
    )
    mx = ll.agg(F.max("loglik").alias("best"))
    return ll.crossJoin(F.broadcast(mx)).select(
        F.col("l").alias("lambda"),
        (F.round(F.col("loglik"), 2) + F.lit(0.0)).alias("profile_ll"),
        (F.col("loglik") == F.col("best")).alias("is_best"),
    )


# Youden-J optimal operating point for the roc_auc_q scorer: over the
# per-distinct-score ROC table, J(s) = TPR(s) - FPR(s) for the rule
# "predict positive when score >= s"; the report row is the
# J-maximizing threshold (ties -> smallest threshold). Same grouped-
# counts scale shape as roc_auc_q — windows run over the SCORE table.
@register(
    "youden_j_q",
    f"""
    WITH scored AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               ROUND(CAST(list_sum(list_transform(t, x -> length(x)))
                          AS DOUBLE) / len(t), 4) AS s
        FROM (SELECT lang, {_SQL_TOKENS} AS t FROM documents)
        WHERE len(t) > 0
    ),
    per_score AS (
        SELECT s, SUM(y) AS np, SUM(1 - y) AS nn
        FROM scored GROUP BY s
    ),
    c AS (
        SELECT s,
               SUM(np) OVER (ORDER BY s DESC) AS tp,
               SUM(nn) OVER (ORDER BY s DESC) AS fp,
               SUM(np) OVER () AS p_tot, SUM(nn) OVER () AS n_tot
        FROM per_score
    ),
    j AS (
        SELECT s,
               CAST(tp AS DOUBLE) / p_tot AS tpr,
               CAST(fp AS DOUBLE) / n_tot AS fpr,
               CAST(tp AS DOUBLE) / p_tot - CAST(fp AS DOUBLE) / n_tot
                   AS youden,
               ROW_NUMBER() OVER (ORDER BY
                   CAST(tp AS DOUBLE) / p_tot
                   - CAST(fp AS DOUBLE) / n_tot DESC, s) AS rk
        FROM c
    )
    SELECT s AS threshold,
           CAST(ROUND(tpr, 6) AS DOUBLE) + 0.0 AS tpr,
           CAST(ROUND(fpr, 6) AS DOUBLE) + 0.0 AS fpr,
           CAST(ROUND(youden, 6) AS DOUBLE) + 0.0 AS youden_j
    FROM j WHERE rk = 1
    """,
)
def youden_j_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE to cut the score once roc_auc_q says it ranks well —
    the sensitivity+specificity-maximizing threshold."""
    d = Catalog(spark, sf_dir).documents
    t = _tokens("text")
    scored = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.round(
            F.aggregate(
                t, F.lit(0), lambda a, x: a + F.length(x)
            ).cast("double")
            / F.size(t),
            4,
        ).alias("s"),
    ).filter(F.size(t) > 0)
    per_score = scored.groupBy("s").agg(
        F.sum("y").alias("np"), F.sum(1 - F.col("y")).alias("nn")
    )
    wc = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = per_score.select(
        "s",
        F.sum("np").over(wc).alias("tp"),
        F.sum("nn").over(wc).alias("fp"),
        F.sum("np").over(wt).alias("p_tot"),
        F.sum("nn").over(wt).alias("n_tot"),
    )
    tpr = F.col("tp").cast("double") / F.col("p_tot")
    fpr = F.col("fp").cast("double") / F.col("n_tot")
    wj = Window.orderBy((tpr - fpr).desc(), F.col("s"))
    j = c.select(
        "s",
        tpr.alias("tpr"),
        fpr.alias("fpr"),
        (tpr - fpr).alias("youden"),
        F.row_number().over(wj).alias("rk"),
    )
    return j.filter(F.col("rk") == 1).select(
        F.col("s").alias("threshold"),
        (F.round(F.col("tpr"), 6) + F.lit(0.0)).alias("tpr"),
        (F.round(F.col("fpr"), 6) + F.lit(0.0)).alias("fpr"),
        (F.round(F.col("youden"), 6) + F.lit(0.0)).alias("youden_j"),
    )


# Expected calibration error (10 equal-width bins over [0, 1]) for
# the score/10 forecast: ECE = sum_k n_k/n |acc_k - conf_k|, with bin
# keys from PURE INTEGER arithmetic (isotonic_calibration_q's lesson:
# never key bins on a rounded double). conf_k averages the exact
# integer 1000p values; the only floats are the final ratios.
@register(
    "ece_q",
    f"""
    WITH scored AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               100 * list_sum(list_transform(t, x -> length(x)))
                   // len(t) AS p_mil
        FROM (SELECT lang, {_SQL_TOKENS} AS t FROM documents)
        WHERE len(t) > 0
    ),
    b AS (
        SELECT least(p_mil // 100, 9) AS bin,
               COUNT(*) AS n_k, SUM(y) AS pos_k,
               SUM(p_mil) AS conf_sum
        FROM scored GROUP BY 1
    ),
    tot AS (SELECT SUM(n_k) AS n FROM b)
    SELECT CAST((SELECT n FROM tot) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(ROUND(SUM(CAST(n_k AS DOUBLE) / (SELECT n FROM tot)
               * abs(CAST(pos_k AS DOUBLE) / n_k
                     - CAST(conf_sum AS DOUBLE) / n_k / 1000)), 6)
               AS DOUBLE) + 0.0 AS ece
    FROM b
    """,
)
def ece_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-number calibration score modern model cards quote —
    complements brier_decomposition_q (which decomposes the same gap)
    and isotonic_calibration_q (which repairs it)."""
    d = Catalog(spark, sf_dir).documents
    t = _tokens("text")
    p_mil = (
        (
            100
            * F.aggregate(
                t, F.lit(0), lambda a, x: a + F.length(x)
            ).cast("long")
        )
        / F.size(t)
    ).cast("long")
    scored = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        p_mil.alias("p_mil"),
    ).filter(F.size(t) > 0)
    b = scored.groupBy(
        F.least(F.expr("p_mil div 100"), F.lit(9)).alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n_k"),
        F.sum("y").alias("pos_k"),
        F.sum("p_mil").alias("conf_sum"),
    )
    tot = b.agg(F.sum("n_k").alias("n"))
    term = (
        F.col("n_k").cast("double")
        / F.col("n")
        * F.abs(
            F.col("pos_k").cast("double") / F.col("n_k")
            - F.col("conf_sum").cast("double") / F.col("n_k") / 1000
        )
    )
    return b.crossJoin(F.broadcast(tot)).agg(
        F.max("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        (F.round(F.sum(term), 6) + F.lit(0.0)).alias("ece"),
    )


# Lorenz curve of customer account balance (shifted to nonnegative by
# the global minimum so shares are well-defined): per population
# decile from global_ntile, the cumulative share of total shifted
# balance — gini_q's curve, point by point. Decile cuts and cumulative
# shares are exact integer/decimal arithmetic.
@register(
    "lorenz_curve_q",
    """
    WITH mn AS (
        SELECT CAST(MIN(c_acctbal) AS DECIMAL(18,6)) AS lo
        FROM customer
    ),
    v AS (
        SELECT c_custkey,
               CAST(c_acctbal AS DECIMAL(18,6)) - (SELECT lo FROM mn)
                   AS w
        FROM customer
    ),
    tiled AS (
        SELECT w, NTILE(10) OVER (ORDER BY w, c_custkey) AS decile
        FROM v
    ),
    d AS (
        SELECT decile, COUNT(*) AS n, SUM(w) AS s
        FROM tiled GROUP BY decile
    )
    SELECT decile,
           CAST(n AS BIGINT) AS n_customers,
           CAST(ROUND(CAST(SUM(s) OVER (ORDER BY decile) AS DOUBLE)
               / (SELECT CAST(SUM(w) AS DOUBLE) FROM v), 6) AS DOUBLE)
               AS cum_share
    FROM d
    """,
)
def lorenz_curve_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inequality curve behind gini_q/theil_index_q's scalars:
    cumulative share of (shifted) balance held by the bottom k
    deciles. Deciles come from the range-partitioned global_ntile."""
    from iniz_exporters_spark.operators.indexing import global_ntile

    c = Catalog(spark, sf_dir).customer
    mn = c.agg(
        F.min("c_acctbal").cast("decimal(18,6)").alias("lo")
    )
    v = c.crossJoin(F.broadcast(mn)).select(
        "c_custkey",
        (_dec(F.col("c_acctbal"), 18, 6) - F.col("lo")).alias("w"),
    )
    tiled = global_ntile(
        v, [F.col("w").asc(), F.col("c_custkey").asc()], 10, "decile"
    )
    d = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("s")
    )
    tot = v.agg(F.sum("w").cast("double").alias("tw"))
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return d.crossJoin(F.broadcast(tot)).select(
        "decile",
        F.col("n").cast("long").alias("n_customers"),
        F.round(
            F.sum("s").over(wcum).cast("double") / F.col("tw"), 6
        ).alias("cum_share"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 6 (continued): offline policy evaluation by
# replay, entropic optimal transport (Sinkhorn), per-edge triangle
# support (the k-truss building block), the mutual-kNN graph quality
# read, and PACF via the Durbin-Levinson recursion on acf_q's moments.
# ---------------------------------------------------------------------------


# Offline bandit replay: the greedy policy "play the event type with
# the best running mean so far" is evaluated against the uniform
# logging policy, day by day. For each day, the policy's arm is the
# argmax of PRIOR days' cumulative mean (ties -> alphabetical arm;
# day 1 has no history and is skipped); its reward is that day's
# realized mean for the chosen arm. Reports the replay estimate and
# the uniform baseline. Running means are exact-decimal ratios over
# the calendar-bounded (day x arm) frame.
@register(
    "bandit_replay_q",
    """
    WITH dt AS (
        SELECT CAST(ts AS DATE) AS day, event_type AS arm,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) AS r
        FROM events GROUP BY CAST(ts AS DATE), event_type
    ),
    hist AS (
        SELECT day, arm, r,
               SUM(r) OVER (PARTITION BY arm ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prior_sum,
               COUNT(r) OVER (PARTITION BY arm ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prior_n
        FROM dt
    ),
    choice AS (
        SELECT day, arm, r,
               ROW_NUMBER() OVER (PARTITION BY day
                   ORDER BY prior_sum / prior_n DESC, arm) AS rk
        FROM hist WHERE prior_n > 0
    )
    SELECT CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_days_played,
           CAST(ROUND(CAST(SUM(CASE WHEN rk = 1 THEN CAST(r
                AS DECIMAL(18,6)) END) AS DOUBLE)
               / SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END), 6)
               AS DOUBLE) + 0.0 AS greedy_value,
           CAST(ROUND(CAST(SUM(CAST(r AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*), 6) AS DOUBLE) + 0.0 AS uniform_value
    FROM choice
    """,
)
def bandit_replay_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Would greedy arm selection have beaten uniform logging? The
    replay estimator over the daily arm-reward table; uniform_value
    averages ALL arms' rewards on the played days (what the logger
    collected), greedy_value only the chosen arm's."""
    e = Catalog(spark, sf_dir).events
    dt = e.groupBy(
        F.to_date("ts").alias("day"), F.col("event_type").alias("arm")
    ).agg(
        (
            F.sum(_dec(F.col("value"), 18, 6)).cast("double")
            / F.count(F.lit(1))
        ).alias("r")
    )
    wprior = (
        Window.partitionBy("arm")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist = dt.select(
        "day",
        "arm",
        "r",
        F.sum("r").over(wprior).alias("prior_sum"),
        F.count("r").over(wprior).alias("prior_n"),
    ).filter(F.col("prior_n") > 0)
    wday = Window.partitionBy("day").orderBy(
        (F.col("prior_sum") / F.col("prior_n")).desc(), F.col("arm")
    )
    choice = hist.withColumn("rk", F.row_number().over(wday))
    is_pick = F.when(F.col("rk") == 1, 1).otherwise(0)
    return choice.agg(
        F.sum(is_pick).cast("long").alias("n_days_played"),
        (
            F.round(
                F.sum(
                    F.when(
                        F.col("rk") == 1,
                        F.col("r").cast("decimal(18,6)"),
                    )
                ).cast("double")
                / F.sum(is_pick),
                6,
            )
            + F.lit(0.0)
        ).alias("greedy_value"),
        (
            F.round(
                F.sum(F.col("r").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            )
            + F.lit(0.0)
        ).alias("uniform_value"),
    )


# Entropic optimal transport between the label distributions of the
# two embedding cohorts (vec_id parity), three unrolled Sinkhorn
# scalings: cost = squared distance between per-(cohort, label)
# centroids, kernel K = exp(-cost / 0.5), u/v updated alternately
# from the marginals. Everything after ONE corpus pass (centroids +
# masses) is arithmetic on the 10 x 10 label matrix; exp is the
# accepted per-cell float class (100 cells, not per-row).
@register(
    "sinkhorn_plan_q",
    """
    WITH e AS (
        SELECT vec_id % 2 AS grp, label,
               CAST(embedding[1] AS DOUBLE) AS x,
               CAST(embedding[2] AS DOUBLE) AS y
        FROM embeddings
    ),
    cent AS (
        SELECT grp, label, COUNT(*) AS n,
               CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
                   / COUNT(*) AS cx,
               CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE)
                   / COUNT(*) AS cy
        FROM e GROUP BY grp, label
    ),
    mass AS (
        SELECT grp, label,
               CAST(n AS DOUBLE)
                   / SUM(n) OVER (PARTITION BY grp) AS m
        FROM cent
    ),
    kmat AS (
        SELECT a.label AS la, b.label AS lb,
               exp(-((a.cx - b.cx) * (a.cx - b.cx)
                     + (a.cy - b.cy) * (a.cy - b.cy)) / 0.5) AS kv,
               ma.m AS mu, mb.m AS nu
        FROM cent a JOIN cent b ON a.grp = 0 AND b.grp = 1
        JOIN mass ma ON ma.grp = 0 AND ma.label = a.label
        JOIN mass mb ON mb.grp = 1 AND mb.label = b.label
    ),
    u1 AS (
        SELECT la, MAX(mu) / SUM(kv * 1.0) AS u FROM kmat GROUP BY la
    ),
    v1 AS (
        SELECT lb, MAX(nu) / SUM(kv * u1.u) AS v
        FROM kmat JOIN u1 USING (la) GROUP BY lb
    ),
    u2 AS (
        SELECT la, MAX(mu) / SUM(kv * v1.v) AS u
        FROM kmat JOIN v1 USING (lb) GROUP BY la
    ),
    v2 AS (
        SELECT lb, MAX(nu) / SUM(kv * u2.u) AS v
        FROM kmat JOIN u2 USING (la) GROUP BY lb
    ),
    u3 AS (
        SELECT la, MAX(mu) / SUM(kv * v2.v) AS u
        FROM kmat JOIN v2 USING (lb) GROUP BY la
    ),
    v3 AS (
        SELECT lb, MAX(nu) / SUM(kv * u3.u) AS v
        FROM kmat JOIN u3 USING (la) GROUP BY lb
    ),
    plan AS (
        SELECT k.la, k.lb, u3.u * k.kv * v3.v AS p
        FROM kmat k JOIN u3 USING (la) JOIN v3 USING (lb)
    )
    SELECT CAST(la AS BIGINT) AS label_from,
           CAST(lb AS BIGINT) AS label_to,
           CAST(ROUND(p, 6) AS DOUBLE) + 0.0 AS mass
    FROM plan WHERE ROUND(p, 6) > 0
    """,
)
def sinkhorn_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How must cohort-0's label mass flow to look like cohort-1's,
    moving cheaply in embedding space? Three Sinkhorn scalings on the
    10x10 centroid-cost kernel; only entries above 1e-6 ship."""
    emb = Catalog(spark, sf_dir).embeddings
    e = emb.select(
        (F.col("vec_id") % 2).alias("grp"),
        "label",
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    cent = e.groupBy("grp", "label").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cx"),
        (
            F.sum(F.col("y").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cy"),
    )
    wg = Window.partitionBy("grp")
    mass = cent.select(
        "grp",
        "label",
        (F.col("n").cast("double") / F.sum("n").over(wg)).alias("m"),
    )
    a = (
        cent.filter(F.col("grp") == 0)
        .join(
            mass.filter(F.col("grp") == 0).select(
                F.col("label").alias("label"), F.col("m").alias("mu")
            ),
            "label",
        )
        .select(
            F.col("label").alias("la"),
            F.col("cx").alias("ax"),
            F.col("cy").alias("ay"),
            "mu",
        )
    )
    b = (
        cent.filter(F.col("grp") == 1)
        .join(
            mass.filter(F.col("grp") == 1).select(
                F.col("label").alias("label"), F.col("m").alias("nu")
            ),
            "label",
        )
        .select(
            F.col("label").alias("lb"),
            F.col("cx").alias("bx"),
            F.col("cy").alias("by"),
            "nu",
        )
    )
    kmat = a.crossJoin(b).select(
        "la",
        "lb",
        "mu",
        "nu",
        F.exp(
            -(
                (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
                + (F.col("ay") - F.col("by"))
                * (F.col("ay") - F.col("by"))
            )
            / 0.5
        ).alias("kv"),
    )
    u = kmat.groupBy("la").agg(
        (F.max("mu") / F.sum(F.col("kv") * 1.0)).alias("u")
    )

    def v_step(u_df):
        return (
            kmat.join(F.broadcast(u_df), "la")
            .groupBy("lb")
            .agg(
                (F.max("nu") / F.sum(F.col("kv") * F.col("u"))).alias(
                    "v"
                )
            )
        )

    def u_step(v_df):
        return (
            kmat.join(F.broadcast(v_df), "lb")
            .groupBy("la")
            .agg(
                (F.max("mu") / F.sum(F.col("kv") * F.col("v"))).alias(
                    "u"
                )
            )
        )

    # exactly the oracle's schedule: u1 -> v1 -> u2 -> v2 -> u3 -> v3,
    # plan = u3 (x) K (x) v3 — one extra half-step would only agree by
    # convergence luck
    for _ in range(2):
        u = u_step(v_step(u))
    v = v_step(u)
    plan = (
        kmat.join(F.broadcast(u), "la")
        .join(F.broadcast(v), "lb")
        .select(
            "la",
            "lb",
            (F.col("u") * F.col("kv") * F.col("v")).alias("p"),
        )
    )
    return plan.filter(F.round(F.col("p"), 6) > 0).select(
        F.col("la").cast("long").alias("label_from"),
        F.col("lb").cast("long").alias("label_to"),
        (F.round(F.col("p"), 6) + F.lit(0.0)).alias("mass"),
    )


# Per-edge triangle support on the part co-purchase graph (parts
# sharing >= 2 orders, to keep the graph sparse): support(u,v) =
# |N(u) n N(v)|, the quantity k-truss peeling iterates on; edges with
# support >= 1 are the 3-truss. Candidate edges and common-neighbor
# counts both come from order-key joins (never all-pairs); the
# wedge-join fans out per shared neighbor, bounded by degree.
@register(
    "edge_support_q",
    """
    WITH op AS (
        SELECT DISTINCT l.l_orderkey AS o, l.l_partkey AS p
        FROM lineitem l
    ),
    edges AS (
        SELECT a.p AS u, b.p AS v
        FROM op a JOIN op b ON b.o = a.o AND a.p < b.p
        GROUP BY a.p, b.p HAVING COUNT(*) >= 2
    ),
    und AS (
        SELECT u, v FROM edges
        UNION ALL SELECT v, u FROM edges
    ),
    support AS (
        SELECT e.u, e.v, COUNT(w2.v) AS sup
        FROM edges e
        LEFT JOIN und w1 ON w1.u = e.u
        LEFT JOIN und w2 ON w2.u = e.v AND w2.v = w1.v
        GROUP BY e.u, e.v
    )
    SELECT CAST(sup AS BIGINT) AS support,
           CAST(COUNT(*) AS BIGINT) AS n_edges,
           sup >= 1 AS in_3truss
    FROM support GROUP BY sup
    """,
)
def edge_support_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How embedded is each co-purchase tie? The support histogram is
    the first k-truss peeling round — support 0 edges are bridges no
    community algorithm should keep (clustering_coeff_q gives the
    node-level view of the same wedges)."""
    li = Catalog(spark, sf_dir).lineitem
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a = op.select("o", F.col("p").alias("u"))
    b = op.select(F.col("o").alias("o2"), F.col("p").alias("v"))
    edges = (
        a.join(b, (F.col("o") == F.col("o2")) & (F.col("u") < F.col("v")))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("u", "v")
    )
    und = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    w1 = und.select(F.col("u").alias("eu"), F.col("v").alias("n1"))
    w2 = und.select(F.col("u").alias("ev"), F.col("v").alias("n2"))
    support = (
        edges.join(w1, edges["u"] == w1["eu"], "left")
        .join(
            w2,
            (edges["v"] == w2["ev"]) & (F.col("n2") == F.col("n1")),
            "left",
        )
        .groupBy("u", "v")
        .agg(F.count("n2").alias("sup"))
    )
    return support.groupBy(
        F.col("sup").cast("long").alias("support")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.first(F.col("sup") >= 1).alias("in_3truss"),
    )


# Mutual-kNN graph statistics over the embeddings: an edge (a, b) is
# MUTUAL when each is in the other's 5-NN; the mutual rate and degree
# histogram are the standard symmetrization-quality read before
# building a kNN graph for clustering. Reuses the parallelized
# hubness pair stage at test scale; the mutual check is a self-join
# of the directed top-5 list on the reversed pair.
@register(
    "mutual_knn_q",
    """
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS qid, c.vec_id AS cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ROUND(list_reduce(
                       list_transform(range(1, len(c.v)+1),
                           i -> (c.v[i] - q.v[i]) * (c.v[i] - q.v[i])),
                       (x, y) -> x + y), 6), c.vec_id) AS rn
        FROM e q JOIN e c ON c.vec_id <> q.vec_id
    ),
    knn AS (SELECT qid, cid FROM scored WHERE rn <= 5),
    mutual AS (
        SELECT a.qid AS u, a.cid AS v
        FROM knn a JOIN knn b ON b.qid = a.cid AND b.cid = a.qid
        WHERE a.qid < a.cid
    ),
    deg AS (
        SELECT node, COUNT(*) AS d FROM (
            SELECT u AS node FROM mutual
            UNION ALL SELECT v FROM mutual
        ) GROUP BY node
    )
    SELECT CAST((SELECT COUNT(*) FROM mutual) AS BIGINT)
               AS n_mutual_edges,
           CAST(ROUND(2.0 * (SELECT COUNT(*) FROM mutual)
               / (SELECT COUNT(*) FROM knn), 6) AS DOUBLE)
               AS mutual_rate,
           CAST((SELECT COUNT(*) FROM deg) AS BIGINT)
               AS n_connected_points,
           CAST((SELECT MAX(d) FROM deg) AS BIGINT) AS max_degree
    """,
)
def mutual_knn_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How symmetric is the 5-NN relation? Low mutual_rate = hub
    pollution (hubness_q quantifies the culprit); the mutual graph is
    what robust kNN clustering should run on."""
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
    e = e.repartition(
        spark.sparkContext.defaultParallelism, F.col("vec_id")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", F.col("vec_id").alias("cid"), d2.alias("d2")
        )
    )
    w = Window.partitionBy("qid").orderBy("d2", "cid")
    knn = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("qid", "cid")
    )
    rev = knn.select(
        F.col("qid").alias("cid2"), F.col("cid").alias("qid2")
    )
    mutual = knn.join(
        rev,
        (knn["qid"] == F.col("qid2")) & (knn["cid"] == F.col("cid2")),
    ).filter(F.col("qid") < F.col("cid"))
    deg = (
        mutual.select(F.col("qid").alias("node"))
        .unionByName(mutual.select(F.col("cid").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    nm = mutual.agg(F.count(F.lit(1)).alias("nm"))
    nk = knn.agg(F.count(F.lit(1)).alias("nk"))
    dd = deg.agg(
        F.count(F.lit(1)).alias("np"), F.max("d").alias("md")
    )
    return (
        nm.crossJoin(F.broadcast(nk))
        .crossJoin(F.broadcast(dd))
        .select(
            F.col("nm").cast("long").alias("n_mutual_edges"),
            F.round(2.0 * F.col("nm") / F.col("nk"), 6).alias(
                "mutual_rate"
            ),
            F.col("np").cast("long").alias("n_connected_points"),
            F.col("md").cast("long").alias("max_degree"),
        )
    )
