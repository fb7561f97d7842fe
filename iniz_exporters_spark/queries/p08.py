"""Registry chunk 8/9: 35 @register entries (pacf_q .. oaxaca_blinder_q).

Mechanical split of the original queries.py (lines 25494-29192); statement order
and registration order are unchanged. See queries/__init__.py."""
from iniz_exporters_spark.catalog import Catalog
from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F
from iniz_exporters_spark.queries._base import _dec, register
from iniz_exporters_spark.functions.text import tokens as _tokens
from iniz_exporters_spark.queries.p01 import _SQL_TOKENS
from iniz_exporters_spark.queries.p03 import _dsum
from iniz_exporters_spark.session import metadata_df



# Partial autocorrelation at lags 1-3 via the Durbin-Levinson
# recursion on acf_q's sample autocorrelations: phi11 = r1,
# phi22 = (r2 - r1^2)/(1 - r1^2), phi33 from the order-2 forward
# coefficients — pure scalar arithmetic on three decimal-exact ACF
# values, spelled identically in both engines.
@register(
    "pacf_q",
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
            AS ybar
        FROM daily
    ),
    dev AS (
        SELECT day, CAST(m - (SELECT ybar FROM mu) AS DECIMAL(16,6))
            AS d
        FROM daily
    ),
    r AS (
        SELECT l.lag,
               CAST(SUM(d1.d * d2.d) AS DOUBLE)
               / (SELECT CAST(SUM(d * d) AS DOUBLE) FROM dev) AS acf
        FROM (SELECT unnest(range(1, 4)) AS lag) l
        JOIN dev d1 ON TRUE
        JOIN dev d2 ON d2.day = d1.day + CAST(l.lag AS INTEGER)
        GROUP BY l.lag
    ),
    w AS (
        SELECT MAX(CASE WHEN lag = 1 THEN acf END) AS r1,
               MAX(CASE WHEN lag = 2 THEN acf END) AS r2,
               MAX(CASE WHEN lag = 3 THEN acf END) AS r3
        FROM r
    ),
    dl AS (
        SELECT r1 AS phi11,
               (r2 - r1 * r1) / (1 - r1 * r1) AS phi22,
               r1 * (1 - (r2 - r1 * r1) / (1 - r1 * r1)) AS phi21,
               r1, r2, r3
        FROM w
    )
    SELECT CAST(ROUND(phi11, 6) AS DOUBLE) + 0.0 AS pacf_1,
           CAST(ROUND(phi22, 6) AS DOUBLE) + 0.0 AS pacf_2,
           CAST(ROUND((r3 - phi21 * r2 - phi22 * r1)
               / (1 - phi21 * r1 - phi22 * r2), 6) AS DOUBLE) + 0.0
               AS pacf_3
    FROM dl
    """,
)
def pacf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR-order identification: the partial correlogram companion to
    acf_q (an AR(p) series cuts off after lag p here while the plain
    ACF tails on)."""
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
    lags = daily.sparkSession.range(1, 4).select(
        F.col("id").cast("int").alias("lag")
    )
    d1 = dev.select(F.col("day").alias("day1"), F.col("d").alias("a"))
    d2 = dev.select(F.col("day").alias("day2"), F.col("d").alias("b"))
    r = (
        d1.crossJoin(F.broadcast(lags))
        .join(
            d2,
            F.col("day2") == F.date_add(F.col("day1"), F.col("lag")),
        )
        .groupBy("lag")
        .agg(F.sum(F.col("a") * F.col("b")).alias("sab"))
        .crossJoin(F.broadcast(den))
        .select(
            "lag",
            (F.col("sab").cast("double") / F.col("ss")).alias("acf"),
        )
    )

    def at(lag):
        return F.max(F.when(F.col("lag") == lag, F.col("acf")))

    w = r.agg(at(1).alias("r1"), at(2).alias("r2"), at(3).alias("r3"))
    phi22 = (F.col("r2") - F.col("r1") * F.col("r1")) / (
        1 - F.col("r1") * F.col("r1")
    )
    phi21 = F.col("r1") * (1 - phi22)
    return w.select(
        (F.round(F.col("r1"), 6) + F.lit(0.0)).alias("pacf_1"),
        (F.round(phi22, 6) + F.lit(0.0)).alias("pacf_2"),
        (
            F.round(
                (F.col("r3") - phi21 * F.col("r2") - phi22 * F.col("r1"))
                / (1 - phi21 * F.col("r1") - phi22 * F.col("r2")),
                6,
            )
            + F.lit(0.0)
        ).alias("pacf_3"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 6 (continued): renewal & sequential
# statistics — Allan variance across dyadic block sizes, two classic
# distribution-free randomness tests (turning points, records), a
# peaks-over-threshold GPD moment fit, and the index-of-dispersion
# Poissonness check. All on calendar-bounded daily frames with exact
# DECIMAL values.
# ---------------------------------------------------------------------------


# Allan variance of daily purchase revenue at block sizes 1/2/4/8:
# AVAR(tau) = mean of (block_mean_{k+1} - block_mean_k)^2 / 2 over
# adjacent non-overlapping blocks — the drift-vs-noise separator
# clock people use, equally at home on metric streams. Block SUMS
# stay exact decimals (dividing by tau early would quantize a double
# at a guaranteed .5 boundary); adjacent pairs meet via block-id+1
# join and tau^2 divides once at the end.
@register(
    "allan_variance_q",
    """
    WITH daily AS (
        SELECT ROW_NUMBER() OVER (ORDER BY CAST(ts AS DATE)) - 1 AS i,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    taus AS (SELECT unnest([1, 2, 4, 8]) AS tau),
    blocks AS (
        -- keep the EXACT block sum; dividing by tau here would quantize
        -- a double at a guaranteed .5 boundary (6-dp sums / 2). The tau
        -- division happens once, at the end: AVAR = sum((Sb-Sa)^2)
        -- / (2 n tau^2).
        SELECT taus.tau, d.i // taus.tau AS blk,
               SUM(d.m) AS bs, COUNT(*) AS n_in
        FROM daily d CROSS JOIN taus
        GROUP BY taus.tau, d.i // taus.tau
        HAVING COUNT(*) = taus.tau
    ),
    pairs AS (
        SELECT a.tau, CAST(b.bs - a.bs AS DOUBLE) AS d
        FROM blocks a JOIN blocks b
            ON b.tau = a.tau AND b.blk = a.blk + 1
    )
    SELECT CAST(tau AS BIGINT) AS tau_days,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(ROUND(CAST(SUM(CAST(d * d AS DECIMAL(28,12)))
                AS DOUBLE) / (2.0 * COUNT(*) * tau * tau), 6)
               AS DOUBLE) + 0.0 AS allan_var
    FROM pairs GROUP BY tau
    """,
)
def allan_variance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """White noise slopes down with tau, drift flattens or rises —
    the multi-scale stability read next to hurst_exponent_q. Partial
    trailing blocks are dropped (HAVING n = tau) in both engines."""
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
            .alias("m")
        )
        .select((F.row_number().over(wday) - 1).alias("i"), "m")
    )
    taus = metadata_df(daily.sparkSession,
        [(1,), (2,), (4,), (8,)], "tau int"
    )
    blocks = (
        daily.crossJoin(F.broadcast(taus))
        .groupBy("tau", F.expr("i div tau").alias("blk"))
        .agg(
            F.sum("m").alias("bs"),
            F.count(F.lit(1)).alias("n_in"),
        )
        .filter(F.col("n_in") == F.col("tau"))
    )
    a = blocks.select(
        F.col("tau").alias("ta"), F.col("blk").alias("ba"),
        F.col("bs").alias("sa"),
    )
    b = blocks.select(
        F.col("tau").alias("tb"), F.col("blk").alias("bb"),
        F.col("bs").alias("sb"),
    )
    pairs = a.join(
        b,
        (F.col("tb") == F.col("ta")) & (F.col("bb") == F.col("ba") + 1),
    ).select(
        F.col("ta").alias("tau"),
        (F.col("sb") - F.col("sa")).cast("double").alias("d"),
    )
    return pairs.groupBy("tau").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        (
            F.round(
                _dsum(F.col("d") * F.col("d")).cast("double")
                / (
                    2.0
                    * F.count(F.lit(1))
                    * F.col("tau")
                    * F.col("tau")
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("allan_var"),
    ).select(
        F.col("tau").cast("long").alias("tau_days"),
        "n_pairs",
        "allan_var",
    )


# Turning-points randomness test on daily revenue: count local
# extrema (strictly higher or lower than both neighbors); under iid,
# E = 2(n-2)/3 and Var = (16n - 29)/90; z = (T - E)/sqrt(Var).
# Neighbor comparisons are exact DECIMALs via LAG/LEAD on the daily
# frame.
@register(
    "turning_points_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    tp AS (
        SELECT day, m,
               LAG(m) OVER (ORDER BY day) AS pm,
               LEAD(m) OVER (ORDER BY day) AS nm,
               COUNT(*) OVER () AS n
        FROM daily
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN (m > pm AND m > nm)
                      OR (m < pm AND m < nm) THEN 1 ELSE 0 END)
               AS BIGINT) AS n_turning,
           CAST(ROUND((SUM(CASE WHEN (m > pm AND m > nm)
                      OR (m < pm AND m < nm) THEN 1 ELSE 0 END)
                   - 2.0 * (MAX(n) - 2) / 3)
               / sqrt((16.0 * MAX(n) - 29) / 90), 6) AS DOUBLE) + 0.0
               AS z_stat
    FROM tp WHERE pm IS NOT NULL AND nm IS NOT NULL
    """,
)
def turning_points_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Too few turning points = trending/smooth, too many =
    oscillating — the second classic randomness read next to
    runs_test_q (which scores sign runs, not extrema)."""
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
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tp = daily.select(
        "m",
        F.lag("m").over(wday).alias("pm"),
        F.lead("m").over(wday).alias("nm"),
        F.count(F.lit(1)).over(wt).alias("n"),
    ).filter(F.col("pm").isNotNull() & F.col("nm").isNotNull())
    is_turn = F.when(
        ((F.col("m") > F.col("pm")) & (F.col("m") > F.col("nm")))
        | ((F.col("m") < F.col("pm")) & (F.col("m") < F.col("nm"))),
        1,
    ).otherwise(0)
    return tp.agg(
        F.max("n").cast("long").alias("n_days"),
        F.sum(is_turn).cast("long").alias("n_turning"),
        (
            F.round(
                (F.sum(is_turn) - 2.0 * (F.max("n") - 2) / 3)
                / F.sqrt((16.0 * F.max("n") - 29) / 90),
                6,
            )
            + F.lit(0.0)
        ).alias("z_stat"),
    )


# Records test: the count of running maxima in the daily revenue
# series; under iid the expectation is the harmonic number H_n and
# the variance H_n - H_n^(2). The harmonic sums come from a range
# table (n rows, calendar-bounded), the record indicator from an
# exact running max.
@register(
    "records_test_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    rec AS (
        SELECT day, m,
               CASE WHEN m > MAX(m) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING)
                    OR LAG(m) OVER (ORDER BY day) IS NULL
                    THEN 1 ELSE 0 END AS is_rec,
               COUNT(*) OVER () AS n
        FROM daily
    ),
    h AS (
        SELECT SUM(1.0 / k) AS h1, SUM(1.0 / (k * k)) AS h2
        FROM (SELECT unnest(range(1, (SELECT MAX(n) FROM rec) + 1))
                  AS k)
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_days,
           CAST(SUM(is_rec) AS BIGINT) AS n_records,
           CAST(ROUND((SELECT h1 FROM h), 6) AS DOUBLE) + 0.0
               AS expected,
           CAST(ROUND((SUM(is_rec) - (SELECT h1 FROM h))
               / sqrt((SELECT h1 - h2 FROM h)), 6) AS DOUBLE) + 0.0
               AS z_stat
    FROM rec
    """,
)
def records_test_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Are new revenue highs arriving faster than chance? Record
    counts grow like ln n under iid; a surplus means trend."""
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
    wprev = wday.rowsBetween(Window.unboundedPreceding, -1)
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rec = daily.select(
        "m",
        F.when(
            (F.col("m") > F.max("m").over(wprev))
            | F.lag("m").over(wday).isNull(),
            1,
        )
        .otherwise(0)
        .alias("is_rec"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    nmax = daily.agg(F.count(F.lit(1)).alias("nn"))
    h = (
        daily.sparkSession.range(1, 10000)
        .crossJoin(F.broadcast(nmax))
        .filter(F.col("id") <= F.col("nn"))
        .agg(
            F.sum(1.0 / F.col("id")).alias("h1"),
            F.sum(1.0 / (F.col("id") * F.col("id"))).alias("h2"),
        )
    )
    return rec.crossJoin(F.broadcast(h)).agg(
        F.max("n").cast("long").alias("n_days"),
        F.sum("is_rec").cast("long").alias("n_records"),
        (F.round(F.max("h1"), 6) + F.lit(0.0)).alias("expected"),
        (
            F.round(
                (F.sum("is_rec") - F.max("h1"))
                / F.sqrt(F.max("h1") - F.max("h2")),
                6,
            )
            + F.lit(0.0)
        ).alias("z_stat"),
    )


# Peaks-over-threshold GPD moment fit on daily LOSSES (the cvar_q
# P&L): threshold u = the 5th-largest loss (a fixed order statistic
# so the excess set is deterministic); method-of-moments shape
# xi = (1 - mean^2/var)/2 and scale beta = mean (mean^2/var + 1)/2
# from the excess mean/variance. The EVT tail read beyond cvar_q's
# empirical quantile. All ranking on the calendar frame.
@register(
    "pot_evt_q",
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
        SELECT loss, ROW_NUMBER() OVER (ORDER BY loss DESC, day) AS k
        FROM pnl
    ),
    u AS (SELECT loss AS thr FROM r WHERE k = 5),
    exc AS (
        SELECT CAST(loss - (SELECT thr FROM u) AS DOUBLE) AS e
        FROM r WHERE k < 5
    ),
    m AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(e AS DECIMAL(28,12))) AS DOUBLE)
                   / COUNT(*) AS mu,
               CAST(SUM(CAST(e * e AS DECIMAL(28,12))) AS DOUBLE)
                   / COUNT(*) AS m2
        FROM exc
    )
    SELECT CAST(n AS BIGINT) AS n_excesses,
           CAST(ROUND((SELECT CAST(thr AS DOUBLE) FROM u), 2)
               AS DOUBLE) + 0.0 AS threshold,
           CAST(ROUND((1 - mu * mu / (m2 - mu * mu)) / 2, 6)
               AS DOUBLE) + 0.0 AS gpd_shape,
           CAST(ROUND(mu * (mu * mu / (m2 - mu * mu) + 1) / 2, 4)
               AS DOUBLE) + 0.0 AS gpd_scale
    FROM m
    """,
)
def pot_evt_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How heavy is the loss tail BEYOND the observed quantile?
    Positive shape = Pareto-heavy (cvar_q underestimates), negative =
    bounded tail. Moment fit over the top-4 excesses at this scale."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(_dec(F.col("value"), 18, 6)).alias("rev")
    )
    mu0 = daily.agg(
        (F.sum("rev").cast("double") / F.count(F.lit(1)))
        .cast("decimal(18,6)")
        .alias("mu")
    )
    pnl = daily.crossJoin(F.broadcast(mu0)).select(
        "day", (F.col("mu") - F.col("rev")).alias("loss")
    )
    wk = Window.orderBy(F.col("loss").desc(), F.col("day"))
    r = pnl.select("loss", F.row_number().over(wk).alias("k"))
    u = r.filter(F.col("k") == 5).select(F.col("loss").alias("thr"))
    exc = (
        r.filter(F.col("k") < 5)
        .crossJoin(F.broadcast(u))
        .select((F.col("loss") - F.col("thr")).cast("double").alias("e"))
    )
    m = exc.crossJoin(F.broadcast(u)).agg(
        F.count(F.lit(1)).alias("n"),
        (_dsum(F.col("e")).cast("double") / F.count(F.lit(1))).alias(
            "mu"
        ),
        (
            _dsum(F.col("e") * F.col("e")).cast("double")
            / F.count(F.lit(1))
        ).alias("m2"),
        F.max("thr").alias("thr"),
    )
    var = F.col("m2") - F.col("mu") * F.col("mu")
    return m.select(
        F.col("n").cast("long").alias("n_excesses"),
        (
            F.round(F.col("thr").cast("double"), 2) + F.lit(0.0)
        ).alias("threshold"),
        (
            F.round((1 - F.col("mu") * F.col("mu") / var) / 2, 6)
            + F.lit(0.0)
        ).alias("gpd_shape"),
        (
            F.round(
                F.col("mu")
                * (F.col("mu") * F.col("mu") / var + 1)
                / 2,
                4,
            )
            + F.lit(0.0)
        ).alias("gpd_scale"),
    )


# Index-of-dispersion Poissonness check per event type: IoD =
# var/mean of DAILY COUNTS (sample variance), chi2 = (n-1) IoD. IoD
# >> 1 flags overdispersion (bursty arrivals), << 1 regular spacing.
# Counts are exact integers; one (type, day) aggregation feeds a
# 5-row moment table.
@register(
    "poissonness_q",
    """
    WITH dc AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    m AS (
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(c) AS DOUBLE) AS s,
               CAST(SUM(c * c) AS DOUBLE) AS ss
        FROM dc GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           CAST(ROUND(s / n, 4) AS DOUBLE) + 0.0 AS mean_daily,
           CAST(ROUND(((ss - s * s / n) / (n - 1)) / (s / n), 6)
               AS DOUBLE) + 0.0 AS dispersion_index,
           ((ss - s * s / n) / (n - 1)) / (s / n) > 1.5
               AS overdispersed
    FROM m
    """,
)
def poissonness_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Are arrivals Poisson-like per type? The dispersion screen that
    decides whether dp_counts_q-style rate models or burstiness_q's
    heavy-tail machinery applies."""
    e = Catalog(spark, sf_dir).events
    dc = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    m = dc.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").cast("double").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("double").alias("ss"),
    )
    iod = (
        (F.col("ss") - F.col("s") * F.col("s") / F.col("n"))
        / (F.col("n") - 1)
    ) / (F.col("s") / F.col("n"))
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        (
            F.round(F.col("s") / F.col("n"), 4) + F.lit(0.0)
        ).alias("mean_daily"),
        (F.round(iod, 6) + F.lit(0.0)).alias("dispersion_index"),
        (iod > 1.5).alias("overdispersed"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 6 (continued): equivalence testing, causal
# covariate balance, SPC capability and EWMA control limits, and
# two-way variance components — the quality-engineering shelf.
# ---------------------------------------------------------------------------


# TOST equivalence test on the welch_ttest_q cohorts: can we claim the
# two arms' mean purchase totals are equivalent within +-10% of the
# pooled mean? Two one-sided t statistics against the margins; both
# must exceed +1.645 (alpha = .05, large-sample normal cut) to declare
# equivalence — the regulatory mirror image of difference testing.
@register(
    "tost_q",
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
                   AS v1,
               CAST(SUM(s) AS DOUBLE) / SUM(n) AS grand
        FROM m
    )
    SELECT CAST(ROUND(m0 - m1, 4) AS DOUBLE) + 0.0 AS mean_diff,
           CAST(ROUND(0.10 * grand, 4) AS DOUBLE) + 0.0 AS margin,
           CAST(ROUND(((m0 - m1) + 0.10 * grand)
               / sqrt(v0 / n0 + v1 / n1), 4) AS DOUBLE) + 0.0
               AS t_lower,
           CAST(ROUND((0.10 * grand - (m0 - m1))
               / sqrt(v0 / n0 + v1 / n1), 4) AS DOUBLE) + 0.0
               AS t_upper,
           ((m0 - m1) + 0.10 * grand) / sqrt(v0 / n0 + v1 / n1)
               > 1.645
           AND (0.10 * grand - (m0 - m1)) / sqrt(v0 / n0 + v1 / n1)
               > 1.645 AS equivalent
    FROM w
    """,
)
def tost_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'No meaningful difference' needs its own test — failing to
    reject in welch_ttest_q is NOT equivalence. Margins at 10% of the
    grand mean."""
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

    var_expr = (F.col("q") - F.col("s") * F.col("s") / F.col("n")) / (
        F.col("n") - 1
    )
    w = m.agg(
        arm(F.col("n"), 0).alias("n0"),
        arm(F.col("n"), 1).alias("n1"),
        arm(F.col("s") / F.col("n"), 0).alias("m0"),
        arm(F.col("s") / F.col("n"), 1).alias("m1"),
        arm(var_expr, 0).alias("v0"),
        arm(var_expr, 1).alias("v1"),
        (F.sum("s") / F.sum("n")).alias("grand"),
    )
    diff = F.col("m0") - F.col("m1")
    margin = 0.10 * F.col("grand")
    se = F.sqrt(F.col("v0") / F.col("n0") + F.col("v1") / F.col("n1"))
    tl = (diff + margin) / se
    tu = (margin - diff) / se
    return w.select(
        (F.round(diff, 4) + F.lit(0.0)).alias("mean_diff"),
        (F.round(margin, 4) + F.lit(0.0)).alias("margin"),
        (F.round(tl, 4) + F.lit(0.0)).alias("t_lower"),
        (F.round(tu, 4) + F.lit(0.0)).alias("t_upper"),
        ((tl > 1.645) & (tu > 1.645)).alias("equivalent"),
    )


# Covariate balance check (standardized mean differences) between the
# two user cohorts over the per-user event-type count covariates:
# SMD = (mean1 - mean0) / sqrt((var1 + var0)/2); |SMD| < 0.1 is the
# conventional 'balanced' bar before any causal read of cohort
# contrasts. One pass to user x type counts (zero-filled), one to
# per-arm moments; the report is one row per covariate.
@register(
    "smd_balance_q",
    """
    WITH u AS (
        SELECT user_id, user_id % 2 AS arm,
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   AS c_view,
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS c_click,
               SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                   AS c_signup,
               SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                   AS c_error
        FROM events GROUP BY user_id
    ),
    long AS (
        SELECT arm, 'view' AS cov, c_view AS x FROM u
        UNION ALL SELECT arm, 'click', c_click FROM u
        UNION ALL SELECT arm, 'signup', c_signup FROM u
        UNION ALL SELECT arm, 'error', c_error FROM u
    ),
    m AS (
        SELECT cov, arm, COUNT(*) AS n,
               CAST(SUM(x) AS DOUBLE) AS s,
               CAST(SUM(x * x) AS DOUBLE) AS ss
        FROM long GROUP BY cov, arm
    ),
    w AS (
        SELECT cov,
               MAX(CASE WHEN arm = 0 THEN s / n END) AS m0,
               MAX(CASE WHEN arm = 1 THEN s / n END) AS m1,
               MAX(CASE WHEN arm = 0
                   THEN (ss - s * s / n) / (n - 1) END) AS v0,
               MAX(CASE WHEN arm = 1
                   THEN (ss - s * s / n) / (n - 1) END) AS v1
        FROM m GROUP BY cov
    )
    SELECT cov AS covariate,
           CAST(ROUND(m1 - m0, 6) AS DOUBLE) + 0.0 AS mean_diff,
           CAST(ROUND((m1 - m0) / sqrt((v1 + v0) / 2), 6) AS DOUBLE)
               + 0.0 AS smd,
           abs((m1 - m0) / sqrt((v1 + v0) / 2)) < 0.1 AS balanced
    FROM w
    """,
)
def smd_balance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the parity split actually exchangeable on pre-treatment
    behavior? The balance table every DiD/CUPED/uplift readout should
    print first."""
    e = Catalog(spark, sf_dir).events
    covs = ["view", "click", "signup", "error"]
    u = e.groupBy("user_id").agg(
        *[
            F.sum(
                F.when(F.col("event_type") == c, 1).otherwise(0)
            ).alias(f"c_{c}")
            for c in covs
        ]
    ).withColumn("arm", F.col("user_id") % 2)
    long = None
    for c in covs:
        part = u.select(
            "arm", F.lit(c).alias("cov"), F.col(f"c_{c}").alias("x")
        )
        long = part if long is None else long.unionByName(part)
    m = long.groupBy("cov", "arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("ss"),
    )

    def arm(col, a):
        return F.max(F.when(F.col("arm") == a, col))

    var_expr = (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (
        F.col("n") - 1
    )
    w = m.groupBy("cov").agg(
        arm(F.col("s") / F.col("n"), 0).alias("m0"),
        arm(F.col("s") / F.col("n"), 1).alias("m1"),
        arm(var_expr, 0).alias("v0"),
        arm(var_expr, 1).alias("v1"),
    )
    smd = (F.col("m1") - F.col("m0")) / F.sqrt(
        (F.col("v1") + F.col("v0")) / 2
    )
    return w.select(
        F.col("cov").alias("covariate"),
        (
            F.round(F.col("m1") - F.col("m0"), 6) + F.lit(0.0)
        ).alias("mean_diff"),
        (F.round(smd, 6) + F.lit(0.0)).alias("smd"),
        (F.abs(smd) < 0.1).alias("balanced"),
    )


# Process capability of daily purchase revenue against fixed spec
# limits [LSL, USL] = [the 30-day mean +- 25%]: Cp = (USL - LSL)/6s,
# Cpk = min(USL - mu, mu - LSL)/3s, plus the out-of-spec day count.
# Moments from exact decimals; the spec window derives from the same
# pass so the report is self-contained.
@register(
    "process_capability_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               SUM(CAST(value AS DECIMAL(18,6))) AS rev
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    m AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS mu,
               sqrt((CAST(SUM(CAST(rev AS DECIMAL(19,6))
                          * CAST(rev AS DECIMAL(19,6))) AS DOUBLE)
                     - CAST(SUM(rev) AS DOUBLE) * CAST(SUM(rev)
                           AS DOUBLE) / COUNT(*))
                    / (COUNT(*) - 1)) AS s
        FROM daily
    ),
    spec AS (
        SELECT n, mu, s, 0.75 * mu AS lsl, 1.25 * mu AS usl FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(ROUND((usl - lsl) / (6 * s), 4) AS DOUBLE) + 0.0 AS cp,
           CAST(ROUND(least(usl - mu, mu - lsl) / (3 * s), 4)
               AS DOUBLE) + 0.0 AS cpk,
           CAST((SELECT COUNT(*) FROM daily, spec
                 WHERE CAST(rev AS DOUBLE) < lsl
                    OR CAST(rev AS DOUBLE) > usl) AS BIGINT)
               AS n_out_of_spec
    FROM spec
    """,
)
def process_capability_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Would daily revenue hold a +-25% service band? Cp measures the
    band vs spread, Cpk penalizes off-center drift; the out-of-spec
    count is the empirical check on both."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(_dec(F.col("value"), 18, 6)).alias("rev")
    )
    r16 = F.col("rev").cast("decimal(16,6)")
    m = daily.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("rev").cast("double") / F.count(F.lit(1))).alias("mu"),
        F.sqrt(
            (
                F.sum(r16 * r16).cast("double")
                - F.sum("rev").cast("double")
                * F.sum("rev").cast("double")
                / F.count(F.lit(1))
            )
            / (F.count(F.lit(1)) - 1)
        ).alias("s"),
    )
    spec = m.select(
        "n",
        "mu",
        "s",
        (0.75 * F.col("mu")).alias("lsl"),
        (1.25 * F.col("mu")).alias("usl"),
    )
    oos = (
        daily.crossJoin(F.broadcast(spec))
        .filter(
            (F.col("rev").cast("double") < F.col("lsl"))
            | (F.col("rev").cast("double") > F.col("usl"))
        )
        .agg(F.count(F.lit(1)).alias("oos"))
    )
    return spec.crossJoin(F.broadcast(oos)).select(
        F.col("n").cast("long").alias("n_days"),
        (
            F.round(
                (F.col("usl") - F.col("lsl")) / (6 * F.col("s")), 4
            )
            + F.lit(0.0)
        ).alias("cp"),
        (
            F.round(
                F.least(
                    F.col("usl") - F.col("mu"),
                    F.col("mu") - F.col("lsl"),
                )
                / (3 * F.col("s")),
                4,
            )
            + F.lit(0.0)
        ).alias("cpk"),
        F.col("oos").cast("long").alias("n_out_of_spec"),
    )


# EWMA control chart (lambda = 0.2, L = 3) over daily purchase
# revenue: recursive EWMA via the closed-form weighted prefix sum
# (the ewma_q machinery), time-varying control limits
# mu0 +- L sigma sqrt(lambda/(2-lambda) (1 - (1-lambda)^{2t})), and
# the violation days. Center/sigma from the series itself (phase-I
# style). Weights are powers of (1-lambda) computed identically in
# both engines.
@register(
    "ewma_control_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               ROW_NUMBER() OVER (ORDER BY CAST(ts AS DATE)) AS t,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    base AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(m) AS DOUBLE) / COUNT(*) AS mu0,
               sqrt((CAST(SUM(CAST(m AS DECIMAL(16,6))
                          * CAST(m AS DECIMAL(16,6))) AS DOUBLE)
                     - CAST(SUM(m) AS DOUBLE) * CAST(SUM(m) AS DOUBLE)
                       / COUNT(*)) / (COUNT(*) - 1)) AS s
        FROM daily
    ),
    ew AS (
        SELECT a.day, a.t,
               0.2 * SUM(CAST(b.m AS DOUBLE) * pow(0.8, a.t - b.t))
                   + pow(0.8, a.t) * (SELECT mu0 FROM base) AS z
        FROM daily a JOIN daily b ON b.t <= a.t
        GROUP BY a.day, a.t
    )
    SELECT day,
           CAST(ROUND(z, 4) AS DOUBLE) + 0.0 AS ewma,
           CAST(ROUND((SELECT mu0 FROM base)
               + 3 * (SELECT s FROM base)
                 * sqrt(0.2 / 1.8 * (1 - pow(0.8, 2 * t))), 4)
               AS DOUBLE) + 0.0 AS ucl,
           CAST(ROUND((SELECT mu0 FROM base)
               - 3 * (SELECT s FROM base)
                 * sqrt(0.2 / 1.8 * (1 - pow(0.8, 2 * t))), 4)
               AS DOUBLE) + 0.0 AS lcl,
           z > (SELECT mu0 FROM base)
               + 3 * (SELECT s FROM base)
                 * sqrt(0.2 / 1.8 * (1 - pow(0.8, 2 * t)))
           OR z < (SELECT mu0 FROM base)
               - 3 * (SELECT s FROM base)
                 * sqrt(0.2 / 1.8 * (1 - pow(0.8, 2 * t)))
               AS violation
    FROM ew
    """,
)
def ewma_control_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which days drift past the EWMA chart's 3-sigma band? The SPC
    companion to cusum_changepoint_q (EWMA reacts to small sustained
    shifts; CUSUM to the cumulative sum). Every day ships with its
    time-varying limits and flag, so the chart is verifiable even
    when the series is fully in control."""
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
            .alias("m")
        )
        .withColumn("t", F.row_number().over(wday))
    )
    m16 = F.col("m").cast("decimal(16,6)")
    base = daily.agg(
        (F.sum("m").cast("double") / F.count(F.lit(1))).alias("mu0"),
        F.sqrt(
            (
                F.sum(m16 * m16).cast("double")
                - F.sum("m").cast("double")
                * F.sum("m").cast("double")
                / F.count(F.lit(1))
            )
            / (F.count(F.lit(1)) - 1)
        ).alias("s"),
    )
    a = daily.select(F.col("day"), F.col("t").alias("ta"))
    b = daily.select(F.col("t").alias("tb"), F.col("m").alias("mb"))
    ew = (
        a.join(b, F.col("tb") <= F.col("ta"))
        .groupBy("day", "ta")
        .agg(
            F.sum(
                F.col("mb").cast("double")
                * F.pow(F.lit(0.8), F.col("ta") - F.col("tb"))
            ).alias("ws")
        )
        .crossJoin(F.broadcast(base))
        .select(
            "day",
            F.col("ta").alias("t"),
            (
                0.2 * F.col("ws")
                + F.pow(F.lit(0.8), F.col("ta")) * F.col("mu0")
            ).alias("z"),
            "mu0",
            "s",
        )
    )
    band = (
        3
        * F.col("s")
        * F.sqrt(0.2 / 1.8 * (1 - F.pow(F.lit(0.8), 2 * F.col("t"))))
    )
    return ew.select(
        "day",
        (F.round(F.col("z"), 4) + F.lit(0.0)).alias("ewma"),
        (F.round(F.col("mu0") + band, 4) + F.lit(0.0)).alias("ucl"),
        (F.round(F.col("mu0") - band, 4) + F.lit(0.0)).alias("lcl"),
        (
            (F.col("z") > F.col("mu0") + band)
            | (F.col("z") < F.col("mu0") - band)
        ).alias("violation"),
    )


# Two-way variance components (days x event types, one observation
# per cell) via the additive-model ANOVA decomposition: MS_day,
# MS_type, MS_resid from row/column/grand means, and the
# method-of-moments components var_day = (MS_day - MS_e)/k,
# var_type = (MS_type - MS_e)/n (clamped at 0). The gauge-R&R shape:
# how much daily variation is the DAY vs the TYPE vs noise. The cell
# table is calendar x 5 metadata; means are decimal-exact ratios.
@register(
    "variance_components_q",
    """
    WITH cell AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events GROUP BY CAST(ts AS DATE), event_type
    ),
    dims AS (
        SELECT COUNT(DISTINCT day) AS n, COUNT(DISTINCT event_type)
            AS k
        FROM cell
    ),
    grand AS (
        SELECT CAST(SUM(m) AS DOUBLE) / COUNT(*) AS g FROM cell
    ),
    rowm AS (
        SELECT day, CAST(SUM(m) AS DOUBLE) / COUNT(*) AS rm
        FROM cell GROUP BY day
    ),
    colm AS (
        SELECT event_type, CAST(SUM(m) AS DOUBLE) / COUNT(*) AS cm
        FROM cell GROUP BY event_type
    ),
    ss AS (
        SELECT
            (SELECT SUM(CAST((rm - (SELECT g FROM grand))
                 * (rm - (SELECT g FROM grand)) AS DECIMAL(28,12)))
             FROM rowm) AS ssr,
            (SELECT SUM(CAST((cm - (SELECT g FROM grand))
                 * (cm - (SELECT g FROM grand)) AS DECIMAL(28,12)))
             FROM colm) AS ssc,
            (SELECT SUM(CAST(
                 (CAST(c.m AS DOUBLE) - r.rm - co.cm
                  + (SELECT g FROM grand))
                 * (CAST(c.m AS DOUBLE) - r.rm - co.cm
                    + (SELECT g FROM grand)) AS DECIMAL(28,12)))
             FROM cell c JOIN rowm r ON r.day = c.day
             JOIN colm co ON co.event_type = c.event_type) AS sse
    )
    SELECT CAST((SELECT n FROM dims) AS BIGINT) AS n_days,
           CAST((SELECT k FROM dims) AS BIGINT) AS k_types,
           CAST(ROUND(CAST(ssr AS DOUBLE) * (SELECT k FROM dims)
               / ((SELECT n FROM dims) - 1), 6) AS DOUBLE) + 0.0
               AS ms_day,
           CAST(ROUND(CAST(ssc AS DOUBLE) * (SELECT n FROM dims)
               / ((SELECT k FROM dims) - 1), 6) AS DOUBLE) + 0.0
               AS ms_type,
           CAST(ROUND(CAST(sse AS DOUBLE)
               / (((SELECT n FROM dims) - 1)
                  * ((SELECT k FROM dims) - 1)), 6) AS DOUBLE) + 0.0
               AS ms_resid,
           greatest(0.0, CAST(ROUND(
               (CAST(ssr AS DOUBLE) * (SELECT k FROM dims)
                    / ((SELECT n FROM dims) - 1)
                - CAST(sse AS DOUBLE)
                    / (((SELECT n FROM dims) - 1)
                       * ((SELECT k FROM dims) - 1)))
               / (SELECT k FROM dims), 6) AS DOUBLE)) AS var_day,
           greatest(0.0, CAST(ROUND(
               (CAST(ssc AS DOUBLE) * (SELECT n FROM dims)
                    / ((SELECT k FROM dims) - 1)
                - CAST(sse AS DOUBLE)
                    / (((SELECT n FROM dims) - 1)
                       * ((SELECT k FROM dims) - 1)))
               / (SELECT n FROM dims), 6) AS DOUBLE)) AS var_type
    FROM ss
    """,
)
def variance_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gauge-R&R-style decomposition of the (day x type) mean-value
    table: is variation mostly the calendar, the channel, or noise?
    Assumes the additive two-way model with one observation per cell
    (no interaction term is estimable there)."""
    e = Catalog(spark, sf_dir).events
    cell = e.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        (
            F.sum(_dec(F.col("value"), 18, 6)).cast("double")
            / F.count(F.lit(1))
        )
        .cast("decimal(18,6)")
        .alias("m")
    )
    dims = cell.agg(
        F.countDistinct("day").alias("n"),
        F.countDistinct("event_type").alias("k"),
    )
    grand = cell.agg(
        (F.sum("m").cast("double") / F.count(F.lit(1))).alias("g")
    )
    rowm = cell.groupBy("day").agg(
        (F.sum("m").cast("double") / F.count(F.lit(1))).alias("rm")
    )
    colm = cell.groupBy("event_type").agg(
        (F.sum("m").cast("double") / F.count(F.lit(1))).alias("cm")
    )
    ssr = (
        rowm.crossJoin(F.broadcast(grand))
        .agg(
            F.sum(
                (
                    (F.col("rm") - F.col("g"))
                    * (F.col("rm") - F.col("g"))
                ).cast("decimal(28,12)")
            ).alias("ssr")
        )
    )
    ssc = (
        colm.crossJoin(F.broadcast(grand))
        .agg(
            F.sum(
                (
                    (F.col("cm") - F.col("g"))
                    * (F.col("cm") - F.col("g"))
                ).cast("decimal(28,12)")
            ).alias("ssc")
        )
    )
    resid = (
        cell.join(rowm, "day")
        .join(F.broadcast(colm), "event_type")
        .crossJoin(F.broadcast(grand))
        .select(
            (
                F.col("m").cast("double")
                - F.col("rm")
                - F.col("cm")
                + F.col("g")
            ).alias("e")
        )
    )
    sse = resid.agg(
        F.sum((F.col("e") * F.col("e")).cast("decimal(28,12)")).alias(
            "sse"
        )
    )
    j = (
        dims.crossJoin(F.broadcast(ssr))
        .crossJoin(F.broadcast(ssc))
        .crossJoin(F.broadcast(sse))
    )
    n, k = F.col("n"), F.col("k")
    ms_day = F.col("ssr").cast("double") * k / (n - 1)
    ms_type = F.col("ssc").cast("double") * n / (k - 1)
    ms_e = F.col("sse").cast("double") / ((n - 1) * (k - 1))
    return j.select(
        n.cast("long").alias("n_days"),
        k.cast("long").alias("k_types"),
        (F.round(ms_day, 6) + F.lit(0.0)).alias("ms_day"),
        (F.round(ms_type, 6) + F.lit(0.0)).alias("ms_type"),
        (F.round(ms_e, 6) + F.lit(0.0)).alias("ms_resid"),
        F.greatest(
            F.lit(0.0), F.round((ms_day - ms_e) / k, 6)
        ).alias("var_day"),
        F.greatest(
            F.lit(0.0), F.round((ms_type - ms_e) / n, 6)
        ).alias("var_type"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 7: empirical-Bayes shrinkage, stratified
# IPW, a configuration-model null for clustering, rolling regression
# beta, and the Mantel-Haenszel pooled odds ratio.
# ---------------------------------------------------------------------------


# Empirical-Bayes (beta-binomial) shrinkage of per-nation conversion
# rates (customers with any negative balance event... here: share of
# customers with acctbal < 0) toward the grand prior fitted by method
# of moments from the observed rate spread: alpha+beta =
# (m(1-m) - v)/v, posterior = (x + alpha)/(n + alpha + beta). Small
# nations shrink hard, big ones barely move — the estimator that
# stops leaderboards being won by tiny-n flukes. Rates and the prior
# are closed-form moments from one pass.
@register(
    "empirical_bayes_q",
    """
    WITH nat AS (
        SELECT c_nationkey AS nat, COUNT(*) AS n,
               SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS x
        FROM customer GROUP BY c_nationkey
    ),
    mom AS (
        SELECT CAST(SUM(x) AS DOUBLE) / SUM(n) AS m,
               (SUM(CAST(CAST(x AS DOUBLE) / n
                    * (CAST(x AS DOUBLE) / n) AS DECIMAL(28,12)))
                / COUNT(*)
                - CAST(SUM(CAST(CAST(x AS DOUBLE) / n
                           AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*)
                  * (CAST(SUM(CAST(CAST(x AS DOUBLE) / n
                         AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*)))
                   AS v
        FROM nat
    ),
    prior AS (
        SELECT m,
               greatest(CAST(v AS DOUBLE), 1e-9) AS v,
               m * (m * (1 - m) / greatest(CAST(v AS DOUBLE), 1e-9)
                    - 1) AS alpha,
               (1 - m) * (m * (1 - m)
                    / greatest(CAST(v AS DOUBLE), 1e-9) - 1) AS beta
        FROM mom
    )
    SELECT nat AS nationkey, CAST(n AS BIGINT) AS n_customers,
           CAST(ROUND(CAST(x AS DOUBLE) / n, 6) AS DOUBLE) + 0.0
               AS raw_rate,
           CAST(ROUND((x + (SELECT alpha FROM prior))
               / (n + (SELECT alpha FROM prior)
                  + (SELECT beta FROM prior)), 6) AS DOUBLE) + 0.0
               AS shrunk_rate
    FROM nat
    """,
)
def empirical_bayes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation negative-balance rates shrunk toward the pooled
    prior — the leaderboard-safe estimator. Prior strength comes from
    the BETWEEN-nation rate variance (method of moments), clamped so
    a degenerate spread cannot produce a negative prior."""
    c = Catalog(spark, sf_dir).customer
    nat = c.groupBy(F.col("c_nationkey").alias("nat")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("c_acctbal") < 0, 1).otherwise(0)).alias("x"),
    )
    rate = F.col("x").cast("double") / F.col("n")
    mom = nat.agg(
        (F.sum("x").cast("double") / F.sum("n")).alias("m"),
        (
            _dsum(rate * rate).cast("double") / F.count(F.lit(1))
            - (_dsum(rate).cast("double") / F.count(F.lit(1)))
            * (_dsum(rate).cast("double") / F.count(F.lit(1)))
        ).alias("v"),
    )
    vv = F.greatest(F.col("v"), F.lit(1e-9))
    strength = F.col("m") * (1 - F.col("m")) / vv - 1
    prior = mom.select(
        (F.col("m") * strength).alias("alpha"),
        ((1 - F.col("m")) * strength).alias("beta"),
    )
    return nat.crossJoin(F.broadcast(prior)).select(
        F.col("nat").alias("nationkey"),
        F.col("n").cast("long").alias("n_customers"),
        (F.round(rate, 6) + F.lit(0.0)).alias("raw_rate"),
        (
            F.round(
                (F.col("x") + F.col("alpha"))
                / (F.col("n") + F.col("alpha") + F.col("beta")),
                6,
            )
            + F.lit(0.0)
        ).alias("shrunk_rate"),
    )


# Stratified inverse-propensity-weighted ATE of "treated" (odd users)
# on per-user purchase totals: strata are activity-count quintiles
# (global_ntile), the propensity inside each stratum is the observed
# treated share, and the IPW estimator weighs each outcome by
# 1/e(s) or 1/(1-e(s)). With a parity assignment e(s) ~ 0.5
# everywhere, so the estimate should hug the raw difference — that
# agreement is itself the diagnostic. Per-stratum terms are
# DECIMAL-quantized before the final sum.
@register(
    "ipw_ate_q",
    """
    WITH u AS (
        SELECT user_id, user_id % 2 AS w, COUNT(*) AS activity,
               COALESCE(SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(value AS DECIMAL(18,6)) END),
                   CAST(0 AS DECIMAL(18,6))) AS y
        FROM events GROUP BY user_id
    ),
    tiled AS (
        SELECT w, y,
               NTILE(5) OVER (ORDER BY activity, user_id) AS s
        FROM u
    ),
    strata AS (
        SELECT s, COUNT(*) AS n,
               SUM(w) AS n1,
               CAST(SUM(CASE WHEN w = 1 THEN y END) AS DOUBLE) AS y1,
               CAST(SUM(CASE WHEN w = 0 THEN y END) AS DOUBLE) AS y0
        FROM tiled GROUP BY s
    ),
    terms AS (
        -- positivity: strata with no treated or no control users have
        -- undefined weights; they are EXCLUDED and counted, never
        -- silently null-skipped
        SELECT s, n, n1,
               CAST(y1 / (CAST(n1 AS DOUBLE) / n)
                    - y0 / (1 - CAST(n1 AS DOUBLE) / n)
                    AS DECIMAL(28,6)) AS t
        FROM strata WHERE n1 > 0 AND n1 < n
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n_users_used,
           CAST(COUNT(*) AS BIGINT) AS n_strata_used,
           CAST((SELECT COUNT(*) FROM strata WHERE n1 = 0 OR n1 = n)
               AS BIGINT) AS n_strata_excluded,
           CAST(ROUND(CAST(SUM(t) AS DOUBLE) / SUM(n), 6) AS DOUBLE)
               + 0.0 AS ipw_ate
    FROM terms
    """,
)
def ipw_ate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Horvitz-Thompson ATE with propensities estimated per
    activity stratum — the causal-inference counterpart of
    smd_balance_q's balance sheet (and a near-null here by design:
    parity treatment gives e ~ 0.5 in every stratum)."""
    from iniz_exporters_spark.operators.indexing import global_ntile

    e = Catalog(spark, sf_dir).events
    u = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("activity"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    _dec(F.col("value"), 18, 6),
                )
            ),
            F.lit(0).cast("decimal(18,6)"),
        ).alias("y"),
    ).withColumn("w", F.col("user_id") % 2)
    tiled = global_ntile(
        u, [F.col("activity").asc(), F.col("user_id").asc()], 5, "s"
    )
    strata = tiled.groupBy("s").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("w").alias("n1"),
        F.sum(F.when(F.col("w") == 1, F.col("y")))
        .cast("double")
        .alias("y1"),
        F.sum(F.when(F.col("w") == 0, F.col("y")))
        .cast("double")
        .alias("y0"),
    )
    e_s = F.col("n1").cast("double") / F.col("n")
    # positivity: exclude (and count) strata with no treated or no
    # control users — their weights are undefined
    valid = strata.filter(
        (F.col("n1") > 0) & (F.col("n1") < F.col("n"))
    )
    excluded = strata.filter(
        (F.col("n1") == 0) | (F.col("n1") == F.col("n"))
    ).agg(F.count(F.lit(1)).alias("nx"))
    terms = valid.select(
        "n",
        (
            F.col("y1") / e_s - F.col("y0") / (1 - e_s)
        ).cast("decimal(28,6)").alias("t"),
    )
    return terms.crossJoin(F.broadcast(excluded)).agg(
        F.sum("n").cast("long").alias("n_users_used"),
        F.count(F.lit(1)).cast("long").alias("n_strata_used"),
        F.max("nx").cast("long").alias("n_strata_excluded"),
        (
            F.round(F.sum("t").cast("double") / F.sum("n"), 6)
            + F.lit(0.0)
        ).alias("ipw_ate"),
    )


# Configuration-model null for graph clustering: the expected global
# clustering coefficient of a random graph with the SAME degree
# sequence is (<k^2> - <k>)^2 / (n <k>^3); compare with the observed
# wedge-closure ratio 3*triangles/wedges on the part co-purchase
# graph. Degree moments are exact integer sums; triangles/wedges
# reuse the bounded neighbor joins.
@register(
    "clustering_null_q",
    """
    WITH op AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    edges AS (
        SELECT a.p AS u, b.p AS v
        FROM op a JOIN op b ON b.o = a.o AND a.p < b.p
        GROUP BY a.p, b.p HAVING COUNT(*) >= 2
    ),
    und AS (
        SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges
    ),
    deg AS (SELECT u AS node, COUNT(*) AS k FROM und GROUP BY u),
    mom AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(k) AS DOUBLE) / COUNT(*) AS k1,
               CAST(SUM(k * k) AS DOUBLE) / COUNT(*) AS k2
        FROM deg
    ),
    tri AS (
        SELECT COUNT(*) / 6 AS t
        FROM und e1 JOIN und e2 ON e2.u = e1.v
        JOIN und e3 ON e3.u = e2.v AND e3.v = e1.u
    ),
    wed AS (
        SELECT CAST(SUM(k * (k - 1)) AS DOUBLE) / 2 AS w FROM deg
    )
    SELECT CAST((SELECT n FROM mom) AS BIGINT) AS n_nodes,
           CAST((SELECT t FROM tri) AS BIGINT) AS n_triangles,
           CAST(ROUND(3.0 * (SELECT t FROM tri)
               / (SELECT w FROM wed), 6) AS DOUBLE) + 0.0
               AS observed_clustering,
           CAST(ROUND(pow((SELECT k2 - k1 FROM mom), 2)
               / ((SELECT n FROM mom)
                  * pow((SELECT k1 FROM mom), 3)), 6) AS DOUBLE) + 0.0
               AS null_clustering
    """,
)
def clustering_null_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the co-purchase graph's transitivity REAL structure or just
    its degree sequence? observed >> null = genuine community
    closure (what modularity_q then quantifies)."""
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
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("k")
    )
    mom = deg.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("k").cast("double") / F.count(F.lit(1))).alias("k1"),
        (
            F.sum(F.col("k") * F.col("k")).cast("double")
            / F.count(F.lit(1))
        ).alias("k2"),
    )
    e1 = und.select(F.col("u").alias("a1"), F.col("v").alias("b1"))
    e2 = und.select(F.col("u").alias("a2"), F.col("v").alias("b2"))
    e3 = und.select(F.col("u").alias("a3"), F.col("v").alias("b3"))
    tri = (
        e1.join(e2, F.col("a2") == F.col("b1"))
        .join(
            e3,
            (F.col("a3") == F.col("b2")) & (F.col("b3") == F.col("a1")),
        )
        .agg((F.count(F.lit(1)) / 6).alias("t"))
    )
    wed = deg.agg(
        (F.sum(F.col("k") * (F.col("k") - 1)).cast("double") / 2).alias(
            "w"
        )
    )
    return (
        mom.crossJoin(F.broadcast(tri))
        .crossJoin(F.broadcast(wed))
        .select(
            F.col("n").cast("long").alias("n_nodes"),
            F.col("t").cast("long").alias("n_triangles"),
            (
                F.round(3.0 * F.col("t") / F.col("w"), 6) + F.lit(0.0)
            ).alias("observed_clustering"),
            (
                F.round(
                    F.pow(F.col("k2") - F.col("k1"), 2)
                    / (F.col("n") * F.pow(F.col("k1"), 3)),
                    6,
                )
                + F.lit(0.0)
            ).alias("null_clustering"),
        )
    )


# Rolling 7-day regression beta of daily purchase mean on daily click
# mean: per day, the OLS slope over the trailing week's (x, y) pairs
# — the moving-exposure read finance calls rolling beta. Window
# moments are DECIMAL-quantized sums over ROWS BETWEEN 6 PRECEDING;
# the slope is closed-form per row.
@register(
    "rolling_beta_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(value AS DECIMAL(18,6)) END)
                    AS DOUBLE)
                    / SUM(CASE WHEN event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS DECIMAL(16,6)) AS y,
               CAST(CAST(SUM(CASE WHEN event_type = 'click'
                        THEN CAST(value AS DECIMAL(18,6)) END)
                    AS DOUBLE)
                    / SUM(CASE WHEN event_type = 'click'
                          THEN 1 ELSE 0 END) AS DECIMAL(16,6)) AS x
        FROM events WHERE event_type IN ('purchase', 'click')
        GROUP BY CAST(ts AS DATE)
    ),
    w AS (
        SELECT day,
               COUNT(*) OVER win AS n,
               CAST(SUM(x) OVER win AS DOUBLE) AS sx,
               CAST(SUM(y) OVER win AS DOUBLE) AS sy,
               CAST(SUM(x * x) OVER win AS DOUBLE) AS sxx,
               CAST(SUM(x * y) OVER win AS DOUBLE) AS sxy
        FROM daily
        WINDOW win AS (ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT day, CAST(n AS BIGINT) AS n_window,
           CAST(ROUND((sxy - sx * sy / n) / (sxx - sx * sx / n), 6)
               AS DOUBLE) + 0.0 AS beta
    FROM w WHERE n = 7
    """,
)
def rolling_beta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does purchase value track click value more tightly in some
    weeks? The windowed slope that granger_q summarizes globally."""
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
        .cast("decimal(16,6)")
        .alias("y"),
        (
            F.sum(F.when(F.col("event_type") == "click", v6))
            .cast("double")
            / F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            )
        )
        .cast("decimal(16,6)")
        .alias("x"),
    )
    win = Window.orderBy("day").rowsBetween(-6, 0)
    w = daily.select(
        "day",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum("x").over(win).cast("double").alias("sx"),
        F.sum("y").over(win).cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(win).cast("double").alias(
            "sxx"
        ),
        F.sum(F.col("x") * F.col("y")).over(win).cast("double").alias(
            "sxy"
        ),
    ).filter(F.col("n") == 7)
    n = F.col("n")
    beta = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / n
    )
    return w.select(
        "day",
        n.cast("long").alias("n_window"),
        (F.round(beta, 6) + F.lit(0.0)).alias("beta"),
    )


# Mantel-Haenszel pooled odds ratio for conversion (>= 1 purchase) by
# cohort, stratified by nation-of-... events carry no nation, so the
# strata are activity-count quartiles: OR_MH = sum(a d / n) /
# sum(b c / n) over strata 2x2 tables — the classic confounder-
# adjusted effect the crude odds_ratio_q ignores. Strata cells are
# exact integers; the two sums quantize per-stratum ratios.
@register(
    "mantel_haenszel_q",
    """
    WITH u AS (
        SELECT user_id, user_id % 2 AS w, COUNT(*) AS activity,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY user_id
    ),
    tiled AS (
        SELECT w, conv,
               NTILE(4) OVER (ORDER BY activity, user_id) AS s
        FROM u
    ),
    cells AS (
        SELECT s,
               SUM(CASE WHEN w = 1 AND conv = 1 THEN 1 ELSE 0 END)
                   AS a,
               SUM(CASE WHEN w = 1 AND conv = 0 THEN 1 ELSE 0 END)
                   AS b,
               SUM(CASE WHEN w = 0 AND conv = 1 THEN 1 ELSE 0 END)
                   AS c,
               SUM(CASE WHEN w = 0 AND conv = 0 THEN 1 ELSE 0 END)
                   AS d,
               COUNT(*) AS n
        FROM tiled GROUP BY s
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
           CAST(SUM(a + b + c + d) AS BIGINT) AS n_users,
           CAST(ROUND(CAST(SUM(CAST(CAST(a AS DOUBLE) * d / n
                    AS DECIMAL(28,12))) AS DOUBLE)
               / NULLIF(CAST(SUM(CAST(CAST(b AS DOUBLE) * c / n
                    AS DECIMAL(28,12))) AS DOUBLE), 0), 6) AS DOUBLE)
               + 0.0 AS or_mh
    FROM cells
    """,
)
def mantel_haenszel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The confounder-adjusted odds ratio: does the cohort effect on
    conversion survive once activity level is held fixed? Pairs with
    odds_ratio_q (crude) and ipw_ate_q (weighting instead of
    pooling)."""
    from iniz_exporters_spark.operators.indexing import global_ntile

    e = Catalog(spark, sf_dir).events
    u = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("activity"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    ).withColumn("w", F.col("user_id") % 2)
    tiled = global_ntile(
        u, [F.col("activity").asc(), F.col("user_id").asc()], 4, "s"
    )

    def cell(wv, cv):
        return F.sum(
            F.when(
                (F.col("w") == wv) & (F.col("conv") == cv), 1
            ).otherwise(0)
        )

    cells = tiled.groupBy("s").agg(
        cell(1, 1).alias("a"),
        cell(1, 0).alias("b"),
        cell(0, 1).alias("c"),
        cell(0, 0).alias("d"),
        F.count(F.lit(1)).alias("n"),
    )
    num = (F.col("a").cast("double") * F.col("d") / F.col("n")).cast(
        "decimal(28,12)"
    )
    den = (F.col("b").cast("double") * F.col("c") / F.col("n")).cast(
        "decimal(28,12)"
    )
    return cells.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum(
            F.col("a") + F.col("b") + F.col("c") + F.col("d")
        )
        .cast("long")
        .alias("n_users"),
        (
            F.round(
                F.sum(num).cast("double")
                / F.nullif(F.sum(den).cast("double"), F.lit(0.0)),
                6,
            )
            + F.lit(0.0)
        ).alias("or_mh"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 7 (continued): shift-share growth
# decomposition, hypergeometric enrichment, a Little's-law
# consistency audit over sessions, the two-sample quantile shift
# function, and the epidemiology 2x2 risk panel.
# ---------------------------------------------------------------------------


# Shift-share decomposition of each supplier nation's revenue growth
# between the first and last shipment year: growth = national effect
# (every nation grows at the aggregate rate) + industry-mix effect
# (the nation's brand portfolio) + competitive shift (the residual).
# Period revenues reduce exactly per (nation, brand); the
# decomposition is arithmetic on the small (nation x brand) table.
@register(
    "shift_share_q",
    """
    WITH nb AS (
        SELECT s.s_nationkey AS nat, p.p_brand AS brand,
               CAST(SUM(CASE WHEN year(l.l_shipdate) = 1995
                   THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                   AS r0,
               CAST(SUM(CASE WHEN year(l.l_shipdate) = 2001
                   THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                   AS r1
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE year(l.l_shipdate) IN (1995, 2001)
        GROUP BY s.s_nationkey, p.p_brand
    ),
    tot AS (
        SELECT CAST(SUM(CAST(r0 AS DECIMAL(28,6))) AS DOUBLE) AS t0,
               CAST(SUM(CAST(r1 AS DECIMAL(28,6))) AS DOUBLE) AS t1
        FROM nb
    ),
    br AS (
        SELECT brand,
               CAST(SUM(CAST(r0 AS DECIMAL(28,6))) AS DOUBLE) AS b0,
               CAST(SUM(CAST(r1 AS DECIMAL(28,6))) AS DOUBLE) AS b1
        FROM nb GROUP BY brand
    ),
    terms AS (
        SELECT nb.nat,
               CAST(nb.r1 - nb.r0 AS DECIMAL(28,6)) AS growth,
               CAST(nb.r0 * ((SELECT t1 / t0 FROM tot) - 1)
                   AS DECIMAL(28,6)) AS national,
               CAST(nb.r0 * (br.b1 / br.b0
                   - (SELECT t1 / t0 FROM tot)) AS DECIMAL(28,6))
                   AS mix
        FROM nb JOIN br ON br.brand = nb.brand
    )
    SELECT nat AS nationkey,
           CAST(ROUND(CAST(SUM(growth) AS DOUBLE), 2) AS DOUBLE) + 0.0
               AS total_growth,
           CAST(ROUND(CAST(SUM(national) AS DOUBLE), 2) AS DOUBLE)
               + 0.0 AS national_effect,
           CAST(ROUND(CAST(SUM(mix) AS DOUBLE), 2) AS DOUBLE) + 0.0
               AS industry_mix,
           CAST(ROUND(CAST(SUM(growth) AS DOUBLE)
               - CAST(SUM(national) AS DOUBLE)
               - CAST(SUM(mix) AS DOUBLE), 2) AS DOUBLE) + 0.0
               AS competitive_shift
    FROM terms GROUP BY nat
    """,
)
def shift_share_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did a nation grow because the market grew, because it held the
    right brands, or because it out-competed? The regional-economics
    decomposition over the (nation, brand, period) revenue cube."""
    li = Catalog(spark, sf_dir).lineitem.filter(
        F.year("l_shipdate").isin(1995, 2001)
    )
    s = Catalog(spark, sf_dir).supplier.select("s_suppkey", "s_nationkey")
    p = Catalog(spark, sf_dir).part.select("p_partkey", "p_brand")
    nb = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(
            F.col("s_nationkey").alias("nat"),
            F.col("p_brand").alias("brand"),
        )
        .agg(
            F.sum(
                F.when(
                    F.year("l_shipdate") == 1995,
                    _dec(F.col("l_extendedprice"), 18, 4),
                ).otherwise(F.lit(0).cast("decimal(18,4)"))
            )
            .cast("double")
            .alias("r0"),
            F.sum(
                F.when(
                    F.year("l_shipdate") == 2001,
                    _dec(F.col("l_extendedprice"), 18, 4),
                ).otherwise(F.lit(0).cast("decimal(18,4)"))
            )
            .cast("double")
            .alias("r1"),
        )
    )
    tot = nb.agg(
        F.sum(F.col("r0").cast("decimal(28,6)"))
        .cast("double")
        .alias("t0"),
        F.sum(F.col("r1").cast("decimal(28,6)"))
        .cast("double")
        .alias("t1"),
    )
    br = nb.groupBy("brand").agg(
        F.sum(F.col("r0").cast("decimal(28,6)"))
        .cast("double")
        .alias("b0"),
        F.sum(F.col("r1").cast("decimal(28,6)"))
        .cast("double")
        .alias("b1"),
    )
    g = F.col("t1") / F.col("t0")
    terms = (
        nb.join(F.broadcast(br), "brand")
        .crossJoin(F.broadcast(tot))
        .select(
            "nat",
            (F.col("r1") - F.col("r0"))
            .cast("decimal(28,6)")
            .alias("growth"),
            (F.col("r0") * (g - 1)).cast("decimal(28,6)").alias(
                "national"
            ),
            (F.col("r0") * (F.col("b1") / F.col("b0") - g))
            .cast("decimal(28,6)")
            .alias("mix"),
        )
    )
    return terms.groupBy(F.col("nat").alias("nationkey")).agg(
        (
            F.round(F.sum("growth").cast("double"), 2) + F.lit(0.0)
        ).alias("total_growth"),
        (
            F.round(F.sum("national").cast("double"), 2) + F.lit(0.0)
        ).alias("national_effect"),
        (
            F.round(F.sum("mix").cast("double"), 2) + F.lit(0.0)
        ).alias("industry_mix"),
        (
            F.round(
                F.sum("growth").cast("double")
                - F.sum("national").cast("double")
                - F.sum("mix").cast("double"),
                2,
            )
            + F.lit(0.0)
        ).alias("competitive_shift"),
    )


# Hypergeometric enrichment of each brand among the TOP-DECILE revenue
# parts: draw K = |top decile| parts from N with M of the brand; the
# normal-approximation z with continuity correction scores whether the
# brand is over-represented. The top-decile cut uses global_ntile on
# revenue; per-brand cells are exact integers.
@register(
    "enrichment_q",
    """
    WITH pr AS (
        SELECT p.p_brand AS brand, l.l_partkey,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)))
                   * 10000 AS BIGINT) AS rev_c
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand, l.l_partkey
    ),
    tiled AS (
        SELECT brand,
               NTILE(10) OVER (ORDER BY rev_c DESC, l_partkey) AS d
        FROM pr
    ),
    tot AS (
        SELECT COUNT(*) AS nn,
               SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS kk
        FROM tiled
    ),
    cells AS (
        SELECT brand, COUNT(*) AS m,
               SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS x
        FROM tiled GROUP BY brand
    )
    SELECT brand, CAST(m AS BIGINT) AS n_parts,
           CAST(x AS BIGINT) AS n_top_decile,
           CAST(ROUND(CAST(x AS DOUBLE)
               - CAST(m AS DOUBLE) * (SELECT kk FROM tot)
                 / (SELECT nn FROM tot), 4) AS DOUBLE) + 0.0
               AS excess,
           CAST(ROUND((x - CAST(m AS DOUBLE) * (SELECT kk FROM tot)
                   / (SELECT nn FROM tot) - 0.5)
               / sqrt(CAST(m AS DOUBLE) * (SELECT kk FROM tot)
                   / (SELECT nn FROM tot)
                   * (1 - CAST((SELECT kk FROM tot) AS DOUBLE)
                         / (SELECT nn FROM tot))
                   * (CAST((SELECT nn FROM tot) AS DOUBLE) - m)
                   / ((SELECT nn FROM tot) - 1)), 4) AS DOUBLE) + 0.0
               AS z_enrichment
    FROM cells
    """,
)
def enrichment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which brands punch above their weight in the revenue top
    decile? Hypergeometric z with continuity correction — the GSEA-
    style over-representation read on the part catalog."""
    from iniz_exporters_spark.operators.indexing import global_ntile

    li = Catalog(spark, sf_dir).lineitem
    p = Catalog(spark, sf_dir).part.select("p_partkey", "p_brand")
    pr = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"), "l_partkey")
        .agg(
            (F.sum(_dec(F.col("l_extendedprice"), 18, 4)) * 10000)
            .cast("long")
            .alias("rev_c")
        )
    )
    tiled = global_ntile(
        pr,
        [F.col("rev_c").desc(), F.col("l_partkey").asc()],
        10,
        "d",
    )
    tot = tiled.agg(
        F.count(F.lit(1)).alias("nn"),
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).alias("kk"),
    )
    cells = tiled.groupBy("brand").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).alias("x"),
    )
    j = cells.crossJoin(F.broadcast(tot))
    frac = F.col("kk").cast("double") / F.col("nn")
    mu = F.col("m").cast("double") * frac
    var = (
        mu
        * (1 - frac)
        * (F.col("nn").cast("double") - F.col("m"))
        / (F.col("nn") - 1)
    )
    return j.select(
        "brand",
        F.col("m").cast("long").alias("n_parts"),
        F.col("x").cast("long").alias("n_top_decile"),
        (F.round(F.col("x") - mu, 4) + F.lit(0.0)).alias("excess"),
        (
            F.round((F.col("x") - mu - 0.5) / F.sqrt(var), 4)
            + F.lit(0.0)
        ).alias("z_enrichment"),
    )


# Little's law audit over sessionized activity (30-minute gap
# sessions): L (time-average concurrent sessions) must equal
# lambda x W (arrival rate x mean duration) EXACTLY when measured
# over the same horizon — the audit reports both sides and their
# ratio, a sessionization-bug detector. Sessions are per-user islands
# (gaps-and-islands); L comes from total session-seconds / horizon.
# Zero-duration single-event sessions count toward lambda and W.
@register(
    "littles_law_q",
    """
    WITH ev AS (
        SELECT user_id, event_id, ts,
               CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(LAG(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
                        > 1800
                    OR LAG(ts) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM events
    ),
    sess AS (
        SELECT user_id,
               SUM(new_s) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS sid,
               ts
        FROM ev
    ),
    spans AS (
        SELECT user_id, sid,
               CAST(floor(epoch(MAX(ts))) AS BIGINT) - CAST(floor(epoch(MIN(ts))) AS BIGINT) AS dur
        FROM sess GROUP BY user_id, sid
    ),
    horizon AS (
        SELECT CAST(CAST(floor(epoch(MAX(ts))) AS BIGINT) - CAST(floor(epoch(MIN(ts))) AS BIGINT) AS DOUBLE) AS h
        FROM events
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(ROUND(CAST(SUM(dur) AS DOUBLE)
               / (SELECT h FROM horizon), 6) AS DOUBLE) + 0.0 AS l_avg,
           CAST(ROUND(COUNT(*) / (SELECT h FROM horizon) * 86400, 6)
               AS DOUBLE) + 0.0 AS lambda_per_day,
           CAST(ROUND(CAST(SUM(dur) AS DOUBLE) / COUNT(*), 4)
               AS DOUBLE) + 0.0 AS w_mean_sec,
           CAST(ROUND(CAST(SUM(dur) AS DOUBLE)
               / (SELECT h FROM horizon)
               / (COUNT(*) / (SELECT h FROM horizon)
                  * (CAST(SUM(dur) AS DOUBLE) / COUNT(*))), 6)
               AS DOUBLE) + 0.0 AS l_over_lambda_w
    FROM spans
    """,
)
def littles_law_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L = lambda W, measured three ways from the same sessionized
    stream; l_over_lambda_w != 1 means the sessionizer double-counts
    or drops spans (it is identically 1 here by construction — the
    audit's value is that it BREAKS when sessionization bugs appear)."""
    e = Catalog(spark, sf_dir).events
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(wu))
                > 1800
            )
            | F.lag("ts").over(wu).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    wcum = Window.partitionBy("user_id").orderBy(
        "ts", "event_id"
    ).rowsBetween(Window.unboundedPreceding, 0)
    sess = ev.select(
        "user_id", "ts", F.sum("new_s").over(wcum).alias("sid")
    )
    spans = sess.groupBy("user_id", "sid").agg(
        (
            F.unix_timestamp(F.max("ts"))
            - F.unix_timestamp(F.min("ts"))
        ).alias("dur")
    )
    horizon = e.agg(
        (
            F.unix_timestamp(F.max("ts"))
            - F.unix_timestamp(F.min("ts"))
        )
        .cast("double")
        .alias("h")
    )
    j = spans.crossJoin(F.broadcast(horizon))
    l_avg = F.sum("dur").cast("double") / F.max("h")
    lam = F.count(F.lit(1)) / F.max("h")
    wm = F.sum("dur").cast("double") / F.count(F.lit(1))
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        (F.round(l_avg, 6) + F.lit(0.0)).alias("l_avg"),
        (F.round(lam * 86400, 6) + F.lit(0.0)).alias("lambda_per_day"),
        (F.round(wm, 4) + F.lit(0.0)).alias("w_mean_sec"),
        (
            F.round(l_avg / (lam * wm), 6) + F.lit(0.0)
        ).alias("l_over_lambda_w"),
    )


# Two-sample quantile shift function: at each population decile, the
# difference between the two cohorts' per-user purchase-total
# quantiles (decile upper bounds via per-cohort ANSI NTILE from
# grouped_ntile — range-partitioned, never a per-cohort corpus
# window). WHERE the distributions differ, not just whether
# (ks_test_q) or by how much on average (welch_ttest_q).
@register(
    "shift_function_q",
    """
    WITH u AS (
        SELECT user_id, user_id % 2 AS grp,
               SUM(CAST(value AS DECIMAL(18,6))) AS y
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    tiled AS (
        SELECT grp, y,
               NTILE(10) OVER (PARTITION BY grp
                   ORDER BY y, user_id) AS d
        FROM u
    ),
    qb AS (
        SELECT grp, d, MAX(y) AS q FROM tiled GROUP BY grp, d
    )
    SELECT a.d AS decile,
           CAST(ROUND(CAST(a.q AS DOUBLE), 2) AS DOUBLE) + 0.0
               AS q_g0,
           CAST(ROUND(CAST(b.q AS DOUBLE), 2) AS DOUBLE) + 0.0
               AS q_g1,
           CAST(ROUND(CAST(b.q - a.q AS DOUBLE), 2) AS DOUBLE) + 0.0
               AS shift
    FROM qb a JOIN qb b ON b.d = a.d AND a.grp = 0 AND b.grp = 1
    """,
)
def shift_function_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the cohort gap live in the whole distribution or only its
    tail? Decile-by-decile quantile differences — the robust-stats
    shift function."""
    from iniz_exporters_spark.operators.indexing import grouped_ntile

    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    u = e.groupBy("user_id").agg(
        F.sum(_dec(F.col("value"), 18, 6)).alias("y")
    ).withColumn("grp", F.col("user_id") % 2)
    tiled = grouped_ntile(
        u, ["grp"], [F.col("y").asc(), F.col("user_id").asc()], 10, "d"
    )
    qb = tiled.groupBy("grp", "d").agg(F.max("y").alias("q"))
    a = qb.filter(F.col("grp") == 0).select(
        F.col("d"), F.col("q").alias("qa")
    )
    b = qb.filter(F.col("grp") == 1).select(
        F.col("d").alias("db"), F.col("q").alias("qb")
    )
    return a.join(b, a["d"] == b["db"]).select(
        F.col("d").alias("decile"),
        (F.round(F.col("qa").cast("double"), 2) + F.lit(0.0)).alias(
            "q_g0"
        ),
        (F.round(F.col("qb").cast("double"), 2) + F.lit(0.0)).alias(
            "q_g1"
        ),
        (
            F.round((F.col("qb") - F.col("qa")).cast("double"), 2)
            + F.lit(0.0)
        ).alias("shift"),
    )


# Epidemiology 2x2 risk panel for conversion by cohort: risk in each
# arm, risk difference, risk ratio, and the attributable fraction
# among the exposed (RR - 1)/RR — the absolute-scale companions the
# odds ratio hides. Exact integer cells from one pass.
@register(
    "attributable_risk_q",
    """
    WITH u AS (
        SELECT user_id % 2 AS w,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY user_id
    ),
    cells AS (
        SELECT SUM(CASE WHEN w = 1 AND conv = 1 THEN 1 ELSE 0 END)
                   AS a,
               SUM(CASE WHEN w = 1 THEN 1 ELSE 0 END) AS n1,
               SUM(CASE WHEN w = 0 AND conv = 1 THEN 1 ELSE 0 END)
                   AS c,
               SUM(CASE WHEN w = 0 THEN 1 ELSE 0 END) AS n0
        FROM u
    )
    SELECT CAST(ROUND(CAST(a AS DOUBLE) / n1, 6) AS DOUBLE) + 0.0
               AS risk_exposed,
           CAST(ROUND(CAST(c AS DOUBLE) / n0, 6) AS DOUBLE) + 0.0
               AS risk_unexposed,
           CAST(ROUND(CAST(a AS DOUBLE) / n1
               - CAST(c AS DOUBLE) / n0, 6) AS DOUBLE) + 0.0
               AS risk_difference,
           CAST(ROUND((CAST(a AS DOUBLE) / n1)
               / NULLIF(CAST(c AS DOUBLE) / n0, 0), 6) AS DOUBLE)
               + 0.0 AS risk_ratio,
           CAST(ROUND(1 - NULLIF(CAST(c AS DOUBLE) / n0, 0)
               / (CAST(a AS DOUBLE) / n1), 6) AS DOUBLE) + 0.0
               AS attributable_fraction
    FROM cells
    """,
)
def attributable_risk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absolute-risk view of the cohort conversion gap: difference,
    ratio, and the share of exposed conversions the exposure itself
    accounts for — what odds_ratio_q cannot say when conversion is
    common."""
    e = Catalog(spark, sf_dir).events
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    ).withColumn("w", F.col("user_id") % 2)
    cells = u.agg(
        F.sum(
            F.when((F.col("w") == 1) & (F.col("conv") == 1), 1).otherwise(
                0
            )
        ).alias("a"),
        F.sum(F.when(F.col("w") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(
            F.when((F.col("w") == 0) & (F.col("conv") == 1), 1).otherwise(
                0
            )
        ).alias("c"),
        F.sum(F.when(F.col("w") == 0, 1).otherwise(0)).alias("n0"),
    )
    r1 = F.col("a").cast("double") / F.col("n1")
    r0 = F.col("c").cast("double") / F.col("n0")
    return cells.select(
        (F.round(r1, 6) + F.lit(0.0)).alias("risk_exposed"),
        (F.round(r0, 6) + F.lit(0.0)).alias("risk_unexposed"),
        (F.round(r1 - r0, 6) + F.lit(0.0)).alias("risk_difference"),
        (
            F.round(r1 / F.nullif(r0, F.lit(0.0)), 6) + F.lit(0.0)
        ).alias("risk_ratio"),
        (
            F.round(1 - F.nullif(r0, F.lit(0.0)) / r1, 6) + F.lit(0.0)
        ).alias("attributable_fraction"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 7 (continued): mediation (product of
# coefficients), regression discontinuity, the Chow structural-break
# F, the X-bar/R control pair, and box-counting dimension.
# ---------------------------------------------------------------------------


# Baron-Kenny mediation with X = cohort (parity), M = per-user click
# total, Y = per-user purchase total: a = E[M|X=1] - E[M|X=0];
# (c', b) from the two-regressor OLS of Y on (X, M) via 2x2 normal
# equations; indirect effect = a*b, total c = c' + a*b (exactly, by
# OLS algebra). All nine moments from one exact-DECIMAL pass.
@register(
    "mediation_q",
    """
    WITH u AS (
        SELECT CAST(user_id % 2 AS DOUBLE) AS x,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'click'
                   THEN CAST(value AS DECIMAL(18,6)) END),
                   CAST(0 AS DECIMAL(18,6))) AS DECIMAL(16,6)) AS mm,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(value AS DECIMAL(18,6)) END),
                   CAST(0 AS DECIMAL(18,6))) AS DECIMAL(16,6)) AS y
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(mm) AS DOUBLE) AS sm,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               -- width >= 19 keeps DuckDB's decimal multiply on the
               -- int128 path (the Spark twin stays at 16,6 — exact)
               CAST(SUM(CAST(mm AS DECIMAL(19,6))
                        * CAST(mm AS DECIMAL(19,6))) AS DOUBLE) AS smm,
               -- x is 0/1: keep these EXACT decimal sums, not double
               -- accumulations whose order could drift at scale
               CAST(SUM(CASE WHEN x = 1 THEN mm
                        ELSE CAST(0 AS DECIMAL(16,6)) END) AS DOUBLE)
                   AS sxm,
               CAST(SUM(CASE WHEN x = 1 THEN y
                        ELSE CAST(0 AS DECIMAL(16,6)) END) AS DOUBLE)
                   AS sxy,
               CAST(SUM(CAST(mm AS DECIMAL(19,6))
                        * CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS smy
        FROM u
    ),
    c AS (
        SELECT n,
               sxx - sx * sx / n AS cxx,
               smm - sm * sm / n AS cmm,
               sxm - sx * sm / n AS cxm,
               sxy - sx * sy / n AS cxy,
               smy - sm * sy / n AS cmy
        FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(ROUND(cxm / cxx, 6) AS DOUBLE) + 0.0 AS a_path,
           CAST(ROUND((cmy * cxx - cxy * cxm)
               / (cmm * cxx - cxm * cxm), 6) AS DOUBLE) + 0.0
               AS b_path,
           CAST(ROUND((cxy * cmm - cmy * cxm)
               / (cmm * cxx - cxm * cxm), 6) AS DOUBLE) + 0.0
               AS direct_c_prime,
           CAST(ROUND((cxm / cxx)
               * ((cmy * cxx - cxy * cxm)
                  / (cmm * cxx - cxm * cxm)), 6) AS DOUBLE) + 0.0
               AS indirect_ab,
           CAST(ROUND(cxy / cxx, 6) AS DOUBLE) + 0.0 AS total_c
    FROM c
    """,
)
def mediation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of the cohort effect on purchases flows THROUGH click
    behavior? total_c = direct + indirect holds exactly (OLS algebra)
    — a built-in consistency check across the three columns."""
    e = Catalog(spark, sf_dir).events

    def tsum(et):
        return F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == et, _dec(F.col("value"), 18, 6)
                )
            ),
            F.lit(0).cast("decimal(18,6)"),
        ).cast("decimal(16,6)")

    u = e.groupBy("user_id").agg(
        tsum("click").alias("mm"), tsum("purchase").alias("y")
    ).select(
        (F.col("user_id") % 2).cast("double").alias("x"), "mm", "y"
    )
    s = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("mm").cast("double").alias("sm"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("mm") * F.col("mm")).cast("double").alias("smm"),
        F.sum(
            F.when(F.col("x") == 1, F.col("mm")).otherwise(
                F.lit(0).cast("decimal(16,6)")
            )
        )
        .cast("double")
        .alias("sxm"),
        F.sum(
            F.when(F.col("x") == 1, F.col("y")).otherwise(
                F.lit(0).cast("decimal(16,6)")
            )
        )
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("mm") * F.col("y")).cast("double").alias("smy"),
    )
    n = F.col("n")
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    cmm = F.col("smm") - F.col("sm") * F.col("sm") / n
    cxm = F.col("sxm") - F.col("sx") * F.col("sm") / n
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / n
    cmy = F.col("smy") - F.col("sm") * F.col("sy") / n
    det = cmm * cxx - cxm * cxm
    a = cxm / cxx
    b = (cmy * cxx - cxy * cxm) / det
    cprime = (cxy * cmm - cmy * cxm) / det
    return s.select(
        n.cast("long").alias("n_users"),
        (F.round(a, 6) + F.lit(0.0)).alias("a_path"),
        (F.round(b, 6) + F.lit(0.0)).alias("b_path"),
        (F.round(cprime, 6) + F.lit(0.0)).alias("direct_c_prime"),
        (F.round(a * b, 6) + F.lit(0.0)).alias("indirect_ab"),
        (F.round(cxy / cxx, 6) + F.lit(0.0)).alias("total_c"),
    )


# Sharp regression discontinuity at the median activity count:
# running variable r = activity - cutoff, treatment = r >= 0, local
# linear fits on both sides within a bandwidth of 10 activity units;
# the effect is the intercept gap at the cutoff. Side fits are
# closed-form OLS on exact moments; the cutoff is the lower-median
# activity (deterministic order statistic).
@register(
    "rdd_q",
    """
    WITH u AS (
        SELECT user_id, COUNT(*) AS act,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(value AS DECIMAL(18,6)) END),
                   CAST(0 AS DECIMAL(18,6))) AS DECIMAL(16,6)) AS y
        FROM events GROUP BY user_id
    ),
    cut AS (
        SELECT act AS c FROM (
            SELECT act, ROW_NUMBER() OVER (ORDER BY act, user_id)
                       AS k,
                   COUNT(*) OVER () AS n
            FROM u
        ) WHERE k = (n + 1) // 2
    ),
    loc AS (
        SELECT CAST(act - (SELECT c FROM cut) AS DOUBLE) AS r,
               CAST(y AS DOUBLE) AS y,
               act >= (SELECT c FROM cut) AS side
        FROM u
        WHERE abs(act - (SELECT c FROM cut)) <= 10
    ),
    fits AS (
        SELECT side, COUNT(*) AS n,
               CAST(SUM(CAST(r AS DECIMAL(28,12))) AS DOUBLE) AS sr,
               CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(r * r AS DECIMAL(28,12))) AS DOUBLE)
                   AS srr,
               CAST(SUM(CAST(r * y AS DECIMAL(28,12))) AS DOUBLE)
                   AS sry
        FROM loc GROUP BY side
    ),
    ab AS (
        SELECT side, n,
               (sry - sr * sy / n) / (srr - sr * sr / n) AS slope,
               sy / n - (sry - sr * sy / n) / (srr - sr * sr / n)
                   * sr / n AS icpt
        FROM fits
    )
    SELECT CAST((SELECT c FROM cut) AS BIGINT) AS cutoff_activity,
           CAST(MAX(CASE WHEN side THEN n END) AS BIGINT) AS n_right,
           CAST(MAX(CASE WHEN NOT side THEN n END) AS BIGINT)
               AS n_left,
           CAST(ROUND(MAX(CASE WHEN side THEN icpt END)
               - MAX(CASE WHEN NOT side THEN icpt END), 4) AS DOUBLE)
               + 0.0 AS rdd_effect
    FROM ab
    """,
)
def rdd_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does crossing the median-activity threshold jump purchase
    value beyond what the trend predicts? Sharp RDD with local linear
    sides — the third leg of the causal triad next to did_q and
    ipw_ate_q."""
    e = Catalog(spark, sf_dir).events
    u = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("act"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    _dec(F.col("value"), 18, 6),
                )
            ),
            F.lit(0).cast("decimal(18,6)"),
        )
        .cast("decimal(16,6)")
        .alias("y"),
    )
    wk = Window.orderBy("act", "user_id")
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cut = (
        u.select(
            "act",
            F.row_number().over(wk).alias("k"),
            F.count(F.lit(1)).over(wt).alias("n"),
        )
        .filter(F.col("k") == F.expr("(n + 1) div 2"))
        .select(F.col("act").alias("c"))
    )
    loc = (
        u.crossJoin(F.broadcast(cut))
        .filter(F.abs(F.col("act") - F.col("c")) <= 10)
        .select(
            (F.col("act") - F.col("c")).cast("double").alias("r"),
            F.col("y").cast("double").alias("y"),
            (F.col("act") >= F.col("c")).alias("side"),
            "c",
        )
    )
    fits = loc.groupBy("side").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("r")).cast("double").alias("sr"),
        _dsum(F.col("y")).cast("double").alias("sy"),
        _dsum(F.col("r") * F.col("r")).cast("double").alias("srr"),
        _dsum(F.col("r") * F.col("y")).cast("double").alias("sry"),
        F.max("c").alias("c"),
    )
    n = F.col("n")
    slope = (F.col("sry") - F.col("sr") * F.col("sy") / n) / (
        F.col("srr") - F.col("sr") * F.col("sr") / n
    )
    icpt = F.col("sy") / n - slope * F.col("sr") / n
    ab = fits.select("side", "n", "c", icpt.alias("icpt"))
    return ab.agg(
        F.max("c").cast("long").alias("cutoff_activity"),
        F.max(F.when(F.col("side"), F.col("n")))
        .cast("long")
        .alias("n_right"),
        F.max(F.when(~F.col("side"), F.col("n")))
        .cast("long")
        .alias("n_left"),
        (
            F.round(
                F.max(F.when(F.col("side"), F.col("icpt")))
                - F.max(F.when(~F.col("side"), F.col("icpt"))),
                4,
            )
            + F.lit(0.0)
        ).alias("rdd_effect"),
    )


# Chow structural-break F-test at the known mid-month date: pooled
# OLS SSE vs the sum of the two sides' SSEs,
# F = ((SSE_p - SSE_1 - SSE_2)/k) / ((SSE_1 + SSE_2)/(n - 2k)),
# k = 2 (intercept + slope). The inference companion to
# trend_break_q's exhaustive search: all three fits are closed-form
# moments over the calendar-bounded daily frame.
@register(
    "chow_test_q",
    """
    WITH daily AS (
        SELECT ROW_NUMBER() OVER (ORDER BY CAST(ts AS DATE)) AS t,
               CAST(ts AS DATE) >= DATE '2024-01-16' AS post,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(16,6)) AS y
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    fits AS (
        SELECT grp, COUNT(*) AS n,
               CAST(SUM(t) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(CAST(t AS BIGINT) * t) AS DOUBLE) AS sxx,
               CAST(SUM(t * y) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(y AS DECIMAL(19,6))
                        * CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS syy
        FROM (
            SELECT 'pool' AS grp, t, y FROM daily
            UNION ALL
            SELECT CASE WHEN post THEN 'post' ELSE 'pre' END, t, y
            FROM daily
        ) GROUP BY grp
    ),
    sse AS (
        SELECT grp, n,
               (syy - sy * sy / n)
                 - (sxy - sx * sy / n) * (sxy - sx * sy / n)
                   / (sxx - sx * sx / n) AS e
        FROM fits
    )
    SELECT CAST(MAX(CASE WHEN grp = 'pool' THEN n END) AS BIGINT)
               AS n_days,
           CAST(ROUND(MAX(CASE WHEN grp = 'pool' THEN e END), 4)
               AS DOUBLE) + 0.0 AS sse_pooled,
           CAST(ROUND(MAX(CASE WHEN grp = 'pre' THEN e END)
               + MAX(CASE WHEN grp = 'post' THEN e END), 4)
               AS DOUBLE) + 0.0 AS sse_split,
           CAST(ROUND(((MAX(CASE WHEN grp = 'pool' THEN e END)
                 - MAX(CASE WHEN grp = 'pre' THEN e END)
                 - MAX(CASE WHEN grp = 'post' THEN e END)) / 2)
               / ((MAX(CASE WHEN grp = 'pre' THEN e END)
                   + MAX(CASE WHEN grp = 'post' THEN e END))
                  / (MAX(CASE WHEN grp = 'pool' THEN n END) - 4)),
               6) AS DOUBLE) + 0.0 AS chow_f
    FROM sse
    """,
)
def chow_test_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did the trend line CHANGE at the known mid-month cutoff?
    F compares the pooled fit against free fits per regime — did_q's
    mean-shift question asked of the whole line."""
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
            .cast("decimal(16,6)")
            .alias("y")
        )
        .select(
            F.row_number().over(wday).alias("t"),
            (F.col("day") >= F.lit("2024-01-16")).alias("post"),
            "y",
        )
    )
    pool = daily.select(F.lit("pool").alias("grp"), "t", "y")
    split = daily.select(
        F.when(F.col("post"), "post").otherwise("pre").alias("grp"),
        "t",
        "y",
    )
    fits = pool.unionByName(split).groupBy("grp").agg(
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
    e_expr = (
        F.col("syy")
        - F.col("sy") * F.col("sy") / n
        - (F.col("sxy") - F.col("sx") * F.col("sy") / n)
        * (F.col("sxy") - F.col("sx") * F.col("sy") / n)
        / (F.col("sxx") - F.col("sx") * F.col("sx") / n)
    )
    sse = fits.select("grp", "n", e_expr.alias("e"))

    def at(g, col):
        return F.max(F.when(F.col("grp") == g, F.col(col)))

    num = (at("pool", "e") - at("pre", "e") - at("post", "e")) / 2
    den = (at("pre", "e") + at("post", "e")) / (at("pool", "n") - 4)
    return sse.agg(
        at("pool", "n").cast("long").alias("n_days"),
        (F.round(at("pool", "e"), 4) + F.lit(0.0)).alias("sse_pooled"),
        (
            F.round(at("pre", "e") + at("post", "e"), 4) + F.lit(0.0)
        ).alias("sse_split"),
        (F.round(num / den, 6) + F.lit(0.0)).alias("chow_f"),
    )


# X-bar / R control pair over weekly subgroups of daily revenue
# (n = 7 weekdays per subgroup, dropping partial weeks): subgroup
# means and ranges, R-bar, and the classic constants for n = 7
# (A2 = 0.419, D3 = 0.076, D4 = 1.924) give both charts' limits;
# flags subgroups out of control on either chart. Exact decimal
# subgroup statistics; the constants are published literals.
@register(
    "xbar_r_q",
    """
    WITH daily AS (
        SELECT ROW_NUMBER() OVER (ORDER BY CAST(ts AS DATE)) - 1 AS i,
               SUM(CAST(value AS DECIMAL(18,6))) AS rev
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    sub AS (
        SELECT i // 7 AS wk, COUNT(*) AS n,
               CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS xbar,
               CAST(MAX(rev) - MIN(rev) AS DOUBLE) AS r
        FROM daily GROUP BY i // 7 HAVING COUNT(*) = 7
    ),
    lims AS (
        SELECT CAST(SUM(CAST(xbar AS DECIMAL(28,12))) AS DOUBLE)
                   / COUNT(*) AS xbb,
               CAST(SUM(CAST(r AS DECIMAL(28,12))) AS DOUBLE)
                   / COUNT(*) AS rbar
        FROM sub
    )
    SELECT CAST(wk AS BIGINT) AS week,
           CAST(ROUND(xbar, 4) AS DOUBLE) + 0.0 AS xbar,
           CAST(ROUND(r, 4) AS DOUBLE) + 0.0 AS r,
           xbar > (SELECT xbb + 0.419 * rbar FROM lims)
           OR xbar < (SELECT xbb - 0.419 * rbar FROM lims)
               AS xbar_violation,
           r > (SELECT 1.924 * rbar FROM lims)
           OR r < (SELECT 0.076 * rbar FROM lims) AS r_violation
    FROM sub
    """,
)
def xbar_r_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Shewhart pair: is the weekly LEVEL stable (X-bar chart)
    and is the within-week SPREAD stable (R chart)? Complements
    ewma_control_q, which catches smaller sustained drifts."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    wday = Window.orderBy("day")
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(_dec(F.col("value"), 18, 6)).alias("rev"))
        .select((F.row_number().over(wday) - 1).alias("i"), "rev")
    )
    sub = (
        daily.groupBy(F.expr("i div 7").alias("wk"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("rev").cast("double") / F.count(F.lit(1))).alias(
                "xbar"
            ),
            (F.max("rev") - F.min("rev")).cast("double").alias("r"),
        )
        .filter(F.col("n") == 7)
    )
    lims = sub.agg(
        (
            _dsum(F.col("xbar")).cast("double") / F.count(F.lit(1))
        ).alias("xbb"),
        (_dsum(F.col("r")).cast("double") / F.count(F.lit(1))).alias(
            "rbar"
        ),
    )
    j = sub.crossJoin(F.broadcast(lims))
    return j.select(
        F.col("wk").cast("long").alias("week"),
        (F.round(F.col("xbar"), 4) + F.lit(0.0)).alias("xbar"),
        (F.round(F.col("r"), 4) + F.lit(0.0)).alias("r"),
        (
            (F.col("xbar") > F.col("xbb") + 0.419 * F.col("rbar"))
            | (F.col("xbar") < F.col("xbb") - 0.419 * F.col("rbar"))
        ).alias("xbar_violation"),
        (
            (F.col("r") > 1.924 * F.col("rbar"))
            | (F.col("r") < 0.076 * F.col("rbar"))
        ).alias("r_violation"),
    )


# Box-counting dimension of the 2-D embedding cloud: occupied-cell
# counts at grid scales {0.05, 0.1, 0.2, 0.4}, then the OLS slope of
# ln(boxes) on ln(1/s) — the fractal companion to twonn_dim_q's
# nearest-neighbor estimate. Cell keys are floor arithmetic on the
# raw doubles (identical in both engines); the regression runs on a
# 4-row table.
@register(
    "box_counting_q",
    """
    WITH scales AS (
        SELECT CAST(unnest([0.05, 0.1, 0.2, 0.4]) AS DOUBLE) AS s
    ),
    cells AS (
        SELECT s, COUNT(DISTINCT (
                   CAST(floor(CAST(embedding[1] AS DOUBLE) / s)
                       AS BIGINT) * 1000000
                   + CAST(floor(CAST(embedding[2] AS DOUBLE) / s)
                       AS BIGINT))) AS boxes
        FROM embeddings CROSS JOIN scales
        GROUP BY s
    ),
    pts AS (
        SELECT ln(1.0 / s) AS x, ln(CAST(boxes AS DOUBLE)) AS y
        FROM cells
    ),
    fit AS (
        SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(x * y) AS sxy
        FROM pts
    )
    SELECT CAST((SELECT MAX(boxes) FROM cells) AS BIGINT)
               AS boxes_finest,
           CAST(ROUND((sxy - sx * sy / n) / (sxx - sx * sx / n), 4)
               AS DOUBLE) + 0.0 AS box_dimension
    FROM fit
    """,
)
def box_counting_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The occupancy-scaling dimension of the embedding projection —
    near 2 for space-filling clouds, lower for filamented/clustered
    structure (twonn_dim_q asks the same of the full 64-dim space)."""
    emb = Catalog(spark, sf_dir).embeddings
    scales = metadata_df(emb.sparkSession,
        [(0.05,), (0.1,), (0.2,), (0.4,)], "s double"
    )
    key = (
        F.floor(
            F.element_at("embedding", 1).cast("double") / F.col("s")
        ).cast("long")
        * 1000000
        + F.floor(
            F.element_at("embedding", 2).cast("double") / F.col("s")
        ).cast("long")
    )
    cells = (
        emb.crossJoin(F.broadcast(scales))
        .select("s", key.alias("cell"))
        .groupBy("s")
        .agg(F.countDistinct("cell").alias("boxes"))
    )
    pts = cells.select(
        F.log(1.0 / F.col("s")).alias("x"),
        F.log(F.col("boxes").cast("double")).alias("y"),
    )
    fit = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    mx = cells.agg(F.max("boxes").alias("bf"))
    n = F.col("n")
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / n
    )
    return fit.crossJoin(F.broadcast(mx)).select(
        F.col("bf").cast("long").alias("boxes_finest"),
        (F.round(slope, 4) + F.lit(0.0)).alias("box_dimension"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 7 (final): capture-recapture population
# estimation, Chao1 unseen-species richness, the decision-stump Gini
# split, Kendall's W concordance, and variance inflation factors.
# ---------------------------------------------------------------------------


# Lincoln-Petersen capture-recapture estimate of the true user
# universe from two independent "capture" windows (first vs second
# half of the month): N-hat = n1 n2 / m (Chapman small-sample form
# (n1+1)(n2+1)/(m+1) - 1 reported too). The dedup-rate companion:
# how many users exist that NEITHER window saw? Exact integer counts
# from one pass.
@register(
    "capture_recapture_q",
    """
    WITH w AS (
        SELECT user_id,
               MAX(CASE WHEN ts < TIMESTAMP '2024-01-16'
                   THEN 1 ELSE 0 END) AS w1,
               MAX(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                   THEN 1 ELSE 0 END) AS w2
        FROM events GROUP BY user_id
    ),
    c AS (
        SELECT SUM(w1) AS n1, SUM(w2) AS n2,
               SUM(w1 * w2) AS m, COUNT(*) AS seen
        FROM w
    )
    SELECT CAST(n1 AS BIGINT) AS n_window1,
           CAST(n2 AS BIGINT) AS n_window2,
           CAST(m AS BIGINT) AS n_both,
           CAST(seen AS BIGINT) AS n_seen_total,
           CAST(ROUND(CAST(n1 AS DOUBLE) * n2 / m, 4) AS DOUBLE) + 0.0
               AS lincoln_petersen,
           CAST(ROUND(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1,
               4) AS DOUBLE) + 0.0 AS chapman
    FROM c
    """,
)
def capture_recapture_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mark-recapture estimate of how many users exist, from two
    half-month sightings — ecology's answer to 'how complete is our
    user table?'."""
    e = Catalog(spark, sf_dir).events
    w = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("ts") < F.lit("2024-01-16"), 1).otherwise(0)
        ).alias("w1"),
        F.max(
            F.when(F.col("ts") >= F.lit("2024-01-16"), 1).otherwise(0)
        ).alias("w2"),
    )
    c = w.agg(
        F.sum("w1").alias("n1"),
        F.sum("w2").alias("n2"),
        F.sum(F.col("w1") * F.col("w2")).alias("m"),
        F.count(F.lit(1)).alias("seen"),
    )
    return c.select(
        F.col("n1").cast("long").alias("n_window1"),
        F.col("n2").cast("long").alias("n_window2"),
        F.col("m").cast("long").alias("n_both"),
        F.col("seen").cast("long").alias("n_seen_total"),
        (
            F.round(
                F.col("n1").cast("double") * F.col("n2") / F.col("m"), 4
            )
            + F.lit(0.0)
        ).alias("lincoln_petersen"),
        (
            F.round(
                (F.col("n1") + 1).cast("double")
                * (F.col("n2") + 1)
                / (F.col("m") + 1)
                - 1,
                4,
            )
            + F.lit(0.0)
        ).alias("chapman"),
    )


# Chao1 estimate of the TRUE vocabulary size from observed token
# frequencies: S_chao1 = S_obs + f1^2 / (2 f2) with singletons f1 and
# doubletons f2 — how many word types the corpus has NOT yet shown
# us (good_turing_q prices their probability mass; Chao1 counts
# them). One vocabulary-keyed aggregation; the estimator is scalar
# arithmetic on three integers.
@register(
    "chao1_q",
    f"""
    WITH tok AS (
        SELECT unnest({_SQL_TOKENS}) AS w FROM documents
    ),
    vocab AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    ff AS (
        SELECT COUNT(*) AS s_obs,
               SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
               SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2
        FROM vocab
    )
    SELECT CAST(s_obs AS BIGINT) AS s_observed,
           CAST(f1 AS BIGINT) AS singletons,
           CAST(f2 AS BIGINT) AS doubletons,
           -- bias-corrected Chao1: defined even when f2 = 0
           CAST(ROUND(s_obs + CAST(f1 AS DOUBLE) * (f1 - 1)
               / (2.0 * (f2 + 1)), 4) AS DOUBLE) + 0.0 AS chao1,
           CAST(ROUND(CAST(s_obs AS DOUBLE)
               / (s_obs + CAST(f1 AS DOUBLE) * (f1 - 1)
                  / (2.0 * (f2 + 1))), 6) AS DOUBLE) + 0.0
               AS coverage
    FROM ff
    """,
)
def chao1_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much vocabulary is still unseen? The richness estimate
    behind 'is more data worth it' — heaps_law_q extrapolates the
    curve; Chao1 bounds its asymptote from singleton/doubleton
    counts alone."""
    d = Catalog(spark, sf_dir).documents
    tok = d.select(F.explode(_tokens("text")).alias("w"))
    vocab = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    ff = vocab.agg(
        F.count(F.lit(1)).alias("s_obs"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("f2"),
    )
    # bias-corrected form: defined even when no doubletons exist
    chao = F.col("s_obs") + F.col("f1").cast("double") * (
        F.col("f1") - 1
    ) / (2.0 * (F.col("f2") + 1))
    return ff.select(
        F.col("s_obs").cast("long").alias("s_observed"),
        F.col("f1").cast("long").alias("singletons"),
        F.col("f2").cast("long").alias("doubletons"),
        (F.round(chao, 4) + F.lit(0.0)).alias("chao1"),
        (
            F.round(F.col("s_obs").cast("double") / chao, 6)
            + F.lit(0.0)
        ).alias("coverage"),
    )


# Decision-stump Gini split: the single account-balance threshold
# that best separates converting from non-converting customers
# (customers of nations 0-4 labeled by negative balance as the
# stand-in target). Candidate thresholds are the distinct 2-dp
# balances (bounded grid via integer cents); impurity decrease uses
# cumulative class counts over the threshold table — the roc_auc_q
# shape pointed at CART's split criterion. Ties -> smallest
# threshold.
@register(
    "gini_split_q",
    """
    WITH pts AS (
        SELECT CAST(floor(c_acctbal) AS BIGINT) AS v,
               CASE WHEN c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
                    THEN 1 ELSE 0 END AS y
        FROM customer
    ),
    g AS (
        SELECT v, COUNT(*) AS n, SUM(y) AS pos FROM pts GROUP BY v
    ),
    c AS (
        SELECT v,
               SUM(n) OVER (ORDER BY v) AS nl,
               SUM(pos) OVER (ORDER BY v) AS pl,
               SUM(n) OVER () AS nt, SUM(pos) OVER () AS pt
        FROM g
    ),
    scored AS (
        SELECT v, nl, nt - nl AS nr,
               1.0 * nl / nt * (1 - pow(1.0 * pl / nl, 2)
                   - pow(1.0 - 1.0 * pl / nl, 2))
               + 1.0 * (nt - nl) / nt
                 * (1 - pow(1.0 * (pt - pl) / (nt - nl), 2)
                    - pow(1.0 - 1.0 * (pt - pl) / (nt - nl), 2))
                   AS gini_after,
               1 - pow(1.0 * pt / nt, 2) - pow(1 - 1.0 * pt / nt, 2)
                   AS gini_before
        FROM c WHERE nl < nt
    ),
    best AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY gini_after, v) AS rk
        FROM scored
    )
    SELECT CAST(v AS BIGINT) AS split_at,
           CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
           CAST(ROUND(gini_before, 6) AS DOUBLE) + 0.0 AS gini_before,
           CAST(ROUND(gini_after, 6) AS DOUBLE) + 0.0 AS gini_after,
           CAST(ROUND(gini_before - gini_after, 6) AS DOUBLE) + 0.0
               AS impurity_decrease
    FROM best WHERE rk = 1
    """,
)
def gini_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CART's first question: the balance threshold that best splits
    the two big segments from the rest — weighted Gini impurity over
    cumulative counts on the bounded integer-floor threshold grid."""
    c = Catalog(spark, sf_dir).customer
    pts = c.select(
        F.floor(F.col("c_acctbal")).cast("long").alias("v"),
        F.when(
            F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"), 1
        )
        .otherwise(0)
        .alias("y"),
    )
    g = pts.groupBy("v").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cc = g.select(
        "v",
        F.sum("n").over(wc).alias("nl"),
        F.sum("pos").over(wc).alias("pl"),
        F.sum("n").over(wt).alias("nt"),
        F.sum("pos").over(wt).alias("pt"),
    ).filter(F.col("nl") < F.col("nt"))
    pl_frac = 1.0 * F.col("pl") / F.col("nl")
    pr_frac = (
        1.0 * (F.col("pt") - F.col("pl")) / (F.col("nt") - F.col("nl"))
    )
    gini_after = 1.0 * F.col("nl") / F.col("nt") * (
        1 - F.pow(pl_frac, 2) - F.pow(1.0 - pl_frac, 2)
    ) + 1.0 * (F.col("nt") - F.col("nl")) / F.col("nt") * (
        1 - F.pow(pr_frac, 2) - F.pow(1.0 - pr_frac, 2)
    )
    pt_frac = 1.0 * F.col("pt") / F.col("nt")
    gini_before = 1 - F.pow(pt_frac, 2) - F.pow(1 - pt_frac, 2)
    scored = cc.select(
        "v",
        "nl",
        (F.col("nt") - F.col("nl")).alias("nr"),
        gini_after.alias("gini_after"),
        gini_before.alias("gini_before"),
    )
    wbest = Window.orderBy("gini_after", "v")
    return (
        scored.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select(
            F.col("v").cast("long").alias("split_at"),
            F.col("nl").cast("long").alias("n_left"),
            F.col("nr").cast("long").alias("n_right"),
            (F.round(F.col("gini_before"), 6) + F.lit(0.0)).alias(
                "gini_before"
            ),
            (F.round(F.col("gini_after"), 6) + F.lit(0.0)).alias(
                "gini_after"
            ),
            (
                F.round(
                    F.col("gini_before") - F.col("gini_after"), 6
                )
                + F.lit(0.0)
            ).alias("impurity_decrease"),
        )
    )


# Kendall's coefficient of concordance W across the five event types'
# daily value rankings — friedman_q's effect size: W = chi2_F /
# (n (k - 1)), 0 = no agreement between days, 1 = every day ranks
# the types identically. Shares friedman_q's deterministic
# (mean, type) rank convention.
@register(
    "kendall_w_q",
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
    SELECT CAST(MAX(n_blocks) AS BIGINT) AS n_days,
           CAST(COUNT(*) AS BIGINT) AS k_types,
           CAST(ROUND((12.0 * SUM(rank_sum * rank_sum)
                   / (MAX(n_blocks) * COUNT(*) * (COUNT(*) + 1))
               - 3.0 * MAX(n_blocks) * (COUNT(*) + 1))
               / (MAX(n_blocks) * (COUNT(*) - 1)), 6) AS DOUBLE) + 0.0
               AS kendall_w
    FROM s
    """,
)
def kendall_w_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How CONSISTENTLY do the days rank the event types? The
    normalized effect size behind friedman_q's chi-square."""
    e = Catalog(spark, sf_dir).events
    dt = e.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
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
    chi2 = (
        12.0
        * F.sum(F.col("rank_sum") * F.col("rank_sum"))
        / (n * k * (k + 1))
        - 3.0 * n * (k + 1)
    )
    return s.agg(
        n.cast("long").alias("n_days"),
        k.cast("long").alias("k_types"),
        (F.round(chi2 / (n * (k - 1)), 6) + F.lit(0.0)).alias(
            "kendall_w"
        ),
    )


# Variance inflation factors for the three per-user spend covariates
# (click, view, signup counts... values): VIF_i = 1/(1 - R_i^2) with
# R_i^2 from the 3-variable correlation matrix closed form
# R_1^2 = (r12^2 + r13^2 - 2 r12 r13 r23)/(1 - r23^2). The
# multicollinearity screen before any regression on these columns;
# moments from one exact-DECIMAL pass.
@register(
    "vif_q",
    """
    WITH u AS (
        SELECT user_id,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'click'
                   THEN CAST(value AS DECIMAL(18,6)) END),
                   CAST(0 AS DECIMAL(18,6))) AS DECIMAL(16,6)) AS x1,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'view'
                   THEN CAST(value AS DECIMAL(18,6)) END),
                   CAST(0 AS DECIMAL(18,6))) AS DECIMAL(16,6)) AS x2,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'signup'
                   THEN CAST(value AS DECIMAL(18,6)) END),
                   CAST(0 AS DECIMAL(18,6))) AS DECIMAL(16,6)) AS x3
        FROM events GROUP BY user_id
    ),
    m AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(x1) AS DOUBLE) AS s1,
               CAST(SUM(x2) AS DOUBLE) AS s2,
               CAST(SUM(x3) AS DOUBLE) AS s3,
               CAST(SUM(CAST(x1 AS DECIMAL(19,6))
                        * CAST(x1 AS DECIMAL(19,6))) AS DOUBLE) AS s11,
               CAST(SUM(CAST(x2 AS DECIMAL(19,6))
                        * CAST(x2 AS DECIMAL(19,6))) AS DOUBLE) AS s22,
               CAST(SUM(CAST(x3 AS DECIMAL(19,6))
                        * CAST(x3 AS DECIMAL(19,6))) AS DOUBLE) AS s33,
               CAST(SUM(CAST(x1 AS DECIMAL(19,6))
                        * CAST(x2 AS DECIMAL(19,6))) AS DOUBLE) AS s12,
               CAST(SUM(CAST(x1 AS DECIMAL(19,6))
                        * CAST(x3 AS DECIMAL(19,6))) AS DOUBLE) AS s13,
               CAST(SUM(CAST(x2 AS DECIMAL(19,6))
                        * CAST(x3 AS DECIMAL(19,6))) AS DOUBLE) AS s23
        FROM u
    ),
    r AS (
        SELECT n,
               (s12 - s1 * s2 / n)
                   / sqrt((s11 - s1 * s1 / n) * (s22 - s2 * s2 / n))
                   AS r12,
               (s13 - s1 * s3 / n)
                   / sqrt((s11 - s1 * s1 / n) * (s33 - s3 * s3 / n))
                   AS r13,
               (s23 - s2 * s3 / n)
                   / sqrt((s22 - s2 * s2 / n) * (s33 - s3 * s3 / n))
                   AS r23
        FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(ROUND(1 / (1 - (r12 * r12 + r13 * r13
               - 2 * r12 * r13 * r23) / (1 - r23 * r23)), 4)
               AS DOUBLE) + 0.0 AS vif_click,
           CAST(ROUND(1 / (1 - (r12 * r12 + r23 * r23
               - 2 * r12 * r23 * r13) / (1 - r13 * r13)), 4)
               AS DOUBLE) + 0.0 AS vif_view,
           CAST(ROUND(1 / (1 - (r13 * r13 + r23 * r23
               - 2 * r13 * r23 * r12) / (1 - r12 * r12)), 4)
               AS DOUBLE) + 0.0 AS vif_signup
    FROM r
    """,
)
def vif_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Can these three spend covariates sit in one regression? VIF
    above ~5 flags collinearity; closed form for three variables so
    no matrix inversion is needed anywhere."""
    e = Catalog(spark, sf_dir).events

    def tsum(et):
        return F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == et, _dec(F.col("value"), 18, 6)
                )
            ),
            F.lit(0).cast("decimal(18,6)"),
        ).cast("decimal(16,6)")

    u = e.groupBy("user_id").agg(
        tsum("click").alias("x1"),
        tsum("view").alias("x2"),
        tsum("signup").alias("x3"),
    )

    def p16(a, b):
        return F.sum(
            F.col(a).cast("decimal(16,6)") * F.col(b).cast("decimal(16,6)")
        ).cast("double")

    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").cast("double").alias("s1"),
        F.sum("x2").cast("double").alias("s2"),
        F.sum("x3").cast("double").alias("s3"),
        p16("x1", "x1").alias("s11"),
        p16("x2", "x2").alias("s22"),
        p16("x3", "x3").alias("s33"),
        p16("x1", "x2").alias("s12"),
        p16("x1", "x3").alias("s13"),
        p16("x2", "x3").alias("s23"),
    )
    n = F.col("n")

    def corr(sab, sa, sb, saa, sbb):
        return (F.col(sab) - F.col(sa) * F.col(sb) / n) / F.sqrt(
            (F.col(saa) - F.col(sa) * F.col(sa) / n)
            * (F.col(sbb) - F.col(sb) * F.col(sb) / n)
        )

    r = m.select(
        "n",
        corr("s12", "s1", "s2", "s11", "s22").alias("r12"),
        corr("s13", "s1", "s3", "s11", "s33").alias("r13"),
        corr("s23", "s2", "s3", "s22", "s33").alias("r23"),
    )

    def vif(ra, rb, rc):
        r2 = (
            F.col(ra) * F.col(ra)
            + F.col(rb) * F.col(rb)
            - 2 * F.col(ra) * F.col(rb) * F.col(rc)
        ) / (1 - F.col(rc) * F.col(rc))
        return F.round(1 / (1 - r2), 4) + F.lit(0.0)

    return r.select(
        n.cast("long").alias("n_users"),
        vif("r12", "r13", "r23").alias("vif_click"),
        vif("r12", "r23", "r13").alias("vif_view"),
        vif("r13", "r23", "r12").alias("vif_signup"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 7 (coda): risk-adjusted return ratios, the
# day-of-week effect F, and Tukey's median polish.
# ---------------------------------------------------------------------------


# Risk-adjusted daily P&L ratios: Sharpe (mean/sd, annualized by
# sqrt(365)), Sortino (downside deviation in the denominator), and
# Calmar (annualized mean over max drawdown) — all three from the
# demeaned revenue P&L the drawdown/cvar family uses. Moments are
# exact-decimal sums; the running-peak pass is calendar-bounded.
@register(
    "risk_adjusted_q",
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
                          AS DECIMAL(18,6)) FROM daily) AS p
        FROM daily
    ),
    m AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(p) AS DOUBLE) AS s,
               -- width >= 19: DuckDB's narrower decimal multiply
               -- overflows int64 for |p| >= ~1000 (Spark twin is 16,6)
               CAST(SUM(CAST(p AS DECIMAL(19,6))
                        * CAST(p AS DECIMAL(19,6))) AS DOUBLE) AS ss,
               CAST(SUM(CASE WHEN p < 0
                    THEN CAST(p AS DECIMAL(19,6))
                         * CAST(p AS DECIMAL(19,6))
                    ELSE CAST(0 AS DECIMAL(38,12)) END) AS DOUBLE)
                   AS ssd
        FROM pnl
    ),
    eq AS (
        SELECT day, SUM(p) OVER (ORDER BY day) AS equity FROM pnl
    ),
    dd AS (
        SELECT MAX(peak - equity) AS mdd FROM (
            SELECT equity,
                   MAX(equity) OVER (ORDER BY day) AS peak
            FROM eq
        )
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(ROUND(s / n / sqrt((ss - s * s / n) / (n - 1))
               * sqrt(365.0), 6) AS DOUBLE) + 0.0 AS sharpe_ann,
           CAST(ROUND(s / n / sqrt(ssd / n) * sqrt(365.0), 6)
               AS DOUBLE) + 0.0 AS sortino_ann,
           CAST(ROUND(s / n * 365.0
               / CAST((SELECT mdd FROM dd) AS DOUBLE), 6) AS DOUBLE)
               + 0.0 AS calmar
    FROM m
    """,
)
def risk_adjusted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharpe, Sortino, and Calmar on the demeaned daily P&L — the
    scalar trio that prices drawdown_q/cvar_q's risk against the mean.
    All three hover near zero here BY CONSTRUCTION (the P&L is
    demeaned); the value is the machinery, cross-checked exactly."""
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
        "day", (F.col("rev") - F.col("mu")).alias("p")
    )
    p16 = F.col("p").cast("decimal(16,6)")
    m = pnl.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p").cast("double").alias("s"),
        F.sum(p16 * p16).cast("double").alias("ss"),
        F.sum(
            F.when(F.col("p") < 0, p16 * p16).otherwise(
                F.lit(0).cast("decimal(32,12)")
            )
        )
        .cast("double")
        .alias("ssd"),
    )
    wday = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    eq = pnl.select("day", F.sum("p").over(wday).alias("equity"))
    eq = eq.withColumn("peak", F.max("equity").over(wday))
    dd = eq.agg(
        F.max(F.col("peak") - F.col("equity")).alias("mdd")
    )
    n = F.col("n")
    mean = F.col("s") / n
    sd = F.sqrt((F.col("ss") - F.col("s") * F.col("s") / n) / (n - 1))
    dsd = F.sqrt(F.col("ssd") / n)
    return m.crossJoin(F.broadcast(dd)).select(
        n.cast("long").alias("n_days"),
        (
            F.round(mean / sd * F.sqrt(F.lit(365.0)), 6) + F.lit(0.0)
        ).alias("sharpe_ann"),
        (
            F.round(mean / dsd * F.sqrt(F.lit(365.0)), 6) + F.lit(0.0)
        ).alias("sortino_ann"),
        (
            F.round(mean * 365.0 / F.col("mdd").cast("double"), 6)
            + F.lit(0.0)
        ).alias("calmar"),
    )


# Day-of-week effect: one-way ANOVA F of daily purchase means across
# the 7 weekday groups — the inferential companion to
# seasonal_strength_q's descriptive split. Group moments from exact
# decimals; with ~4 days per weekday cell the test is deliberately
# low-powered at test scale (the F machinery is what's checked).
@register(
    "weekday_effect_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7
                   AS dow,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(16,6)) AS m
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ),
    g AS (
        SELECT dow, COUNT(*) AS n,
               CAST(SUM(m) AS DOUBLE) AS s,
               CAST(SUM(CAST(m AS DECIMAL(19,6))
                        * CAST(m AS DECIMAL(19,6))) AS DOUBLE) AS q
        FROM daily GROUP BY dow
    ),
    parts AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n_tot, COUNT(*) AS k,
               CAST(SUM(s) AS DOUBLE) AS s_tot,
               CAST(SUM(q) AS DOUBLE) AS q_tot,
               CAST(SUM(CAST(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n
                    AS DECIMAL(28,12))) AS DOUBLE) AS sum_s2n
        FROM g
    )
    SELECT n_tot AS n_days, CAST(k AS BIGINT) AS k_weekdays,
           CAST(ROUND((sum_s2n - s_tot * s_tot / n_tot) / (k - 1)
               / ((q_tot - sum_s2n) / (n_tot - k)), 6) AS DOUBLE) + 0.0
               AS f_stat
    FROM parts
    """,
)
def weekday_effect_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is there a STATISTICALLY defensible weekday pattern in
    purchase value, or is seasonal_strength_q's split just noise?"""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
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
        .cast("decimal(16,6)")
        .alias("m")
    )
    m16 = F.col("m").cast("decimal(16,6)")
    g = daily.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("m").cast("double").alias("s"),
        F.sum(m16 * m16).cast("double").alias("q"),
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
    ssb = F.col("sum_s2n") - F.col("s_tot") * F.col("s_tot") / F.col(
        "n_tot"
    )
    ssw = F.col("q_tot") - F.col("sum_s2n")
    return parts.select(
        F.col("n_tot").alias("n_days"),
        F.col("k").cast("long").alias("k_weekdays"),
        (
            F.round(
                ssb
                / (F.col("k") - 1)
                / (ssw / (F.col("n_tot") - F.col("k"))),
                6,
            )
            + F.lit(0.0)
        ).alias("f_stat"),
    )


# Tukey median polish of the (day-of-week x event-type) mean-value
# table, two unrolled sweeps: subtract row medians, then column
# medians, twice; report the per-cell residual table's max |residual|
# and the final row/column effects. Medians over <= 7-element rows /
# <= 5-element columns use lower-median ranks (deterministic, exact
# decimals) — the ROBUST twin of variance_components_q.
@register(
    "median_polish_q",
    """
    WITH cell AS (
        SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7
                   AS dow, event_type AS et,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(16,6)) AS m
        FROM events GROUP BY 1, 2
    ),
    r1 AS (
        SELECT dow, CAST(quantile_disc(m, 0.5) AS DECIMAL(16,6))
            AS rmed
        FROM cell GROUP BY dow
    ),
    c1p AS (
        SELECT cell.dow, cell.et, cell.m - r1.rmed AS v
        FROM cell JOIN r1 USING (dow)
    ),
    k1 AS (
        SELECT et, CAST(quantile_disc(v, 0.5) AS DECIMAL(16,6))
            AS cmed
        FROM c1p GROUP BY et
    ),
    c1 AS (
        SELECT c1p.dow, c1p.et, c1p.v - k1.cmed AS v
        FROM c1p JOIN k1 USING (et)
    ),
    r2 AS (
        SELECT dow, CAST(quantile_disc(v, 0.5) AS DECIMAL(16,6))
            AS rmed
        FROM c1 GROUP BY dow
    ),
    c2p AS (
        SELECT c1.dow, c1.et, c1.v - r2.rmed AS v
        FROM c1 JOIN r2 USING (dow)
    ),
    k2 AS (
        SELECT et, CAST(quantile_disc(v, 0.5) AS DECIMAL(16,6))
            AS cmed
        FROM c2p GROUP BY et
    ),
    resid AS (
        SELECT c2p.dow, c2p.et, c2p.v - k2.cmed AS v
        FROM c2p JOIN k2 USING (et)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(ROUND(CAST(MAX(abs(v)) AS DOUBLE), 4) AS DOUBLE) + 0.0
               AS max_abs_residual,
           CAST(ROUND(CAST(quantile_disc(abs(v), 0.5) AS DOUBLE), 4)
               AS DOUBLE) + 0.0 AS median_abs_residual
    FROM resid
    """,
)
def median_polish_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exploratory two-way decomposition that outliers cannot drag —
    what variance_components_q's means-based split would say if a few
    wild cells were cleaned first. Lower medians (quantile_disc / the
    rank-(n+1)//2 element) keep both engines exact on decimals."""
    e = Catalog(spark, sf_dir).events
    cell = e.groupBy(
        (F.datediff(F.to_date("ts"), F.lit("2024-01-01")) % 7).alias(
            "dow"
        ),
        F.col("event_type").alias("et"),
    ).agg(
        (
            F.sum(_dec(F.col("value"), 18, 6)).cast("double")
            / F.count(F.lit(1))
        )
        .cast("decimal(16,6)")
        .alias("m")
    )

    def lower_median(df, part_col, val_col, out):
        wk = Window.partitionBy(part_col).orderBy(
            val_col, "dow", "et"
        )
        wn = Window.partitionBy(part_col)
        return (
            df.withColumn("__k", F.row_number().over(wk))
            .withColumn("__n", F.count(F.lit(1)).over(wn))
            .filter(F.col("__k") == F.expr("(__n + 1) div 2"))
            .select(
                F.col(part_col),
                F.col(val_col).cast("decimal(16,6)").alias(out),
            )
        )

    v = cell.withColumnRenamed("m", "v")
    for sweep in range(2):
        rmed = lower_median(v, "dow", "v", "rmed")
        v = v.join(rmed, "dow").select(
            "dow", "et", (F.col("v") - F.col("rmed")).alias("v")
        )
        cmed = lower_median(v, "et", "v", "cmed")
        v = v.join(cmed, "et").select(
            "dow", "et", (F.col("v") - F.col("cmed")).alias("v")
        )
    av = v.select("dow", "et", F.abs(F.col("v")).alias("av"))
    medav = (
        av.withColumn(
            "__k",
            F.row_number().over(Window.orderBy("av", "dow", "et")),
        )
        .withColumn(
            "__n",
            F.count(F.lit(1)).over(
                Window.rowsBetween(
                    Window.unboundedPreceding,
                    Window.unboundedFollowing,
                )
            ),
        )
        .filter(F.col("__k") == F.expr("(__n + 1) div 2"))
        .select(F.col("av").alias("mar"))
    )
    return av.crossJoin(F.broadcast(medav)).agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        (
            F.round(F.max("av").cast("double"), 4) + F.lit(0.0)
        ).alias("max_abs_residual"),
        (
            F.round(F.max("mar").cast("double"), 4) + F.lit(0.0)
        ).alias("median_abs_residual"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 7 (addendum): Oaxaca-Blinder gap
# decomposition, kneedle-style knee point on the Pareto curve, and
# Cochran's Q for matched binary outcomes.
# ---------------------------------------------------------------------------


# Oaxaca-Blinder decomposition of the cohort purchase-spend gap with
# click spend as the explanatory covariate: gap = explained
# (b_pooled x covariate-mean gap) + unexplained (shifted intercepts
# and slopes). Pooled slope and per-cohort means from one
# exact-DECIMAL moment pass — the labor-economics twin of
# mediation_q's product-of-coefficients.
@register(
    "oaxaca_blinder_q",
    """
    WITH u AS (
        SELECT user_id % 2 AS g,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'click'
                   THEN CAST(value AS DECIMAL(18,6)) END),
                   CAST(0 AS DECIMAL(18,6))) AS DECIMAL(16,6)) AS x,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(value AS DECIMAL(18,6)) END),
                   CAST(0 AS DECIMAL(18,6))) AS DECIMAL(16,6)) AS y
        FROM events GROUP BY user_id
    ),
    m AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS DECIMAL(19,6))
                        * CAST(x AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(x AS DECIMAL(19,6))
                        * CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
               SUM(g) AS n1,
               CAST(SUM(CASE WHEN g = 1 THEN x
                    ELSE CAST(0 AS DECIMAL(16,6)) END) AS DOUBLE)
                   AS sx1,
               CAST(SUM(CASE WHEN g = 1 THEN y
                    ELSE CAST(0 AS DECIMAL(16,6)) END) AS DOUBLE)
                   AS sy1
        FROM u
    ),
    d AS (
        SELECT (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b,
               sy1 / n1 - (sy - sy1) / (n - n1) AS gap,
               sx1 / n1 - (sx - sx1) / (n - n1) AS xgap,
               n, n1
        FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(ROUND(gap, 6) AS DOUBLE) + 0.0 AS total_gap,
           CAST(ROUND(b * xgap, 6) AS DOUBLE) + 0.0 AS explained,
           CAST(ROUND(gap - b * xgap, 6) AS DOUBLE) + 0.0
               AS unexplained
    FROM d
    """,
)
def oaxaca_blinder_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of the cohort spend gap does click behavior EXPLAIN
    at the pooled slope, and how much remains structural? The
    two-fold Oaxaca-Blinder with a pooled reference."""
    e = Catalog(spark, sf_dir).events

    def tsum(et):
        return F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == et, _dec(F.col("value"), 18, 6)
                )
            ),
            F.lit(0).cast("decimal(18,6)"),
        ).cast("decimal(16,6)")

    u = e.groupBy("user_id").agg(
        tsum("click").alias("x"), tsum("purchase").alias("y")
    ).select((F.col("user_id") % 2).alias("g"), "x", "y")
    p16 = lambda a, b: F.sum(
        F.col(a).cast("decimal(16,6)") * F.col(b).cast("decimal(16,6)")
    ).cast("double")
    zero16 = F.lit(0).cast("decimal(16,6)")
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        p16("x", "x").alias("sxx"),
        p16("x", "y").alias("sxy"),
        F.sum("g").alias("n1"),
        F.sum(F.when(F.col("g") == 1, F.col("x")).otherwise(zero16))
        .cast("double")
        .alias("sx1"),
        F.sum(F.when(F.col("g") == 1, F.col("y")).otherwise(zero16))
        .cast("double")
        .alias("sy1"),
    )
    n, n1 = F.col("n"), F.col("n1")
    b = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / n
    )
    gap = F.col("sy1") / n1 - (F.col("sy") - F.col("sy1")) / (n - n1)
    xgap = F.col("sx1") / n1 - (F.col("sx") - F.col("sx1")) / (n - n1)
    return m.select(
        n.cast("long").alias("n_users"),
        (F.round(gap, 6) + F.lit(0.0)).alias("total_gap"),
        (F.round(b * xgap, 6) + F.lit(0.0)).alias("explained"),
        (F.round(gap - b * xgap, 6) + F.lit(0.0)).alias("unexplained"),
    )
