"""Time-series regularization: resample an irregular event stream onto a
fixed grid with linear interpolation of gaps.

The hypertable-rollup / gap-fill operation every metrics pipeline needs:
events arrive at irregular timestamps; downstream consumers want one row
per (key, hour) with values interpolated across silent periods.

Scale shape: the observed aggregate is one map-side-combined groupBy on
(key, bucket). The grid is generated per key from that key's own min/max
bucket via ``sequence()`` + ``explode`` — grid size is (span / step) per
key, no cross join against a global calendar. The interpolation pass is two
window functions over the same (key, bucket) partitioning the aggregate
already produced, so the whole operator costs ONE shuffle. Values are
interpolated between the previous and next observed buckets; leading /
trailing cells (before the first / after the last observation) stay NULL.

Cross-engine determinism: observed per-bucket means and the interpolated
values are rounded in decimal space (see queries.py conventions).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def resample_interpolate(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
) -> DataFrame:
    """Regular (key, bucket) grid with linearly interpolated values.

    Returns ``(key, bucket, observed, value)`` where ``observed`` is the
    rounded per-bucket mean (NULL on gap buckets) and ``value`` is observed
    when present else the linear interpolation between the neighbouring
    observed buckets (NULL outside the observed range).
    """
    unit = step.split()[1].rstrip("s")  # "1 hour" -> "hour"
    bucket = F.date_trunc(unit, F.col(ts_col))
    obs = (
        events.groupBy(F.col(key_col).alias("key"), bucket.alias("bucket"))
        .agg(
            F.round(F.avg(F.col(value_col)).cast("decimal(28,12)"), 6)
            .cast("double")
            .alias("observed")
        )
    )
    grid = (
        obs.groupBy("key")
        .agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1"))
        .select(
            "key",
            F.explode(
                F.sequence("b0", "b1", F.expr(f"interval {step}"))
            ).alias("bucket"),
        )
    )
    g = grid.join(obs, ["key", "bucket"], "left")

    w_prev = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_ts = F.when(F.col("observed").isNotNull(), F.col("bucket"))
    prev_v = F.last("observed", ignorenulls=True).over(w_prev)
    prev_t = F.last(obs_ts, ignorenulls=True).over(w_prev)
    next_v = F.first("observed", ignorenulls=True).over(w_next)
    next_t = F.first(obs_ts, ignorenulls=True).over(w_next)

    span = F.unix_timestamp(next_t) - F.unix_timestamp(prev_t)
    frac = (F.unix_timestamp("bucket") - F.unix_timestamp(prev_t)) / span
    interp = F.when(F.col("observed").isNotNull(), F.col("observed")).otherwise(
        F.round(
            (prev_v + (next_v - prev_v) * frac).cast("decimal(28,12)"), 6
        ).cast("double")
    )
    return g.select(
        "key",
        "bucket",
        "observed",
        interp.alias("value"),
    )


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    alpha: float = 0.3,
    depth: int = 8,
    round_to: int | None = None,
) -> DataFrame:
    """(key, ts, id, value, ewma) — exponentially weighted moving average
    per key over event order, truncated to the last `depth` observations.

    The recursion ewma_i = (1-alpha)*ewma_{i-1} + alpha*x_i is not a
    window aggregate, but truncating it at `depth` terms (weights beyond
    that are (1-alpha)^depth ≈ negligible) makes it one: collect the
    frame's last `depth` values with a ROWS window, then left-fold the
    recursion inside a higher-order `aggregate`, seeded 0. The fold order
    is identical in Spark and DuckDB (list_reduce with a prepended seed),
    so doubles match bit-for-bit before the final round.

    Scale: one shuffle on the key (window partition); the frame carries
    `depth` doubles per row — constant state, no unbounded running
    aggregate. Ordering ties broken by the event id for determinism.

    `round_to` defaults to None (emit the raw fold): the fold is
    bit-identical across engines, but an explicit ROUND diverges on
    .5-representation ties (engines disagree on round(x*10^k + 0.5) vs
    decimal-repr rounding) — the correctness gate's own 9-dp float
    normalization is the right comparison layer for raw doubles.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(-(depth - 1), 0)
    )
    frame = F.collect_list(F.col(value_col).cast("double")).over(w)
    folded = F.aggregate(
        frame,
        F.lit(0.0),
        lambda acc, x: acc * (1.0 - alpha) + x * alpha,
    )
    out = folded if round_to is None else F.round(folded, round_to)
    return df.select(
        key_col,
        ts_col,
        id_col,
        F.col(value_col).cast("double").alias("value"),
        out.alias("ewma"),
    )


def rolling_autocorr(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    window_rows: int = 16,
) -> DataFrame:
    """(key, ts, id, corr) — trailing lag-1 autocorrelation per key: the
    Pearson correlation of (x_t, x_{t-1}) over the last `window_rows`
    adjacent pairs. High |corr| flags trending/oscillating series;
    near-zero flags noise — the cheap online signal for anomaly gating.

    Determinism recipe: the five windowed sums (Σx, Σy, Σx², Σy², Σxy)
    accumulate DECIMAL(18,4)-cast values, so every sum is exact and
    order-independent; only the final closed-form correlation runs in
    double (identical expression both engines; emitted raw for the
    gate's 9-dp float normalization). Rows with an undefined denominator
    (constant series, < 3 pairs) emit NULL.

    Scale: one shuffle on the key; frames carry `window_rows` decimals —
    bounded state per row, like any trailing-window aggregate.
    """
    x = F.col(value_col).cast("decimal(18,4)")
    ord_w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    lagged = df.withColumn("_y", F.lag(x).over(ord_w)).withColumn("_x", x)
    fr = ord_w.rowsBetween(-(window_rows - 1), 0)
    pairs_only = F.when(F.col("_y").isNotNull(), F.lit(1))
    n = F.sum(pairs_only).over(fr).cast("double")
    def s(col):
        return F.sum(F.when(F.col("_y").isNotNull(), col)).over(fr)
    sx = s(F.col("_x")).cast("double")
    sy = s(F.col("_y")).cast("double")
    sxx = s(F.col("_x") * F.col("_x")).cast("double")
    syy = s(F.col("_y") * F.col("_y")).cast("double")
    sxy = s(F.col("_x") * F.col("_y")).cast("double")
    den = (n * sxx - sx * sx) * (n * syy - sy * sy)
    corr = F.when(
        (n >= 3) & (den > 0),
        (n * sxy - sx * sy) / F.sqrt(den),
    )
    return lagged.select(
        key_col, ts_col, id_col, corr.alias("corr")
    )
