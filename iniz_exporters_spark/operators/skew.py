"""Skew-mitigation join operators (100 TB toolbox).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in session.py) handles most skew transparently by splitting
oversized partitions at runtime. ``salted_join`` is the explicit fallback
for the cases AQE cannot fix — e.g. one join key carrying 30% of a 100 TB
fact table, where even a split partition set leaves every replica of the
hot key's build side on one executor:

  * the LEFT (large, skewed) side gets a random salt in [0, buckets);
  * the RIGHT side is replicated ``buckets``× with an exploded salt;
  * the join key becomes (key, salt), spreading the hot key over
    ``buckets`` partitions.

Semantics-preserving for inner/left joins on equi-keys — each left row
meets each matching right row exactly once (the left row's salt picks
exactly one of the right replicas).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` and ``right`` on ``on`` with the hot-key load
    spread over ``buckets`` shuffle partitions per key.

    ``right`` grows ``buckets``× — use for large-left/small-right shapes
    where the right side still can't broadcast (too big for driver/executor
    memory but far smaller than the fact side). ``how`` must be 'inner' or
    'left' (salting a right/full outer would fabricate per-replica nulls).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_l = left.withColumn(
        "__salt", (F.rand(seed=42) * buckets).cast("int")
    )
    salted_r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return salted_l.join(salted_r, on=[on, "__salt"], how=how).drop("__salt")


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    top_n: int = 5,
    round_to: int = 4,
) -> DataFrame:
    """Heavy-hitter diagnostic: the ``top_n`` most frequent keys with their
    share of all rows and their size ratio to the mean group — the numbers
    that decide whether a join on this key needs salting/AQE skew handling
    before it runs at scale.

    One groupBy shuffle over the key (map-side partial counts), then the
    1-row total joins back via broadcast (the q11 scalar-subquery shape)
    and the ordered limit plans as TakeOrderedAndProject. Output:
    (key aliased as ``key``, cnt, share, skew_ratio, rn).
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").alias("__total"), F.count(F.lit(1)).alias("__n_keys")
    )
    share = F.col("cnt").cast("double") / F.col("__total")
    ratio = F.col("cnt").cast("double") * F.col("__n_keys") / F.col("__total")
    ranked = (
        counts.crossJoin(F.broadcast(totals))
        .orderBy(F.col("cnt").desc(), F.col("key").asc())
        .limit(top_n)
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
    return ranked.select(
        "key",
        "cnt",
        F.round(share.cast("decimal(28,12)"), round_to)
        .cast("double")
        .alias("share"),
        F.round(ratio.cast("decimal(28,12)"), round_to)
        .cast("double")
        .alias("skew_ratio"),
        F.row_number().over(w).alias("rn"),
    )
