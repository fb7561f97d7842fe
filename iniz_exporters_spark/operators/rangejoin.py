"""Range / interval joins — band predicates without the nested-loop trap.

Spark turns a join whose condition is *only* an inequality band into a
BroadcastNestedLoopJoin (small side) or a cartesian product (both large) —
O(|L|·|R|) comparisons. Both operators here restore an equi-join shape so the
planner gets a hash/sort-merge join whose per-task work is bounded:

* ``interval_join`` — equi-keys + time band. The band is coarsened into
  integer buckets of exactly the band width; a right row can only match left
  rows in its own or the adjacent bucket, so the probe side is exploded to
  (bucket, bucket±1) and the join becomes equi on (keys…, bucket) with the
  precise band applied as a residual filter. Shuffle moves each row at most
  twice, comparisons are limited to same-(key, bucket) micro-groups — the
  standard bucketed interval-join used by Flink's interval join and
  TimescaleDB range joins.

* ``band_lookup_join`` — a fact column against a small table of [lo, hi)
  bands (no equi key at all). Each band is exploded into the fixed-width
  granules it covers, the granule map is broadcast, and the join is equi on
  the fact's granule with a residual bounds check — a broadcast *hash* join
  instead of a broadcast nested-loop join, so the fact side streams through
  codegen once.

At 100 TB the interval join's cost is one shuffle of each side on
(keys…, bucket); skew in the key distribution is handled by AQE skew-join
splitting since the bucket term spreads hot keys over time.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from iniz_exporters_spark.session import metadata_df


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_time: str,
    right_time: str,
    lower_seconds: int,
    upper_seconds: int = 0,
) -> DataFrame:
    """Pairs (l, r) with same ``keys`` and
    ``l[left_time] - lower_seconds <= r[right_time] < l[left_time] -
    upper_seconds`` (defaults: r strictly before l, within ``lower_seconds``).

    Output: all left columns + all right columns (caller pre-aliases to
    avoid collisions).
    """
    if upper_seconds >= lower_seconds:
        raise ValueError("need upper_seconds < lower_seconds (a real band)")
    width = lower_seconds - upper_seconds
    # Bucket on whole seconds (truncation keeps the {b-1, b} containment
    # guarantee — both sides truncate downward consistently); the exact
    # sub-second band is enforced by the residual timestamp predicate.
    l_epoch = F.unix_timestamp(F.col(left_time))
    r_epoch = F.unix_timestamp(F.col(right_time))
    # a left row with bucket b can only match right rows in buckets {b-1, b}
    # when bucket width == band length: explode the probe side to both.
    lb = left.withColumn(
        "_bkt",
        F.explode(F.array(F.floor(l_epoch / width), F.floor(l_epoch / width) - 1)),
    )
    rb = right.withColumn("_bkt", F.floor(r_epoch / width))
    band = [
        rb[right_time] >= lb[left_time] - F.expr(f"INTERVAL {lower_seconds} SECOND"),
        rb[right_time] < lb[left_time] - F.expr(f"INTERVAL {upper_seconds} SECOND"),
    ]
    cond = [lb["_bkt"] == rb["_bkt"]] + [lb[k] == rb[k] for k in keys] + band
    joined = lb.join(rb, cond).drop(lb["_bkt"]).drop(rb["_bkt"])
    for k in keys:
        joined = joined.drop(rb[k])
    return joined


def band_lookup_join(
    fact: DataFrame,
    value_col: str,
    bands: Sequence[tuple],
    band_schema: str = "band string, lo double, hi double",
    granule: float | None = None,
) -> DataFrame:
    """Attach the [lo, hi) band containing ``fact[value_col]``.

    ``bands`` is a driver-side list of (band, lo, hi) tuples (a dimension at
    metadata scale). Each band is exploded to the granules it covers; the
    fact side computes one granule key and broadcast-hash-joins it. Rows
    falling in no band are dropped (inner semantics).
    """
    spark = fact.sparkSession
    if granule is None:
        granule = min(hi - lo for _, lo, hi in bands)
    bands_df = metadata_df(spark, list(bands), band_schema)
    granules = bands_df.withColumn(
        "_g",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / granule),
                # hi is exclusive: a granule starting exactly at hi is not covered
                F.floor((F.col("hi") - F.lit(1e-9)) / granule),
            )
        ),
    )
    fg = fact.withColumn("_g", F.floor(F.col(value_col) / granule))
    out = fg.join(F.broadcast(granules), "_g").filter(
        (F.col(value_col) >= F.col("lo")) & (F.col(value_col) < F.col("hi"))
    )
    return out.drop("_g")
