"""As-of join — event-time alignment without range explosion.

Spark has no built-in as-of join; the naive formulation (range join +
row_number) explodes to |left|×|matching-right| intermediate rows. This
implementation uses the union + ordered-window carry-forward shape instead:

  1. tag both sides, union them (no join at all),
  2. one window partitioned by key, ordered by (time, tag) — right rows sort
     before left rows at equal timestamps, making the match inclusive,
  3. ``last(right_payload, ignorenulls=True)`` carries the most recent right
     row forward onto each left row.

Cost at scale: a single hash shuffle on the key + one sort within
partitions — the same cost as one sort-merge join, independent of how many
right rows precede each left row. Skewed keys are handled by AQE; for
pathological single-key skew, pre-salt by coarse time bucket and stitch
bucket boundaries.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: dict[str, str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row at-or-before its
    timestamp (``backward``) or the earliest at-or-after (``forward``).

    ``right_cols`` maps right-side column → output alias. Output keeps every
    left column plus the aliased right columns (NULL when no match).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")

    payload = F.struct(*[F.col(c) for c in right_cols]).alias("__asof_payload")
    r = right.select(
        F.col(on).alias("__asof_key"),
        F.col(right_time).alias("__asof_time"),
        F.lit(0).alias("__asof_tag"),
        payload,
    )
    l = left.select(
        F.col(on).alias("__asof_key"),
        F.col(left_time).alias("__asof_time"),
        F.lit(1).alias("__asof_tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__asof_left"),
    )
    unioned = r.withColumn("__asof_left", F.lit(None).cast(l.schema["__asof_left"].dataType)) \
               .unionByName(l.withColumn("__asof_payload", F.lit(None).cast(r.schema["__asof_payload"].dataType)))

    if direction == "backward":
        order = [F.col("__asof_time").asc(), F.col("__asof_tag").asc()]
        frame = Window.unboundedPreceding, Window.currentRow
    else:
        order = [F.col("__asof_time").desc(), F.col("__asof_tag").asc()]
        frame = Window.unboundedPreceding, Window.currentRow

    w = (
        Window.partitionBy("__asof_key")
        .orderBy(*order)
        .rowsBetween(*frame)
    )
    matched = (
        unioned.withColumn(
            "__asof_match", F.last("__asof_payload", ignorenulls=True).over(w)
        )
        .filter(F.col("__asof_tag") == 1)
    )
    out_cols = [F.col(f"__asof_left.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"__asof_match.{src}").alias(dst) for src, dst in right_cols.items()
    ]
    return matched.select(*out_cols)
