"""Data-dependent column pruning (reference get_columns,
concept_csv_export.py:607-629 — P8/A6 in SURVEY §2).

The reference drops output columns that are empty on every row (except a
keep-list) with a full Python pass; here it is one aggregation job producing
a per-column any-non-empty bitmap on the driver, then a plain ``select`` —
two Spark jobs total, each a single scan, regardless of column count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def nonempty_flags(df: DataFrame, cols: list[str] | None = None) -> dict[str, bool]:
    """One aggregate pass: column → whether any row is non-NULL/non-empty."""
    cols = cols or df.columns
    flags = df.agg(
        *[
            F.max(
                F.when(
                    F.col(c).isNotNull() & (F.col(c).cast("string") != ""), 1
                ).otherwise(0)
            ).alias(c)
            for c in cols
        ]
    ).first()
    return {c: bool(flags[c]) for c in cols}


def drop_all_empty_columns(
    df: DataFrame,
    keep: tuple[str, ...] = ("Void/Retire",),
    prefix_order: tuple[str, ...] = (),
) -> DataFrame:
    """Drop all-empty columns and normalize column order: the declared
    prefix first (those present), then the surviving remainder in current
    order — the reference's fixed-prefix + discovered-suffix contract.
    """
    flags = nonempty_flags(df)
    surviving = [c for c in df.columns if flags[c] or c in keep]
    head = [c for c in prefix_order if c in surviving]
    tail = [c for c in surviving if c not in head]
    return df.select(*head, *tail)
