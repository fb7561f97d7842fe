"""Data-quality expectations: declarative checks evaluated in one pass.

Deequ/dbt-test-style gate for pipeline outputs: each rule names an
observable (an aggregate expression over the frame) and an inclusive
[lo, hi] acceptance range. All observables are computed in a SINGLE
aggregation over one scan — adding a rule adds a column to the agg, not a
pass over the data — then the one-row result unpivots to a (rule,
observed, passed) report. The report is metadata-sized at any corpus
size; nothing about the frame is collected until the caller decides.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Expectation:
    name: str
    observable: Column  # aggregate expression -> one numeric value
    lo: float
    hi: float


def check_expectations(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """Report frame: (rule, observed double, lo, hi, passed boolean)."""
    agg = df.agg(
        *[r.observable.cast("double").alias(r.name) for r in rules]
    )
    reports = [
        agg.select(
            F.lit(r.name).alias("rule"),
            F.col(r.name).alias("observed"),
            F.lit(float(r.lo)).alias("lo"),
            F.lit(float(r.hi)).alias("hi"),
            (
                F.col(r.name).isNotNull()
                & (F.col(r.name) >= r.lo)
                & (F.col(r.name) <= r.hi)
            ).alias("passed"),
        )
        for r in rules
    ]
    out = reports[0]
    for p in reports[1:]:
        out = out.unionByName(p)
    return out


def null_rate(col: str) -> Column:
    return (F.count(F.lit(1)) - F.count(col)) / F.count(F.lit(1))


def distinct_count(col: str) -> Column:
    return F.countDistinct(col)
