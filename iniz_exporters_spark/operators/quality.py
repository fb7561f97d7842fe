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


def linear_quality_score(
    text: Column | str,
    dim: int = 64,
    scale: float = 8.0,
    round_to: int = 4,
) -> Column:
    """fastText-style linear quality classifier: hashed bag-of-words
    features dotted with a fixed weight vector, squashed by a sigmoid.

    This is the *serving* side of the quality-classifier pattern the CCNet /
    Gopher / FineWeb pipelines use to keep "wiki-like" text: w[h(token) % dim]
    summed over the document, prob = sigmoid(sum/scale). Weights here are a
    deterministic function of the feature index (no stored model artifact),
    so the score is engine-replayable; swapping in trained weights is a
    broadcast of a dim-sized array and does not change the plan. Pure
    Catalyst per-row compute — one codegen'd scan, zero shuffles, valid at
    any corpus size.

    DuckDB equivalent (parity pinned by the ``quality_classifier`` oracle):
    weight(t) = ((poly_hash(t) % dim) * 37 + 11) % 21 - 10) / 10.0 and a
    left-fold sum, so summation order matches Spark's F.aggregate.
    """
    from iniz_exporters_spark.functions.text import poly_hash, tokens

    toks = tokens(text)

    def weight(t: Column) -> Column:
        idx = poly_hash(t) % dim
        return ((idx * 37 + 11) % 21 - 10) / F.lit(10.0)

    raw = F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + weight(t))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-raw / F.lit(float(scale))))
    return F.round(prob.cast("decimal(28,12)"), round_to).cast("double")
