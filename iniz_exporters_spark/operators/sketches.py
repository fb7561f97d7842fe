"""Mergeable sketches: the approximate layer that replaces exact
distinct/frequency state when the domain no longer fits anywhere.

Exact `COUNT(DISTINCT)` shuffles every distinct value; at 100 TB the right
tool is a *mergeable* sketch: fixed-size state, map-side partial, unions
compose across shards/days/clusters. Spark ships Apache DataSketches HLL
(`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`) — the sketches
are first-class binary columns, so the incremental pattern is: persist one
sketch row per (partition, key), answer any rollup later by unioning
sketches WITHOUT rescanning the data (same reuse idea as
rollup_reuse_daily, but for distinct counts, which plain sums can't
compose).

Sketch ESTIMATES are implementation-defined (DataSketches vs DuckDB's HLL
differ), so raw estimates carry no DuckDB oracle; the engine-stable facts —
estimate-vs-exact error bound and union-composition staying inside it — are
driver-checked as booleans by the `hll_error_check` registry query, plus
pytest contracts here.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def hll_distinct_by_group(
    df: DataFrame, group_col: str, value_col: str, lgk: int = 12
) -> DataFrame:
    """(group, n_distinct_est): HLL-estimated distinct values per group.

    One shuffle of fixed-size sketch state (2^lgk bytes-ish per group) —
    the shuffle no longer scales with the number of DISTINCT values, which
    is the entire point at 100 TB. lgk trades memory for accuracy
    (rel. err ≈ 1.04/sqrt(2^lgk) ≈ 1.6% at the default 12).
    """
    return df.groupBy(group_col).agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(value_col), F.lit(lgk))
        ).alias("n_distinct_est")
    )


def hll_partition_sketches(
    df: DataFrame, part_col: str, group_col: str, value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """(part, group, sketch): the persistable incremental-state frame —
    one HLL sketch per (partition, group). Store this (e.g. per ingest
    day); later rollups union sketches instead of rescanning data."""
    return df.groupBy(part_col, group_col).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch")
    )


def hll_rollup(sketches: DataFrame, group_col: str) -> DataFrame:
    """(group, n_distinct_est) from a persisted sketch frame: union the
    per-partition sketches per group — input is sketch-count-sized, the
    original corpus is never touched."""
    return sketches.groupBy(group_col).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias(
            "n_distinct_est"
        )
    )


def cms_sketch_col(
    value_col: str, eps: float = 0.001, confidence: float = 0.99,
    seed: int = 42,
):
    """The Count-Min Sketch AGGREGATE column (binary output): partials
    merge map-side like any hash agg, so the shuffle carries fixed-size
    sketch state instead of the unbounded vocabulary. Group it to get one
    sketch per key; store the binaries and merge later like the HLL
    pattern above."""
    return F.count_min_sketch(
        F.col(value_col), F.lit(eps), F.lit(confidence), F.lit(seed)
    )


def cms_heavy_hitters(
    df: DataFrame,
    value_col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
):
    """A Count-Min Sketch over ``value_col``, aggregated distributedly
    (executor-side partial merge) and handed back as a queryable
    driver-side object. Point queries overestimate by at most eps·N with
    probability ``confidence`` — the bounded-state answer to "how often
    does token X occur" when the vocabulary is unbounded and an exact
    groupBy count would shuffle it.

    Returns the JVM ``org.apache.spark.util.sketch.CountMinSketch``
    exposing ``estimateCount(value)`` / ``totalCount()`` / ``mergeInPlace``.
    """
    (raw,) = df.agg(
        cms_sketch_col(value_col, eps, confidence, seed).alias("s")
    ).first()
    jvm = df.sparkSession._jvm
    jbytes = bytes(raw)  # py4j converts bytes to byte[]
    return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(jbytes)
