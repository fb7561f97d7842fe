"""Bucketed-table helpers: co-located joins and aggregations without a
shuffle (SURVEY §7.1 phase 5 — the 100 TB design point).

Why this exists: every `groupBy`/`join` on a non-aligned key is a full
shuffle of the big side. When the same fact table is joined or aggregated
on the same key repeatedly (the reference's concepts table is joined on
`concept_id` by every facet; a 100 TB lineitem is joined on `l_orderkey`
by most queries), paying one write-time bucketing pass makes every later
join/agg on that key exchange-free: Spark's `bucketBy` persists the hash
partitioning in the table metadata, and Catalyst's EnsureRequirements
sees the child's output partitioning already satisfies the join's
distribution requirement.

Rules that make it actually work (each one silently re-shuffles if
violated):
  * both sides bucketed by the SAME columns into the SAME bucket count
    (or a divisor, with ``spark.sql.bucketing.coalesceBucketedTableScan``);
  * ``spark.sql.sources.bucketing.enabled`` on (default);
  * read through the metastore table (``spark.table``), not the bare
    parquet path — the path reader drops bucket metadata;
  * ``spark.sql.shuffle.partitions`` irrelevant — the bucket count IS the
    parallelism of the exchange-free stages, so size buckets to
    ~128-512 MB each at the target scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    Sorting within buckets additionally lets sort-merge joins skip their
    per-task sort, and makes min/max row-group pruning effective on the
    sort key. ``path`` makes the table external (data at an explicit
    location instead of the warehouse dir — warehouse dir is static conf).
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table, format="parquet")


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables through the metastore (keeps bucket info)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (0 = co-located)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")
