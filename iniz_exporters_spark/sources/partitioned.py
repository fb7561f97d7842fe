"""Hive-style partitioned dataset layout: write, overwrite, pruned read.

The 100 TB layout primitive: a corpus partitioned by low-cardinality
columns (lang, source, date) so that per-slice queries read ONLY the
matching directories — partition pruning happens at planning time, before
any file is opened. This module wraps the three operations a pipeline
needs and keeps their scale contracts explicit:

* ``write_partitioned`` — one shuffle keyed on the partition columns so
  each output directory is written by as few tasks as possible (no
  "every task writes every partition" small-file explosion), with an
  optional ``files_per_partition`` fan-out for large slices.
* ``overwrite_partitions`` — dynamic partition overwrite: replaces ONLY
  the partitions present in the incoming frame (Spark's static mode
  would truncate the whole root).
* ``read_pruned`` — plain ``spark.read`` plus an assertion helper that
  the partition filter actually reached the scan (``PartitionFilters``
  in the FileScan, not a post-scan Filter over all files).

Parquet is the default format; ORC is supported with the same calls
(both are Spark-native columnar sources with identical pruning
semantics — exercised by tests/test_partitioned_layout.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as a hive-partitioned dataset.

    Repartitions by the partition columns first (plus a deterministic
    intra-partition split key when ``files_per_partition`` > 1) so each
    output directory receives exactly ``files_per_partition`` files —
    without this, every upstream task holding rows of a partition writes
    its own fragment and a 1000-task stage × 100 partitions yields 100k
    tiny files.
    """
    if files_per_partition < 1:
        raise ValueError("files_per_partition must be >= 1")
    cols = [F.col(c) for c in partition_cols]
    if files_per_partition == 1:
        staged = df.repartition(*cols)
    else:
        split = (
            F.abs(F.hash(*df.columns)) % files_per_partition
        ).alias("__split")
        staged = df.withColumn("__split", split).repartition(
            *cols, F.col("__split")
        ).drop("__split")
    (
        staged.write.format(fmt)
        .mode("overwrite")
        .partitionBy(*partition_cols)
        .save(path)
    )


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
) -> None:
    """Dynamic partition overwrite: replace only the partitions present
    in ``df``, leaving sibling directories untouched. Scoped via the
    per-write option (no session-level config mutation leaks)."""
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.format(fmt)
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .save(path)
    )


def read_pruned(spark: SparkSession, path: str, fmt: str = "parquet"):
    """Read a partitioned dataset root (partition columns come back as
    real columns, inferred from the directory names)."""
    return spark.read.format(fmt).load(path)


def partition_filters(df: DataFrame) -> str:
    """The FileScan's PartitionFilters clause (empty string if the scan
    has none) — test hook for 'did the filter prune at planning time'."""
    plan = df._jdf.queryExecution().toString()
    for line in plan.splitlines():
        if "PartitionFilters" in line:
            return line
    return ""
