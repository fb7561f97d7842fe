"""JSONL (newline-delimited JSON) source/sink — the interchange format
LLM training corpora actually ship in (one document object per line,
gzip-compressed shards).

Design points for the 100 TB read path:
  * ``read_jsonl`` REQUIRES an explicit schema. Schema inference on a
    JSON source is a full extra pass over every shard before the real
    job starts — at corpus scale that is a second scan of the dataset.
    Callers pass the DDL they expect; unparseable lines land in the
    ``_corrupt_record`` column (PERMISSIVE mode) instead of aborting the
    job, and ``corrupt_line_report`` turns that column into the
    per-shard data-quality rollup an intake pipeline wants.
  * ``write_jsonl_shards`` controls shard count explicitly (repartition
    by a content-keyed column when given, else coalesce) so output
    shards are balanced for the NEXT reader, and defaults to gzip —
    line-splittable formats beat monolithic archives for re-reads.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt_record"


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    shard_by: str | None = None,
    compression: str = "gzip",
) -> None:
    """Write ``df`` as JSONL shards under ``path``.

    ``shard_by`` repartitions on a content column (stable shard
    membership across reruns — the property downstream dedup/split
    tooling relies on); plain ``n_shards`` coalesces, which avoids a
    shuffle when only the file count matters.
    """
    out = df
    if shard_by is not None:
        out = df.repartition(n_shards or df.rdd.getNumPartitions(),
                             F.col(shard_by))
    elif n_shards is not None:
        out = df.coalesce(n_shards)
    out.write.mode("overwrite").option("compression", compression).json(
        path
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Schema-enforced JSONL read; malformed lines survive as rows whose
    ``_corrupt_record`` holds the raw line (all data columns null).

    The corrupt column must be part of the declared schema for
    PERMISSIVE mode to populate it (Spark JSON-source contract).
    """
    ddl = schema_ddl
    if keep_corrupt:
        ddl = f"{schema_ddl}, {CORRUPT_COL} string"
    reader = (
        spark.read.schema(ddl)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    return reader.json(path)


def corrupt_line_report(df: DataFrame, anchor_col: str) -> DataFrame:
    """(n_rows, n_anchor_nonnull, n_corrupt, corrupt_rate) for a frame
    read by ``read_jsonl`` — the intake data-quality gate.

    ``anchor_col`` names a DATA column counted alongside the corrupt
    column: Spark's JSON source rejects plans whose referenced columns
    are ONLY the internal corrupt record (UNSUPPORTED_FEATURE.
    QUERY_ONLY_CORRUPT_RECORD_COLUMN) because the raw line is not
    retained after pruning — anchoring the scan on a real column keeps
    the report a single map-side-combined pass with no cache step."""
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count(F.col(anchor_col)).cast("long").alias(
            "n_anchor_nonnull"
        ),
        F.sum(
            F.when(F.col(CORRUPT_COL).isNotNull(), 1).otherwise(0)
        ).cast("long").alias("n_corrupt"),
        F.round(
            F.sum(F.when(F.col(CORRUPT_COL).isNotNull(), 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("corrupt_rate"),
    )
