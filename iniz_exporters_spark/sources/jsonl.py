"""JSONL (newline-delimited JSON) source/sink — the interchange format
LLM training corpora actually ship in (one document object per line,
gzip-compressed shards).

Design points for the 100 TB read path:
  * ``read_jsonl`` REQUIRES an explicit schema. Schema inference on a
    JSON source is a full extra pass over every shard before the real
    job starts — at corpus scale that is a second scan of the dataset.
    Callers pass the DDL they expect; with ``keep_corrupt=True`` (the
    default) unparseable lines land in the ``_corrupt_record`` column
    (PERMISSIVE mode) instead of aborting the job, and
    ``corrupt_line_report`` turns that column into the data-quality
    rollup an intake pipeline wants. With ``keep_corrupt=False``
    malformed lines degrade to all-null data rows indistinguishable
    from legitimately-null records — only pass False when the schema
    has required fields you filter on anyway.
  * ``write_jsonl_shards`` controls shard count explicitly. Note gzip
    shards are NOT splittable — each is consumed whole by one task —
    so per-reader parallelism comes from the SHARD COUNT, which is
    exactly why the count is a required, honored parameter here.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt_record"


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    shard_by: str | None = None,
    compression: str = "gzip",
) -> None:
    """Write ``df`` as exactly ``n_shards`` JSONL shards under ``path``.

    ``shard_by`` repartitions on a content column so shard MEMBERSHIP is
    ``hash(shard_by) % n_shards`` — stable across reruns and cluster
    sizes, the property downstream dedup/split tooling relies on. The
    column must be high-cardinality (a doc id, not a language code):
    with k distinct values only min(k, n_shards) shards receive rows.
    Without ``shard_by`` a round-robin repartition balances sizes but
    membership is layout-dependent.
    """
    if shard_by is not None:
        out = df.repartition(n_shards, F.col(shard_by))
    else:
        # coalesce() can only LOWER the partition count — honor the
        # requested shard count in both directions
        out = df.repartition(n_shards)
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
    PERMISSIVE mode to populate it (Spark JSON-source contract); it is
    appended unless the caller's DDL already carries it (round-tripping
    a schema from an earlier ``read_jsonl`` is fine). Presence is
    decided by PARSING the DDL and comparing field names exactly — a
    substring check would mistake a column merely CONTAINING
    '_corrupt_record' (e.g. ``my_corrupt_records``) for the quarantine
    column and silently drop malformed lines (ADVICE r11).
    """
    from pyspark.sql.types import StructType

    ddl = schema_ddl
    if keep_corrupt and CORRUPT_COL not in StructType.fromDDL(
        schema_ddl
    ).fieldNames():
        ddl = f"{schema_ddl}, {CORRUPT_COL} string"
    reader = (
        spark.read.schema(ddl)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    return reader.json(path)


def corrupt_line_report(df: DataFrame, anchor_col: str) -> DataFrame:
    """(n_rows, n_anchor_nonnull, n_corrupt, corrupt_rate) for a frame
    read by ``read_jsonl`` with ``keep_corrupt=True`` — the intake
    data-quality gate.

    ``anchor_col`` names a DATA column counted alongside the corrupt
    column: Spark's JSON source rejects plans whose referenced columns
    are ONLY the internal corrupt record (UNSUPPORTED_FEATURE.
    QUERY_ONLY_CORRUPT_RECORD_COLUMN) because the raw line is not
    retained after pruning — anchoring the scan on a real column keeps
    the report a single map-side-combined pass with no cache step.
    Empty inputs report zeros, never NULLs."""
    n_corrupt = F.sum(
        F.when(F.col(CORRUPT_COL).isNotNull(), 1).otherwise(0)
    )
    n_rows = F.count(F.lit(1))
    return df.agg(
        n_rows.cast("long").alias("n_rows"),
        F.count(F.col(anchor_col)).cast("long").alias(
            "n_anchor_nonnull"
        ),
        F.coalesce(n_corrupt, F.lit(0)).cast("long").alias("n_corrupt"),
        F.coalesce(
            F.round(n_corrupt / F.nullif(n_rows, F.lit(0)), 6),
            F.lit(0.0),
        ).alias("corrupt_rate"),
    )
