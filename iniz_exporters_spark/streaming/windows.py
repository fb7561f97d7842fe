"""Structured Streaming surface (SURVEY §2.11 — engine extension; the
reference has no streaming).

Batch-first design: every aggregation here is expressed with the window
functions that behave identically on static DataFrames and on streams
(`F.window`, `F.session_window`), so correctness is oracle-checked in batch
(queries.py tumbling/sliding/session entries) and the same builders are
re-used under ``readStream``.

Late data: ``stream_events`` applies an event-time watermark before any
windowed aggregation — required for state eviction in append mode. At scale
the state store is partitioned by group key; session windows additionally
need ``spark.sql.streaming.statefulOperator.allowMultiple`` defaults (left
as Spark defaults here).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def ensure_event_time(df: DataFrame, ts: str) -> DataFrame:
    """Coerce an event-time column to TIMESTAMP if it arrived as
    TIMESTAMP_NTZ (parquet written with isAdjustedToUTC=false).

    ``withWatermark`` and ``unix_micros`` accept only TIMESTAMP; with the
    session timezone pinned to UTC (session.py) the cast is
    value-transparent. No-op for columns already typed TIMESTAMP."""
    if dict(df.dtypes).get(ts) == "timestamp_ntz":
        return df.withColumn(ts, F.col(ts).cast("timestamp"))
    return df


def tumbling_agg(df: DataFrame, ts: str = "ts", size: str = "1 hour",
                 keys: tuple[str, ...] = ("event_type",)) -> DataFrame:
    return (
        df.groupBy(F.window(ts, size).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), *keys, "n_events", "sum_value")
    )


def sliding_agg(df: DataFrame, ts: str = "ts", size: str = "2 hours",
                slide: str = "1 hour") -> DataFrame:
    return (
        df.groupBy(F.window(ts, size, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "n_events", "sum_value")
    )


def session_agg(df: DataFrame, ts: str = "ts", gap: str = "30 minutes",
                key: str = "user_id") -> DataFrame:
    return (
        df.groupBy(F.session_window(ts, gap).alias("w"), key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(key, F.col("w.start").alias("session_start"),
                "n_events", "sum_value")
    )


def stream_events(
    spark: SparkSession,
    source_dir: str,
    schema,  # DDL string or StructType
    watermark: str = "1 hour",
    ts: str = "ts",
) -> DataFrame:
    """File-source stream of event rows with an event-time watermark.

    ``source_dir`` is watched for new parquet files — the standard
    file-based micro-batch source; swap ``format`` for kafka in production
    wiring. The watermark bounds state: windows older than (max event time −
    watermark) are finalized and evicted.
    """
    stream = spark.readStream.schema(schema).format("parquet").load(source_dir)
    return ensure_event_time(stream, ts).withWatermark(ts, watermark)
