"""Catalog — named base tables behind one interface.

The reference reaches its base tables by shelling out to the ``mysql`` CLI
(reference concept_csv_export.py:533-558); this engine reaches them through
Spark's pluggable sources instead: a parquet directory for fixtures/benchmarks
or a JDBC url for a live MySQL — same downstream plan either way, so Catalyst
pushdown (filters, column pruning) reaches the source in both cases.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Tables small enough (dimension-scale at any SF) that join sites may add an
#: explicit broadcast hint. AQE would usually catch these anyway; the hint
#: makes the plan deterministic.
DIMENSION_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


class Catalog:
    """Resolve table names to DataFrames from a parquet dir or JDBC source."""

    def __init__(self, spark: SparkSession, base: str | None = None, jdbc_url: str | None = None,
                 jdbc_props: dict[str, str] | None = None):
        self.spark = spark
        self.base = base or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        self.jdbc_url = jdbc_url
        self.jdbc_props = jdbc_props or {}
        self._cache: dict[str, DataFrame] = {}

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            if self.jdbc_url:
                reader = self.spark.read.format("jdbc").option("url", self.jdbc_url)
                for k, v in self.jdbc_props.items():
                    reader = reader.option(k, v)
                self._cache[name] = reader.option("dbtable", name).load()
            else:
                self._cache[name] = self._read_parquet(name)
        return self._cache[name]

    def _read_parquet(self, name: str) -> DataFrame:
        """Read one parquet table, tolerating TIMESTAMP(NANOS) columns.

        Spark has no nanosecond timestamp type; files written with
        timestamp[ns] (the events table) are read with
        ``spark.sql.legacy.parquet.nanosAsLong`` and the long is truncated
        to microseconds — the same truncation DuckDB applies, so both
        engines see identical values.
        """
        import pyspark.sql.functions as F

        from pyspark.errors import AnalysisException

        from iniz_exporters_spark.session import Py4JJavaError

        path = os.path.join(self.base, f"{name}.parquet")
        try:
            df = self.spark.read.parquet(path)
        except (AnalysisException, Py4JJavaError):
            # Spark-side schema-conversion failure only ("Illegal Parquet
            # type: INT64 (TIMESTAMP(NANOS,...))" on Spark versions without
            # native nanos support). Repo-side bugs (NameError/TypeError)
            # propagate — see DETERMINISM.md error-contract rule.
            self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = self.spark.read.parquet(path)
        # nanosAsLong (set here or earlier in the session) leaves ns-epoch
        # longs; restore timestamp type for known event-time columns
        for field_name, dtype in df.dtypes:
            if dtype == "bigint" and field_name in ("ts",):
                df = df.withColumn(
                    field_name,
                    F.timestamp_micros(F.expr(f"{field_name} div 1000")),
                )
        # Files written with isAdjustedToUTC=false read as TIMESTAMP_NTZ,
        # which strict consumers (unix_micros, withWatermark) reject.
        # The session timezone is pinned to UTC (session.py), so casting to
        # TIMESTAMP is value-transparent — every instant keeps the same
        # wall-clock reading — and the engine presents one timestamp type
        # regardless of how the parquet writer flagged the column.
        for field_name, dtype in df.dtypes:
            if dtype == "timestamp_ntz":
                df = df.withColumn(
                    field_name, F.col(field_name).cast("timestamp")
                )
        return df

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        return self.table(name)


def load_tables(spark: SparkSession, sf_dir: str) -> Catalog:
    """Convenience: a Catalog rooted at one scale-factor directory."""
    return Catalog(spark, base=sf_dir)
