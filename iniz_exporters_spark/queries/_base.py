"""Registry core: QuerySpec, REGISTRY, the register decorator, and
the shared decimal helpers. Split out of the original single-module
queries.py (round 9); every chunk module registers into REGISTRY here."""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession, Window

from iniz_exporters_spark.catalog import Catalog


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    headline: bool = False  # include in bench.py


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, headline: bool = False):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, headline=headline)
        return fn

    return deco


def _dec(col, prec=18, scale=4):
    """Exact decimal view of a double column (order-independent summation)."""
    return col.cast(f"decimal({prec},{scale})")


def _money(col):
    """Final presentation of an exact decimal aggregate: double, 2 dp."""
    return F.round(col.cast("double"), 2)
