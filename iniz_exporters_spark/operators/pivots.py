"""Dynamic pivots — data-discovered columns (SURVEY §2.9 R2/R3).

The reference widens location rows in Python: one ``Tag|<name>`` indicator
column per distinct tag and one ``Attribute|<name>`` value column per
distinct attribute type (location_csv_export.py:137-154). Here both are
``groupBy().pivot()`` — Spark collects the distinct pivot values (one small
job), then builds the wide aggregation in a single pass.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def spread_tags(
    df: DataFrame,
    key: str,
    tags_col: str = "Tags",
    sep: str = ",",
    prefix: str = "Tag|",
) -> DataFrame:
    """R2: explode a delimiter-joined tag cell into `Tag|<name>`="TRUE"
    indicator columns, one per distinct tag in the data."""
    exploded = df.select(
        F.col(key),
        F.explode_outer(
            F.filter(F.split(F.col(tags_col), sep), lambda t: t != "")
        ).alias("__tag"),
    )
    wide = (
        exploded.groupBy(key)
        .pivot("__tag")
        .agg(F.first(F.lit("TRUE")))
    )
    renames = {c: prefix + c for c in wide.columns if c not in (key, "null")}
    out = wide.select(
        key, *[F.col(f"`{c}`").alias(n) for c, n in sorted(renames.items())]
    )
    return df.drop(tags_col).join(out, on=key, how="left")


def spread_attributes(
    df: DataFrame,
    key: str,
    attrs_col: str = "Attributes",
    pair_sep: str = ",",
    kv_sep: str = ":",
    prefix: str = "Attribute|",
) -> DataFrame:
    """R3: explode `name:value` pairs into `Attribute|<name>`=value columns.

    Splits on the FIRST kv_sep only, so values containing ':' survive —
    deliberately not reproducing the reference bug at
    location_csv_export.py:150-151 (SURVEY §7.3 item 5).
    """
    exploded = df.select(
        F.col(key),
        F.explode_outer(
            F.filter(F.split(F.col(attrs_col), pair_sep), lambda t: t != "")
        ).alias("__pair"),
    ).select(
        key,
        F.regexp_extract("__pair", f"^([^{kv_sep}]*)", 1).alias("__k"),
        F.regexp_replace("__pair", f"^[^{kv_sep}]*{kv_sep}?", "").alias("__v"),
    )
    wide = exploded.groupBy(key).pivot("__k").agg(F.first("__v"))
    renames = {c: prefix + c for c in wide.columns if c not in (key, "null", "")}
    out = wide.select(
        key, *[F.col(f"`{c}`").alias(n) for c, n in sorted(renames.items())]
    )
    return df.drop(attrs_col).join(out, on=key, how="left")
