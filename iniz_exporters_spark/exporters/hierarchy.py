"""Generic self-join hierarchy export — the pattern behind the reference's
manual SQL scripts (sql/locations.sql:5-12 parent-by-uuid locations,
sql/ordertypes.sql:1-9 order types): project Uuid / Void/Retire / Name /
Description (+ passthrough columns) and the parent's UUID via a self
left-join, ordered by primary key. Column order and header spellings match
the reference scripts exactly ('Uuid', not 'UUID'; Parent last).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def hierarchy_export(
    df: DataFrame,
    id_col: str,
    parent_fk: str,
    name_col: str = "name",
    desc_col: str = "description",
    uuid_col: str = "uuid",
    retired_col: str | None = "retired",
    extra_cols: dict[str, str] | None = None,
) -> DataFrame:
    """J5/O1: (Uuid, Void/Retire?, Name, Description, extras..., Parent)
    rows ordered by ``id_col``; ``Parent`` is the parent row's uuid.

    ``extra_cols`` maps source column → output header for passthrough
    columns between Description and Parent (reference
    sql/ordertypes.sql:17 'Java class name').
    """
    child = df.alias("t")
    parent = df.alias("p")
    cols = [F.col(f"t.{uuid_col}").alias("Uuid")]
    if retired_col:
        cols.append(F.col(f"t.{retired_col}").alias("Void/Retire"))
    cols += [
        F.col(f"t.{name_col}").alias("Name"),
        F.col(f"t.{desc_col}").alias("Description"),
    ]
    for src, header in (extra_cols or {}).items():
        cols.append(F.col(f"t.{src}").alias(header))
    cols.append(F.col(f"p.{uuid_col}").alias("Parent"))
    return (
        child.join(
            parent,
            F.col(f"t.{parent_fk}") == F.col(f"p.{id_col}"),
            "left",
        )
        .orderBy(F.col(f"t.{id_col}").asc())
        .select(*cols)
    )


def locations_sql_export(location: DataFrame) -> DataFrame:
    """Mirror of sql/locations.sql:5-12 (parent-by-uuid variant of the
    locations export)."""
    return hierarchy_export(
        location, id_col="location_id", parent_fk="parent_location"
    )


def ordertypes_sql_export(order_type: DataFrame) -> DataFrame:
    """Mirror of sql/ordertypes.sql:14-21 including 'Java class name'."""
    return hierarchy_export(
        order_type,
        id_col="order_type_id",
        parent_fk="parent",
        extra_cols={"java_class_name": "Java class name"},
    )
