"""Generic self-join hierarchy export — the pattern behind the reference's
manual SQL scripts (sql/locations.sql:5-12 parent-by-uuid locations,
sql/ordertypes.sql:1-9 order types): project Name / Description / UUID and
the parent's UUID via a self left-join, ordered by primary key.
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
) -> DataFrame:
    """J5/O1: (Name, Description, UUID, Parent, Void/Retire?) rows ordered
    by ``id_col``. ``Parent`` is the parent row's uuid."""
    child = df.alias("t")
    parent = df.alias("p")
    cols = [
        F.col(f"t.{name_col}").alias("Name"),
        F.col(f"t.{desc_col}").alias("Description"),
        F.col(f"t.{uuid_col}").alias("UUID"),
        F.col(f"p.{uuid_col}").alias("Parent"),
    ]
    if retired_col:
        cols.append(F.col(f"t.{retired_col}").alias("Void/Retire"))
    return (
        child.join(
            parent,
            F.col(f"t.{parent_fk}") == F.col(f"p.{id_col}"),
            "left",
        )
        .orderBy(F.col(f"t.{id_col}").asc())
        .select(*cols)
    )
