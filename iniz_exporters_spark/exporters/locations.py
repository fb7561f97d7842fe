"""Locations exporter (reference location_csv_export.py:105-230).

Spark restructure of note: the reference joins tags AND attributes onto
locations in one statement, producing a tags×attributes cartesian fan-out
per location that it papers over with ``group_concat(distinct …)``
(SURVEY §2 J6). Here tags and attributes are aggregated **separately** and
joined back — identical declared output, no fan-out, and each facet shuffles
once on location_id.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def build_locations_export(t: dict[str, DataFrame]) -> tuple[list[str], DataFrame]:
    """Returns (ordered columns, DataFrame) for the Initializer
    locations CSV: UUID, Void/Retire, Name, Description, Parent,
    sorted Attribute|<type> columns, sorted Tag|<name> columns."""
    loc = t["location"].alias("l")
    parent = t["location"].alias("p")

    base = (
        loc.join(
            parent,
            F.col("l.parent_location") == F.col("p.location_id"),
            "left",
        )
        .select(
            F.col("l.location_id").alias("location_id"),
            F.col("l.uuid").alias("UUID"),
            F.col("l.retired").alias("Void/Retire"),
            F.col("l.name").alias("Name"),
            F.col("l.description").alias("Description"),
            F.col("p.name").alias("Parent"),
        )
    )

    # R2: one Tag|<name> = "TRUE" column per distinct tag in the data
    tags = (
        t["location_tag_map"].alias("ltm")
        .join(
            F.broadcast(t["location_tag"]).alias("lt"),
            F.col("ltm.location_tag_id") == F.col("lt.location_tag_id"),
        )
        .select("ltm.location_id", F.col("lt.name").alias("tag"))
        .groupBy("location_id")
        .pivot("tag")
        .agg(F.first(F.lit("TRUE")))
    )
    tag_cols = sorted(c for c in tags.columns if c != "location_id")
    tags = tags.select(
        "location_id", *[F.col(f"`{c}`").alias(f"Tag|{c}") for c in tag_cols]
    )

    # R3: one Attribute|<type> = value_reference column per attribute type
    attrs = (
        t["location_attribute"].alias("la")
        .join(
            F.broadcast(t["location_attribute_type"]).alias("lat"),
            F.col("la.attribute_type_id")
            == F.col("lat.location_attribute_type_id"),
        )
        .select(
            "la.location_id",
            F.col("lat.name").alias("attr"),
            F.col("la.value_reference").alias("val"),
        )
        .groupBy("location_id")
        .pivot("attr")
        .agg(F.first("val"))
    )
    attr_cols = sorted(c for c in attrs.columns if c != "location_id")
    attrs = attrs.select(
        "location_id",
        *[F.col(f"`{c}`").alias(f"Attribute|{c}") for c in attr_cols],
    )

    out = (
        base.join(attrs, "location_id", "left")
        .join(tags, "location_id", "left")
        .orderBy("location_id")  # reference: order by l.location_id asc
        .drop("location_id")
    )
    # reference get_columns (location_csv_export.py:219-230): fixed 5 +
    # sorted attributes + sorted tags
    columns = (
        ["UUID", "Void/Retire", "Name", "Description", "Parent"]
        + [f"Attribute|{c}" for c in attr_cols]
        + [f"Tag|{c}" for c in tag_cols]
    )
    return columns, out.select(*[F.col(f"`{c}`") for c in columns])
