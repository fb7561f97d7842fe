#!/usr/bin/env python3
"""Write the OpenMRS-subset concept fixture tables as parquet.

Schemas follow FIXTURES.md §2 (column set the reference's generated wide
query consumes, concept_csv_export.py:316-389). The data is a deterministic
hand-built dictionary sized for the end-to-end ``concepts_export_q`` driver
row: a 3-level set tree (Labs → Vitals → Weight/Height), coded answers,
voided names, retired concepts/terms/members, multi-locale names, a
newline-bearing description, the PIH Number/Name cast-discriminator split,
multi-code GROUP_CONCAT cells, and columns that are NULL everywhere
(exercising dynamic column pruning).

Run from the repo root: ``python tools/make_concept_fixtures.py``.
Output: ``fixtures/concepts/*.parquet`` (committed; regenerate only when
the fixture design changes — the oracle SQL in queries.py pins this data).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "concepts",
)

TABLES: dict[str, tuple[dict[str, pa.DataType], list[tuple]]] = {
    "concept": (
        {
            "concept_id": pa.int64(),
            "uuid": pa.string(),
            "class_id": pa.int64(),
            "datatype_id": pa.int64(),
            "retired": pa.int32(),
            "is_set": pa.int32(),
        },
        [
            (1, "uuid-weight", 10, 20, 0, 0),
            (2, "uuid-height", 10, 20, 0, 0),
            (3, "uuid-vitals", 11, 21, 0, 1),
            (4, "uuid-yes", 13, 21, 0, 0),
            (5, "uuid-no", 13, 21, 0, 0),
            (6, "uuid-colour", 12, 22, 0, 0),
            (7, "uuid-labs", 11, 21, 0, 1),
            (8, "uuid-hgb", 10, 20, 0, 0),
            (9, "uuid-retired", 10, 20, 1, 0),
            (10, "uuid-orphan", 13, 23, 0, 0),
        ],
    ),
    "concept_class": (
        {"concept_class_id": pa.int64(), "name": pa.string()},
        [(10, "Test"), (11, "ConvSet"), (12, "Question"), (13, "Misc")],
    ),
    "concept_datatype": (
        {"concept_datatype_id": pa.int64(), "name": pa.string()},
        [(20, "Numeric"), (21, "N/A"), (22, "Coded"), (23, "Text")],
    ),
    "concept_name": (
        {
            "concept_id": pa.int64(),
            "name": pa.string(),
            "locale": pa.string(),
            "concept_name_type": pa.string(),
            "voided": pa.int32(),
        },
        [
            (1, "Weight", "en", "FULLY_SPECIFIED", 0),
            (1, "Wt", "en", "SHORT", 0),
            (1, "Peso", "es", "FULLY_SPECIFIED", 0),
            (1, "Old weight", "en", "FULLY_SPECIFIED", 1),  # voided
            (2, "Height", "en", "FULLY_SPECIFIED", 0),
            (2, "Ht", "en", "SHORT", 0),
            (2, "Altura", "es", "FULLY_SPECIFIED", 0),
            (3, "Vitals", "en", "FULLY_SPECIFIED", 0),
            (3, "Signos vitales", "es", "FULLY_SPECIFIED", 0),
            (4, "Yes", "en", "FULLY_SPECIFIED", 0),
            (5, "No", "en", "FULLY_SPECIFIED", 0),
            (6, "Colour", "en", "FULLY_SPECIFIED", 0),
            (6, "Col", "en", "SHORT", 0),
            (7, "Labs", "en", "FULLY_SPECIFIED", 0),
            (8, "Hemoglobin", "en", "FULLY_SPECIFIED", 0),
            (8, "Hgb", "en", "SHORT", 0),
            (9, "Retired thing", "en", "FULLY_SPECIFIED", 0),
            (10, "Orphan", "en", "FULLY_SPECIFIED", 0),
            # fr name is outside cfg.locales → never exported
            (1, "Poids", "fr", "FULLY_SPECIFIED", 0),
        ],
    ),
    "concept_description": (
        {
            "concept_id": pa.int64(),
            "description": pa.string(),
            "locale": pa.string(),
        },
        [
            (1, "Body\nweight", "en"),  # newline must be stripped
            (1, "Poids corporel", "fr"),  # non-default locale → ignored
            (3, "Vital\r\nsigns", "en"),
            (8, "Blood hemoglobin", "en"),
        ],
    ),
    "concept_reference_map": (
        {
            "concept_id": pa.int64(),
            "concept_map_type_id": pa.int64(),
            "concept_reference_term_id": pa.int64(),
        },
        [
            (1, 1, 100),  # CIEL 5089 SAME-AS
            (1, 1, 101),  # PIH 123 → PIH|Number
            (1, 1, 102),  # PIH WEIGHT → PIH|Name
            (1, 2, 103),  # CIEL 2000 NARROWER-THAN
            (2, 1, 104),  # CIEL 5090
            (2, 1, 105),  # CIEL 1342 (two codes → ';'-joined, sorted)
            (6, 1, 106),  # PIH COLOUR → PIH|Name
            (8, 1, 107),  # CIEL 21
            (8, 1, 108),  # PIH 456 → PIH|Number
            (8, 1, 109),  # retired term → excluded
            (3, 3, 110),  # BROADER-THAN outside cfg.mapping_types → dropped
        ],
    ),
    "concept_map_type": (
        {"concept_map_type_id": pa.int64(), "name": pa.string()},
        [(1, "SAME-AS"), (2, "NARROWER-THAN"), (3, "BROADER-THAN")],
    ),
    "concept_reference_term": (
        {
            "concept_reference_term_id": pa.int64(),
            "code": pa.string(),
            "concept_source_id": pa.int64(),
            "retired": pa.int32(),
        },
        [
            (100, "5089", 200, 0),
            (101, "123", 201, 0),
            (102, "WEIGHT", 201, 0),
            (103, "2000", 200, 0),
            (104, "5090", 200, 0),
            (105, "1342", 200, 0),
            (106, "COLOUR", 201, 0),
            (107, "21", 200, 0),
            (108, "456", 201, 0),
            (109, "9999", 200, 1),  # retired
            (110, "777", 200, 0),
        ],
    ),
    "concept_reference_source": (
        {"concept_source_id": pa.int64(), "name": pa.string()},
        [(200, "CIEL"), (201, "PIH")],
    ),
    "concept_numeric": (
        {
            "concept_id": pa.int64(),
            "hi_absolute": pa.float64(),
            "hi_critical": pa.float64(),
            "hi_normal": pa.float64(),
            "low_absolute": pa.float64(),
            "low_critical": pa.float64(),
            "low_normal": pa.float64(),
            "units": pa.string(),
            "display_precision": pa.int32(),
            "allow_decimal": pa.int32(),
        },
        [
            # hi_critical/hi_normal/low_critical/low_normal NULL everywhere
            # → their export columns prune; low_absolute 0.0 must SURVIVE
            (1, 250.0, None, None, 0.0, None, None, "kg", 1, 1),
            (8, 25.0, None, None, 1.0, None, None, "g/dL", 1, 1),
        ],
    ),
    "concept_complex": (
        {"concept_id": pa.int64(), "handler": pa.string()},
        [(4, "ImageHandler")],
    ),
    "concept_set": (
        {
            "concept_set": pa.int64(),
            "concept_id": pa.int64(),
            "sort_weight": pa.float64(),
        },
        [
            (3, 1, 2.0),
            (3, 2, 1.0),  # Height (w=1) before Weight (w=2)
            (3, 9, 3.0),  # retired member → dropped from Members
            (7, 8, 1.0),
            (7, 3, 2.0),  # nested set: Labs contains Vitals
        ],
    ),
    "concept_answer": (
        {
            "concept_id": pa.int64(),
            "answer_concept": pa.int64(),
            "sort_weight": pa.float64(),
        },
        [(6, 4, 1.0), (6, 5, 2.0)],
    ),
}


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    for name, (schema, rows) in TABLES.items():
        cols = list(schema)
        table = pa.table(
            {c: [r[i] for r in rows] for i, c in enumerate(cols)},
            schema=pa.schema(schema),
        )
        path = os.path.join(OUT_DIR, f"{name}.parquet")
        pq.write_table(table, path)
        print(f"wrote {path} ({table.num_rows} rows)")


if __name__ == "__main__":
    main()
