#!/usr/bin/env python3
"""Write the locations-exporter fixture tables (parquet) and the
set-creator input CSV.

Schemas follow FIXTURES.md §3 / §5 (columns the reference consumes,
location_csv_export.py:107-122 and concept_set_csv_creator.py:51-64).
Deterministic hand-built data sized for the end-to-end
``locations_export_q`` / ``concept_set_q`` driver rows: a 3-level parent
hierarchy with a child whose id precedes its parent (the reference's
known output-ordering gap), locations with 0/1/many tags and attributes,
a retired location, an attribute value containing ``:`` (the reference
bug we deliberately do not reproduce), and a set CSV whose member uuids
sort in input order so the oracle can replay Sort Weight relationally.

Run from the repo root: ``python tools/make_location_fixtures.py``.
Output: ``fixtures/locations/*.parquet``, ``fixtures/set_creator/input.csv``
(committed; the oracle SQL in queries.py pins this data).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOC_DIR = os.path.join(ROOT, "fixtures", "locations")
SET_DIR = os.path.join(ROOT, "fixtures", "set_creator")

TABLES: dict[str, tuple[dict[str, pa.DataType], list[tuple]]] = {
    "location": (
        {
            "location_id": pa.int64(),
            "uuid": pa.string(),
            "retired": pa.int32(),
            "name": pa.string(),
            "description": pa.string(),
            "parent_location": pa.int64(),
        },
        [
            # id 1 is a CHILD of id 4: children-before-parents in id order
            (1, "uuid-ward", 0, "Ward A", "Inpatient ward", 4),
            (2, "uuid-hq", 0, "HQ", "Main site", None),
            (3, "uuid-old", 1, "Old site", None, 2),
            (4, "uuid-clinic", 0, "Clinic", None, 2),
            (5, "uuid-lab", 0, "Lab", "On-site lab", 4),
            (6, "uuid-remote", 0, "Remote", None, None),
        ],
    ),
    "location_tag_map": (
        {"location_id": pa.int64(), "location_tag_id": pa.int64()},
        [(2, 1), (2, 2), (4, 2), (4, 3), (5, 3), (1, 2)],
    ),
    "location_tag": (
        {"location_tag_id": pa.int64(), "name": pa.string()},
        [(1, "Login Location"), (2, "Visit Location"), (3, "Lab Location")],
    ),
    "location_attribute": (
        {
            "location_id": pa.int64(),
            "attribute_type_id": pa.int64(),
            "value_reference": pa.string(),
        },
        [
            (4, 1, "CL-123"),
            (4, 2, "http://x:8080"),  # ':' inside the value must survive
            (5, 1, "LB-9"),
            (1, 3, "12"),
        ],
    ),
    "location_attribute_type": (
        {"location_attribute_type_id": pa.int64(), "name": pa.string()},
        [(1, "Code"), (2, "URL"), (3, "Beds")],
    ),
}

SET_CSV = """uuid,Fully specified name:en,Void/Retire
set-uuid,My Set,
m01,Alpha,
m02,Beta,
m03,Gamma,
m04,Delta,
"""


def main() -> None:
    os.makedirs(LOC_DIR, exist_ok=True)
    for name, (schema, rows) in TABLES.items():
        cols = list(schema)
        table = pa.table(
            {c: [r[i] for r in rows] for i, c in enumerate(cols)},
            schema=pa.schema(schema),
        )
        path = os.path.join(LOC_DIR, f"{name}.parquet")
        pq.write_table(table, path)
        print(f"wrote {path} ({table.num_rows} rows)")
    os.makedirs(SET_DIR, exist_ok=True)
    csv_path = os.path.join(SET_DIR, "input.csv")
    with open(csv_path, "w", newline="") as f:
        f.write(SET_CSV)
    print(f"wrote {csv_path}")


if __name__ == "__main__":
    main()
