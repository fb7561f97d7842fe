"""Byte-exact golden tests for the exporter CSVs.

The reference's real contract is its output file (concept_csv_export.py:
183-190, location_csv_export.py:98-102): one header row in the documented
column order, NULL rendered as the empty string, Void/Retire blank (concepts)
or the 0/1 retired flag (locations), members/mappings ';'-joined. These tests
pin the EXACT bytes produced from the shared fixture tables so any drift in
column ordering, NULL policy, number rendering, quoting, or line endings
(concepts: csv.DictWriter '\r\n' like the reference; locations: Spark CSV
writer '\n') fails loudly.

Regenerate after an INTENTIONAL format change with:
    python tests/test_golden.py regen
"""

import os
import sys

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _build_concepts(spark, concept_tables, outfile):
    from iniz_exporters_spark.exporters.concepts import (
        ConceptExportConfig,
        export_concepts,
    )

    cfg = ConceptExportConfig(
        locales=["en", "es"],
        concept_sources=["PIH|Name", "PIH|Number", "CIEL"],
    )
    export_concepts(spark, concept_tables, cfg, outfile=outfile)


def _build_locations(location_tables, outfile):
    from iniz_exporters_spark.exporters.locations import build_locations_export
    from iniz_exporters_spark.sources.csv_sink import write_single_csv

    cols, df = build_locations_export(location_tables)
    write_single_csv(df, outfile, columns=cols)


def test_concepts_csv_bytes_golden(spark, tmp_path):
    from test_exporters import concept_tables

    out = str(tmp_path / "concepts.csv")
    _build_concepts(spark, concept_tables.__wrapped__(spark), out)
    with open(out, "rb") as f:
        got = f.read()
    with open(os.path.join(GOLDEN_DIR, "concepts.csv"), "rb") as f:
        want = f.read()
    assert got == want


def test_locations_csv_bytes_golden(spark, tmp_path):
    from test_exporters import location_tables

    out = str(tmp_path / "locations.csv")
    _build_locations(location_tables.__wrapped__(spark), out)
    with open(out, "rb") as f:
        got = f.read()
    with open(os.path.join(GOLDEN_DIR, "locations.csv"), "rb") as f:
        want = f.read()
    assert got == want


if __name__ == "__main__" and "regen" in sys.argv:
    sys.path.insert(0, os.path.dirname(__file__))
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import test_exporters as te

    from iniz_exporters_spark.session import get_spark

    spark = get_spark("golden-regen")
    spark.sparkContext.setLogLevel("ERROR")
    _build_concepts(
        spark,
        te.concept_tables.__wrapped__(spark),
        os.path.join(GOLDEN_DIR, "concepts.csv"),
    )
    _build_locations(
        te.location_tables.__wrapped__(spark),
        os.path.join(GOLDEN_DIR, "locations.csv"),
    )
    print("regenerated", GOLDEN_DIR)
