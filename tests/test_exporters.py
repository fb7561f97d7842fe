"""End-to-end exporter tests on synthetic OpenMRS-subset fixtures
(schemas from FIXTURES.md; shapes mirror the reference's live-DB smoke +
unit contracts, SURVEY §5).
"""

import pytest

from iniz_exporters_spark.exporters.concepts import (
    ConceptExportConfig,
    export_concepts,
)
from iniz_exporters_spark.exporters.hierarchy import hierarchy_export
from iniz_exporters_spark.exporters.locations import build_locations_export
from iniz_exporters_spark.exporters.set_creator import concept_set_rows


@pytest.fixture(scope="module")
def concept_tables(spark):
    def df(name, cols, rows):
        return spark.createDataFrame(rows, cols)

    return {
        "concept": df(
            "concept",
            ["concept_id", "uuid", "class_id", "datatype_id", "retired", "is_set"],
            [
                (1, "uuid-weight", 10, 20, 0, 0),
                (2, "uuid-height", 10, 20, 0, 0),
                (3, "uuid-vitals", 11, 21, 0, 1),
                (4, "uuid-yes", 12, 22, 0, 0),
                (5, "uuid-colour", 12, 22, 0, 0),
                (6, "uuid-retired", 10, 20, 1, 0),
            ],
        ),
        "concept_class": df(
            "concept_class",
            ["concept_class_id", "name"],
            [(10, "Test"), (11, "ConvSet"), (12, "Question")],
        ),
        "concept_datatype": df(
            "concept_datatype",
            ["concept_datatype_id", "name"],
            [(20, "Numeric"), (21, "N/A"), (22, "Coded")],
        ),
        "concept_description": df(
            "concept_description",
            ["concept_id", "description", "locale"],
            [
                (1, "Body\nweight", "en"),
                (1, "Poids", "fr"),
                (3, "Vital signs", "en"),
            ],
        ),
        "concept_name": df(
            "concept_name",
            ["concept_id", "name", "locale", "concept_name_type", "voided"],
            [
                (1, "Weight", "en", "FULLY_SPECIFIED", 0),
                (1, "Wt", "en", "SHORT", 0),
                (1, "Peso", "es", "FULLY_SPECIFIED", 0),
                (1, "Old weight", "en", "FULLY_SPECIFIED", 1),  # voided
                (2, "Height", "en", "FULLY_SPECIFIED", 0),
                (3, "Vitals", "en", "FULLY_SPECIFIED", 0),
                (4, "Yes", "en", "FULLY_SPECIFIED", 0),
                (5, "Colour", "en", "FULLY_SPECIFIED", 0),
                (6, "Retired thing", "en", "FULLY_SPECIFIED", 0),
            ],
        ),
        "concept_reference_map": df(
            "crm",
            ["concept_id", "concept_map_type_id", "concept_reference_term_id"],
            [(1, 1, 100), (1, 1, 101), (1, 1, 102), (1, 2, 103), (2, 1, 104)],
        ),
        "concept_map_type": df(
            "cmt",
            ["concept_map_type_id", "name"],
            [(1, "SAME-AS"), (2, "NARROWER-THAN")],
        ),
        "concept_reference_term": df(
            "crt",
            ["concept_reference_term_id", "code", "concept_source_id", "retired"],
            [
                (100, "5089", 200, 0),     # CIEL numeric code
                (101, "123", 201, 0),      # PIH numeric → PIH|Number
                (102, "WEIGHT", 201, 0),   # PIH name → PIH|Name
                (103, "2000", 200, 0),     # NARROWER-THAN CIEL
                (104, "5090", 200, 1),     # retired → excluded
            ],
        ),
        "concept_reference_source": df(
            "crs",
            ["concept_source_id", "name"],
            [(200, "CIEL"), (201, "PIH")],
        ),
        "concept_numeric": spark.createDataFrame(
            [(1, 250.0, None, None, 0.0, None, None, "kg", 1, 1)],
            "concept_id long, hi_absolute double, hi_critical double, "
            "hi_normal double, low_absolute double, low_critical double, "
            "low_normal double, units string, display_precision int, "
            "allow_decimal int",
        ),
        "concept_complex": df(
            "ccx", ["concept_id", "handler"], [(4, "ImageHandler")]
        ),
        "concept_set": df(
            "cs",
            ["concept_set", "concept_id", "sort_weight"],
            [(3, 1, 2.0), (3, 2, 1.0), (3, 6, 3.0)],  # 6 retired → dropped
        ),
        "concept_answer": df(
            "ca",
            ["concept_id", "answer_concept", "sort_weight"],
            [(5, 4, 1.0)],
        ),
    }


def test_concepts_export_values(spark, concept_tables):
    cfg = ConceptExportConfig(
        locales=["en", "es"], concept_sources=["PIH|Name", "PIH|Number", "CIEL"]
    )
    cols, rows = export_concepts(spark, concept_tables, cfg)
    by_uuid = {r["uuid"]: r for r in rows}
    assert len(rows) == 5  # retired concept 6 dropped

    w = by_uuid["uuid-weight"]
    assert w["Fully specified name:en"] == "Weight"  # voided name skipped
    assert w["Short name:en"] == "Wt"
    assert w["Fully specified name:es"] == "Peso"
    assert w["Description:en"] == "Bodyweight"  # newline stripped
    assert w["Data class"] == "Test"
    assert w["Data type"] == "Numeric"
    assert w["Mappings|SAME-AS|CIEL"] == "5089"
    assert w["Mappings|SAME-AS|PIH|Number"] == "123"
    assert w["Mappings|SAME-AS|PIH|Name"] == "WEIGHT"
    assert w["Mappings|NARROWER-THAN|CIEL"] == "2000"
    assert w["Absolute high"] == 250.0
    assert w["Units"] == "kg"
    assert w["Allow decimals"] == 1

    # Members ordered by sort_weight (Height w=1 before Weight w=2),
    # retired member 6 filtered out
    assert by_uuid["uuid-vitals"]["Members"] == "Height;Weight"
    assert by_uuid["uuid-colour"]["Answers"] == "Yes"
    assert by_uuid["uuid-yes"]["Complex data handler"] == "ImageHandler"

    # topo order: members before their containing set
    order = [r["uuid"] for r in rows]
    assert order.index("uuid-vitals") > order.index("uuid-weight")
    assert order.index("uuid-vitals") > order.index("uuid-height")
    assert order.index("uuid-colour") > order.index("uuid-yes")

    # column contract: fixed prefix, all-empty columns pruned, Void/Retire kept
    assert cols[:2] == ["uuid", "Void/Retire"]
    assert "Critical high" not in cols  # empty everywhere → pruned
    assert all(r["Void/Retire"] is None for r in rows)
    assert "Mappings|SAME-AS|CIEL" in cols
    # numeric zero is DATA, not emptiness: 'Absolute low' is 0.0 on its only
    # populated row and must survive pruning (reference sees the TSV string
    # '0', which is truthy — Python truthiness over native values would drop
    # the column and silently lose it from the export)
    assert "Absolute low" in cols
    assert w["Absolute low"] == 0.0


@pytest.mark.slow  # r15 gate budget: covered by a cheaper fast sibling; runs at round close (--runslow)
def test_concepts_tree_filter_and_exclude(spark, concept_tables):
    cfg = ConceptExportConfig(
        locales=["en"], concept_sources=["CIEL"], set_name="Vitals"
    )
    _, rows = export_concepts(spark, concept_tables, cfg)
    names = {r["Fully specified name:en"] for r in rows}
    assert names == {"Vitals", "Weight", "Height"}

    cfg2 = ConceptExportConfig(
        locales=["en"], concept_sources=["CIEL"], set_name="Vitals",
        exclude_keys=["Height"],
    )
    _, rows2 = export_concepts(spark, concept_tables, cfg2)
    assert {r["Fully specified name:en"] for r in rows2} == {"Vitals", "Weight"}


def test_concepts_key_mapping(spark, concept_tables):
    cfg = ConceptExportConfig(
        locales=["en"], concept_sources=["CIEL"], concept_key_mapping="CIEL",
        set_name=None,
    )
    # concepts 3,4,5 lack CIEL SAME-AS mappings → contract is to raise
    with pytest.raises(IndexError):
        export_concepts(spark, concept_tables, cfg)


@pytest.fixture(scope="module")
def location_tables(spark):
    def df(name, cols, rows):
        return spark.createDataFrame(rows, cols)

    return {
        "location": spark.createDataFrame(
            [
                (1, "uuid-hq", 0, "HQ", "Main site", None),
                (2, "uuid-clinic", 0, "Clinic", None, 1),
                (3, "uuid-old", 1, "Old site", None, 1),
            ],
            "location_id long, uuid string, retired int, name string, "
            "description string, parent_location long",
        ),
        "location_tag_map": df(
            "ltm", ["location_id", "location_tag_id"], [(1, 1), (1, 2), (2, 2)]
        ),
        "location_tag": df(
            "lt", ["location_tag_id", "name"],
            [(1, "Login Location"), (2, "Visit Location")],
        ),
        "location_attribute": df(
            "la",
            ["location_id", "attribute_type_id", "value_reference"],
            [(2, 1, "CL-123"), (2, 2, "http://x:8080")],  # value contains ':'
        ),
        "location_attribute_type": df(
            "lat",
            ["location_attribute_type_id", "name"],
            [(1, "Code"), (2, "URL")],
        ),
    }


def test_locations_export(location_tables):
    cols, df = build_locations_export(location_tables)
    rows = [r.asDict() for r in df.collect()]
    assert cols == [
        "UUID", "Void/Retire", "Name", "Description", "Parent",
        "Attribute|Code", "Attribute|URL",
        "Tag|Login Location", "Tag|Visit Location",
    ]
    assert [r["UUID"] for r in rows] == ["uuid-hq", "uuid-clinic", "uuid-old"]
    hq, clinic, old = rows
    assert hq["Parent"] is None
    assert hq["Tag|Login Location"] == "TRUE"
    assert hq["Tag|Visit Location"] == "TRUE"
    assert clinic["Parent"] == "HQ"
    assert clinic["Attribute|Code"] == "CL-123"
    # ':' inside the value survives (reference bug not reproduced)
    assert clinic["Attribute|URL"] == "http://x:8080"
    assert clinic["Tag|Login Location"] is None
    assert old["Void/Retire"] == 1


def test_hierarchy_export(spark):
    ot = spark.createDataFrame(
        [
            (1, "Drug Order", "An order for a medication", "uuid-1", None, 0,
             "org.openmrs.DrugOrder"),
            (2, "Test Order", "An order for a test", "uuid-2", None, 0,
             "org.openmrs.TestOrder"),
            (3, "Lab Order", "Lab test order", "uuid-3", 2, 0,
             "org.openmrs.TestOrder"),
        ],
        ["order_type_id", "name", "description", "uuid", "parent", "retired",
         "java_class_name"],
    )
    out = hierarchy_export(ot, id_col="order_type_id", parent_fk="parent")
    rows = out.collect()
    # column order + spellings match sql/ordertypes.sql ('Uuid', Parent last)
    assert out.columns == ["Uuid", "Void/Retire", "Name", "Description",
                           "Parent"]
    assert [r["Name"] for r in rows] == ["Drug Order", "Test Order", "Lab Order"]
    assert rows[2]["Parent"] == "uuid-2"
    assert rows[0]["Parent"] is None

    from iniz_exporters_spark.exporters.hierarchy import ordertypes_sql_export

    full = ordertypes_sql_export(ot)
    assert full.columns == ["Uuid", "Void/Retire", "Name", "Description",
                            "Java class name", "Parent"]
    assert [r["Java class name"] for r in full.collect()] == [
        "org.openmrs.DrugOrder", "org.openmrs.TestOrder",
        "org.openmrs.TestOrder",
    ]


def test_concept_set_rows():
    concepts = [
        {"uuid": "set-uuid", "Fully specified name:en": "My Set",
         "Void/Retire": None},
        {"uuid": "m1", "Fully specified name:en": "Alpha", "Void/Retire": None},
        {"uuid": "m2", "Fully specified name:en": "Beta", "Void/Retire": None},
    ]
    fieldnames, rows = concept_set_rows(concepts)
    assert fieldnames == [
        "Concept", "Member", "#Fully specified name:en",
        "Member Type", "Sort Weight", "Void/Retire",
    ]
    assert rows == [
        {"Concept": "set-uuid", "Member": "m1",
         "#Fully specified name:en": "Alpha", "Member Type": "CONCEPT-SET",
         "Sort Weight": 1, "Void/Retire": None},
        {"Concept": "set-uuid", "Member": "m2",
         "#Fully specified name:en": "Beta", "Member Type": "CONCEPT-SET",
         "Sort Weight": 2, "Void/Retire": None},
    ]


def test_concepts_export_q_fixture_contract(spark):
    """The registry's end-to-end pipeline query over the committed fixture:
    pins the nested-set topo levels, the ordering contract (referents
    before referrers in the export order implies level-consistency), and
    spot values through every pipeline stage — so the driver row and this
    local contract fail together, not silently apart."""
    from iniz_exporters_spark.queries import REGISTRY

    rows = {
        r["Fully specified name:en"]: r
        for r in REGISTRY["concepts_export_q"].fn(spark, "unused").collect()
    }
    assert set(rows) == {
        "Weight", "Height", "Vitals", "Labs", "Yes", "No", "Colour",
        "Hemoglobin",
    }  # retired dropped, Orphan excluded
    levels = {k: r["topo_level"] for k, r in rows.items()}
    assert levels == {
        "Weight": 0, "Height": 0, "Yes": 0, "No": 0, "Hemoglobin": 0,
        "Colour": 1, "Vitals": 1, "Labs": 2,
    }
    w = rows["Weight"]
    assert w["Description:en"] == "Bodyweight"  # newline stripped
    assert w["Mappings|SAME-AS|PIH|Name"] == "WEIGHT"
    assert w["Mappings|SAME-AS|PIH|Number"] == "123"
    assert w["Absolute low"] == 0.0  # numeric zero survives pruning
    assert rows["Height"]["Mappings|SAME-AS|CIEL"] == "1342;5090"
    assert rows["Vitals"]["Members"] == "Height;Weight"  # sort_weight order
    assert rows["Labs"]["Members"] == "Hemoglobin;Vitals"
    assert rows["Colour"]["Answers"] == "Yes;No"
    assert rows["Hemoglobin"]["Mappings|SAME-AS|CIEL"] == "21"  # retired term out


def test_longest_chain_level_iterative_and_cycle_safe():
    """ADVICE r5 #3: the topo-level replay must not RecursionError on deep
    chains and must raise a clear error on a cyclic fixture edit."""
    import pytest

    from iniz_exporters_spark.queries import _longest_chain_level

    # 10k-deep chain: would blow the default recursion limit if recursive
    n = 10_000
    edges = {str(i): [str(i + 1)] for i in range(n)}
    present = {str(i) for i in range(n + 1)}
    levels: dict = {}
    assert _longest_chain_level("0", edges, present, levels) == n
    assert levels[str(n)] == 0

    # cycle a -> b -> a: clear error, not RecursionError
    with pytest.raises(ValueError, match="cycle detected"):
        _longest_chain_level(
            "a", {"a": ["b"], "b": ["a"]}, {"a", "b"}, {}
        )

    # self-loop is skipped (matches the reference's self-reference rule)
    assert _longest_chain_level("x", {"x": ["x"]}, {"x"}, {}) == 0
