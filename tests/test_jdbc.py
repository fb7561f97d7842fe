"""JDBC contract tests against embedded Derby (ships in Spark's classpath).

The reference's primary entry point is a live MySQL database
(concept_csv_export.py:533-558); this engine replaces the mysql-CLI
subprocess with Spark's JDBC reader (catalog.py / cli.load_tables). No MySQL
exists in this sandbox, so these tests exercise the ACTUAL
``spark.read.format("jdbc")`` branch against Derby's in-memory engine:
same reader code path, same options plumbing, same dialect-driven schema
inference — only the url differs from production.

Derby folds unquoted identifiers to UPPERCASE; Spark resolves column names
case-insensitively by default, so the exporters' lowercase references work
unchanged — which is itself part of the contract under test.
"""

import csv

import pytest

DERBY_URL = "jdbc:derby:memory:openmrs_jdbc_test"


@pytest.fixture(scope="module")
def derby_db(spark):
    """Create + populate an in-memory Derby db inside Spark's JVM."""
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(DERBY_URL + ";create=true")
    st = conn.createStatement()
    ddl_and_rows = [
        (
            "CREATE TABLE location (location_id INT, uuid VARCHAR(64), "
            "retired INT, name VARCHAR(128), description VARCHAR(255), "
            "parent_location INT)",
            [
                "INSERT INTO location VALUES "
                "(1, 'uuid-hq', 0, 'HQ', 'Main site', NULL)",
                "INSERT INTO location VALUES "
                "(2, 'uuid-clinic', 0, 'Clinic', NULL, 1)",
                "INSERT INTO location VALUES "
                "(3, 'uuid-old', 1, 'Old site', NULL, 1)",
            ],
        ),
        (
            "CREATE TABLE location_tag (location_tag_id INT, name VARCHAR(64))",
            [
                "INSERT INTO location_tag VALUES (1, 'Login Location')",
                "INSERT INTO location_tag VALUES (2, 'Visit Location')",
            ],
        ),
        (
            "CREATE TABLE location_tag_map (location_id INT, "
            "location_tag_id INT)",
            [
                "INSERT INTO location_tag_map VALUES (1, 1)",
                "INSERT INTO location_tag_map VALUES (1, 2)",
                "INSERT INTO location_tag_map VALUES (2, 2)",
            ],
        ),
        (
            "CREATE TABLE location_attribute (location_id INT, "
            "attribute_type_id INT, value_reference VARCHAR(255))",
            [
                "INSERT INTO location_attribute VALUES (2, 1, 'CL-123')",
                "INSERT INTO location_attribute VALUES (2, 2, 'http://x:8080')",
            ],
        ),
        (
            "CREATE TABLE location_attribute_type "
            "(location_attribute_type_id INT, name VARCHAR(64))",
            [
                "INSERT INTO location_attribute_type VALUES (1, 'Code')",
                "INSERT INTO location_attribute_type VALUES (2, 'URL')",
            ],
        ),
    ]
    for ddl, inserts in ddl_and_rows:
        st.executeUpdate(ddl)
        for ins in inserts:
            st.executeUpdate(ins)
    st.close()
    conn.close()
    yield DERBY_URL


def test_jdbc_reader_branch(spark, derby_db):
    """cli.load_tables with --jdbc-url goes through
    spark.read.format('jdbc') and yields case-insensitively usable tables."""
    from iniz_exporters_spark.cli import LOCATION_TABLES, load_tables

    tables = load_tables(
        spark, LOCATION_TABLES, "openmrs", tables_dir=None,
        jdbc_url=derby_db, user="app", password="app", props_path=None,
    )
    assert set(tables) == set(LOCATION_TABLES)
    import pyspark.sql.functions as F

    loc = tables["location"]
    # Derby reports uppercase column names; Spark must still resolve the
    # exporters' lowercase references (default case-insensitive analysis)
    assert loc.filter(F.col("location_id") == 2).count() == 1
    assert loc.count() == 3


def test_locations_export_end_to_end_over_jdbc(spark, derby_db, tmp_path):
    """The full locations CLI against a real JDBC source: same output as the
    in-memory-fixture export in test_exporters.py."""
    from iniz_exporters_spark.cli import locations_main

    out = str(tmp_path / "locations.csv")
    locations_main(
        ["openmrs", "--jdbc-url", derby_db, "-u", "app", "-p", "app",
         "-o", out]
    )
    with open(out) as f:
        rows = list(csv.DictReader(f))
    assert [r["UUID"] for r in rows] == ["uuid-hq", "uuid-clinic", "uuid-old"]
    hq, clinic, old = rows
    assert hq["Tag|Login Location"] == "TRUE"
    assert clinic["Parent"] == "HQ"
    assert clinic["Attribute|Code"] == "CL-123"
    assert clinic["Attribute|URL"] == "http://x:8080"
    assert old["Void/Retire"] == "1"


def test_catalog_jdbc_branch(spark, derby_db):
    """Catalog(jdbc_url=...) reads through the JDBC reader with options."""
    from iniz_exporters_spark.catalog import Catalog

    cat = Catalog(
        spark, jdbc_url=derby_db, jdbc_props={"user": "app", "password": "app"}
    )
    loc = cat.table("location")
    got = {r["name"] for r in loc.select("name").collect()}
    assert got == {"HQ", "Clinic", "Old site"}


def test_jdbc_filter_and_column_pushdown(spark, derby_db):
    """At 100 TB the JDBC source's pushdown decides whether the database
    ships rows or whole tables: an equality filter must reach the scan as a
    PushedFilters entry (Derby evaluates it server-side) and the projection
    must prune the scan to the referenced columns only."""
    import pyspark.sql.functions as F

    from iniz_exporters_spark.catalog import Catalog

    cat = Catalog(
        spark, jdbc_url=derby_db, jdbc_props={"user": "app", "password": "app"}
    )
    q = (
        cat.table("location")
        .filter(F.col("retired") == 0)
        .select("name")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan = next(
        ln for ln in plan.splitlines() if "JDBCRelation" in ln
    )
    assert "PushedFilters" in scan, plan
    assert "EqualTo(RETIRED,0)" in scan.replace(" ", ""), scan
    assert "IsNotNull(RETIRED)" in scan.replace(" ", ""), scan
    # column pruning: the scan reads name + the filter column, nothing else
    assert "NAME" in scan and "DESCRIPTION" not in scan, scan
    assert sorted(r["name"] for r in q.collect()) == ["Clinic", "HQ"]
