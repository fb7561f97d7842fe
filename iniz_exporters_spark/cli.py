"""Command-line parity with the reference exporters.

Flag-for-flag mirrors of the three reference CLIs, wired to the Spark
pipeline:

  * ``concepts``    — reference concept_csv_export.py:640-740
  * ``locations``   — reference location_csv_export.py:233-280
  * ``set-creator`` — reference concept_set_csv_creator.py:80-97

Source resolution replaces the reference's ``mysql`` CLI subprocess
(concept_csv_export.py:533-558) with Spark's pluggable readers:

  * ``--tables-dir DIR`` — one ``<table>.parquet`` per OpenMRS table
    (fixtures / lake extracts);
  * ``--jdbc-url URL``   — read straight from MySQL via JDBC;
  * neither               — a MySQL JDBC url is derived from the
    ``database`` positional (localhost:3306), with credentials from the
    openmrs-runtime.properties file exactly like the reference's
    ``set_globals`` grep (concept_csv_export.py:103-121) — parsed in
    Python rather than shelled out.

``--docker/-dc`` are accepted for parity but are no-ops: JDBC connects over
TCP either way. ``--encoding/-E`` maps to the JDBC ``characterEncoding``
option instead of the reference's subprocess-output decode.

Usage:
    python -m iniz_exporters_spark.cli concepts <database> [flags]
    python -m iniz_exporters_spark.cli locations <database> [flags]
    python -m iniz_exporters_spark.cli set-creator <infile> -o <outfile>
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

from pyspark.sql import DataFrame, SparkSession

CONCEPT_TABLES = (
    "concept", "concept_answer", "concept_class", "concept_complex",
    "concept_datatype", "concept_description", "concept_map_type",
    "concept_name", "concept_numeric", "concept_reference_map",
    "concept_reference_source", "concept_reference_term", "concept_set",
)
LOCATION_TABLES = (
    "location", "location_attribute", "location_attribute_type",
    "location_tag", "location_tag_map",
)


def read_runtime_properties(path: str) -> dict[str, str]:
    """connection.username / connection.password from
    openmrs-runtime.properties (reference concept_csv_export.py:103-121)."""
    props: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#") and "=" in line:
                k, _, v = line.partition("=")
                props[k.strip()] = v.strip()
    return props


def load_tables(
    spark: SparkSession,
    names: tuple[str, ...],
    database: str,
    tables_dir: str | None,
    jdbc_url: str | None,
    user: str | None,
    password: str | None,
    props_path: str | None,
    encoding: str | None = None,
) -> dict[str, DataFrame]:
    if tables_dir:
        return {
            n: spark.read.parquet(os.path.join(tables_dir, f"{n}.parquet"))
            for n in names
        }
    if not jdbc_url:
        jdbc_url = f"jdbc:mysql://localhost:3306/{database}"
    if user is None or password is None:
        path = props_path or os.path.expanduser(
            f"~/openmrs/{database}/openmrs-runtime.properties"
        )
        props = read_runtime_properties(path)
        user = user or props.get("connection.username", "root")
        password = password or props.get("connection.password", "")
    opts = {"user": user, "password": password}
    if encoding:
        opts["characterEncoding"] = encoding
    out = {}
    for n in names:
        reader = spark.read.format("jdbc").option("url", jdbc_url).option(
            "dbtable", n
        )
        for k, v in opts.items():
            reader = reader.option(k, v)
        out[n] = reader.load()
    return out


def _add_db_source_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("database",
                   help="The name of the OpenMRS MySQL database from which "
                        "to pull concepts.")
    p.add_argument("-v", "--verbose", action="store_true",
                   help="More verbose output.")
    p.add_argument("-d", "--docker", action="store_true",
                   help="Accepted for reference parity; JDBC connects over "
                        "TCP either way.")
    p.add_argument("-dc", "--docker-container", default="openmrs-sdk-mysql",
                   help="Accepted for reference parity (unused).")
    p.add_argument("-r", "--props-path",
                   help="Path to openmrs-runtime.properties for credentials. "
                        "Defaults to ~/openmrs/<database>/"
                        "openmrs-runtime.properties.")
    p.add_argument("-u", "--user", help="Database username.")
    p.add_argument("-p", "--password", help="Database password.")
    # engine-specific source overrides
    p.add_argument("--tables-dir",
                   help="Read base tables from <dir>/<table>.parquet instead "
                        "of JDBC.")
    p.add_argument("--jdbc-url",
                   help="Explicit JDBC url (default derives "
                        "jdbc:mysql://localhost:3306/<database>).")


def concepts_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="concepts",
        description="Export OpenMRS concepts to an Initializer CSV "
                    "(reference concept_csv_export.py CLI, Spark engine).",
    )
    _add_db_source_flags(p)
    p.add_argument("-o", "--outfile",
                   help="The path of the CSV file to write. With -c, the set "
                        "name is appended to the default file name. "
                        "Default: ~/Downloads/concepts[-<set>].csv")
    p.add_argument("-c", "--set-name", nargs="+",
                   help="Fully specified English name of a concept set for "
                        "which to pull concepts.")
    p.add_argument("--version", default="2.3",
                   help="The OpenMRS database/platform version.")
    p.add_argument("-l", "--locales", default="en",
                   help="Comma-separated locales; the first is the default "
                        "locale.")
    p.add_argument("--name-types", default="full,short",
                   help="Comma-separated name types to extract.")
    p.add_argument("-m", "--mapping-types",
                   default="SAME-AS,NARROWER-THAN,BROADER-THAN",
                   help="Comma-separated mapping types.")
    p.add_argument("-s", "--concept-sources",
                   help="Comma-separated concept sources for mapping columns "
                        "(default: the reference's 15-source list).")
    p.add_argument("-e", "--exclude-files", nargs="+",
                   help="CSV files of concepts to exclude from this export.")
    p.add_argument("-E", "--encoding",
                   help="JDBC characterEncoding option (replaces the "
                        "reference's subprocess decode).")
    p.add_argument("-k", "--concept-key-mapping",
                   help="Concepts refer to each other by a mapping of this "
                        "source instead of fully specified name, e.g. "
                        "-k CIEL.")
    return p


def concepts_main(argv: list[str] | None = None) -> str:
    from iniz_exporters_spark.exporters.concepts import (
        DEFAULT_CONCEPT_SOURCES,
        ConceptExportConfig,
        export_concepts,
    )
    from iniz_exporters_spark.session import get_spark

    a = concepts_parser().parse_args(argv)
    spark = get_spark("concepts-export")
    locales = a.locales.split(",")
    cfg = ConceptExportConfig(
        locales=locales,
        default_locale=locales[0],
        name_types=a.name_types.split(","),
        mapping_types=a.mapping_types.split(","),
        concept_sources=(
            a.concept_sources.split(",") if a.concept_sources
            else list(DEFAULT_CONCEPT_SOURCES)
        ),
        version=a.version,
        set_name=" ".join(a.set_name) if a.set_name else None,
        concept_key_mapping=a.concept_key_mapping,
    )
    if a.exclude_files:
        # reference get_excludes_from_files (concept_csv_export.py:441-449)
        excludes: set[str] = set()
        for path in a.exclude_files:
            with open(path) as f:
                for line in csv.DictReader(f):
                    excludes.add(line[cfg.key])
        cfg.exclude_keys = sorted(excludes)

    tables = load_tables(
        spark, CONCEPT_TABLES, a.database, a.tables_dir, a.jdbc_url,
        a.user, a.password, a.props_path, a.encoding,
    )
    outfile = a.outfile or (
        os.path.expanduser("~/Downloads/concepts")
        + ("-" + cfg.set_name.replace(" ", "-") if cfg.set_name else "")
        + ".csv"
    )
    export_concepts(spark, tables, cfg, outfile=outfile)
    if a.verbose:
        print(f"Wrote {outfile}")
    return outfile


def locations_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="locations",
        description="Export OpenMRS locations to an Initializer CSV "
                    "(reference location_csv_export.py CLI, Spark engine).",
    )
    _add_db_source_flags(p)
    p.add_argument("-o", "--outfile",
                   default=os.path.expanduser("~/Downloads/locations.csv"),
                   help="The path of the CSV file to write.")
    p.add_argument("--version", default="2.3",
                   help="The OpenMRS database/platform version.")
    return p


def locations_main(argv: list[str] | None = None) -> str:
    from iniz_exporters_spark.exporters.locations import (
        build_locations_export,
    )
    from iniz_exporters_spark.session import get_spark
    from iniz_exporters_spark.sources.csv_sink import write_single_csv

    a = locations_parser().parse_args(argv)
    spark = get_spark("locations-export")
    tables = load_tables(
        spark, LOCATION_TABLES, a.database, a.tables_dir, a.jdbc_url,
        a.user, a.password, a.props_path,
    )
    cols, df = build_locations_export(tables)
    write_single_csv(df, a.outfile, columns=cols)
    if a.verbose:
        print(f"Wrote {a.outfile}")
    return a.outfile


def set_creator_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="set-creator",
        description="Create a concept-set membership CSV from a concepts "
                    "CSV (reference concept_set_csv_creator.py CLI).",
    )
    p.add_argument("infile", help="The path of input concepts CSV file")
    p.add_argument("-o", "--outfile",
                   help="The path of the CSV file to write.")
    return p


def set_creator_main(argv: list[str] | None = None) -> str:
    from iniz_exporters_spark.exporters.set_creator import concept_set_csv

    a = set_creator_parser().parse_args(argv)
    # reference concept_set_csv_creator.py:38 defaults to "output.csv".
    outfile = a.outfile or "output.csv"
    concept_set_csv(a.infile, outfile)
    return outfile


def main(argv: list[str] | None = None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return
    cmd, rest = argv[0], argv[1:]
    if cmd == "concepts":
        concepts_main(rest)
    elif cmd == "locations":
        locations_main(rest)
    elif cmd == "set-creator":
        set_creator_main(rest)
    else:
        raise SystemExit(
            f"unknown command {cmd!r}; expected concepts | locations | "
            "set-creator"
        )


if __name__ == "__main__":
    main()
