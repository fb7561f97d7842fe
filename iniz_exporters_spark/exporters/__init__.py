from iniz_exporters_spark.exporters.concepts import (  # noqa: F401
    ConceptExportConfig,
    build_concepts_wide,
    export_concepts,
)
from iniz_exporters_spark.exporters.locations import build_locations_export  # noqa: F401
from iniz_exporters_spark.exporters.hierarchy import hierarchy_export  # noqa: F401
from iniz_exporters_spark.exporters.set_creator import concept_set_rows  # noqa: F401
