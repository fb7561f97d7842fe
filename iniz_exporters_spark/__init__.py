"""iniz_exporters_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the query and data-processing
capabilities of PIH/iniz-exporters (reference: /root/reference, read-only),
plus the relational / dedup / similarity / text / streaming operator surface
a large-scale (100 TB design point) training-data pipeline needs.

Design stance (see SURVEY.md §7):
  * DataFrame/SQL first — the logical plan is the IR, Catalyst optimizes it.
  * Zero row-at-a-time Python UDFs in the parity scope; Arrow/pandas only
    where built-ins genuinely cannot express the semantics (multimodal).
  * Driver-side algorithms only for metadata-scale graph passes; distributed
    fixpoint variants provided for the 100 TB path.
"""

__version__ = "0.1.0"

from iniz_exporters_spark.session import get_spark  # noqa: F401
from iniz_exporters_spark.catalog import Catalog  # noqa: F401
