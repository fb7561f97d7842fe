from iniz_exporters_spark.operators.asof import asof_join  # noqa: F401
from iniz_exporters_spark.operators.pruning import drop_all_empty_columns  # noqa: F401
from iniz_exporters_spark.operators.pivots import spread_tags, spread_attributes  # noqa: F401
