from iniz_exporters_spark.sources.csv_sink import write_single_csv  # noqa: F401
