from retail_datawarehouse_spark.queries import advanced, catalog, extensions, sinks  # noqa: F401
