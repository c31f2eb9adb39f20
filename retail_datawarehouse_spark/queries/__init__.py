from retail_datawarehouse_spark.queries import advanced, catalog, extensions  # noqa: F401
