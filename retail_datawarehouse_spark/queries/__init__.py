from retail_datawarehouse_spark.queries import catalog, extensions  # noqa: F401
