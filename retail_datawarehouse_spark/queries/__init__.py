from retail_datawarehouse_spark.queries import catalog  # noqa: F401
