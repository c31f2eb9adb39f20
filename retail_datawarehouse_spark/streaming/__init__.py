from retail_datawarehouse_spark.streaming import pipelines  # noqa: F401
