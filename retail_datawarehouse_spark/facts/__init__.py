from retail_datawarehouse_spark.facts import sales, snapshot  # noqa: F401
