from retail_datawarehouse_spark.etl import audit, clean  # noqa: F401
