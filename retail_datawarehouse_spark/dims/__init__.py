from retail_datawarehouse_spark.dims import date_dim, extracted, scd2  # noqa: F401
