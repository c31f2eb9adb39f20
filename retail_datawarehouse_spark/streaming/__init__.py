from retail_datawarehouse_spark.streaming import monitor  # noqa: F401
from retail_datawarehouse_spark.streaming import pipelines  # noqa: F401
