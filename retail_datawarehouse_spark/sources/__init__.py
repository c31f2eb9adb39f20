from retail_datawarehouse_spark.sources.readers import (
    TABLE_NAMES,
    TABLE_SCHEMAS,
    load_table,
    load_tables,
    read_retail_csv,
    register_views,
)
from retail_datawarehouse_spark.sources.writers import (
    write_csv,
    write_parquet_table,
)

__all__ = [
    "TABLE_NAMES",
    "TABLE_SCHEMAS",
    "load_table",
    "load_tables",
    "read_retail_csv",
    "register_views",
    "write_csv",
    "write_parquet_table",
]
