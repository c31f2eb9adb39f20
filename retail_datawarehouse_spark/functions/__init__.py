from retail_datawarehouse_spark.functions.keys import (
    HOLIDAYS,
    calendar_attrs,
    date_key,
    is_holiday_flag,
    month_key,
    surrogate_key_hash,
    time_bucket_12hr,
    time_bucket_period,
    time_key,
)
from retail_datawarehouse_spark.functions.money import dec, dec_sum

__all__ = [
    "HOLIDAYS",
    "calendar_attrs",
    "date_key",
    "is_holiday_flag",
    "dec",
    "dec_sum",
    "month_key",
    "surrogate_key_hash",
    "time_bucket_12hr",
    "time_bucket_period",
    "time_key",
]
