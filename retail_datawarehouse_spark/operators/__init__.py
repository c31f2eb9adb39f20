from retail_datawarehouse_spark.operators import (  # noqa: F401
    dedup,
    multimodal,
    sketches,
    similarity,
    textual,
)
