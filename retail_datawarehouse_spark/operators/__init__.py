from retail_datawarehouse_spark.operators import (  # noqa: F401
    dedup,
    multimodal,
    sampling,
    sketches,
    similarity,
    textual,
)
