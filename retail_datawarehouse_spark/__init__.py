"""PySpark-native retail data-warehouse engine.

A from-scratch re-expression of the capabilities of the reference repo
``RafaelNTeixeira/Retail-DataWarehouse`` (see SURVEY.md) in idiomatic
Spark: DataFrame/SQL plans optimized by Catalyst, Parquet-backed star
schema, window-based snapshot builds, and LLM-data-pipeline extensions
(dedup, similarity search, text analysis, streaming) designed for
100 TB scale.

Layout
------
- ``session``    SparkSession factory tuned for the target cluster
- ``sources``    readers/writers with explicit schemas (no inference)
- ``functions``  reusable column expressions (smart keys, buckets, text)
- ``etl``        the cleaning pipeline (reference scripts/clean_data.py)
- ``dims``       dimension builders (generated + extracted + SCD2)
- ``facts``      transaction fact + monthly snapshot fact
- ``queries``    the analytical catalog (reference README §5)
- ``operators``  dedup / similarity / text-analysis / multimodal
- ``streaming``  Structured Streaming pipelines over the events table
- ``plans``      physical-plan inspection helpers (broadcast/pushdown)
"""

__version__ = "0.1.0"
