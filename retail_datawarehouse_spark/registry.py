"""Central query registry — the bridge to the driver contract.

Every operator from SURVEY.md §2 (plus the LLM-pipeline extensions)
registers here as a named (builder, oracle_sql) pair:

- ``builder(spark, sf_dir) -> DataFrame`` — the Spark-side plan.
- ``oracle`` — equivalent ANSI SQL DuckDB runs over the same parquet
  (views: region nation customer supplier part orders lineitem events
  documents embeddings). ``None`` marks a genuinely non-SQL-expressible
  operator (driver then records a weaker rows-only check).

Column names must match between the two sides — the driver sorts
columns by name before hashing values — so every computed column is
aliased identically in both (``__spark_entry__.py`` contract).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class CatalogQuery:
    name: str
    builder: Builder
    oracle: str | None
    doc: str


REGISTRY: dict[str, CatalogQuery] = {}


def register(name: str, oracle: str | None = None) -> Callable[[Builder], Builder]:
    """Decorator: add a builder (and its DuckDB oracle SQL) to the catalog."""

    def wrap(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate catalog query {name!r}")
        REGISTRY[name] = CatalogQuery(name, fn, oracle, fn.__doc__ or "")
        return fn

    return wrap


def load_all_modules() -> None:
    """Import every module that registers catalog queries."""
    # Imports are side-effectful (decorators populate REGISTRY).
    from retail_datawarehouse_spark import etl  # noqa: F401
    from retail_datawarehouse_spark import dims  # noqa: F401
    from retail_datawarehouse_spark import facts  # noqa: F401
    from retail_datawarehouse_spark import operators  # noqa: F401
    from retail_datawarehouse_spark import queries  # noqa: F401
    from retail_datawarehouse_spark import streaming  # noqa: F401


def catalog() -> dict[str, CatalogQuery]:
    load_all_modules()
    return dict(REGISTRY)
