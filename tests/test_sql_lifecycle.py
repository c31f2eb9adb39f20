"""Both engine entry points must agree (SURVEY.md §3.2): the DataFrame
builder lifecycle and the ``spark.sql`` ANTLR-parser lifecycle converge
in the Catalyst analyzer — same rows, same schema, for every reference
query."""

from __future__ import annotations

import pytest

from retail_datawarehouse_spark.queries.sql_texts import SPARK_SQL_TEXTS
from retail_datawarehouse_spark.registry import catalog
from retail_datawarehouse_spark.sources.readers import register_views


@pytest.mark.parametrize("name", sorted(SPARK_SQL_TEXTS))
def test_sql_text_matches_builder(name, spark, sf_dir):
    register_views(spark, sf_dir)
    via_sql = spark.sql(SPARK_SQL_TEXTS[name])
    via_builder = catalog()[name].builder(spark, sf_dir)
    assert [f.name for f in via_sql.schema.fields] == [
        f.name for f in via_builder.schema.fields
    ]
    a = sorted(map(tuple, (tuple(r) for r in via_sql.collect())))
    b = sorted(map(tuple, (tuple(r) for r in via_builder.collect())))
    assert a == b
