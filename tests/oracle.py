"""Local replica of the driver's DuckDB-oracle correctness check.

For each registered catalog query this compares, at a given sf dir:
row count, column names/kinds, and order-insensitive values — with the
bar set at EXACT equality (our decimal-arithmetic convention makes even
double aggregates bit-identical across engines), falling back to a tiny
float tolerance only to report how far off a mismatch is.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

VIEW_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in VIEW_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    pdf = pdf[sorted(pdf.columns)].copy()

    def cell(v):
        if v is None:
            return "<null>"
        if isinstance(v, float):
            if math.isnan(v):
                return "<null>"
            return repr(v)  # shortest round-trip repr: bit-exact compare
        if isinstance(v, (np.integer,)):
            return str(int(v))
        if isinstance(v, (np.floating,)):
            f = float(v)
            return "<null>" if math.isnan(f) else repr(f)
        if isinstance(v, (pd.Timestamp,)):
            return v.isoformat()
        if isinstance(v, (list, np.ndarray)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        if v is pd.NaT:
            return "<null>"
        return str(v)

    out = pdf.map(cell)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
        drop=True
    )


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    mismatches: list[str] = field(default_factory=list)
    # Spark-side wall seconds (plan execution + Arrow collect), excluding
    # the DuckDB oracle — feeds the wall-budget canary in
    # test_oracle_parity so runtime creep in any entry is a named failure.
    spark_secs: float = 0.0

    def message(self) -> str:
        return f"{self.name}: rows {self.spark_rows}/{self.oracle_rows} " + (
            "OK" if self.ok else "; ".join(self.mismatches[:8])
        )


def compare_to_oracle(
    name: str,
    spark_df: DataFrame,
    con: duckdb.DuckDBPyConnection,
    oracle_sql: str,
) -> CompareResult:
    t0 = time.perf_counter()
    pdf_s = spark_df.toPandas()
    spark_secs = time.perf_counter() - t0
    pdf_d = con.sql(oracle_sql).df()

    res = CompareResult(name, True, len(pdf_s), len(pdf_d), spark_secs=spark_secs)
    if sorted(pdf_s.columns) != sorted(pdf_d.columns):
        res.ok = False
        res.mismatches.append(
            f"columns differ: spark={sorted(pdf_s.columns)} oracle={sorted(pdf_d.columns)}"
        )
        return res
    if len(pdf_s) != len(pdf_d):
        res.ok = False
        res.mismatches.append("row count differs")
        return res

    cs, cd = _canon(pdf_s), _canon(pdf_d)
    neq = (cs != cd).any(axis=1)
    if neq.any():
        res.ok = False
        bad = neq[neq].index[:5]
        for i in bad:
            for col in cs.columns:
                if cs.at[i, col] != cd.at[i, col]:
                    res.mismatches.append(
                        f"row{i} col {col}: spark={cs.at[i, col]!r} oracle={cd.at[i, col]!r}"
                    )
    return res


def run_catalog_compare(
    spark: SparkSession, sf_dir: str, only: list[str] | None = None
) -> list[CompareResult]:
    from retail_datawarehouse_spark.registry import catalog

    con = duck_connection(sf_dir)
    results = []
    for name, q in sorted(catalog().items()):
        if only and name not in only:
            continue
        if q.oracle is None:
            continue
        results.append(compare_to_oracle(name, q.builder(spark, sf_dir), con, q.oracle))
    return results
