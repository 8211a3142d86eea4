"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark query and its DuckDB oracle SQL on the same parquet tables and
compares row count, column names, and order-insensitive values (columns
sorted by name, rows sorted by all columns, values canonicalized). This is a
faithful stand-in for CORRECTNESS_r{N}.json so regressions surface in pytest
before the driver runs.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from xarray_sql_spark.session import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon_value(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Collapse -0.0 and represent at 12 significant digits so engines'
        # last-ulp differences (already rounded away in the queries) match.
        if v == 0:
            return 0.0
        return float(f"{v:.12g}")
    if isinstance(v, (pd.Timestamp,)):
        return str(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return _canon_value(v.item())
    except ImportError:
        pass
    return v


def _canon_frame(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_value(v) for v in rec) for rec in df[cols].itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Assert the Spark result matches the DuckDB oracle."""
    spark_pdf = spark_df.toPandas()
    con = duckdb_connection(sf_dir)
    try:
        duck_pdf = con.execute(oracle_sql).df()
    finally:
        con.close()

    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"column mismatch: spark={sorted(spark_pdf.columns)} duckdb={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"row count mismatch: spark={len(spark_pdf)} duckdb={len(duck_pdf)}"
    )
    s_rows = _canon_frame(spark_pdf)
    d_rows = _canon_frame(duck_pdf)
    if s_rows != d_rows:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
        ][:5]
        raise AssertionError(f"value mismatch; first diffs: {diffs}")
