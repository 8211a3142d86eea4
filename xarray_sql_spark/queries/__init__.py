"""Oracle-checked query registry.

Every implemented operator from SURVEY.md §2 (and the beyond-reference
pipeline operators) is exposed here as a named query: a PySpark builder
``(spark, sf_dir) -> DataFrame`` plus, where ANSI-SQL-expressible, an
equivalent DuckDB oracle SQL string run by the driver on the same parquet.

Import side effects populate the registry.
"""

from xarray_sql_spark.queries.registry import REGISTRY, QuerySpec, query

# Populate the registry.
from xarray_sql_spark.queries import relational  # noqa: F401,E402
from xarray_sql_spark.queries import pipeline_ops  # noqa: F401,E402
from xarray_sql_spark.queries import dedup_lsh  # noqa: F401,E402
from xarray_sql_spark.operators import multimodal  # noqa: F401,E402
from xarray_sql_spark.queries import grid_queries  # noqa: F401,E402
from xarray_sql_spark.operators import skew  # noqa: F401,E402
from xarray_sql_spark.operators import components  # noqa: F401,E402

__all__ = ["REGISTRY", "QuerySpec", "query"]
