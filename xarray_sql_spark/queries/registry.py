"""Back-compat shim: the registry moved to ``xarray_sql_spark.registry``.

It lived here originally, but modules OUTSIDE the ``queries`` package
(operators/multimodal, operators/components, operators/skew) also register
queries, and importing ``xarray_sql_spark.queries.registry`` from one of
them runs ``queries/__init__`` first — whose circular
``from xarray_sql_spark.operators import multimodal`` then returns the
partially-initialized module, so the window reorder ran BEFORE those
modules' registrations when an operators module was the process's first
import (order-dependent first-50 corruption, caught by
tests/test_oracle_queries.py::test_priority_window_is_exactly_50_and_short_keys_unique).
The top-level module has no parent-package side effects, so registration
order is import-order independent. This shim keeps old import paths alive.
"""

from xarray_sql_spark.registry import REGISTRY, QuerySpec, query

__all__ = ["REGISTRY", "QuerySpec", "query"]
