"""xarray_sql_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of alxmrs/xarray-sql.

Layers:
- ``dataset``   — a self-contained numpy-backed N-D dataset model (xarray-like:
  dims / coords / data_vars / attrs), since the execution environment has no
  xarray; the reference's semantics are re-expressed against this shim.
- ``chunks``    — chunk-grid arithmetic (reference df.py:29-117).
- ``pivot``     — N-D block -> Arrow RecordBatch pivot with strided coordinate
  synthesis and NaN->null mapping (reference df.py:215-368).
- ``sources``   — PySpark Python Data Source: lazy, partition-pruned,
  column-projected scan over a Dataset (reference reader.py + src/lib.rs).
- ``session``   — XarraySession registration/catalog layer (reference sql.py).
- ``to_dataset``— reverse pivot: SQL result -> Dataset, eager + lazy
  (reference ds.py).
- ``functions`` — cftime calendar bridge + scalar UDFs (reference cftime.py).
- ``operators`` — beyond-reference large-scale pipeline operators: dedup,
  similarity search, text analysis, multimodal columns.
- ``queries``   — the oracle-checked query registry exported via
  ``__spark_entry__.py``.
"""

from xarray_sql_spark.version import __version__

# Reference-parity public API (reference xarray_sql/__init__.py:1-12): a
# reference user's imports map 1:1 —
#   XarrayContext        -> XarraySession (alias below)
#   read_xarray          -> arrow_io.read_xarray (eager) / to_arrow_reader
#                           (the RecordBatchReader flavor)
#   read_xarray_table    -> compat.read_xarray_table (lazy registered scan)
#   from_map (deprecated)-> compat.from_map (+ from_map_spark, distributed)
#   cftime               -> functions.cftime
# Imports are lazy (module __getattr__) so `import xarray_sql_spark` stays
# cheap for tooling that only wants __version__ — pyspark/pyarrow load on
# first attribute access.

_EXPORTS = {
    "XarraySession": ("xarray_sql_spark.xr_session", "XarraySession"),
    "XarrayContext": ("xarray_sql_spark.xr_session", "XarraySession"),
    "Dataset": ("xarray_sql_spark.dataset", "Dataset"),
    "Variable": ("xarray_sql_spark.dataset", "Variable"),
    "read_xarray": ("xarray_sql_spark.arrow_io", "read_xarray"),
    "to_arrow_reader": ("xarray_sql_spark.arrow_io", "to_arrow_reader"),
    "read_xarray_table": ("xarray_sql_spark.compat", "read_xarray_table"),
    "from_map": ("xarray_sql_spark.compat", "from_map"),
    "from_map_batched": ("xarray_sql_spark.compat", "from_map_batched"),
    "from_map_spark": ("xarray_sql_spark.compat", "from_map_spark"),
    "cftime": ("xarray_sql_spark.functions.cftime", None),
    # beyond-reference: Structured Streaming over a growing store
    "read_grid_stream": ("xarray_sql_spark.sources.grid_source", "read_grid_stream"),
    "open_zarr": ("xarray_sql_spark.zarr_store", "open_zarr"),
    "write_zarr": ("xarray_sql_spark.zarr_store", "write_zarr"),
    "append_zarr": ("xarray_sql_spark.zarr_store", "append_zarr"),
}


def __getattr__(name: str):
    try:
        mod_name, attr = _EXPORTS[name]
    except KeyError:
        raise AttributeError(f"module 'xarray_sql_spark' has no attribute {name!r}")
    import importlib

    module = importlib.import_module(mod_name)
    value = module if attr is None else getattr(module, attr)
    globals()[name] = value  # cache for subsequent lookups
    return value


__all__ = ["__version__", *_EXPORTS]
