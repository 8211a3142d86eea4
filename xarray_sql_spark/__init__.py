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

__all__ = ["__version__"]
