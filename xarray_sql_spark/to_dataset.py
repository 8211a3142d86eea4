"""Reverse pivot: SQL result rows -> dense N-D Dataset (reference ds.py).

``XarraySession.sql`` returns an :class:`XarrayDataFrame` — a thin wrapper
forwarding everything to the inner pyspark DataFrame (reference
ds.py:920-923) and adding ``to_dataset``:

- Eager path (A10): one Arrow collection; per-dim coordinates are the
  first-appearance-ordered unique values of the dim columns (preserving an
  ORDER BY's direction into the output axis order — reference ds.py:394-413);
  every data column is scattered into a dense array by computed flat indices
  (the searchsorted-scatter of reference ds.py:150-207). Exactly one source
  scan regardless of query shape (tests/test_ds.py:142-177).
- dims inference: defaults from registered datasets whose dims are a subset
  of the result columns; ambiguity is an error (reference ds.py:877-914).
- sparsity: ``"result"`` keeps only returned coordinate values;
  ``"template"`` reindexes onto the template's full grid with ``fill_value``
  (NaN default, int -> float upcast unless a typed sentinel is given —
  reference ds.py:43-50, 676-684).
- template metadata recovery: variable attrs/encoding (minus dtype-bound
  encoding keys), non-dim coords whose dims are all present, dataset attrs
  (reference ds.py:72-147). Aggregation aliases inherit nothing.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from xarray_sql_spark.dataset import Dataset, Variable

_DTYPE_BOUND_ENCODING = ("dtype", "_FillValue", "missing_value")


class XarrayDataFrame:
    """pyspark DataFrame + ``to_dataset``."""

    def __init__(self, df: DataFrame, registered: Mapping[str, Dataset] | None = None):
        self._df = df
        self._registered = dict(registered or {})

    def __getattr__(self, item):
        return getattr(self._df, item)

    @property
    def df(self) -> DataFrame:
        return self._df

    # ------------------------------------------------------------------
    def _infer_dims(self, columns: Sequence[str], dims, template) -> tuple[str, ...]:
        if dims is not None:
            return tuple(dims)
        if template is not None:
            cand = tuple(d for d in template.sizes if d in columns)
            if cand:
                return cand
        candidates: dict[tuple[str, ...], str] = {}
        for name, ds in self._registered.items():
            for var in ds.data_vars.values():
                cand = tuple(d for d in var.dims if d in columns)
                if cand and set(cand) == set(var.dims) & set(columns):
                    candidates.setdefault(cand, name)
        # Keep only maximal candidate dim tuples that are subsets of columns.
        full = [c for c in candidates if set(c) <= set(columns)]
        if not full:
            raise ValueError(
                f"cannot infer dims from columns {list(columns)}; pass dims="
            )
        uniq = {tuple(sorted(c)) for c in full}
        if len(uniq) > 1:
            raise ValueError(
                f"ambiguous dims {sorted(uniq)} inferred from registered datasets; pass dims="
            )
        return max(full, key=len)

    def _resolve_template(self, template) -> Dataset | None:
        if isinstance(template, Dataset):
            return template
        if isinstance(template, str):
            return self._registered[template]
        if template is None and len(self._registered) == 1:
            return next(iter(self._registered.values()))
        return None

    def to_dataset(
        self,
        dims: Sequence[str] | None = None,
        template: "Dataset | str | None" = None,
        sparsity: str = "result",
        fill_value=None,
    ) -> Dataset:
        tmpl = self._resolve_template(template)
        pdf = self._df.toPandas()
        dims = self._infer_dims(list(pdf.columns), dims, tmpl)
        for d in dims:
            if d not in pdf.columns:
                raise ValueError(f"dim column {d!r} not in result columns {list(pdf.columns)}")

        # First-appearance unique coordinate values per dim (preserves the
        # query's ORDER BY direction, reference ds.py:394-413).
        codes: list[np.ndarray] = []
        coords: dict[str, np.ndarray] = {}
        for d in dims:
            code, uniq = pd.factorize(pdf[d], use_na_sentinel=False)
            codes.append(np.asarray(code, dtype=np.int64))
            coords[d] = np.asarray(uniq)

        shape = tuple(len(coords[d]) for d in dims)
        flat = np.zeros(len(pdf), dtype=np.int64)
        stride = 1
        for k in range(len(dims) - 1, -1, -1):
            flat += codes[k] * stride
            stride *= shape[k]

        data_vars: dict[str, Variable] = {}
        value_cols = [c for c in pdf.columns if c not in dims]
        for col in value_cols:
            values = pdf[col].to_numpy()
            dtype = values.dtype
            fv = fill_value
            if dtype.kind in "iu" and fv is None:
                values = values.astype(np.float64)
                dtype = values.dtype
            if fv is None:
                fv = (
                    np.nan
                    if dtype.kind == "f"
                    else (np.datetime64("NaT") if dtype.kind == "M" else None)
                )
            dense = np.full(shape, fv, dtype=dtype if fv is not None else object)
            if fv is None:
                dense = np.full(shape, None, dtype=object)
            dense.ravel()[flat] = values
            data_vars[col] = Variable(dims, dense)

        out = Dataset(data_vars, coords)

        if sparsity == "template":
            if tmpl is None:
                raise ValueError('sparsity="template" requires a template')
            out = _reindex_to_template(out, tmpl, dims, fill_value)
        elif sparsity != "result":
            raise ValueError(f"unknown sparsity {sparsity!r}")

        if tmpl is not None:
            _recover_metadata(out, tmpl)
        return out


def _reindex_to_template(out: Dataset, tmpl: Dataset, dims, fill_value) -> Dataset:
    """Scatter the result grid onto the template's full coordinate grid."""
    idx_per_dim = []
    for d in dims:
        tcoord = tmpl.coords[d]
        lookup = {v: i for i, v in enumerate(tcoord.tolist())}
        idx = np.array([lookup[v] for v in out.coords[d].tolist()], dtype=np.int64)
        idx_per_dim.append(idx)
    shape = tuple(len(tmpl.coords[d]) for d in dims)
    data_vars = {}
    for name, var in out.data_vars.items():
        vals = var.values()
        dtype = vals.dtype
        fv = fill_value
        if fv is None:
            if dtype.kind in "iu":
                vals = vals.astype(np.float64)
                dtype = vals.dtype
            fv = np.nan if dtype.kind == "f" else (np.datetime64("NaT") if dtype.kind == "M" else None)
        dense = (
            np.full(shape, fv, dtype=dtype)
            if fv is not None
            else np.full(shape, None, dtype=object)
        )
        dense[np.ix_(*idx_per_dim)] = vals
        data_vars[name] = Variable(tuple(dims), dense)
    coords = {d: np.asarray(tmpl.coords[d]) for d in dims}
    return Dataset(data_vars, coords, dict(out.attrs))


def _recover_metadata(out: Dataset, tmpl: Dataset) -> None:
    """Re-attach template attrs/encoding/non-dim coords (reference
    ds.py:72-147); aggregation aliases (columns unknown to the template)
    inherit nothing."""
    out.attrs.update(tmpl.attrs)
    for name, var in out.data_vars.items():
        if name in tmpl.data_vars:
            t = tmpl.data_vars[name]
            var.attrs = dict(t.attrs)
            var.encoding = {
                k: v for k, v in t.encoding.items() if k not in _DTYPE_BOUND_ENCODING
            }
    present = set(out.sizes)
    for name, var in tmpl.extra_coords.items():
        if set(var.dims) <= present:
            out.extra_coords[name] = var
