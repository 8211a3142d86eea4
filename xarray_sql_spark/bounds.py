"""Per-partition bounds metadata and pruning predicates.

Each block carries per-dim (min, max) computed from the 1-D coordinate
arrays alone — no data-variable reads (reference df.py:414-508,
``partition_metadata``). STRING dims prune too — beyond the reference,
which skips them (df.py:447-450): Spark's default UTF8_BINARY collation,
Python str and numpy U all compare by code point, so block min/max
bounds are sound for string predicates. Object dims are skipped
conservatively; non-monotonic axes use true min/max (df.py:455-460). Bounds for unchunked dims are computed once and
shared across every partition ("static ranges", reference reader.py:306-335)
— at ERA5 scale (hundreds of thousands of partitions) this keeps
registration O(#chunked-dim blocks).

Pruning evaluates Spark Filter objects against the bounds with the
reference's "Inexact" contract (src/lib.rs:548-565): a partition is dropped
only when the filter provably cannot match; all filters are still returned
to Catalyst for exact row-level re-application, so conservative keeps are
always safe. NOT / unknown filters never prune (src/lib.rs:206-448).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Mapping

import numpy as np

from pyspark.sql.datasource import (
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
)


def dim_bounds(coords: Mapping[str, np.ndarray], block: Mapping[str, slice]) -> dict[str, tuple]:
    """(min, max) per prunable dim for one block."""
    out: dict[str, tuple] = {}
    for d, sl in block.items():
        c = coords.get(d)
        if c is None or c.dtype.kind in ("S", "O"):
            continue  # byte/object dims: not prunable (U strings are)
        seg = c[sl]
        if len(seg) == 0:
            continue
        if seg.dtype.kind == "U":  # no min/max ufunc for unicode arrays
            vals = seg.tolist()
            out[d] = (min(vals), max(vals))
        else:
            if seg.dtype.kind in "Mm" and np.isnat(seg).any():
                # NaT would canonicalize to INT64_MIN and silently prune
                # blocks holding real timestamps; float NaN is safe (all
                # comparisons False -> conservative keep) but the int64
                # datetime conversion loses that, so skip the dim instead.
                continue
            out[d] = (_canon(seg.min()), _canon(seg.max()))
    return out


def _canon(v: Any):
    """Canonicalize a bound or filter value into a comparable scalar."""
    if isinstance(v, np.datetime64):
        return v.astype("datetime64[us]").astype("int64")
    if isinstance(v, _dt.datetime):
        return np.datetime64(v.replace(tzinfo=None), "us").astype("int64")
    if isinstance(v, _dt.date):
        return np.datetime64(v, "us").astype("int64")
    if isinstance(v, np.generic):
        return v.item()
    return v


def _comparable(lo, hi, value):
    v = _canon(value)
    try:
        lo < v  # noqa: B015 — probe comparability
    except TypeError:
        return None
    return v


def block_may_match(
    bounds: Mapping[str, tuple], filters: list[Filter], prune_strings: bool = True
) -> bool:
    """AND of filters: False only when some filter provably excludes the
    block. Unknown filter types / columns / value types keep the block.

    ``prune_strings=False`` disables string-dim pruning: code-point
    min/max bounds are sound only under a binary collation (Spark's
    default UTF8_BINARY); a session whose default collation is
    collation-aware (e.g. UTF8_LCASE) compares differently, so the
    registration layer passes False and string predicates fall back to
    conservative keeps (row-level filters still apply them exactly)."""
    for f in filters:
        attr = getattr(f, "attribute", None)
        col = attr[0] if attr else None
        if col not in bounds:
            continue
        lo, hi = bounds[col]
        if not prune_strings and isinstance(lo, str):
            continue
        if isinstance(f, EqualTo):
            v = _comparable(lo, hi, f.value)
            if v is not None and (v < lo or v > hi):
                return False
        elif isinstance(f, GreaterThan):
            v = _comparable(lo, hi, f.value)
            if v is not None and hi <= v:
                return False
        elif isinstance(f, GreaterThanOrEqual):
            v = _comparable(lo, hi, f.value)
            if v is not None and hi < v:
                return False
        elif isinstance(f, LessThan):
            v = _comparable(lo, hi, f.value)
            if v is not None and lo >= v:
                return False
        elif isinstance(f, LessThanOrEqual):
            v = _comparable(lo, hi, f.value)
            if v is not None and lo > v:
                return False
        elif isinstance(f, In):
            # In.value is the tuple of list values.
            vs = [_comparable(lo, hi, x) for x in f.value]
            if vs and all(v is not None for v in vs) and not any(lo <= v <= hi for v in vs):
                return False
        elif isinstance(f, IsNotNull):
            continue  # dim coords are never null
        # Not / IsNull / string ops / unknown: conservative keep.
    return True
