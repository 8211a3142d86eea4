"""CF-convention calendar bridge (reference cftime.py:1-248).

Climate datasets store time as integer offsets from an epoch under a named
calendar ("days since 2000-01-01", calendar="noleap"). Two tiers, mirroring
the reference's classification (cftime.py:1-19):

- **Gregorian-like** {standard, gregorian, proleptic_gregorian, noleap/
  365_day, all_leap/366_day}: decoded at registration into ``timestamp(us)``
  columns — µs resolution sidesteps the ns-range 1678-2262 overflow
  (reference cftime.py:33-47) — so SQL string literals filter naturally and
  partition pruning works on the decoded bounds.
- **Non-Gregorian** {360_day, julian}: kept as lossless int64 offsets with
  ``xarray:units`` / ``xarray:calendar`` column metadata (reference
  cftime.py:196-209), plus an auto-registered ``cftime('YYYY-MM-DD')``
  scalar UDF that converts date strings into the column's offset encoding
  for ergonomic filtering (reference cftime.py:217-248, sql.py:150-157).

The environment has no ``cftime`` package, so the calendar arithmetic
(fixed-length years, Julian leap rule) is implemented here directly.
Calendar-date identity is preserved: noleap 2000-03-01 decodes to the
timestamp 2000-03-01, exactly as the reference's cftime->Arrow conversion
keeps Y-M-D fields.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pandas as pd

GREGORIAN_LIKE = {
    "standard",
    "gregorian",
    "proleptic_gregorian",
    "noleap",
    "365_day",
    "all_leap",
    "366_day",
}
NON_GREGORIAN = {"360_day", "julian"}

_FIXED_MONTHS = {
    "noleap": (31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31),
    "365_day": (31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31),
    "all_leap": (31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31),
    "366_day": (31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31),
    "360_day": (30,) * 12,
}
_UNIT_US = {
    "microseconds": 1,
    "milliseconds": 1_000,
    "seconds": 1_000_000,
    "minutes": 60_000_000,
    "hours": 3_600_000_000,
    "days": 86_400_000_000,
}

_UNITS_RE = re.compile(
    r"^\s*(\w+)\s+since\s+(\d{1,4})-(\d{1,2})-(\d{1,2})"
    r"(?:[T ](\d{1,2}):(\d{2})(?::(\d{2}(?:\.\d+)?))?)?"
)


@dataclass(frozen=True)
class CfUnits:
    step_us: int
    base: tuple[int, int, int, int, int, int, int]  # y m d hh mm ss us


def parse_units(units: str) -> CfUnits:
    m = _UNITS_RE.match(units)
    if not m:
        raise ValueError(f"unparseable CF units {units!r}")
    step, y, mo, d, hh, mi, ss = m.groups()
    if step not in _UNIT_US:
        raise ValueError(f"unsupported CF unit {step!r}")
    sec = float(ss) if ss else 0.0
    return CfUnits(
        _UNIT_US[step],
        (int(y), int(mo), int(d), int(hh or 0), int(mi or 0), int(sec), int(round((sec % 1) * 1e6))),
    )


def is_gregorian_like(calendar: str) -> bool:
    cal = calendar.lower()
    if cal in GREGORIAN_LIKE:
        return True
    if cal in NON_GREGORIAN:
        return False
    raise ValueError(f"unknown calendar {calendar!r}")


# ---- calendar day arithmetic ---------------------------------------------
def _is_leap(year: int, cal: str) -> bool:
    if cal == "julian":
        return year % 4 == 0
    # proleptic Gregorian rule
    return year % 4 == 0 and (year % 100 != 0 or year % 400 == 0)


def _month_lengths(year: int, cal: str) -> tuple[int, ...]:
    if cal in _FIXED_MONTHS:
        return _FIXED_MONTHS[cal]
    base = (31, 29 if _is_leap(year, cal) else 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
    return base


def _days_per_year(cal: str) -> int | None:
    return {"noleap": 365, "365_day": 365, "all_leap": 366, "366_day": 366, "360_day": 360}.get(cal)


def date_to_daynum(y: int, m: int, d: int, cal: str) -> int:
    """Days since 0001-01-01 of the given calendar."""
    cal = cal.lower()
    fixed = _days_per_year(cal)
    if fixed is not None:
        months = _FIXED_MONTHS[cal]
        return (y - 1) * fixed + sum(months[: m - 1]) + (d - 1)
    if cal == "julian":
        leaps = (y - 1) // 4
        days = (y - 1) * 365 + leaps
    else:  # proleptic gregorian family
        yy = y - 1
        days = yy * 365 + yy // 4 - yy // 100 + yy // 400
    return days + sum(_month_lengths(y, cal)[: m - 1]) + (d - 1)


def daynum_to_date(n: int, cal: str) -> tuple[int, int, int]:
    cal = cal.lower()
    fixed = _days_per_year(cal)
    if fixed is not None:
        y, rem = divmod(n, fixed)
        y += 1
        months = _FIXED_MONTHS[cal]
        m = 1
        for ml in months:
            if rem < ml:
                return y, m, rem + 1
            rem -= ml
            m += 1
        raise AssertionError("unreachable")
    # Search by year (bounded loops; exact inverse of date_to_daynum).
    if cal == "julian":
        y = max(1, n // 366)
    else:
        y = max(1, n // 366)
    while date_to_daynum(y + 1, 1, 1, cal) <= n:
        y += 1
    rem = n - date_to_daynum(y, 1, 1, cal)
    for m, ml in enumerate(_month_lengths(y, cal), start=1):
        if rem < ml:
            return y, m, rem + 1
        rem -= ml
    raise AssertionError("unreachable")


# ---- offsets <-> calendar dates ------------------------------------------
def _base_us(units: CfUnits, cal: str) -> int:
    y, m, d, hh, mi, ss, us = units.base
    return (
        date_to_daynum(y, m, d, cal) * 86_400_000_000
        + hh * 3_600_000_000
        + mi * 60_000_000
        + ss * 1_000_000
        + us
    )


def offset_to_date(offset: int, units: CfUnits, cal: str) -> tuple[int, int, int, int, int, int, int]:
    total = _base_us(units, cal) + int(offset) * units.step_us
    daynum, rem = divmod(total, 86_400_000_000)
    y, m, d = daynum_to_date(int(daynum), cal)
    hh, rem = divmod(rem, 3_600_000_000)
    mi, rem = divmod(rem, 60_000_000)
    ss, us = divmod(rem, 1_000_000)
    return y, m, d, int(hh), int(mi), int(ss), int(us)


def date_to_offset(
    y: int, m: int, d: int, hh: int = 0, mi: int = 0, ss: int = 0, us: int = 0,
    *, units: CfUnits, cal: str,
) -> int:
    total = (
        date_to_daynum(y, m, d, cal) * 86_400_000_000
        + hh * 3_600_000_000
        + mi * 60_000_000
        + ss * 1_000_000
        + us
    )
    delta = total - _base_us(units, cal)
    q, r = divmod(delta, units.step_us)
    if r:
        raise ValueError("date not representable in the column's unit resolution")
    return int(q)


def decode_to_timestamps(offsets: np.ndarray, units: str, calendar: str) -> np.ndarray:
    """Gregorian-like tier: int offsets -> datetime64[us], preserving
    calendar dates (noleap 2000-03-01 -> timestamp 2000-03-01)."""
    cf = parse_units(units)
    cal = calendar.lower()
    out = np.empty(len(offsets), dtype="datetime64[us]")
    for i, off in enumerate(np.asarray(offsets)):
        y, m, d, hh, mi, ss, us = offset_to_date(int(off), cf, cal)
        out[i] = np.datetime64(f"{y:04d}-{m:02d}-{d:02d}T{hh:02d}:{mi:02d}:{ss:02d}.{us:06d}")
    return out


_DATE_STR_RE = re.compile(
    r"^\s*(\d{1,4})-(\d{1,2})-(\d{1,2})(?:[T ](\d{1,2}):(\d{2})(?::(\d{2}))?)?\s*$"
)


def parse_date_string(s: str) -> tuple[int, int, int, int, int, int]:
    m = _DATE_STR_RE.match(s)
    if not m:
        raise ValueError(f"unparseable date string {s!r}")
    y, mo, d, hh, mi, ss = m.groups()
    return int(y), int(mo), int(d), int(hh or 0), int(mi or 0), int(ss or 0)


def make_cftime_udf(units: str, calendar: str):
    """Build the ``cftime('YYYY-MM-DD')`` scalar pandas UDF bound to a
    registered column's encoding (reference cftime.py:217-248)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    cf = parse_units(units)
    cal = calendar.lower()

    @pandas_udf(LongType())
    def cftime(dates: pd.Series) -> pd.Series:
        return dates.map(
            lambda s: date_to_offset(*parse_date_string(s), units=cf, cal=cal)
        ).astype("int64")

    return cftime
