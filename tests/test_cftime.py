"""CF calendar bridge (reference tests/test_cft.py + test_sql.py:198-325)."""

from __future__ import annotations

import numpy as np
import pytest

from xarray_sql_spark.dataset import Dataset
from xarray_sql_spark.functions.cftime import (
    CfUnits,
    date_to_daynum,
    date_to_offset,
    daynum_to_date,
    decode_to_timestamps,
    is_gregorian_like,
    offset_to_date,
    parse_units,
)
from xarray_sql_spark.xr_session import XarraySession


# ---- pure calendar arithmetic --------------------------------------------
def test_classification():
    for cal in ("standard", "gregorian", "proleptic_gregorian", "noleap", "365_day", "all_leap"):
        assert is_gregorian_like(cal)
    for cal in ("360_day", "julian"):
        assert not is_gregorian_like(cal)
    with pytest.raises(ValueError):
        is_gregorian_like("marsian")


@pytest.mark.parametrize("cal", ["noleap", "all_leap", "360_day", "julian", "proleptic_gregorian"])
def test_daynum_roundtrip(cal):
    for y, m, d in [(1, 1, 1), (2000, 2, 28), (2000, 3, 1), (1999, 12, 30), (2400, 2, 1)]:
        n = date_to_daynum(y, m, d, cal)
        assert daynum_to_date(n, cal) == (y, m, d)


def test_noleap_skips_feb29():
    # 2000-02-28 -> next day is 03-01 in noleap
    n = date_to_daynum(2000, 2, 28, "noleap")
    assert daynum_to_date(n + 1, "noleap") == (2000, 3, 1)
    # but gregorian has the leap day
    n = date_to_daynum(2000, 2, 28, "proleptic_gregorian")
    assert daynum_to_date(n + 1, "proleptic_gregorian") == (2000, 2, 29)


def test_julian_leap_rule():
    # 1900 is a leap year in julian, not in gregorian
    n = date_to_daynum(1900, 2, 28, "julian")
    assert daynum_to_date(n + 1, "julian") == (1900, 2, 29)
    n = date_to_daynum(1900, 2, 28, "proleptic_gregorian")
    assert daynum_to_date(n + 1, "proleptic_gregorian") == (1900, 3, 1)


def test_360_day_months():
    units = parse_units("days since 2000-01-01")
    # 12 months of exactly 30 days
    assert offset_to_date(30, units, "360_day")[:3] == (2000, 2, 1)
    assert offset_to_date(359, units, "360_day")[:3] == (2000, 12, 30)
    assert offset_to_date(360, units, "360_day")[:3] == (2001, 1, 1)


def test_offset_roundtrip_hours():
    units = parse_units("hours since 1980-06-15 12:00:00")
    for off in (0, 1, 25, 9999):
        y, m, d, hh, mi, ss, us = offset_to_date(off, units, "noleap")
        assert date_to_offset(y, m, d, hh, mi, ss, us, units=units, cal="noleap") == off


def test_decode_to_timestamps_noleap():
    # monthly firsts of 2000 in noleap — dates preserved verbatim
    units = "days since 2000-01-01"
    offsets = [date_to_daynum(2000, m, 1, "noleap") - date_to_daynum(2000, 1, 1, "noleap") for m in range(1, 13)]
    ts = decode_to_timestamps(np.array(offsets), units, "noleap")
    assert str(ts[0]) == "2000-01-01T00:00:00.000000"
    assert str(ts[2]) == "2000-03-01T00:00:00.000000"
    assert str(ts[11]) == "2000-12-01T00:00:00.000000"


def test_us_range_beyond_ns_limit():
    # year 2500 overflows datetime64[ns] but not [us] (reference cftime.py:33-47)
    units = "days since 2000-01-01"
    off = date_to_daynum(2500, 1, 1, "noleap") - date_to_daynum(2000, 1, 1, "noleap")
    ts = decode_to_timestamps(np.array([off]), units, "noleap")
    assert str(ts[0]).startswith("2500-01-01")


# ---- engine integration ---------------------------------------------------
@pytest.fixture(scope="module")
def xs(spark):
    return XarraySession(spark)


def test_noleap_registration_and_string_filter(xs):
    """Gregorian-like tier: decoded to timestamps; SQL string literals filter
    and prune (reference tests/test_sql.py:198-249)."""
    units = "days since 1980-09-01"
    offsets = np.arange(0, 120, dtype=np.int64)  # ~4 months daily
    temp = np.arange(120, dtype=np.float32)
    ds = Dataset({"temp": (("time",), temp)}, {"time": offsets})
    ds.coord_attrs["time"] = {"units": units, "calendar": "noleap"}
    xs.from_dataset("rasm", ds, chunks={"time": 30})
    schema = dict(xs.spark.table("rasm").dtypes)
    assert schema["time"].startswith("timestamp")
    n = xs.sql("SELECT COUNT(*) AS n FROM rasm WHERE time >= '1980-10-01'").df.collect()[0]["n"]
    assert n == 120 - 30  # Sep has 30 days in noleap
    # partial filtering, not all-or-nothing
    assert 0 < n < 120


def test_360day_offsets_and_cftime_udf(xs):
    """Non-Gregorian tier: int64 offsets + metadata + cftime() UDF filter
    yields exactly 6 of 12 monthly rows (reference tests/test_sql.py:303-314)."""
    units = "days since 2000-01-01"
    offsets = np.array([m * 30 for m in range(12)], dtype=np.int64)  # month starts
    temp = np.arange(12, dtype=np.float32)
    ds = Dataset({"temp": (("time",), temp)}, {"time": offsets})
    ds.coord_attrs["time"] = {"units": units, "calendar": "360_day"}
    xs.from_dataset("cal360", ds, chunks={"time": 6})
    schema = dict(xs.spark.table("cal360").dtypes)
    assert schema["time"] == "bigint"
    # column metadata carries the encoding
    f = [f for f in xs.spark.table("cal360").schema.fields if f.name == "time"][0]
    assert f.metadata.get("xarray:units") == units
    assert f.metadata.get("xarray:calendar") == "360_day"
    rows = xs.sql(
        "SELECT time, temp FROM cal360 WHERE time >= cftime('2000-07-01') ORDER BY time"
    ).df.collect()
    assert len(rows) == 6
    assert rows[0]["time"] == 180  # 2000-07-01 is offset 180 in 360_day
