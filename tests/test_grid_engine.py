"""End-to-end grid engine tests: registration, laziness, pruning, projection
pushdown, NaN semantics, namespaces, round-trip (reference test strategy
layers 2-4, SURVEY.md §5; fixtures from FIXTURES.md)."""

from __future__ import annotations

import glob
import json
import os
import tempfile

import numpy as np
import pytest

from xarray_sql_spark.dataset import Dataset, Variable
from xarray_sql_spark.xr_session import XarraySession


@pytest.fixture(scope="module")
def xs(spark):
    return XarraySession(spark)


@pytest.fixture()
def read_log():
    d = tempfile.mkdtemp(prefix="readlog_")

    class Log:
        dir = d

        def drain(self):
            out = [json.load(open(p)) for p in sorted(glob.glob(d + "/*.json"))]
            for p in glob.glob(d + "/*.json"):
                os.remove(p)
            return out

    return Log()


def air_small() -> Dataset:
    """FIXTURES.md F1 small: 12x11x10, lat descending."""
    time = np.arange("2013-01-01T00", "2013-01-01T12", dtype="datetime64[h]").astype(
        "datetime64[ns]"
    )
    lat = (75.0 - 2.5 * np.arange(11)).astype(np.float32)
    lon = (200.0 + 2.5 * np.arange(10)).astype(np.float32)
    rng = np.random.default_rng(42)
    air = rng.normal(280, 10, (12, 11, 10)).astype(np.float32)
    return Dataset(
        {"air": Variable(("time", "lat", "lon"), air, {"units": "K"})},
        {"time": time, "lat": lat, "lon": lon},
        attrs={"title": "air_small"},
    )


# --- laziness + fresh stream per query (reference test_reader.py:109-161,869-945)
def test_zero_reads_at_registration_and_planning(xs, read_log):
    xs.from_dataset("lazy_air", air_small(), chunks={"time": 4}, read_log_dir=read_log.dir)
    assert read_log.drain() == []
    df = xs.sql("SELECT AVG(air) AS a FROM lazy_air").df
    assert read_log.drain() == []  # planning triggers no reads
    df.collect()
    assert len(read_log.drain()) == 3
    # Fresh stream per query: a new sql() call re-executes the scan.
    # (Re-collecting the SAME DataFrame may legitimately reuse shuffle
    # output — Spark stage reuse — without re-reading the source.)
    df2 = xs.sql("SELECT AVG(air) AS a FROM lazy_air").df
    df2.collect()
    assert len(read_log.drain()) == 3


# --- pruning golden counts (FIXTURES.md F10) -------------------------------
def prune_fixture() -> Dataset:
    time = np.arange("2020-01-01", "2020-04-10", dtype="datetime64[D]").astype("datetime64[ns]")
    assert len(time) == 100
    lat = np.linspace(-90, 90, 5)
    rng = np.random.default_rng(0)
    temp = rng.normal(15, 5, (100, 5)).astype(np.float32)
    return Dataset({"temperature": (("time", "lat"), temp)}, {"time": time, "lat": lat})


def test_time_pruning_golden(xs, read_log):
    xs.from_dataset("prune_t", prune_fixture(), chunks={"time": 25}, read_log_dir=read_log.dir)
    n = xs.sql(
        "SELECT COUNT(*) AS n FROM prune_t WHERE time >= TIMESTAMP '2020-03-16'"
    ).df.collect()[0]["n"]
    logs = read_log.drain()
    assert n == 25 * 5  # last chunk only
    assert len([l for l in logs if l["partition"] >= 0]) == 1


def test_lat_pruning_golden(xs, read_log):
    ds = prune_fixture()
    xs.from_dataset("prune_l", ds, chunks={"lat": 2}, read_log_dir=read_log.dir)
    n = xs.sql("SELECT COUNT(*) AS n FROM prune_l WHERE lat < 0").df.collect()[0]["n"]
    logs = read_log.drain()
    assert n == 100 * 2  # lats -90, -45
    assert len([l for l in logs if l["partition"] >= 0]) == 1  # chunk [-90,-45]


def test_unsatisfiable_filter_reads_nothing(xs, read_log):
    xs.from_dataset("prune_e", prune_fixture(), chunks={"time": 25}, read_log_dir=read_log.dir)
    n = xs.sql("SELECT COUNT(*) AS n FROM prune_e WHERE lat > 100").df.collect()[0]["n"]
    logs = read_log.drain()
    assert n == 0
    assert [l["partition"] for l in logs] == [-1]  # sentinel only, zero data reads


def test_between_and_in_prune(xs, read_log):
    xs.from_dataset("prune_b", prune_fixture(), chunks={"time": 25}, read_log_dir=read_log.dir)
    n = xs.sql(
        "SELECT COUNT(*) AS n FROM prune_b "
        "WHERE time BETWEEN TIMESTAMP '2020-01-01' AND TIMESTAMP '2020-01-10'"
    ).df.collect()[0]["n"]
    logs = read_log.drain()
    assert n == 10 * 5
    assert len([l for l in logs if l["partition"] >= 0]) == 1


# --- projection pushdown golden (FIXTURES.md F11) --------------------------
def test_projection_reaches_storage(xs, read_log):
    time = np.arange("2020-01-01", "2020-01-11", dtype="datetime64[D]").astype("datetime64[ns]")
    lat = np.linspace(-10, 10, 5).astype(np.float32)
    rng = np.random.default_rng(1)
    ds = Dataset(
        {
            "temperature": (("time", "lat"), rng.normal(size=(10, 5)).astype(np.float32)),
            "precipitation": (("time", "lat"), rng.normal(size=(10, 5)).astype(np.float32)),
        },
        {"time": time, "lat": lat},
    )
    xs.from_dataset("proj", ds, chunks={"time": 5}, read_log_dir=read_log.dir)
    xs.sql("SELECT AVG(temperature) AS a FROM proj").df.collect()
    logs = read_log.drain()
    for l in logs:
        assert "temperature" in l["vars_read"]
        assert "precipitation" not in l["vars_read"]
    # COUNT(*) materializes no data variables at all.
    xs.sql("SELECT COUNT(*) AS n FROM proj").df.collect()
    logs = read_log.drain()
    assert all(l["vars_read"] == [] for l in logs)


# --- NaN -> null semantics (FIXTURES.md F7 golden answers) -----------------
def test_nan_null_semantics(xs):
    time = np.arange("2021-01-01", "2021-01-03", dtype="datetime64[D]").astype("datetime64[ns]")
    x = np.array([0, 1], dtype=np.int64)
    y = np.array([0, 1], dtype=np.int64)
    temp = np.array(
        [[[1.0, 2.0], [np.nan, 4.0]], [[5.0, np.nan], [7.0, 8.0]]], dtype=np.float64
    )
    ds = Dataset({"temp": (("time", "x", "y"), temp)}, {"time": time, "x": x, "y": y})
    xs.from_dataset("nantab", ds, chunks={"time": 1})
    row = xs.sql(
        "SELECT MAX(temp) AS mx, MIN(temp) AS mn, AVG(temp) AS av, COUNT(temp) AS c, "
        "COUNT(*) FILTER (WHERE temp IS NULL) AS nulls FROM nantab"
    ).df.collect()[0]
    assert row["mx"] == 8.0 and row["mn"] == 1.0
    assert abs(row["av"] - 4.5) < 1e-12
    assert row["c"] == 6 and row["nulls"] == 2


# --- string coordinates (FIXTURES.md F6) -----------------------------------
def test_string_coordinates(xs):
    students = np.array(["alice", "bob", "charlie"], dtype=object)
    subjects = np.array(["math", "science"], dtype=object)
    rng = np.random.default_rng(2)
    score = rng.random((3, 2))
    ds = Dataset({"score": (("student", "subject"), score)}, {"student": students, "subject": subjects})
    xs.from_dataset("grades", ds)
    rows = xs.sql(
        "SELECT student, AVG(score) AS s FROM grades WHERE subject = 'math' "
        "GROUP BY student ORDER BY student"
    ).df.collect()
    assert [r["student"] for r in rows] == ["alice", "bob", "charlie"]
    np.testing.assert_allclose([r["s"] for r in rows], score[:, 0], rtol=1e-12)


# --- multi-dim-group registration + scalar table (FIXTURES.md F9) ----------
def test_mixed_dims_namespace(xs):
    time = np.arange("2020-01-01", "2020-01-03", dtype="datetime64[D]").astype("datetime64[ns]")
    lat = np.linspace(-90, 90, 3)
    lon = np.linspace(-180, 180, 4)
    level = np.array([500, 1000], dtype=np.int64)
    rng = np.random.default_rng(3)
    ds = Dataset(
        {
            "temperature_2m": (("time", "lat", "lon"), rng.normal(size=(2, 3, 4))),
            "pressure": (("time", "lat", "lon", "level"), rng.normal(size=(2, 3, 4, 2))),
            "projection": ((), np.int64(4326)),
        },
        {"time": time, "lat": lat, "lon": lon, "level": level},
    )
    xs.from_dataset("era5", ds, chunks={"time": 1})
    assert xs.sql("SELECT COUNT(*) AS n FROM era5.time_lat_lon").df.collect()[0]["n"] == 24
    assert (
        xs.sql("SELECT COUNT(*) AS n FROM era5.time_lat_lon_level").df.collect()[0]["n"] == 48
    )
    assert xs.sql("SELECT projection FROM era5.scalar").df.collect()[0]["projection"] == 4326
    # join across the two dim groups
    n = xs.sql(
        "SELECT COUNT(*) AS n FROM era5.time_lat_lon s JOIN era5.time_lat_lon_level a "
        "ON s.time = a.time AND s.lat = a.lat AND s.lon = a.lon"
    ).df.collect()[0]["n"]
    assert n == 48


def test_table_names_override(xs):
    time = np.arange("2020-01-01", "2020-01-03", dtype="datetime64[D]").astype("datetime64[ns]")
    lat = np.linspace(-90, 90, 3)
    level = np.array([500, 1000], dtype=np.int64)
    rng = np.random.default_rng(4)
    ds = Dataset(
        {
            "t2m": (("time", "lat"), rng.normal(size=(2, 3))),
            "z": (("time", "lat", "level"), rng.normal(size=(2, 3, 2))),
        },
        {"time": time, "lat": lat, "level": level},
    )
    xs.from_dataset(
        "wx",
        ds,
        table_names={("time", "lat"): "surface", ("time", "lat", "level"): "atmosphere"},
    )
    assert xs.sql("SELECT COUNT(*) AS n FROM wx.surface").df.collect()[0]["n"] == 6
    assert xs.sql("SELECT COUNT(*) AS n FROM wx.atmosphere").df.collect()[0]["n"] == 12


# --- round-trip + reverse pivot -------------------------------------------
def test_select_star_roundtrip(xs):
    ds = air_small()
    xs.from_dataset("rt_air", ds, chunks={"time": 4})
    out = xs.sql("SELECT * FROM rt_air").to_dataset(
        dims=("time", "lat", "lon"), template="rt_air"
    )
    # Row order is engine-defined; compare via coordinate alignment.
    src_air = ds.data_vars["air"].values()
    t_idx = {v: i for i, v in enumerate(out.coords["time"].tolist())}
    la_idx = {v: i for i, v in enumerate(out.coords["lat"].tolist())}
    lo_idx = {v: i for i, v in enumerate(out.coords["lon"].tolist())}
    got = out.data_vars["air"].values()
    perm = np.array(
        [
            [
                [got[t_idx[t], la_idx[la], lo_idx[lo]] for lo in ds.coords["lon"].tolist()]
                for la in ds.coords["lat"].tolist()
            ]
            for t in ds.coords["time"].tolist()
        ]
    )
    np.testing.assert_allclose(perm, src_air, rtol=1e-6)
    # template metadata recovery
    assert out.attrs.get("title") == "air_small"
    assert out.data_vars["air"].attrs.get("units") == "K"


def test_orderby_desc_direction_preserved(xs):
    ds = air_small()
    xs.from_dataset("ord_air", ds, chunks={"time": 4})
    out = xs.sql(
        "SELECT lat, AVG(air) AS air FROM ord_air GROUP BY lat ORDER BY lat DESC"
    ).to_dataset(dims=("lat",))
    lats = out.coords["lat"]
    assert (np.diff(lats) < 0).all()  # descending preserved into axis order


def test_groupby_mean_matches_numpy(xs):
    ds = air_small()
    xs.from_dataset("agg_air", ds, chunks={"time": 4})
    out = xs.sql(
        "SELECT lat, lon, AVG(air) AS air FROM agg_air GROUP BY lat, lon"
    ).to_dataset(dims=("lat", "lon"))
    expect = ds.data_vars["air"].values().mean(axis=0)
    la = {v: i for i, v in enumerate(out.coords["lat"].tolist())}
    lo = {v: i for i, v in enumerate(out.coords["lon"].tolist())}
    got = out.data_vars["air"].values()
    for i, lav in enumerate(ds.coords["lat"].tolist()):
        for j, lov in enumerate(ds.coords["lon"].tolist()):
            assert abs(got[la[lav], lo[lov]] - expect[i, j]) < 1e-4


def test_sparsity_template_fill(xs):
    ds = air_small()
    xs.from_dataset("sp_air", ds, chunks={"time": 4})
    out = xs.sql(
        "SELECT lat, lon, AVG(air) AS air FROM sp_air WHERE lat > 60 GROUP BY lat, lon"
    ).to_dataset(dims=("lat", "lon"), template=ds, sparsity="template")
    assert out.data_vars["air"].shape == (11, 10)
    vals = out.data_vars["air"].values()
    # lat coords follow the template; rows with lat <= 60 are NaN-filled
    mask = ds.coords["lat"] <= 60
    assert np.isnan(vals[mask]).all()
    assert not np.isnan(vals[~mask]).any()


# --- store-backed laziness -------------------------------------------------
def test_store_backed_scan(xs, read_log, tmp_path):
    ds = air_small()
    store = ds.to_store(str(tmp_path / "air_store"))
    xs.from_dataset("st_air", ds, chunks={"time": 6}, store=store, read_log_dir=read_log.dir)
    read_log.drain()
    row = xs.sql("SELECT AVG(air) AS a FROM st_air").df.collect()[0]
    expect = float(ds.data_vars["air"].values().mean())
    assert abs(row["a"] - expect) < 1e-3
    logs = read_log.drain()
    assert len(logs) == 2


# --- error surface (reference tests/test_sql.py:103-123) -------------------
def test_unknown_table_and_column_errors(xs):
    from pyspark.errors.exceptions.captured import AnalysisException

    xs.from_dataset("err_air", air_small())
    with pytest.raises(AnalysisException):
        xs.sql("SELECT * FROM no_such_table").df.collect()
    with pytest.raises(AnalysisException):
        xs.sql("SELECT nope FROM err_air").df.collect()
