"""Offline tests of the SC3 OPeNDAP/DAP2 client (reference parity:
speed_benchmark.ipynb cell 2's ERDDAP griddap subset download). The
fetcher is injected, so the protocol machinery runs against crafted
spec-conformant responses with no network."""

import struct

import numpy as np
import pandas as pd
import pytest

from mhw3d_detection_spark.sources.opendap import (
    dap_url,
    fetch_dods_subset,
    parse_dds,
    parse_dods,
    read_opendap_long,
    read_opendap_long_distributed,
)

_DDS = """Dataset {
  GRID {
    ARRAY:
      Float32 sst[time = %d][latitude = %d][longitude = %d];
    MAPS:
      Float64 time[time = %d];
      Float64 latitude[latitude = %d];
      Float64 longitude[longitude = %d];
  } sst;
} erdTestSst;"""


def _xdr(arr, dtype):
    a = np.asarray(arr).astype(dtype)
    n = a.size
    return struct.pack(">II", n, n) + a.tobytes() + b"\x00" * (-a.nbytes % 4)


def _dods_payload(cube, tvals, lats, lons):
    n_t, n_lat, n_lon = cube.shape
    dds = _DDS % (n_t, n_lat, n_lon, n_t, n_lat, n_lon)
    body = (
        _xdr(cube, ">f4")
        + _xdr(tvals, ">f8")
        + _xdr(lats, ">f8")
        + _xdr(lons, ">f8")
    )
    return dds.encode() + b"\nData:\n" + body


def _fixture(n_t=6, n_lat=2, n_lon=3):
    rng = np.random.default_rng(3)
    cube = np.round(12 + rng.normal(0, 1, (n_t, n_lat, n_lon)), 2).astype(
        np.float32
    )
    day = 86400.0
    tvals = np.arange(n_t) * day + 8.0 * 365 * day  # epoch seconds, 1978-ish
    lats = np.array([-40.0, -39.75])
    lons = np.array([150.0, 150.25, 150.5])
    return cube, tvals, lats, lons


def test_dap_url_constraint():
    u = dap_url(
        "https://srv/erddap/griddap/dsid", "sst",
        time=(0, 364), lat=(10, 20), lon=(30, 40),
    )
    assert u == "https://srv/erddap/griddap/dsid.dods?sst[0:364][10:20][30:40]"
    # idempotent on a .dods base
    assert dap_url(u.split("?")[0], "sst", time=(0, 1), lat=(0, 1), lon=(0, 1))


def test_parse_dds_grid_and_atomic():
    vs = parse_dds(_DDS % (6, 2, 3, 6, 2, 3))
    assert len(vs) == 1 and vs[0].name == "sst"
    assert vs[0].shape == (6, 2, 3) and vs[0].is_grid_array
    assert [m.name for m in vs[0].maps] == ["time", "latitude", "longitude"]
    flat = parse_dds("Dataset {\n  Float64 time[time = 4];\n} d;")
    assert flat[0].name == "time" and flat[0].shape == (4,)


def test_parse_dods_roundtrip():
    cube, tvals, lats, lons = _fixture()
    data = parse_dods(_dods_payload(cube, tvals, lats, lons))
    np.testing.assert_array_equal(data["sst"], cube)
    np.testing.assert_array_equal(data["time"], tvals)
    np.testing.assert_array_equal(data["latitude"], lats)
    np.testing.assert_array_equal(data["longitude"], lons)


def test_parse_dods_xdr_padding_int16():
    # Int16 rides 32-bit wire ints; odd-length Byte arrays pad to 4
    dds = (
        "Dataset {\n  Int16 qc[time = 3];\n  Byte flag[time = 5];\n"
        "  Float64 time[time = 3];\n} d;"
    )
    body = (
        _xdr([1, -2, 3], ">i4")
        + struct.pack(">II", 5, 5) + bytes([9, 8, 7, 6, 5]) + b"\x00" * 3
        + _xdr([0.0, 1.0, 2.0], ">f8")
    )
    data = parse_dods(dds.encode() + b"\nData:\n" + body)
    assert data["qc"].tolist() == [1, -2, 3]
    assert data["flag"].tolist() == [9, 8, 7, 6, 5]
    assert data["time"].tolist() == [0.0, 1.0, 2.0]


def test_fetch_subset_cf_and_url(monkeypatch):
    cube, tvals, lats, lons = _fixture()
    seen = {}

    def fetcher(url):
        seen["url"] = url
        return _dods_payload(cube, tvals, lats, lons)

    got, times, coords = fetch_dods_subset(
        "https://srv/erddap/griddap/ds", "sst",
        time=(100, 105), lat=(4, 5), lon=(7, 9), fetcher=fetcher,
    )
    assert seen["url"].endswith(".dods?sst[100:105][4:5][7:9]")
    np.testing.assert_allclose(got, cube.astype(np.float64))
    # ERDDAP epoch-seconds decode
    assert times[0] == pd.Timestamp("1970-01-01") + pd.to_timedelta(
        tvals[0], unit="s"
    )
    np.testing.assert_array_equal(coords["lat"], lats)

    # packed variant: fill -> NaN, scale/offset applied
    packed = cube.copy()
    packed[0, 0, 0] = -999.0
    got2, _, _ = fetch_dods_subset(
        "https://srv/erddap/griddap/ds", "sst",
        time=(0, 5), lat=(0, 1), lon=(0, 2),
        fetcher=lambda u: _dods_payload(packed, tvals, lats, lons),
        fill_value=-999.0, scale=0.5, offset=10.0,
    )
    assert np.isnan(got2[0, 0, 0])
    ok = ~np.isnan(got2)
    np.testing.assert_allclose(
        got2[ok], packed.astype(np.float64)[ok] * 0.5 + 10.0
    )


def test_read_opendap_long_and_distributed(spark):
    cube, tvals, lats, lons = _fixture()
    payload = _dods_payload(cube, tvals, lats, lons)

    df = read_opendap_long(
        spark, "https://srv/erddap/griddap/ds", "sst",
        time=(0, 5), lat=(0, 1), lon=(0, 2),
        fetcher=lambda u: payload,
    )
    rows = {(r.cell_id, r.time): (r.lat, r.lon, r.temp) for r in df.collect()}
    assert len(rows) == cube.size
    t0 = pd.Timestamp("1970-01-01") + pd.to_timedelta(tvals[0], unit="s")
    assert rows[(0, t0)] == (
        pytest.approx(-40.0), pytest.approx(150.0),
        pytest.approx(float(cube[0, 0, 0])),
    )

    # distributed: two "year" URLs, each its own payload; the serializable
    # fetcher closes over the bytes (executor-side decode)
    cube2 = cube + np.float32(1.0)
    tvals2 = tvals + 6 * 86400.0
    payload2 = _dods_payload(cube2, tvals2, lats, lons)
    table = {"u1": payload, "u2": payload2}

    ddf = read_opendap_long_distributed(
        spark, ["u1", "u2"], "sst",
        fetcher=lambda u, _t=table: _t[u],
    )
    drows = {(r.cell_id, r.time): r.temp for r in ddf.collect()}
    assert len(drows) == 2 * cube.size
    t6 = pd.Timestamp("1970-01-01") + pd.to_timedelta(tvals2[0], unit="s")
    assert drows[(0, t6)] == pytest.approx(float(cube2[0, 0, 0]))
    # the driver path rows are a subset (same decode both paths)
    for k, (la, lo, te) in rows.items():
        assert drows[k] == pytest.approx(te)
