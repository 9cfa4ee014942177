"""Round-trip tests of the file-level netCDF bridge (SURVEY §2.1
SC1/SC2; reference entry point README.md:51 `xr.open_dataset`).

The builtin pure-numpy classic reader makes these RUNNABLE without
xarray/netCDF4 — the writer produces spec-conformant CDF-1/CDF-2 bytes
and the reader must recover the exact cube, CF-decoded."""

import numpy as np
import pandas as pd
import pytest

from mhw3d_detection_spark.sources.netcdf import (
    decode_cf_time,
    read_netcdf_file,
    read_netcdf_long,
    write_netcdf_classic,
)


def _sst_cube(n_t=8, n_lat=3, n_lon=4, seed=7):
    rng = np.random.default_rng(seed)
    cube = 15.0 + rng.normal(0, 2, size=(n_t, n_lat, n_lon))
    return np.round(cube, 2)


def _write_sst(path, cube, *, record_time=False, version=1, packed=False):
    n_t, n_lat, n_lon = cube.shape
    lats = np.arange(n_lat, dtype=np.float64) * 0.25 - 10.0
    lons = np.arange(n_lon, dtype=np.float64) * 0.25 + 140.0
    tvals = np.arange(n_t, dtype=np.float64)
    tattrs = {"units": "days since 1990-01-01", "calendar": "standard"}
    if packed:
        # CF int16 packing with a fill hole
        fill = np.int16(-32768)
        scaled = np.round((cube - 10.0) / 0.01).astype(np.int16)
        scaled[0, 0, 0] = fill
        data = scaled
        vattrs = {
            "scale_factor": np.float64(0.01),
            "add_offset": np.float64(10.0),
            "_FillValue": fill,
            "units": "degC",
        }
    else:
        data = cube.astype(np.float64)
        vattrs = {"units": "degC"}
    write_netcdf_classic(
        path,
        {"time": None if record_time else n_t, "lat": n_lat, "lon": n_lon},
        {
            "lat": (["lat"], lats, {"units": "degrees_north"}),
            "lon": (["lon"], lons, {"units": "degrees_east"}),
            "time": (["time"], tvals, tattrs),
            "sst": (["time", "lat", "lon"], data, vattrs),
        },
        version=version,
    )
    return lats, lons


@pytest.mark.parametrize("record_time", [False, True])
@pytest.mark.parametrize("version", [1, 2])
def test_roundtrip_cube(tmp_path, record_time, version):
    cube = _sst_cube()
    p = str(tmp_path / "sst.nc")
    lats, lons = _write_sst(p, cube, record_time=record_time, version=version)
    got, times, coords = read_netcdf_file(p)  # var inferred like ds.sst
    np.testing.assert_array_equal(got, cube)
    assert times[0] == pd.Timestamp("1990-01-01")
    assert times[-1] == pd.Timestamp("1990-01-08")
    np.testing.assert_array_equal(coords["lat"], lats)
    np.testing.assert_array_equal(coords["lon"], lons)


def test_cf_packing_and_fill(tmp_path):
    cube = _sst_cube()
    p = str(tmp_path / "packed.nc")
    _write_sst(p, cube, packed=True)
    got, _times, _coords = read_netcdf_file(p, "sst")
    assert np.isnan(got[0, 0, 0])  # the fill hole
    mask = ~np.isnan(got)
    np.testing.assert_allclose(got[mask], cube[mask], atol=0.005 + 1e-9)


def test_read_netcdf_long_matches_dense_to_long(spark, tmp_path):
    from mhw3d_detection_spark.sources.ingest import dense_to_long

    cube = _sst_cube()
    p = str(tmp_path / "sst.nc")
    lats, lons = _write_sst(p, cube)
    times = pd.date_range("1990-01-01", periods=cube.shape[0], freq="D")
    want = {
        (r.cell_id, r.time): (r.lat, r.lon, r.temp)
        for r in dense_to_long(
            spark, cube, times, {"lat": lats, "lon": lons}
        ).collect()
    }
    got = {
        (r.cell_id, r.time): (r.lat, r.lon, r.temp)
        for r in read_netcdf_long(spark, p, engine="builtin").collect()
    }
    assert got == want and len(got) == cube.size


def test_multifile_glob_concat_and_distribute(spark, tmp_path):
    # SC2 / open_mfdataset parity: a glob concatenates along time on
    # one grid; the distributed executor-side path emits the same rows
    c1, c2 = _sst_cube(seed=1), _sst_cube(seed=2)
    for i, c in enumerate((c1, c2)):
        path = str(tmp_path / f"sst_{i}.nc")
        n_t = c.shape[0]
        lats = np.arange(3, dtype=np.float64) * 0.25 - 10.0
        lons = np.arange(4, dtype=np.float64) * 0.25 + 140.0
        write_netcdf_classic(
            path,
            {"time": n_t, "lat": 3, "lon": 4},
            {
                "lat": (["lat"], lats, {}),
                "lon": (["lon"], lons, {}),
                "time": (
                    ["time"],
                    np.arange(i * n_t, (i + 1) * n_t, dtype=np.float64),
                    {"units": "days since 1990-01-01"},
                ),
                "sst": (["time", "lat", "lon"], c, {}),
            },
        )
    glob_pat = str(tmp_path / "sst_*.nc")
    driver = read_netcdf_long(spark, glob_pat, "sst", engine="builtin")
    rows = {(r.cell_id, r.time): r.temp for r in driver.collect()}
    assert len(rows) == c1.size + c2.size
    # file 2's day-8 value for cell 0 shows up under the concat time
    assert rows[(0, pd.Timestamp("1990-01-09"))] == pytest.approx(c2[0, 0, 0])

    dist = read_netcdf_long(
        spark, glob_pat, "sst", engine="builtin", distribute=True
    )
    drows = {(r.cell_id, r.time): r.temp for r in dist.collect()}
    assert drows == rows


def test_decode_cf_time_units_and_calendar_guard():
    idx = decode_cf_time(
        np.array([0.0, 36.0]), {"units": "hours since 2000-01-01 06:00:00"}
    )
    assert idx[1] == pd.Timestamp("2000-01-02 18:00:00")
    with pytest.raises(ValueError, match="360|M3|DOY"):
        decode_cf_time(
            np.array([0.0]),
            {"units": "days since 2000-01-01", "calendar": "360_day"},
        )


def test_hdf5_magic_rejected_with_pointer(tmp_path):
    p = tmp_path / "v4.nc"
    p.write_bytes(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(ValueError, match="netCDF-4/HDF5"):
        read_netcdf_file(str(p))


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    n_t=st.integers(1, 6),
    n_lat=st.integers(1, 4),
    n_lon=st.integers(1, 5),
    record=st.booleans(),
    version=st.sampled_from([1, 2]),
    seed=st.integers(0, 10_000),
)
def test_roundtrip_property(tmp_path_factory, n_t, n_lat, n_lon, record,
                            version, seed):
    # spec-conformance fuzz: ANY grid shape / record-vs-fixed time /
    # CDF version must round-trip the cube and coords EXACTLY (the
    # writer and reader were derived independently from the public
    # format spec; a shared misreading would need to cancel out across
    # all of padding, record strides and 64-bit offsets to pass this)
    rng = np.random.default_rng(seed)
    cube = np.round(
        rng.normal(10, 5, size=(n_t, n_lat, n_lon)), 3
    ).astype(np.float64)
    lats = np.sort(rng.uniform(-90, 90, n_lat))
    lons = np.sort(rng.uniform(0, 360, n_lon))
    tvals = np.arange(n_t, dtype=np.float64) + float(rng.integers(0, 10_000))
    p = str(tmp_path_factory.mktemp("fuzz") / "f.nc")
    write_netcdf_classic(
        p,
        {"time": None if record else n_t, "lat": n_lat, "lon": n_lon},
        {
            "lat": (["lat"], lats, {}),
            "lon": (["lon"], lons, {}),
            "time": (["time"], tvals, {"units": "days since 1990-01-01"}),
            "sst": (["time", "lat", "lon"], cube, {"units": "degC"}),
        },
        version=version,
    )
    got, times, coords = read_netcdf_file(p, "sst")
    np.testing.assert_array_equal(got, cube)
    np.testing.assert_array_equal(coords["lat"], lats)
    np.testing.assert_array_equal(coords["lon"], lons)
    assert len(times) == n_t
    assert times[0] == pd.Timestamp("1990-01-01") + pd.to_timedelta(
        tvals[0] * 86400.0, unit="s"
    )
