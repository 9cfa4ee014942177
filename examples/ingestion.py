"""Ingestion walkthrough: every path from raw oceanographic sources to
the engine's long table, end to end and offline. Run from the repo
root:

    python examples/ingestion.py

1. FILE (SC1): write a tiny classic ``.nc`` with the bundled
   spec-conformant writer, read it back with the pure-numpy reader
   (``sources.netcdf.read_netcdf_long`` — no xarray needed), detect
   events on it.
2. MULTI-FILE (SC2): a glob of per-period files concatenating along
   time — the ``open_mfdataset`` pattern.
3. REMOTE (SC3): an OPeNDAP/ERDDAP ``.dods`` subset parsed by the
   dependency-free DAP2 client (``sources.opendap``); here the fetch is
   a local stub so the example runs offline — swap the fetcher for the
   default urllib one against a real ERDDAP endpoint.
4. SINK (SC4/SC5): persist the melt year-partitioned, then read it back
   pruned.
"""

import struct
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from mhw3d_detection_spark import get_spark  # noqa: E402
from mhw3d_detection_spark.plans import detect_mhw  # noqa: E402
from mhw3d_detection_spark.sources.ingest import write_partitioned  # noqa: E402
from mhw3d_detection_spark.sources.netcdf import (  # noqa: E402
    read_netcdf_long,
    write_netcdf_classic,
)
from mhw3d_detection_spark.sources.opendap import (  # noqa: E402
    read_opendap_long,
)


def synth_year(year: int, n_lat=4, n_lon=4, heat_days=()):
    """One year of daily SST with an optional planted heatwave."""
    rng = np.random.default_rng(year)
    n_t = 365
    base = 14.0 + 3.0 * np.sin(np.arange(n_t) * 2 * np.pi / 365.25)
    cube = base[:, None, None] + rng.normal(0, 0.5, (n_t, n_lat, n_lon))
    for d in heat_days:
        cube[d] += 5.0
    return np.round(cube, 2)


def write_year_nc(path, year, cube):
    n_t, n_lat, n_lon = cube.shape
    t0 = (np.datetime64(f"{year}-01-01") - np.datetime64("1990-01-01")).astype(
        int
    )
    write_netcdf_classic(
        path,
        {"time": None, "lat": n_lat, "lon": n_lon},
        {
            "lat": (["lat"], np.arange(n_lat) * 0.25 - 40.0, {}),
            "lon": (["lon"], np.arange(n_lon) * 0.25 + 150.0, {}),
            "time": (
                ["time"],
                np.arange(n_t, dtype=np.float64) + t0,
                {"units": "days since 1990-01-01"},
            ),
            "sst": (["time", "lat", "lon"], cube, {"units": "degC"}),
        },
    )


def main() -> None:
    spark = get_spark("ingestion-example", cpus=8)
    tmp = tempfile.mkdtemp(prefix="ingest_demo_")

    # ---- 1+2: per-year .nc files, glob-ingested, events detected ----
    # heat planted in 1997, baseline 1995-96: the climatology must not
    # be contaminated by the event it is supposed to expose
    for year in (1995, 1996, 1997):
        heat = range(180, 230) if year == 1997 else ()
        write_year_nc(
            f"{tmp}/sst_{year}.nc", year, synth_year(year, heat_days=heat)
        )
    ts = read_netcdf_long(spark, f"{tmp}/sst_*.nc", "sst", engine="builtin")
    print(f"[file] melted rows: {ts.count()} "
          f"({ts.select('cell_id').distinct().count()} cells)")
    events = detect_mhw(
        ts.select("cell_id", "time", "temp"),
        baseline=(1995, 1996), smooth_width=None,
    )
    ev = events.select(
        "cell_id", "date_start", "duration", F.round("intensity_max", 2)
        .alias("imax")
    )
    n_ev = ev.count()
    print(f"[file] detected events ({n_ev}; the 50-day 1997 plant "
          "expected on every cell):")
    ev.show(5, truncate=False)
    assert n_ev >= 16, "planted heatwave must be detected on every cell"

    # ---- 3: remote OPeNDAP subset (offline stub fetcher) ----
    cube = synth_year(1998, n_lat=2, n_lon=2)[:10]
    dds = (
        "Dataset {\n  GRID {\n    ARRAY:\n"
        "      Float32 sst[time = 10][latitude = 2][longitude = 2];\n"
        "    MAPS:\n      Float64 time[time = 10];\n"
        "      Float64 latitude[latitude = 2];\n"
        "      Float64 longitude[longitude = 2];\n  } sst;\n} demo;"
    )

    def xdr(a, dt):
        a = np.asarray(a).astype(dt)
        return struct.pack(">II", a.size, a.size) + a.tobytes()

    day = 86400.0
    payload = dds.encode() + b"\nData:\n" + (
        xdr(cube, ">f4")
        + xdr(np.arange(10) * day, ">f8")
        + xdr([-40.0, -39.75], ">f8")
        + xdr([150.0, 150.25], ">f8")
    )
    remote = read_opendap_long(
        spark, "https://erddap.example/griddap/demo", "sst",
        time=(0, 9), lat=(0, 1), lon=(0, 1),
        fetcher=lambda url: payload,
    )
    print(f"[remote] subset rows: {remote.count()} (server-side pruned URL)")
    remote.show(3)

    # ---- 4: year-partitioned sink, pruned read-back ----
    write_partitioned(ts, f"{tmp}/series", by_year=True)
    pruned = spark.read.parquet(f"{tmp}/series").filter(F.col("year") == 1996)
    print(f"[sink] 1996 partition rows: {pruned.count()} "
          "(partition pruning — check .explain for PartitionFilters)")


if __name__ == "__main__":
    main()
