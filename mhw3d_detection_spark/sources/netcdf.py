"""File-level netCDF ingestion: ``.nc`` -> the engine's long table
(SURVEY.md §2.1 SC1/SC2 — the reference's literal entry point is
``xr.open_dataset("sst.nc")``, reference README.md:51, and
``xr.open_mfdataset`` over a glob, examples/speed_benchmark.ipynb).

Three layers:

- :func:`read_netcdf_long` — the user-facing bridge: one path, a list,
  or a glob; decodes CF conventions (scale/offset, fill values, time
  units) and melts to ``ts(cell_id, time, <coords...>, temp)`` via
  :func:`~mhw3d_detection_spark.sources.ingest.dense_to_long`.
  Multi-file inputs concatenate along time (``open_mfdataset`` parity,
  SC2) after a same-grid check.
- ``distribute=True`` — the 100 TB shape: the FILE LIST becomes the
  DataFrame and each executor task parses its own file (shared-
  filesystem path) and emits long rows through ``mapInPandas``, in
  per-record-batch slabs so task memory is O(grid row), not O(file).
  The driver touches only one header (for the schema).
- the parser itself — a pure-numpy reader for the netCDF CLASSIC
  formats (CDF-1 magic ``CDF\\x01`` and the 64-bit-offset CDF-2
  ``CDF\\x02``), written to the public file-format spec
  (https://docs.unidata.ucar.edu/netcdf-c/current/file_format_specifications.html).
  If ``netCDF4``/``xarray`` are importable they are preferred
  (``engine="auto"``) since they also read netCDF-4/HDF5; the builtin
  parser keeps the bridge WORKING in minimal environments and raises a
  pointed error on HDF5-container files it cannot read.

A deliberately small classic WRITER (:func:`write_netcdf_classic`) is
included for round-trip tests and small-grid export; it is driver-side
by design — the engine's sink layer is parquet (SC4), netCDF files are
an ingestion surface.
"""

from __future__ import annotations

import glob as _glob
import os
import struct
from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# nc_type -> (numpy big-endian dtype, size)
_NC_DTYPES = {
    1: ("i1", 1),   # NC_BYTE
    2: ("S1", 1),   # NC_CHAR
    3: (">i2", 2),  # NC_SHORT
    4: (">i4", 4),  # NC_INT
    5: (">f4", 4),  # NC_FLOAT
    6: (">f8", 8),  # NC_DOUBLE
}
_NC_TAG_DIM = 0x0A
_NC_TAG_VAR = 0x0B
_NC_TAG_ATT = 0x0C
_STREAMING = 0xFFFFFFFF


@dataclass
class _NcVar:
    name: str
    dimids: list[int]
    nc_type: int
    vsize: int
    begin: int
    attrs: dict = field(default_factory=dict)


@dataclass
class _NcHeader:
    version: int                    # 1 = CDF-1, 2 = CDF-2
    numrecs: int
    dim_names: list[str]
    dim_sizes: list[int]            # record dim stored as 0
    rec_dimid: int | None
    gattrs: dict
    variables: dict[str, _NcVar]

    def shape(self, v: _NcVar) -> tuple[int, ...]:
        return tuple(
            self.numrecs if d == self.rec_dimid else self.dim_sizes[d]
            for d in v.dimids
        )

    def is_record(self, v: _NcVar) -> bool:
        return bool(v.dimids) and v.dimids[0] == self.rec_dimid

    def record_stride(self) -> int:
        rec = [v for v in self.variables.values() if self.is_record(v)]
        if len(rec) == 1:
            # single-record-var special case (spec: vsize is padded,
            # but the record stride is the UNPADDED slab size)
            v = rec[0]
            n = 1
            for d in v.dimids[1:]:
                n *= self.dim_sizes[d]
            return n * _NC_DTYPES[v.nc_type][1]
        return sum(v.vsize for v in rec)


class _Parser:
    def __init__(self, data: bytes):
        self.b = data
        self.o = 0

    def i4(self) -> int:
        (v,) = struct.unpack_from(">i", self.b, self.o)
        self.o += 4
        return v

    def u4(self) -> int:
        (v,) = struct.unpack_from(">I", self.b, self.o)
        self.o += 4
        return v

    def i8(self) -> int:
        (v,) = struct.unpack_from(">q", self.b, self.o)
        self.o += 8
        return v

    def name(self) -> str:
        n = self.i4()
        s = self.b[self.o : self.o + n].decode("utf-8")
        self.o += (n + 3) // 4 * 4  # names pad to 4-byte boundary
        return s

    def att_values(self, nc_type: int, nelems: int):
        dt, size = _NC_DTYPES[nc_type]
        raw = self.b[self.o : self.o + nelems * size]
        self.o += (nelems * size + 3) // 4 * 4
        if nc_type == 2:
            return raw.decode("utf-8", errors="replace")
        arr = np.frombuffer(raw, dtype=dt)
        return arr[0].item() if nelems == 1 else arr.tolist()

    def att_list(self) -> dict:
        tag, n = self.i4(), self.i4()
        if tag == 0:  # ABSENT
            return {}
        if tag != _NC_TAG_ATT:
            raise ValueError(f"bad attribute-list tag 0x{tag:x}")
        out = {}
        for _ in range(n):
            nm = self.name()
            t = self.i4()
            ne = self.i4()
            out[nm] = self.att_values(t, ne)
        return out


def _read_header(path: str) -> _NcHeader:
    """Parse a classic-format header. Reads the file head only (64 KiB,
    doubling if a pathological attribute table overruns it)."""
    size = 1 << 16
    while True:
        with open(path, "rb") as f:
            head = f.read(size)
        try:
            return _parse_header(head, path)
        except ValueError:
            # re-raise the parser's own diagnostics (HDF5 magic, bad
            # tags) only when growing the head cannot help
            if size >= os.path.getsize(path):
                raise
            size *= 4
        except (struct.error, IndexError, KeyError):
            # truncation mid-header surfaces as short struct reads,
            # index overruns, OR a garbage nc_type hitting _NC_DTYPES —
            # all retryable until the whole file has been read
            if size >= os.path.getsize(path):
                raise ValueError(f"{path}: truncated/corrupt netCDF header")
            size *= 4


def _parse_header(head: bytes, path: str) -> _NcHeader:
    if head[:4] == b"\x89HDF":
        raise ValueError(
            f"{path} is a netCDF-4/HDF5 file; the builtin reader handles "
            "the classic formats (CDF-1/CDF-2) only — install netCDF4 or "
            "xarray, or convert with `nccopy -k classic`"
        )
    if head[:3] != b"CDF" or head[3] not in (1, 2):
        raise ValueError(f"{path}: not a classic netCDF file")
    version = head[3]
    p = _Parser(head)
    p.o = 4
    numrecs = p.u4()
    if numrecs == _STREAMING:
        numrecs = -1  # resolved from file size below
    tag, ndims = p.i4(), p.i4()
    dim_names: list[str] = []
    dim_sizes: list[int] = []
    rec_dimid: int | None = None
    if tag == _NC_TAG_DIM:
        for i in range(ndims):
            nm = p.name()
            ln = p.i4()
            dim_names.append(nm)
            dim_sizes.append(ln)
            if ln == 0:
                rec_dimid = i
    elif tag != 0:
        raise ValueError(f"{path}: bad dimension-list tag 0x{tag:x}")
    gattrs = p.att_list()
    tag, nvars = p.i4(), p.i4()
    variables: dict[str, _NcVar] = {}
    if tag == _NC_TAG_VAR:
        for _ in range(nvars):
            nm = p.name()
            nd = p.i4()
            dimids = [p.i4() for _ in range(nd)]
            vattrs = p.att_list()
            nc_type = p.i4()
            vsize = p.i4()
            begin = p.i8() if version == 2 else p.u4()
            variables[nm] = _NcVar(nm, dimids, nc_type, vsize, begin, vattrs)
    elif tag != 0:
        raise ValueError(f"{path}: bad variable-list tag 0x{tag:x}")
    hdr = _NcHeader(
        version, numrecs, dim_names, dim_sizes, rec_dimid, gattrs, variables
    )
    if hdr.numrecs < 0:  # STREAMING: infer from the file length
        rec = [v for v in variables.values() if hdr.is_record(v)]
        stride = hdr.record_stride()
        first = min(v.begin for v in rec) if rec else os.path.getsize(path)
        hdr.numrecs = (
            (os.path.getsize(path) - first) // stride if stride else 0
        )
    return hdr


def _read_var_raw(path: str, hdr: _NcHeader, name: str) -> np.ndarray:
    """Read one variable as its stored (big-endian) dtype and shape."""
    v = hdr.variables[name]
    dt, tsize = _NC_DTYPES[v.nc_type]
    shape = hdr.shape(v)
    if not hdr.is_record(v):
        n = int(np.prod(shape)) if shape else 1
        with open(path, "rb") as f:
            f.seek(v.begin)
            arr = np.frombuffer(f.read(n * tsize), dtype=dt, count=n)
        return arr.reshape(shape)
    # record variable: one slab per record at begin + r * stride
    stride = hdr.record_stride()
    per_rec = int(np.prod(shape[1:])) if len(shape) > 1 else 1
    out = np.empty((hdr.numrecs, per_rec), dtype=dt)
    with open(path, "rb") as f:
        for r in range(hdr.numrecs):
            f.seek(v.begin + r * stride)
            out[r] = np.frombuffer(
                f.read(per_rec * tsize), dtype=dt, count=per_rec
            )
    return out.reshape(shape)


def _decode_cf_values(raw: np.ndarray, attrs: dict) -> np.ndarray:
    """CF packing: mask _FillValue/missing_value, apply
    scale_factor/add_offset; always returns float64 with NaN holes."""
    out = raw.astype(np.float64)
    mask = np.zeros(out.shape, dtype=bool)
    for key in ("_FillValue", "missing_value"):
        if key in attrs:
            mask |= raw == np.asarray(attrs[key], dtype=raw.dtype)
    if "scale_factor" in attrs:
        out = out * float(attrs["scale_factor"])
    if "add_offset" in attrs:
        out = out + float(attrs["add_offset"])
    out[mask] = np.nan
    return out


_TIME_UNITS = {
    "seconds": "s", "second": "s", "secs": "s", "sec": "s", "s": "s",
    "minutes": "m", "minute": "m", "mins": "m", "min": "m",
    "hours": "h", "hour": "h", "hrs": "h", "hr": "h", "h": "h",
    "days": "D", "day": "D", "d": "D",
}


def decode_cf_time(values: np.ndarray, attrs: dict) -> pd.DatetimeIndex:
    """Decode a CF time coordinate (``"<unit> since <epoch>"``) on the
    standard/proleptic-Gregorian calendar. Non-standard model calendars
    (360_day, noleap) are ingestion-side rejects here — the engine's
    360-day support is the M3 date-free DOY path
    (queries/mhw.py q_clim_360day), which takes integer day indexes."""
    cal = str(attrs.get("calendar", "standard")).lower()
    if cal not in ("standard", "gregorian", "proleptic_gregorian"):
        raise ValueError(
            f"calendar {cal!r} needs the date-free DOY path (M3), "
            "not timestamp ingestion"
        )
    units = attrs.get("units")
    if not units or " since " not in units:
        raise ValueError(f"un-decodable CF time units: {units!r}")
    unit, epoch = (s.strip() for s in units.split(" since ", 1))
    code = _TIME_UNITS.get(unit.lower())
    if code is None:
        raise ValueError(f"unsupported CF time unit {unit!r}")
    base = pd.Timestamp(epoch)
    if base.tzinfo is not None:
        base = base.tz_convert("UTC").tz_localize(None)
    vals = np.asarray(values, dtype=np.float64)
    if code == "D":  # float days keep sub-day precision
        deltas = pd.to_timedelta(vals * 86400.0, unit="s")
    else:
        deltas = pd.to_timedelta(vals, unit=code)
    return pd.DatetimeIndex(base + deltas)


def _pick_var(hdr: _NcHeader, var: str | None) -> str:
    if var is not None:
        if var not in hdr.variables:
            raise KeyError(f"variable {var!r} not in file")
        return var
    # heuristic parity with the reference's `ds.sst`-style access:
    # the unique multi-dim non-coordinate variable
    cands = [
        n
        for n, v in hdr.variables.items()
        if len(v.dimids) >= 2 and n not in hdr.dim_names
    ]
    if len(cands) != 1:
        raise ValueError(
            f"cannot infer the data variable (candidates {cands}); pass var="
        )
    return cands[0]


def read_netcdf_file(
    path: str, var: str | None = None, *, time_name: str | None = None
) -> tuple[np.ndarray, pd.DatetimeIndex, dict[str, np.ndarray]]:
    """Read ONE classic netCDF file into ``(cube, times, coords)`` —
    the exact inputs of :func:`~.ingest.dense_to_long`. The data var's
    leading dim must be time; each other dim contributes its 1-D
    coordinate variable (or an index range if the file has none)."""
    hdr = _read_header(path)
    name = _pick_var(hdr, var)
    v = hdr.variables[name]
    dims = [hdr.dim_names[d] for d in v.dimids]
    tname = time_name or (
        "time" if "time" in dims else dims[0]
    )
    if dims[0] != tname:
        raise ValueError(
            f"{name} dims {dims}: time ({tname!r}) must be the leading axis"
        )
    cube = _decode_cf_values(_read_var_raw(path, hdr, name), v.attrs)
    if tname in hdr.variables:
        tvar = hdr.variables[tname]
        times = decode_cf_time(
            _read_var_raw(path, hdr, tname).astype(np.float64), tvar.attrs
        )
    else:
        raise ValueError(f"{path}: no {tname!r} coordinate variable")
    coords: dict[str, np.ndarray] = {}
    for i, d in enumerate(dims[1:], start=1):
        if d in hdr.variables and len(hdr.variables[d].dimids) == 1:
            coords[d] = _read_var_raw(path, hdr, d).astype(np.float64)
        else:
            coords[d] = np.arange(cube.shape[i], dtype=np.float64)
    return cube, times, coords


def _expand_paths(paths: str | list[str]) -> list[str]:
    pats = [paths] if isinstance(paths, str) else list(paths)
    out: list[str] = []
    for p in pats:
        hits = sorted(_glob.glob(p)) if any(c in p for c in "*?[") else [p]
        if not hits:
            raise FileNotFoundError(f"no files match {p!r}")
        out.extend(hits)
    return out


def read_netcdf_long(
    spark: SparkSession,
    paths: str | list[str],
    var: str | None = None,
    *,
    value_col: str = "temp",
    time_name: str | None = None,
    engine: str = "auto",
    distribute: bool = False,
    block_cells: int = 4096,
) -> DataFrame:
    """`.nc file(s)` -> ``ts(cell_id, time, <coords...>, temp)``.

    The reference parity surface: ``read_netcdf_long(spark, "sst.nc")``
    is its ``xr.open_dataset("sst.nc")`` (README.md:51) followed by the
    melt; a glob or list is ``open_mfdataset`` (SC2,
    speed_benchmark.ipynb) — files sort lexically and concatenate along
    time, after a same-spatial-grid check. ``engine="auto"`` prefers
    xarray/netCDF4 when installed (adds netCDF-4/HDF5 support),
    otherwise the builtin pure-numpy classic reader; ``"builtin"``
    forces the latter.

    ``distribute=True`` is the fleet shape: the file list becomes a
    one-path-per-task DataFrame and every executor parses its own file
    (shared filesystem / fuse mount), emitting long rows in per-time-
    step slabs — driver memory stays O(header), cluster parallelism =
    number of files. Use it when the file SET is big; the default
    driver-side path is right for the single-file notebook workflow.
    """
    files = _expand_paths(paths)
    reader = _resolve_reader(engine)
    if not distribute:
        out: DataFrame | None = None
        grid0: tuple | None = None
        from mhw3d_detection_spark.sources.ingest import dense_to_long

        for p in files:
            cube, times, coords = reader(p, var, time_name=time_name)
            # FULL-array grid signature: same names, shapes AND every
            # coordinate value — first-value-only would silently accept
            # same-origin grids with different spacing and corrupt
            # cell_id → location mapping
            grid = tuple(
                (k, v.shape, v.tobytes()) for k, v in coords.items()
            )
            if grid0 is None:
                grid0 = grid
            elif grid != grid0:
                raise ValueError(
                    f"{p}: spatial grid differs from {files[0]} — "
                    "multi-file concat is along time on ONE grid"
                )
            part = dense_to_long(
                spark, cube, times, coords,
                value_col=value_col, block_cells=block_cells,
            )
            out = part if out is None else out.unionByName(part)
        assert out is not None
        return out

    # distributed: schema from ONE header, data read executor-side;
    # the reference coord ARRAYS ride the task closure so every file
    # is grid-checked where it is read (same contract as the driver
    # path — names alone would silently union different grids)
    cube0, _, coords0 = reader(files[0], var, time_name=time_name)
    coord_names = list(coords0)
    ref_coords = {k: np.asarray(v) for k, v in coords0.items()}
    schema = (
        "cell_id long, time timestamp, "
        + ", ".join(f"{c} double" for c in coord_names)
        + f", {value_col} double"
    )
    pathdf = spark.createDataFrame(
        [(p,) for p in files], "path string"
    ).repartition(len(files))

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["path"]:
                cube, times, coords = reader(p, var, time_name=time_name)
                if list(coords) != coord_names or any(
                    not np.array_equal(coords[c], ref_coords[c])
                    for c in coord_names
                ):
                    raise ValueError(
                        f"{p}: spatial grid differs from {files[0]} — "
                        "multi-file concat is along time on ONE grid"
                    )
                n_cells = int(np.prod(cube.shape[1:]))
                flat = cube.reshape(len(times), n_cells)
                grids = np.meshgrid(*coords.values(), indexing="ij")
                flat_coords = [g.reshape(n_cells) for g in grids]
                # one slab per time step: task memory = one grid row
                for ti in range(len(times)):
                    d = {
                        "cell_id": np.arange(n_cells, dtype=np.int64),
                        "time": np.full(n_cells, times.values[ti]),
                    }
                    for c, g in zip(coord_names, flat_coords):
                        d[c] = g
                    d[value_col] = flat[ti]
                    yield pd.DataFrame(d)

    return pathdf.mapInPandas(emit, schema)


def _resolve_reader(engine: str):
    if engine not in ("auto", "builtin", "netcdf4", "xarray"):
        raise ValueError(f"unknown engine {engine!r}")
    if engine in ("auto", "xarray", "netcdf4"):
        try:
            import xarray as xr  # noqa: F401

            def _xr_reader(path, var, *, time_name=None):
                ds = xr.open_dataset(path)
                name = var or _pick_var_xr(ds)
                da = ds[name]
                tname = time_name or da.dims[0]
                cube = da.values.astype(np.float64)
                times = pd.DatetimeIndex(ds[tname].values)
                coords = {
                    str(d): np.asarray(ds[d].values, dtype=np.float64)
                    for d in da.dims[1:]
                }
                return cube, times, coords

            def _pick_var_xr(ds):
                cands = [n for n, v in ds.data_vars.items() if v.ndim >= 2]
                if len(cands) != 1:
                    raise ValueError(f"pass var= (candidates {cands})")
                return cands[0]

            return _xr_reader
        except ImportError:
            if engine in ("xarray", "netcdf4"):
                raise
    return read_netcdf_file


# ------------------------------------------------------------------
# minimal classic writer (round-trip tests + small-grid export)
# ------------------------------------------------------------------
def write_netcdf_classic(
    path: str,
    dims: dict[str, int | None],
    variables: dict[str, tuple[list[str], np.ndarray, dict]],
    *,
    version: int = 1,
) -> None:
    """Write a CDF-1/CDF-2 classic file. ``dims`` maps name -> length
    (None = the record/unlimited dim, at most one); ``variables`` maps
    name -> (dim-name list, array, attrs). Driver-side, small grids —
    the engine's distributed sink layer is parquet (SC4)."""
    dim_names = list(dims)
    rec_name = next((k for k, v in dims.items() if v is None), None)
    numrecs = 0
    for name, (vdims, arr, _a) in variables.items():
        if vdims and vdims[0] == rec_name:
            numrecs = max(numrecs, np.asarray(arr).shape[0])

    def _coerce(arr) -> np.ndarray:
        # numpy's DEFAULT integer dtype (np.arange, Python int attrs
        # via np.asarray) is int64, which the classic format cannot
        # store — downcast losslessly to NC_INT when every value fits
        a = np.asarray(arr)
        if a.dtype.kind == "i" and a.dtype.itemsize == 8:
            if a.size == 0 or (
                int(a.min()) >= -(2**31) and int(a.max()) < 2**31
            ):
                return a.astype(np.int32)
        return a

    def _nc_type(arr: np.ndarray) -> int:
        a = np.asarray(arr)
        k = a.dtype.kind + str(a.dtype.itemsize)
        try:
            return {"i1": 1, "i2": 3, "i4": 4, "f4": 5, "f8": 6}[k]
        except KeyError:
            raise ValueError(
                f"write_netcdf_classic: dtype {a.dtype} has no classic-"
                "format type — supported: int8/int16/int32/float32/"
                "float64 (int64 values that fit int32 are downcast "
                "automatically; strings only as attribute values)"
            ) from None

    def _pad(b: bytes) -> bytes:
        return b + b"\x00" * (-len(b) % 4)

    def _name(s: str) -> bytes:
        e = s.encode()
        return struct.pack(">i", len(e)) + _pad(e)

    def _att_block(attrs: dict) -> bytes:
        if not attrs:
            return struct.pack(">ii", 0, 0)
        out = struct.pack(">ii", _NC_TAG_ATT, len(attrs))
        for k, v in attrs.items():
            out += _name(k)
            if isinstance(v, str):
                e = v.encode()
                out += struct.pack(">ii", 2, len(e)) + _pad(e)
            else:
                a = _coerce(v)
                t = _nc_type(a)
                dt, _sz = _NC_DTYPES[t]
                out += struct.pack(">ii", t, a.size)
                out += _pad(a.astype(dt).tobytes())
        return out

    # lay out variables: fixed first (any order ok), then record vars
    fixed = {n: v for n, v in variables.items() if v[0][:1] != [rec_name]}
    record = {n: v for n, v in variables.items() if n not in fixed}
    order = list(fixed) + list(record)

    header = b"CDF" + bytes([version]) + struct.pack(">I", numrecs)
    header += struct.pack(">ii", _NC_TAG_DIM, len(dim_names))
    for d in dim_names:
        header += _name(d) + struct.pack(">i", dims[d] or 0)
    header += struct.pack(">ii", 0, 0)  # no global attrs
    header += struct.pack(">ii", _NC_TAG_VAR, len(order))

    # two passes: sizes first, then begins
    metas = {}
    for n in order:
        vdims, arr, attrs = variables[n]
        a = _coerce(arr)
        t = _nc_type(a)
        _dt, sz = _NC_DTYPES[t]
        per = 1
        for d in vdims:
            if d != rec_name:
                per *= dims[d]  # type: ignore[operator]
        raw = per * sz
        vsize = (raw + 3) // 4 * 4
        metas[n] = (vdims, a, attrs, t, raw, vsize)

    def var_entry(n: str, begin: int) -> bytes:
        vdims, _a, attrs, t, _raw, vsize = metas[n]
        e = _name(n) + struct.pack(">i", len(vdims))
        for d in vdims:
            e += struct.pack(">i", dim_names.index(d))
        e += _att_block(attrs)
        e += struct.pack(">ii", t, vsize)
        e += struct.pack(">q" if version == 2 else ">I", begin)
        return e

    hlen = len(header) + sum(len(var_entry(n, 0)) for n in order)
    begins = {}
    off = hlen
    for n in fixed:
        begins[n] = off
        off += metas[n][5]
    rec_start = off
    single_rec = len(record) == 1
    stride = (
        metas[next(iter(record))][4]
        if single_rec
        else sum(metas[n][5] for n in record)
    ) if record else 0
    for n in record:
        begins[n] = off
        off += metas[n][4] if single_rec else metas[n][5]

    body = bytearray()
    for n in order:
        header += var_entry(n, begins[n])
    for n in fixed:
        _vd, a, _at, t, raw, vsize = metas[n]
        b = a.astype(_NC_DTYPES[t][0]).tobytes()
        body += b + b"\x00" * (vsize - raw)
    if record:
        recbuf = bytearray(numrecs * stride)
        for n in record:
            _vd, a, _at, t, raw, vsize = metas[n]
            base = begins[n] - rec_start
            for r in range(numrecs):
                # np.asarray: a[r] of a 1-D var is a numpy SCALAR, and
                # scalar .astype silently drops the big-endian order
                slab = np.asarray(a[r]).astype(_NC_DTYPES[t][0]).tobytes()
                recbuf[base + r * stride : base + r * stride + raw] = slab
        body += recbuf
    with open(path, "wb") as f:
        f.write(header + bytes(body))
