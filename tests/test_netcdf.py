"""NetCDF classic (CDF-2) sink/source (sources/netcdf.py vs reference
core/io.py:562-684 to_netcdf)."""

import json
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from geowombat_spark.grid import GridSpec
from geowombat_spark.sources.netcdf import (
    _build_header,
    _parse_header,
    open_netcdf,
    to_netcdf,
)

GRID = GridSpec(
    left=0.0, top=0.0, cellx=10.0, celly=10.0,
    nrows=20, ncols=20, tile_rows=8, tile_cols=8, nodata=0.0,
)


@pytest.fixture()
def cells(spark):
    return spark.range(120).select(
        (F.col("id") % 19).cast("long").alias("row"),
        ((F.col("id") * 7 + 3) % 20).cast("long").alias("col"),
        (1.0 + F.col("id").cast("double")).alias("band_blue"),
        (100.0 + (F.col("id") % 13).cast("double")).alias("band_green"),
    ).dropDuplicates(["row", "col"])


def test_netcdf_roundtrip_exact(spark, cells, tmp_path):
    nc = str(tmp_path / "out.nc")
    man = to_netcdf(cells, nc, GRID, bands=("band_blue", "band_green"))
    assert man.agg(F.sum("n_cells")).first()[0] == cells.count()
    back = open_netcdf(spark, nc)
    got = sorted(
        (r.row, r.col, r.band_blue, r.band_green)
        for r in back.select("row", "col", "band_blue", "band_green").collect()
    )
    want = sorted(
        (r.row, r.col, r.band_blue, r.band_green) for r in cells.collect()
    )
    assert got == want  # raw float64 stripes: lossless


def test_netcdf_header_bytes(spark, cells, tmp_path):
    """The file must decode with nothing but the classic-format spec."""
    nc = str(tmp_path / "h.nc")
    to_netcdf(cells, nc, GRID, bands=("band_blue",))
    raw = open(nc, "rb").read()
    assert raw[:4] == b"CDF\x02"
    assert struct.unpack(">i", raw[4:8])[0] == 0  # numrecs
    dims, gatts, variables = _parse_header(nc)
    assert dims == [("y", 20), ("x", 20)]
    assert gatts["Conventions"] == "CF-1.6"
    assert GridSpec(**json.loads(gatts["grid"])) == GRID
    v = variables["band_blue"]
    assert [d[0] for d in v["dims"]] == ["y", "x"]
    assert v["attrs"]["_FillValue"] == 0.0
    # data lives exactly at begin: spot-read cell (row=0, col=3) which the
    # fixture sets to band_blue=1.0 (id=0)
    begin = v["begin"]
    val = struct.unpack(">d", raw[begin + 3 * 8 : begin + 4 * 8])[0]
    assert val == 1.0
    # coordinate variables hold cell centers
    yb = variables["y"]["begin"]
    y0 = struct.unpack(">d", raw[yb : yb + 8])[0]
    assert y0 == GRID.top - 0.5 * GRID.celly


def test_netcdf_missing_stripes_backfilled(spark, tmp_path):
    """Stripes with no cells must still hold the fill value, not zeros."""
    nc = str(tmp_path / "g.nc")
    grid = GridSpec(left=0, top=0, cellx=1, celly=1,
                    nrows=16, ncols=4, tile_rows=4, tile_cols=4, nodata=-9.0)
    cells = spark.createDataFrame(
        [(0, 0, 5.0), (15, 3, 7.0)], "row long, col long, band_blue double"
    )  # stripes 0 and 3 written; 1 and 2 empty
    to_netcdf(cells, nc, grid, bands=("band_blue",))
    _, _, variables = _parse_header(nc)
    raw = open(nc, "rb").read()
    begin = variables["band_blue"]["begin"]
    arr = np.frombuffer(
        raw[begin : begin + 16 * 4 * 8], dtype=">f8"
    ).reshape(16, 4)
    assert arr[0, 0] == 5.0 and arr[15, 3] == 7.0
    assert (arr[4:12] == -9.0).all()  # empty stripes backfilled
    assert (arr[0, 1:] == -9.0).all()


def test_netcdf_scipy_crosscheck(spark, cells, tmp_path):
    """If scipy is available, its independent netcdf reader must agree."""
    scipy_io = pytest.importorskip("scipy.io")
    nc = str(tmp_path / "x.nc")
    to_netcdf(cells, nc, GRID, bands=("band_blue",))
    f = scipy_io.netcdf_file(nc, "r", mmap=False)
    a = f.variables["band_blue"][:]
    want = {(r.row, r.col): r.band_blue for r in cells.collect()}
    for (rr, cc), v in want.items():
        assert a[rr, cc] == v
    f.close()


def test_netcdf_cdf2_64bit_offsets_engage():
    """Header math at 100-TB-credible sizes, on SPEC-LEGAL layouts.

    (a) eight 2.1 GB bands: cumulative begins pass 2^32, so the CDF-2
    64-bit begin field must engage while every vsize stays a real value;
    (b) one 12.8 GB band as the LAST variable: the spec's 2^32-1 vsize
    overflow marker engages (the only placement CDF-2 allows — see
    test_netcdf_multivar_4gib_guard for the illegal shapes)."""
    big = GridSpec(left=0, top=0, cellx=10, celly=10,
                   nrows=16384, ncols=16384, tile_rows=512, tile_cols=512)
    names = [f"b{i}" for i in range(1, 9)]
    header, begins, total = _build_header(
        big, names, 0.0, {"grid": json.dumps(big.as_dict())}
    )
    vbytes = 16384 * 16384 * 8  # 2.147 GB, under the 4 GiB-4 cap
    assert begins["b2"] - begins["b1"] == vbytes
    assert begins["b4"] > 2**32  # needs the 64-bit begin field
    assert total == begins["b8"] + vbytes

    huge = GridSpec(left=0, top=0, cellx=10, celly=10,
                    nrows=40000, ncols=40000, tile_rows=512, tile_cols=512)
    header, begins, total = _build_header(huge, ["b1"], 0.0, {})
    # the declared vsize field carries the spec's overflow marker
    off = header.find(b"b1\x00\x00") + 4
    ndims = struct.unpack_from(">i", header, off)[0]
    assert ndims == 2
    # field layout after ndims: dimids 8B, attr list (8B header + 40B
    # _FillValue entry... the entry is name 16B + type/nelems 8B + value
    # 8B = 32B), nc_type 4B, then vsize
    vsize = struct.unpack_from(">I", header, off + 4 + 8 + 8 + 32 + 4)[0]
    assert vsize == 2**32 - 1  # the spec's overflow marker
    assert total == begins["b1"] + 40000 * 40000 * 8


def test_netcdf_overwrite_guard(spark, cells, tmp_path):
    nc = str(tmp_path / "w.nc")
    to_netcdf(cells, nc, GRID, bands=("band_blue",))
    with pytest.warns(UserWarning, match="already exists"):
        assert to_netcdf(cells, nc, GRID, bands=("band_blue",)) is None
    man = to_netcdf(cells, nc, GRID, bands=("band_blue",), overwrite=True)
    assert man is not None


def test_gw_open_dispatches_netcdf_and_zarr(spark, cells, tmp_path):
    """gw.open routes .nc files and zarr stores to their readers
    (reference core/api.py NetCDF-aware open)."""
    from geowombat_spark import api as gw

    nc = str(tmp_path / "d.nc")
    store = str(tmp_path / "d.zarr")
    gw.to_netcdf(cells, nc, GRID, bands=("band_blue",))
    gw.to_zarr(cells, store, GRID, bands=("band_blue",))
    want = cells.agg(F.sum("band_blue")).first()[0]
    for p in (nc, store):
        got = gw.open(spark, p).agg(F.sum("band_blue")).first()[0]
        assert got == want


def test_gw_open_bounds_window(spark, cells, tmp_path):
    """open(bounds=...) subsets sources by cell-center coordinates."""
    from geowombat_spark import api as gw

    nc = str(tmp_path / "bw.nc")
    gw.to_netcdf(cells, nc, GRID, bands=("band_blue",))
    # full grid spans x [0,200), y (-200,0]; window = cols 0..9, rows 0..9
    win = gw.open(spark, nc, bounds=(0.0, -100.0, 100.0, 0.0))
    rows = win.select("row", "col").collect()
    assert rows and all(r.row < 10 and r.col < 10 for r in rows)
    full = gw.open(spark, nc)
    want = full.filter("row < 10 and col < 10").count()
    assert len(rows) == want


def test_netcdf_multivar_4gib_guard():
    """CDF-2 permits only the LAST variable to exceed 4 GiB-4; a multi-band
    grid with >4 GiB bands must raise, not emit a spec-invalid file."""
    import pytest

    from geowombat_spark.sources.netcdf import _build_header

    # 23171^2 * 8 bytes ~= 4.295 GB per band (> 2^32-4)
    big = GridSpec(
        left=0.0, top=0.0, cellx=1.0, celly=1.0,
        nrows=23171, ncols=23171, tile_rows=1024, tile_cols=1024,
        nodata=0.0,
    )
    # single oversized band IS the last variable -> legal (overflow marker)
    _h, begins, _t = _build_header(big, ["b0"], 0.0, {})
    assert begins["b0"] > 0
    with pytest.raises(ValueError, match="only the last variable"):
        _build_header(big, ["b0", "b1"], 0.0, {})


def test_netcdf_nan_fill_drop(spark, cells, tmp_path):
    """drop_fill with a NaN fill value must drop the absent cells, not
    no-op through NaN != NaN."""
    p = str(tmp_path / "nan.nc")
    to_netcdf(cells, p, GRID, bands=("band_blue",), fill_value=float("nan"))
    n_cells = cells.count()
    assert open_netcdf(spark, p, drop_fill=True).count() == n_cells
    assert open_netcdf(spark, p, drop_fill=False).count() == 400
