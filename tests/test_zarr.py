"""Zarr v2 sink/source (sources/zarr_.py vs reference backends/zarr_.py)."""

import json
import os
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from geowombat_spark.grid import GridSpec
from geowombat_spark.sources.zarr_ import open_zarr, to_zarr

GRID = GridSpec(
    left=0.0, top=0.0, cellx=10.0, celly=10.0,
    nrows=20, ncols=20, tile_rows=8, tile_cols=8, nodata=0.0,
)


@pytest.fixture()
def cells(spark):
    """Sparse deterministic cell table on the 20x20 grid (2 bands)."""
    return spark.range(120).select(
        (F.col("id") % 19).cast("long").alias("row"),
        ((F.col("id") * 7 + 3) % 20).cast("long").alias("col"),
        (1.0 + F.col("id").cast("double")).alias("band_blue"),
        (100.0 + (F.col("id") % 13).cast("double")).alias("band_green"),
    ).dropDuplicates(["row", "col"])


def test_zarr_roundtrip_exact(spark, cells, tmp_path):
    store = str(tmp_path / "store.zarr")
    man = to_zarr(cells, store, GRID, bands=("band_blue", "band_green"))
    assert man.agg(F.sum("n_cells")).first()[0] == cells.count()
    back = open_zarr(spark, store)
    got = sorted(
        (r.row, r.col, r.band_blue, r.band_green)
        for r in back.select("row", "col", "band_blue", "band_green").collect()
    )
    want = sorted(
        (r.row, r.col, r.band_blue, r.band_green) for r in cells.collect()
    )
    assert got == want  # exact doubles: zlib is lossless


def test_zarr_on_disk_is_real_zarr_v2(spark, cells, tmp_path):
    """The store must be decodable with nothing but the zarr v2 spec."""
    store = str(tmp_path / "s.zarr")
    to_zarr(cells, store, GRID, bands=("band_blue",))
    assert json.load(open(os.path.join(store, ".zgroup"))) == {
        "zarr_format": 2
    }
    meta = json.load(open(os.path.join(store, "band_blue", ".zarray")))
    assert meta["shape"] == [20, 20]
    assert meta["chunks"] == [8, 8]
    assert meta["dtype"] == "<f8"
    assert meta["compressor"] == {"id": "zlib", "level": 1}
    assert meta["order"] == "C"
    # hand-decode chunk (0, 0) and check one known cell: id=0 -> row 0,
    # col 3, band_blue 1.0
    raw = zlib.decompress(
        open(os.path.join(store, "band_blue", "0.0"), "rb").read()
    )
    block = np.frombuffer(raw, dtype="<f8").reshape(8, 8)
    assert block[0, 3] == 1.0
    # xarray compatibility marker
    zattrs = json.load(
        open(os.path.join(store, "band_blue", ".zattrs"))
    )
    assert zattrs["_ARRAY_DIMENSIONS"] == ["y", "x"]


def test_zarr_edge_chunks_padded_full(spark, cells, tmp_path):
    """Zarr v2 stores edge chunks at full chunk shape (20x20 grid, 8x8
    chunks -> the (2, 2) corner chunk still decompresses to 8*8*8 bytes)."""
    store = str(tmp_path / "e.zarr")
    to_zarr(cells, store, GRID, bands=("band_blue",))
    f = os.path.join(store, "band_blue", "2.2")
    if os.path.exists(f):  # only written if any cell landed there
        raw = zlib.decompress(open(f, "rb").read())
        assert len(raw) == 8 * 8 * 8


def test_zarr_missing_chunk_reads_as_fill(spark, cells, tmp_path):
    store = str(tmp_path / "m.zarr")
    to_zarr(cells, store, GRID, bands=("band_blue", "band_green"))
    # drop one chunk file: those cells read as fill -> absent under
    # drop_fill=True
    victim = os.path.join(store, "band_blue", "0.0")
    n_before = open_zarr(spark, store).count()
    lost = (
        cells.filter((F.col("row") < 8) & (F.col("col") < 8)).count()
    )
    os.unlink(victim)
    os.unlink(os.path.join(store, "band_green", "0.0"))
    assert open_zarr(spark, store).count() == n_before - lost


def test_zarr_uncompressed_and_overwrite_warn(spark, cells, tmp_path):
    store = str(tmp_path / "r.zarr")
    to_zarr(cells, store, GRID, bands=("band_blue",), compress_level=None)
    meta = json.load(open(os.path.join(store, "band_blue", ".zarray")))
    assert meta["compressor"] is None
    assert (
        os.path.getsize(os.path.join(store, "band_blue", "0.0")) == 8 * 8 * 8
    )
    n = open_zarr(spark, store).count()
    assert n == cells.count()
    with pytest.warns(UserWarning, match="already exists"):
        assert to_zarr(cells, store, GRID, bands=("band_blue",)) is None
    to_zarr(cells, store, GRID, bands=("band_blue",), overwrite=True)
    assert open_zarr(spark, store).count() == n


def test_zarr_band_subset_and_coords(spark, cells, tmp_path):
    store = str(tmp_path / "b.zarr")
    to_zarr(cells, store, GRID, bands=("band_blue", "band_green"))
    sub = open_zarr(spark, store, bands=("band_green",))
    assert sub.columns == ["row", "col", "band_green", "x", "y"]
    r = sub.filter((F.col("row") == 0) & (F.col("col") == 3)).first()
    assert r.x == 35.0 and r.y == -5.0  # center coords from the affine


def test_zarr_crashed_publish_recovery(spark, cells, tmp_path):
    """Crash-window recovery for the two-rename overwrite publish.

    Simulates a crash between `final -> .old` and `.inprogress -> final`:
    the next to_zarr (writer) must complete the publish from the intact
    .inprogress store (and warn). open_zarr (reader) must NOT mutate the
    store — a reader renaming .inprogress would race a live writer's own
    second rename — it polls briefly (live publishes finish in ms) then
    raises with recovery instructions."""
    store = str(tmp_path / "c.zarr")
    to_zarr(cells, store, GRID, bands=("band_blue",))
    n = open_zarr(spark, store).count()
    # stage the crash state: final renamed away, new store complete
    os.rename(store, store + ".inprogress")
    import shutil

    shutil.copytree(store + ".inprogress", store + ".old")
    # reader: read-only — raises, store untouched
    with pytest.raises(RuntimeError, match="finish it manually"):
        open_zarr(spark, store)
    assert os.path.exists(store + ".inprogress")
    # writer: repairs the crashed publish and warns
    with pytest.warns(UserWarning, match="crashed overwrite publish"):
        to_zarr(cells, store, GRID, bands=("band_blue",))
    assert open_zarr(spark, store).count() == n
    assert os.path.exists(os.path.join(store, ".zgroup"))
    assert os.path.exists(store + ".old")  # kept for manual inspection
    # leftover .old beside a healthy final store -> warn only
    with pytest.warns(UserWarning, match="retired store"):
        assert open_zarr(spark, store).count() == n
    # .old with NEITHER final nor .inprogress -> loud error with recovery
    os.rename(store, store + ".gone")
    with pytest.raises(RuntimeError, match="restore it with"):
        open_zarr(spark, store)


def test_zarr_out_of_grid_raises_and_nan_fill_drops(spark, cells, tmp_path):
    """Parity with to_netcdf: a cell beyond the grid raises loudly (it
    would otherwise vanish into edge-chunk padding or an unlisted chunk
    file), and drop_fill works for a NaN fill value (NaN != NaN would
    make it a silent no-op)."""
    store = str(tmp_path / "oob.zarr")
    # row=20 is beyond nrows=20 but chunk-locally valid (chunk 2, rr=4)
    bad = cells.unionByName(
        spark.range(1).select(
            F.lit(20).cast("long").alias("row"),
            F.lit(0).cast("long").alias("col"),
            F.lit(5.0).alias("band_blue"),
            F.lit(6.0).alias("band_green"),
        )
    )
    with pytest.raises(Exception, match="outside the 20x20 grid"):
        to_zarr(bad, store, GRID, bands=("band_blue", "band_green"))

    nan_store = str(tmp_path / "nan.zarr")
    to_zarr(
        cells, nan_store, GRID, bands=("band_blue",),
        fill_value=float("nan"),
    )
    n_cells = cells.count()
    got = open_zarr(spark, nan_store, drop_fill=True)
    assert got.count() == n_cells  # not the dense 20x20 = 400
    assert open_zarr(spark, nan_store, drop_fill=False).count() == 400
