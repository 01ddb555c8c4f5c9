"""``to_netcdf`` / ``open_netcdf`` — NetCDF classic (CDF-2) sink/source.

Reference ``to_netcdf`` (``/root/reference/src/geowombat/core/io.py:562-684``)
funnels the whole DataArray through one xarray/h5netcdf writer on a single
machine. The Spark rewrite keeps the *file format contract* — a genuine
NetCDF classic file (CDF-2, 64-bit offsets), one ``(y, x)`` float64
variable per band plus ``y``/``x`` coordinate variables, ``_FillValue``
and CRS attributes — and replaces the serial writer with the published
**PnetCDF** parallel-write design (Li et al., SC '03: independent
processes write disjoint byte ranges of the classic file at offsets
computed from the header):

* **Driver writes the header once** (O(bands) bytes) and sizes the file;
  every variable's ``begin`` offset is then a pure function of the
  metadata, so no coordination is ever needed again.
* **One shuffle, then embarrassingly parallel.** Cells group by
  full-width row *stripes* (``tile_rows`` rows each). In row-major
  variable layout a stripe is a contiguous byte range of each band
  variable, so each task packs a dense ``(stripe_rows, ncols)`` block and
  ``pwrite``-style writes it at ``begin + first_row * ncols * 8`` —
  disjoint ranges, idempotent under task retry (a rewrite lands the same
  bytes on the same offsets).
* The file materializes as ``<path>.inprogress`` and is atomically
  renamed by the driver after the write action completes — readers never
  observe a torn file.

Like any classic-NetCDF/HDF5 target this assumes a shared POSIX
filesystem (NFS/Lustre — the standard HPC deployment for this format; the
reference's h5netcdf writer needs the same). For object stores, use the
Zarr sink (``sources/zarr_.py``), whose chunk-per-object layout is the
cloud-native equivalent.

Format notes (NetCDF classic format spec, CDF-2 = version byte ``\\x02``,
64-bit ``begin`` offsets): big-endian header ints, names padded to 4
bytes, data section in variable-declaration order, non-record variables
stored contiguously row-major.
"""

from __future__ import annotations

import json
import math
import os
import struct
import warnings

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..grid import GridSpec

NC_DIMENSION, NC_VARIABLE, NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C
NC_CHAR, NC_INT, NC_DOUBLE = 2, 4, 6
_ABSENT = struct.pack(">ii", 0, 0)

_MANIFEST_SCHEMA = "stripe long, row0 long, n_rows int, n_cells long, nbytes long"


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _name(s: str) -> bytes:
    raw = s.encode("utf-8")
    return struct.pack(">i", len(raw)) + _pad4(raw)


def _attr(name: str, value) -> bytes:
    if isinstance(value, str):
        raw = value.encode("utf-8")
        return (
            _name(name)
            + struct.pack(">ii", NC_CHAR, len(raw))
            + _pad4(raw)
        )
    if isinstance(value, int):
        return _name(name) + struct.pack(">iii", NC_INT, 1, value)
    return _name(name) + struct.pack(">iid", NC_DOUBLE, 1, float(value))


def _att_list(attrs: dict) -> bytes:
    if not attrs:
        return _ABSENT
    return struct.pack(">ii", NC_ATTRIBUTE, len(attrs)) + b"".join(
        _attr(k, v) for k, v in attrs.items()
    )


def _build_header(
    grid: GridSpec,
    bands: list[str],
    fill: float,
    global_attrs: dict,
) -> tuple[bytes, dict[str, int], int]:
    """Assemble the CDF-2 header. Returns (header bytes, variable name →
    absolute data begin offset, total file size)."""
    dims = [("y", grid.nrows), ("x", grid.ncols)]
    dim_list = struct.pack(">ii", NC_DIMENSION, len(dims)) + b"".join(
        _name(n) + struct.pack(">i", ln) for n, ln in dims
    )
    gatts = _att_list(global_attrs)

    # (name, dimids, attrs, vsize) in declaration order: coords then bands
    coords_y = np.asarray(
        [grid.top - (r + 0.5) * grid.celly for r in range(grid.nrows)],
        dtype=">f8",
    )
    coords_x = np.asarray(
        [grid.left + (c + 0.5) * grid.cellx for c in range(grid.ncols)],
        dtype=">f8",
    )
    specs = [
        ("y", (0,), {"units": "m"}, grid.nrows * 8),
        ("x", (1,), {"units": "m"}, grid.ncols * 8),
    ] + [
        (b, (0, 1), {"_FillValue": float(fill)}, grid.nrows * grid.ncols * 8)
        for b in bands
    ]
    # CDF-2 permits at most ONE variable over 2^32-4 bytes, and only the
    # LAST one (its vsize becomes the 2^32-1 overflow marker; any earlier
    # oversized variable would make subsequent begin offsets unrepresentable
    # to spec-conforming readers). Guard loudly rather than emit a file
    # third-party readers may reject.
    oversized = [nm for nm, _d, _a, vs in specs if vs >= 2**32 - 4]
    if oversized and (len(oversized) > 1 or oversized[0] != specs[-1][0]):
        raise ValueError(
            f"CDF-2 allows only the last variable to exceed 4 GiB-4; "
            f"oversized here: {oversized} (last variable is "
            f"{specs[-1][0]!r}). Split bands into separate files or use "
            "the Zarr sink (to_zarr) for shapes this large."
        )

    def var_entry(nm, dimids, atts, vsize, begin):
        vs = vsize if vsize < 2**32 - 4 else 2**32 - 1  # spec overflow mark
        return (
            _name(nm)
            + struct.pack(">i", len(dimids))
            + b"".join(struct.pack(">i", d) for d in dimids)
            + _att_list(atts)
            + struct.pack(">iI", NC_DOUBLE, vs)  # vsize unsigned: the
            # spec's 2^32-1 overflow marker doesn't fit a signed int32
            + struct.pack(">q", begin)  # CDF-2: 64-bit begin
        )

    # two passes: sizes depend on the header length, which depends only on
    # metadata (not on begins' values — they're fixed-width), so compute
    # the header length with zero begins first.
    def render(begins):
        var_list = struct.pack(">ii", NC_VARIABLE, len(specs)) + b"".join(
            var_entry(nm, dimids, atts, vsize, begins[nm])
            for nm, dimids, atts, vsize in specs
        )
        return (
            b"CDF\x02" + struct.pack(">i", 0) + dim_list + gatts + var_list
        )

    zero = {nm: 0 for nm, *_ in specs}
    hlen = len(render(zero))
    begins, off = {}, hlen
    for nm, _dimids, _atts, vsize in specs:
        begins[nm] = off
        off += vsize + (-vsize % 4)
    header = render(begins) + coords_y.tobytes() + coords_x.tobytes()
    assert len(header) == begins[bands[0]] if bands else True
    return header, begins, off


def to_netcdf(
    df: DataFrame,
    path: str,
    grid: GridSpec,
    bands: tuple[str, ...] = ("band_blue",),
    fill_value: float | None = None,
    overwrite: bool = False,
    global_attrs: dict | None = None,
) -> DataFrame:
    """Write the cell table ``df`` (``row``, ``col``, ``<bands>``) to a
    classic NetCDF (CDF-2) file at ``path`` via parallel stripe writes.
    Returns the per-stripe write manifest (one row per stripe).

    Cells absent from ``df`` take ``fill_value`` (default ``grid.nodata``).
    """
    if os.path.exists(path) and not overwrite:
        warnings.warn(f"The file {path} already exists.", stacklevel=2)
        return None
    # No unlink on overwrite: the whole write lands in <path>.inprogress
    # and os.replace() below atomically swaps it in, so readers see the
    # OLD complete file for the entire (possibly minutes-long) job window
    # and the new one only when it's whole.
    fill = float(grid.nodata if fill_value is None else fill_value)
    band_list = list(bands)
    attrs = {"crs": grid.crs, "grid": json.dumps(grid.as_dict()),
             "Conventions": "CF-1.6"}
    attrs.update(global_attrs or {})
    header, begins, total = _build_header(grid, band_list, fill, attrs)

    tmp = path + ".inprogress"
    with open(tmp, "wb") as fh:
        fh.write(header)
        fh.truncate(total)

    tr, ncols, nrows = grid.tile_rows, grid.ncols, grid.nrows
    band_begins = {b: begins[b] for b in band_list}

    def write_stripe(pdf: pd.DataFrame) -> pd.DataFrame:
        stripe = int(pdf["_stripe"].iloc[0])
        row0 = stripe * tr
        h = min(tr, nrows - row0)
        rr = pdf["row"].to_numpy(np.int64) - row0
        cc = pdf["col"].to_numpy(np.int64)
        # loud guard: a negative col would WRAP via numpy fancy indexing
        # (silently landing in the wrong cell) and a negative stripe would
        # seek before the variable region and corrupt the header.
        bad = (rr < 0) | (rr >= h) | (cc < 0) | (cc >= ncols)
        if bad.any():
            raise ValueError(
                f"to_netcdf: {int(bad.sum())} cells outside the grid "
                f"(stripe {stripe}, e.g. row="
                f"{int(pdf['row'].to_numpy()[bad.argmax()])}, col="
                f"{int(cc[bad.argmax()])}); clip or subset the input first"
            )
        nbytes = 0
        with open(tmp, "r+b") as fh:
            for b in band_list:
                block = np.full((h, ncols), fill, dtype=">f8")
                block[rr, cc] = pdf[b].to_numpy(np.float64)
                buf = block.tobytes(order="C")
                fh.seek(band_begins[b] + row0 * ncols * 8)
                fh.write(buf)
                nbytes += len(buf)
        return pd.DataFrame(
            [{"stripe": stripe, "row0": row0, "n_rows": h,
              "n_cells": len(pdf), "nbytes": nbytes}]
        )

    keyed = df.select(
        F.col("row").cast("long"), F.col("col").cast("long"), *band_list
    ).withColumn("_stripe", F.expr(f"row div {tr}").cast("long"))
    rows = (
        keyed.groupBy("_stripe")
        .applyInPandas(write_stripe, _MANIFEST_SCHEMA)
        .collect()  # one tiny row per stripe; this action drives the write
    )
    # untouched stripes (no cells) stay at the truncate()'s zero bytes —
    # backfill them with the fill value so the file is spec-complete.
    written = {r.stripe for r in rows}
    with open(tmp, "r+b") as fh:
        for stripe in range(-(-nrows // tr)):
            if stripe in written:
                continue
            row0 = stripe * tr
            h = min(tr, nrows - row0)
            buf = np.full((h, ncols), fill, dtype=">f8").tobytes()
            for b in band_list:
                fh.seek(band_begins[b] + row0 * ncols * 8)
                fh.write(buf)
    os.replace(tmp, path)  # atomic publish
    spark = df.sparkSession
    return spark.createDataFrame(rows, _MANIFEST_SCHEMA)


def _parse_header(path: str):
    """Minimal classic-format header parser (CDF-1 and CDF-2)."""
    with open(path, "rb") as fh:
        raw = fh.read(1 << 20)  # header is tiny for raster layouts
    if raw[:3] != b"CDF" or raw[3] not in (1, 2):
        raise ValueError(f"{path} is not a classic NetCDF file")
    version = raw[3]
    off = 8  # magic + numrecs

    def geti():
        nonlocal off
        v = struct.unpack_from(">i", raw, off)[0]
        off += 4
        return v

    def getname():
        n = geti()
        nonlocal off
        s = raw[off : off + n].decode("utf-8")
        off += n + (-n % 4)
        return s

    def skip_attrs():
        nonlocal off
        tag, n = geti(), geti()
        out = {}
        for _ in range(n):
            nm = getname()
            typ, cnt = geti(), geti()
            size = {1: 1, NC_CHAR: 1, 3: 2, NC_INT: 4, 5: 4, NC_DOUBLE: 8}[typ]
            val = raw[off : off + size * cnt]
            off += size * cnt + (-(size * cnt) % 4)
            if typ == NC_CHAR:
                out[nm] = val.decode("utf-8")
            elif typ == NC_DOUBLE:
                out[nm] = struct.unpack(f">{cnt}d", val)[0] if cnt == 1 else val
            elif typ == NC_INT:
                out[nm] = struct.unpack(f">{cnt}i", val)[0] if cnt == 1 else val
        return out

    tag, ndims = geti(), geti()
    dims = [(getname(), geti()) for _ in range(ndims)]
    gatts = skip_attrs()
    tag, nvars = geti(), geti()
    variables = {}
    for _ in range(nvars):
        nm = getname()
        nd = geti()
        dimids = [geti() for _ in range(nd)]
        atts = skip_attrs()
        typ, vsize = geti(), geti()
        if version == 2:
            begin = struct.unpack_from(">q", raw, off)[0]
            off += 8
        else:
            begin = geti()
        variables[nm] = {
            "dims": [dims[d] for d in dimids],
            "attrs": atts,
            "type": typ,
            "begin": begin,
        }
    return dims, gatts, variables


def open_netcdf(
    spark: SparkSession,
    path: str,
    bands: tuple[str, ...] | None = None,
    drop_fill: bool = True,
) -> DataFrame:
    """Open a classic NetCDF file written by :func:`to_netcdf` as a lazy
    cell table ``(row, col, x, y, <bands>)`` — the inverse stripe reader:
    the driver parses the header once, each task reads its stripes' byte
    ranges. ``drop_fill`` drops cells where every band is the fill value
    (the sparse round-trip inverse)."""
    dims, gatts, variables = _parse_header(path)
    grid = GridSpec(**json.loads(gatts["grid"]))
    use_bands = list(bands) if bands is not None else [
        nm for nm, v in variables.items() if len(v["dims"]) == 2
    ]
    nrows, ncols, tr = grid.nrows, grid.ncols, grid.tile_rows
    begins = {b: variables[b]["begin"] for b in use_bands}
    fills = {
        b: float(variables[b]["attrs"].get("_FillValue", grid.nodata))
        for b in use_bands
    }
    n_stripes = -(-nrows // tr)
    stripes = spark.createDataFrame(
        [(s,) for s in range(n_stripes)], "stripe long"
    ).repartition(min(n_stripes, spark.sparkContext.defaultParallelism))
    out_schema = "row long, col long, " + ", ".join(
        f"{b} double" for b in use_bands
    )

    def read_stripes(it):
        for pdf in it:
            for s in pdf["stripe"]:
                s = int(s)
                row0 = s * tr
                h = min(tr, nrows - row0)
                cols = {}
                with open(path, "rb") as fh:
                    for b in use_bands:
                        fh.seek(begins[b] + row0 * ncols * 8)
                        buf = fh.read(h * ncols * 8)
                        cols[b] = np.frombuffer(buf, dtype=">f8").astype(
                            np.float64
                        )
                rr, cc = np.meshgrid(
                    np.arange(h, dtype=np.int64),
                    np.arange(ncols, dtype=np.int64),
                    indexing="ij",
                )
                out = pd.DataFrame(
                    {"row": rr.reshape(-1) + row0, "col": cc.reshape(-1),
                     **cols}
                )
                if drop_fill:
                    keep = np.zeros(len(out), dtype=bool)
                    for b in use_bands:
                        fv = fills[b]
                        if isinstance(fv, float) and np.isnan(fv):
                            # NaN != NaN elementwise — a plain != would
                            # keep every cell (drop_fill no-op)
                            keep |= ~np.isnan(cols[b])
                        else:
                            keep |= cols[b] != fv
                    out = out[keep]
                if len(out):
                    yield out

    cells = stripes.mapInPandas(read_stripes, out_schema)
    return cells.withColumns(
        {
            "x": F.lit(grid.left)
            + (F.col("col").cast("double") + 0.5) * grid.cellx,
            "y": F.lit(grid.top)
            - (F.col("row").cast("double") + 0.5) * grid.celly,
        }
    )
