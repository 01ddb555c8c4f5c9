"""``to_vrt`` / ``open_vrt`` — a persisted *virtual* (lazy) warped view.

Reference ``gw.to_vrt`` (``/root/reference/src/geowombat/core/io.py:455-559``)
writes a GDAL VRT: a small file describing a source raster, a target grid,
a band selection, a resampling method, and a nodata value — no pixels are
materialized; opening the VRT replays the warp lazily.

The Spark analogue keeps exactly those semantics: ``to_vrt`` writes a JSON
descriptor next to nothing but itself; ``open_vrt`` rebuilds the *logical
plan* — scan → band selection → (optional) grid re-key via
``transform_grid`` — and returns the lazy DataFrame. Nothing is computed
until an action runs, and Catalyst pushes any downstream filter/pruning
into the descriptor's source scan, which is the whole point of a VRT at
100 TB: the view costs nothing to create and optimizes like the query it
feeds.
"""

from __future__ import annotations

import json
import os
import warnings

from pyspark.sql import DataFrame, SparkSession

from ..grid import GridSpec

VRT_VERSION = 1


def to_vrt(
    source: str,
    filename: str,
    src_grid: GridSpec,
    dst_grid: GridSpec | None = None,
    bands: tuple[str, ...] = ("band_blue",),
    resampling: str = "nearest",
    nodata: float | None = None,
    overwrite: bool = False,
) -> dict | None:
    """Write a VRT descriptor for ``source`` (a tiled-parquet corpus path).

    Mirrors ``io.py:455-505``: existing file + ``overwrite=False`` warns and
    returns without writing; default resampling is nearest.
    """
    if os.path.exists(filename):
        if overwrite:
            os.unlink(filename)
        else:
            warnings.warn(
                f"The VRT file {filename} already exists.", stacklevel=2
            )
            return None
    desc = {
        "vrt_version": VRT_VERSION,
        "source": source,
        "bands": list(bands),
        "src_grid": src_grid.as_dict(),
        "dst_grid": (dst_grid or src_grid).as_dict(),
        "resampling": resampling,
        "nodata": nodata,
    }
    with open(filename, "w") as fh:
        json.dump(desc, fh, indent=2)
    return desc


def open_vrt(spark: SparkSession, filename: str) -> DataFrame:
    """Open a VRT descriptor as a lazy DataFrame (the warp replays in the
    plan; identical grids short-circuit to the bare scan — the reference's
    no-op VRT fast path, ``backends/rasterio_.py:981-1004``)."""
    from ..functions.nodata import set_nodata
    from ..operators.transform import transform_grid

    with open(filename) as fh:
        desc = json.load(fh)
    if desc.get("vrt_version") != VRT_VERSION:
        raise ValueError(f"unsupported VRT version in {filename}")
    df = spark.read.option("basePath", desc["source"]).parquet(desc["source"])
    src = GridSpec(**desc["src_grid"])
    dst = GridSpec(**desc["dst_grid"])
    bands = tuple(desc["bands"])
    out = transform_grid(
        spark, df, src, dst, bands=bands, resampling=desc["resampling"]
    )
    if desc.get("nodata") is not None:
        out = set_nodata(out, bands, src_nodata=desc["nodata"])
    return out
