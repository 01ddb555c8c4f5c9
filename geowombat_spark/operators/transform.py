"""transform_crs / warp — re-key a raster table onto a different grid.

Reference: ``/root/reference/src/geowombat/backends/rasterio_.py:1087-1284``
(``transform_crs``: ``calculate_default_transform`` + ``reproject``),
``backends/xarray_.py:821-933``, accessor ``core/geoxarray.py:619-679``;
the warp no-op fast path is ``rasterio_.py:981-1004``.

Spark shapes (both single-shuffle, no UDF — the affine relation between two
grids in the same CRS plane is pure Column arithmetic; a true CRS change
adds one pandas-UDF coordinate transform in front, same plan otherwise):

- **nearest** (GDAL inverse mapping): generate the destination cell lattice
  (``spark.range`` — codegen), map each destination center back to the
  source (row, col) with the inverse affine, equi-join the source table.
  Warp IS "extract at the destination lattice centers".
- **average** (aggregating downsample): forward-map every source center to
  its destination cell, ``groupBy(dst_cell).avg(bands)`` — one partial-
  aggregated shuffle.
- identity fast path: if the grids are equal, return the input unchanged
  (the reference's no-op VRT check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..grid import GridSpec


def grids_identical(a: GridSpec, b: GridSpec) -> bool:
    return (
        a.left == b.left
        and a.top == b.top
        and a.cellx == b.cellx
        and a.celly == b.celly
        and a.nrows == b.nrows
        and a.ncols == b.ncols
    )


def transform_grid(
    spark: SparkSession,
    docs: DataFrame,
    src: GridSpec,
    dst: GridSpec,
    bands: tuple[str, ...] = ("band_blue",),
    resampling: str = "nearest",
) -> DataFrame:
    """Re-key ``docs`` (source grid ``src``) onto grid ``dst``.

    Returns (row, col, x, y, <bands>) in destination indexing. ``nearest``
    keeps source values (NULL where the destination looks outside the
    source); ``average`` is the nodata-skipping aggregate (NULL inputs are
    ignored by ``avg`` — the reference's nan-mean).
    """
    if grids_identical(src, dst):
        return docs.select("row", "col", "x", "y", *bands)

    if resampling == "nearest":
        n = dst.nrows * dst.ncols
        lat = spark.range(n).select(
            F.expr(f"id div {dst.ncols}").cast("long").alias("row"),
            (F.col("id") % dst.ncols).cast("long").alias("col"),
        )
        lat = lat.withColumns(
            {
                "x": F.lit(dst.left) + (F.col("col").cast("double") + 0.5) * dst.cellx,
                "y": F.lit(dst.top) - (F.col("row").cast("double") + 0.5) * dst.celly,
            }
        )
        # inverse mapping: destination center → source cell index
        lat = lat.withColumns(
            {
                "_sr": F.floor((F.lit(src.top) - F.col("y")) / src.celly).cast("long"),
                "_sc": F.floor((F.col("x") - F.lit(src.left)) / src.cellx).cast("long"),
            }
        )
        srcside = docs.select(
            F.col("row").alias("_sr"), F.col("col").alias("_sc"), *bands
        )
        return lat.join(srcside, ["_sr", "_sc"], "left").drop("_sr", "_sc")

    if resampling == "average":
        fwd = docs.withColumns(
            {
                "_dr": F.floor((F.lit(dst.top) - F.col("y")) / dst.celly).cast("long"),
                "_dc": F.floor((F.col("x") - F.lit(dst.left)) / dst.cellx).cast("long"),
            }
        ).filter(
            (F.col("_dr") >= 0)
            & (F.col("_dr") < dst.nrows)
            & (F.col("_dc") >= 0)
            & (F.col("_dc") < dst.ncols)
        )
        out = fwd.groupBy(
            F.col("_dr").alias("row"), F.col("_dc").alias("col")
        ).agg(*[F.avg(b).alias(b) for b in bands])
        return out.withColumns(
            {
                "x": F.lit(dst.left) + (F.col("col").cast("double") + 0.5) * dst.cellx,
                "y": F.lit(dst.top) - (F.col("row").cast("double") + 0.5) * dst.celly,
            }
        ).select("row", "col", "x", "y", *bands)

    raise ValueError(f"unknown resampling {resampling!r}")


def match_layout(df: DataFrame, grid: GridSpec, x: str = "x", y: str = "y") -> DataFrame:
    """``match_data`` analogue (``core/geoxarray.py:248-280``): re-key a
    table to another grid's tile/cell layout — re-encode under the target
    affine and repartition on the new tile key so downstream per-tile
    operators (focal, sinks) see the target chunking."""
    from .extract import encode_cells

    clean = df.drop("row", "col", "cell_id", "tile_id")
    return encode_cells(clean, grid, x=x, y=y).repartition(F.col("tile_id"))
