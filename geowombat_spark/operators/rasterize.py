"""polygon_to_array — rasterize polygons onto a reference grid.

Reference: ``/root/reference/src/geowombat/core/conversion.py:570-833``
(burn value 1 or from an attribute column; later features overwrite earlier,
GDAL ``features.rasterize`` semantics; ``all_touched`` toggles
center-containment vs cell-intersects).

Spark shape: per-polygon cover cells from the ray-cast PIP kernel
(``applyInPandas``, one vectorized kernel per polygon) → burn-value map
(broadcast) → ``max_by(burn, feature_order)`` resolves overlaps exactly like
GDAL's later-feature-wins → right join onto the window's cell lattice
(generated with ``spark.range`` — pure codegen) with ``fill`` elsewhere.
The lattice join is an equi-join on (row, col); at 100 TB the window is
tile-pruned and the burned side is small → broadcast."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..grid import GridSpec, round_window
from .extract import encode_cells, in_bounds_col, sample_polygons


def polygon_to_array(
    spark: SparkSession,
    polygons: pd.DataFrame,
    grid: GridSpec,
    col: str | None = None,
    fill: float = 0.0,
    default_value: float = 1.0,
    all_touched: bool = False,
    window: tuple[int, int, int, int] | None = None,
    id_column: str = "fid",
) -> DataFrame:
    """Burn polygons onto the grid; returns (row, col, x, y, value) over the
    window (defaults to the polygons' grid-aligned total bounds).

    ``col`` selects a per-feature burn value column, else ``default_value``
    (``conversion.py:570-833``). Feature order resolves overlaps: the last
    feature in ``polygons`` wins (GDAL rasterize parity).
    """
    if window is None:
        from .sops import _total_bounds

        minx, miny, maxx, maxy = _total_bounds(polygons)
        window = round_window(grid, minx, miny, maxx, maxy, expand_by=0)
    row0, row1, col0, col1 = window
    nrows, ncols = max(0, row1 - row0), max(0, col1 - col0)
    if nrows == 0 or ncols == 0:
        # bbox entirely off-grid: round_window clamps each bound
        # independently, so row1 < row0 (or col1 < col0) here — a raw
        # nrows*ncols product would be positive again and `id % ncols`
        # with a negative ncols would fabricate out-of-grid lattice rows
        return spark.createDataFrame(
            [], "row long, col long, x double, y double, value double"
        )

    samples = sample_polygons(
        spark, polygons, grid, all_touched=all_touched, id_column=id_column
    )
    # DROP sample centers outside the grid BEFORE encoding (same contract
    # as extract_polygons, reference sops.py:836-844): encode_cells clamps
    # out-of-grid centers onto border cells, so a polygon arm overhanging
    # the grid would otherwise burn the border cells it snaps onto —
    # GDAL rasterize leaves those cells at fill
    samples = samples.filter(in_bounds_col(grid))
    enc = encode_cells(samples, grid).select(id_column, "row", "col")

    burn = polygons[[id_column]].copy()
    burn["burn"] = (
        polygons[col].astype(float) if col else float(default_value)
    )
    burn["ord"] = np.arange(len(polygons), dtype=np.int64)
    burn_df = spark.createDataFrame(burn)

    burned = (
        enc.join(F.broadcast(burn_df), id_column)
        .groupBy("row", "col")
        .agg(F.max_by("burn", "ord").alias("value"))
    )

    cells = (
        spark.range(nrows * ncols)
        .select(
            (F.lit(row0) + F.expr(f"id div {ncols}")).cast("long").alias("row"),
            (F.lit(col0) + F.col("id") % ncols).cast("long").alias("col"),
        )
        .withColumns(
            {
                "x": F.lit(grid.left)
                + (F.col("col").cast("double") + 0.5) * grid.cellx,
                "y": F.lit(grid.top)
                - (F.col("row").cast("double") + 0.5) * grid.celly,
            }
        )
    )
    out = cells.join(F.broadcast(burned), ["row", "col"], "left")
    return out.withColumn("value", F.coalesce(F.col("value"), F.lit(float(fill))))
