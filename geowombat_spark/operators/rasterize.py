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
from .extract import encode_cells, sample_polygons


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
        xs = np.concatenate(
            [np.asarray(r)[0::2] for rs in polygons["rings"] for r in rs]
        )
        ys = np.concatenate(
            [np.asarray(r)[1::2] for rs in polygons["rings"] for r in rs]
        )
        window = round_window(
            grid, xs.min(), ys.min(), xs.max(), ys.max(), expand_by=0
        )
    row0, row1, col0, col1 = window

    samples = sample_polygons(
        spark, polygons, grid, all_touched=all_touched, id_column=id_column
    )
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

    nrows, ncols = row1 - row0, col1 - col0
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
