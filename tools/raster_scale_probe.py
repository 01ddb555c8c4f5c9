"""Scale-evidence probe: the geospatial raster operators over a
2048 x 2048 grid — 4,194,304 cells, ~840x the sf0.1 fixture grid —
local[16]. The raster is ANALYTIC (a linear ramp / plane), so every
operator output has an exact closed form and correctness is asserted
cell-by-cell at full scale, not sampled:

- focal mean (5x5, halo exchange across 256 tiles): a symmetric window
  over a linear ramp reproduces the ramp EXACTLY on interior cells.
- focal max (5x5): ramp value + 2*(half width) on interior cells.
- slope/aspect (Zevenbergen-Thorne central differences): a plane has
  constant slope and aspect everywhere in the interior.
- warp average (2x downsample): the mean of a 2x2 ramp block equals the
  ramp at the block center, an exact integer+0.0 closed form.

Asserted as zero-violation counts over all interior cells (one Spark agg
per operator; nothing collected but the counters). The point is the
halo-exchange / inverse-map / central-difference plans hold, exactly, at
multi-million-cell scale."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from geowombat_spark.sources.tables import get_spark
from geowombat_spark.grid import GridSpec
from geowombat_spark.operators.focal import moving
from geowombat_spark.operators.transform import transform_grid
from geowombat_spark.functions.topo import slope_aspect

SIDE = 2048
CELL = 30.0
GRID = GridSpec(
    left=0.0, top=0.0, cellx=CELL, celly=CELL,
    nrows=SIDE, ncols=SIDE, tile_rows=128, tile_cols=128, nodata=-9999.0,
)
DST = GridSpec(
    left=0.0, top=0.0, cellx=2 * CELL, celly=2 * CELL,
    nrows=SIDE // 2, ncols=SIDE // 2, tile_rows=128, tile_cols=128,
    nodata=-9999.0,
)
P, Q, C0 = 0.25, -0.125, 100.0  # plane coefficients (per metre)

spark = get_spark(app="raster-scale", master="local[16]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")

cells = spark.range(SIDE * SIDE).select(
    F.expr(f"id div {SIDE}").cast("long").alias("row"),
    (F.col("id") % SIDE).cast("long").alias("col"),
)
cells = cells.withColumns(
    {
        "cell_id": F.col("row") * SIDE + F.col("col"),
        "x": (F.col("col").cast("double") + 0.5) * CELL,
        "y": -((F.col("row").cast("double") + 0.5) * CELL),
        # linear ramp, strictly positive (no nodata collisions)
        "band": (F.col("row") + F.col("col") + 2).cast("double"),
    }
).withColumn(
    "elev", F.lit(P) * F.col("x") + F.lit(Q) * F.col("y") + F.lit(C0)
).persist()
n_cells = cells.count()
interior = (
    (F.col("row") >= 2) & (F.col("row") < SIDE - 2)
    & (F.col("col") >= 2) & (F.col("col") < SIDE - 2)
)

t0 = time.time()
fm = moving(cells, GRID, stat="mean", w=5, band="band", nodata=None)
bad_mean = fm.filter(
    interior
    & (
        F.abs(F.col("band_mean") - (F.col("row") + F.col("col") + 2))
        > 1e-9
    )
).count()
t1 = time.time()
fx = moving(cells, GRID, stat="max", w=5, band="band", nodata=None)
bad_max = fx.filter(
    interior
    & (F.abs(F.col("band_max") - (F.col("row") + F.col("col") + 6)) > 1e-9)
).count()
t2 = time.time()

# plane slope: dz/dx = P, dz/dy = Q (y decreasing with row cancels in the
# central difference) -> constant interior slope/aspect
import math

want_slope = math.degrees(math.atan(math.hypot(P, Q)))
want_aspect = (math.degrees(math.atan2(-P, -Q)) + 360.0) % 360.0
sa = slope_aspect(cells, GRID, elev="elev")
bad_slope = sa.filter(
    interior
    & (
        (F.abs(F.col("slope") - want_slope) > 1e-6)
        | (F.abs(F.col("aspect") - want_aspect) > 1e-6)
    )
).count()
t3 = time.time()

# 2x average downsample of the ramp: mean{r+c+2 over the 2x2 block at
# (2R..2R+1, 2C..2C+1)} = 2R + 2C + 3
wa = transform_grid(
    spark, cells, GRID, DST, bands=("band",), resampling="average"
)
bad_warp = wa.filter(
    F.abs(F.col("band") - (2 * F.col("row") + 2 * F.col("col") + 3)) > 1e-9
).count()
n_warp = wa.count()
t4 = time.time()

assert bad_mean == 0, f"focal mean violated on {bad_mean} interior cells"
assert bad_max == 0, f"focal max violated on {bad_max} interior cells"
assert bad_slope == 0, f"slope/aspect violated on {bad_slope} interior cells"
assert bad_warp == 0 and n_warp == (SIDE // 2) ** 2, (
    f"warp avg violated on {bad_warp} of {n_warp} cells"
)
print(
    f"RESULT cells={n_cells} tiles={(SIDE // 128) ** 2} "
    f"violations mean=0 max=0 slope=0 warp=0 warp_cells={n_warp} "
    f"walls focal_mean={t1 - t0:.1f}s focal_max={t2 - t1:.1f}s "
    f"slope_aspect={t3 - t2:.1f}s warp_avg={t4 - t3:.1f}s "
    f"total={t4 - t0:.1f}s"
)
spark.stop()
