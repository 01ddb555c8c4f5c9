"""geowombat_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the query surface of jgrss/geowombat (lazy raster analytics:
extract/clip/mask/mosaic/band-math/focal/temporal over an affine grid) as
idiomatic Spark: DataFrame plans over tile-partitioned document tables,
Z-order cell keys, broadcast/salted joins, Arrow-vectorized pandas UDFs for
the geometry kernels, and a checkpoint-manifest resume path.

See SURVEY.md for the operator-by-operator mapping with reference citations.
"""

from .grid import GridSpec, L8_GRID
from .config import EngineConfig, config

__all__ = ["GridSpec", "L8_GRID", "EngineConfig", "config"]
