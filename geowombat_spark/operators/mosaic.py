"""Mosaic / concat — multi-source grid-alignment set operations.

Reference: ``/root/reference/src/geowombat/backends/xarray_.py:425-591``
(mosaic: stack + nan-min/max/mean, ``:501-535``) and ``:608-818`` (concat;
duplicate time names mosaicked into one layer first, ``:681-709``).

Spark shape: ``unionByName`` of per-source scans → ``groupBy(cell)`` with
null-skipping aggregates — ``F.min/max/avg`` ignore NULLs natively, an exact
semantic match for the reference's nan-reductions once nodata → NULL.
The groupBy is the single shuffle; partial (map-side) aggregation halves it,
and because every source shares the tile layout, AQE coalesces the result
back to sensible partition counts.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BAND_COLS = ("band_blue", "band_green", "band_red")

_OVERLAP = {"min": F.min, "max": F.max, "mean": F.avg}

KEY_COLS = ("cell_id", "tile_id", "row", "col", "x", "y")


def _nullify(df: DataFrame, nodata: float | None, bands) -> DataFrame:
    """nodata → NULL so aggregates skip it (``set_nodata`` NULL model)."""
    if nodata is None:
        return df
    for b in bands:
        df = df.withColumn(b, F.nullif(F.col(b), F.lit(float(nodata))))
    return df


def mosaic(
    sources: list[DataFrame],
    overlap: str = "max",
    nodata: float | None = 0.0,
    bands: tuple[str, ...] = BAND_COLS,
    key_cols: tuple[str, ...] = KEY_COLS,
) -> DataFrame:
    """Spatial mosaic of N sources; overlapping cells resolved by
    min/max/mean (``xarray_.py:501-535``). ``bounds_by`` union/intersection
    falls out of the join shape: union = the groupBy over the unioned scans
    (cells present in any source), intersection = post-filter on
    ``src_count = N``.
    """
    agg_fn = _OVERLAP[overlap]
    tagged = [
        _nullify(s, nodata, bands).select(*key_cols, *bands) for s in sources
    ]
    u = reduce(lambda a, b: a.unionByName(b), tagged)
    aggs = [agg_fn(b).alias(b) for b in bands]
    aggs.append(F.count(F.lit(1)).alias("src_count"))
    return u.groupBy(*key_cols).agg(*aggs)


def mosaic_intersection(
    sources: list[DataFrame], **kwargs
) -> DataFrame:
    """``bounds_by='intersection'`` (``rasterio_.py:751-755``): keep only
    cells covered by every source."""
    n = len(sources)
    return mosaic(sources, **kwargs).filter(F.col("src_count") == n).drop("src_count")


def concat(
    sources: list[DataFrame],
    time_names: list[str] | None = None,
    overlap: str = "max",
    nodata: float | None = 0.0,
    bands: tuple[str, ...] = BAND_COLS,
    key_cols: tuple[str, ...] = KEY_COLS,
) -> DataFrame:
    """Stack N sources along time (``xarray_.py:608-818``).

    ``time_names`` overrides/assigns the ``t`` column per source; duplicate
    time names are mosaicked into one layer by ``overlap``
    (``xarray_.py:681-709``) via ``groupBy(t, cell)``.
    """
    tagged = []
    for i, s in enumerate(sources):
        s = _nullify(s, nodata, bands)
        if time_names is not None:
            s = s.withColumn("t", F.lit(time_names[i]))
        tagged.append(s.select("t", *key_cols, *bands))
    u = reduce(lambda a, b: a.unionByName(b), tagged)
    # Duplicate time layers mosaic into one (xarray_.py:681-709). With
    # explicit unique time_names the union is provably duplicate-free and
    # the shuffle is skipped; otherwise (time_names=None: sources carry
    # their own t columns the planner cannot inspect without a job) the
    # overlap resolve ALWAYS runs — a no-op agg for disjoint times is one
    # map-side-combined shuffle, silently duplicated (t, cell) rows that
    # double-count in every downstream stat are a correctness bug.
    if time_names is None or len(set(time_names)) < len(time_names):
        agg_fn = _OVERLAP[overlap]
        u = u.groupBy("t", *key_cols).agg(*[agg_fn(b).alias(b) for b in bands])
    return u


def stack_bands(
    sources: list[DataFrame],
    nodata: float | None = 0.0,
    bands: tuple[str, ...] = BAND_COLS,
    key_cols: tuple[str, ...] = KEY_COLS,
) -> DataFrame:
    """``stack_dim='band'`` (``core/api.py:585-612``): band-axis concat.

    Each source contributes its band columns with a 1-based source suffix
    (``band_blue_1``, ``band_blue_2``, … — the columnar form of the
    reference's duplicated band coordinate), joined on the shared cell key
    with a full outer join so the stacked extent is the union of sources
    (NULL bands where a source has no cell). Nodata is nulled per source
    first, like :func:`mosaic`/:func:`concat`."""
    renamed = []
    for i, s in enumerate(sources, start=1):
        s = _nullify(s, nodata, bands).select(*key_cols, *bands)
        for b in bands:
            s = s.withColumnRenamed(b, f"{b}_{i}")
        renamed.append(s)
    out = renamed[0]
    for s in renamed[1:]:
        out = out.join(s, list(key_cols), "full_outer")
    return out


def file_bounds(
    footprints: DataFrame, bounds_by: str = "union", res: float | None = None
) -> tuple[float, float, float, float]:
    """``get_file_bounds`` analogue
    (``src/geowombat/backends/rasterio_.py:667-778``): union/intersection of
    source extents from a footprints table (minx, miny, maxx, maxy per
    source), optionally snapped to ``res`` via ``grid.align_bounds``."""
    if bounds_by == "union":
        aggs = [F.min("minx"), F.min("miny"), F.max("maxx"), F.max("maxy")]
    elif bounds_by == "intersection":
        aggs = [F.max("minx"), F.max("miny"), F.min("maxx"), F.min("maxy")]
    else:
        raise ValueError("bounds_by must be union|intersection")
    minx, miny, maxx, maxy = footprints.agg(*aggs).collect()[0]
    if res is not None:
        from ..grid import align_bounds

        (xres, _z0, left, _z1, nyres, top), width, height = align_bounds(
            minx, miny, maxx, maxy, res
        )
        return (
            float(left),
            float(top + nyres * height),
            float(left + xres * width),
            float(top),
        )
    return float(minx), float(miny), float(maxx), float(maxy)


def grids_equal(a: DataFrame, b: DataFrame) -> bool:
    """``xr.align(join='exact')`` analogue (``xarray_.py:594-605``): stacking
    requires identical grids — here, identical key schemas."""
    ka = [f for f in a.schema.fields if f.name in KEY_COLS]
    kb = [f for f in b.schema.fields if f.name in KEY_COLS]
    return [ (f.name, f.dataType) for f in ka ] == [ (f.name, f.dataType) for f in kb ]
