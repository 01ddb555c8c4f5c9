"""gw.extract — the flagship raster↔vector join, Spark-first.

Reference pipeline (``/root/reference/src/geowombat/core/sops.py:689-909``):
AOI prep (reproject/clip, ``conversion.py:338-436``) → ``coords_to_indices``
→ clamp (``sops.py:836-844``) → fancy-gather → band columns (multi-time
columns named ``f'{t}_{b}'``, ``sops.py:872-907``).

Spark shape: encode AOI coords → ``cell_id`` (driver-side numpy when the AOI
is small/driver-resident, Arrow pandas UDF when it is a DataFrame) →
**tile-pruned scan** of the documents table → broadcast equi-join on
``cell_id`` → pivot bands over time. The join is the only shuffle, and with
a broadcast AOI there is none at all: at 100 TB the plan is
scan(pruned tiles) → broadcast-hash-join → partial agg.

Polygon extract replicates ``sample_feature``
(``src/geowombat/core/util.py:472-573``): polygon-local grid, rasterize-by-
center parity via ray-cast PIP, row-major sample order — run per polygon in
``applyInPandas`` so each polygon's sampling is one vectorized numpy kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..grid import (
    GridSpec,
    coords_to_rowcol,
    polygon_sample_centers,
    zorder_encode,
)

BAND_COLS = ("band_blue", "band_green", "band_red")


def _band_col(name: str) -> str:
    return f"band_{name}" if not name.startswith("band_") else name


def in_bounds_mask(x, y, grid: GridSpec) -> np.ndarray:
    """Boolean mask of points inside the grid extent — the ONE in-grid
    predicate (half-open right/bottom edges) shared by prepare_points,
    extract_points, and the Column twin :func:`in_bounds_col`; a boundary
    semantics change lands everywhere at once."""
    return (
        (x >= grid.left) & (x < grid.right) & (y <= grid.top) & (y > grid.bottom)
    )


def in_bounds_col(grid: GridSpec, x: str = "x", y: str = "y") -> F.Column:
    """Column twin of :func:`in_bounds_mask` for DataFrame filters."""
    return (
        (F.col(x) >= grid.left)
        & (F.col(x) < grid.right)
        & (F.col(y) <= grid.top)
        & (F.col(y) > grid.bottom)
    )


def _pdf_to_sdf(spark: SparkSession, pdf: pd.DataFrame):
    """createDataFrame that survives an EMPTY pandas frame: Spark cannot
    infer a type for an empty object column (an all-out-of-grid AOI with a
    string attribute crashed here; the reference returns an empty frame,
    ``sops.py:836-844``), so the schema is built explicitly from the
    pandas dtypes (object → string)."""
    if len(pdf):
        return spark.createDataFrame(pdf)
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    kinds = {
        "i": LongType(), "u": LongType(), "f": DoubleType(),
        "b": BooleanType(), "M": TimestampType(),
    }
    fields = [
        StructField(c, kinds.get(pdf[c].dtype.kind, StringType()), True)
        for c in pdf.columns
    ]
    return spark.createDataFrame([], StructType(fields))


def prepare_points(
    aoi: pd.DataFrame,
    grid: GridSpec,
    aoi_epsg: int | None = None,
    mask_rings: list | None = None,
    id_column: str = "id",
) -> pd.DataFrame:
    """AOI normalization (``conversion.py:338-436`` parity): ensure an id
    column, reproject to the raster frame (``:369-374``), clip to the image
    bounds (points: ``intersects`` filter, ``:395-397``), optional
    ``within(mask)`` PIP filter (``:399-413``), reindex (``:432-435``).

    ``aoi_epsg`` names the AOI frame when it differs from ``grid.crs``
    (supported frames: EPSG:4326 and UTM zones — ``crs.reproject_points``).
    """
    from ..crs import reproject_points
    from ..grid import point_in_rings

    out = aoi.copy().reset_index(drop=True)
    if id_column not in out.columns:
        out[id_column] = np.arange(len(out), dtype=np.int64)
    grid_epsg = int(str(grid.crs).split(":")[-1])
    if aoi_epsg is not None and aoi_epsg != grid_epsg:
        x, y = reproject_points(
            out["x"].values, out["y"].values, aoi_epsg, grid_epsg
        )
        out["x"], out["y"] = x, y
    out = out[in_bounds_mask(out["x"].values, out["y"].values, grid)]
    if mask_rings is not None:
        rings = [np.asarray(r, dtype=np.float64) for r in mask_rings]
        keep = point_in_rings(out["x"].values, out["y"].values, rings)
        out = out[keep]
    return out.reset_index(drop=True)


def encode_points_pdf(aoi: pd.DataFrame, grid: GridSpec) -> pd.DataFrame:
    """Driver-side cell encoding for a small AOI (the reference's AOI is
    always driver-resident — ``prepare_points`` returns a GeoDataFrame)."""
    out = aoi.copy()
    row, col = coords_to_rowcol(grid, out["x"].values, out["y"].values, clamp=True)
    out["row"], out["col"] = row, col
    out["cell_id"] = zorder_encode(row, col)
    out["tile_id"] = grid.tile_id(row, col)
    return out


def encode_cells(df: DataFrame, grid: GridSpec, x: str = "x", y: str = "y") -> DataFrame:
    """Executor-side cell encoding: one Arrow-batched pandas UDF, pure numpy
    inside (``conversion.py:164-203`` semantics incl. truncation + clamp).
    Use this when the AOI side is itself a big DataFrame."""
    g = grid.as_dict()

    @F.pandas_udf("struct<row:bigint,col:bigint,cell_id:bigint,tile_id:bigint>")
    def _enc(xs: pd.Series, ys: pd.Series) -> pd.DataFrame:
        gs = GridSpec(**g)
        r, c = coords_to_rowcol(gs, xs.values, ys.values, clamp=True)
        return pd.DataFrame(
            {
                "row": r,
                "col": c,
                "cell_id": zorder_encode(r, c),
                "tile_id": gs.tile_id(r, c),
            }
        )

    return (
        df.withColumn("_cell", _enc(F.col(x), F.col(y)))
        .withColumns(
            {
                "row": F.col("_cell.row"),
                "col": F.col("_cell.col"),
                "cell_id": F.col("_cell.cell_id"),
                "tile_id": F.col("_cell.tile_id"),
            }
        )
        .drop("_cell")
    )


def _prune_tiles(docs: DataFrame, tile_ids) -> DataFrame:
    """Partition pruning: tile_id is the dataset partition column, so this
    predicate skips whole directories/files before any IO."""
    tile_ids = sorted(set(int(t) for t in tile_ids))
    return docs.filter(F.col("tile_id").isin(tile_ids))


def extract_points(
    spark: SparkSession,
    docs: DataFrame,
    aoi: pd.DataFrame,
    grid: GridSpec,
    bands: list[str] = ("blue", "green", "red"),
    time_names: list[str] | None = None,
    id_column: str = "id",
    keep_doc_columns: list[str] = (),
    ordered: bool = True,
) -> DataFrame:
    """Sample band values at AOI points.

    Returns one row per AOI point, band columns named like the reference:
    ``blue`` for a single time, ``t1_blue``/``t2_blue``… for stacks
    (``sops.py:872-907``).

    ``ordered=True`` returns rows in AOI order (reference parity). Note the
    cost: a global ``orderBy`` uses range partitioning, whose sampling pass
    *recomputes the join input* — i.e. the corpus scan runs twice. Pass
    ``ordered=False`` in throughput-critical pipelines (any consumer that
    aggregates or re-sorts anyway).

    With ``time_names=None`` on a time-stacked input, time labels are
    inferred from the UNPRUNED input's distinct ``t`` keys — a
    single-column scan (column-pruned parquet reads just the ``t``
    chunks) that keeps the output schema independent of the AOI: an AOI
    whose tiles miss a time step still gets that step's (all-null) band
    columns, so extracts over different AOIs always union/compare
    cleanly. Corpus-scale callers that already know the stack should
    pass ``time_names`` explicitly and skip even that scan.
    """
    enc = encode_points_pdf(aoi, grid)
    # DROP out-of-grid points (reference ``sops.py:836-844`` filters them;
    # the encoder's clamp would otherwise fabricate edge-cell rows with
    # band values from the wrong pixel for points past the image bounds)
    enc = enc[
        in_bounds_mask(enc["x"].values, enc["y"].values, grid)
    ].reset_index(drop=True)
    # AOI attribute columns ride through (the reference returns the
    # GeoDataFrame with band columns appended — attributes included)
    attr_cols = [
        c
        for c in enc.columns
        if c not in {id_column, "x", "y", "cell_id", "row", "col", "tile_id"}
    ]
    pts_cols = [id_column, "x", "y", "cell_id", *attr_cols]
    pts = _pdf_to_sdf(
        spark,
        enc[pts_cols].assign(_pt_order=np.arange(len(enc), dtype=np.int64)),
    )
    pruned = _prune_tiles(docs, enc["tile_id"].unique())
    band_cols = [_band_col(b) for b in bands]
    doc_side = pruned.select(
        "cell_id",
        *(["t"] if "t" in docs.columns else []),
        *band_cols,
        *keep_doc_columns,
    )
    # AOI is the small side: broadcast — no shuffle of the corpus at all.
    joined = doc_side.join(F.broadcast(pts), "cell_id", "inner")

    if time_names is None and "t" in docs.columns:
        # infer time labels from the UNPRUNED input so the output schema
        # does not depend on which tiles the AOI happens to touch (an
        # AOI-dependent schema breaks union/cache/compare callers). The
        # cost is one single-column distinct — column pruning reads only
        # the `t` parquet chunks; pass time_names to skip it entirely.
        time_names = [
            r[0] for r in docs.select("t").distinct().orderBy("t").collect()
        ]
    if time_names and len(time_names) > 1:
        # F.min, not F.first: first() is shuffle-order nondeterministic
        # when a (cell, t) key holds duplicate rows (pre-dedup appends).
        # For the well-formed unique case they're identical; for
        # duplicates min resolves per band deterministically — the same
        # rule as mosaic overlap='min'.
        aggs = [F.min(_band_col(b)).alias(b) for b in bands]
        # keep_doc_columns and AOI attributes are grouping keys, not
        # aggregated away (a kept column that varies across time steps
        # legitimately splits the point's row)
        out = (
            joined.groupBy(
                "_pt_order", id_column, "x", "y",
                *attr_cols, *keep_doc_columns,
            )
            .pivot("t", time_names)
            .agg(*aggs)
        )
        # single-agg pivot names columns "{t}" — force "{t}_{band}"
        # (pivot column names are always strings, so rename via str(t))
        if len(bands) == 1:
            for t in time_names:
                out = out.withColumnRenamed(str(t), f"{t}_{bands[0]}")
    else:
        # same duplicate-(cell, t) resolution as the pivot path above
        # (min per band): without it a pre-dedup append corpus returns
        # EXTRA rows per point on the single-time path while the
        # multi-time path collapses them — inconsistent contract. The
        # groupBy shuffles only the AOI-matched rows (small side), not
        # the corpus.
        keys1 = ["_pt_order", id_column, "x", "y", "cell_id"]
        if "t" in joined.columns:
            keys1.append("t")
        keys1 += [*attr_cols, *keep_doc_columns]
        out = joined.groupBy(*keys1).agg(
            *[F.min(_band_col(b)).alias(b) for b in bands]
        )
    if ordered:
        out = out.orderBy("_pt_order")
    return out.drop("_pt_order")


def sample_polygons(
    spark: SparkSession,
    polygons: pd.DataFrame,
    grid: GridSpec,
    frac: float = 1.0,
    min_frac_area: float | None = None,
    all_touched: bool = False,
    seed: int = 42,
    id_column: str = "fid",
    grid_aligned: bool = False,
) -> DataFrame:
    """Polygon → sample-point centers (``sample_feature`` parity).

    ``grid_aligned=True`` anchors the sampling lattice on the reference
    grid so the emitted centers ARE grid cell centers (the GDAL rasterize
    containment test — used by ``polygon_to_array``); the default
    bbox-local lattice is the reference's extract sampling.

    ``polygons`` columns: ``fid`` plus ``rings`` (list of flat
    ``[x0,y0,x1,y1,...]`` arrays) and any attribute columns. Runs one
    vectorized kernel per polygon via ``applyInPandas`` (the Spark analogue
    of the reference's per-feature ``multiprocessing.Pool``,
    ``conversion.py:438-493``). ``frac``/``min_frac_area`` follow
    ``util.py:538-551`` (subsample only when above the area floor); the rng
    is seeded per polygon for determinism.
    """
    res_x, res_y = grid.cellx, grid.celly
    anchor = (grid.left, grid.top) if grid_aligned else None
    pdf = polygons.copy()
    pdf["rings"] = pdf["rings"].apply(lambda rs: [list(map(float, r)) for r in rs])
    if len(pdf) == 0:
        # an AOI prefilter can legitimately drop every feature; the
        # reference returns an empty frame (sops.py:836-844) — Spark
        # cannot infer a schema from the empty object-typed rings column
        return spark.createDataFrame(
            [], f"{id_column} bigint, point bigint, x double, y double"
        )
    pdf_spark = spark.createDataFrame(pdf)

    # id type follows the input with the reference's int-FIRST fallback
    # (util.py:553-559: try int(fid), fall back to str on ValueError) —
    # so a float64 fid column (pandas merge/NaN promotion of ints) stays
    # numeric (int(1.0) == 1, not the string '1.0'), while a genuinely
    # non-numeric GeoDataFrame-style fid survives as string rather than
    # int()-crashing the job. Column-level dispatch: the int path only
    # when EVERY value round-trips through int() LOSSLESSLY and fits
    # int64 — a non-integral float (7.2) must not truncate onto another
    # feature's id/seed, and an integral float beyond int64 (1e19) must
    # not pass the probe only to overflow the kernel's int64 column.
    def _all_int_convertible(col) -> bool:
        try:
            for v in col:
                iv = int(v)
                if float(v) != float(iv) or not (-(2**63) <= iv < 2**63):
                    return False
        except (ValueError, TypeError, OverflowError):
            return False
        return True

    id_is_str = not _all_int_convertible(pdf[id_column])
    id_sql_type = "string" if id_is_str else "bigint"
    out_schema = f"{id_column} {id_sql_type}, point bigint, x double, y double"

    def _sample(key, g: pd.DataFrame) -> pd.DataFrame:
        # deterministic per-feature rng offset: identity for int fids
        # (preserves historical sampled outputs), crc32 for strings
        if id_is_str:
            import zlib

            fid = str(key[0])
            fid_seed = zlib.crc32(fid.encode("utf-8"))
        else:
            fid = int(key[0])
            fid_seed = fid
        # EVERY row of the group is a polygon: duplicate fids (a multipart
        # feature exploded without renumbering) are real inputs, and
        # sampling only g.iloc[0] would silently drop the rest — the
        # reference's per-feature pool samples each row (conversion.py:
        # 438-493). Point ids continue across parts so they stay unique
        # within the fid.
        xs, ys = [], []
        for ri in range(len(g)):
            rings = [
                np.asarray(r, dtype=np.float64) for r in g.iloc[ri]["rings"]
            ]
            cx, cy = polygon_sample_centers(
                rings, res_x, res_y, all_touched=all_touched, anchor=anchor
            )
            if frac < 1.0:
                take = True
                if min_frac_area is not None and cx.shape[0] <= min_frac_area:
                    take = False
                if take:
                    rng = np.random.default_rng(seed + fid_seed + 7919 * ri)
                    idx = rng.choice(
                        cx.shape[0], size=int(cx.shape[0] * frac), replace=False
                    )
                    idx.sort()
                    cx, cy = cx[idx], cy[idx]
            xs.append(cx)
            ys.append(cy)
        cx = np.concatenate(xs) if xs else np.array([], dtype=np.float64)
        cy = np.concatenate(ys) if ys else np.array([], dtype=np.float64)
        return pd.DataFrame(
            {
                id_column: (
                    np.full(cx.shape[0], fid, dtype=object)
                    if id_is_str
                    else np.full(cx.shape[0], fid, dtype=np.int64)
                ),
                "point": np.arange(cx.shape[0], dtype=np.int64),
                "x": cx,
                "y": cy,
            }
        )

    return pdf_spark.groupBy(id_column).applyInPandas(_sample, out_schema)


def extract_polygons(
    spark: SparkSession,
    docs: DataFrame,
    polygons: pd.DataFrame,
    grid: GridSpec,
    bands: list[str] = ("blue",),
    frac: float = 1.0,
    min_frac_area: float | None = None,
    all_touched: bool = False,
    seed: int = 42,
    id_column: str = "fid",
    keep_doc_columns: list[str] = (),
) -> DataFrame:
    """Sample band values for every cell whose center falls inside each
    polygon — ``gw.extract(polygons)`` (``sops.py:689-909`` polygon path)."""
    samples = sample_polygons(
        spark,
        polygons,
        grid,
        frac=frac,
        min_frac_area=min_frac_area,
        all_touched=all_touched,
        seed=seed,
        id_column=id_column,
    )
    # DROP sample centers outside the grid (reference ``sops.py:836-844``
    # filters out-of-image indices; clamping would gather edge-cell values
    # for the overhanging part of a polygon that extends past the bounds)
    samples = samples.filter(in_bounds_col(grid))
    samples = encode_cells(samples, grid)
    # tile pruning from the polygons' bboxes (driver-side, bbox arithmetic)
    from ..grid import bbox_cover_tiles

    tiles: set[int] = set()
    for rs in polygons["rings"]:
        xs = np.concatenate([np.asarray(r)[0::2] for r in rs])
        ys = np.concatenate([np.asarray(r)[1::2] for r in rs])
        tiles.update(
            bbox_cover_tiles(grid, xs.min(), ys.min(), xs.max(), ys.max())
        )
    pruned = _prune_tiles(docs, tiles)
    band_cols = [_band_col(b) for b in bands]
    # carry the time column when the corpus is a stack: every sample point
    # legitimately matches one row per time step, and 't' is what makes
    # those rows distinguishable downstream
    t_cols = ["t"] if "t" in docs.columns else []
    doc_side = pruned.select(
        "cell_id", *t_cols, *band_cols, *keep_doc_columns
    )
    joined = doc_side.join(
        F.broadcast(samples.select(id_column, "point", "x", "y", "cell_id")),
        "cell_id",
        "inner",
    )
    renames = dict(zip(band_cols, bands))
    out = joined.withColumnsRenamed(renames)
    # polygon attribute columns ride back in via the (tiny) broadcast fid
    # table — ``sample_feature`` re-assigns other_cols the same way
    # one attribute row per fid: a multipart feature exploded into
    # duplicate-fid rows would otherwise match every sample row N times
    # and double-count the whole extract
    attrs = polygons.drop(columns=["rings"], errors="ignore").drop_duplicates(
        subset=[id_column]
    )
    if len(attrs.columns) > 1:
        out = out.join(F.broadcast(spark.createDataFrame(attrs)), id_column)
    return out.orderBy(id_column, "point", *t_cols)
