"""file_bounds (get_file_bounds analogue) and match_layout (match_data)."""

import pandas as pd
from pyspark.sql import functions as F

from geowombat_spark.grid import GridSpec
from geowombat_spark.operators import transform as tf
from geowombat_spark.operators.mosaic import file_bounds


def _fps(spark):
    pdf = pd.DataFrame(
        [
            {"src": "a", "minx": 0.0, "miny": -100.0, "maxx": 50.0, "maxy": 0.0},
            {"src": "b", "minx": 20.0, "miny": -80.0, "maxx": 90.0, "maxy": -10.0},
        ]
    )
    return spark.createDataFrame(pdf)


def test_file_bounds_union_intersection(spark):
    assert file_bounds(_fps(spark), "union") == (0.0, -100.0, 90.0, 0.0)
    assert file_bounds(_fps(spark), "intersection") == (20.0, -80.0, 50.0, -10.0)


def test_file_bounds_aligned(spark):
    # reference align_bounds floors the extent to res multiples
    # (rasterio_.py:633-664: aligned interior, not outward snap):
    # raw (0,-100,90,0) at res 30 → 3×3 cells from (0, 0) → miny = -90
    minx, miny, maxx, maxy = file_bounds(_fps(spark), "union", res=30.0)
    assert (minx, miny, maxx, maxy) == (0.0, -90.0, 90.0, 0.0)


def test_match_layout_rekeys(spark):
    src = GridSpec(left=0.0, top=0.0, cellx=30.0, celly=30.0, nrows=100,
                   ncols=100, tile_rows=50, tile_cols=50, nodata=0.0)
    dst = GridSpec(left=0.0, top=0.0, cellx=30.0, celly=30.0, nrows=100,
                   ncols=100, tile_rows=10, tile_cols=10, nodata=0.0)
    docs = spark.range(100).select(
        ((F.col("id") % 10).cast("double") * 30.0 + 15.0).alias("x"),
        (-(F.expr("id div 10").cast("double") * 30.0 + 15.0)).alias("y"),
        F.col("id").alias("doc_id"),
    )
    from geowombat_spark.operators.extract import encode_cells

    enc_src = encode_cells(docs, src)
    rekeyed = tf.match_layout(enc_src, dst)
    # same cells, different tile assignment density
    assert rekeyed.count() == 100
    n_src_tiles = enc_src.select("tile_id").distinct().count()
    n_dst_tiles = rekeyed.select("tile_id").distinct().count()
    assert n_src_tiles == 1 and n_dst_tiles == 1  # 10x10 cells fit one 50- or 10-tile? no:
    # cells span rows 0-9, cols 0-9 → dst tiles 10x10 → exactly 1 tile as well
    # stronger: shrink dst tiles to 5
    dst5 = GridSpec(left=0.0, top=0.0, cellx=30.0, celly=30.0, nrows=100,
                    ncols=100, tile_rows=5, tile_cols=5, nodata=0.0)
    rk5 = tf.match_layout(enc_src, dst5)
    assert rk5.select("tile_id").distinct().count() == 4


def test_api_facade_names():
    """The reference-named surface (gw.open/extract/clip/...) resolves."""
    import geowombat_spark.api as gw

    for req in (
        "open", "extract", "extract_polygons", "clip_by_polygon", "mask",
        "subset", "recode", "replace", "calc_area", "moving", "save",
        "ndvi", "evi", "tasseled_cap", "config", "transform_crs",
        "polygon_to_array", "array_to_polygon", "sample_random",
        "sample_systematic", "sample_stratified", "series_stats",
        "series_apply", "apply", "mosaic", "concat", "knn_join",
        "near_pairs", "set_nodata", "qa_mask", "prepare_points",
    ):
        assert callable(getattr(gw, req)), req
