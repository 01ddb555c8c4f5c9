"""mosaic/concat semantics (reference: backends/xarray_.py:425-818,
tests/test_main_mosaic.py)."""

import numpy as np
from pyspark.sql import functions as F

from geowombat_spark.grid import L8_GRID
from geowombat_spark.operators.mosaic import concat, grids_equal, mosaic, mosaic_intersection
from geowombat_spark.operators.sops import subset


def _dense(docs):
    return subset(docs, L8_GRID, 717585.0, -2776995.0, 64, 64)


def test_mosaic_overlap_max_mean(spark, docs):
    a = _dense(docs)
    b = a.withColumn(
        "band_blue",
        F.when(F.col("band_blue") == 0.0, 0.0).otherwise(F.col("band_blue") + 100.0),
    )
    out_max = mosaic([a, b], overlap="max", nodata=0.0, bands=("band_blue",)).toPandas()
    out_mean = mosaic([a, b], overlap="mean", nodata=0.0, bands=("band_blue",)).toPandas()
    base = a.toPandas().set_index("cell_id")["band_blue"]
    for _, r in out_max.iterrows():
        v = base.loc[r["cell_id"]]
        if v == 0.0:
            assert np.isnan(r["band_blue"])  # all-source nodata stays NULL
        else:
            assert r["band_blue"] == v + 100.0
    for _, r in out_mean.iterrows():
        v = base.loc[r["cell_id"]]
        if v != 0.0:
            assert r["band_blue"] == v + 50.0


def test_mosaic_union_vs_intersection(spark, docs):
    a = _dense(docs)
    left = a.filter(F.col("col") < 40)   # source A footprint
    right = a.filter(F.col("col") >= 24)  # source B footprint; overlap 24..39
    union = mosaic([left, right], bands=("band_blue",))
    inter = mosaic_intersection([left, right], bands=("band_blue",))
    assert union.count() == 64 * 64
    assert inter.count() == 64 * 16
    # union bounds == elementwise union of source bounds
    u = union.agg(F.min("col"), F.max("col")).collect()[0]
    assert (u[0], u[1]) == (0, 63)


def test_concat_and_duplicate_time_mosaic(spark, docs):
    a = _dense(docs)
    b = a.withColumn(
        "band_blue",
        F.when(F.col("band_blue") == 0.0, 0.0).otherwise(F.col("band_blue") + 10.0),
    )
    stacked = concat([a, b], time_names=["t1", "t2"], bands=("band_blue",))
    assert stacked.select("t").distinct().count() == 2
    assert stacked.count() == 2 * 64 * 64
    # duplicate time names → mosaicked into one layer (xarray_.py:681-709)
    merged = concat([a, b], time_names=["t1", "t1"], overlap="max", bands=("band_blue",))
    assert merged.count() == 64 * 64
    mp = merged.toPandas().set_index("cell_id")["band_blue"]
    base = a.toPandas().set_index("cell_id")["band_blue"]
    valid = base[base != 0.0]
    assert (mp.loc[valid.index] == valid + 10.0).all()


def test_grids_equal(spark, docs):
    a = _dense(docs)
    assert grids_equal(a, a.withColumn("extra", F.lit(1)))
