"""series_apply (TimeModule protocol) and apply_blocks (gw.apply analogue)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from geowombat_spark.operators import temporal


def _stack(spark, n=60, T=4):
    base = spark.range(n).select(
        F.expr("id div 10").cast("long").alias("row"),
        (F.col("id") % 10).cast("long").alias("col"),
        (F.col("id") % 3).cast("long").alias("tile_id"),
        F.col("id").alias("cell"),
    )
    layers = [
        base.select(
            "tile_id",
            "row",
            "col",
            F.lit(f"t{i}").alias("t"),
            (F.col("cell") * 2 + i * 10).cast("double").alias("band_blue"),
        )
        for i in range(T)
    ]
    out = layers[0]
    for l in layers[1:]:
        out = out.unionByName(l)
    return out


def test_series_apply_mean_amp(spark):
    docs = _stack(spark)

    def kernel(cube, times):
        # cube [T, N] → rows: temporal mean, amplitude
        return np.vstack(
            [np.nanmean(cube, axis=0), np.nanmax(cube, axis=0) - np.nanmin(cube, axis=0)]
        )

    out = temporal.series_apply(docs, kernel, ("tmean", "amp")).toPandas()
    assert len(out) == 60
    # value v(t) = cell*2 + 10t, t=0..3 → mean = cell*2 + 15, amp = 30
    out = out.sort_values(["row", "col"]).reset_index(drop=True)
    cells = out["row"] * 10 + out["col"]
    assert np.allclose(out["tmean"], cells * 2 + 15)
    assert np.allclose(out["amp"], 30.0)


def test_series_apply_missing_samples_are_nan(spark):
    docs = _stack(spark).filter(
        ~((F.col("t") == "t0") & (F.col("row") == 0))  # drop t0 for row 0
    )

    def kernel(cube, times):
        return np.vstack([np.sum(np.isnan(cube), axis=0).astype(float)])

    out = temporal.series_apply(docs, kernel, ("n_missing",)).toPandas()
    out = out.sort_values(["row", "col"]).reset_index(drop=True)
    assert (out.loc[out["row"] == 0, "n_missing"] == 1.0).all()
    assert (out.loc[out["row"] != 0, "n_missing"] == 0.0).all()


def test_apply_blocks(spark):
    docs = _stack(spark)

    def double_blue(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"row": pdf["row"], "col": pdf["col"], "v2": pdf["band_blue"] * 2.0}
        )

    out = temporal.apply_blocks(
        docs, double_blue, "row bigint, col bigint, v2 double"
    )
    got = out.agg(F.sum("v2")).collect()[0][0]
    exp = docs.agg(F.sum(F.col("band_blue") * 2.0)).collect()[0][0]
    assert abs(got - exp) < 1e-6


def test_time_module_protocol(spark):
    """TimeModule / TimeModulePipeline (reference core/series.py:289-379):
    modules declare count/out_names; `a + b` composes a pipeline that runs
    in the same single tile-keyed shuffle."""
    docs = _stack(spark)

    class TMean(temporal.TimeModule):
        out_names = ("tmean",)

        def calculate(self, cube):
            return np.nanmean(cube, axis=0)

    class Amp(temporal.TimeModule):
        out_names = ("amp",)

        def calculate(self, cube):
            return np.nanmax(cube, axis=0) - np.nanmin(cube, axis=0)

    pipe = TMean() + Amp()
    assert pipe.count == 2 and pipe._names() == ("tmean", "amp")

    out = temporal.series_apply(docs, pipe).toPandas()
    out = out.sort_values(["row", "col"]).reset_index(drop=True)
    cells = out["row"] * 10 + out["col"]
    assert np.allclose(out["tmean"], cells * 2 + 15)
    assert np.allclose(out["amp"], 30.0)

    # single module, default name derived from the class
    class P75(temporal.TimeModule):
        def calculate(self, cube):
            return np.nanpercentile(cube, 75, axis=0)

    out1 = temporal.series_apply(docs, P75()).toPandas()
    assert "p75" in out1.columns and len(out1) == 60


def test_facade_parity_names():
    """Every public name of the reference's `gw.*` export list resolves on
    the facade (to_netcdf excepted: format lib absent, SURVEY out of
    scope)."""
    import geowombat_spark.api as gw

    ref = [
        "apply", "array_to_polygon", "avi", "bounds_to_coords", "calc_area",
        "clip", "clip_by_polygon", "coords_to_indices", "coregister", "evi",
        "evi2", "extract", "indices_to_coords", "kndvi", "lonlat_to_xy",
        "mask", "moving", "nbr", "ndvi", "norm_diff", "polygon_to_array",
        "polygons_to_points", "recode", "replace", "sample", "save",
        "subset", "tasseled_cap", "to_raster", "to_vrt", "transform_crs",
        "wi", "xy_to_lonlat", "load", "open", "series", "TimeModule",
        "TimeModulePipeline", "config",
    ]
    missing = [n for n in ref if not hasattr(gw, n)]
    assert not missing, missing


def test_series_apply_honors_caller_time_order_and_guards_coords(spark):
    """Caller-supplied time_names keep their order (chronological axes
    are not lexicographic: '2020-9' < '2020-10' in time, > as strings);
    out-of-range coordinates fail loudly instead of key-colliding."""
    docs = _stack(spark, T=2).withColumn(
        "t", F.when(F.col("t") == "t0", "2020-9").otherwise("2020-10")
    )

    def first_layer(cube, times):
        assert list(times) == ["2020-9", "2020-10"]
        return cube[0][None, :]

    out = temporal.series_apply(
        docs,
        first_layer,
        out_names=("v0",),
        time_names=["2020-9", "2020-10"],
    ).toPandas()
    # axis order honored: v0 is the '2020-9' (= t0) layer, cell*2+0
    got = out.sort_values(["row", "col"]).reset_index(drop=True)
    assert (got["v0"] == (got["row"] * 10 + got["col"]) * 2).all()

    import pytest as _pytest

    bad = docs.withColumn("col", F.col("col") - F.lit(5))
    with _pytest.raises(Exception, match="clip the input"):
        temporal.series_apply(
            bad, first_layer, out_names=("v0",),
            time_names=["2020-9", "2020-10"],
        ).collect()


def test_series_stats_excludes_out_of_list_timesteps(spark):
    """An explicit time_names subset excludes other timesteps from EVERY
    stat — not just the quarter-indexed ones (silently inconsistent
    statistics otherwise; series_apply masks the same rows from the
    cube)."""
    docs = _stack(spark, T=3)  # band = cell*2 + i*10 for t0/t1/t2
    out = (
        temporal.series_stats(
            docs,
            ["mean", "max"],
            time_names=["t0", "t1"],
            nodata=None,
            key_cols=("row", "col"),
        )
        .toPandas()
        .sort_values(["row", "col"])
        .reset_index(drop=True)
    )
    cell = out["row"] * 10 + out["col"]
    # t2 (cell*2+20) excluded: mean over t0/t1 = cell*2+5, max = cell*2+10
    assert (out["mean"] == cell * 2 + 5).all()
    assert (out["max"] == cell * 2 + 10).all()
