"""DOS dark-object correction + pan-sharpening ratio fusion.

Goldens are hand-computed from the public formulas (Chavez 1988 dark-object
subtraction; Masek et al. 2006 dark-pixel selection, ``sr.py:1244-1270``;
standard Brovey/ESRI ratio fusion)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geowombat_spark.functions import radiometry as rad


@pytest.fixture(scope="module")
def toar_df(spark):
    # 6 pixels over 2 tiles; blue/swir2 in TOAR units
    rows = [
        # tile, blue, swir2          swir2 dark-range [0.01, 0.15]?
        (0, 0.080, 0.020),  # dark
        (0, 0.120, 0.100),  # dark
        (0, 0.300, 0.400),  # bright
        (1, 0.050, 0.005),  # below dark_min
        (1, 0.260, 0.300),  # bright
        (1, 0.210, 0.200),  # bright
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["tile_id", "band_blue", "band_swir2"])
    )


def test_dark_object_values_min_and_percentile(spark, toar_df):
    d = rad.dark_object_values(toar_df, ("band_blue", "band_swir2"))
    assert d["band_blue"] == 0.05 and d["band_swir2"] == 0.005
    # exact interpolated percentile: p=0.2 over 6 sorted values ->
    # index 1.0 exactly -> second smallest
    d2 = rad.dark_object_values(toar_df, ("band_blue",), pct=0.2)
    assert d2["band_blue"] == pytest.approx(0.08)


def test_dos_correct_golden(spark, toar_df):
    # haze = min(blue) - 0.01 = 0.04; corrected = clip(blue - 0.04, 0, 1)
    out = (
        rad.dos_correct(toar_df, ("band_blue",))
        .orderBy("band_swir2")
        .collect()
    )
    got = [round(r["band_blue"], 6) for r in out]
    assert got == [
        pytest.approx(v)
        for v in [0.01, 0.04, 0.08, 0.17, 0.22, 0.26]
    ]


def test_dos_aot_tiles_golden(spark, toar_df):
    # tile 0 dark pixels: (0.080, 0.020), (0.120, 0.100)
    #   excess = blue - 0.33*swir2 = 0.0734, 0.087 -> mean 0.0802
    # tile 1: no dark pixels -> fallback 0.3
    got = {
        r["tile_id"]: (r["n_dark"], r["aot"])
        for r in rad.dos_aot_tiles(toar_df).collect()
    }
    assert got[0][0] == 2 and got[0][1] == pytest.approx(0.0802)
    assert got[1] == (0, 0.3)


def test_brovey_2x2_hand_computed(spark):
    """The 2×2 pinned case: I = (b+g)/2, out_b = b·pan/I."""
    pdf = pd.DataFrame(
        {
            "band_blue": [10.0, 20.0, 30.0, 40.0],
            "band_green": [30.0, 20.0, 10.0, 40.0],
            "pan": [40.0, 10.0, 30.0, 20.0],
        }
    )
    df = spark.createDataFrame(pdf)
    out = (
        rad.pan_sharpen(
            df, "pan", bands=("band_blue", "band_green"), method="brovey"
        )
        .orderBy("pan")
        .collect()
    )
    # sorted by pan: rows (20,20,10), (40,40,20), (30,10,30), (10,30,40)
    # I = 20, 40, 20, 20 ; ratio = pan/I = 0.5, 0.5, 1.5, 2.0
    assert [r["band_blue"] for r in out] == [10.0, 20.0, 45.0, 20.0]
    assert [r["band_green"] for r in out] == [10.0, 20.0, 15.0, 60.0]


def test_esri_additive_and_weights(spark):
    pdf = pd.DataFrame(
        {"band_blue": [10.0], "band_green": [30.0], "pan": [40.0]}
    )
    df = spark.createDataFrame(pdf)
    # weighted intensity: w_blue=3, w_green=1 -> I = (30+30)/4 = 15
    out = rad.pan_sharpen(
        df,
        "pan",
        bands=("band_blue", "band_green"),
        weights={"band_blue": 3.0, "band_green": 1.0},
        method="esri",
    ).collect()[0]
    assert out["band_blue"] == 35.0 and out["band_green"] == 55.0


def test_brovey_reads_original_bands_not_chained(spark):
    """Both outputs must derive from the ORIGINAL band values — a
    sequential withColumn chain would feed band 2's intensity the
    already-sharpened band 1."""
    pdf = pd.DataFrame(
        {"band_blue": [10.0], "band_green": [30.0], "pan": [10.0]}
    )
    out = rad.pan_sharpen(
        spark.createDataFrame(pdf),
        "pan",
        bands=("band_blue", "band_green"),
        method="brovey",
    ).collect()[0]
    # I = 20, ratio = 0.5 for BOTH bands
    assert out["band_blue"] == 5.0 and out["band_green"] == 15.0


def test_toar_to_sr_nodata_propagates(spark):
    """src_nodata pixels come out as dst_nodata, never 0.0 'valid black'
    (least/greatest skip NULLs, so an unguarded clip would swallow the
    NULL before the dst coalesce)."""
    from geowombat_spark.functions.radiometry import toar_to_sr

    df = spark.createDataFrame(
        pd.DataFrame({"band_red": [0.3, -32768.0], "pix": [0, 1]})
    )
    out = (
        toar_to_sr(
            df, {"band_red": 0.65}, solar_za=30.0, solar_az=120.0,
            sensor_za=5.0, sensor_az=60.0, angle_factor=1.0,
            src_nodata=-32768, dst_nodata=-32768,
        )
        .orderBy("pix")
        .toPandas()
    )
    assert 0.0 < out["band_red"].iloc[0] <= 1.0
    assert out["band_red"].iloc[1] == -32768.0


def test_dark_object_values_empty_input_is_loud(spark):
    from geowombat_spark.functions.radiometry import dark_object_values

    empty = spark.createDataFrame([], "band_red double")
    with pytest.raises(ValueError, match="no non-null pixels"):
        dark_object_values(empty, ("band_red",))


def test_dos_correct_nodata_null_preserved(spark):
    """NULL / src_nodata pixels must never become 0.0 'valid black' via the
    clip (least/greatest skip NULLs), must be EXCLUDED from the dark-object
    aggregate, and dst_nodata re-flags them."""
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "band_blue": [0.05, 0.30, None, -9999.0],
            }
        )
    )
    # src_nodata excluded from dark-object min: haze = 0.05-0.01 = 0.04
    # (if -9999 leaked into the min, every pixel would clip to 0)
    out = rad.dos_correct(
        df, ("band_blue",), src_nodata=-9999.0
    ).collect()
    vals = sorted((r["band_blue"] for r in out), key=lambda v: (v is None, v))
    assert vals[0] == pytest.approx(0.01)
    assert vals[1] == pytest.approx(0.26)
    assert vals[2] is None and vals[3] is None
    # dst_nodata fills the NULLs back
    out2 = rad.dos_correct(
        df, ("band_blue",), src_nodata=-9999.0, dst_nodata=-1.0
    ).collect()
    assert sorted(r["band_blue"] for r in out2) == [
        pytest.approx(-1.0),
        pytest.approx(-1.0),
        pytest.approx(0.01),
        pytest.approx(0.26),
    ]
