"""BRDF c-factor normalization tests (reference ``radiometry/brdf.py``)."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geowombat_spark.functions.brdf import (
    _COL,
    _NUM,
    kernels,
    mean_sza,
    norm_brdf,
    relative_azimuth,
)


def test_mean_sza_poly():
    # Zhang et al. 2016 polynomial at the equator returns the constant term.
    assert mean_sza(0.0) == pytest.approx(31.0076)
    assert 0 < mean_sza(45.0) < 90


@pytest.mark.parametrize(
    "vza,sza,raa",
    [
        (0.0, 31.0076, 0.0),
        (5.0, 30.0, 120.0),
        (7.5, 45.0, 0.0),
        (3.0, 60.0, 359.0),
        (0.0, 0.0, 0.0),
        (12.0, 25.0, 180.0),
    ],
)
def test_column_and_scalar_backends_agree(spark, vza, sza, raa):
    """The Column kernel and the float kernel are one code path — evaluate
    the Column one through Spark and compare to the float one."""
    li_f, ross_f = kernels(_NUM, vza, sza, raa)
    df = spark.createDataFrame(
        pd.DataFrame({"vza": [vza], "sza": [sza], "raa": [raa]})
    )
    li_c, ross_c = kernels(
        _COL, F.col("vza"), F.col("sza"), F.col("raa")
    )
    row = df.select(li_c.alias("li"), ross_c.alias("ross")).first()
    assert row["li"] == pytest.approx(li_f, rel=1e-12)
    assert row["ross"] == pytest.approx(ross_f, rel=1e-12)


def test_relative_azimuth_wrap(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"saa": [10.0, 350.0, 180.0], "vaa": [350.0, 10.0, 180.0]})
    )
    vals = [
        r[0]
        for r in df.select(
            relative_azimuth(F.col("saa"), F.col("vaa"))
        ).collect()
    ]
    # the reference wraps into [0, 2pi) then takes |.|, so the result is
    # direction-sensitive: (10,350) folds to 20 but (350,10) stays 340
    # (angles.py:265-275)
    assert vals[0] == pytest.approx(20.0)
    assert vals[1] == pytest.approx(340.0)
    assert vals[2] == pytest.approx(0.0)


def _angles_pdf(n=64):
    i = np.arange(n)
    return pd.DataFrame(
        {
            "band_red": ((i * 37) % 240 + 10).astype(np.float64) / 255.0,
            "solar_za": (3000 + i % 1500).astype(np.float64),
            "solar_az": ((i * 3) % 36000).astype(np.float64),
            "sensor_za": (500 + i % 800).astype(np.float64),
            "sensor_az": ((i * 7) % 36000).astype(np.float64),
        }
    )


def test_norm_brdf_identity_at_nadir_config(spark):
    """When the per-pixel angles equal the nadir-normalization geometry
    (vza=0, sza=mean_sza(lat), raa=0) the c-factor is exactly 1."""
    lat = 10.0
    pdf = pd.DataFrame(
        {
            "band_red": [0.25, 0.5],
            "solar_za": [mean_sza(lat) * 100.0] * 2,  # centi-degrees
            "solar_az": [0.0, 0.0],
            "sensor_za": [0.0, 0.0],
            "sensor_az": [0.0, 0.0],
        }
    )
    out = norm_brdf(
        spark.createDataFrame(pdf),
        {"band_red": "red"},
        central_latitude=lat,
    ).toPandas()
    np.testing.assert_allclose(out["band_red"], pdf["band_red"], rtol=1e-12)


def test_norm_brdf_finite_and_positive(spark):
    out = norm_brdf(
        spark.createDataFrame(_angles_pdf()),
        {"band_red": "red"},
        central_latitude=45.0,
    ).toPandas()
    assert np.isfinite(out["band_red"]).all()
    assert (out["band_red"] > 0).all()
    # the c-factor is a modest correction near nadir view angles
    ratio = out["band_red"].values / (_angles_pdf()["band_red"].values)
    assert (ratio > 0.7).all() and (ratio < 1.3).all()


def test_norm_brdf_nodata_and_mask(spark):
    pdf = _angles_pdf(8)
    pdf.loc[0, "band_red"] = -32768.0
    pdf.loc[1, "solar_za"] = -32768.0
    pdf["qa"] = [0, 0, 1, 0, 0, 0, 0, 0]
    out = norm_brdf(
        spark.createDataFrame(pdf),
        {"band_red": "red"},
        mask="qa",
        dst_nodata=-999.0,
    ).toPandas()
    assert out.loc[0, "band_red"] == -999.0
    assert out.loc[1, "band_red"] == -999.0
    assert out.loc[2, "band_red"] == -999.0
    assert (out.loc[3:, "band_red"] > 0).all()


def test_norm_brdf_out_range_scaling(spark):
    pdf = _angles_pdf(8)
    out01 = norm_brdf(
        spark.createDataFrame(pdf), {"band_red": "red"}, central_latitude=0.0
    ).toPandas()
    out255 = norm_brdf(
        spark.createDataFrame(pdf),
        {"band_red": "red"},
        central_latitude=0.0,
        out_range=255.0,
    ).toPandas()
    np.testing.assert_allclose(
        out255["band_red"], (out01["band_red"] * 255.0).clip(0, 255), rtol=1e-12
    )
