"""Regression pins for the functions-stack reference-parity fixes:
dn_to_toar sun-angle correction (ref ``radiometry/sr.py:830-873``),
layout-aware qa_mask (ref ``radiometry/qa.py:69-344``), NaN-preserving
VI clipping (ref ``core/vi.py:71-155`` mask_and_assign), single-band
least/greatest guards, ML assembler nodata skipping
(ref ``ml/classifiers.py:297-404``), and the estimate_shadows
empty-input contract (ref ``radiometry/mask.py:22-114``)."""

import math

import numpy as np
import pandas as pd
import pytest
import pyspark.sql.functions as F

from geowombat_spark.functions import radiometry as rad
from geowombat_spark.functions import vi
from geowombat_spark.functions.nodata import band_mask


def test_dn_to_toar_sun_angle_correction(spark):
    """rho = (mp*DN + ap) / cos(deg2rad(sza * angle_factor)), clip AFTER
    the correction (sr.py:846-862: the reference divides by cos(sza))."""
    df = spark.createDataFrame(
        [(10000.0, 4500.0), (60000.0, 4500.0)], "dn double, sza double"
    )
    out = rad.dn_to_toar(
        df, {"dn": (2e-05, -0.1)}, clip=True, solar_za="sza"
    ).collect()
    cos45 = math.cos(math.radians(45.0))
    assert out[0]["dn"] == pytest.approx((2e-05 * 10000.0 - 0.1) / cos45)
    # 60000 DN -> 1.1 raw, 1.556 corrected -> clips to 1.0 (post-correction)
    assert out[1]["dn"] == 1.0


def test_dn_to_toar_requires_solar_za(spark):
    """sun_angle=True (default) with no zenith column raises, mirroring the
    reference's NameError (sr.py:850-855)."""
    df = spark.createDataFrame([(100.0,)], "dn double")
    with pytest.raises(ValueError, match="solar_za"):
        rad.dn_to_toar(df, {"dn": (2e-05, -0.1)})


def test_dn_to_toar_uncorrected_optout(spark):
    df = spark.createDataFrame([(10000.0,)], "dn double")
    out = rad.dn_to_toar(
        df, {"dn": (2e-05, -0.1)}, clip=False, sun_angle=False
    ).collect()
    assert out[0]["dn"] == pytest.approx(2e-05 * 10000.0 - 0.1)


def test_qa_mask_single_bit_layout(spark):
    """qa_mask over a layout with no 'cloud_conf' field (C2-L2, HLS) must
    build the condition from the flags the layout carries, not raise
    UNRESOLVED_COLUMN."""
    # C2-L2: fill=bit0, cloud=bit3
    df = spark.createDataFrame(
        [(0,), (1 << 3,), (1,)], "qa bigint"
    )
    out = (
        rad.qa_mask(df, "qa", bits=rad.QA_BITS_LANDSAT_C2_L2)
        .select("qa", "qa_ok")
        .orderBy("qa")
        .collect()
    )
    by_qa = {r["qa"]: r["qa_ok"] for r in out}
    assert by_qa[0] == 1          # clear
    assert by_qa[1] == 0          # fill
    assert by_qa[1 << 3] == 0     # cloud


def test_qa_mask_vacuous_layout_raises(spark):
    df = spark.createDataFrame([(0,)], "qa bigint")
    with pytest.raises(ValueError, match="vacuous"):
        rad.qa_mask(df, "qa", bits={"water": (0, 1)})


def test_vi_clip_preserves_nan(spark):
    """avi's pow(negative, 0.3334) is NaN; the [0,1] clip must keep it NaN
    (numpy clip semantics), not saturate to the UPPER bound — otherwise
    water/shadow pixels read as maximum vegetation."""
    # nir < red -> (nir*(1-red)*(nir-red)) < 0 -> fractional pow = NaN
    df = spark.createDataFrame([(0.9, 0.2)], "red double, nir double")
    val = vi.avi(df, "red", "nir").select("avi").collect()[0][0]
    assert val is not None and math.isnan(val)


def test_vi_clip_still_propagates_null(spark):
    df = spark.createDataFrame(
        [(None, 0.5)], "red double, nir double"
    )
    val = vi.avi(df, "red", "nir").select("avi").collect()[0][0]
    assert val is None


def test_band_mask_single_band(spark):
    """F.least needs >=2 cols; a one-band mask is legitimate."""
    df = spark.createDataFrame([(0.0,), (5.0,)], "b double")
    out = {r["b"]: r["mask"] for r in band_mask(df, ("b",)).collect()}
    assert out[0.0] == 1 and out[5.0] == 0


def test_ml_fit_skips_nodata_rows(spark):
    """VectorAssembler(handleInvalid='skip'): NULL band cells (the engine's
    canonical nodata) must be dropped from training/prediction, not crash
    MLlib (reference fits only valid samples, classifiers.py:297-404)."""
    from pyspark.ml.classification import LogisticRegression

    from tests.test_ml import MG, _label_polys, _ml_pdf
    from geowombat_spark import ml

    pdf = _ml_pdf()
    docs = spark.createDataFrame(pdf).withColumn(
        "band_blue",
        F.when(F.col("col") % 7 == 3, F.lit(None)).otherwise(
            F.col("band_blue")
        ),
    )
    model = ml.fit(
        spark, docs, MG, LogisticRegression(maxIter=30),
        labels=_label_polys(), col="cls",
    )
    pred = ml.predict(docs, model)
    n_valid = docs.filter(F.col("band_blue").isNotNull()).count()
    # nodata cells are absent from the prediction output
    assert pred.count() == n_valid


def test_estimate_shadows_all_null_angles_raises(spark):
    from geowombat_spark.functions.cloudmask import estimate_shadows
    from tests.test_ml import MG

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "row": [0], "col": [0], "cell_id": [0],
                "cloud": [1],
                "solar_za": pd.array([None], dtype="Float64"),
                "solar_az": pd.array([None], dtype="Float64"),
                "band_swir2": [10.0], "band_green": [20.0],
            }
        )
    )
    with pytest.raises(ValueError, match="solar-angle"):
        estimate_shadows(
            df, MG, cloud="cloud", solar_za="solar_za",
            solar_az="solar_az", swir2="band_swir2", green="band_green",
        )
