"""qa_masker sensor dispatch (QAMasker.to_mask analogue, qa.py:68-344)."""

import pandas as pd
from pyspark.sql import functions as F

from geowombat_spark.functions.radiometry import (
    QA_BITS_HLS_FMASK,
    QA_BITS_LANDSAT_C2_L2,
    SCL_VALUES,
    qa_masker,
)


def test_landsat_c2_l2_bits(spark):
    # qa values: clear (bit6), cloud (bit3), cloud+shadow, fill (bit0)
    df = spark.createDataFrame(
        pd.DataFrame({"pix": [0, 1, 2, 3], "qa": [1 << 6, 1 << 3, (1 << 3) | (1 << 4), 1]})
    )
    out = (
        qa_masker(df, "qa", "landsat-c2-l2", ("cloud", "cloud_shadow", "fill"))
        .orderBy("pix")
        .toPandas()
    )
    assert out["qa_ok"].tolist() == [1, 0, 0, 0]


def test_hls_fmask_bits(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"pix": [0, 1, 2], "qa": [0, 1 << 1, 1 << 5]})
    )
    out = (
        qa_masker(df, "qa", "hls", ("cloud", "cirrus")).orderBy("pix").toPandas()
    )
    # water (bit 5) not requested -> usable
    assert out["qa_ok"].tolist() == [1, 0, 1]


def test_scl_class_mask(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "pix": range(4),
                "scl": [
                    SCL_VALUES["vegetation"],
                    SCL_VALUES["cloud_high_prob"],
                    SCL_VALUES["cloud_shadow"],
                    SCL_VALUES["water"],
                ],
            }
        )
    )
    out = (
        qa_masker(
            df, "scl", "s2a",
            ("cloud_medium_prob", "cloud_high_prob", "cloud_shadow", "thin_cirrus"),
        )
        .orderBy("pix")
        .toPandas()
    )
    assert out["qa_ok"].tolist() == [1, 0, 0, 1]


def test_tables_complete():
    assert len(QA_BITS_LANDSAT_C2_L2) == 8
    assert len(QA_BITS_HLS_FMASK) == 6
    assert len(SCL_VALUES) == 12


def test_bandpass_to_lut(spark):
    """Published S2A->L8 LUT applied to matching band columns only."""
    from geowombat_spark.functions.radiometry import BANDPASS_COEFFS, bandpass_to

    df = spark.createDataFrame(
        pd.DataFrame({"pix": [0], "band_blue": [0.5], "band_other": [1.0]})
    )
    out = bandpass_to(df, "s2a", to="l8").toPandas().iloc[0]
    a, b = BANDPASS_COEFFS[("s2a", "l8")]["blue"]
    assert abs(out["band_blue"] - (a + b * 0.5)) < 1e-12
    assert out["band_other"] == 1.0  # untouched: no coefficient pair
    try:
        bandpass_to(df, "l8", to="s2a")
        raise AssertionError("expected KeyError")
    except KeyError:
        pass


def test_ard_modis_s2toa_layouts(spark):
    from geowombat_spark.functions.radiometry import QA_SENSOR_BITS

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "pix": [0, 1, 2, 3],
                "qa": [0, 1 << 5, 1 << 10, (1 << 10) | (1 << 11)],
            }
        )
    )
    ard = qa_masker(df, "qa", "ard", ("cloud", "fill")).orderBy("pix").toPandas()
    assert ard["qa_ok"].tolist() == [1, 0, 1, 1]
    s2 = (
        qa_masker(df, "qa", "s2-toa", ("cloud", "cirrus")).orderBy("pix").toPandas()
    )
    assert s2["qa_ok"].tolist() == [1, 1, 0, 0]
    # modis-state: cloud bit 0; landwater 2-bit field fires on any nonzero
    dm = spark.createDataFrame(
        pd.DataFrame({"pix": [0, 1, 2], "qa": [0, 1, 1 << 6]})
    )
    mo = (
        qa_masker(dm, "qa", "modis-state", ("cloud", "landwater"))
        .orderBy("pix")
        .toPandas()
    )
    assert mo["qa_ok"].tolist() == [1, 0, 0]
    assert QA_SENSOR_BITS["modis-state"]["landwater"] == (6, 2)


def test_conf_fields_mask_only_maybe_and_yes(spark):
    """2-bit confidence fields follow the reference conf_dict (notdet=0,
    no=1, maybe=2, yes=3): level 1 explicitly means 'no cloud' and must
    pass; class fields (landwater) keep any-nonzero semantics."""
    # l8-c1 cloud_conf at offset 5, width 2 (reference qa.py:248-256)
    df = spark.createDataFrame(
        pd.DataFrame({"pix": [0, 1, 2, 3], "qa": [c << 5 for c in range(4)]})
    )
    out = (
        qa_masker(df, "qa", "l8-c1", ("cloud_conf",)).orderBy("pix").toPandas()
    )
    assert out["qa_ok"].tolist() == [1, 1, 0, 0]
