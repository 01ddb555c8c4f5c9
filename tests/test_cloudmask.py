"""Cloud-shadow projection tests (reference ``radiometry/mask.py:22-114``)."""

import numpy as np
import pandas as pd
import pytest

from geowombat_spark.functions.cloudmask import estimate_shadows
from geowombat_spark.grid import GridSpec, zorder_encode

CG = GridSpec(
    left=0.0, top=480.0, cellx=30.0, celly=30.0,
    nrows=48, ncols=48, tile_rows=24, tile_cols=24,
)


def _cloud_pdf():
    rr, cc = np.meshgrid(np.arange(48), np.arange(48), indexing="ij")
    rr, cc = rr.ravel(), cc.ravel()
    return pd.DataFrame(
        {
            "row": rr,
            "col": cc,
            "cell_id": zorder_encode(rr, cc),
            "cloud": ((rr * 31 + cc * 7) % 13 == 0).astype(int),
            "solar_za": 0.3 + ((rr * 5 + cc) % 100) / 300.0,
            "solar_az": 2.0 + ((rr + cc * 3) % 100) / 500.0,
            "band_swir2": ((rr * 37 + cc * 11) % 200 + 20).astype(np.float64),
            "band_green": ((rr * 13 + cc * 29) % 220 + 30).astype(np.float64),
        }
    )


def _np_shadows(heights=(500.0, 1000.0, 1500.0)):
    pdf = _cloud_pdf()
    za = pdf["solar_za"].values
    az = pdf["solar_az"].values
    def half_up(v):
        # Spark round(x, 0) rounds half away from zero; np.round is banker's
        return np.sign(v) * np.floor(np.abs(v) + 0.5)

    shifts = []
    for h in heights:
        vec = np.tan(za) * h / CG.celly
        y = int(half_up(np.cos(az) * vec).min())
        x = -int(half_up(np.sin(az) * vec).min())
        shifts.append((y, x))
    cloud = set(zip(pdf.loc[pdf["cloud"] == 1, "row"], pdf.loc[pdf["cloud"] == 1, "col"]))
    pot = set()
    for (y, x) in shifts:
        pot |= {(r + y, c + x) for (r, c) in cloud}
    g = pdf["band_green"].values
    s2 = pdf["band_swir2"].values
    dark = np.clip((g - s2) / (g + s2), -1, 1)
    shadow = np.array(
        [
            1
            if (r, c) in pot and cl != 1 and d >= 0.1
            else 0
            for r, c, cl, d in zip(pdf["row"], pdf["col"], pdf["cloud"], dark)
        ]
    )
    return shadow


@pytest.fixture(scope="module")
def cloud_docs(spark):
    return spark.createDataFrame(_cloud_pdf()).repartition(4)


def test_estimate_shadows_matches_numpy(spark, cloud_docs):
    outp = (
        estimate_shadows(cloud_docs, CG)
        .select("row", "col", "shadow")
        .toPandas()
        .sort_values(["row", "col"])
        .reset_index(drop=True)
    )
    expect = _np_shadows()
    np.testing.assert_array_equal(outp["shadow"].values, expect)
    assert outp["shadow"].sum() > 0, "fixture should produce some shadows"


def test_estimate_shadows_no_clouds_no_shadows(spark):
    pdf = _cloud_pdf()
    pdf["cloud"] = 0
    outp = estimate_shadows(spark.createDataFrame(pdf), CG).toPandas()
    assert (outp["shadow"] == 0).all()


def test_estimate_shadows_shuffle_join_path(spark, cloud_docs):
    """broadcast_shadows=False (the at-scale dense-cloud path) gives the
    same answer through a shuffle join."""
    a = (
        estimate_shadows(cloud_docs, CG, broadcast_shadows=False)
        .select("row", "col", "shadow")
        .toPandas()
        .sort_values(["row", "col"])["shadow"].values
    )
    b = (
        estimate_shadows(cloud_docs, CG, broadcast_shadows=True)
        .select("row", "col", "shadow")
        .toPandas()
        .sort_values(["row", "col"])["shadow"].values
    )
    np.testing.assert_array_equal(a, b)
