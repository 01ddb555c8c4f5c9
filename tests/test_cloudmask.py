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


def test_mask_s2_matches_numpy_chain(spark):
    """mask_s2 (mask.py:117-310 shape) vs an independent numpy mirror of
    the full chain: partial-window mean of the probability, threshold,
    partial-window max dilation, geometric shadow projection, and the
    reference's recode precedence (cloud=4 > shadow=2 > fill=255 > 0)."""
    from geowombat_spark.functions.cloudmask import mask_s2

    N = 16
    G = GridSpec(
        left=0.0, top=480.0, cellx=30.0, celly=30.0,
        nrows=N, ncols=N, tile_rows=8, tile_cols=8,
    )
    rr, cc = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    rr, cc = rr.ravel(), cc.ravel()
    prob = ((rr >= 2) & (rr <= 4) & (cc >= 2) & (cc <= 4)).astype(float)
    # za chosen so tan(za)*500/30 rounds to 2; az=0 -> shift (y=+2, x=0).
    # The COLUMNS carry centi-degrees (the repo band convention) so this
    # test also pins mask_s2's default angle_factor=0.01 deg2rad chain
    # (reference mask.py:255-263); the numpy mirror keeps radians.
    za = np.full(rr.shape, np.arctan(2.0 * 30.0 / 500.0))
    az = np.zeros(rr.shape)
    za_cd = np.degrees(za) * 100.0
    az_cd = np.degrees(az) * 100.0
    swir2 = ((rr * 3 + cc * 5) % 40 + 60).astype(np.float64)
    # rows >= 6 are "dark" (swir2 << green) so the +2-shifted shadow of
    # the dilated cloud block (rows 1-5 -> landing rows 6-7) registers
    swir2[rr >= 6] = 10.0
    green = np.full(rr.shape, 40.0)
    # fill cell far from the cloud/shadow action
    fill_mask = (rr == 15) & (cc == 15)
    swir2[fill_mask] = 0.0
    green[fill_mask] = 0.0
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(N * N, dtype=np.int64),
            "row": rr, "col": cc, "cell_id": zorder_encode(rr, cc),
            "prob": prob, "solar_za": za_cd, "solar_az": az_cd,
            "band_swir2": swir2, "band_green": green,
        }
    )
    docs = spark.createDataFrame(pdf).repartition(4)

    got = {
        int(r["doc_id"]): int(r["mask"])
        for r in mask_s2(
            docs, G, prob="prob", threshold=0.4, average_over=1,
            dilation_size=1, cloud_heights=(500.0,), nodata=0.0,
            nodata_bands=("band_swir2", "band_green"),
        ).collect()
    }
    assert len(got) == N * N

    # numpy mirror (partial windows at borders, like every focal oracle)
    P = prob.reshape(N, N)
    avg = np.zeros((N, N))
    for r in range(N):
        for c in range(N):
            w = P[max(r - 1, 0):r + 2, max(c - 1, 0):c + 2]
            avg[r, c] = w.mean()
    cl = (avg >= 0.4).astype(float)
    dil = np.zeros((N, N))
    for r in range(N):
        for c in range(N):
            dil[r, c] = cl[max(r - 1, 0):r + 2, max(c - 1, 0):c + 2].max()
    cloud = dil >= 0.5
    pot = np.zeros((N, N), bool)
    ys, xs = np.nonzero(cloud)
    for y, x in zip(ys + 2, xs):  # shift (2, 0)
        if 0 <= y < N:
            pot[y, x] = True
    g2 = green.reshape(N, N).copy()
    s2 = swir2.reshape(N, N).copy()
    with np.errstate(invalid="ignore", divide="ignore"):
        dark = np.clip((g2 - s2) / (g2 + s2), -1, 1)
    dark[(g2 == 0) | (s2 == 0)] = np.nan  # nodata=0 nulls the inputs
    shadow = pot & ~cloud & (dark >= 0.1)
    fill = (np.maximum(g2, s2) == 0.0)
    want = np.where(cloud, 4, np.where(shadow, 2, np.where(fill, 255, 0)))
    for d in range(N * N):
        r, c = divmod(d, N)
        assert got[d] == want[r, c], (r, c, got[d], want[r, c])
    # sanity: the planted block produced all four classes
    vals = set(got.values())
    assert vals == {0, 2, 4, 255}, vals
