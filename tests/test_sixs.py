"""6S LUT atmospheric correction tests (reference ``radiometry/sixs.py``).

The synthetic LUT's coefficients are closed-form functions of the node
coordinates, so every expected value here is recomputable by hand /
numpy independently of the Spark path.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from geowombat_spark.functions import sixs


def _np_coeffs(sza, h2o, o3, aot, alt):
    """Independent numpy recomputation of the synthetic coefficient set."""
    mu = math.cos(math.radians(sza))
    tau = (0.1 + 0.8 * aot) * math.exp(-alt / 8.0)
    tf = tau / (1.0 + tau)
    return {
        "t_g": math.exp(-0.05 * h2o - 0.02 * o3),
        "p_alpha": 0.12 * tf * (1.0 + 0.5 * (1.0 - mu)),
        "s_alb": 0.1 * tf,
        "t_s": math.exp(-0.5 * tau / mu),
        "t_v": math.exp(-0.5 * tau),
    }


@pytest.fixture(scope="module")
def lut(spark):
    df, grid = sixs.synthetic_lut(spark)
    df = df.cache()
    df.count()
    return df, grid


def test_synthetic_lut_nodes(lut):
    df, grid = lut
    assert df.count() == math.prod(grid.shape) == 4725
    row = df.filter(
        (F.col("sza") == 30.0)
        & (F.col("h2o") == 2.0)
        & (F.col("o3") == 2.0)
        & (F.col("aot") == 0.5)
        & (F.col("alt") == 2.0)
    ).collect()[0]
    exp = _np_coeffs(30.0, 2.0, 2.0, 0.5, 2.0)
    for c in sixs.COEFFS:
        assert row[c] == pytest.approx(exp[c], rel=1e-12)


def test_nearest_snaps_and_clamps(spark, lut):
    df, grid = lut
    px = spark.createDataFrame(
        [(1, 33.0), (2, 36.0), (3, 200.0), (4, -5.0)], "id long, sza double"
    )
    out = sixs.lut_coeffs_nearest(
        px, df, grid, sza="sza", h2o=2.0, o3=2.0, aot=0.5, alt=2.0
    )
    got = {r.id: r for r in out.collect()}
    # 33 -> node 30, 36 -> node 40, 200 clamps to 80, -5 clamps to 0
    for pid, node in [(1, 30.0), (2, 40.0), (3, 80.0), (4, 0.0)]:
        exp = _np_coeffs(node, 2.0, 2.0, 0.5, 2.0)
        for c in sixs.COEFFS:
            assert got[pid][f"six_{c}"] == pytest.approx(exp[c], rel=1e-12)


def test_linear_exact_at_nodes_and_midpoints(spark, lut):
    df, grid = lut
    px = spark.createDataFrame(
        [(1, 30.0, 2.0), (2, 35.0, 2.0), (3, 30.0, 3.0)],
        "id long, sza double, h2o double",
    )
    out = sixs.lut_coeffs_linear(
        px, df, grid, sza="sza", h2o="h2o", o3=2.0, aot=0.5, alt=2.0
    )
    got = {r.id: r for r in out.collect()}
    # exactly on a node -> node value
    exp = _np_coeffs(30.0, 2.0, 2.0, 0.5, 2.0)
    for c in sixs.COEFFS:
        assert got[1][f"six_{c}"] == pytest.approx(exp[c], rel=1e-12)
    # midpoint along one axis -> average of the two bracketing nodes
    for c in sixs.COEFFS:
        lo = _np_coeffs(30.0, 2.0, 2.0, 0.5, 2.0)[c]
        hi = _np_coeffs(40.0, 2.0, 2.0, 0.5, 2.0)[c]
        assert got[2][f"six_{c}"] == pytest.approx((lo + hi) / 2, rel=1e-12)
        lo = _np_coeffs(30.0, 2.0, 2.0, 0.5, 2.0)[c]
        hi = _np_coeffs(30.0, 4.0, 2.0, 0.5, 2.0)[c]
        assert got[3][f"six_{c}"] == pytest.approx((lo + hi) / 2, rel=1e-12)


def test_linear_preserves_input_schema(spark, lut):
    df, grid = lut
    px = spark.createDataFrame(
        [("a", 12.0, 250.5)], "doc_id string, sza double, band_blue double"
    )
    out = sixs.lut_coeffs_linear(px, df, grid, sza="sza")
    assert dict(out.dtypes)["doc_id"] == "string"
    assert dict(out.dtypes)["band_blue"] == "double"
    assert out.count() == 1


def test_toar_to_sr_hand_case(spark, lut):
    df, grid = lut
    doy = 182
    px = spark.createDataFrame(
        [(1, 30.0, 0.25), (2, 30.0, -999.0)],
        "id long, sza double, band_blue double",
    )
    out = sixs.lut_coeffs_nearest(
        px, df, grid, sza="sza", h2o=2.0, o3=2.0, aot=0.5, alt=2.0
    )
    out = sixs.toar_to_sr_sixs(
        out, ["band_blue"], doy, src_nodata=-999.0, dst_nodata=-32768.0
    )
    got = {r.id: r.band_blue for r in out.collect()}
    c = _np_coeffs(30.0, 2.0, 2.0, 0.5, 2.0)
    eoc = 0.03275104 * math.cos(doy / 59.66638337) + 0.96804905
    sr_s = ((0.25 / (c["t_g"] * eoc)) - c["p_alpha"] * eoc) / (
        c["t_s"] * eoc * c["t_v"] * eoc
    )
    exp = sr_s / (1.0 + c["s_alb"] * eoc * sr_s)
    exp = min(max(exp, 0.0), 1.0)
    assert got[1] == pytest.approx(exp, rel=1e-12)
    assert got[2] == -32768.0  # nodata passes through


def test_rad_to_sr_matches_manual_toar(spark, lut):
    df, grid = lut
    esun, d = 1536.0, 1.0146
    rad, sza = 120.0, 35.0
    px = spark.createDataFrame(
        [(1, sza, rad)], "id long, sza double, band_red double"
    )
    out = sixs.lut_coeffs_nearest(px, df, grid, sza="sza")
    out = sixs.rad_to_sr_sixs(
        out, {"band_red": (esun, d)}, 100, solar_za="sza"
    )
    got = out.collect()[0].band_red

    toar = math.pi * rad * d**2 / (esun * math.cos(math.radians(sza)))
    px2 = spark.createDataFrame(
        [(1, sza, toar)], "id long, sza double, band_red double"
    )
    out2 = sixs.lut_coeffs_nearest(px2, df, grid, sza="sza")
    out2 = sixs.toar_to_sr_sixs(out2, ["band_red"], 100)
    assert got == pytest.approx(out2.collect()[0].band_red, rel=1e-12)


def test_nearest_plan_is_broadcast(spark, lut):
    df, grid = lut
    px = spark.range(10).withColumn("sza", F.col("id") * 7.0)
    out = sixs.lut_coeffs_nearest(px, df, grid, sza="sza")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_linear_single_node_axis(spark):
    """A degenerate axis with one node must interpolate in bounds (its
    +1 corner has zero weight but used to gather out of range)."""
    from geowombat_spark.functions.sixs import LutAxis, LutGrid

    grid = sixs.LutGrid(
        sza=LutAxis("sza", 0.0, 10.0, 5),
        h2o=LutAxis("h2o", 2.0, 1.0, 1),   # single node
        o3=LutAxis("o3", 0.0, 2.0, 2),
        aot=LutAxis("aot", 0.0, 0.5, 3),
        alt=LutAxis("alt", 0.0, 2.0, 1),   # single node
    )
    lut, _ = sixs.synthetic_lut(spark, grid)
    px = spark.createDataFrame([(1, 25.0)], "id long, sza double")
    out = sixs.lut_coeffs_linear(
        px, lut, grid, sza="sza", h2o=2.0, o3=1.0, aot=0.25, alt=0.0
    )
    row = out.collect()[0]
    # midpoints on sza/o3/aot; h2o/alt pinned at their single node
    for c in sixs.COEFFS:
        lo_hi = [
            _np_coeffs(szav, 2.0, o3v, aotv, 0.0)[c]
            for szav in (20.0, 30.0)
            for o3v in (0.0, 2.0)
            for aotv in (0.0, 0.5)
        ]
        assert row[f"six_{c}"] == pytest.approx(
            sum(lo_hi) / len(lo_hi), rel=1e-12
        )


def test_toar_to_sr_sixs_sparse_lut_null_coeff_stays_null(spark):
    """A NULL coefficient row (sparse user LUT: lut_coeffs_nearest's left
    join misses absent nodes) must not clip a valid toar pixel to 0.0
    'valid black' — sr stays NULL (then dst_nodata, if given)."""
    import pandas as pd

    from geowombat_spark.functions.sixs import toar_to_sr_sixs

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "band_blue": [0.2, 0.2],
                "six_t_g": [0.9, None],
                "six_p_alpha": [0.01, None],
                "six_s_alb": [0.1, None],
                "six_t_s": [0.8, None],
                "six_t_v": [0.85, None],
            }
        )
    )
    out = toar_to_sr_sixs(df, ["band_blue"], doy=180).collect()
    vals = [r["band_blue"] for r in out]
    assert sum(v is None for v in vals) == 1
    good = [v for v in vals if v is not None][0]
    assert 0.0 < good < 1.0
    out2 = toar_to_sr_sixs(df, ["band_blue"], doy=180, dst_nodata=-1.0)
    assert sorted(r["band_blue"] for r in out2.collect())[0] == -1.0
