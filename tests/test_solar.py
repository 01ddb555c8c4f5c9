"""Solar position (functions/solar.py): NOAA chain vs semi-analytic facts,
and Spark-vs-DuckDB identity of the shared expression chain."""

import datetime as dt

import duckdb
import numpy as np
import pandas as pd

from geowombat_spark.functions.solar import solar_angles, solar_sql


def _ts(y, mo, d, h, mi=0):
    return dt.datetime(y, mo, d, h, mi, tzinfo=dt.timezone.utc).timestamp()


def test_solar_semi_analytic(spark):
    rows = pd.DataFrame(
        {
            "pix": [0, 1, 2, 3],
            "ts": [
                _ts(2024, 3, 20, 12),  # equinox noon, equator
                _ts(2024, 6, 20, 12),  # June solstice
                _ts(2024, 3, 20, 12),  # 45N equinox noon
                _ts(2024, 3, 20, 15),  # 45N afternoon
            ],
            "lat": [0.0, 0.0, 45.0, 45.0],
            "lon": [0.0, 0.0, 0.0, 0.0],
        }
    )
    out = (
        solar_angles(
            spark.createDataFrame(rows), "ts", "lat", "lon",
            keep_intermediate=True,
        )
        .orderBy("pix")
        .toPandas()
    )
    # equinox: |declination| < 0.5 deg; noon zenith at equator small
    assert abs(out.loc[0, "_decl"]) < 0.5
    assert out.loc[0, "sza"] < 3.0
    # June solstice declination ~ +23.44
    assert abs(out.loc[1, "_decl"] - 23.44) < 0.05
    # 45N true-noon zenith == lat - decl (solar noon within ~8 min of 12 UTC)
    assert abs(out.loc[2, "sza"] - (45.0 - out.loc[2, "_decl"])) < 0.15
    # afternoon sun is west of south (az > 180), morning would be < 180
    assert out.loc[3, "saa"] > 180.0


def test_solar_spark_matches_duckdb(spark):
    """The engine and the oracle evaluate the SAME chain text — results
    must agree to float noise across a broad (ts, lat, lon) sweep."""
    rng = np.random.RandomState(3)
    n = 200
    rows = pd.DataFrame(
        {
            "ts": _ts(2020, 1, 1, 0) + rng.randint(0, 5 * 365 * 86400, n).astype(float),
            "lat": rng.uniform(-60, 60, n),
            "lon": rng.uniform(-180, 180, n),
        }
    )
    got = (
        solar_angles(spark.createDataFrame(rows), "ts", "lat", "lon")
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("src", rows)
    exp = (
        con.sql(solar_sql("ts", "lat", "lon"))
        .df()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert np.allclose(got["sza"], exp["sza"], atol=1e-9)
    assert np.allclose(got["saa"], exp["saa"], atol=1e-9)
    # sanity: zenith in [0, 180], azimuth in [0, 360)
    assert got["sza"].between(0, 180).all()
    assert got["saa"].between(0, 360).all()
