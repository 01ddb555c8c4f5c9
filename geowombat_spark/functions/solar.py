"""Solar geometry — per-pixel solar zenith/azimuth as Column expressions.

Reference: ``/root/reference/src/geowombat/radiometry/angles.py``
(``landsat_pixel_angles`` / ``sentinel_pixel_angles``) produces per-pixel
solar/sensor angle rasters; the Landsat path shells out to the USGS ESPA
angle binaries and the Sentinel path parses ESA XML — both external. The
distributed analogue computes the SOLAR half of that surface analytically
(NOAA Global Monitoring Division solar-position algorithm, the public
"NOAA solar calculator" spreadsheet equations — accuracy ~0.01° for
1900–2100), per row, from (timestamp, lat, lon).

Spark shape: the whole chain is ONE projection of nested arithmetic /
trig — no UDF, no shuffle; Catalyst folds scene-constant inputs to
literals and the rest rides whole-stage codegen. At 100 TB this is a map
stage fused into whatever scan feeds it.

Both the engine and the DuckDB correctness oracle evaluate the SAME
expression strings (``CHAIN``): the Spark side binds them with ``F.expr``,
the oracle renders them as chained CTE columns — zero transcription drift
between engine and oracle by construction (the dialect subset used —
sin/cos/tan/asin/acos/radians/degrees/floor/%% — is common to both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (name, sql_expr) chain; placeholders {ts} unix seconds UTC, {lat}/{lon}
#: degrees. Names become columns; later exprs reference earlier names.
CHAIN: tuple[tuple[str, str], ...] = (
    # Julian century from the unix epoch (JD 2440587.5)
    ("_jc", "(({ts}) / 86400.0 + 2440587.5 - 2451545.0) / 36525.0"),
    # geometric mean longitude / anomaly of the sun (deg)
    ("_gmls", "(280.46646 + _jc * (36000.76983 + _jc * 0.0003032)) % 360.0"),
    ("_gmas", "357.52911 + _jc * (35999.05029 - 0.0001537 * _jc)"),
    # eccentricity of earth orbit
    ("_eeo", "0.016708634 - _jc * (0.000042037 + 0.0000001267 * _jc)"),
    # sun equation of center
    (
        "_eoc",
        "sin(radians(_gmas)) * (1.914602 - _jc * (0.004817 + 0.000014 * _jc))"
        " + sin(radians(2.0 * _gmas)) * (0.019993 - 0.000101 * _jc)"
        " + sin(radians(3.0 * _gmas)) * 0.000289",
    ),
    # sun true/apparent longitude (deg)
    ("_stl", "_gmls + _eoc"),
    ("_sal", "_stl - 0.00569 - 0.00478 * sin(radians(125.04 - 1934.136 * _jc))"),
    # mean/corrected obliquity of the ecliptic (deg)
    (
        "_moe",
        "23.0 + (26.0 + (21.448 - _jc * (46.815 + _jc * (0.00059 - _jc * 0.001813)))"
        " / 60.0) / 60.0",
    ),
    ("_oc", "_moe + 0.00256 * cos(radians(125.04 - 1934.136 * _jc))"),
    # solar declination (deg)
    ("_decl", "degrees(asin(sin(radians(_oc)) * sin(radians(_sal))))"),
    ("_vary", "tan(radians(_oc / 2.0)) * tan(radians(_oc / 2.0))"),
    # equation of time (minutes)
    (
        "_eqtime",
        "4.0 * degrees(_vary * sin(2.0 * radians(_gmls))"
        " - 2.0 * _eeo * sin(radians(_gmas))"
        " + 4.0 * _eeo * _vary * sin(radians(_gmas)) * cos(2.0 * radians(_gmls))"
        " - 0.5 * _vary * _vary * sin(4.0 * radians(_gmls))"
        " - 1.25 * _eeo * _eeo * sin(2.0 * radians(_gmas)))",
    ),
    # true solar time (minutes past local solar midnight)
    (
        "_tst",
        "(((({ts}) % 86400) / 60.0 + _eqtime + 4.0 * ({lon})) % 1440.0"
        " + 1440.0) % 1440.0",
    ),
    # hour angle (deg)
    ("_ha", "CASE WHEN _tst / 4.0 < 0.0 THEN _tst / 4.0 + 180.0 ELSE _tst / 4.0 - 180.0 END"),
    # solar zenith (deg)
    (
        "sza",
        "degrees(acos(sin(radians({lat})) * sin(radians(_decl))"
        " + cos(radians({lat})) * cos(radians(_decl)) * cos(radians(_ha))))",
    ),
    # solar azimuth (deg clockwise from north)
    (
        "saa",
        "CASE WHEN _ha > 0.0 THEN"
        " (degrees(acos(((sin(radians({lat})) * cos(radians(sza)))"
        " - sin(radians(_decl))) / (cos(radians({lat})) * sin(radians(sza)))))"
        " + 180.0) % 360.0"
        " ELSE (540.0 - degrees(acos(((sin(radians({lat})) * cos(radians(sza)))"
        " - sin(radians(_decl))) / (cos(radians({lat})) * sin(radians(sza))))))"
        " % 360.0 END",
    ),
)


def solar_angles(
    df: DataFrame,
    ts_col: str,
    lat_col: str,
    lon_col: str,
    zenith_out: str = "sza",
    azimuth_out: str = "saa",
    keep_intermediate: bool = False,
) -> DataFrame:
    """Append solar zenith/azimuth (degrees) computed from a UTC unix-seconds
    timestamp column and lat/lon degree columns — the solar layer of the
    reference's per-pixel angle rasters (``angles.py``), as one fused
    projection."""
    binds = {"ts": ts_col, "lat": lat_col, "lon": lon_col}
    names = []
    for name, expr in CHAIN:
        df = df.withColumn(name, F.expr(expr.format(**binds)))
        names.append(name)
    df = df.withColumnRenamed("sza", zenith_out).withColumnRenamed(
        "saa", azimuth_out
    )
    if not keep_intermediate:
        df = df.drop(*[n for n in names if n.startswith("_")])
    return df


def solar_sql(ts_expr: str, lat_expr: str, lon_expr: str) -> str:
    """Render the SAME chain as nested SQL SELECT layers (for the DuckDB
    oracle): returns a fragment ``SELECT *, sza, saa FROM ...`` expecting a
    relation named ``src`` in scope."""
    binds = {"ts": ts_expr, "lat": lat_expr, "lon": lon_expr}
    sql = "SELECT * FROM src"
    for name, expr in CHAIN:
        sql = f"SELECT *, {expr.format(**binds)} AS {name} FROM ({sql})"
    return sql
