"""Sensor band-name resolution — the ``gw.open(..., sensor=...)`` LUT.

The reference renames the band coordinate from a sensor config on every
open (``/root/reference/src/geowombat/backends/xarray_.py:349-382``), using
the per-sensor wavelength namedtuples in
``src/geowombat/core/properties.py:60-470``. Band *order* in those tables
is the instrument's band order, so a positional rename is exact.

Here bands are DataFrame columns named ``band_<name>``; renaming is a
metadata-only ``select`` with aliases — zero cost at any scale (Catalyst
folds it into the scan's ReadSchema).

Precedence mirrors the reference: an explicit ``band_names`` argument wins
over ``sensor``; an unknown sensor warns and leaves names untouched
(``xarray_.py:356-363``); a band-count mismatch warns and leaves names
untouched (``xarray_.py:368-376``).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: instrument band order per sensor key (properties.py:186-470)
SENSOR_BANDS: dict[str, tuple[str, ...]] = {
    "rgb": ("red", "green", "blue"),
    "rgbn": ("red", "green", "blue", "nir"),
    "bgr": ("blue", "green", "red"),
    "bgrn": ("blue", "green", "red", "nir"),
    "l5": ("blue", "green", "red", "nir", "swir1", "swir2"),
    "l7": ("blue", "green", "red", "nir", "swir1", "swir2"),
    "l7th": ("blue", "green", "red", "nir", "swir1", "thermal", "swir2"),
    "l8": ("coastal", "blue", "green", "red", "nir", "swir1", "swir2", "cirrus"),
    "l9": ("coastal", "blue", "green", "red", "nir", "swir1", "swir2", "cirrus"),
    "l8l7": ("blue", "green", "red", "nir", "swir1", "swir2"),
    "l9l7": ("blue", "green", "red", "nir", "swir1", "swir2"),
    "l5bgrn": ("blue", "green", "red", "nir"),
    "l7bgrn": ("blue", "green", "red", "nir"),
    "l8bgrn": ("blue", "green", "red", "nir"),
    "l9bgrn": ("blue", "green", "red", "nir"),
    "l7pan": ("pan",),
    "l8pan": ("pan",),
    "l9pan": ("pan",),
    "s2": (
        "blue", "green", "red", "nir1", "nir2", "nir3", "nir",
        "rededge", "swir1", "swir2",
    ),
    "s2f": (
        "coastal", "blue", "green", "red", "nir1", "nir2", "nir3", "nir",
        "rededge", "water", "cirrus", "swir1", "swir2",
    ),
    "s220": ("nir1", "nir2", "nir3", "rededge", "swir1", "swir2"),
    "s2l7": ("blue", "green", "red", "nir", "swir1", "swir2"),
    "ps": ("blue", "green", "red", "nir"),
    "qb": ("blue", "green", "red", "nir"),
    "ik": ("blue", "green", "red", "nir"),
}
SENSOR_BANDS["s2a"] = SENSOR_BANDS["s2b"] = SENSOR_BANDS["s2c"] = SENSOR_BANDS["s2"]
SENSOR_BANDS["s2af"] = SENSOR_BANDS["s2bf"] = SENSOR_BANDS["s2cf"] = SENSOR_BANDS["s2f"]

#: display names (properties.py get_sensor_info(key='name'))
SENSOR_NAMES: dict[str, str] = {
    "rgb": "red, green, and blue",
    "rgbn": "red, green, blue, and NIR",
    "bgr": "blue, green, and red",
    "bgrn": "blue, green, red, and NIR",
    "l5": "Landsat 5 Thematic Mapper (TM)",
    "l7": "Landsat 7 Enhanced Thematic Mapper Plus (ETM+)",
    "l8": "Landsat 8 Operational Land Imager (OLI) and Thermal Infrared Sensor (TIRS)",
    "l9": "Landsat 9 Operational Land Imager (OLI) and Thermal Infrared Sensor (TIRS)",
    "s2": "Sentinel 2 Multi-Spectral Instrument (MSI)",
    "s2a": "Sentinel 2A Multi-Spectral Instrument (MSI)",
    "s2b": "Sentinel 2B Multi-Spectral Instrument (MSI)",
    "ps": "PlanetScope",
    "qb": "Quickbird",
    "ik": "IKONOS",
}

#: central wavelengths in micrometers, instrument order (properties.py:155-470)
CENTRAL_WAVELENGTH: dict[str, dict[str, float]] = {
    "l5": {"blue": 0.485, "green": 0.56, "red": 0.66, "nir": 0.835,
           "swir1": 1.65, "swir2": 2.22},
    "l7": {"blue": 0.485, "green": 0.56, "red": 0.66, "nir": 0.835,
           "swir1": 1.65, "swir2": 2.22},
    "l8": {"coastal": 0.44, "blue": 0.48, "green": 0.56, "red": 0.655,
           "nir": 0.865, "swir1": 1.61, "swir2": 2.2, "cirrus": 1.37},
    "l9": {"coastal": 0.44, "blue": 0.48, "green": 0.56, "red": 0.655,
           "nir": 0.865, "swir1": 1.61, "swir2": 2.2, "cirrus": 1.37},
    "s2": {"blue": 0.4924, "green": 0.5598, "red": 0.6646, "nir1": 0.7041,
           "nir2": 0.7405, "nir3": 0.7828, "nir": 0.8328, "rededge": 0.8647,
           "swir1": 1.6137, "swir2": 2.2024},
}

BAND_PREFIX = "band_"


def avail_sensors() -> list[str]:
    return sorted(SENSOR_BANDS)


def band_columns(df: DataFrame, prefix: str = BAND_PREFIX) -> list[str]:
    """Band columns in schema order (the positional 'band coordinate')."""
    return [c for c in df.columns if c.startswith(prefix)]


def rename_bands(
    df: DataFrame,
    sensor: str | None = None,
    band_names: tuple[str, ...] | list[str] | None = None,
    prefix: str = BAND_PREFIX,
) -> DataFrame:
    """Rename band columns positionally to sensor / explicit names.

    Explicit ``band_names`` wins over ``sensor`` (``xarray_.py:349-354``).
    Unknown sensor or band-count mismatch warns and returns ``df``
    unchanged, matching the reference's non-fatal behavior.
    """
    cur = band_columns(df, prefix)
    if band_names is not None:
        target = list(band_names)[: len(cur)]
        # reference truncates band_names to nbands (xarray_.py:350-352)
        if len(target) < len(cur):
            warnings.warn(
                f"{len(band_names)} band names for {len(cur)} bands — "
                "renaming the leading bands only",
                stacklevel=2,
            )
            target += [c[len(prefix):] for c in cur[len(target):]]
    elif sensor is not None:
        if sensor not in SENSOR_BANDS:
            warnings.warn(
                f"The {sensor} sensor is not currently supported.\n"
                f"Choose from [{', '.join(avail_sensors())}].",
                stacklevel=2,
            )
            return df
        target = list(SENSOR_BANDS[sensor])
        if len(target) != len(cur):
            warnings.warn(
                f"The new bands, {target}, do not match the "
                f"sensor bands, {cur}.",
                stacklevel=2,
            )
            return df
    else:
        return df
    mapping = dict(zip(cur, [f"{prefix}{t}" for t in target]))
    return df.select(
        *[
            F.col(c).alias(mapping[c]) if c in mapping else F.col(c)
            for c in df.columns
        ]
    )
