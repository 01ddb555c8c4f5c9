"""Radiometry scalar functions — pure Column expressions (no UDF).

Reference: ``/root/reference/src/geowombat/radiometry/sr.py`` (RadTransforms
``dn_to_radiance`` :746-789, ``radiance_to_toar`` :791-828, ``dn_to_toar``
:830-873, ``LinearAdjustments.bandpass`` :413-614) and ``radiometry/qa.py``
(``QAMasker.to_mask`` :68-344 — bit unpacking with ``shiftright``/``&``).

These are the per-pixel physics transforms of §2.13 — inventoried there as
"expressible as Column expressions"; this module is that expression set.
Everything constant-folds under Catalyst (coefficients are plan-time
literals), so the whole family rides inside whole-stage codegen.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dn_to_radiance(
    df: DataFrame, bands: dict[str, tuple[float, float]]
) -> DataFrame:
    """DN → at-sensor radiance: ``L = ml*DN + al`` per band
    (``sr.py:746-789``). ``bands`` maps column → (ml gain, al bias)."""
    for b, (ml, al) in bands.items():
        df = df.withColumn(
            b, F.col(b).cast("double") * F.lit(float(ml)) + F.lit(float(al))
        )
    return df


def radiance_to_toar(
    df: DataFrame,
    bands: dict[str, float],
    solar_zenith_deg: float,
    earth_sun_dist: float = 1.0,
) -> DataFrame:
    """Radiance → top-of-atmosphere reflectance:
    ``rho = (pi * L * d^2) / (esun * cos(theta_s))`` (``sr.py:791-828``).
    ``bands`` maps column → esun. Zenith is a scene constant, so the whole
    factor folds to one literal multiply per band."""
    cos_t = math.cos(math.radians(solar_zenith_deg))
    d2 = earth_sun_dist * earth_sun_dist
    for b, esun in bands.items():
        factor = math.pi * d2 / (float(esun) * cos_t)
        df = df.withColumn(b, F.col(b).cast("double") * F.lit(factor))
    return df


def dn_to_toar(
    df: DataFrame, bands: dict[str, tuple[float, float]], clip: bool = True
) -> DataFrame:
    """DN → TOAR with the reflectance rescaling coefficients:
    ``rho = mp*DN + ap`` (``sr.py:830-873``), optionally clipped to [0, 1]."""
    for b, (mp, ap) in bands.items():
        c = F.col(b).cast("double") * F.lit(float(mp)) + F.lit(float(ap))
        if clip:
            c = F.least(F.greatest(c, F.lit(0.0)), F.lit(1.0))
        df = df.withColumn(b, c)
    return df


def bandpass(
    df: DataFrame, bands: dict[str, tuple[float, float]]
) -> DataFrame:
    """Cross-sensor bandpass adjustment: ``b' = alpha + beta*b`` per band
    (``sr.py:413-614`` — coefficient LUTs become plan-time literals)."""
    for b, (alpha, beta) in bands.items():
        df = df.withColumn(
            b, F.lit(float(alpha)) + F.lit(float(beta)) * F.col(b).cast("double")
        )
    return df


# Landsat-8 C1 pixel_qa–style bit layout (the shape used by QAMasker,
# ``qa.py:112-169``): single bits for fill/clear/water, 2-bit confidence
# pairs for cloud shadow / snow / cloud.
QA_BITS_L8 = {
    "fill": (0, 1),
    "clear": (1, 1),
    "water": (2, 1),
    "shadow_conf": (3, 2),
    "snow_conf": (5, 2),
    "cloud_conf": (7, 2),
}


def qa_unpack(
    df: DataFrame, qa_col: str, bits: dict[str, tuple[int, int]] = None
) -> DataFrame:
    """Unpack a packed QA integer band into one column per flag:
    ``(qa >> offset) & (2^width - 1)`` (``qa.py:68-344``)."""
    bits = bits or QA_BITS_L8
    for name, (offset, width) in bits.items():
        df = df.withColumn(
            name,
            F.shiftright(F.col(qa_col).cast("long"), offset).bitwiseAND(
                (1 << width) - 1
            ),
        )
    return df


def qa_mask(
    df: DataFrame,
    qa_col: str,
    keep_clear: bool = True,
    max_cloud_conf: int = 1,
    bits: dict[str, tuple[int, int]] = None,
) -> DataFrame:
    """QAMasker-style boolean mask: 1 = usable pixel. Clear set and cloud
    confidence at or below ``max_cloud_conf`` (``qa.py:236-344``)."""
    bits = bits or QA_BITS_L8
    df = qa_unpack(df, qa_col, bits)
    cond = F.col("cloud_conf") <= F.lit(max_cloud_conf)
    if keep_clear:
        cond = cond & (F.col("clear") == 1)
    cond = cond & (F.col("fill") == 0)
    return df.withColumn("qa_ok", F.when(cond, F.lit(1)).otherwise(F.lit(0)))
