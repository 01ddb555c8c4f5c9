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

from pyspark.sql import Column, DataFrame
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
    factor folds to one literal multiply per band.

    DOCUMENTED DEVIATION: the reference evaluates ``cos(solar_za * 0.01)``
    on its centidegree-scaled angle without a deg→rad conversion
    (``sr.py:815-826``) — i.e. cosine of a DEGREE value. The physical
    formula needs radians; this implementation uses
    ``cos(radians(zenith))``, so outputs differ from the reference for any
    nonzero zenith by design (correctness over bug parity)."""
    cos_t = math.cos(math.radians(solar_zenith_deg))
    d2 = earth_sun_dist * earth_sun_dist
    for b, esun in bands.items():
        factor = math.pi * d2 / (float(esun) * cos_t)
        df = df.withColumn(b, F.col(b).cast("double") * F.lit(factor))
    return df


def dn_to_toar(
    df: DataFrame,
    bands: dict[str, tuple[float, float]],
    clip: bool = True,
    solar_za: str | None = None,
    angle_factor: float = 0.01,
    sun_angle: bool = True,
) -> DataFrame:
    """DN → TOAR with the reflectance rescaling coefficients:
    ``rho = mp*DN + ap`` (``sr.py:830-873``), then the reference's
    sun-angle correction ``rho / cos(deg2rad(solar_za * angle_factor))``
    (``sr.py:846-862``, on by default there too) when ``solar_za`` names
    the zenith column, and finally the optional [0, 1] clip (the clip is
    this port's addition; it applies AFTER the correction so the bound
    holds on the published value).

    Mirroring the reference: ``sun_angle=True`` with no ``solar_za``
    raises (the reference raises ``NameError``); pass ``sun_angle=False``
    for the uncorrected rescale.
    """
    if sun_angle and solar_za is None:
        raise ValueError(
            "dn_to_toar: sun_angle=True requires the solar_za column "
            "(reference sr.py:850-855 raises the same way); pass "
            "sun_angle=False for the uncorrected rescale"
        )
    cos_sza = (
        F.cos(F.radians(_ang(solar_za, angle_factor))) if sun_angle else None
    )
    for b, (mp, ap) in bands.items():
        c = F.col(b).cast("double") * F.lit(float(mp)) + F.lit(float(ap))
        if sun_angle:
            c = c / cos_sza
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
# Landsat Collection-1 L8 BQA layout — the reference's 'l8-c1' table
# (``qa.py:248-256``, stored there as (high_bit, low_bit) pairs; same
# flags re-expressed as (offset, width)): fill 0, terrain 1, saturation
# 2-3, cloud 4, cloud_conf 5-6, shadow_conf 7-8, snowice_conf 9-10,
# cirrus_conf 11-12. (An earlier table here put clear/water bits and
# shifted confidences — a hybrid matching neither the reference nor the
# USGS C1 BQA; real products decoded straddled fields.)
QA_BITS_L8 = {
    "fill": (0, 1),
    "terrain": (1, 1),
    "saturated": (2, 2),
    "cloud": (4, 1),
    "cloud_conf": (5, 2),
    "shadow_conf": (7, 2),
    "snowice_conf": (9, 2),
    "cirrus_conf": (11, 2),
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
    """QAMasker-style boolean mask: 1 = usable pixel — not fill, cloud
    confidence at or below ``max_cloud_conf``, and (``keep_clear``) the
    cloud bit unset (``qa.py:236-344``; C1 BQA has no 'clear' bit — clear
    IS the absence of the cloud flag)."""
    bits = bits or QA_BITS_L8
    df = qa_unpack(df, qa_col, bits)
    # build the usability test from the flags the LAYOUT actually carries:
    # e.g. QA_BITS_LANDSAT_C2_L2 / QA_BITS_HLS_FMASK have no 'cloud_conf'
    # field, and referencing it unconditionally would raise
    # UNRESOLVED_COLUMN for layouts this same module exports
    parts = []
    if "cloud_conf" in bits:
        parts.append(F.col("cloud_conf") <= F.lit(max_cloud_conf))
    if keep_clear and "cloud" in bits:
        parts.append(F.col("cloud") == 0)
    if "fill" in bits:
        parts.append(F.col("fill") == 0)
    if not parts:
        raise ValueError(
            "qa_mask: the bits layout carries none of the flags the mask "
            "is built from (cloud_conf/cloud/fill) — a vacuous all-usable "
            "mask would be silently wrong"
        )
    cond = parts[0]
    for p in parts[1:]:
        cond = cond & p
    return df.withColumn("qa_ok", F.when(cond, F.lit(1)).otherwise(F.lit(0)))


# Published cross-sensor bandpass regression coefficients (band →
# (alpha intercept, beta slope)): Sentinel-2A/B → L8 and L5/L7 → L8, the
# HLS-style adjustments of the reference's LinearAdjustments LUT
# (``sr.py:413-520``; Chastain et al. 2019, HLS v1.4 ATBD). Data parity
# values, cited like the geometry fixtures.
BANDPASS_COEFFS: dict[tuple[str, str], dict[str, tuple[float, float]]] = {
    ("s2a", "l8"): {
        "coastal": (-0.0002, 0.9959),
        "blue": (-0.004, 0.9778),
        "green": (-0.0009, 1.0053),
        "red": (0.0009, 0.9765),
        "nir": (-0.0001, 0.9983),
        "swir1": (-0.0011, 0.9987),
        "swir2": (-0.0012, 1.003),
    },
    ("s2b", "l8"): {
        "coastal": (-0.0002, 0.9959),
        "blue": (-0.004, 0.9778),
        "green": (-0.0008, 1.0075),
        "red": (0.001, 0.9761),
        "nir": (0.0, 0.9966),
        "swir1": (-0.0003, 1.0),
        "swir2": (0.0004, 0.9867),
    },
    ("l5", "l8"): {
        "blue": (-0.0095, 0.9785),
        "green": (-0.0016, 0.9542),
        "red": (-0.0022, 0.9825),
        "nir": (-0.0021, 1.0073),
        "swir1": (-0.003, 1.0171),
        "swir2": (0.0029, 0.9949),
        "pan": (-0.00443, 0.9717),
    },
    ("l7", "l8"): {
        "blue": (-0.0095, 0.9785),
        "green": (-0.0016, 0.9542),
        "red": (-0.0022, 0.9825),
        "nir": (-0.0021, 1.0073),
        "swir1": (-0.003, 1.0171),
        "swir2": (0.0029, 0.9949),
        "pan": (-0.00443, 0.9717),
    },
}


def bandpass_to(
    df: DataFrame,
    sensor: str,
    to: str = "l8",
    band_prefix: str = "band_",
) -> DataFrame:
    """``LinearAdjustments.bandpass`` with the published LUT
    (``sr.py:520-614``): adjust every ``band_<name>`` column that has a
    coefficient pair for (``sensor`` → ``to``). Raises KeyError for an
    unknown sensor pair, like the reference's None entries."""
    coeffs = BANDPASS_COEFFS[(sensor, to)]
    mapped = {
        f"{band_prefix}{b}": ab
        for b, ab in coeffs.items()
        if f"{band_prefix}{b}" in df.columns
    }
    return bandpass(df, mapped)


# Landsat Collection-2 Level-2 QA_PIXEL single-bit layout
# (``qa.py:8-25`` QABits.landsat_c2_l2; USGS Landsat project documents).
QA_BITS_LANDSAT_C2_L2 = {
    "fill": (0, 1),
    "dilated_cloud": (1, 1),
    "cirrus": (2, 1),
    "cloud": (3, 1),
    "cloud_shadow": (4, 1),
    "snow": (5, 1),
    "clear": (6, 1),
    "water": (7, 1),
}

# HLS Fmask uint8 single-bit layout (``qa.py:51-66`` HLSFmaskBits.hls;
# HLS User Guide V2.0).
QA_BITS_HLS_FMASK = {
    "cirrus": (0, 1),
    "cloud": (1, 1),
    "adjacent_cloud": (2, 1),
    "cloud_shadow": (3, 1),
    "snow_ice": (4, 1),
    "water": (5, 1),
}

# Sentinel-2 L2A Scene Classification Layer class values (``qa.py:27-49``
# SCLValues.sentinel_s2_l2a; ESA S2 L2A algorithm overview). The SCL is a
# class raster, not a bit pack — mask by value membership.
SCL_VALUES = {
    "no_data": 0,
    "saturated_defective": 1,
    "dark_area": 2,
    "cloud_shadow": 3,
    "vegetation": 4,
    "not_vegetated": 5,
    "water": 6,
    "unclassified": 7,
    "cloud_medium_prob": 8,
    "cloud_high_prob": 9,
    "thin_cirrus": 10,
    "snow_ice": 11,
}

#: QAMasker's sensor → layout dispatch (``qa.py:69-344``); 'l8-c1' is the
#: confidence-pair layout QA_BITS_L8 above. (offset, width) layouts; the
#: reference stores (high_bit, low_bit) pairs — same flags, re-expressed.
QA_SENSOR_BITS = {
    "l8-c1": QA_BITS_L8,
    "landsat-c2-l2": QA_BITS_LANDSAT_C2_L2,
    "hls": QA_BITS_HLS_FMASK,
    # USGS Landsat ARD single-bit layout (``qa.py:268-275``)
    "ard": {
        "fill": (0, 1),
        "clear": (1, 1),
        "water": (2, 1),
        "shadow": (3, 1),
        "snow": (4, 1),
        "cloud": (5, 1),
    },
    # MODIS MOD09GA 1-km state flags (``qa.py:276-282``); landwater is the
    # 2-bit land/water class
    "modis-state": {
        "cloud": (0, 1),
        "daynight": (3, 1),
        "sunglint": (4, 1),
        "snowice": (5, 1),
        "landwater": (6, 2),
    },
    # Sentinel-2 L1C TOA QA60 opaque/cirrus bits (``qa.py:283-284``) —
    # named 's2-toa' here because 's2a'/'s2c' dispatch to the L2A SCL
    # class raster in qa_masker
    "s2-toa": {
        "cloud": (10, 1),
        "cirrus": (11, 1),
    },
}


def qa_masker(
    df: DataFrame,
    qa_col: str,
    sensor: str,
    mask_items: tuple[str, ...],
    out: str = "qa_ok",
) -> DataFrame:
    """``QAMasker.to_mask`` analogue (``qa.py:68-344``): 1 = usable pixel,
    0 = any requested ``mask_items`` flag fires. Bit-pack sensors
    (``QA_SENSOR_BITS``) test single bits; ``sensor='s2a'``/``'scl'``
    treats ``qa_col`` as the SCL class raster and masks by membership in
    the named classes. One Column expression — no UDF, codegen-folded."""
    if sensor in ("s2a", "s2c", "scl"):
        vals = [SCL_VALUES[m] for m in mask_items]
        bad = F.col(qa_col).cast("int").isin(vals)
    else:
        bits = QA_SENSOR_BITS[sensor]
        bad = F.lit(False)
        for m in mask_items:
            offset, width = bits[m]
            flag = F.shiftright(F.col(qa_col).cast("long"), offset).bitwiseAND(
                (1 << width) - 1
            )
            # 1-bit flags and multi-bit CLASS fields (e.g. modis-state
            # landwater): any set bit fires. 2-bit CONFIDENCE fields
            # (reference conf_dict: notdet=0, no=1, maybe=2, yes=3): only
            # maybe/yes indicate presence — level 1 explicitly means 'no'
            # and must NOT mask the pixel.
            is_conf = width >= 2 and m.endswith("_conf")
            bad = bad | (flag >= (2 if is_conf else 1))
    return df.withColumn(out, F.when(bad, F.lit(0)).otherwise(F.lit(1)))


# ---------------------------------------------------------------------------
# Surface reflectance (SREM) — toar_to_sr / dn_to_sr
# ---------------------------------------------------------------------------

RAYLEIGH_A = 0.9587256  # sr.py:1116 — Rayleigh phase constants


def rayleigh_optical_depth(um: float, um_scale: float = 1000.0) -> float:
    """Rayleigh optical depth for a central wavelength (Hansen & Travis
    1974 eq. 2.30; ``sr.py:1098-1103``). The reference feeds the central
    wavelength scaled by 1000 (``sr.py:1049``) — that scaling is the
    default for bit parity; pass ``um_scale=1.0`` for the formula's
    physical µm input (τ ≈ 0.16 at 0.48 µm instead of ≈ 0)."""
    u = um * um_scale
    return 0.008569 * u**-4 * (1.0 + 0.0113 * u**-2 + 0.0013 * u**-4)


def _ang(v, angle_factor: float):
    """Angle operand → degrees Column: a column name scales per pixel, a
    number becomes a plan-time literal (scene-constant angles fold into
    codegen constants)."""
    if isinstance(v, str):
        return F.col(v).cast("double") * F.lit(float(angle_factor))
    if isinstance(v, Column):
        return v.cast("double") * F.lit(float(angle_factor))
    return F.lit(float(v) * float(angle_factor))


def toar_to_sr(
    df: DataFrame,
    bands: dict[str, float],
    solar_za,
    solar_az,
    sensor_za,
    sensor_az,
    angle_factor: float = 0.01,
    src_nodata: float | None = None,
    dst_nodata: float | None = None,
    um_scale: float = 1000.0,
) -> DataFrame:
    """TOAR → surface reflectance via SREM (``sr.py:950-1160``; Bilal et
    al. 2019). ``bands`` maps band column → central wavelength (µm).

    Angle args are column names (per-pixel angle bands, scaled by
    ``angle_factor`` like the reference's int×100 storage) or plain
    numbers (scene constants). Every step is Column arithmetic — air
    mass, Rayleigh phase, path reflectance, two-way transmittance,
    backscatter ratio — so the whole correction runs in whole-stage
    codegen with zero Python in the executor path.

    Notes on exact parity: ``cos(scattering_angle)² = x²`` for
    ``x = -cosθs·cosθv - sinθs·sinθv·cos(Δφ)`` (cos∘arccos), and the
    reference's azimuth wrap + abs (``angles.py:252-275``) is a no-op
    under cosine, so ``cos(Δφ)`` is computed directly.
    """
    sza = F.radians(_ang(solar_za, angle_factor))
    vza = F.radians(_ang(sensor_za, angle_factor))
    saa = _ang(solar_az, angle_factor)
    vaa = _ang(sensor_az, angle_factor)
    cos_sza, sin_sza = F.cos(sza), F.sin(sza)
    cos_vza, sin_vza = F.cos(vza), F.sin(vza)
    cos_raa = F.cos(F.radians(saa - vaa))
    air_mass = 1.0 / cos_sza + 1.0 / cos_vza
    x = -cos_sza * cos_vza - sin_sza * sin_vza * cos_raa
    rphase = ((3.0 * RAYLEIGH_A) / (4.0 + (1.0 - RAYLEIGH_A))) * (
        F.lit(1.0) + x * x
    )

    def t_sv(r: float, cos_z):
        e1 = F.exp(-F.lit(r) / cos_z)
        e2 = F.exp(F.lit(0.52 * r) / cos_z)
        return e1 + e1 * (e2 - F.lit(1.0))

    for b, um in bands.items():
        r = rayleigh_optical_depth(float(um), um_scale)
        toar = F.col(b).cast("double")
        if src_nodata is not None:
            toar = F.nullif(toar, F.lit(float(src_nodata)))
        p_r = rphase * (
            (F.lit(1.0) - F.exp(-air_mass * F.lit(r)))
            / (F.lit(4.0) * (cos_sza + cos_vza))
        )
        toar_diff = toar - p_r
        transmission = t_sv(r, cos_sza) * t_sv(r, cos_vza)
        s_atm = 0.92 * r * math.exp(-r)
        raw_sr = toar_diff / (toar_diff * F.lit(s_atm) + transmission)
        # NULL-preserving clip: least/greatest SKIP nulls, so clipping a
        # NULL (src_nodata) pixel directly would emit 0.0 "valid black"
        # and starve the dst_nodata coalesce below
        sr = F.when(
            raw_sr.isNull(), F.lit(None).cast("double")
        ).otherwise(F.least(F.greatest(raw_sr, F.lit(0.0)), F.lit(1.0)))
        if dst_nodata is not None:
            sr = F.coalesce(sr, F.lit(float(dst_nodata)))
        df = df.withColumn(b, sr)
    return df


def dn_to_sr(
    df: DataFrame,
    coeffs: dict[str, tuple[float, float]],
    wavelengths: dict[str, float],
    solar_za,
    solar_az,
    sensor_za,
    sensor_az,
    angle_factor: float = 0.01,
    src_nodata: float | None = None,
    dst_nodata: float | None = None,
    um_scale: float = 1000.0,
) -> DataFrame:
    """DN → surface reflectance, the SREM chain (``sr.py:615-800``):
    ``dn_to_toar`` with sun-angle correction (ρ = (mp·DN + ap)/cosθs,
    ``sr.py:846-862``) then :func:`toar_to_sr`. ``coeffs`` maps band →
    (mp gain, ap bias); ``wavelengths`` maps band → central µm."""
    cos_sza = F.cos(F.radians(_ang(solar_za, angle_factor)))
    for b, (mp, ap) in coeffs.items():
        dn = F.col(b).cast("double")
        if src_nodata is not None:
            dn = F.nullif(dn, F.lit(float(src_nodata)))
        df = df.withColumn(
            b, (dn * F.lit(float(mp)) + F.lit(float(ap))) / cos_sza
        )
    return toar_to_sr(
        df,
        wavelengths,
        solar_za,
        solar_az,
        sensor_za,
        sensor_az,
        angle_factor=angle_factor,
        src_nodata=None,  # already nulled above
        dst_nodata=dst_nodata,
        um_scale=um_scale,
    )


def toar_to_rad(
    df,
    bands: dict[str, tuple[float, float]],
    julian_day: int,
) -> DataFrame:
    """TOA reflectance → TOA radiance (``sr.py:895-948``):
    ``L = toar·10000 · cos(vza) · esun / (π·d2) · 0.0001`` with the ESA
    earth–sun distance term ``d2 = 1/(1 - 0.0167·cos(0.0172·(jd-2)))²``.
    ``bands`` maps column → (esun solar irradiance, mean view zenith in
    degrees — the reference's per-band nanmean of the VZA grid). All terms
    are scene constants, so each band folds to one literal multiply."""
    d2 = 1.0 / ((1.0 - 0.0167 * math.cos(0.0172 * (julian_day - 2.0))) ** 2)
    for b, (esun, vza_deg) in bands.items():
        factor = (
            10000.0
            * math.cos(math.radians(float(vza_deg)))
            * float(esun)
            / (math.pi * d2)
        ) * 0.0001
        df = df.withColumn(b, F.col(b).cast("double") * F.lit(factor))
    return df


# ---------------------------------------------------------------------------
# DOS — dark-object atmospheric correction
# ---------------------------------------------------------------------------
#
# Reference: ``sr.py:1160-1336`` (``DOS.get_aot``). The reference selects
# dark pixels by SWIR2 TOAR in [0.01, 0.15], estimates the blue surface
# reflectance of those pixels as 0.33·swir2 (Masek et al. 2006), and
# inverts a SixS LUT for AOT. The LUT inversion needs the external SixS
# binaries/LUT files (declared out of scope in SURVEY §2.13); the
# distributed rebuild keeps the selection + linear-estimate stages and the
# classical Chavez (1988) dark-object subtraction they feed:
#
# - ``dark_object_values``: per-band dark-object level — ONE aggregate
#   (exact min, or an exact percentile for robustness) over the whole
#   scene, a single partial-agg shuffle at any scale.
# - ``dos_correct``: haze_b = dark_b − dark_target (the 1%-reflectance
#   dark-object assumption), corrected = clip(band − haze_b). Haze levels
#   are plan-time literals, so the correction itself is pure codegen.
# - ``dos_aot_tiles``: the reference's dark-pixel selection as a per-tile
#   aggregate — AOT *proxy* = mean excess of blue TOAR over the
#   0.33·swir2 surface estimate among dark pixels, with the reference's
#   ``aot_fallback`` where a tile has no dark pixels.


def dark_object_values(
    df: DataFrame, bands: tuple[str, ...], pct: float | None = None
) -> dict[str, float]:
    """Per-band dark-object level in one distributed aggregate.

    ``pct=None`` → exact minimum (classical DOS); a float in (0, 1) → the
    exact interpolated percentile (robust to a single bad pixel; both
    engines — Spark ``percentile`` and DuckDB ``quantile_cont`` — use the
    same linear interpolation). One job regardless of band count."""
    if pct is None:
        aggs = [F.min(F.col(b).cast("double")).alias(b) for b in bands]
    else:
        aggs = [
            F.percentile(F.col(b).cast("double"), F.lit(float(pct))).alias(b)
            for b in bands
        ]
    row = df.agg(*aggs).collect()[0]
    dark = {}
    for b in bands:
        if row[b] is None:
            raise ValueError(
                f"dark_object_values: no non-null pixels for {b!r} — the "
                "input is empty or fully masked; correct before DOS"
            )
        dark[b] = float(row[b])
    return dark


def dos_correct(
    df: DataFrame,
    bands: tuple[str, ...],
    pct: float | None = None,
    dark_target: float = 0.01,
    clip: bool = True,
    src_nodata: float | None = None,
    dst_nodata: float | None = None,
) -> DataFrame:
    """Chavez (1988) dark-object subtraction over TOAR bands.

    ``haze_b = dark_object_b − dark_target`` (dark objects are assumed to
    hold ``dark_target`` true reflectance — the classical 1% assumption),
    ``corrected = band − haze_b`` clipped to [0, 1]. The haze levels come
    from :func:`dark_object_values` (one aggregate job); the per-pixel
    correction is a literal subtract per band — whole-stage codegen, no
    second shuffle.

    ``src_nodata`` pixels are nulled BEFORE the dark-object aggregate (so
    a nodata sentinel can never masquerade as the scene's dark object) and
    the clip is NULL-preserving (``least``/``greatest`` skip NULLs, so a
    bare clip would turn a nodata pixel into 0.0 "valid black" — same
    pattern as :func:`toar_to_sr`). ``dst_nodata`` re-flags NULL output."""
    work = df
    if src_nodata is not None:
        work = work.withColumns(
            {
                b: F.nullif(F.col(b).cast("double"), F.lit(float(src_nodata)))
                for b in bands
            }
        )
    dark = dark_object_values(work, bands, pct)
    for b in bands:
        haze = dark[b] - float(dark_target)
        src = F.col(b).cast("double")
        if src_nodata is not None:
            src = F.nullif(src, F.lit(float(src_nodata)))
        c = src - F.lit(haze)
        if clip:
            c = F.when(c.isNull(), F.lit(None).cast("double")).otherwise(
                F.least(F.greatest(c, F.lit(0.0)), F.lit(1.0))
            )
        if dst_nodata is not None:
            c = F.coalesce(c, F.lit(float(dst_nodata)))
        df = df.withColumn(b, c)
    return df


def dos_aot_tiles(
    df: DataFrame,
    blue: str = "band_blue",
    swir2: str = "band_swir2",
    tile_col: str = "tile_id",
    dark_min: float = 0.01,
    dark_max: float = 0.15,
    sr_ratio: float = 0.33,
    aot_fallback: float = 0.3,
    stat: str = "mean",
) -> DataFrame:
    """Per-tile dark-pixel haze/AOT proxy (``sr.py:1244-1270`` selection).

    Dark pixels: ``swir2`` TOAR in [``dark_min``, ``dark_max``]; their blue
    surface reflectance is estimated as ``sr_ratio·swir2`` (Masek et al.
    2006) and the tile's proxy is the mean (``stat='mean'``) or sum
    (``stat='sum'`` — same signal undivided; division by a count can land
    on decimal rounding ties, so sum is the cross-engine-reproducible
    form) of the excess ``blue − sr_ratio·swir2`` over its dark pixels —
    the haze signal the reference feeds to its LUT inversion. Tiles
    without dark pixels get ``aot_fallback`` (the reference's behavior for
    scenes with no dark objects). One ``groupBy(tile)`` aggregate —
    map-side combine, single shuffle."""
    s2 = F.col(swir2).cast("double")
    is_dark = (s2 >= F.lit(float(dark_min))) & (s2 <= F.lit(float(dark_max)))
    excess = F.col(blue).cast("double") - F.lit(float(sr_ratio)) * s2
    if stat == "mean":
        agg = F.avg(F.when(is_dark, excess))
    elif stat == "sum":
        agg = F.sum(F.when(is_dark, excess))
    else:
        raise ValueError(f"stat must be mean|sum, got {stat!r}")
    return (
        df.groupBy(tile_col)
        .agg(
            F.count(F.when(is_dark, F.lit(1))).alias("n_dark"),
            F.round(
                F.coalesce(agg, F.lit(float(aot_fallback))), 6
            ).alias("aot"),
        )
    )


# ---------------------------------------------------------------------------
# Pan-sharpening — ratio fusion
# ---------------------------------------------------------------------------


def pan_sharpen(
    df: DataFrame,
    pan_col: str,
    bands: tuple[str, ...] = ("band_blue", "band_green", "band_red"),
    weights: dict[str, float] | None = None,
    method: str = "brovey",
    out_prefix: str = "",
) -> DataFrame:
    """Pan-band fusion as pure Column math (the per-pixel fusion entry of
    ``radiometry/_fusion.pyx``, re-expressed as the standard ratio
    methods — the reference's local-window regression kernel is a
    different estimator of the same sharpening adjustment):

    - ``'brovey'``: ``out_b = b · pan / I`` with the weighted intensity
      ``I = Σ w_b·b / Σ w_b`` — each band scaled by the pan/intensity
      ratio.
    - ``'esri'``: ``out_b = b + (pan − I)`` — the additive adjustment
      variant.

    Weights default to 1. Both methods are shuffle-free projections that
    ride whole-stage codegen; ``out_prefix`` writes to new columns
    (default: in place)."""
    w = {b: float((weights or {}).get(b, 1.0)) for b in bands}
    wsum = sum(w.values())
    intensity = None
    for b in bands:
        term = F.col(b).cast("double") * F.lit(w[b] / wsum)
        intensity = term if intensity is None else intensity + term
    pan = F.col(pan_col).cast("double")
    outs = {}
    for b in bands:
        if method == "brovey":
            # zero-intensity guard: an all-zero pixel (true black) would
            # give band·pan/0 = NaN/Inf and poison downstream aggregates;
            # the ratio is undefined there, so the pixel stays black
            # (0.0). Condition order matters: a NULL (nodata) intensity
            # makes the == test NULL → otherwise-branch → band·pan/NULL
            # = NULL, so missing data PROPAGATES instead of becoming 0.0.
            out = F.when(intensity == 0.0, F.lit(0.0)).otherwise(
                F.col(b).cast("double") * pan / intensity
            )
        elif method == "esri":
            out = F.col(b).cast("double") + (pan - intensity)
        else:
            raise ValueError(f"method must be brovey|esri, got {method!r}")
        outs[f"{out_prefix}{b}"] = out
    # one simultaneous withColumns: every output reads the ORIGINAL band
    # values (a sequential withColumn chain would feed band 2's intensity
    # the already-sharpened band 1)
    return df.withColumns(outs)
