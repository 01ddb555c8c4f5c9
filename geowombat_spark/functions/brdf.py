"""BRDF normalization — global c-factor method (Roy et al. 2016).

Reference: ``/root/reference/src/geowombat/radiometry/brdf.py`` — the
Ross-Thick volumetric and Li-Sparse-Reciprocal geometric kernels
(``LiKernel.get_li`` :120-188, ``RossKernel`` :191-270, shared angle /
overlap helpers :17-117) and ``BRDF.norm_brdf`` (:403-605) with the
fixed MODIS-derived per-wavelength (fiso, fgeo, fvol) coefficients
(:390-398) and the HLS convention for the nadir-normalization kernels
(:341-369: sensor zenith 0, solar zenith from the central-latitude
polynomial :315-339, relative azimuth 0).

Spark shape: the kernels are pure per-pixel trigonometry, so the whole
operator is **Column expressions** riding inside whole-stage codegen —
no UDF, no shuffle, no action. The nadir ("norm") kernels depend only on
the scene's central latitude, so they are computed once driver-side as
plain floats and enter the plan as literals; the per-pixel ("sensor")
kernels are built from the angle columns. One generic kernel
implementation serves both, dispatching through a tiny ops adapter
(``_COL`` → pyspark Columns, ``_NUM`` → python floats), so the scalar
and columnar paths cannot drift apart.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed MODIS BRDF spectral model parameters (reference ``brdf.py:390-398``)
COEFF = {
    "blue": dict(fiso=0.0774, fgeo=0.0079, fvol=0.0372),
    "green": dict(fiso=0.1306, fgeo=0.0178, fvol=0.058),
    "red": dict(fiso=0.169, fgeo=0.0227, fvol=0.0574),
    "nir": dict(fiso=0.3093, fgeo=0.033, fvol=0.1535),
    "swir1": dict(fiso=0.343, fgeo=0.0453, fvol=0.1154),
    "swir2": dict(fiso=0.2658, fgeo=0.0387, fvol=0.0639),
    "pan": dict(fiso=0.12567, fgeo=0.01613, fvol=0.0509),
}


class _COL:
    """pyspark Column trig backend."""

    cos = staticmethod(F.cos)
    sin = staticmethod(F.sin)
    tan = staticmethod(F.tan)
    acos = staticmethod(F.acos)
    atan = staticmethod(F.atan)
    sqrt = staticmethod(F.sqrt)
    abs = staticmethod(F.abs)
    radians = staticmethod(F.radians)
    floor = staticmethod(F.floor)

    @staticmethod
    def lit(v):
        return F.lit(float(v))

    @staticmethod
    def clip(c, lo, hi):
        return F.least(F.greatest(c, F.lit(float(lo))), F.lit(float(hi)))

    @staticmethod
    def maximum(c, v):
        return F.greatest(c, F.lit(float(v)))

    @staticmethod
    def where(cond, a, b):
        return F.when(cond, a).otherwise(b)


class _NUM:
    """python float trig backend (for the scene-constant nadir kernels)."""

    cos = staticmethod(math.cos)
    sin = staticmethod(math.sin)
    tan = staticmethod(math.tan)
    acos = staticmethod(math.acos)
    atan = staticmethod(math.atan)
    sqrt = staticmethod(math.sqrt)
    abs = staticmethod(abs)
    radians = staticmethod(math.radians)
    floor = staticmethod(math.floor)
    lit = staticmethod(float)

    @staticmethod
    def clip(v, lo, hi):
        return min(max(v, lo), hi)

    @staticmethod
    def maximum(v, m):
        return max(v, m)

    @staticmethod
    def where(cond, a, b):
        return a if cond else b


def mean_sza(central_latitude: float) -> float:
    """Latitude → mean solar zenith angle polynomial
    (reference ``brdf.py:315-339``, Zhang et al. 2016)."""
    lat = float(central_latitude)
    return (
        31.0076
        - 0.1272 * lat
        + 0.01187 * lat**2
        + 2.40e-05 * lat**3
        - 9.48e-07 * lat**4
        - 1.95e-09 * lat**5
        + 6.15e-11 * lat**6
    )


def _pangles(ops, tan1, br, nearly_zero, emit, tag):
    """Prime angles (``brdf.py:69-85``)."""
    tanp = ops.lit(br) * tan1
    tanp = emit(f"tanp{tag}", ops.where(tanp < 0, ops.lit(0.0), tanp))
    angp = emit(f"angp{tag}", ops.atan(tanp))
    sinp = emit(f"sinp{tag}", ops.sin(angp))
    cosp = ops.cos(angp)
    cosp = emit(f"cosp{tag}", ops.where(cosp == 0, ops.lit(nearly_zero), cosp))
    return cosp, sinp, tanp


def _phaang(ops, cos1, cos2, sin1, sin2, cos3):
    """Phase angle terms (``brdf.py:56-67``)."""
    cos_pha = ops.clip(cos1 * cos2 + sin1 * sin2 * cos3, -1.0, 1.0)
    pha = ops.acos(cos_pha)
    sin_pha = ops.sin(pha)
    return cos_pha, pha, sin_pha


def kernels(
    ops,
    vza_deg,
    sza_deg,
    raa_deg,
    br: float = 1.0,
    hb: float = 2.0,
    li_recip: bool = True,
    hs: bool = False,
    emit=None,
):
    """(li_sparse, ross_thick) kernel pair for one (vza, sza, raa) triple
    in degrees — the default BRDFKernels configuration
    (``brdf.py:287-310``: li sparse reciprocal, ross thick, br=1, hb=2).

    ``ops`` is ``_COL`` (Column expressions) or ``_NUM`` (floats); the
    math is written once and identical for both. ``emit(name, expr)``
    lets the Column caller materialize each named intermediate as a real
    DataFrame column — without it, every reuse of an intermediate inlines
    its whole subtree and the final expression overflows the 64 KB
    whole-stage-codegen method limit. Default: identity (pure
    composition — right for scalars and tests).
    """
    if emit is None:
        emit = lambda name, expr: expr  # noqa: E731
    m_pi = math.pi
    vza_rad = emit("vzr", ops.radians(vza_deg))
    sza_rad = emit("szr", ops.radians(sza_deg))
    raa_rad = ops.radians(raa_deg)
    # get_angle_info (brdf.py:88-117): negative zeniths force raa = pi,
    # then zeniths are used in absolute value.
    raa_eff = emit(
        "raa_eff",
        ops.where((vza_rad < 0) | (sza_rad < 0), ops.lit(m_pi), raa_rad),
    )
    vza_abs = emit("vza_abs", ops.abs(vza_rad))
    sza_abs = emit("sza_abs", ops.abs(sza_rad))

    # --- Li sparse reciprocal (brdf.py:120-188)
    two_pi = 2.0 * m_pi
    # fabs(raa % 2pi) via floored mod, identical in both backends
    phi = emit(
        "phi",
        ops.abs(raa_eff - ops.lit(two_pi) * ops.floor(raa_eff / ops.lit(two_pi))),
    )
    cos_phi = emit("cos_phi", ops.cos(phi))
    sin_phi = emit("sin_phi", ops.sin(phi))
    tanti = ops.tan(sza_abs)
    tantv = ops.tan(vza_abs)
    cos1, sin1, tan1 = _pangles(ops, tantv, br, 1e-20, emit, "1")
    cos2, sin2, tan2 = _pangles(ops, tanti, br, 1e-20, emit, "2")
    cos_pha_p, _, _ = _phaang(ops, cos1, cos2, sin1, sin2, cos_phi)
    cos_pha_p = emit("cpp", cos_pha_p)
    dist_sq = tan1 * tan1 + tan2 * tan2 - ops.lit(2.0) * tan1 * tan2 * cos_phi
    distance = emit("dist", ops.sqrt(ops.maximum(dist_sq, 0.0)))
    temp = emit("temp", ops.lit(1.0) / cos1 + ops.lit(1.0) / cos2)
    cost = emit(
        "cost",
        ops.clip(
            ops.lit(hb)
            * ops.sqrt(
                distance * distance
                + tan1 * tan1 * tan2 * tan2 * sin_phi * sin_phi
            )
            / temp,
            -1.0,
            1.0,
        ),
    )
    tvar = emit("tvar", ops.acos(cost))
    sint = ops.sin(tvar)
    overlap = emit(
        "ovl", ops.maximum(ops.lit(1.0 / m_pi) * (tvar - sint * cost) * temp, 0.0)
    )
    if li_recip:
        li = overlap - temp + ops.lit(0.5) * (ops.lit(1.0) + cos_pha_p) / cos1 / cos2
    else:
        li = overlap - temp + ops.lit(0.5) * (ops.lit(1.0) + cos_pha_p) / cos1
    li = emit("li", li)

    # --- Ross thick (brdf.py:191-270)
    cos_vza = emit("cv", ops.cos(vza_abs))
    cos_sza = emit("cs", ops.cos(sza_abs))
    sin_vza = ops.sin(vza_abs)
    sin_sza = ops.sin(sza_abs)
    cos_raa = ops.cos(raa_eff)
    cos_pha, pha, sin_pha = _phaang(
        ops, cos_vza, cos_sza, sin_vza, sin_sza, cos_raa
    )
    cos_pha = emit("cph", cos_pha)
    pha = emit("ph", ops.acos(cos_pha))
    sin_pha = ops.sin(pha)
    ross_element = (ops.lit(m_pi / 2.0) - pha) * cos_pha + sin_pha
    ross = ross_element / (cos_vza + cos_sza)
    if hs:
        ross = ross * (
            ops.lit(1.0)
            + ops.lit(1.0) / (ops.lit(1.0) + pha / ops.lit(0.25))
        )
    else:
        ross = ross - ops.lit(m_pi / 4.0)
    ross = emit("ross", ross)
    return li, ross


def relative_azimuth(saa_deg, vaa_deg, ops=_COL):
    """Relative azimuth in degrees, wrapped to [0, 360)
    (reference ``radiometry/angles.py:252-275``)."""
    raa = ops.radians(saa_deg - vaa_deg)
    two_pi = 2.0 * math.pi
    raa = ops.where(raa >= two_pi, raa - ops.lit(two_pi), raa)
    raa = ops.where(raa < 0, raa + ops.lit(two_pi), raa)
    return ops.abs(raa * ops.lit(180.0 / math.pi))


def norm_brdf(
    df: DataFrame,
    bands: dict[str, str],
    solar_za: str = "solar_za",
    solar_az: str = "solar_az",
    sensor_za: str = "sensor_za",
    sensor_az: str = "sensor_az",
    central_latitude: float = 0.0,
    src_nodata: float = -32768.0,
    dst_nodata: float | None = None,
    mask: str | None = None,
    scale_factor: float = 1.0,
    out_range: float | None = None,
    scale_angles: bool = True,
    vol_weight: float = 1.0,
) -> DataFrame:
    """Nadir BRDF-adjusted reflectance via the global c-factor
    (reference ``brdf.py:403-605``; Roy et al. 2016).

    ``bands`` maps each reflectance column to its wavelength name in
    :data:`COEFF` (e.g. ``{"band_red": "red"}``). Angle columns are in
    centi-degrees when ``scale_angles`` (the reference's storage
    convention, ×0.01 at :515-527). The c-factor per band is

    ``(fiso + fvol·k_vol_nadir·w + fgeo·k_geo_nadir) /
    (fiso + fvol·k_vol_sensor·w + fgeo·k_geo_sensor)``

    where the nadir kernels use vza=0, sza=mean_sza(central_latitude),
    raa=0 (scene constants → plan literals, :341-369) and the sensor
    kernels use the per-pixel angles. Nodata/mask handling follows
    :584-598.
    """
    if dst_nodata is None:
        dst_nodata = src_nodata
    ang = F.lit(0.01) if scale_angles else F.lit(1.0)
    sza = F.col(solar_za).cast("double") * ang
    saa = F.col(solar_az).cast("double") * ang
    vza = F.col(sensor_za).cast("double") * ang
    vaa = F.col(sensor_az).cast("double") * ang

    # Scene-constant nadir-normalization kernels (floats → literals).
    geo_norm, vol_norm = kernels(
        _NUM, 0.0, mean_sza(central_latitude), 0.0
    )
    # Per-pixel sensor kernels: materialize each intermediate as a column
    # so the projection stays within whole-stage-codegen method limits
    # (pure Column composition would inline every reused subtree).
    state = {"df": df}
    tmp_cols: list[str] = []

    def emit(name, expr):
        n = f"_bk_{name}"
        state["df"] = state["df"].withColumn(n, expr)
        tmp_cols.append(n)
        return F.col(n)

    raa = emit("raa_deg", relative_azimuth(saa, vaa))
    geo_sensor, vol_sensor = kernels(_COL, vza, sza, raa, emit=emit)
    df = state["df"]

    num_geo = F.lit(float(geo_norm))
    num_vol = F.lit(float(vol_norm) * float(vol_weight))
    den_vol = vol_sensor * F.lit(float(vol_weight))

    bad = sza == F.lit(-32768.0 * (0.01 if scale_angles else 1.0))
    if mask is not None:
        bad = bad | (F.col(mask) == 1)

    out = {}
    for col, wavelength in bands.items():
        cf = COEFF[wavelength]
        c_factor = (
            F.lit(cf["fiso"]) + F.lit(cf["fvol"]) * num_vol + F.lit(cf["fgeo"]) * num_geo
        ) / (
            F.lit(cf["fiso"])
            + F.lit(cf["fvol"]) * den_vol
            + F.lit(cf["fgeo"]) * geo_sensor
        )
        sr = F.col(col).cast("double")
        is_nd = sr == F.lit(float(src_nodata))
        if scale_factor != 1.0:
            sr = sr * F.lit(float(scale_factor))
        p = F.least(F.greatest(sr, F.lit(0.0)), F.lit(1.0)) * c_factor
        if out_range is not None:
            p = F.least(
                F.greatest(p * F.lit(float(out_range)), F.lit(0.0)),
                F.lit(float(out_range)),
            )
        out[col] = F.when(is_nd | bad, F.lit(float(dst_nodata))).otherwise(p)
    return df.withColumns(out).drop(*tmp_cols)
