"""CRS transforms without pyproj: vectorized Transverse Mercator (UTM).

The reference normalizes CRS inputs and reprojects the vector side of every
raster↔vector join on the fly (``/root/reference/src/geowombat/backends/
rasterio_.py:492-559`` ``check_crs``/``check_file_crs``;
``core/conversion.py:369-374`` in ``prepare_points``;
``core/conversion.py:61-123`` ``lonlat_to_xy``/``xy_to_lonlat``). This
sandbox has no pyproj/GDAL, so the fixture-relevant transform pair —
geographic WGS84 ↔ UTM — is implemented directly from the public
Karney (2011) / Krüger-series formulation (the same series proj uses;
accuracy < 1 mm within a zone). All math is vectorized numpy, so it runs
unchanged inside an Arrow pandas UDF on executors.
"""

from __future__ import annotations

import numpy as np

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_K0 = 0.9996
_FE = 500000.0
_E = np.sqrt(_F * (2.0 - _F))  # first eccentricity

_N = _F / (2.0 - _F)
_A_CAP = _A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0 + _N**6 / 256.0)

# Krüger series coefficients (order n^6), forward (alpha) and inverse (beta)
_ALPHA = np.array(
    [
        _N / 2.0 - 2.0 / 3.0 * _N**2 + 5.0 / 16.0 * _N**3 + 41.0 / 180.0 * _N**4
        - 127.0 / 288.0 * _N**5 + 7891.0 / 37800.0 * _N**6,
        13.0 / 48.0 * _N**2 - 3.0 / 5.0 * _N**3 + 557.0 / 1440.0 * _N**4
        + 281.0 / 630.0 * _N**5 - 1983433.0 / 1935360.0 * _N**6,
        61.0 / 240.0 * _N**3 - 103.0 / 140.0 * _N**4 + 15061.0 / 26880.0 * _N**5
        + 167603.0 / 181440.0 * _N**6,
        49561.0 / 161280.0 * _N**4 - 179.0 / 168.0 * _N**5
        + 6601661.0 / 7257600.0 * _N**6,
        34729.0 / 80640.0 * _N**5 - 3418889.0 / 1995840.0 * _N**6,
        212378941.0 / 319334400.0 * _N**6,
    ]
)
_BETA = np.array(
    [
        _N / 2.0 - 2.0 / 3.0 * _N**2 + 37.0 / 96.0 * _N**3 - 1.0 / 360.0 * _N**4
        - 81.0 / 512.0 * _N**5 + 96199.0 / 604800.0 * _N**6,
        1.0 / 48.0 * _N**2 + 1.0 / 15.0 * _N**3 - 437.0 / 1440.0 * _N**4
        + 46.0 / 105.0 * _N**5 - 1118711.0 / 3870720.0 * _N**6,
        17.0 / 480.0 * _N**3 - 37.0 / 840.0 * _N**4 - 209.0 / 4480.0 * _N**5
        + 5569.0 / 90720.0 * _N**6,
        4397.0 / 161280.0 * _N**4 - 11.0 / 504.0 * _N**5
        - 830251.0 / 7257600.0 * _N**6,
        4583.0 / 161280.0 * _N**5 - 108847.0 / 3991680.0 * _N**6,
        20648693.0 / 638668800.0 * _N**6,
    ]
)
_J = np.arange(1, 7, dtype=np.float64)


def utm_zone_params(zone: int, south: bool) -> tuple[float, float]:
    """(central meridian degrees, false northing)."""
    lon0 = -183.0 + 6.0 * zone
    return lon0, 10000000.0 if south else 0.0


def parse_utm_epsg(epsg: int) -> tuple[int, bool]:
    """EPSG 326xx (north) / 327xx (south) → (zone, south)."""
    if 32601 <= epsg <= 32660:
        return epsg - 32600, False
    if 32701 <= epsg <= 32760:
        return epsg - 32700, True
    raise ValueError(f"not a UTM EPSG code: {epsg}")


def lonlat_to_utm(
    lon: np.ndarray, lat: np.ndarray, zone: int, south: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """Forward TM (Karney 2011, Krüger series): lon/lat degrees → E/N m."""
    lon0, fn = utm_zone_params(zone, south)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    dlam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)

    sphi = np.sin(phi)
    t = np.sinh(
        np.arctanh(sphi)
        - (2.0 * np.sqrt(_N) / (1.0 + _N))
        * np.arctanh((2.0 * np.sqrt(_N) / (1.0 + _N)) * sphi)
    )
    xi_p = np.arctan2(t, np.cos(dlam))
    eta_p = np.arctanh(np.sin(dlam) / np.sqrt(1.0 + t * t))

    two_j_xi = 2.0 * np.multiply.outer(_J, xi_p)
    two_j_eta = 2.0 * np.multiply.outer(_J, eta_p)
    xi = xi_p + np.tensordot(_ALPHA, np.sin(two_j_xi) * np.cosh(two_j_eta), axes=1)
    eta = eta_p + np.tensordot(_ALPHA, np.cos(two_j_xi) * np.sinh(two_j_eta), axes=1)

    easting = _FE + _K0 * _A_CAP * eta
    northing = fn + _K0 * _A_CAP * xi
    return easting, northing


def utm_to_lonlat(
    easting: np.ndarray, northing: np.ndarray, zone: int, south: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """Inverse TM: E/N m → lon/lat degrees (Newton on the conformal τ)."""
    lon0, fn = utm_zone_params(zone, south)
    xi = (np.asarray(northing, dtype=np.float64) - fn) / (_K0 * _A_CAP)
    eta = (np.asarray(easting, dtype=np.float64) - _FE) / (_K0 * _A_CAP)

    two_j_xi = 2.0 * np.multiply.outer(_J, xi)
    two_j_eta = 2.0 * np.multiply.outer(_J, eta)
    xi_p = xi - np.tensordot(_BETA, np.sin(two_j_xi) * np.cosh(two_j_eta), axes=1)
    eta_p = eta - np.tensordot(_BETA, np.cos(two_j_xi) * np.sinh(two_j_eta), axes=1)

    tau_p = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))

    # Newton-invert tau' = tau * sqrt(1+sigma^2) - sigma * sqrt(1+tau^2)
    tau = np.array(tau_p, copy=True)
    for _ in range(5):
        sigma = np.sinh(_E * np.arctanh(_E * tau / np.sqrt(1.0 + tau * tau)))
        f_tau = tau * np.sqrt(1.0 + sigma * sigma) - sigma * np.sqrt(1.0 + tau * tau)
        dtau = (
            (tau_p - f_tau)
            * (1.0 + (1.0 - _E * _E) * tau * tau)
            / ((1.0 - _E * _E) * np.sqrt((1.0 + f_tau * f_tau) * (1.0 + tau * tau)))
        )
        tau = tau + dtau
    phi = np.arctan(tau)
    return np.degrees(lam) + lon0, np.degrees(phi)


def reproject_points(
    x: np.ndarray, y: np.ndarray, src_epsg: int, dst_epsg: int
) -> tuple[np.ndarray, np.ndarray]:
    """Point reprojection for the supported frames: EPSG:4326 and UTM
    zones (``conversion.py:61-123`` semantics). Identity when equal."""
    if src_epsg == dst_epsg:
        return np.asarray(x, np.float64), np.asarray(y, np.float64)
    if src_epsg == 4326:
        zone, south = parse_utm_epsg(dst_epsg)
        return lonlat_to_utm(x, y, zone, south)
    if dst_epsg == 4326:
        zone, south = parse_utm_epsg(src_epsg)
        return utm_to_lonlat(x, y, zone, south)
    # UTM → UTM via geographic
    lon, lat = utm_to_lonlat(x, y, *parse_utm_epsg(src_epsg))
    return lonlat_to_utm(lon, lat, *parse_utm_epsg(dst_epsg))
