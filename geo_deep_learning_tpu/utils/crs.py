"""Coordinate reference system transforms (numpy, no GDAL).

Covers the CRS families that appear in this framework's raster workflows
(reference ``utils/rasters.py:45-79`` delegates to ``rasterio.warp`` /
PROJ; this is a from-scratch implementation):

- **Geographic WGS84** (EPSG:4326)
- **UTM on WGS84** (EPSG:32601-32660 north, 32701-32760 south) via an
  extended Krüger-series transverse Mercator (6th order in the third
  flattening — the same formulation PROJ's ``etmerc`` uses; sub-mm
  agreement within UTM zones)
- **Web Mercator** (EPSG:3857, spherical)

API: :func:`to_geographic` / :func:`from_geographic` convert between a
projected CRS and lon/lat degrees; :func:`transform_points` goes between
any two supported CRSs. All functions are vectorized over numpy arrays.
"""

from __future__ import annotations

import numpy as np

# WGS84 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257223563
_E = np.sqrt(_F * (2.0 - _F))  # first eccentricity
_N = _F / (2.0 - _F)  # third flattening
_K0 = 0.9996
_FE = 500000.0

# rectifying radius and Krüger series coefficients (6th order in n)
_n = _N
_A_BAR = _A / (1 + _n) * (1 + _n**2 / 4 + _n**4 / 64 + _n**6 / 256)
_ALPHA = np.array(
    [
        _n / 2 - 2 * _n**2 / 3 + 5 * _n**3 / 16 + 41 * _n**4 / 180
        - 127 * _n**5 / 288 + 7891 * _n**6 / 37800,
        13 * _n**2 / 48 - 3 * _n**3 / 5 + 557 * _n**4 / 1440
        + 281 * _n**5 / 630 - 1983433 * _n**6 / 1935360,
        61 * _n**3 / 240 - 103 * _n**4 / 140 + 15061 * _n**5 / 26880
        + 167603 * _n**6 / 181440,
        49561 * _n**4 / 161280 - 179 * _n**5 / 168 + 6601661 * _n**6 / 7257600,
        34729 * _n**5 / 80640 - 3418889 * _n**6 / 1995840,
        212378941 * _n**6 / 319334400,
    ]
)
_BETA = np.array(
    [
        _n / 2 - 2 * _n**2 / 3 + 37 * _n**3 / 96 - _n**4 / 360
        - 81 * _n**5 / 512 + 96199 * _n**6 / 604800,
        _n**2 / 48 + _n**3 / 15 - 437 * _n**4 / 1440 + 46 * _n**5 / 105
        - 1118711 * _n**6 / 3870720,
        17 * _n**3 / 480 - 37 * _n**4 / 840 - 209 * _n**5 / 4480
        + 5569 * _n**6 / 90720,
        4397 * _n**4 / 161280 - 11 * _n**5 / 504 - 830251 * _n**6 / 7257600,
        4583 * _n**5 / 161280 - 108847 * _n**6 / 3991680,
        20648693 * _n**6 / 638668800,
    ]
)


def utm_zone_params(epsg: int) -> tuple[float, float]:
    """(central meridian deg, false northing) for a WGS84 UTM EPSG code."""
    if 32601 <= epsg <= 32660:
        return (epsg - 32600) * 6.0 - 183.0, 0.0
    if 32701 <= epsg <= 32760:
        return (epsg - 32700) * 6.0 - 183.0, 10000000.0
    msg = f"EPSG:{epsg} is not a WGS84 UTM zone"
    raise ValueError(msg)


def _tm_forward(lon_deg, lat_deg, lon0_deg: float):
    """Transverse Mercator forward: lon/lat deg → (easting-from-CM, northing)."""
    lam = np.radians(np.asarray(lon_deg, np.float64) - lon0_deg)
    phi = np.radians(np.asarray(lat_deg, np.float64))
    s = np.sin(phi)
    # conformal latitude via Gauss-Schreiber: t = tan(chi)
    t = np.sinh(
        np.arctanh(s) - _E * np.arctanh(_E * s)
    )
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t**2 + np.cos(lam) ** 2))
    j = np.arange(1, 7).reshape((6,) + (1,) * np.ndim(xi_p))
    xi = xi_p + np.sum(_ALPHA.reshape(j.shape) * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p), axis=0)
    eta = eta_p + np.sum(_ALPHA.reshape(j.shape) * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p), axis=0)
    return _K0 * _A_BAR * eta, _K0 * _A_BAR * xi


def _tm_inverse(x, y, lon0_deg: float):
    """Transverse Mercator inverse: (easting-from-CM, northing) → lon/lat deg."""
    eta = np.asarray(x, np.float64) / (_K0 * _A_BAR)
    xi = np.asarray(y, np.float64) / (_K0 * _A_BAR)
    j = np.arange(1, 7).reshape((6,) + (1,) * np.ndim(xi))
    xi_p = xi - np.sum(_BETA.reshape(j.shape) * np.sin(2 * j * xi) * np.cosh(2 * j * eta), axis=0)
    eta_p = eta - np.sum(_BETA.reshape(j.shape) * np.cos(2 * j * xi) * np.sinh(2 * j * eta), axis=0)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    # conformal → geodetic latitude by fixed-point iteration (converges
    # quadratically fast for |e| of Earth; 6 rounds ≈ double precision)
    phi = chi
    half_pi = np.pi / 2
    for _ in range(6):
        es = _E * np.sin(phi)
        phi = (
            2.0
            * np.arctan(
                np.tan(np.pi / 4 + chi / 2)
                * ((1 + es) / (1 - es)) ** (_E / 2)
            )
            - half_pi
        )
    return np.degrees(lam) + lon0_deg, np.degrees(phi)


def to_geographic(epsg: int, x, y):
    """Projected (x, y) in ``epsg`` → (lon, lat) degrees on WGS84."""
    if epsg == 4326:
        return np.asarray(x, np.float64), np.asarray(y, np.float64)
    if epsg == 3857:
        lon = np.degrees(np.asarray(x, np.float64) / _A)
        lat = np.degrees(
            2 * np.arctan(np.exp(np.asarray(y, np.float64) / _A)) - np.pi / 2
        )
        return lon, lat
    lon0, fn = utm_zone_params(epsg)
    return _tm_inverse(np.asarray(x, np.float64) - _FE, np.asarray(y, np.float64) - fn, lon0)


def from_geographic(epsg: int, lon, lat):
    """(lon, lat) degrees on WGS84 → projected (x, y) in ``epsg``."""
    if epsg == 4326:
        return np.asarray(lon, np.float64), np.asarray(lat, np.float64)
    if epsg == 3857:
        x = _A * np.radians(np.asarray(lon, np.float64))
        y = _A * np.log(np.tan(np.pi / 4 + np.radians(np.asarray(lat, np.float64)) / 2))
        return x, y
    lon0, fn = utm_zone_params(epsg)
    e, n = _tm_forward(lon, lat, lon0)
    return e + _FE, n + fn


def is_supported(epsg: int | None) -> bool:
    """True when :func:`transform_points` can handle this EPSG code."""
    if epsg in (4326, 3857):
        return True
    return epsg is not None and (
        32601 <= epsg <= 32660 or 32701 <= epsg <= 32760
    )


def transform_points(src_epsg: int, dst_epsg: int, x, y):
    """Transform coordinate arrays between two supported CRSs."""
    if src_epsg == dst_epsg:
        return np.asarray(x, np.float64), np.asarray(y, np.float64)
    lon, lat = to_geographic(src_epsg, x, y)
    return from_geographic(dst_epsg, lon, lat)
