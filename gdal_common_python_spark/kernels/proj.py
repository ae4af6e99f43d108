"""Vector reprojection kernels (V1, SURVEY §2.7) — pure numpy, closed form.

The reference reprojects via ``osr.CoordinateTransformation`` per feature
(lib/reproject.py:25,34). This engine supports the four EPSG systems the
reference's spatialreference.py:4-9 declares (NAD83=4269, WGS84=4326,
Web Mercator=3857, CA Albers=3310) with closed-form vectorized transforms:

- 4326 <-> 3857: spherical Mercator (R = 6378137), the standard closed form.
  The inverse is also implemented in the DuckDB oracle SQL, so the
  auto-rectify rule (V2) is independently checked.
- 4269 (NAD83) <-> 4326 (WGS84): identity passthrough (sub-meter datum shift
  out of scope — same treatment most engines apply without datum grids).
- 3310 (CA Albers / NAD83): ellipsoidal Albers equal-area conic on GRS80,
  standard parallels 34 / 40.5, origin (0, -120), false northing -4000000
  (EPSG registry parameters).
"""

from __future__ import annotations

import numpy as np

R_MERC = 6378137.0
_GRS80_A = 6378137.0
_GRS80_F = 1.0 / 298.257222101
_GRS80_E2 = _GRS80_F * (2 - _GRS80_F)
_GRS80_E = np.sqrt(_GRS80_E2)

EPSG_WGS84 = 4326
EPSG_NAD83 = 4269
EPSG_WEB_MERCATOR = 3857
EPSG_CA_ALBERS = 3310

_GEOGRAPHIC = {EPSG_WGS84, EPSG_NAD83}


def lonlat_to_mercator(lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = R_MERC * np.radians(lon)
    y = R_MERC * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def mercator_to_lonlat(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / R_MERC)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / R_MERC)) - np.pi / 2.0)
    return lon, lat


def _albers_q(sin_phi):
    e, e2 = _GRS80_E, _GRS80_E2
    return (1 - e2) * (
        sin_phi / (1 - e2 * sin_phi**2)
        - (1 / (2 * e)) * np.log((1 - e * sin_phi) / (1 + e * sin_phi))
    )


_PHI1, _PHI2 = np.radians(34.0), np.radians(40.5)
_LAT0, _LON0 = np.radians(0.0), np.radians(-120.0)
_FE, _FN = 0.0, -4000000.0


def _albers_consts():
    e2 = _GRS80_E2
    m1 = np.cos(_PHI1) / np.sqrt(1 - e2 * np.sin(_PHI1) ** 2)
    m2 = np.cos(_PHI2) / np.sqrt(1 - e2 * np.sin(_PHI2) ** 2)
    q1, q2, q0 = _albers_q(np.sin(_PHI1)), _albers_q(np.sin(_PHI2)), _albers_q(np.sin(_LAT0))
    n = (m1**2 - m2**2) / (q2 - q1)
    C = m1**2 + n * q1
    rho0 = _GRS80_A * np.sqrt(C - n * q0) / n
    return n, C, rho0


_ALBERS_N, _ALBERS_C, _ALBERS_RHO0 = _albers_consts()


def lonlat_to_albers_ca(lon, lat):
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    n, C, rho0 = _ALBERS_N, _ALBERS_C, _ALBERS_RHO0
    q = _albers_q(np.sin(lat))
    rho = _GRS80_A * np.sqrt(C - n * q) / n
    theta = n * (lon - _LON0)
    return _FE + rho * np.sin(theta), _FN + rho0 - rho * np.cos(theta)


def albers_ca_to_lonlat(x, y):
    x = np.asarray(x, dtype=np.float64) - _FE
    y = np.asarray(y, dtype=np.float64) - _FN
    n, C, rho0 = _ALBERS_N, _ALBERS_C, _ALBERS_RHO0
    rho = np.sqrt(x**2 + (rho0 - y) ** 2)
    theta = np.arctan2(x, rho0 - y)
    q = (C - (rho * n / _GRS80_A) ** 2) / n
    # iterate the inverse latitude series (converges in ~4 iterations)
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    e, e2 = _GRS80_E, _GRS80_E2
    for _ in range(6):
        sp = np.sin(phi)
        phi = phi + (
            (1 - e2 * sp**2) ** 2
            / (2 * np.cos(phi))
            * (q / (1 - e2) - sp / (1 - e2 * sp**2) + (1 / (2 * e)) * np.log((1 - e * sp) / (1 + e * sp)))
        )
    lon = _LON0 + theta / n
    return np.degrees(lon), np.degrees(phi)


def transform(x, y, from_srid: int, to_srid: int):
    """Vectorized coordinate transform between any two supported EPSG systems
    (via lon/lat as the hub). Identity when the systems coincide — the
    analog of the reference's rectify check (lib/_rectifyinputs.py:21)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if from_srid == to_srid or (from_srid in _GEOGRAPHIC and to_srid in _GEOGRAPHIC):
        return x, y
    if from_srid in _GEOGRAPHIC:
        lon, lat = x, y
    elif from_srid == EPSG_WEB_MERCATOR:
        lon, lat = mercator_to_lonlat(x, y)
    elif from_srid == EPSG_CA_ALBERS:
        lon, lat = albers_ca_to_lonlat(x, y)
    else:
        raise ValueError(f"unsupported srid {from_srid}")
    if to_srid in _GEOGRAPHIC:
        return lon, lat
    if to_srid == EPSG_WEB_MERCATOR:
        return lonlat_to_mercator(lon, lat)
    if to_srid == EPSG_CA_ALBERS:
        return lonlat_to_albers_ca(lon, lat)
    raise ValueError(f"unsupported srid {to_srid}")


def transform_rings(rings, from_srid: int, to_srid: int):
    if from_srid == to_srid:
        return rings
    out = []
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        x, y = transform(r[:, 0], r[:, 1], from_srid, to_srid)
        out.append(np.column_stack([x, y]))
    return out
