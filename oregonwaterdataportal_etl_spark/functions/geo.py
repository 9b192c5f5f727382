"""Geospatial functions — F9 (SURVEY.md 2.8).

generate_circle_polygon re-expresses the reference's per-row geodesic
circle approximation (userCode/groundwater/lib.py:4-35: a 12-point
polygon around a lat/lon with a radius given in feet) as a
numpy-vectorized pandas UDF — the survey's designated "one legitimate
UDF": pure trig over doubles, where an expression tree would be
unwieldy and a row-at-a-time UDF 10-100x slower.

The math is the standard small-circle approximation on a sphere
(R = 6371 km): for each bearing theta_k = 2*pi*k/n,

    lat_k = asin(sin(lat) cos(d) + cos(lat) sin(d) cos(theta_k))
    lon_k = lon + atan2(sin(theta_k) sin(d) cos(lat),
                        cos(d) - sin(lat) sin(lat_k))

with d = radius / R the angular distance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

EARTH_RADIUS_M = 6_371_000.0
FT_TO_M = 0.3048

_RING_TYPE = T.ArrayType(T.ArrayType(T.DoubleType()))


def circle_polygon_udf(n_points: int = 12):
    """Returns a pandas UDF (lon, lat, radius_ft) -> array<array<double>>
    of [lon, lat] vertices (closed ring: first point repeated last,
    GeoJSON polygon convention)."""

    @F.pandas_udf(_RING_TYPE)
    def circle(lon: pd.Series, lat: pd.Series, radius_ft: pd.Series) -> pd.Series:
        lam = np.radians(lon.to_numpy(dtype=np.float64))
        phi = np.radians(lat.to_numpy(dtype=np.float64))
        d = (radius_ft.to_numpy(dtype=np.float64) * FT_TO_M) / EARTH_RADIUS_M
        thetas = 2.0 * np.pi * np.arange(n_points) / n_points
        # broadcast to (rows, n_points)
        sin_phi2 = (
            np.sin(phi)[:, None] * np.cos(d)[:, None]
            + np.cos(phi)[:, None] * np.sin(d)[:, None] * np.cos(thetas)[None, :]
        )
        phi2 = np.arcsin(np.clip(sin_phi2, -1.0, 1.0))
        lam2 = lam[:, None] + np.arctan2(
            np.sin(thetas)[None, :] * np.sin(d)[:, None] * np.cos(phi)[:, None],
            np.cos(d)[:, None] - np.sin(phi)[:, None] * sin_phi2,
        )
        lon2 = np.degrees(lam2)
        lat2 = np.degrees(phi2)
        out = []
        for i in range(len(lam)):
            ring = [[float(lon2[i, k]), float(lat2[i, k])] for k in range(n_points)]
            ring.append(ring[0])  # close the ring
            out.append(ring)
        return pd.Series(out)

    return circle


def circle_polygon(
    lon: Column | str, lat: Column | str, radius_ft: Column | str, n_points: int = 12
) -> Column:
    lo = F.col(lon) if isinstance(lon, str) else lon
    la = F.col(lat) if isinstance(lat, str) else lat
    r = F.col(radius_ft) if isinstance(radius_ft, str) else radius_ft
    return circle_polygon_udf(n_points)(
        lo.cast("double"), la.cast("double"), r.cast("double")
    )
