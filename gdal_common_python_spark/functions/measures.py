"""Geometry measure columns (P7/M2 — calc_geometry, fields.py:346-423).

Reference: per-feature ``geom.Length()/Area()`` times a unit multiplier;
geographic (unprojected) SRS is rejected (fields.py:358-359). Engine: an
Arrow-vectorized kernel over the ``rings`` column; the multiplier ladder is
copied digit-for-digit (functions.units). Projected srid 3857/3310 are
meter-based; srid 4326/4269 raise like the reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..kernels import geom
from . import units as U

_METER_SRIDS = {3857, 3310}
_GEOGRAPHIC_SRIDS = {4326, 4269}


def calc_geometry(df: DataFrame, field_name: str, unit_code: int, srid: int) -> DataFrame:
    """Add `field_name` = area/length of `rings` in the requested unit."""
    if srid in _GEOGRAPHIC_SRIDS:
        raise ValueError("Unprojected spatial reference system. Reproject datasource first.")
    if srid not in _METER_SRIDS:
        raise ValueError(f"Unrecognized srid {srid}")
    is_area, mult = U.UNIT_MULTIPLIER[unit_code]
    srs_factor = U.SRS_UNIT_FACTOR["meter"]

    @F.pandas_udf(T.DoubleType())
    def measure(rings: pd.Series) -> pd.Series:
        out = np.zeros(len(rings))
        for i, rr in enumerate(rings):
            if rr is None or len(rr) == 0:
                continue  # null geometry -> 0 (fields.py:412,414)
            r = geom.rings_from_cell(rr)
            out[i] = geom.polygon_area(r) if is_area else geom.polygon_perimeter(r)
        return pd.Series(out)

    return df.withColumn(field_name, measure("rings") * F.lit(srs_factor * mult))
