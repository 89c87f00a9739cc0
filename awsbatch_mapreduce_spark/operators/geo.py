"""Web-Mercator (EPSG:4326 -> EPSG:3857) projection — the reference's
P2 operator with the real math.

The reference calls pyproj's Transformer over whole numpy columns
(``src/awsbatch-map/main.py:17,67-72``).  For this specific CRS pair
the transform is closed-form spherical Mercator (public formula used
by all web map tooling), so no GIS dependency is needed:

    x = lon * R * pi / 180
    y = R * ln(tan(pi/4 + lat * pi / 360))

with R = 6378137.0 m (WGS84 semi-major axis); valid for |lat| < 90.
Exposed both ways:

- :func:`mercator_cols` — JVM-side Column expressions (codegen, no
  Python boundary; the default).
- :func:`mercator_pandas_udf` — Arrow-vectorized pandas UDF computing
  the identical numpy expression, mirroring the reference's
  vectorized-UDF shape for when the transform genuinely needs a
  Python library (other CRS pairs via pyproj, if installed).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

_R = 6378137.0  # WGS84 semi-major axis, meters


def mercator_cols(lon: Column, lat: Column) -> tuple[Column, Column]:
    """JVM-side spherical-Mercator x/y (meters) from degree columns."""
    x = lon * F.lit(_R * math.pi / 180.0)
    y = F.lit(_R) * F.log(F.tan(F.lit(math.pi / 4.0) + lat * F.lit(math.pi / 360.0)))
    return x, y


def mercator_pandas_udf():
    """Arrow-batched pandas UDF struct<x,y> — the reference's vectorized
    shape (one Python call per Arrow batch, whole-column numpy math).
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    # struct returns can't be expressed through the Series type-hint
    # protocol — the returnType string carries the schema instead
    @pandas_udf("struct<x: double, y: double>")
    def project(lon, lat):
        lon_v = lon.to_numpy(dtype=np.float64)
        lat_v = lat.to_numpy(dtype=np.float64)
        x = lon_v * (_R * np.pi / 180.0)
        y = _R * np.log(np.tan(np.pi / 4.0 + lat_v * (np.pi / 360.0)))
        return pd.DataFrame({"x": x, "y": y})

    return project
