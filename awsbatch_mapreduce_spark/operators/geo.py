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


def crs_transform_pandas_udf(src_epsg: int = 4326, dst_epsg: int = 3857):
    """General CRS transform as an Arrow-batched pandas UDF —
    struct<x,y> from (lon, lat)-order input columns.

    Resolution order mirrors how the engine treats optional GIS deps:

    1. **pyproj present** — ``Transformer.from_crs(..., always_xy=True)``
       over whole numpy columns, exactly the reference's call shape
       (``src/awsbatch-map/main.py:17,67-72``), any EPSG pair.
    2. **pyproj absent, 4326->3857** — the closed-form spherical
       Mercator used everywhere else in this repo (bit-identical to
       :func:`mercator_pandas_udf`).
    3. **pyproj absent, other pair** — ImportError at *construction*
       time (not mid-job on an executor), naming the missing dep.

    The UDF captures plain floats/ints only, so the closure ships to
    executors without dragging module state along; with pyproj, the
    Transformer is built once per executor process (lazily inside the
    UDF) because Transformer objects don't pickle.
    """
    try:
        import pyproj  # noqa: F401

        have_pyproj = True
    except ImportError:
        have_pyproj = False

    if not have_pyproj and (src_epsg, dst_epsg) != (4326, 3857):
        raise ImportError(
            f"EPSG:{src_epsg}->EPSG:{dst_epsg} needs pyproj (not installed); "
            "only 4326->3857 has a built-in closed form"
        )
    if not have_pyproj:
        return mercator_pandas_udf()

    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<x: double, y: double>")
    def project(lon, lat):
        import pyproj

        tr = pyproj.Transformer.from_crs(src_epsg, dst_epsg, always_xy=True)
        x, y = tr.transform(
            lon.to_numpy(dtype=np.float64), lat.to_numpy(dtype=np.float64)
        )
        return pd.DataFrame({"x": x, "y": y})

    return project


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
