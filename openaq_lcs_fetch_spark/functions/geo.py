"""Geometry / geo scalar functions (SURVEY.md C9).

* ``split_latlon`` — 'lat,lon' string → typed columns (miri.js:123
  splits the string and swaps to [lon, lat] geometry order).
* lat/lon → IANA timezone (senstate.js:67 uses the geo-tz library):
  the one genuinely non-SQL scalar in the reference. Spark-first
  options, strongest available wins:
  1. ``tz_lookup_join`` — a broadcast join against a (bounding-box →
     tz) dimension table: pure relational, scales trivially. Shipped
     with a coarse default table; real deployments load a proper
     shapefile-derived dim.
  2. ``tz_pandas_udf`` — an Arrow-batched pandas UDF hook gated on the
     optional ``timezonefinder`` lib (absent here → clear error),
     mirroring the library-call shape for exact polygons.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..localdf import local_df

GEOMETRY_COMMENT = "geometry arrays are [lon, lat] (station.js:10)"


def split_latlon(col: Column) -> Column:
    """'lat,lon' string → struct(lat double, lon double)."""
    parts = F.split(F.regexp_replace(col, r"\s+", ""), ",")
    return F.struct(
        parts.getItem(0).cast("double").alias("lat"),
        parts.getItem(1).cast("double").alias("lon"),
    )


def latlon_to_geometry(lat: Column, lon: Column) -> Column:
    """[lon, lat] geometry array (the reference's order, station.js:10)."""
    return F.array(lon.cast("double"), lat.cast("double"))


#: Coarse (lon_min, lon_max, lat_min, lat_max, tz) boxes — demo data;
#: production loads a real boundary-derived dimension the same shape.
DEFAULT_TZ_BOXES: tuple[tuple[float, float, float, float, str], ...] = (
    (-130.0, -100.0, 25.0, 50.0, "America/Denver"),
    (-100.0, -75.0, 25.0, 50.0, "America/New_York"),
    (-15.0, 20.0, 35.0, 60.0, "Europe/Paris"),
    (65.0, 90.0, 5.0, 35.0, "Asia/Kolkata"),
    (100.0, 125.0, 20.0, 45.0, "Asia/Shanghai"),
)


def tz_dim(spark: SparkSession, boxes=DEFAULT_TZ_BOXES) -> DataFrame:
    return local_df(
        spark, list(boxes),
        "lon_min double, lon_max double, lat_min double, lat_max double, tz string",
    )


def tz_lookup_join(
    df: DataFrame, lat: str, lon: str, dim: DataFrame, default: str = "UTC"
) -> DataFrame:
    """Broadcast range-join lat/lon into a tz box; unmatched → default.
    The dim is dimension-sized (thousands of boxes at most) → broadcast
    nested-loop join, fact side never shuffles."""
    cond = (
        (F.col(lon) >= dim["lon_min"])
        & (F.col(lon) < dim["lon_max"])
        & (F.col(lat) >= dim["lat_min"])
        & (F.col(lat) < dim["lat_max"])
    )
    joined = df.join(F.broadcast(dim), on=cond, how="left")
    return joined.withColumn(
        "timezone", F.coalesce(F.col("tz"), F.lit(default))
    ).drop("lon_min", "lon_max", "lat_min", "lat_max", "tz")


def tz_pandas_udf():
    """Exact-polygon variant behind an optional dependency (not in this
    container); raises with guidance if absent."""
    try:
        from timezonefinder import TimezoneFinder  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "timezonefinder not installed; use tz_lookup_join (bounding-box "
            "dimension) or install the lib for exact polygons"
        ) from e

    import pandas as pd  # pragma: no cover
    from pyspark.sql.functions import pandas_udf  # pragma: no cover

    @pandas_udf("string")  # pragma: no cover
    def tz_of(lat: pd.Series, lon: pd.Series) -> pd.Series:
        tf = TimezoneFinder()
        return pd.Series(
            [tf.timezone_at(lat=a, lng=b) for a, b in zip(lat, lon)]
        )

    return tz_of  # pragma: no cover
