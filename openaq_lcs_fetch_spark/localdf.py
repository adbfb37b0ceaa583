"""Right-sized construction for small driver-side DataFrames.

``SparkSession.createDataFrame(rows)`` parallelizes local rows into
``defaultParallelism`` slices (32 on the bench harness, mostly empty
for a dim of a few rows). Every action on such a frame then pays one
Python-worker round trip PER SLICE to deserialize a handful of rows —
measured ~0.15-0.25 s of fixed cost per action at local[32] (guide §4:
the JVM↔Python boundary is paid per partition), and the same 32 tasks
serialize behind each other at lower core counts. For the engine's
dimension/spec/fixture frames — re-evaluated by every job that builds
a broadcast or a sink write from them — that is pure overhead: one
slice is strictly better at any core count and any cluster size, so
this is NOT a local[32]-only tune.

``local_df`` keeps the exact ``createDataFrame`` conversion semantics
(the rows travel through the same ``schema.toInternal`` machinery —
only the slice count changes), and scales the slice count back up for
genuinely large driver-side collections (the bounded-HTTP control
reads) so a big page buffer still parallelizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: rows per slice before a second slice is worth a second Python-worker
#: round trip — far above every dim/spec/fixture in the engine.
_ROWS_PER_SLICE = 4096


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``createDataFrame`` for small driver-side row lists without the
    defaultParallelism slice fan-out (see module docstring)."""
    data = rows if isinstance(rows, list) else list(rows)
    sc = spark.sparkContext
    slices = max(1, min(sc.defaultParallelism, len(data) // _ROWS_PER_SLICE))
    return spark.createDataFrame(sc.parallelize(data, slices), schema)
