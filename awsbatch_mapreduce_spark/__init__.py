"""awsbatch_mapreduce_spark — a PySpark-native analytics engine.

A brand-new engine (not a port) with the query and data-processing
capabilities of the reference pipeline ``rtkelly13/AWSBatch-MapReduce``
(AWS Batch array-job MapReduce over NYC-taxi parquet: read -> reproject ->
bbox filter -> 2-D bin-count raster -> ordered frame reduce), re-expressed
as composable Spark DataFrame/SQL operators and extended to a full
relational + streaming + LLM-data-pipeline surface.

Design stance (SURVEY.md §7): declare logical plans with the DataFrame
API, let Catalyst/Tungsten choose physical strategy; Python UDFs only as
Arrow-vectorized ``pandas_udf`` where built-ins genuinely can't express
the semantics; every operator designed for 100 TB / 1000-executor scale
even though tests run on ``local[*]``.
"""

from awsbatch_mapreduce_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
