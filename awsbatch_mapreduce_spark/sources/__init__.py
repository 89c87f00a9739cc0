from awsbatch_mapreduce_spark.sources.tables import TABLES, load_table, register_views
from awsbatch_mapreduce_spark.sources.drift import read_union_drift

__all__ = ["TABLES", "load_table", "register_views", "read_union_drift"]
