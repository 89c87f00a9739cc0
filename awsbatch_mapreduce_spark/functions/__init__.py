from awsbatch_mapreduce_spark.functions.rounding import dround, dround_sql

__all__ = ["dround", "dround_sql"]
