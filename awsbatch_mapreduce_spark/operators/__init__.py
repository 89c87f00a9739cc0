from awsbatch_mapreduce_spark.operators.histogram import histogram2d
from awsbatch_mapreduce_spark.operators.stats import summary_stats

__all__ = ["histogram2d", "summary_stats"]
