from ting_data_etl_spark.sinks.fanout import write_fanout  # noqa: F401
from ting_data_etl_spark.sinks.single_file import write_per_group_csv  # noqa: F401
