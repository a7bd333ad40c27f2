from ting_data_etl_spark.sources.csv import (  # noqa: F401
    read_all_string_csv,
    read_messy_csv,
    scan_csv_dir,
)
from ting_data_etl_spark.sources.tables import TABLES, load_table, load_tables  # noqa: F401
