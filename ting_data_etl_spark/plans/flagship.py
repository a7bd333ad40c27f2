"""Flagship pricing-summary query (SURVEY §7.2 end-to-end slice).

Lives in its own module so it registers FIRST: the correctness driver
checks registered queries in registration order with a finite budget, so
the flagship and the SURVEY §2 spec surface must register before the
extension families (see ``registry.load_all``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ting_data_etl_spark.functions.cleaning import sum_exact
from ting_data_etl_spark.registry import register
from ting_data_etl_spark.sources.tables import load_table

_SQL_FLAGSHIP = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("flagship_pricing_summary", oracle=_SQL_FLAGSHIP)
def flagship_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary — the SURVEY §7.2 end-to-end slice.

    One parquet scan (pruned to 6 columns, shipdate filter pushed down), one
    partial+final hash aggregation — the plan Catalyst should always pick.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_exact("l_quantity").alias("sum_qty"),
            sum_exact("l_extendedprice").alias("sum_base_price"),
            sum_exact(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            F.count("*").alias("count_order"),
        )
    )
