"""Bucketed (pre-shuffled) tables: the co-located join at 100 TB.

No reference-side counterpart (the reference joins pandas frames in RAM).
At cluster scale the dominant cost of a large⨝large join is shuffling both
sides by the join key on EVERY query. Bucketing pays that shuffle once at
write time: both tables are hash-clustered (and sorted) into the same
number of buckets on the join key, so every subsequent join reads bucket i
against bucket i with NO exchange — the sort-merge join starts directly on
the scan output. This module stages ``orders`` and ``lineitem`` as bucketed
tables and registers a join query whose plan is pytest-pinned to contain
exactly one Exchange (the final small aggregation), none for the join.

The ``MERGE`` hint keeps the demonstration honest at test scale: the sf0.1
``orders`` side fits under the broadcast threshold, and a broadcast join
would silently bypass the bucket layout being exercised. On a 100 TB fact
table no hint is needed — neither side broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ting_data_etl_spark.functions.cleaning import sum_exact
from ting_data_etl_spark.plans.oracles import sql_sum_exact
from ting_data_etl_spark.registry import register
from ting_data_etl_spark.sources.tables import load_table

N_BUCKETS = 8

_STAGED_BUCKETS: set[str] = set()


def _table_tag(sf_dir: str) -> str:
    """Catalog-safe tag: whitelist [A-Za-z0-9_], everything else -> '_'.

    The tag lands unquoted in SQL and ``saveAsTable`` names; a blacklist of
    just '/' and '.' let a hyphenated path (every pytest tmp dir) produce
    an unparseable identifier.
    """
    import re

    return re.sub(r"[^A-Za-z0-9_]", "_", sf_dir.strip("/"))


def stage_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Stage orders + lineitem as co-bucketed, sorted tables (once/process).

    ``bucketBy(N, key).sortBy(key)`` is the write-side half of the co-located
    join: one shuffle now, zero on every later join. Both tables use the
    SAME bucket count and key — the co-location requirement.
    """
    import os
    import shutil

    tag = _table_tag(sf_dir)
    t_orders, t_lineitem = f"orders_b_{tag}", f"lineitem_b_{tag}"
    if sf_dir not in _STAGED_BUCKETS:
        # the warehouse dir outlives the in-memory catalog: a previous
        # process's table files would make saveAsTable fail with
        # LOCATION_ALREADY_EXISTS, so clear both catalog entry and location
        warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
            "file:"
        )
        for t in (t_orders, t_lineitem):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            loc = os.path.join(warehouse, t.lower())
            if os.path.exists(loc):
                shutil.rmtree(loc)
        load_table(spark, sf_dir, "orders").write.bucketBy(
            N_BUCKETS, "o_orderkey"
        ).sortBy("o_orderkey").mode("overwrite").saveAsTable(t_orders)
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ).write.bucketBy(N_BUCKETS, "l_orderkey").sortBy("l_orderkey").mode(
            "overwrite"
        ).saveAsTable(t_lineitem)
        _STAGED_BUCKETS.add(sf_dir)
    return t_orders, t_lineitem


_SQL_BUCKETED = f"""
SELECT o.o_orderpriority,
       COUNT(*) AS n_items,
       {sql_sum_exact("l.l_extendedprice * (1 - l.l_discount)", 2)} AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


@register("bucketed_join_revenue_by_priority", oracle=_SQL_BUCKETED)
def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority via a shuffle-free co-bucketed join.

    Plan contract (pytest-pinned): the lineitem⨝orders sort-merge join has
    NO Exchange on either input — both sides stream straight from their
    bucket files — and the only shuffle in the query is the 5-row final
    aggregation. On a real cluster this is the difference between re-paying
    a 100 TB shuffle per join and reading co-located buckets.
    """
    t_orders, t_lineitem = stage_bucketed_tables(spark, sf_dir)
    o = spark.table(t_orders).select("o_orderkey", "o_orderpriority")
    li = spark.table(t_lineitem)
    joined = li.hint("MERGE").join(
        o, li["l_orderkey"] == o["o_orderkey"]
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        sum_exact(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=2
        ).alias("revenue"),
    )
