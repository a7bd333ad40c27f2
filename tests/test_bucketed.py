"""Tests for the co-bucketed shuffle-free join."""

from __future__ import annotations


class TestBucketedJoin:
    def test_join_has_no_exchange(self, spark, sf_dir):
        from ting_data_etl_spark.operators.bucketed import (
            bucketed_join_revenue,
        )

        df = bucketed_join_revenue(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # the ONLY exchange is the final 5-row aggregation; the join inputs
        # stream straight from their bucket files
        assert plan.count("Exchange") == 1
        assert "Bucketed: true" in plan

    def test_values_match_plain_join(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from ting_data_etl_spark.functions.cleaning import sum_exact
        from ting_data_etl_spark.operators.bucketed import (
            bucketed_join_revenue,
        )
        from ting_data_etl_spark.sources.tables import load_table

        got = {
            r.o_orderpriority: (r.n_items, r.revenue)
            for r in bucketed_join_revenue(spark, sf_dir).collect()
        }
        o = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        want = {
            r.o_orderpriority: (r.n_items, r.revenue)
            for r in li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_items"),
                sum_exact(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")),
                    scale=2,
                ).alias("revenue"),
            )
            .collect()
        }
        assert got == want
