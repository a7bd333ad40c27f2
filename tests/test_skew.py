"""Salted-join / two-stage-agg correctness on adversarially skewed data."""

from __future__ import annotations

import pyspark.sql.functions as F


def _skewed_fact(spark, n=20_000):
    # 90% of rows share one hot key
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % 100)
        .alias("k"),
        (F.col("id") % 13).cast("double").alias("v"),
    )


class TestSaltedJoin:
    def test_equals_plain_join(self, spark):
        from ting_data_etl_spark.operators.skew import salted_join

        fact = _skewed_fact(spark)
        dim = spark.range(100).select(
            F.col("id").alias("k"), F.concat(F.lit("d"), "id").alias("name")
        )
        plain = (
            fact.join(dim, "k")
            .groupBy("k", "name")
            .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        )
        salted = (
            salted_join(fact, dim, "k")
            .groupBy("k", "name")
            .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        )
        a = {(r.k, r.name, r.n, r.s) for r in plain.collect()}
        b = {(r.k, r.name, r.n, r.s) for r in salted.collect()}
        assert a == b

    def test_left_join_preserves_unmatched(self, spark):
        from ting_data_etl_spark.operators.skew import salted_join

        fact = spark.createDataFrame(
            [(1, 1.0), (2, 2.0), (99, 9.0)], "k long, v double"
        )
        dim = spark.createDataFrame([(1, "a"), (2, "b")], "k long, name string")
        rows = {
            r.k: r.name
            for r in salted_join(fact, dim, "k", how="left").collect()
        }
        assert rows == {1: "a", 2: "b", 99: None}


class TestTwoStageAgg:
    def test_equals_plain_sum(self, spark):
        from ting_data_etl_spark.operators.skew import two_stage_agg_sum

        fact = _skewed_fact(spark)
        plain = {
            r.k: r.total
            for r in fact.groupBy("k")
            .agg(F.sum("v").alias("total"))
            .collect()
        }
        salted = {
            r.k: r.total
            for r in two_stage_agg_sum(fact, "k", "v").collect()
        }
        assert plain == salted
