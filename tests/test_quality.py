"""Tests for the declarative expectations report."""

from __future__ import annotations

import pyspark.sql.functions as F


class TestExpectations:
    def test_detects_violations(self, spark):
        from ting_data_etl_spark.operators.quality import expectations_report

        df = spark.createDataFrame(
            [
                (1, 5.0, "A"),
                (2, -1.0, "A"),  # violates positive
                (3, 2.0, "X"),  # violates domain
                (3, 1.0, "N"),  # duplicate key
            ],
            "k long, v double, flag string",
        )
        rep = {
            r.check_name: r.n_violations
            for r in expectations_report(
                df,
                {
                    "v_positive": F.col("v") > 0,
                    "flag_domain": F.col("flag").isin("A", "N", "R"),
                },
                unique_key="k",
            ).collect()
        }
        assert rep == {"v_positive": 1, "flag_domain": 1, "unique:k": 1}

    def test_clean_table_all_zero(self, spark, sf_dir):
        from ting_data_etl_spark.operators.quality import (
            dq_lineitem_expectations,
        )

        rep = {r.check_name: r.n_violations for r in dq_lineitem_expectations(spark, sf_dir).collect()}
        # the five INVARIANT checks hold (V3 contract); the uniqueness row
        # is a reported drift metric — the synthetic generator does not
        # enforce TPC-H's composite-key uniqueness, and the report's job is
        # to SURFACE that, which it does
        for name in (
            "qty_positive",
            "discount_range",
            "price_not_null",
            "returnflag_domain",
            "shipdate_floor",
        ):
            assert rep[name] == 0, name
        assert "unique:l_orderkey:l_linenumber" in rep
        assert len(rep) == 6


class TestSketchAccuracy:
    def test_rel_error_within_contract(self, spark, sf_dir):
        from ting_data_etl_spark.operators.quality import (
            stats_sketch_accuracy,
        )

        rows = {r.metric: r for r in stats_sketch_accuracy(spark, sf_dir).collect()}
        assert set(rows) == {
            "distinct_users", "value_p50", "value_p90", "value_p99"
        }
        for r in rows.values():
            assert r.rel_error <= 0.05, (r.metric, r.rel_error)
            assert r.exact > 0 and r.approx > 0
