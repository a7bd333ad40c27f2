"""Tests for the round-5 window/rollup/skew/SCD2 additions."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestRunningValue:
    def test_prefix_sums_and_sequence(self, spark, sf_dir):
        from ting_data_etl_spark.operators.temporal import (
            events_user_running_value,
        )
        from ting_data_etl_spark.sources.tables import load_table

        out = events_user_running_value(spark, sf_dir)
        # per-user: seq is 1..n and the last running value equals the exact
        # fixed-point user total
        per_user = out.groupBy("user_id").agg(
            F.count("*").alias("n"),
            F.max("event_seq").alias("max_seq"),
            F.min("event_seq").alias("min_seq"),
            F.max_by("running_value", "event_seq").alias("final_running"),
        )
        truth = (
            load_table(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(
                (
                    F.sum(F.round(F.col("value") * 1_000_000).cast("long"))
                    / 1_000_000.0
                ).alias("total")
            )
        )
        j = per_user.join(truth, "user_id").collect()
        assert j, "no users"
        for r in j:
            assert r.min_seq == 1 and r.max_seq == r.n
            assert abs(r.final_running - r.total) < 1e-9


class TestRollup:
    def test_margins_are_consistent(self, spark, sf_dir):
        from ting_data_etl_spark.operators.olap import (
            olap_rollup_priority_year,
        )

        rows = olap_rollup_priority_year(spark, sf_dir).collect()
        grand = [r for r in rows if r.priority is None and r.yr is None]
        per_p = [r for r in rows if r.priority is not None and r.yr is None]
        leaves = [r for r in rows if r.priority is not None and r.yr is not None]
        assert len(grand) == 1
        assert grand[0].n_orders == sum(r.n_orders for r in per_p) == sum(
            r.n_orders for r in leaves
        )
        assert abs(
            grand[0].total_price - sum(r.total_price for r in per_p)
        ) < 1e-6


class TestSaltedJoinQuery:
    def test_matches_plain_join(self, spark, sf_dir):
        from ting_data_etl_spark.functions.cleaning import sum_exact
        from ting_data_etl_spark.operators.skew import (
            skew_salted_join_revenue,
        )
        from ting_data_etl_spark.sources.tables import load_table

        got = {
            r.mktsegment: (r.n_orders, r.total_price)
            for r in skew_salted_join_revenue(spark, sf_dir).collect()
        }
        o = load_table(spark, sf_dir, "orders")
        c = load_table(spark, sf_dir, "customer")
        plain = {
            r.mktsegment: (r.n_orders, r.total_price)
            for r in o.join(c, o.o_custkey == c.c_custkey)
            .groupBy(F.col("c_mktsegment").alias("mktsegment"))
            .agg(
                F.count("*").alias("n_orders"),
                sum_exact("o_totalprice", scale=2).alias("total_price"),
            )
            .collect()
        }
        assert got == plain


class TestScd2:
    def test_intervals_partition_the_timeline(self, spark, sf_dir):
        from ting_data_etl_spark.operators.cdc import cdc_scd2_history

        rows = cdc_scd2_history(spark, sf_dir).collect()
        by_cust: dict[int, list] = {}
        for r in rows:
            by_cust.setdefault(r.custkey, []).append(r)
        assert by_cust
        for cust, vs in by_cust.items():
            vs.sort(key=lambda r: (r.effective_from, r.version_key))
            currents = [r for r in vs if r.is_current == 1]
            assert len(currents) == 1 and currents[0] is vs[-1]
            for r in vs:
                # half-open [from, to): never inverted, even for same-day
                # versions (which yield an empty interval, by contract)
                assert r.effective_from <= r.effective_to
            for a, b in zip(vs, vs[1:]):
                # each version ends exactly where the next begins
                assert a.effective_to == b.effective_from
            assert vs[-1].effective_to == "9999-12-31"


class TestPlanShapes:
    """Shuffle-economy pins for the round-5 additions."""

    def _nexch(self, df):
        return df._jdf.queryExecution().executedPlan().toString().count(
            "Exchange"
        )

    def test_gopher_and_repetition_are_shuffle_free(self, spark, sf_dir):
        from ting_data_etl_spark.operators.curation import (
            text_gopher_quality_rules,
            text_repetition_metrics,
        )

        assert self._nexch(text_gopher_quality_rules(spark, sf_dir)) == 0
        assert self._nexch(text_repetition_metrics(spark, sf_dir)) == 0

    def test_running_value_single_shuffle(self, spark, sf_dir):
        from ting_data_etl_spark.operators.temporal import (
            events_user_running_value,
        )

        assert self._nexch(events_user_running_value(spark, sf_dir)) == 1

    def test_scd2_single_shuffle(self, spark, sf_dir):
        from ting_data_etl_spark.operators.cdc import cdc_scd2_history

        assert self._nexch(cdc_scd2_history(spark, sf_dir)) == 1

    def test_rollup_one_aggregation_pass(self, spark, sf_dir):
        from ting_data_etl_spark.operators.olap import (
            olap_rollup_priority_year,
        )

        df = olap_rollup_priority_year(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # one Expand feeding one shuffle — not three separate aggregations
        assert plan.count("Expand") == 1
        assert self._nexch(df) <= 2  # partial/final agg exchange (+AQE read)

    def test_contamination_broadcasts_benchmark(self, spark, sf_dir):
        from ting_data_etl_spark.operators.curation import (
            dedup_contamination_check,
        )

        plan = (
            dedup_contamination_check(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan

    def test_salted_join_output_hides_salt(self, spark, sf_dir):
        from ting_data_etl_spark.operators.skew import (
            skew_salted_join_revenue,
        )

        df = skew_salted_join_revenue(spark, sf_dir)
        assert "__salt" not in df.columns
