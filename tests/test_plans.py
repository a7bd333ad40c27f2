"""Physical-plan assertions: broadcast dims, pushed filters, no row UDFs.

These make the scale claims in ``plans/jobs.py`` checkable: dimension joins
broadcast, parquet scans receive pushed filters / pruned schemas, and no
registered query ever falls back to a row-at-a-time Python UDF
(``BatchEvalPython``), which would leave whole-stage codegen.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def plan_str(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


class TestJoinStrategies:
    def test_job_23_1_broadcasts_dimension_joins(self, spark, sf_dir):
        plan = plan_str(entrymod.queries()["job_23_1_annual_kpi"](spark, sf_dir))
        assert "BroadcastHashJoin" in plan

    def test_flagship_pushes_shipdate_filter_to_scan(self, spark, sf_dir):
        plan = plan_str(entrymod.queries()["flagship_pricing_summary"](spark, sf_dir))
        assert "PushedFilters: [IsNotNull(l_shipdate)" in plan.replace("\n", " ") or (
            "l_shipdate" in plan and "PushedFilters" in plan
        )
        # column pruning: the scan must not read all 16 lineitem columns
        assert "l_comment" not in plan

    def test_dedup_exact_shuffles_fingerprints_not_bodies(self, spark, sf_dir):
        plan = plan_str(entrymod.queries()["dedup_exact"](spark, sf_dir))
        # the window partition key is the md5 fingerprint column...
        assert "fp" in plan and "Window" in plan
        # ...and exactly one Window node (keeper expression evaluated once)
        assert plan.count("Window") <= 2  # node + its ordering spec line


class TestNoRowAtATimeUdfs:
    """No registered query may use BatchEvalPython (row-wise Python UDF).

    Arrow-batched ``MapInPandas``/``FlatMapGroupsInPandas`` are the sanctioned
    Python escape hatches; ``BatchEvalPython`` is the 10-100x-slower row path
    that must never appear.
    """

    @pytest.mark.parametrize("name", sorted(entrymod.queries()))
    def test_no_python_row_udf(self, spark, sf_dir, name):
        if name.startswith("streaming_") or name.startswith("e2e_") or name.startswith("sink_"):
            pytest.skip("materializing query — plan checked in its own test")
        df = entrymod.queries()[name](spark, sf_dir)
        assert "BatchEvalPython" not in plan_str(df)


class TestShuffleBudgets:
    """Pin the Exchange count of plans whose whole design is shuffle economy."""

    def _plan(self, df):
        return df._jdf.queryExecution().executedPlan().toString()

    def test_asof_join_single_shuffle(self, spark, sf_dir):
        from ting_data_etl_spark.operators.temporal import events_asof

        plan = self._plan(events_asof(spark, sf_dir))
        assert plan.count("Exchange") == 1  # the user_id window shuffle

    def test_range_activity_single_shuffle(self, spark, sf_dir):
        from ting_data_etl_spark.operators.temporal import (
            events_range_activity,
        )

        plan = self._plan(events_range_activity(spark, sf_dir))
        assert plan.count("Exchange") == 1

    def test_json_extract_single_shuffle_carries_longs(self, spark, sf_dir):
        from ting_data_etl_spark.operators.temporal import (
            events_json_props_extract,
        )

        df = events_json_props_extract(spark, sf_dir)
        plan = self._plan(df)
        assert plan.count("Exchange") == 1  # only the final aggregation
        # map-side combine runs BEFORE the shuffle, so the exchange carries
        # partial aggregates of the typed long — never the JSON string
        exchange_line = next(
            l for l in plan.splitlines() if "Exchange" in l
        )
        assert "props" not in exchange_line
        assert "partial_sum" in plan  # partial agg below the exchange

    def test_stratified_split_one_shuffle_on_source(self, spark, sf_dir):
        """Exact per-source stratification costs exactly ONE shuffle (the
        rank window over source); the r6 map-only form was a plain global
        hash split that did not stratify at all."""
        from ting_data_etl_spark.operators.sampling import stratified_split

        plan = self._plan(stratified_split(spark, sf_dir))
        assert plan.count("Exchange") == 1

    def test_sample_and_mixture_stay_map_only(self, spark, sf_dir):
        from ting_data_etl_spark.operators.sampling import (
            corpus_weighted_mixture,
            sample_hash_mod,
        )

        assert "Exchange" not in self._plan(sample_hash_mod(spark, sf_dir))
        # the mixture's report rollup aggregates AFTER the map-side filter;
        # its only exchange is the tiny groupBy("source")
        assert (
            self._plan(corpus_weighted_mixture(spark, sf_dir)).count("Exchange")
            <= 1
        )

    def test_minhash_signatures_single_shuffle(self, spark, sf_dir):
        from ting_data_etl_spark.operators.dedup import (
            minhash_signatures_df,
        )
        from ting_data_etl_spark.sources.tables import load_table

        d = load_table(spark, sf_dir, "documents")
        plan = self._plan(minhash_signatures_df(d))
        # one exchange: the doc_id window; the groupBy reuses its partitioning
        assert plan.count("Exchange") == 1


class TestApproxVariants:
    """The at-scale approximate swaps must stay near their exact twins."""

    def test_approx_count_distinct_tolerance(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from ting_data_etl_spark.sources.tables import load_table

        d = load_table(spark, sf_dir, "documents")
        row = d.agg(
            F.countDistinct("doc_id").alias("exact"),
            F.approx_count_distinct("doc_id", rsd=0.05).alias("approx"),
        ).first()
        assert abs(row.approx - row.exact) / row.exact < 0.15

    def test_percentile_approx_tolerance(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from ting_data_etl_spark.sources.tables import load_table

        d = load_table(spark, sf_dir, "documents")
        row = d.agg(
            F.expr("percentile(n_chars, 0.5)").alias("exact"),
            F.expr("percentile_approx(n_chars, 0.5, 1000)").alias("approx"),
        ).first()
        assert abs(row.approx - row.exact) / max(row.exact, 1) < 0.05


class TestShuffleOrderDeterminism:
    """Fixed-point sums must be bit-identical under different partitionings —
    the property that makes results reproducible on any cluster size."""

    def test_flagship_identical_under_repartitioning(self, spark, sf_dir):
        import __spark_entry__ as entrymod

        q = entrymod.queries()["flagship_pricing_summary"]
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            a = {tuple(r) for r in q(spark, sf_dir).collect()}
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            b = {tuple(r) for r in q(spark, sf_dir).collect()}
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        assert a == b

    def test_job_23_2_identical_under_repartitioning(self, spark, sf_dir):
        import __spark_entry__ as entrymod

        q = entrymod.queries()["job_23_2_monthly_yoy"]
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            a = {tuple(r) for r in q(spark, sf_dir).collect()}
            spark.conf.set("spark.sql.shuffle.partitions", "5")
            b = {tuple(r) for r in q(spark, sf_dir).collect()}
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        assert a == b
