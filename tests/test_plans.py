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
