"""Plan contracts for the physical-layout operators."""

from __future__ import annotations


class TestTakeOrdered:
    def test_no_global_sort(self, spark, sf_dir):
        from ting_data_etl_spark.operators.layout import top_docs_by_length

        df = top_docs_by_length(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "Exchange rangepartitioning" not in plan  # no global sort


class TestPartitionPruning:
    def test_scan_prunes_to_one_partition(self, spark, sf_dir):
        from ting_data_etl_spark.operators.layout import (
            PRUNE_KEY,
            partition_pruned_read,
        )

        df = partition_pruned_read(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        scan_line = next(
            l for l in plan.splitlines() if "PartitionFilters" in l
        )
        assert PRUNE_KEY in scan_line  # the filter landed in the listing
        # and never as a data filter
        assert "PushedFilters: []" in scan_line or "PushedFilters: []" in plan

    def test_layout_directory_shape(self, spark, sf_dir):
        import os

        from ting_data_etl_spark.operators.layout import (
            stage_partitioned_events,
        )

        staged = stage_partitioned_events(spark, sf_dir)
        parts = [d for d in os.listdir(staged) if d.startswith("event_type=")]
        assert sorted(parts) == [
            "event_type=click",
            "event_type=error",
            "event_type=purchase",
            "event_type=signup",
            "event_type=view",
        ]
