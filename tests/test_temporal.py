"""Tests for as-of join and range-activity temporal operators."""

from __future__ import annotations

import pyspark.sql.functions as F


def _events(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, us long, user_id long, event_type string"
    )
    return df.select(
        "event_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "user_id",
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("").alias("props"),
    )


class TestAsofJoin:
    def test_semantics(self, spark, monkeypatch, sf_dir):
        import ting_data_etl_spark.operators.temporal as tp

        rows = [
            # u1: click@10, purchase@20 -> match click 1 (gap 10)
            (1, 10, 1, "click"),
            (2, 20, 1, "purchase"),
            # u1: click@20 exists too? no - same-ts case on u2
            # u2: click@30 and purchase@30 -> at-or-before includes same ts
            (3, 30, 2, "click"),
            (4, 30, 2, "purchase"),
            # u3: purchase with no prior click -> null match
            (5, 40, 3, "purchase"),
            (6, 50, 3, "click"),  # later click must NOT match
            # u1: second purchase@25 still matches click 1
            (7, 25, 1, "purchase"),
        ]
        ev = _events(spark, rows)
        monkeypatch.setattr(tp, "load_table", lambda s, d, n: ev)
        got = {
            r.purchase_id: (r.click_id, r.gap_us)
            for r in tp.events_asof(spark, "unused").collect()
        }
        assert got[2] == (1, 10)
        assert got[4] == (3, 0)  # same-timestamp click counts
        assert got[5] == (None, None)
        assert got[7] == (1, 15)


class TestRangeActivity:
    def test_trailing_window_counts(self, spark, monkeypatch):
        import ting_data_etl_spark.operators.temporal as tp

        m = 60 * 1_000_000
        rows = [
            (1, 0 * m, 1, "view"),
            (2, 3 * m, 1, "view"),  # sees event 1
            (3, 10 * m, 1, "view"),  # sees nothing (gap > 5min)
            (4, 12 * m, 1, "view"),  # sees 3 and its peer 5 (RANGE ties)
            (5, 12 * m, 1, "view"),  # sees 3 and its peer 4
            (6, 0, 2, "view"),  # other user isolated
        ]
        ev = _events(spark, rows)
        monkeypatch.setattr(tp, "load_table", lambda s, d, n: ev)
        got = {
            r.event_id: r.n_prev_5min
            for r in tp.events_range_activity(spark, "unused").collect()
        }
        assert got == {1: 0, 2: 1, 3: 0, 4: 2, 5: 2, 6: 0}


class TestFunnelAndCohort:
    def test_funnel_flags_consistent(self, spark, sf_dir):
        from ting_data_etl_spark.operators.temporal import (
            events_funnel_user_conversion,
        )

        rows = events_funnel_user_conversion(spark, sf_dir).collect()
        assert rows
        for r in rows:
            if r.converted:
                assert r.first_purchase_us >= r.first_click_us
                assert r.gap_us == r.first_purchase_us - r.first_click_us
            else:
                assert r.first_purchase_us is None and r.gap_us is None

    def test_cohort_offsets_bounded_and_monotone_at_zero(self, spark, sf_dir):
        from ting_data_etl_spark.operators.temporal import (
            COHORT_MAX_OFFSET_HR,
            events_hour_cohort_retention,
        )

        rows = events_hour_cohort_retention(spark, sf_dir).collect()
        assert rows
        by_cohort: dict[int, dict[int, int]] = {}
        for r in rows:
            assert 0 <= r.offset_hr <= COHORT_MAX_OFFSET_HR
            by_cohort.setdefault(r.cohort_hr, {})[r.offset_hr] = (
                r.n_active_users
            )
        for cohort, cells in by_cohort.items():
            # offset 0 is every cohort member, so it bounds every later cell
            assert 0 in cells
            assert all(n <= cells[0] for n in cells.values())
