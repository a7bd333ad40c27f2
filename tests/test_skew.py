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


class TestBandedRunningSum:
    def _naive(self, ev):
        from pyspark.sql import Window

        w = Window.partitionBy("k").orderBy("t", "i")
        ws = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return ev.select(
            "i", "k", F.sum("v").over(ws).alias("run"),
            F.row_number().over(w).cast("long").alias("seq"),
        )

    def _skewed_events(self, spark, n=20_000):
        # hot key 0 holds 50% of rows; timestamps interleaved across keys
        return spark.range(n).select(
            F.col("id").alias("i"),
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.col("id") % 37)
            .alias("k"),
            (F.xxhash64("id") % 1_000_000).alias("t"),
            (F.col("id") % 97).cast("long").alias("v"),
        )

    def test_equals_naive_window_on_skewed_data(self, spark):
        from ting_data_etl_spark.operators.skew import banded_running_sum

        ev = self._skewed_events(spark)
        banded = banded_running_sum(
            ev, key="k", order_time="t", order_tiebreak="i", value="v"
        ).select("i", "k", F.col("__run").alias("run"), F.col("__seq").alias("seq"))
        a = sorted(tuple(r) for r in self._naive(ev).collect())
        b = sorted(tuple(r) for r in banded.collect())
        assert a == b

    def test_degenerate_single_timestamp_still_exact(self, spark):
        """All rows share one timestamp: banding cannot split (documented),
        but values must stay exact — the fallback is slow, never wrong."""
        from ting_data_etl_spark.operators.skew import banded_running_sum

        ev = spark.range(500).select(
            F.col("id").alias("i"),
            (F.col("id") % 3).alias("k"),
            F.lit(42).alias("t"),
            F.lit(1).alias("v"),
        )
        banded = banded_running_sum(
            ev, key="k", order_time="t", order_tiebreak="i", value="v"
        )
        got = {(r.i, r.k): (r["__run"], r["__seq"]) for r in banded.collect()}
        want = {(r.i, r.k): (r.run, r.seq) for r in self._naive(ev).collect()}
        assert got == want

    def test_empty_input_returns_empty_with_schema(self, spark):
        """Empty (or all-filtered) input must not crash the min/max scalar
        fetch — it degrades to the naive window and yields zero rows."""
        from ting_data_etl_spark.operators.skew import banded_running_sum

        ev = self._skewed_events(spark).filter(F.lit(False))
        out = banded_running_sum(
            ev, key="k", order_time="t", order_tiebreak="i", value="v"
        )
        assert out.count() == 0
        assert {"__run", "__seq"} <= set(out.columns)

    def test_null_timestamps_survive_and_sort_first(self, spark):
        """NULL order-time rows must not be dropped by the (key, band) join
        — they band to -1 and order before every real band, matching the
        naive window's NULLS FIRST ascending semantics."""
        from ting_data_etl_spark.operators.skew import banded_running_sum

        ev = self._skewed_events(spark, n=4_000).withColumn(
            "t", F.when(F.col("i") % 5 == 0, None).otherwise(F.col("t"))
        )
        banded = banded_running_sum(
            ev, key="k", order_time="t", order_tiebreak="i", value="v"
        ).select("i", "k", F.col("__run").alias("run"), F.col("__seq").alias("seq"))
        a = sorted(tuple(r) for r in self._naive(ev).collect())
        b = sorted(tuple(r) for r in banded.collect())
        assert a == b

    def test_null_keys_kept_as_their_own_partition(self, spark):
        """NULL join keys: groupBy keeps NULLs as a group, so the offsets
        join must be null-safe or every NULL-key row silently vanishes
        (the naive window keeps them as their own partition)."""
        from ting_data_etl_spark.operators.skew import banded_running_sum

        ev = self._skewed_events(spark, n=4_000).withColumn(
            "k", F.when(F.col("i") % 7 == 0, None).otherwise(F.col("k"))
        )
        banded = banded_running_sum(
            ev, key="k", order_time="t", order_tiebreak="i", value="v"
        ).select("i", "k", F.col("__run").alias("run"), F.col("__seq").alias("seq"))
        a = sorted((r.i, r.k, r.run, r.seq) for r in self._naive(ev).collect())
        b = sorted((r.i, r.k, r.run, r.seq) for r in banded.collect())
        assert len(a) == 4_000  # nothing dropped
        assert a == b

    def test_null_values_null_skip_like_window_sum(self, spark):
        """NULL values: SUM null-skips per prefix — an all-NULL band prefix
        must not null-propagate into the running total, and a prefix with
        zero non-null values anywhere must stay NULL."""
        from ting_data_etl_spark.operators.skew import banded_running_sum

        ev = self._skewed_events(spark, n=4_000).withColumn(
            # key 1's EARLIEST rows all-NULL (leading-NULL prefix), plus
            # scattered NULLs everywhere
            "v",
            F.when(F.col("i") % 3 == 0, None).otherwise(F.col("v")),
        )
        banded = banded_running_sum(
            ev, key="k", order_time="t", order_tiebreak="i", value="v"
        ).select("i", "k", F.col("__run").alias("run"), F.col("__seq").alias("seq"))
        a = sorted((r.i, r.k, r.run, r.seq) for r in self._naive(ev).collect())
        b = sorted((r.i, r.k, r.run, r.seq) for r in banded.collect())
        assert a == b

    def test_empty_cuts_degrade_to_single_band(self, spark):
        from ting_data_etl_spark.operators.skew import banded_running_sum

        ev = self._skewed_events(spark, n=500)
        banded = banded_running_sum(
            ev, key="k", order_time="t", order_tiebreak="i", value="v", cuts=[]
        ).select("i", "k", F.col("__run").alias("run"), F.col("__seq").alias("seq"))
        a = sorted(tuple(r) for r in self._naive(ev).collect())
        b = sorted(tuple(r) for r in banded.collect())
        assert a == b

    def test_all_null_timestamps_fall_back_to_naive(self, spark):
        from ting_data_etl_spark.operators.skew import banded_running_sum

        ev = self._skewed_events(spark, n=1_000).withColumn(
            "t", F.lit(None).cast("long")
        )
        banded = banded_running_sum(
            ev, key="k", order_time="t", order_tiebreak="i", value="v"
        ).select("i", "k", F.col("__run").alias("run"), F.col("__seq").alias("seq"))
        a = sorted(tuple(r) for r in self._naive(ev).collect())
        b = sorted(tuple(r) for r in banded.collect())
        assert a == b

    def test_quantile_cuts_equal_naive_and_balance_bursty_time(self, spark):
        """Bursty event time (99% of rows in 1% of the range): quantile
        banding stays value-exact AND keeps the hot key spread across
        many bands where linear banding collapses to very few."""
        from ting_data_etl_spark.operators.skew import (
            RUNNING_BANDS,
            banded_running_sum,
            quantile_band_cuts,
        )

        # burst: ids not divisible by 100 get t in [0, 10_000); the rest
        # spread to 1e9 — linear bands over the full span put ~99% of rows
        # into band 0
        ev = self._skewed_events(spark, n=20_000).withColumn(
            "t",
            F.when(
                F.col("i") % 100 != 0, F.abs(F.xxhash64("i")) % 10_000
            ).otherwise(F.abs(F.xxhash64("i", F.lit(2))) % 1_000_000_000),
        )
        cuts = quantile_band_cuts(ev, "t")
        banded = banded_running_sum(
            ev, key="k", order_time="t", order_tiebreak="i", value="v", cuts=cuts
        ).select("i", "k", F.col("__run").alias("run"), F.col("__seq").alias("seq"))
        a = sorted(tuple(r) for r in self._naive(ev).collect())
        b = sorted(tuple(r) for r in banded.collect())
        assert a == b

        def hot_key_max_band_share(cuts_arg):
            lo = ev.agg(F.min("t")).first()[0]
            hi = ev.agg(F.max("t")).first()[0]
            span = max(int(hi) - int(lo), 0) + 1
            if cuts_arg is None:
                band = F.floor(
                    (F.col("t") - F.lit(int(lo))) * RUNNING_BANDS / F.lit(span)
                )
            else:
                band = sum(
                    (F.col("t") > F.lit(c)).cast("int") for c in sorted(cuts_arg)
                )
            hot = ev.filter(F.col("k") == 0)
            per_band = hot.groupBy(band.alias("b")).count()
            mx = per_band.agg(F.max("count")).first()[0]
            return mx / hot.count()

        # linear bands over the full span: the burst lands ~99% of the hot
        # key's rows in one band (the straggler survives); quantile cuts
        # spread them near-uniformly
        assert hot_key_max_band_share(None) > 0.9
        assert hot_key_max_band_share(cuts) < 0.2

    def test_hot_key_spans_many_bands(self, spark):
        """The physical claim: the hot key's rows land in >1 (ideally ~all)
        time bands, so the (key, band) shuffle grain splits the straggler."""
        from ting_data_etl_spark.operators.skew import (
            RUNNING_BANDS,
            banded_running_sum,
        )

        ev = self._skewed_events(spark)
        lo, hi = ev.agg(F.min("t"), F.max("t")).first()
        span = max(int(hi) - int(lo), 0) + 1
        n_bands = (
            ev.filter(F.col("k") == 0)
            .select(
                F.floor(
                    (F.col("t") - F.lit(int(lo))) * RUNNING_BANDS / F.lit(span)
                ).alias("b")
            )
            .distinct()
            .count()
        )
        assert n_bands >= RUNNING_BANDS // 2
        # and the rewrite over that banding is still exact (subsumed above,
        # cheap re-assert on the hot key only)
        banded = banded_running_sum(
            ev, key="k", order_time="t", order_tiebreak="i", value="v"
        )
        hot_max = (
            banded.filter(F.col("k") == 0).agg(F.max("__seq")).first()[0]
        )
        assert hot_max == ev.filter(F.col("k") == 0).count()
