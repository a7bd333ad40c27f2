"""Skew-mitigation utilities: salted joins and two-stage aggregation.

No reference-side counterpart (single-process pandas never sees a shuffle).
At cluster scale one hot key — a null join key, a boilerplate document, a
bot user — lands an entire shuffle partition on one task and the stage runs
at the speed of that straggler. AQE's skew-join splitting (enabled in
``session.get_spark``) handles sort-merge joins it can observe; these
utilities cover the cases AQE can't:

* :func:`salted_join` — explode the dimension side S ways, salt the fact
  side's key with ``hash % S``: the hot key's rows spread over S tasks.
  For broadcast-sized dims prefer ``F.broadcast`` (no salt needed); the
  salt is for large⨝large joins with known-hot keys.
* :func:`two_stage_agg_sum` — pre-aggregate on (key, salt), then finish on
  key: the classic fix for aggregations whose *combiner* is defeated (e.g.
  ``collect_set``/exact distinct), where map-side combine can't shrink the
  hot key. (Plain algebraic SUM/COUNT already combine map-side; the
  utility exists for the non-algebraic cases and is proven equivalent.)

Both are correctness-preserving rewrites — pytest pins them equal to the
unsalted plans on adversarially skewed synthetic data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ting_data_etl_spark.registry import register

DEFAULT_SALT = 16


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the dimension replicated ``salt`` ways.

    fact gains ``__salt = pmod(xxhash64(key, row-entropy), salt)``; dim is
    exploded to one copy per salt value; the join key becomes
    ``(key, __salt)``. Every hot fact key now spans ``salt`` tasks while
    each dim row is duplicated only ``salt`` times — the right trade when
    dim ≪ fact but dim is too big (or the key too hot) to broadcast.

    Only ``inner`` and ``left`` (fact-preserving) joins are supported: the
    dim side is exploded ``salt`` ways, so a right/full outer join would
    emit every unmatched dim row ``salt`` times — silently wrong. Such
    joins must salt the other way around (swap the sides) or dedupe
    unmatched rows, which this utility deliberately refuses to guess.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the exploded dim side "
            "would duplicate unmatched rows; use 'inner' or 'left', or swap "
            "the sides"
        )
    f = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.col(key), F.monotonically_increasing_id()), salt),
    )
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = f.join(d, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def two_stage_agg_sum(
    df: DataFrame,
    key: str,
    value: Column | str,
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """SUM per key via (key, salt) partial aggregation then key final.

    Stage 1 shuffles on (key, salt) — the hot key's rows split across
    ``salt`` reducers; stage 2 shuffles only ``#keys × salt`` pre-aggregated
    rows. Returns (key, total).
    """
    v = F.col(value) if isinstance(value, str) else value
    partial = (
        df.withColumn(
            "__salt",
            F.pmod(
                F.xxhash64(F.col(key), F.monotonically_increasing_id()), salt
            ),
        )
        .groupBy(key, "__salt")
        .agg(F.sum(v).alias("__part"))
    )
    return partial.groupBy(key).agg(F.sum("__part").alias("total"))


# --- banded running sum: skew-tolerant cumulative window --------------------
#: time-bands per key for the banded prefix sum. On a cluster, size so the
#: hottest key's rows / RUNNING_BANDS fits one task comfortably.
RUNNING_BANDS = 32


def banded_running_sum(
    ev: DataFrame,
    key: str,
    order_time: str,
    order_tiebreak: str,
    value: str,
    bands: int = RUNNING_BANDS,
    cuts: list | None = None,
) -> DataFrame:
    """Per-key cumulative SUM + row_number, split across *bands* reducers.

    ``Window.partitionBy(key)`` puts EVERY row of a key on one task — the
    one shuffle shape AQE cannot split (a window partition is indivisible),
    so a key holding 30% of a 100 TB stream collapses the stage onto one
    reducer. This operator is the algebraic rewrite: band each key's rows
    by event time, compute band-LOCAL running sums/counts (shuffle on
    ``(key, band)`` — the hot key now spans ``bands`` tasks), then add each
    band's exclusive prefix offset, computed with a window over the tiny
    per-key band-totals table (≤ ``bands`` rows per key). Three shuffles on
    the salted grain + one O(keys·bands) window, no indivisible partition
    anywhere. Exact, not approximate: prefix sums compose associatively.

    Banding is linear in ``order_time`` between its global min/max (two
    driver scalars) by default; pass ``cuts`` (e.g. from
    :func:`quantile_band_cuts`) to band on the time column's quantiles
    instead, so a bursty event-time distribution cannot concentrate the
    hot key into a few calendar-dense bands. A key whose rows all share
    ONE timestamp cannot be time-split under either mode and degrades to
    the naive shape for that key.

    Returns the input columns plus ``__run`` (running sum) and ``__seq``
    (1-based row number) per the total order ``(order_time, order_tiebreak)``.
    """
    from pyspark.sql import Window

    lo, hi = ev.agg(
        F.min(order_time), F.max(order_time)
    ).first()
    if lo is None or hi is None:
        # empty input or all-NULL time column: nothing to band — degrade to
        # the naive single-window shape (correct on both inputs, and there
        # is no hot key to protect against)
        w = Window.partitionBy(key).orderBy(order_time, order_tiebreak)
        return ev.withColumn(
            "__run",
            F.sum(value).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        ).withColumn("__seq", F.row_number().over(w).cast("long"))
    span = max(int(hi) - int(lo), 0) + 1
    if cuts is None:
        band = F.floor(
            ((F.col(order_time) - F.lit(int(lo))) * F.lit(int(bands))) / F.lit(span)
        ).cast("int")
    elif not cuts:
        # quantile_band_cuts(bands=1) returns [] — a single band; sum()
        # over zero cut columns would yield the Python int 0, which
        # F.coalesce rejects with a TypeError
        band = F.lit(0)
    else:
        # quantile cuts: band = number of cuts strictly below t. Monotone
        # non-decreasing in t, and EQUAL timestamps always share a band
        # (ties resolve inside the band window), so correctness is
        # banding-agnostic while occupancy tracks the data distribution.
        band = sum(
            (F.col(order_time) > F.lit(c)).cast("int") for c in sorted(cuts)
        )
    # NULL times band to -1 (instead of NULL, which the inner join on
    # (key, band) would silently DROP): they sort before every real band,
    # matching the naive window's NULLS FIRST ascending order
    banded = ev.withColumn("__band", F.coalesce(band, F.lit(-1)))

    wb = Window.partitionBy(key, "__band").orderBy(order_time, order_tiebreak)
    local = banded.withColumn(
        "__loc_sum",
        F.sum(value).over(
            wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).withColumn("__loc_rn", F.row_number().over(wb))

    totals = banded.groupBy(key, "__band").agg(
        F.sum(value).alias("__bsum"), F.count("*").alias("__bn")
    )
    wo = (
        Window.partitionBy(key)
        .orderBy("__band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        F.col(key).alias("__k"),
        F.col("__band").alias("__b"),
        # __off_sum stays RAW (no coalesce): NULL means "zero non-null
        # values in every prior band", which must combine with an all-NULL
        # local prefix to a NULL running sum — exactly the naive window's
        # null-skipping SUM. Coalescing here would turn that case into 0.
        F.sum("__bsum").over(wo).alias("__off_sum"),
        F.coalesce(F.sum("__bn").over(wo), F.lit(0)).alias("__off_n"),
    )
    # eqNullSafe on the key: groupBy keeps NULL keys as their own group
    # (matching the naive window's NULL partition), but a plain equi-join
    # would silently DROP those rows — same mechanism the band coalesce
    # above guards against for NULL times
    joined = local.join(
        offsets,
        local[key].eqNullSafe(F.col("__k")) & (local["__band"] == F.col("__b")),
        "inner",
    )
    # SUM semantics, band-split: NULL iff NO non-null value in the whole
    # prefix (off and loc both NULL); otherwise null-skip either side
    run = F.when(
        F.col("__off_sum").isNull() & F.col("__loc_sum").isNull(),
        F.lit(None),
    ).otherwise(
        F.coalesce(F.col("__off_sum"), F.lit(0))
        + F.coalesce(F.col("__loc_sum"), F.lit(0))
    )
    return (
        joined.withColumn("__run", run)
        .withColumn("__seq", (F.col("__off_n") + F.col("__loc_rn")).cast("long"))
        .drop("__band", "__loc_sum", "__loc_rn", "__off_sum", "__off_n", "__k", "__b")
    )


def quantile_band_cuts(
    ev: DataFrame, order_time: str, bands: int = RUNNING_BANDS
) -> list:
    """Band boundaries at the time column's ``1/bands`` quantiles.

    One ``approxQuantile`` pass (GK sketch, distributed; B-1 driver
    scalars) — the production banding for bursty event time, where linear
    min/max banding would leave most bands empty and pile the hot key's
    rows into the few calendar-dense ones.
    """
    if bands < 2:
        return []
    probs = [i / bands for i in range(1, bands)]
    return ev.approxQuantile(order_time, probs, 0.001)


def _sql_banded_running() -> str:
    from ting_data_etl_spark.operators.temporal import _SQL_RUNNING

    return _SQL_RUNNING


@register("skew_banded_running_value", oracle=_sql_banded_running)
def skew_banded_running_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running value via the banded prefix sum — oracle-identical
    to ``events_user_running_value`` (the naive single-window twin), so the
    driver proves the skew rewrite is invisible in the values. The physical
    difference is the whole point: the naive plan's window partition is one
    task per user; this plan's hottest key spans ``RUNNING_BANDS`` tasks.
    """
    from ting_data_etl_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 1_000_000).cast("long").alias("v6"),
    )
    out = banded_running_sum(
        ev, key="user_id", order_time="us", order_tiebreak="event_id", value="v6"
    )
    return out.select(
        "event_id",
        "user_id",
        "us",
        (F.col("__run").cast("long") / F.lit(1_000_000.0)).alias("running_value"),
        F.col("__seq").alias("event_seq"),
    )


@register("skew_banded_running_quantile", oracle=_sql_banded_running)
def skew_banded_running_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantile-banded twin of ``skew_banded_running_value``: identical
    values (same oracle), but band boundaries come from the time column's
    own quantiles (``quantile_band_cuts``), so occupancy stays ~uniform
    even when event time is bursty — the production refinement the linear
    variant's docstring promises.
    """
    from ting_data_etl_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 1_000_000).cast("long").alias("v6"),
    )
    cuts = quantile_band_cuts(ev, "us")
    out = banded_running_sum(
        ev,
        key="user_id",
        order_time="us",
        order_tiebreak="event_id",
        value="v6",
        cuts=cuts,
    )
    return out.select(
        "event_id",
        "user_id",
        "us",
        (F.col("__run").cast("long") / F.lit(1_000_000.0)).alias("running_value"),
        F.col("__seq").alias("event_seq"),
    )


# --- registered query: salted fact⨝dim join --------------------------------
_SQL_SALTED = """
SELECT c.c_mktsegment AS mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


@register("skew_salted_join_revenue", oracle=_SQL_SALTED)
def skew_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by market segment through a SALTED orders⨝customer join.

    Drives :func:`salted_join` through the driver's oracle gate: the salt
    must be invisible in the result — the oracle is the PLAIN join — while
    the physical plan spreads each customer key over ``DEFAULT_SALT``
    reducer tasks. This is the shape for a large⨝large join whose hot keys
    AQE cannot split (e.g. sort-merge after the dim outgrew broadcast):
    correctness comes from the rewrite being algebraic, not from data luck.
    The follow-up aggregation is algebraic SUM/COUNT (fixed-point), so it
    map-side combines normally.
    """
    from ting_data_etl_spark.functions.cleaning import sum_exact
    from ting_data_etl_spark.sources.tables import load_table

    fact = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"), "o_totalprice"
    )
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), "c_mktsegment"
    )
    return (
        salted_join(fact, dim, "key")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count("*").alias("n_orders"),
            sum_exact("o_totalprice", scale=2).alias("total_price"),
        )
    )
