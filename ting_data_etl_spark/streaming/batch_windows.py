"""Event-time windowing over ``events`` — batch twins of the streaming ops.

The reference has no streams ("streaming" there means bounded-memory file
processing, SURVEY §2.9); these are the §7.4 extensions. Each query here is
the *batch-mode equivalent* of a Structured Streaming pipeline in
:mod:`ting_data_etl_spark.streaming.windows` — identical logical semantics
(same windows, same aggregates), which is exactly how Structured Streaming
defines itself: a streaming query is the incremental execution of this batch
plan. The true streaming versions run ``trigger(availableNow)`` /
``session_window`` pipelines and are themselves oracle-checked
(``streaming_*`` registry entries); ``tests/test_streaming.py`` additionally
asserts batch↔stream parity row for row.

Determinism: timestamps are compared/bucketed in integer microseconds
(``unix_micros`` ↔ ``epoch_us``) — no float time arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ting_data_etl_spark.functions.cleaning import sum_exact
from ting_data_etl_spark.plans.oracles import sql_sum_exact
from ting_data_etl_spark.registry import register
from ting_data_etl_spark.sources.tables import load_table

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap


# --- tumbling window -------------------------------------------------------
_SQL_TUMBLING = f"""
SELECT event_type,
       CAST(floor(epoch_us(ts) / 300000000) * 300 AS BIGINT) AS window_start_s,
       COUNT(*) AS n_events,
       {sql_sum_exact("value", 6)} AS total_value
FROM events
GROUP BY 1, 2
"""


@register("events_tumbling_5min", oracle=_SQL_TUMBLING)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling windows per event type (streaming twin: watermarked
    ``F.window`` agg)."""
    e = load_table(spark, sf_dir, "events")
    w = F.window("ts", "5 minutes")
    return (
        e.groupBy("event_type", w.alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            sum_exact("value", scale=6).alias("total_value"),
        )
        .select(
            "event_type",
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "n_events",
            "total_value",
        )
    )


# --- sliding window --------------------------------------------------------
_SQL_SLIDING = f"""
WITH base AS (
  SELECT event_type, epoch_us(ts) AS us, value FROM events
),
slid AS (
  -- 300s window, 150s slide → each event is in exactly 2 windows whose
  -- starts are floor(t/150)*150 and that minus 150 (Spark's window-gen rule)
  SELECT event_type, value,
         CAST(floor(us / 150000000) * 150 AS BIGINT) - s.shift AS window_start_s
  FROM base
  CROSS JOIN (SELECT unnest([0, 150]) AS shift) s
)
SELECT event_type, window_start_s, COUNT(*) AS n_events
FROM slid GROUP BY 1, 2
"""


@register("events_sliding_5min_step150s", oracle=_SQL_SLIDING)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute windows sliding every 150 s — each event lands in 2 windows."""
    e = load_table(spark, sf_dir, "events")
    w = F.window("ts", "5 minutes", "150 seconds")
    return (
        e.groupBy("event_type", w.alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "event_type",
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "n_events",
        )
    )


# --- sessionization (gap-based) -------------------------------------------
def sql_session_ctes() -> str:
    """The lag/gap/cumsum sessionization chain ending in ``sessions`` —
    ONE definition shared by the batch oracle here and BOTH streaming
    sessionize oracles (native session_window and the custom stateful
    operator), so a gap-semantics or tiebreak change moves all three
    together instead of silently splitting the families."""
    return f"""
WITH seq AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_us
  FROM events
),
marked AS (
  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS is_new
  FROM seq
),
sessions AS (
  SELECT *, CAST(SUM(is_new) OVER (
           -- event_id tiebreak: with ROWS framing a non-unique ORDER BY
           -- would make same-microsecond rows' session assignment depend
           -- on sort luck (latent until a skewed corpus plants ts ties)
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS session_no
  FROM marked
)"""


_SQL_SESSIONS = f"""
{sql_session_ctes()}
SELECT user_id, session_no,
       COUNT(*) AS n_events,
       MIN(us) AS session_start_us,
       MAX(us) AS session_end_us,
       {sql_sum_exact("value", 6)} AS total_value
FROM sessions
GROUP BY 1, 2
"""


@register("events_sessionize_30min_gap", oracle=_SQL_SESSIONS)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions: new session when >30 min since previous event.

    Batch formulation is the classic lag → new-session flag → running sum.
    Streaming twin: ``session_window`` / ``applyInPandasWithState`` in
    :mod:`ting_data_etl_spark.streaming.windows`. Scale shape: ONE shuffle
    on user_id serves both windows and the final group-by.
    """
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    marked = e.withColumn(
        "is_new",
        F.when(
            F.lag("us").over(w).isNull()
            | ((F.col("us") - F.lag("us").over(w)) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    sessions = marked.withColumn(
        "session_no", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sessions.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.min("us").alias("session_start_us"),
        F.max("us").alias("session_end_us"),
        sum_exact("value", scale=6).alias("total_value"),
    )


# --- top users per event type (windowed rank over aggregates) --------------
_SQL_TOP_USERS = f"""
WITH agg AS (
  SELECT event_type, user_id,
         COUNT(*) AS n_events,
         {sql_sum_exact("value", 6)} AS total_value
  FROM events GROUP BY 1, 2
)
SELECT event_type, user_id, n_events, total_value
FROM (
  SELECT *, row_number() OVER (
           PARTITION BY event_type
           ORDER BY total_value DESC NULLS LAST, user_id ASC
         ) AS rn
  FROM agg
) WHERE rn <= 10
"""


@register("events_top_users_by_value", oracle=_SQL_TOP_USERS)
def events_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy("event_type", "user_id").agg(
        F.count("*").alias("n_events"),
        sum_exact("value", scale=6).alias("total_value"),
    )
    from ting_data_etl_spark.operators.relational import top_k_per_group

    return top_k_per_group(
        agg, ["event_type"], "total_value", k=10, tiebreak=["user_id"]
    )
