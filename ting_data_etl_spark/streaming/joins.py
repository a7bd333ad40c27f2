"""Stream-stream join and streaming deduplication (SURVEY §7.4 streaming).

The two remaining Structured Streaming state machines the engine needs
beyond windows/sessions (:mod:`windows`) and custom state
(:mod:`stateful`):

* **stream⨝stream interval join** — purchases matched to same-user clicks
  within a trailing 30-minute interval. Both sides carry watermarks and the
  join condition carries the event-time range — exactly what lets Spark
  bound the join state (clicks older than watermark+interval are evicted)
  instead of buffering both streams forever. Inner joins emit on match, so
  the bounded availableNow run produces the complete result.
* **streaming dedup** — ``dropDuplicates`` on the event id with a
  watermark bounding the dedup state. Exercised honestly: the input stream
  is UNIONED WITH ITSELF (every event arrives twice, as with at-least-once
  sources), and the deduplicated per-type totals must equal the batch
  truth — the exactly-once-from-at-least-once pattern every ingest
  pipeline runs.

Both queries check against full-hash DuckDB oracles over the same events.
"""

from __future__ import annotations

import os
import tempfile
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ting_data_etl_spark.functions.cleaning import sum_exact
from ting_data_etl_spark.plans.oracles import sql_sum_exact
from ting_data_etl_spark.registry import register
from ting_data_etl_spark.streaming.windows import (
    run_stream_to_table,
    stage_events_stream,
)

JOIN_LOOKBACK_MIN = 30


_SQL_SS_JOIN = f"""
SELECT p.event_id AS purchase_id,
       c.event_id AS click_id,
       p.user_id,
       epoch_us(p.ts) AS purchase_us,
       epoch_us(c.ts) AS click_us
FROM events p JOIN events c
  ON c.user_id = p.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL {JOIN_LOOKBACK_MIN} MINUTE
 AND c.ts <= p.ts
"""


def click_purchase_join_stream(events: DataFrame) -> DataFrame:
    """Purchases ⨝ same-user clicks in the trailing 30-minute interval."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "10 minutes")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "10 minutes")
    )
    joined = purchases.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {JOIN_LOOKBACK_MIN} MINUTES")
        )
        & (F.col("click_ts") <= F.col("purchase_ts")),
    )
    return joined.select(
        "purchase_id",
        "click_id",
        "user_id",
        F.unix_micros("purchase_ts").alias("purchase_us"),
        F.unix_micros("click_ts").alias("click_us"),
    )


@register("streaming_click_purchase_join", oracle=_SQL_SS_JOIN)
def streaming_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval self-join run to completion (availableNow).

    The watermark + time-range pair is the state-bound contract: click
    state older than watermark − interval is evicted every batch, so the
    join's memory is O(interval × rate), not O(stream). Append mode — the
    only mode stream-stream inner joins support — emits each match once.
    """
    events = stage_events_stream(spark, sf_dir)
    return run_stream_to_table(click_purchase_join_stream(events), "append")


_SQL_STREAM_DEDUP = f"""
SELECT event_type,
       COUNT(*) AS n_events,
       {sql_sum_exact("value", 6)} AS total_value
FROM events GROUP BY event_type
"""


@register("streaming_dedup_exactly_once", oracle=_SQL_STREAM_DEDUP)
def streaming_dedup_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once totals from an at-least-once stream via streaming dedup.

    The input stream is unioned with itself — every event arrives twice,
    the delivery model of any at-least-once source — then
    ``dropDuplicates("event_id")`` with a watermark reduces it back; the
    per-type totals must equal the batch truth over the ORIGINAL events
    (the oracle). The watermark bounds dedup state only when the event-time
    column is part of the dedup subset — ``dropDuplicates(["event_id"])``
    alone would keep every id forever — so the subset is
    ``(event_id, ts)``: duplicate deliveries carry the same event time, and
    state older than the watermark is evicted, which is the production
    memory contract.
    """
    doubled = stage_events_stream(spark, sf_dir).unionByName(
        stage_events_stream(spark, sf_dir)
    )
    dd = doubled.withWatermark("ts", "10 minutes").dropDuplicates(
        ["event_id", "ts"]
    )
    agg = dd.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        sum_exact("value", scale=6).alias("total_value"),
    )
    return run_stream_to_table(agg, "complete")


# same truth as the exactly-once dedup: per-type totals over the ORIGINAL
# events — one constant, two registrations
_SQL_STREAM_DEDUP_TTL = _SQL_STREAM_DEDUP


@register("streaming_dedup_ttl_state", oracle=_SQL_STREAM_DEDUP_TTL)
def streaming_dedup_ttl_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTL-bounded streaming dedup: ``dropDuplicatesWithinWatermark``.

    The harder at-least-once delivery model: the duplicate delivery carries
    a JITTERED event time (+30 s here — retries restamped by the producer),
    so ``dropDuplicates(["event_id", "ts"])`` (the exactly-once query
    above) would count it twice, and ``dropDuplicates(["event_id"])`` would
    grow state forever. ``dropDuplicatesWithinWatermark`` dedupes on the
    business key alone while evicting each key's state one watermark delay
    after its event time — bounded state AND key-only dedup, the production
    contract for restamped retries. Totals must equal the batch truth over
    the ORIGINAL events; the jitter (well inside the 10-minute watermark)
    must be invisible.
    """
    return run_dedup_ttl_state(spark, sf_dir)


def run_dedup_ttl_state(
    spark: SparkSession, sf_dir: str, progress_out: list | None = None
) -> DataFrame:
    """Body of the registered query, with optional progress capture."""
    original = stage_events_stream(spark, sf_dir)
    jittered = stage_events_stream(spark, sf_dir).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 30 SECONDS")
    )
    doubled = original.unionByName(jittered)
    dd = doubled.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    agg = dd.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        sum_exact("value", scale=6).alias("total_value"),
    )
    # no_data_batch stays ON here: the TTL dedup's observable contract is
    # that watermark eviction fires (stateOperators.numRowsRemoved > 0 in
    # the progress evidence), and with a single data batch the eviction
    # tick IS the trailing no-data batch.
    return run_stream_to_table(
        agg, "complete", progress_out=progress_out, no_data_batch=True
    )


# --- parquet file sink round-trip (exactly-once sink metadata) -------------
_STAGED_SINK: dict[str, str] = {}

_SQL_FILE_SINK = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events WHERE event_type IN ('purchase', 'error')
GROUP BY event_type
"""


@register("streaming_parquet_sink_roundtrip", oracle=_SQL_FILE_SINK)
def streaming_parquet_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream → filter → parquet FILE sink → read back → profile.

    The production sink pattern the memory-sink parity queries skip: a
    stateless streaming filter written to a parquet directory with a real
    checkpoint. The sink's ``_spark_metadata`` transaction log is what makes
    file output exactly-once — a batch reader (as here) sees only files the
    log committed, so retries/failures never double-count. The read-back
    aggregation must match the batch truth over the original events.
    """
    from ting_data_etl_spark.streaming.windows import staged_events_generation

    if sf_dir not in _STAGED_SINK:
        ev = stage_events_stream(spark, sf_dir)
        # sink state (checkpoint + output) keyed by the staged input's
        # generation id: a rebuilt stage (new part filenames, same rows)
        # gets a fresh exactly-once domain instead of appending a second
        # copy of every event to the previous generation's output
        base = os.path.join(
            tempfile.gettempdir(),
            "ting_stream_parquet_sink_v2",
            f"{sf_dir.strip('/').replace('/', '_')}_{staged_events_generation(sf_dir)}",
        )
        out, ckpt = os.path.join(base, "data"), os.path.join(base, "ckpt")
        kept = ev.filter(F.col("event_type").isin("purchase", "error")).select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        q = (
            kept.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _STAGED_SINK[sf_dir] = out
    back = spark.read.parquet(_STAGED_SINK[sf_dir])
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
    )


# --- foreachBatch incremental merge (the production sink API) --------------
def _gc_stale_tmp_dirs(root: str, max_age_s: int = 3600) -> None:
    """Best-effort prune of past invocations' generation dirs.

    Every upsert run mints a fresh uuid dir with 4 aggregate generations
    and nothing else ever deletes them — a long-lived box accumulates them
    forever. Best-effort, but loud per the repo's fail-loud policy: a
    persistent EACCES/EIO means tmp dirs accumulate forever and someone
    should know, so a skipped entry warns instead of silently passing.
    """
    import shutil as _shutil
    import time as _time

    if not os.path.isdir(root):
        return
    cutoff = _time.time() - max_age_s
    for d in os.listdir(root):
        p = os.path.join(root, d)
        try:
            if os.path.getmtime(p) < cutoff:
                _shutil.rmtree(p, ignore_errors=True)
        except OSError as exc:
            warnings.warn(
                f"upsert-sink tmp GC skipped {p}: {exc}", stacklevel=2
            )


_SQL_FB_UPSERT = f"""
SELECT user_id,
       COUNT(*) AS n_purchases,
       {sql_sum_exact("value", 6)} AS total_value
FROM events WHERE event_type = 'purchase'
GROUP BY user_id
"""


@register("streaming_foreachbatch_upsert", oracle=_SQL_FB_UPSERT)
def streaming_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally maintained per-user totals via ``foreachBatch`` merge.

    The canonical production sink: each micro-batch's delta is merged into a
    persistent aggregate table ("MERGE INTO" per batch — here emulated with
    generation directories on plain parquet, exactly what table formats wrap
    with a transaction log). The stream replays the 4 time-ordered staged
    files one batch at a time, so the final state is genuinely built from
    incremental merges, and must equal the one-shot batch aggregate over
    all events (the oracle). Fixed-point sums make the merge associative —
    per-batch partial sums combine exactly regardless of batch boundaries.
    """
    import uuid

    from ting_data_etl_spark.streaming.stateful import (
        stage_events_time_split,
    )

    staged = stage_events_time_split(spark, sf_dir)
    # schema DERIVED from the staged files, not a hand-maintained string
    # that must track stage_events_time_split's column list by eye
    schema = spark.read.parquet(staged).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    root = os.path.join(tempfile.gettempdir(), "ting_fb_upsert")
    _gc_stale_tmp_dirs(root)
    base = os.path.join(root, uuid.uuid4().hex)
    os.makedirs(base, exist_ok=True)
    last_gen: dict[str, int] = {"id": -1}

    def merge(batch_df, batch_id: int) -> None:
        # Idempotent under micro-batch retry: generation gen_{batch_id} is
        # computed ONLY from the immutable previous generation
        # gen_{batch_id-1} plus this batch's delta, and written with
        # overwrite — re-running a batch_id reproduces the identical
        # generation instead of re-merging into state that already contains
        # its contribution (the exactly-once contract foreachBatch asks the
        # sink to provide).
        delta = (
            batch_df.filter(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_purchases"),
                F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias(
                    "vscaled"
                ),
            )
        )
        if batch_id > 0:
            prev_path = os.path.join(base, f"gen_{batch_id - 1}")
            if not os.path.exists(os.path.join(prev_path, "_SUCCESS")):
                # silently merging from nothing would restart the aggregate
                # at this batch's delta — a fraction of the truth with no
                # error; fail the query instead
                raise RuntimeError(
                    f"foreachBatch merge: previous generation {prev_path} "
                    "is missing or uncommitted — accumulated history would "
                    "be silently discarded"
                )
            prev = batch_df.sparkSession.read.parquet(prev_path)
            merged = (
                prev.unionByName(delta)
                .groupBy("user_id")
                .agg(
                    F.sum("n_purchases").alias("n_purchases"),
                    F.sum("vscaled").alias("vscaled"),
                )
            )
        else:
            merged = delta
        out = os.path.join(base, f"gen_{batch_id}")
        merged.coalesce(4).write.mode("overwrite").parquet(out)
        last_gen["id"] = max(last_gen["id"], batch_id)
        # only gen_{batch_id-1} is ever read again; a retry of THIS batch
        # re-reads it, so the safe-to-drop generation is batch_id-2
        stale = os.path.join(base, f"gen_{batch_id - 2}")
        if batch_id >= 2:
            import shutil as _sh

            _sh.rmtree(stale, ignore_errors=True)

    q = (
        stream.writeStream.foreachBatch(merge)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = spark.read.parquet(os.path.join(base, f"gen_{last_gen['id']}"))
    return final.select(
        "user_id",
        "n_purchases",
        (F.col("vscaled").cast("double") / 1_000_000).alias("total_value"),
    )
