"""Custom stateful streaming operator via ``applyInPandasWithState``.

The native ``session_window`` twin (:mod:`ting_data_etl_spark.streaming.
windows`) covers gap-sessionization with Spark's built-in state machine;
this module implements the SAME semantics as a *custom* stateful operator —
the escape hatch a pipeline needs when its per-key logic (custom session
merge rules, per-user quotas, decayed counters) has no built-in operator.
No reference-side counterpart (SURVEY.md §7.4 streaming extension).

Design, and how each piece maps to production:

* **Time-ordered multi-batch source.** ``events`` is staged once per
  ``sf_dir`` as a range-partitioned parquet directory (file *i* holds an
  earlier time range than file *i+1* — exactly how file-arrival streams
  land in practice) and read with ``maxFilesPerTrigger=1``, so the bounded
  run exercises REAL cross-batch state: a user's session that spans a file
  boundary is carried in the state store and merged when its continuation
  arrives in a later micro-batch.
* **Arrow-batched group logic.** ``applyInPandasWithState`` hands each
  (user, micro-batch) slice to a pandas function with that user's state.
  The walk is a vectorized pandas pass per group — the sanctioned Python
  path for logic built-ins can't express.
* **Emission contract.** Every batch emits all sessions *finalized or
  extended* in that batch; the open tail session is emitted too (its start
  is a stable identity — extending a session never changes its start in a
  time-ordered stream) and re-emitted with monotonically growing
  ``n_events`` when later batches extend it. The reader keeps the last
  version per (user, session_start) — the standard upsert-sink pattern
  (in production: a keyed sink / MERGE INTO; here: one dedup window).

Value sums use the same fixed-point contract as ``cleaning.sum_exact``
(scale 6): scaled-int accumulation, one divide at the end — deterministic
across batch boundaries, shuffle orders, and engines.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ting_data_etl_spark.registry import register
from ting_data_etl_spark.sources.tables import load_table
from ting_data_etl_spark.streaming.batch_windows import SESSION_GAP_US
from ting_data_etl_spark.streaming.windows import _SQL_SESSION_WINDOWS

N_STAGE_FILES = 4  # micro-batches per bounded run
_STAGED_SPLIT: dict[str, str] = {}

_VAL_SCALE = 1_000_000  # fixed-point scale 6, matching sum_exact(value, 6)

_OUT_SCHEMA = (
    "user_id long, session_start_us long, session_end_us long, "
    "n_events long, value_scaled long"
)
_STATE_SCHEMA = "start_us long, end_us long, n long, vsum long"


def stage_events_time_split(spark: SparkSession, sf_dir: str) -> str:
    """Stage ``events`` as N time-range parquet files with ascending mtimes.

    ``repartitionByRange(N, ts, event_id)`` makes file *i* strictly earlier
    than file *i+1* (range partitioner ids are ordered); mtimes are then
    set ascending so the file stream source (which orders by modification
    time) replays them in event-time order — the shape of a real
    file-arrival stream, one shuffle to stage.
    """
    from ting_data_etl_spark.streaming.windows import (
        _staged_events_path,
        publish_staged_dir,
    )

    if sf_dir not in _STAGED_SPLIT:
        # fingerprinted path + atomic publish via the SHARED helpers (one
        # staging ritual for both streaming stages — the copies had
        # already drifted once). A committed stage keeps its part
        # filenames AND its ascending mtimes, so re-use is free and
        # checkpointed consumers never see re-minted input files; the
        # mtimes are set INSIDE the tmp dir, before publication.
        out = _staged_events_path(sf_dir, "ting_stream_stage_split")
        if not os.path.exists(os.path.join(out, "_SUCCESS")):

            def _write(tmp: str) -> None:
                ev = load_table(spark, sf_dir, "events").select(
                    "event_id", "ts", "user_id", "value", "event_type"
                )
                ev.repartitionByRange(
                    N_STAGE_FILES, "ts", "event_id"
                ).write.mode("overwrite").parquet(tmp)
                parts = sorted(
                    f for f in os.listdir(tmp) if f.endswith(".parquet")
                )
                base = int(os.path.getmtime(os.path.join(tmp, parts[-1])))
                for i, name in enumerate(parts):
                    p = os.path.join(tmp, name)
                    os.utime(p, (base + i, base + i))

            publish_staged_dir(out, _write)
        _STAGED_SPLIT[sf_dir] = out
    return _STAGED_SPLIT[sf_dir]


def _sessionize_walk(
    us: np.ndarray, vs: np.ndarray, cur: list[int] | None
) -> list[list[int]]:
    """Gap-sessionize sorted (us, vs) arrays, merging a carried tail.

    Vectorized (one np.add.reduceat over gap-break segments) when the
    carried tail ends at or before the first event — always true for a
    time-ordered stream, where a later batch's events are never earlier
    than the carried session's end. The scalar walk is kept verbatim for
    the out-of-order case (its per-event ``max`` accumulation has no
    closed segment form), so semantics are identical for ANY input.
    Returns every session observed (the last entry is the new tail).
    """
    n = len(us)
    if n == 0:
        return [cur] if cur is not None else []
    if cur is not None and cur[1] > us[0]:
        # out-of-order carry: the original per-event walk, unchanged
        out: list[list[int]] = []
        for t, v in zip(us, vs):
            t = int(t)
            v = int(v)
            if cur is not None and t - cur[1] <= SESSION_GAP_US:
                cur = [cur[0], max(cur[1], t), cur[2] + 1, cur[3] + v]
            else:
                if cur is not None:
                    out.append(cur)
                cur = [t, t, 1, v]
        out.append(cur)
        return out
    # vectorized path: segments of within-gap consecutive events
    starts = np.flatnonzero(
        np.concatenate(([True], (us[1:] - us[:-1]) > SESSION_GAP_US))
    )
    ends = np.append(starts[1:], n) - 1
    seg_n = np.append(starts[1:], n) - starts
    seg_v = np.add.reduceat(vs, starts)
    out = []
    j0 = 0
    if cur is not None:
        if us[0] - cur[1] <= SESSION_GAP_US:
            # first segment extends the carried tail (cur[1] <= us[0]
            # here, so the merged end is the segment's last event)
            out.append(
                [
                    cur[0],
                    int(us[ends[0]]),
                    cur[2] + int(seg_n[0]),
                    cur[3] + int(seg_v[0]),
                ]
            )
            j0 = 1
        else:
            out.append(cur)
    for j in range(j0, len(starts)):
        out.append(
            [
                int(us[starts[j]]),
                int(us[ends[j]]),
                int(seg_n[j]),
                int(seg_v[j]),
            ]
        )
    return out


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Gap-sessionize one user's micro-batch slice, merging carried state.

    State = the user's open tail session (start, end, n, scaled sum). The
    batch's events are walked in (us, event_id) order; a first event within
    the gap of the carried tail extends it, otherwise the tail was already
    final (its last emission already carried final stats). Emits every
    session observed in this batch; stores the new tail.
    """
    # OPTIMIZATION r16 (guide §4.2): this function runs once per (user,
    # micro-batch) — thousands of calls per trigger — so per-call pandas
    # machinery dominated the stage (pd.concat copies a single-chunk
    # input, DataFrame.sort_values sorts a frame to order two columns).
    # Work on raw numpy arrays instead and vectorize the session walk
    # (np.add.reduceat over gap-break segments). Output values are
    # identical: segment stats under ascending `us` are exactly what the
    # old per-event loop accumulated.
    chunks = list(pdfs)
    rows = (
        chunks[0]
        if len(chunks) == 1
        else pd.concat(chunks, ignore_index=True)
    )
    us = rows["us"].to_numpy(dtype=np.int64)
    order = np.lexsort((rows["event_id"].to_numpy(dtype=np.int64), us))
    us = us[order]
    # half-up at scale 6 (positive domain), the sum_exact/ROUND contract.
    # NULL values contribute 0 to the sum but still count as events —
    # SUM's null-skip, COUNT(*)'s count-all, exactly like the batch twin
    # and the oracle (np.floor(NaN).astype(int64) would otherwise
    # silently inject INT64_MIN)
    raw_v = rows["value"].to_numpy(dtype=np.float64)[order]
    vs = np.where(
        np.isnan(raw_v), 0, np.floor(raw_v * _VAL_SCALE + 0.5)
    ).astype(np.int64)
    cur: list[int] | None = list(state.get) if state.exists else None
    out = _sessionize_walk(us, vs, cur)
    if out:
        cur = out[-1]  # tail: emitted now, re-emitted if later extended
        state.update((cur[0], cur[1], cur[2], cur[3]))
    uid = key[0]
    yield pd.DataFrame(
        {
            "user_id": np.full(len(out), uid, dtype=np.int64),
            "session_start_us": np.array([s[0] for s in out], dtype=np.int64),
            "session_end_us": np.array([s[1] for s in out], dtype=np.int64),
            "n_events": np.array([s[2] for s in out], dtype=np.int64),
            "value_scaled": np.array([s[3] for s in out], dtype=np.int64),
        }
    )


def stateful_session_stream(events: DataFrame) -> DataFrame:
    """The streaming plan: watermark → groupBy user → custom pandas state."""
    # NULL ts is unplaceable on a session timeline (and np.int64 cannot
    # represent it — it would silently become INT64_MIN garbage); drop
    # such rows before the stateful operator
    prepared = (
        events.filter(F.col("ts").isNotNull())
        .withWatermark("ts", "10 minutes")
        .select(
            "user_id", "event_id", F.unix_micros("ts").alias("us"), "value"
        )
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register("streaming_stateful_sessionize", oracle=_SQL_SESSION_WINDOWS)
def streaming_stateful_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize with custom per-user state across real micro-batches.

    Runs the stateful stream over {N_STAGE_FILES} time-ordered micro-batches
    (``maxFilesPerTrigger=1``), then resolves the upsert log: for each
    (user, session_start) the latest emission — the one with the largest
    ``n_events`` — is the session's final form. Oracle: the same
    lag/gap/cumsum sessionization the native ``session_window`` twin checks
    against, so the custom operator, the built-in operator, and the SQL
    oracle triangulate.
    """
    return run_stateful_sessionize(spark, sf_dir)


def run_stateful_sessionize(
    spark: SparkSession, sf_dir: str, progress_out: list | None = None
) -> DataFrame:
    """Body of the registered query, with optional progress capture
    (state-store evidence: per-batch ``stateOperators`` metrics)."""
    from pyspark.sql import Window

    from ting_data_etl_spark.streaming.windows import run_stream_to_table

    staged = stage_events_time_split(spark, sf_dir)
    schema = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    ).schema
    events = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    log = run_stream_to_table(
        stateful_session_stream(events), "update", progress_out=progress_out
    )
    w = Window.partitionBy("user_id", "session_start_us").orderBy(
        F.col("n_events").desc()
    )
    final = (
        log.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return final.select(
        "user_id",
        "session_start_us",
        "session_end_us",
        "n_events",
        (F.col("value_scaled").cast("double") / _VAL_SCALE).alias("total_value"),
    )
