"""Batch ↔ Structured Streaming parity.

A streaming query is defined as the incremental execution of its batch plan,
so running the streaming pipelines to completion over the bounded events
table must reproduce the batch twins exactly — row for row, bit for bit
(aggregates use fixed-point ``sum_exact``, so even float sums are
order-independent).
"""

from __future__ import annotations

import __spark_entry__ as entrymod


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


class TestBatchStreamParity:
    def test_tumbling(self, spark, sf_dir):
        qs = entrymod.queries()
        cols = ["event_type", "window_start_s", "n_events", "total_value"]
        batch = _rows(qs["events_tumbling_5min"](spark, sf_dir), cols)
        stream = _rows(qs["streaming_tumbling_5min"](spark, sf_dir), cols)
        assert batch == stream

    def test_sliding(self, spark, sf_dir):
        qs = entrymod.queries()
        cols = ["event_type", "window_start_s", "n_events"]
        batch = _rows(qs["events_sliding_5min_step150s"](spark, sf_dir), cols)
        stream = _rows(qs["streaming_sliding_5min_step150s"](spark, sf_dir), cols)
        assert batch == stream

    def test_sessionize(self, spark, sf_dir):
        qs = entrymod.queries()
        cols = ["user_id", "session_start_us", "session_end_us", "n_events", "total_value"]
        # batch twin carries a per-user session ordinal; session identity
        # (start/end/aggregates) must match the session_window stream
        batch = _rows(qs["events_sessionize_30min_gap"](spark, sf_dir), cols)
        stream = _rows(qs["streaming_sessionize_30min_gap"](spark, sf_dir), cols)
        assert batch == stream

    def test_streaming_plan_is_really_streaming(self, spark, sf_dir):
        from ting_data_etl_spark.streaming.windows import (
            stage_events_stream,
            tumbling_stream,
        )

        sdf = tumbling_stream(stage_events_stream(spark, sf_dir))
        assert sdf.isStreaming
