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


class TestStatefulSessionize:
    def test_matches_native_session_window_stream(self, spark, sf_dir):
        qs = entrymod.queries()
        cols = [
            "user_id",
            "session_start_us",
            "session_end_us",
            "n_events",
            "total_value",
        ]
        native = _rows(qs["streaming_sessionize_30min_gap"](spark, sf_dir), cols)
        custom = _rows(qs["streaming_stateful_sessionize"](spark, sf_dir), cols)
        assert native == custom

    def test_runs_as_multiple_microbatches(self, spark, sf_dir):
        """The staged source must force real cross-batch state carry-over."""
        import os

        from ting_data_etl_spark.streaming.stateful import (
            N_STAGE_FILES,
            stage_events_time_split,
        )

        staged = stage_events_time_split(spark, sf_dir)
        parts = [f for f in os.listdir(staged) if f.endswith(".parquet")]
        assert len(parts) == N_STAGE_FILES
        # ascending mtimes -> the file stream source replays in time order
        times = [
            os.path.getmtime(os.path.join(staged, p)) for p in sorted(parts)
        ]
        assert times == sorted(times)
        # time ranges must be disjoint and ordered across files
        import duckdb

        con = duckdb.connect()
        prev_max = None
        for p in sorted(parts):
            lo, hi = con.execute(
                f"SELECT min(ts), max(ts) FROM '{os.path.join(staged, p)}'"
            ).fetchone()
            if prev_max is not None:
                assert lo >= prev_max
            prev_max = hi

    def test_state_carries_sessions_across_microbatches(self, spark, tmp_path):
        """A session split across two staged files must merge via state.

        The real events table is too sparse for sessions to straddle the
        range boundaries, so this constructs a stream where they must: user
        1's session spans the file boundary (within-gap), user 2's does not
        (beyond-gap), and the emitted sessions prove the carry-over logic
        both merges and splits correctly.
        """
        import os
        import time

        from pyspark.sql import functions as F

        from ting_data_etl_spark.streaming.stateful import (
            stateful_session_stream,
        )
        from ting_data_etl_spark.streaming.windows import run_stream_to_table

        base_us = 1_700_000_000_000_000
        gap_us = 30 * 60 * 1_000_000
        minute = 60 * 1_000_000

        def mk(rows, name, mtime):
            df = spark.createDataFrame(
                rows, "event_id long, us long, user_id long, value double"
            ).select(
                "event_id",
                F.timestamp_micros(F.col("us")).alias("ts"),
                "user_id",
                "value",
            )
            d = tmp_path / name
            df.coalesce(1).write.mode("overwrite").parquet(str(d))
            for f in os.listdir(d):
                os.utime(d / f, (mtime, mtime))
            for f in os.listdir(d):
                if f.endswith(".parquet"):
                    target = tmp_path / f"{name}.parquet"
                    os.rename(d / f, target)
                    os.utime(target, (mtime, mtime))
            import shutil

            shutil.rmtree(d)

        now = int(time.time())
        # batch 1: u1 two events; u2 one event
        mk(
            [
                (1, base_us, 1, 1.0),
                (2, base_us + minute, 1, 2.0),
                (3, base_us, 2, 5.0),
            ],
            "b0",
            now,
        )
        # batch 2: u1 event within gap of its tail (merge); u2 event beyond
        # the gap (new session)
        mk(
            [
                (4, base_us + minute + gap_us - 1, 1, 3.0),
                (5, base_us + gap_us + 1, 2, 7.0),
            ],
            "b1",
            now + 1,
        )
        schema = "event_id long, ts timestamp, user_id long, value double"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(tmp_path))
        )
        log = run_stream_to_table(stateful_session_stream(stream), "update")
        rows = log.collect()
        # u1: batch1 emitted (start, n=2); batch2 re-emitted same start, n=3
        u1 = [r for r in rows if r.user_id == 1]
        assert {(r.session_start_us, r.n_events) for r in u1} == {
            (base_us, 2),
            (base_us, 3),
        }
        merged = [r for r in u1 if r.n_events == 3][0]
        assert merged.session_end_us == base_us + minute + gap_us - 1
        assert merged.value_scaled == 6_000_000
        # u2: two separate sessions, never merged
        u2 = [r for r in rows if r.user_id == 2]
        assert {(r.session_start_us, r.n_events) for r in u2} == {
            (base_us, 1),
            (base_us + gap_us + 1, 1),
        }

    def test_vectorized_walk_equals_scalar_walk(self):
        """OPTIMIZATION r16: the per-group session walk is vectorized
        (np.add.reduceat over gap-break segments); the scalar per-event
        walk remains the semantic definition. Fuzz both over random
        batches including carried tails that are within-gap, beyond-gap,
        and out-of-order (the fallback path)."""
        import numpy as np

        import ting_data_etl_spark.streaming.stateful as S

        def scalar_walk(us, vs, cur):
            out = []
            cur = list(cur) if cur is not None else None
            for t, v in zip(us, vs):
                t, v = int(t), int(v)
                if cur is not None and t - cur[1] <= S.SESSION_GAP_US:
                    cur = [cur[0], max(cur[1], t), cur[2] + 1, cur[3] + v]
                else:
                    if cur is not None:
                        out.append(cur)
                    cur = [t, t, 1, v]
            if cur is not None:
                out.append(cur)
            return out

        rng = np.random.default_rng(7)
        gap = S.SESSION_GAP_US
        for trial in range(500):
            n = int(rng.integers(0, 12))
            us = np.sort(rng.integers(0, 6 * gap, size=n)).astype(np.int64)
            vs = rng.integers(-5, 10, size=n).astype(np.int64)
            cur = None
            if rng.random() < 0.6:
                start = int(rng.integers(0, 3 * gap))
                # end beyond start, sometimes past us[0] (out-of-order)
                cur = [
                    start,
                    start + int(rng.integers(0, 2 * gap)),
                    int(rng.integers(1, 5)),
                    int(rng.integers(0, 100)),
                ]
            got = S._sessionize_walk(
                us, vs, None if cur is None else list(cur)
            )
            want = scalar_walk(us, vs, cur)
            assert got == want, (trial, us.tolist(), cur, got, want)


class TestStreamStreamJoin:
    def test_matches_batch_interval_join(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from ting_data_etl_spark.sources.tables import load_table

        qs = entrymod.queries()
        stream = {
            (r.purchase_id, r.click_id)
            for r in qs["streaming_click_purchase_join"](spark, sf_dir).collect()
        }
        ev = load_table(spark, sf_dir, "events")
        c = ev.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("cu"),
            F.col("ts").alias("cts"),
        )
        p = ev.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("pu"),
            F.col("ts").alias("pts"),
        )
        batch = {
            (r.purchase_id, r.click_id)
            for r in p.join(
                c,
                (F.col("cu") == F.col("pu"))
                & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 30 MINUTES"))
                & (F.col("cts") <= F.col("pts")),
            ).collect()
        }
        assert stream == batch


class TestStreamingDedup:
    def test_doubled_stream_restored(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from ting_data_etl_spark.sources.tables import load_table

        qs = entrymod.queries()
        got = {
            r.event_type: r.n_events
            for r in qs["streaming_dedup_exactly_once"](spark, sf_dir).collect()
        }
        want = {
            r.event_type: r.n
            for r in load_table(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got == want  # NOT doubled: dedup collapsed the 2x delivery


class TestForeachBatchUpsert:
    def test_incremental_merge_matches_batch_truth(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from ting_data_etl_spark.sources.tables import load_table

        qs = entrymod.queries()
        got = {
            r.user_id: (r.n_purchases, r.total_value)
            for r in qs["streaming_foreachbatch_upsert"](spark, sf_dir).collect()
        }
        want = {
            r.user_id: (r.n, r.tv)
            for r in load_table(spark, sf_dir, "events")
            .filter(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n"),
                (
                    F.sum(F.round(F.col("value") * 1_000_000).cast("long"))
                    .cast("double")
                    / 1_000_000
                ).alias("tv"),
            )
            .collect()
        }
        assert got == want

    def test_merges_across_multiple_generations(self, spark, sf_dir):
        """The upsert must really be incremental: one generation dir per
        micro-batch that contained purchases."""
        import os
        import tempfile

        from ting_data_etl_spark.streaming.stateful import N_STAGE_FILES

        qs = entrymod.queries()
        fb_base = os.path.join(tempfile.gettempdir(), "ting_fb_upsert")
        before = set(os.listdir(fb_base)) if os.path.exists(fb_base) else set()
        qs["streaming_foreachbatch_upsert"](spark, sf_dir).collect()
        after = set(os.listdir(fb_base))
        new_runs = after - before
        assert len(new_runs) == 1
        run_dir = os.path.join(fb_base, new_runs.pop())
        gens = sorted(d for d in os.listdir(run_dir) if d.startswith("gen_"))
        # the final generation proves one merge ran per staged micro-batch;
        # earlier generations are PRUNED as they are superseded (only
        # gen_{i-1} is ever read again, so exactly the last two survive —
        # the bounded-footprint contract, not a leak-every-generation one)
        assert gens == [
            f"gen_{N_STAGE_FILES - 2}",
            f"gen_{N_STAGE_FILES - 1}",
        ]


class TestParquetSinkRestart:
    def test_restart_with_same_checkpoint_is_idempotent(self, spark, sf_dir):
        """Exactly-once across restarts: re-running the checkpointed sink
        stream with no new input must commit nothing new, and the read-back
        profile must equal the batch truth both times."""
        import os

        from pyspark.sql import functions as F

        from ting_data_etl_spark.sources.tables import load_table
        from ting_data_etl_spark.streaming import joins as J
        from ting_data_etl_spark.streaming.windows import stage_events_stream

        first = {
            (r.event_type): (r.n_events, r.n_users)
            for r in J.streaming_parquet_sink_roundtrip(spark, sf_dir).collect()
        }
        # simulate a process restart: forget the in-memory staging marker so
        # the query re-opens the stream against the SAME durable checkpoint
        out = J._STAGED_SINK.pop(sf_dir)
        base = os.path.dirname(out)
        ev = stage_events_stream(spark, sf_dir)
        kept = ev.filter(
            F.col("event_type").isin("purchase", "error")
        ).select("event_id", "ts", "user_id", "event_type", "value")
        q = (
            kept.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        J._STAGED_SINK[sf_dir] = out
        second = {
            (r.event_type): (r.n_events, r.n_users)
            for r in spark.read.parquet(out)
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.count_distinct("user_id").cast("long").alias("n_users"),
            )
            .collect()
        }
        assert first == second
        truth = {
            (r.event_type): (r.n_events, r.n_users)
            for r in load_table(spark, sf_dir, "events")
            .filter(F.col("event_type").isin("purchase", "error"))
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.count_distinct("user_id").cast("long").alias("n_users"),
            )
            .collect()
        }
        assert first == truth


class TestStateStoreProviders:
    """RocksDB state-store evidence (VERDICT r06 next-round #7).

    The bounded-replay stateful queries run on the default HDFS-backed
    store; at production scale (state ≫ executor heap) RocksDB is the
    knob. Both providers must produce identical results, and the
    per-batch ``stateOperators`` progress must show state-row counts
    bounded by the watermark contract under BOTH stores — state that
    grows with the stream, not the corpus, is the whole point.
    """

    ROCKSDB = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    HDFS = (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    )
    CONF = "spark.sql.streaming.stateStore.providerClass"

    def _with_provider(self, spark, provider, fn):
        prev = spark.conf.get(self.CONF, self.HDFS)
        spark.conf.set(self.CONF, provider)
        try:
            return fn()
        finally:
            spark.conf.set(self.CONF, prev)

    @staticmethod
    def _state_rows(progress):
        return [
            (p["batchId"], op["numRowsTotal"], op.get("numRowsRemoved", 0))
            for p in progress
            for op in p["stateOperators"]
        ]

    def test_sessionize_identical_and_bounded_under_both_stores(
        self, spark, sf_dir
    ):
        from ting_data_etl_spark.sources.tables import load_table
        from ting_data_etl_spark.streaming.stateful import (
            run_stateful_sessionize,
        )

        n_users = (
            load_table(spark, sf_dir, "events").select("user_id").distinct().count()
        )
        results, metrics = {}, {}
        for name, provider in [("hdfs", self.HDFS), ("rocksdb", self.ROCKSDB)]:
            prog: list = []
            df = self._with_provider(
                spark,
                provider,
                lambda: run_stateful_sessionize(spark, sf_dir, progress_out=prog),
            )
            results[name] = sorted(tuple(r) for r in df.collect())
            metrics[name] = list(prog)
        assert results["hdfs"] == results["rocksdb"]
        assert len(results["rocksdb"]) > 0

        for name in ("hdfs", "rocksdb"):
            rows = self._state_rows(metrics[name])
            assert rows, f"{name}: no stateOperators progress captured"
            # state = one open-tail session per user seen so far: bounded by
            # the user population in EVERY batch, not just the last
            assert all(total <= n_users for _, total, _ in rows), (
                name,
                rows,
            )

        # the RocksDB run must actually have used RocksDB (provider metrics
        # surface as rocksdb* customMetrics in progress)
        rocks_ops = [
            op
            for p in metrics["rocksdb"]
            for op in p["stateOperators"]
        ]
        assert any(
            k.startswith("rocksdb")
            for op in rocks_ops
            for k in (op.get("customMetrics") or {})
        ), "no rocksdb custom metrics — provider conf did not take effect"

    def test_dedup_ttl_state_bounded_and_evicted_under_rocksdb(
        self, spark, sf_dir
    ):
        from pyspark.sql import functions as F

        from ting_data_etl_spark.sources.tables import load_table
        from ting_data_etl_spark.streaming.joins import run_dedup_ttl_state

        n_events = load_table(spark, sf_dir, "events").count()
        prog: list = []
        df = self._with_provider(
            spark,
            self.ROCKSDB,
            lambda: run_dedup_ttl_state(spark, sf_dir, progress_out=prog),
        )
        got = {r.event_type: (r.n_events, float(r.total_value)) for r in df.collect()}
        truth = {
            r.event_type: (r.n_events, float(r.total_value))
            for r in load_table(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.expr(
                    "CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS DOUBLE)"
                    " / 1000000"
                ).alias("total_value"),
            )
            .collect()
        }
        assert got == truth
        rows = self._state_rows(prog)
        # dedup state holds one row per key inside the watermark horizon —
        # never the full doubled stream
        assert all(total <= n_events for _, total, _ in rows), rows
        # watermark eviction must actually fire across the multi-batch replay
        assert sum(removed for _, _, removed in rows) > 0, rows


class TestUpsertTmpGc:
    def test_gc_warns_on_oserror(self, tmp_path, monkeypatch):
        """Best-effort GC stays best-effort but must be LOUD on failure."""
        import os
        import warnings

        from ting_data_etl_spark.streaming.joins import _gc_stale_tmp_dirs

        root = tmp_path / "gcroot"
        root.mkdir()
        (root / "gen").mkdir()

        real_getmtime = os.path.getmtime

        def boom(p):
            if str(p).endswith("gen"):
                raise OSError("EACCES: simulated")
            return real_getmtime(p)

        monkeypatch.setattr(os.path, "getmtime", boom)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            _gc_stale_tmp_dirs(str(root))
        assert any("tmp GC skipped" in str(x.message) for x in w)

    def test_gc_removes_stale_keeps_fresh(self, tmp_path):
        import os
        import time

        from ting_data_etl_spark.streaming.joins import _gc_stale_tmp_dirs

        root = tmp_path / "gcroot2"
        root.mkdir()
        stale = root / "old"
        fresh = root / "new"
        stale.mkdir()
        fresh.mkdir()
        old = time.time() - 7200
        os.utime(stale, (old, old))
        _gc_stale_tmp_dirs(str(root))
        assert not stale.exists()
        assert fresh.exists()
