"""Bursty-event-time stress for the banded running sum (round 7).

SCALE_r07_skew measured the banded window holding straggler ratio ~1.2
against the naive window's 18x — but that corpus's event times are uniform,
which is exactly the distribution LINEAR banding likes. Real event streams
are bursty (flash sale, incident, batch replay): when 99% of rows land in
1% of the time range, linear min/max bands put nearly everything in one
band and the hot key's straggler returns. Quantile banding
(``quantile_band_cuts``) derives the boundaries from the data. This runner
measures all three plans on a burst+skew corpus:

* hot user: user_id 0 holds ~30% of rows (the SCALE_r07_skew shape);
* burst: 99% of timestamps inside 1% of the range, the rest spread wide.

Same metric machinery as tools/skew_stress.py (straggler ratio = max/median
task executorRunTime of the worst stage, from the UI REST API, warm
attempt). Writes BURST_STRESS_r07.json at the repo root.

Usage: python tools/burst_stress.py [--rows 10000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

from pyspark.sql import functions as F  # noqa: E402

CORPUS_ROOT = "/tmp/burst_corpus"
HOT_FRACTION = 0.3
BURST_SHARE = 0.99  # of rows ...
BURST_WIDTH = 0.01  # ... inside this share of the time range
TIME_RANGE = 1_000_000_000


def gen_burst_events(spark, n_rows: int):
    """Codegen-only burst+skew events: (event_id, user_id, t, v)."""
    h = lambda salt: F.xxhash64("id", F.lit(salt))  # noqa: E731
    burst_span = int(TIME_RANGE * BURST_WIDTH)
    user = F.when(
        F.pmod(h(1), F.lit(1000)) < F.lit(int(HOT_FRACTION * 1000)), F.lit(0)
    ).otherwise(F.pmod(h(2), F.lit(5000)) + 1)
    t = F.when(
        F.pmod(h(3), F.lit(100)) < F.lit(int(BURST_SHARE * 100)),
        F.pmod(h(4), F.lit(burst_span)),  # the burst window at range start
    ).otherwise(F.pmod(h(5), F.lit(TIME_RANGE)))
    return spark.range(n_rows).select(
        F.col("id").alias("event_id"),
        user.alias("user_id"),
        t.cast("long").alias("t"),
        F.pmod(h(6), F.lit(1000)).cast("long").alias("v"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    args = ap.parse_args()

    from ting_data_etl_spark.operators.skew import (
        banded_running_sum,
        quantile_band_cuts,
    )
    from ting_data_etl_spark.session import get_spark
    from tools.skew_stress import run_case

    # UI on: the straggler metrics come from the UI REST API
    spark = get_spark(
        app_name="burst-stress", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    # corpus dir keyed by the requested row count: a rerun with a
    # different --rows must not silently reuse the previous corpus
    corpus = os.path.join(CORPUS_ROOT, f"events_r{args.rows}.parquet")
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        t0 = time.time()
        gen_burst_events(spark, args.rows).repartition(32).write.mode(
            "overwrite"
        ).parquet(corpus)
        print(f"corpus written in {round(time.time()-t0,1)}s", flush=True)

    ev = spark.read.parquet(corpus)
    stats = ev.agg(
        F.count("*").alias("n"),
        (F.sum((F.col("user_id") == 0).cast("int")) / F.count("*")).alias("hot"),
        (
            F.sum((F.col("t") < int(TIME_RANGE * BURST_WIDTH)).cast("int"))
            / F.count("*")
        ).alias("burst"),
    ).first()
    report = {
        "n_rows": stats["n"],
        "hot_user_share": round(float(stats["hot"]), 4),
        "burst_share": round(float(stats["burst"]), 4),
        "cases": {},
    }
    print(f"corpus: {report['n_rows']} rows, hot={report['hot_user_share']}, "
          f"burst={report['burst_share']}", flush=True)

    def naive():
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("t", "event_id")
        return ev.withColumn(
            "run",
            F.sum("v").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )

    def banded_linear():
        return banded_running_sum(
            ev, key="user_id", order_time="t", order_tiebreak="event_id",
            value="v",
        )

    def banded_quantile():
        cuts = quantile_band_cuts(ev, "t")
        return banded_running_sum(
            ev, key="user_id", order_time="t", order_tiebreak="event_id",
            value="v", cuts=cuts,
        )

    # same static-partition pin as skew_stress's window family: AQE
    # coalescing at local sizes merges the shuffle into 1-2 tasks and hides
    # the per-key imbalance the production geometry exposes
    static_parts = {"spark.sql.adaptive.coalescePartitions.enabled": "false"}
    results = report["cases"]
    run_case(spark, "window_naive", naive, results, confs=static_parts)
    run_case(spark, "window_banded_linear", banded_linear, results,
             confs=static_parts)
    run_case(spark, "window_banded_quantile", banded_quantile, results,
             confs=static_parts)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BURST_STRESS_r07.json",
    )
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
