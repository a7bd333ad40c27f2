"""Skew-stressed scale pass (VERDICT r06 next-round #1).

The r06 scale evidence planted hot CONTENT buckets but kept KEY
distributions uniform; real estates have one store/user ≫ the rest (the
reference's own cardinality concern, ``fan_out_by_storeid.py:38-41``). This
runner generates corpora where one user holds ~30% of events and one source
holds ~30% of documents (``tools/scale_corpus.generate_skewed``), runs the
window / join / agg / dedup / CC families at 10x and 100x, and measures the
thing skew actually breaks: the STRAGGLER RATIO — max task time over median
task time on each query's worst stage, pulled per-task from the Spark UI
REST API (``/stages/{id}/{attempt}/taskSummary``) with queries scoped to
stages via job groups.

The contract under test: every family either (a) holds straggler ratio
roughly flat because its shuffle grain is finer than the hot key (banded
running sum, salted join, two-stage agg, band-capped dedup), or (b) is
demonstrated collapsing (naive window over the hot user, sort-merge join
with AQE off) next to the fix that restores balance — so the table shows
WHY the engine ships the rewrite, not just that it passes.

Usage: python tools/skew_stress.py [--scales 10,100] [--out SCALE_r07_skew]
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

CORPUS_ROOT = "/tmp/skew_corpus"
QUANTILES = "0.0,0.5,1.0"


from tools.restmetrics import rest  # noqa: E402


def stage_metrics(spark, group: str) -> dict:
    """Worst-stage straggler stats for every job in *group*."""
    jobs = rest(spark, "/jobs")
    stage_ids = sorted(
        {
            sid
            for j in jobs
            if j.get("jobGroup") == group
            for sid in j.get("stageIds", [])
        }
    )
    stages = []
    for sid in stage_ids:
        try:
            summ = rest(
                spark, f"/stages/{sid}/0/taskSummary?quantiles={QUANTILES}"
            )
        except Exception:
            continue  # skipped stage (reused exchange) — no tasks
        run = summ.get("executorRunTime") or []
        if len(run) < 3:
            continue
        med, mx = max(float(run[1]), 1.0), float(run[2])
        sh = (summ.get("shuffleReadMetrics") or {}).get("readBytes") or [0, 0, 0]
        stages.append(
            {
                "stage": sid,
                "task_ms_p50": round(float(run[1]), 1),
                "task_ms_max": round(mx, 1),
                "straggler_ratio": round(mx / med, 2),
                "shuffle_read_p50": int(float(sh[1])),
                "shuffle_read_max": int(float(sh[2])),
            }
        )
    if not stages:
        return {"stages": 0}
    worst = max(stages, key=lambda s: s["task_ms_max"])
    return {
        "stages": len(stages),
        "worst_stage": worst,
        # ratio reported for the stage where a straggler would actually
        # hurt: the one with the largest max task time
        "straggler_ratio": worst["straggler_ratio"],
    }


def run_case(
    spark,
    name: str,
    build,
    results: dict,
    confs: dict | None = None,
    repeat: int = 2,
):
    """Time noop writes of build()'s DataFrame inside per-attempt job groups.

    Two attempts by default: the first ("cold") carries whole-stage-codegen
    JIT warm-up — measured up to ~10x wall inflation for the 128-permutation
    minhash aggregate in a fresh JVM (SURVEY §7.6.5's same-JVM variance made
    explicit) — the last ("warm") is the steady-state plan cost, and its
    stages feed the straggler metrics. Production executors are long-lived
    and warm; the cold number is recorded as JVM context, not plan cost.
    """
    sc = spark.sparkContext
    saved = {}
    for k, v in (confs or {}).items():
        saved[k] = spark.conf.get(k)
        spark.conf.set(k, v)
    secs = []
    group = name
    try:
        for i in range(repeat):
            group = f"{name}#r{i}"
            sc.setJobGroup(group, group, interruptOnCancel=False)
            t0 = time.time()
            df = build()
            df.write.format("noop").mode("overwrite").save()
            secs.append(round(time.time() - t0, 1))
            sc.setJobGroup("", "")
    finally:
        sc.setJobGroup("", "")
        for k, v in saved.items():
            spark.conf.set(k, v)
    m = stage_metrics(spark, group)
    results[name] = {"sec": secs[-1], "sec_cold": secs[0], **m}
    print(
        f"  {name}: warm={secs[-1]}s cold={secs[0]}s "
        f"straggler={m.get('straggler_ratio')}",
        flush=True,
    )


def run_scale(spark, scale: float) -> dict:
    import __spark_entry__ as entrymod
    from ting_data_etl_spark.operators.skew import salted_join, two_stage_agg_sum
    from tools import scale_corpus

    sf_dir = os.path.join(CORPUS_ROOT, f"x{scale:g}")
    t0 = time.time()
    meta = scale_corpus.generate_skewed(spark, sf_dir, scale)
    gen_sec = round(time.time() - t0, 1)

    qs = entrymod.queries()
    results: dict = {}

    hot_share = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .agg(
            (F.sum(F.when(F.col("user_id") == 0, 1).otherwise(0)) / F.count("*"))
            .alias("s")
        )
        .first()["s"]
    )
    meta["hot_user_share_measured"] = round(float(hot_share), 4)

    # --- window family: naive single-window vs banded prefix sum ----------
    # AQE partition coalescing is pinned OFF for the window/agg cases: at
    # local data sizes it would merge the whole shuffle into 1-2 size-
    # balanced tasks and hide the per-key imbalance that dominates when the
    # hot key is tens of GB. Static 32 partitions reproduce the production
    # geometry (partitions ≫ any key's fair share) at measurable scale.
    static_parts = {"spark.sql.adaptive.coalescePartitions.enabled": "false"}
    run_case(
        spark,
        "window_naive",
        lambda: qs["events_user_running_value"](spark, sf_dir),
        results,
        confs=static_parts,
    )
    run_case(
        spark,
        "window_banded",
        lambda: qs["skew_banded_running_value"](spark, sf_dir),
        results,
        confs=static_parts,
    )
    # quantile-banded variant: on this corpus event time is uniform so it
    # should match the linear bands; its burst-time advantage is measured
    # separately in tools/burst_stress.py (BURST_STRESS_r07.json)
    run_case(
        spark,
        "window_banded_quantile",
        lambda: qs["skew_banded_running_quantile"](spark, sf_dir),
        results,
        confs=static_parts,
    )

    # --- join family: sort-merge (AQE off / AQE skew-split) vs salted ------
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "user_id", "value"
    )
    users = spark.read.parquet(os.path.join(sf_dir, "users.parquet"))

    def join_agg(j):
        return j.groupBy("segment").agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )

    no_bcast = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    run_case(
        spark,
        "join_sortmerge_noaqe",
        lambda: join_agg(ev.join(users, "user_id")),
        results,
        confs={**no_bcast, "spark.sql.adaptive.enabled": "false"},
    )
    run_case(
        spark,
        "join_sortmerge_aqe_skewsplit",
        lambda: join_agg(ev.join(users, "user_id")),
        results,
        confs={
            **no_bcast,
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4m",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
        },
    )
    run_case(
        spark,
        "join_salted",
        lambda: join_agg(salted_join(ev, users, "user_id")),
        results,
        confs=no_bcast,
    )

    # --- agg family: algebraic SUM map-side combines even under skew -------
    run_case(
        spark,
        "agg_plain_sum",
        lambda: ev.groupBy("user_id").agg(F.sum("value").alias("total")),
        results,
        confs=static_parts,
    )
    run_case(
        spark,
        "agg_two_stage_sum",
        lambda: two_stage_agg_sum(ev, "user_id", "value"),
        results,
        confs=static_parts,
    )
    # exact count-distinct per key: the combiner-defeated aggregate the
    # two-stage utility exists for — plain shape shuffles every (hot) raw
    # row to one reducer, two-stage pre-shrinks on (key, salt)
    run_case(
        spark,
        "agg_distinct_plain",
        lambda: ev.groupBy("user_id").agg(
            F.countDistinct(F.round(F.col("value") * 1000)).alias("nv")
        ),
        results,
        confs=static_parts,
    )

    # --- dedup / CC on the source-skewed document corpus -------------------
    for name in ("dedup_minhash_lsh_pairs", "dedup_ngram_jaccard_pairs"):
        run_case(spark, name, lambda n=name: qs[n](spark, sf_dir), results)

    # CC reads the staged pair artifact; purge it (disk + process dict) so
    # the measured run is the BUILD — the skew-relevant leg — not the read.
    # purge_stages owns the path scheme — re-deriving it here broke when
    # the stage tag scheme changed (the purge became a silent no-op)
    import ting_data_etl_spark.operators.dedup as dd

    dd.purge_stages(sf_dir)
    run_case(
        spark,
        "dedup_connected_components",
        lambda: qs["dedup_connected_components"](spark, sf_dir),
        results,
        repeat=1,  # write-once artifact: a second attempt would read cache
    )

    return {**meta, "gen_sec": gen_sec, "cases": results}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="10,100")
    ap.add_argument("--out", default="SCALE_r07_skew")
    args = ap.parse_args()

    from ting_data_etl_spark.session import get_spark

    spark = get_spark(
        app_name="skew-stress",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    report = {"scales": []}
    for s in args.scales.split(","):
        scale = float(s)
        print(f"=== skewed scale x{scale:g} ===", flush=True)
        report["scales"].append(run_scale(spark, scale))

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"{args.out}.json",
    )
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
