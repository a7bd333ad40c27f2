"""Fan-out clustered-write cost profile (VERDICT r07 next-round #6).

FANOUT_STRESS_r07 measured the corrected ``write_fanout`` at 168.9 s for
2M rows / 100k keys — correct (exactly O(keys) files) but heavy. This
harness profiles WHERE the time goes by A/B-ing the write shape at
identical data and checking the contract (same file counts, no fd
regression) on every leg:

* ``hash_sort`` — the shipped shape: ``repartition(key)`` +
  ``sortWithinPartitions(key)``, default committer;
* ``hash_sort_committer_v2`` — same plan, FileOutputCommitter algorithm 2
  (task files rename directly to the final location; v1 renames twice —
  task → job dir, then a SEQUENTIAL driver-side pass over all 100k
  partition dirs at commit);
* ``range_planned`` — ``repartitionByRange(key)`` +
  ``spark.sql.optimizer.plannedWrite.enabled=true`` (the planner inserts
  the partition-column sort itself; range clustering gives contiguous
  key runs per task so the inserted sort sees nearly-sorted input);
* ``range_planned_committer_v2`` — both knobs.

Writes FANOUT_WRITE_COST_r08.json at the repo root.

Usage: python tools/fanout_write_cost.py [--keys 100000] [--rows 2000000]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.fanout_stress import FdPoller, gen_rows  # noqa: E402

OUT_ROOT = "/tmp/fanout_write_cost"


def count_files(root: str, pattern: str) -> int:
    return sum(1 for _ in glob.iglob(os.path.join(root, pattern)))


def run_leg(
    spark,
    df,
    out: str,
    *,
    cluster: str,
    committer_v2: bool,
    planned_write: bool,
) -> dict:
    from pyspark.sql import functions as F

    keyed = df.filter(
        F.col("store_id").isNotNull()
        & (F.length(F.trim(F.col("store_id"))) > 0)
    )
    prev_planned = spark.conf.get(
        "spark.sql.optimizer.plannedWrite.enabled", None
    )
    spark.conf.set(
        "spark.sql.optimizer.plannedWrite.enabled",
        "true" if planned_write else "false",
    )
    try:
        if cluster == "hash":
            keyed = keyed.repartition(F.col("store_id"))
            keyed = keyed.sortWithinPartitions("store_id")
        elif cluster == "range":
            keyed = keyed.repartitionByRange(F.col("store_id"))
            if not planned_write:
                keyed = keyed.sortWithinPartitions("store_id")
        writer = (
            keyed.write.mode("overwrite")
            .option("header", True)
            .partitionBy("store_id")
        )
        if committer_v2:
            writer = writer.option(
                "mapreduce.fileoutputcommitter.algorithm.version", "2"
            )
        with FdPoller() as p:
            t0 = time.time()
            writer.format("csv").save(out)
            sec = round(time.time() - t0, 1)
        return {
            "sec": sec,
            "dirs": count_files(out, "store_id=*"),
            "files": count_files(out, "store_id=*/part-*"),
            "fd_baseline_total": p.baseline_total,
            "fd_peak_total": p.peak_total,
            "fd_peak_max_proc": p.peak_max_proc,
        }
    finally:
        if prev_planned is not None:
            spark.conf.set(
                "spark.sql.optimizer.plannedWrite.enabled", prev_planned
            )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=100_000)
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument(
        "--legs",
        default="",
        help="comma list of leg names to run (default all); results merge "
        "into the existing FANOUT_WRITE_COST_r08.json",
    )
    args = ap.parse_args()

    from ting_data_etl_spark.session import get_spark

    spark = get_spark(app_name="fanout-write-cost")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(OUT_ROOT, ignore_errors=True)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_json = os.path.join(here, "FANOUT_WRITE_COST_r08.json")
    df = gen_rows(spark, args.rows, args.keys)
    report: dict = {}
    if args.legs and os.path.exists(out_json):
        with open(out_json) as f:
            report = json.load(f)
    report.update(
        {
            "n_rows": args.rows,
            "n_keys_requested": args.keys,
            "n_keys_actual": df.select("store_id").distinct().count(),
        }
    )
    legs = [
        ("hash_sort", dict(cluster="hash", committer_v2=False, planned_write=False)),
        ("hash_sort_committer_v2", dict(cluster="hash", committer_v2=True, planned_write=False)),
        ("range_planned", dict(cluster="range", committer_v2=False, planned_write=True)),
        ("range_planned_committer_v2", dict(cluster="range", committer_v2=True, planned_write=True)),
    ]
    wanted = set(args.legs.split(",")) if args.legs else None
    for name, kw in legs:
        if wanted is not None and name not in wanted:
            continue
        out = os.path.join(OUT_ROOT, name)
        report[name] = run_leg(spark, df, out, **kw)
        print(name, report[name], flush=True)
        shutil.rmtree(out, ignore_errors=True)  # bound disk across legs

    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v["sec"] for k, v in report.items() if isinstance(v, dict) and "sec" in v}))


if __name__ == "__main__":
    main()
