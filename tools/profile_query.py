"""Job-level profile of registered queries: where does warm time go?

Runs each named query twice (cold then warm) in a UI-enabled session, then
dumps the WARM run's Spark jobs (description, duration, stages, tasks) from
the REST API — the guide §1.1 empirical loop without a browser. Output is a
readable table on stdout; use it to find queries whose warm cost is many
sequential small jobs (driver/orchestration bound) vs few heavy stages
(compute/shuffle bound).

Usage: python tools/profile_query.py [--sf DIR] query [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from restmetrics import rest  # noqa: E402  (tools/ sibling)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from ting_data_etl_spark.session import get_spark

    qs = entrymod.queries()
    spark = get_spark(
        app_name="ting-profile",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    for name in args.queries:
        # cold pass: absorb stage builds
        qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
        before = {j["jobId"] for j in rest(spark, "/jobs")}
        spark.sparkContext.setJobDescription(f"warm:{name}")
        t0 = time.time()
        qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        jobs = [j for j in rest(spark, "/jobs") if j["jobId"] not in before]
        jobs.sort(key=lambda j: j["jobId"])
        total_job = 0.0
        print(f"\n=== {name}: warm wall {wall:.2f}s, {len(jobs)} jobs ===")
        for j in jobs:
            from datetime import datetime

            def ts(s):
                return datetime.strptime(
                    s[:23], "%Y-%m-%dT%H:%M:%S.%f"
                ).timestamp()

            dur = ts(j["completionTime"]) - ts(j["submissionTime"])
            total_job += dur
            desc = (j.get("description") or j["name"])[:100]
            print(
                f"  job {j['jobId']:>4} {dur:7.3f}s "
                f"stages={len(j['stageIds'])} tasks={j['numTasks']:>4}  {desc}"
            )
        print(f"  sum(job durations) {total_job:.2f}s  "
              f"gap (driver/planning) {wall - total_job:.2f}s")


if __name__ == "__main__":
    main()
