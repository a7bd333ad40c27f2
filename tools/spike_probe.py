"""Instrument the random per-pass spike (VERDICT r15 #2).

Runs the full bench methodology (one cold pass + N warm passes, noop sink,
alphabetical) in ONE UI-enabled session while capturing, with wall-clock
timestamps that can be correlated after the fact:

* per-query [start, end] + duration per pass (JSONL, one row per execution);
* the driver JVM's GC log (pass ``SPARK_GRAFT_DRIVER_JAVA_OPTS`` with
  ``-Xlog:gc*:file=...`` before invoking, or use --gclog to set it here);
* ContextCleaner activity at DEBUG, routed to its own file via a generated
  log4j2 config (each "Cleaning ..." / "Cleaned ..." line is timestamped,
  so removal bursts line up against query windows);
* for every warm execution ≥ --spike-factor × the query's best warm time,
  the Spark REST job list for that window — was the extra time inside jobs
  (executor) or in the gap (driver/planning/GC steal)?

Usage: python tools/spike_probe.py [--sf DIR] [--passes N] [--out PREFIX]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from restmetrics import rest  # noqa: E402


LOG4J2 = """\
status = warn
appender.console.type = Console
appender.console.name = console
appender.console.target = SYSTEM_ERR
appender.console.layout.type = PatternLayout
appender.console.layout.pattern = %d{{yyyy-MM-dd HH:mm:ss.SSS}} %p %c: %m%n
appender.cleaner.type = File
appender.cleaner.name = cleaner
appender.cleaner.fileName = {cleaner_log}
appender.cleaner.layout.type = PatternLayout
appender.cleaner.layout.pattern = %d{{UNIX_MILLIS}} %p %c: %m%n
rootLogger.level = warn
rootLogger.appenderRef.stdout.ref = console
logger.cleaner.name = org.apache.spark.ContextCleaner
logger.cleaner.level = debug
logger.cleaner.additivity = false
logger.cleaner.appenderRef.cleaner.ref = cleaner
logger.bmaster.name = org.apache.spark.storage.BlockManagerMasterEndpoint
logger.bmaster.level = debug
logger.bmaster.additivity = false
logger.bmaster.appenderRef.cleaner.ref = cleaner
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--out", default="/tmp/spike_probe")
    ap.add_argument("--spike-factor", type=float, default=2.0)
    args = ap.parse_args()

    cleaner_log = f"{args.out}_cleaner.log"
    log4j_path = f"{args.out}_log4j2.properties"
    with open(log4j_path, "w") as f:
        f.write(LOG4J2.format(cleaner_log=cleaner_log))
    gc_log = f"{args.out}_gc.log"
    os.environ["SPARK_GRAFT_DRIVER_JAVA_OPTS"] = (
        os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", "")
        + f" -Dlog4j2.configurationFile={log4j_path}"
        + f" -Xlog:gc*:file={gc_log}:time,uptime"
    ).strip()

    import __spark_entry__ as entrymod
    from ting_data_etl_spark.session import get_spark

    qs = entrymod.queries()
    spark = get_spark(
        app_name="ting-spike-probe",
        extra_conf={
            "spark.ui.enabled": "true",
            # keep more jobs visible to the post-hoc REST correlation
            # (the default 1000 evicts pass-1 windows) — but NOT 100k:
            # the unbounded live UI store measurably slowed the run
            "spark.ui.retainedJobs": "8000",
            "spark.ui.retainedStages": "8000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Sampler thread: 4 Hz record of (wall time, #active jobs). A spike
    # window with active jobs the whole way is executor-side; one with no
    # active jobs is driver/py4j-side; sampler GAPS mean the JVM stopped
    # answering (safepoint/GC) — three different fixes.
    import threading

    samples: list[tuple[float, int, int, int]] = []
    stop = threading.Event()
    tracker = spark.sparkContext.statusTracker()

    def cpu_busy_steal() -> tuple[int, int]:
        # /proc/stat jiffies: busy = user+nice+system, steal = field 8 —
        # hypervisor steal is the shared-host suspect: it stalls all 32
        # vCPUs at once, which no JVM/Spark metric can see
        with open("/proc/stat") as f:
            p = f.readline().split()
        v = [int(x) for x in p[1:]]
        return v[0] + v[1] + v[2], v[7]

    def sample() -> None:
        while not stop.is_set():
            t = time.time()
            try:
                n = len(tracker.getActiveJobsIds())
            except Exception:
                n = -1
            busy, steal = cpu_busy_steal()
            samples.append((t, n, busy, steal))
            stop.wait(0.25)

    sampler = threading.Thread(target=sample, daemon=True)
    sampler.start()

    from ting_data_etl_spark import runstats

    rows_path = f"{args.out}_rows.jsonl"
    rows_f = open(rows_path, "w")

    # JVM counters: JIT compilation time (the prime slow-window suspect —
    # fresh wholestage-codegen classes run interpreted/C1 until the
    # compiler queue drains) and accumulated GC time, per query window.
    mgmt = spark._jvm.java.lang.management.ManagementFactory  # type: ignore
    comp = mgmt.getCompilationMXBean()

    def jvm_counters() -> tuple[int, int]:
        gc_ms = sum(
            b.getCollectionTime() for b in mgmt.getGarbageCollectorMXBeans()
        )
        return comp.getTotalCompilationTime(), gc_ms

    def run_pass(tag: str) -> dict[str, float]:
        out: dict[str, float] = {}
        for name in sorted(qs):
            before = runstats.snapshot()
            c0, g0 = jvm_counters()
            spark.sparkContext.setJobDescription(f"{tag}:{name}")
            t0 = time.time()
            qs[name](spark, args.sf).write.format("noop").mode(
                "overwrite").save()
            t1 = time.time()
            spark.sparkContext.setJobDescription(None)
            c1, g1 = jvm_counters()
            out[name] = t1 - t0
            after = runstats.snapshot()
            rows_f.write(json.dumps(
                {"pass": tag, "q": name, "t0": round(t0, 3),
                 "t1": round(t1, 3), "sec": round(t1 - t0, 3),
                 "jit_ms": c1 - c0, "gc_ms": g1 - g0,
                 "reuse": {k: after[k] - before.get(k, 0)
                           for k in after
                           if after[k] != before.get(k, 0)}}) + "\n")
            rows_f.flush()
        return out

    qs["flagship_pricing_summary"](spark, args.sf).write.format("noop").mode(
        "overwrite").save()
    run_pass("cold")
    warm: list[dict[str, float]] = []
    for i in range(args.passes):
        warm.append(run_pass(f"warm{i}"))
    rows_f.close()
    stop.set()
    sampler.join(timeout=2)
    with open(f"{args.out}_samples.jsonl", "w") as f:
        for t, n, busy, steal in samples:
            f.write(f"{t:.3f} {n} {busy} {steal}\n")

    # spike report: any warm execution >= factor x that query's best warm
    best = {q: min(w[q] for w in warm) for q in warm[0]}
    spikes = []
    for i, w in enumerate(warm):
        for q, sec in w.items():
            if sec >= args.spike_factor * best[q] and sec - best[q] > 0.8:
                spikes.append((f"warm{i}", q, sec, best[q]))
    print(f"\n=== {len(spikes)} spikes (>= {args.spike_factor}x best, "
          f"+0.8s) across {args.passes} warm passes ===")
    jobs = rest(spark, "/jobs")
    rows = [json.loads(ln) for ln in open(rows_path)]
    by_key = {(r["pass"], r["q"]): r for r in rows}

    from datetime import datetime, timezone

    def ts(s: str) -> float:
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").replace(
            tzinfo=timezone.utc).timestamp()

    for tag, q, sec, b in sorted(spikes, key=lambda s: -(s[2] - s[3])):
        r = by_key[(tag, q)]
        inside = [j for j in jobs
                  if j.get("submissionTime") and j.get("completionTime")
                  and r["t0"] - 1 <= ts(j["submissionTime"])
                  and ts(j["completionTime"]) <= r["t1"] + 1]
        job_sum = sum(ts(j["completionTime"]) - ts(j["submissionTime"])
                      for j in inside)
        print(f"{tag} {q}: {sec:.2f}s (best {b:.2f}s) window "
              f"[{r['t0']:.1f},{r['t1']:.1f}] jobs={len(inside)} "
              f"sum(job)={job_sum:.2f}s gap={sec - job_sum:.2f}s")
    summary = {
        "warm_totals": [round(sum(w.values()), 2) for w in warm],
        "spikes": [
            {"pass": t, "q": q, "sec": round(s, 3), "best": round(b, 3)}
            for t, q, s, b in spikes
        ],
        "rows": rows_path, "gc_log": gc_log, "cleaner_log": cleaner_log,
    }
    with open(f"{args.out}_summary.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({"warm_totals": summary["warm_totals"],
                      "n_spikes": len(spikes)}))


if __name__ == "__main__":
    main()
