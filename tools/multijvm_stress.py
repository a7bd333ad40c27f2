"""Multi-JVM scale probe: the 300x text-dedup legs on ``local-cluster``.

VERDICT r06 next-round #2: all round-6 scale evidence ran in ONE 48 GiB JVM,
and the 300x probe (1.5M docs) hit GC allocation stalls there — wall time
went super-linear while output stayed linear. The claim that this is a
machine ceiling ("rows per executor is the knob"), not a plan pathology,
was inferred, not measured. This runner measures it: the same minhash-LSH
and n-gram-Jaccard legs on ``local-cluster[4,7,11264]`` — four REAL worker
JVMs with ~11 GiB each (44 GiB total, the same aggregate budget as r06's
single 48 GiB heap), shuffles crossing real executor boundaries with real
serialization — and records per-executor GC time, shuffle bytes, and spill
from the REST API next to the r06 single-JVM wall times.

If the single-JVM collapse was GC pressure from 32 threads sharing one
heap, four 11 GiB heaps with 7 threads each should restore near-linear
wall time at the SAME total memory; if the plan itself were quadratic,
splitting the heap would not help. That is the falsifiable test.

Usage: python tools/multijvm_stress.py [--scale 300] [--out SCALE_r07_multijvm]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS_ROOT = "/tmp/scale_corpus"

WORKERS = 4
CORES_PER_WORKER = 7
MEM_PER_WORKER_MB = 11264


def build_session(workers, cores, mem_mb, partitions):
    from pyspark.sql import SparkSession

    master = f"local-cluster[{workers},{cores},{mem_mb}]"
    return (
        SparkSession.builder.appName("multijvm-stress")
        .master(master)
        .config("spark.driver.memory", "8g")
        # local-cluster's mem-per-worker is only the WORKER's budget; the
        # executor JVM heap comes from spark.executor.memory (default 1g —
        # the first run's jaccard OOM was four 1 GiB heaps, not a plan flaw)
        .config("spark.executor.memory", f"{mem_mb - 1024}m")
        .config("spark.sql.shuffle.partitions", str(partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        # worker JVMs import the package by reference when unpickling —
        # point them at THIS checkout, wherever it lives
        .config(
            "spark.executorEnv.PYTHONPATH",
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        .getOrCreate()
    )


from tools.restmetrics import rest  # noqa: E402


def executor_snapshot(spark) -> list[dict]:
    out = []
    for e in rest(spark, "/executors"):
        out.append(
            {
                "id": e["id"],
                "totalGCTime_ms": e.get("totalGCTime", 0),
                "totalShuffleRead": e.get("totalShuffleRead", 0),
                "totalShuffleWrite": e.get("totalShuffleWrite", 0),
                "memoryUsed": e.get("memoryUsed", 0),
                "diskUsed": e.get("diskUsed", 0),
            }
        )
    return out


def delta(before: list[dict], after: list[dict]) -> dict:
    b = {e["id"]: e for e in before}
    agg = {"gc_ms": 0, "shuffle_read": 0, "shuffle_write": 0}
    per_exec = []
    for e in after:
        if e["id"] == "driver":
            continue
        prev = b.get(e["id"], {})
        d = {
            "id": e["id"],
            "gc_ms": e["totalGCTime_ms"] - prev.get("totalGCTime_ms", 0),
            "shuffle_read": e["totalShuffleRead"] - prev.get("totalShuffleRead", 0),
            "shuffle_write": e["totalShuffleWrite"]
            - prev.get("totalShuffleWrite", 0),
        }
        per_exec.append(d)
        for k in agg:
            agg[k] += d[k]
    return {"total": agg, "per_executor": per_exec}


def spill_since(spark, seen_stages: set) -> tuple[int, int, set]:
    mem = disk = 0
    new_seen = set(seen_stages)
    for s in rest(spark, "/stages?status=COMPLETE"):
        key = (s["stageId"], s["attemptId"])
        if key in seen_stages:
            continue
        new_seen.add(key)
        mem += s.get("memoryBytesSpilled", 0)
        disk += s.get("diskBytesSpilled", 0)
    return mem, disk, new_seen


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=300)
    ap.add_argument("--out", default="SCALE_r07_multijvm")
    ap.add_argument("--workers", type=int, default=WORKERS)
    ap.add_argument("--cores", type=int, default=CORES_PER_WORKER)
    ap.add_argument("--mem-mb", type=int, default=MEM_PER_WORKER_MB)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument(
        "--legs",
        default="dedup_minhash_lsh_pairs,dedup_ngram_jaccard_pairs",
        help="comma-separated query legs; run one per invocation when the "
        "aggregate shuffle volume would press the local disk budget",
    )
    ap.add_argument(
        "--no-retune",
        action="store_true",
        help="keep the REGISTERED constants instead of the capacity retune "
        "— for legs whose single-JVM comparison artifact ran at the "
        "registered constants",
    )
    ap.add_argument(
        "--contract-k",
        action="store_true",
        help="retune ONLY SemDeDup's KMEANS_LISTS to k ∝ N (base × scale), "
        "exactly like selection_scale._incrsel_probe — the regime the "
        "single-JVM SELECTION_SCALE incremental-family numbers ran in. "
        "Without it a frozen k=8 at x100 puts 25k vectors in a cluster "
        "and the within-cluster stages go quadratic (observed: two "
        "75-minute single-threaded straggler tasks).",
    )
    args = ap.parse_args()

    spark = build_session(args.workers, args.cores, args.mem_mb, args.partitions)
    spark.sparkContext.setLogLevel("ERROR")

    from tools import scale_corpus

    sf_dir = os.path.join(CORPUS_ROOT, f"x{args.scale:g}")
    t0 = time.time()
    meta = scale_corpus.generate(spark, sf_dir, args.scale)
    gen_sec = round(time.time() - t0, 1)
    print(f"corpus ready in {gen_sec}s: {meta}", flush=True)

    # same capacity retune the single-JVM stress applied
    import ting_data_etl_spark.operators.dedup as dd
    import ting_data_etl_spark.operators.similarity as S
    from ting_data_etl_spark import capacity

    saved = (S.SRP_BITS, S.SRP_SIGNS, S.KMEANS_LISTS, dd.SIMHASH_BITS)
    if not args.no_retune:
        cfg = capacity.recommend(meta["n_docs"], meta["n_vecs"])
        S.SRP_BITS = cfg["srp_bits"]
        S.SRP_SIGNS = S._srp_signs()
        S.KMEANS_LISTS = cfg["kmeans_lists"]
        dd.SIMHASH_BITS = cfg["simhash_bits"]
    if args.contract_k:
        S.KMEANS_LISTS = max(S.KMEANS_LISTS, int(S.KMEANS_LISTS * args.scale))

    report = {
        "scale": args.scale,
        **meta,
        "gen_sec": gen_sec,
        "retuned": not args.no_retune,
        "contract_k": S.KMEANS_LISTS if args.contract_k else None,
        "cluster": {
            "workers": args.workers,
            "cores_per_worker": args.cores,
            "mem_per_worker_mb": args.mem_mb,
            "shuffle_partitions": args.partitions,
            "total_mem_mb": args.workers * args.mem_mb,
            "r06_single_jvm": {
                "heap_mb": 48 * 1024,
                "threads": 32,
                "dedup_minhash_lsh_pairs_sec": 280.6,
                "dedup_ngram_jaccard_pairs_sec": 406.9,
                "x100_minhash_sec": 21.2,
                "x100_jaccard_sec": 33.4,
            },
        },
        "queries": {},
    }

    try:
        import __spark_entry__ as entrymod

        qs = entrymod.queries()

        # JIT warm-up at x10 (r06's single-JVM numbers came from a warm
        # session after the x1/x10/x100 sequence; measured cold-JVM codegen
        # warm-up inflates the minhash leg up to ~10x)
        warm_dir = os.path.join(CORPUS_ROOT, "x10")
        scale_corpus.generate(spark, warm_dir, 10)
        legs = [s.strip() for s in args.legs.split(",") if s.strip()]
        for name in legs:
            t0 = time.time()
            qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
            print(f"warmup {name} @x10: {round(time.time()-t0,1)}s", flush=True)

        seen: set = set()
        _, _, seen = spill_since(spark, seen)
        for name in legs:
            before = executor_snapshot(spark)
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            sec = round(time.time() - t0, 1)
            rows = qs[name](spark, sf_dir).count()
            after = executor_snapshot(spark)
            mem_sp, disk_sp, seen = spill_since(spark, seen)
            report["queries"][name] = {
                "sec": sec,
                "rows": rows,
                "executors": delta(before, after),
                "memoryBytesSpilled": mem_sp,
                "diskBytesSpilled": disk_sp,
            }
            print(
                f"{name}: {sec}s rows={rows} "
                f"gc={report['queries'][name]['executors']['total']['gc_ms']}ms "
                f"spill_disk={disk_sp}",
                flush=True,
            )

        # planted-duplicate recall: extends the single-JVM stress's
        # recall-invariance curve (SCALE_r06: 10x/100x/300x) to whatever
        # scale this run probes, under the same capacity retune
        from tools.scale_stress import planted_recall

        if "dedup_minhash_lsh_pairs" in legs:
            report["recall"] = planted_recall(
                spark,
                sf_dir,
                meta,
                {
                    "dedup_minhash_lsh_pairs": qs["dedup_minhash_lsh_pairs"](
                        spark, sf_dir
                    )
                },
            )
            print(f"recall: {report['recall']}", flush=True)
    finally:
        S.SRP_BITS, S.SRP_SIGNS, S.KMEANS_LISTS, dd.SIMHASH_BITS = saved

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"{args.out}.json",
    )
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
