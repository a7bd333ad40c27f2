"""Multi-row-group parallelism probe (VERDICT r15 #5).

Every sf-scale testdata table is a single parquet row group, so scan
stages cannot split and 8-vs-32-core ratios sit at ~1 for scan-bound
queries — which leaves no positive evidence that the heavy families
actually spread when the input splits (as it always does at cluster
scale, where files are many and > maxPartitionBytes). This probe builds
that evidence:

1. Stage a COPY of the sf dir where ``documents.parquet`` and
   ``embeddings.parquet`` are directories of N part files (the shape a
   real multi-file table has; Spark assigns one scan partition per file
   here, exactly like one per split at scale). Row values are identical.
2. Confirm ``fan_out`` no-ops on the split layout (scan partitions >=
   default parallelism).
3. Run a heavy-family subset warm (noop sink, best-of-2) on the split
   layout. Run this script once with SPARK_GRAFT_CPUS=8 and once with 32:
   the 8→32 ratio on these queries is the scaling evidence.
4. Value-check: each query's result on the split layout must equal its
   result on the pristine single-file layout (sorted row hash) — the
   split changes the physical scan only.

Usage:
    SPARK_GRAFT_CPUS=32 python tools/rowgroup_probe.py [--sf DIR] [--parts N]
    SPARK_GRAFT_CPUS=8  python tools/rowgroup_probe.py --skip-valuecheck
Prints one JSON line per run; combine the two runs' outputs by hand into
ROWGROUP_SCALE artifacts.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "text_winnow_fingerprints",
    "text_ngram_novelty",
    "dedup_minhash_signatures",
    "dedup_repeated_substrings",
    "sample_dsir_importance",
    "similarity_bruteforce_topk",
    "corpus_budget_head",
]


def stage_split_dir(spark, sf: str, parts: int) -> str:
    import glob

    out = os.path.join("/tmp", f"ting_mrg_{os.path.basename(sf)}_{parts}")
    if os.path.exists(os.path.join(out, "_STAGED")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for p in glob.glob(os.path.join(sf, "*.parquet")):
        name = os.path.basename(p)
        if name in ("documents.parquet", "embeddings.parquet"):
            df = spark.read.parquet(p)
            # deterministic split on the id column — same rows, N files
            idcol = "doc_id" if name.startswith("documents") else "vec_id"
            df.repartitionByRange(parts, idcol).write.mode(
                "overwrite"
            ).parquet(os.path.join(out, name))
        elif os.path.isdir(p):
            shutil.copytree(p, os.path.join(out, name))
        else:
            shutil.copy(p, os.path.join(out, name))
    open(os.path.join(out, "_STAGED"), "w").close()
    return out


def result_hash(df) -> str:
    rows = sorted(str(r) for r in df.collect())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()[:16]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--parts", type=int, default=32)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--skip-valuecheck", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from ting_data_etl_spark.session import get_spark
    from ting_data_etl_spark.sources.tables import load_table

    qs = entrymod.queries()
    spark = get_spark(app_name="ting-rowgroup-probe")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")

    split = stage_split_dir(spark, args.sf, args.parts)
    scan_parts = load_table(spark, split, "documents").rdd.getNumPartitions()
    par = spark.sparkContext.defaultParallelism
    fan_out_noop = scan_parts >= par

    def run(name: str, sf: str) -> float:
        spark.sparkContext.setJobDescription(f"rowgroup:{name}")
        t0 = time.time()
        qs[name](spark, sf).write.format("noop").mode("overwrite").save()
        spark.sparkContext.setJobDescription(None)
        return time.time() - t0

    def host_cpu() -> tuple[int, int]:
        v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
        return v[0] + v[1] + v[2], v[7]

    # warm-up pass (stage builds for the split dir), then best-of-reps
    for q in QUERIES:
        run(q, split)
    best: dict[str, float] = {}
    b0, s0 = host_cpu()
    for _ in range(args.reps):
        for q in QUERIES:
            dt = run(q, split)
            best[q] = min(best.get(q, 1e9), round(dt, 3))
    b1, s1 = host_cpu()

    values_match = None
    if not args.skip_valuecheck:
        values_match = {}
        for q in QUERIES:
            values_match[q] = result_hash(qs[q](spark, split)) == result_hash(
                qs[q](spark, args.sf)
            )

    print(json.dumps({
        "cpus": cpus, "parts": args.parts, "split_dir": split,
        "doc_scan_partitions": scan_parts, "default_parallelism": par,
        "fan_out_noop": fan_out_noop, "reps": args.reps, "best": best,
        "host_busy_cpu_s": round((b1 - b0) / 100, 1),
        "host_steal_cpu_s": round((s1 - s0) / 100, 1),
        "values_match_single_file": values_match,
    }))


if __name__ == "__main__":
    main()
