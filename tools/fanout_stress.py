"""High-cardinality fan-out sink stress (VERDICT r06 next-round #5).

S4/S5 are oracle-tested at ~150 store keys; the 100 TB contract is millions.
The reference's own answer to unbounded key cardinality is open/append/close
per ROW — zero standing handles (`fan_out_by_storeid.py:42-48`,
`README.md:61`). Spark's answer is the planned write: sort by partition key
before writing so each task holds ONE open writer at a time
(`spark.sql.optimizer.plannedWrite.enabled`, with
`spark.sql.maxConcurrentOutputFileWriters` as the concurrent-writer cap when
the sort is skipped). This runner pushes ~100k distinct keys through both
sinks and MEASURES the safety property instead of citing it:

* peak open file descriptors of the writing process, polled from
  ``/proc/self/fd`` during the write (local mode: executors are threads, so
  this is exactly the writers' handle load plus a stable baseline);
* wall time, files produced, receipts verified;
* ``write_fanout`` both WITH the in-plan sort (our default: the
  ``sortWithinPartitions`` planned-write shape) and with the sort stripped,
  to show what the guidance is protecting against.

Usage: python tools/fanout_stress.py [--keys 100000] [--rows 2000000]
Writes FANOUT_STRESS_r07.json at the repo root.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_ROOT = "/tmp/fanout_stress"


class FdPoller:
    """Samples the process's open-fd count at ~20 Hz in a daemon thread."""

    def __init__(self) -> None:
        self.peak = 0
        self.baseline = len(os.listdir("/proc/self/fd"))
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                n = len(os.listdir("/proc/self/fd"))
                self.peak = max(self.peak, n)
            except OSError:
                pass
            time.sleep(0.05)

    def __enter__(self) -> "FdPoller":
        self._t.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        self._t.join(timeout=2)


def gen_rows(spark, n_rows: int, n_keys: int):
    from pyspark.sql import functions as F

    return spark.range(n_rows).select(
        F.concat(
            F.lit("store"), F.pmod(F.xxhash64("id", F.lit(7)), F.lit(n_keys))
        ).alias("store_id"),
        F.col("id").alias("row_id"),
        (F.pmod(F.xxhash64("id", F.lit(11)), F.lit(100000)) / 100.0).alias("amt"),
    )


def count_files(root: str, pattern: str) -> int:
    return sum(1 for _ in glob.iglob(os.path.join(root, pattern)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=100_000)
    ap.add_argument("--rows", type=int, default=2_000_000)
    args = ap.parse_args()

    from ting_data_etl_spark.session import get_spark
    from ting_data_etl_spark.sinks.fanout import write_fanout
    from ting_data_etl_spark.sinks.single_file import write_per_group_csv

    spark = get_spark(app_name="fanout-stress")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(OUT_ROOT, ignore_errors=True)

    df = gen_rows(spark, args.rows, args.keys)
    report: dict = {
        "n_rows": args.rows,
        "n_keys_requested": args.keys,
        "n_keys_actual": df.select("store_id").distinct().count(),
    }

    # --- S4 partitioned fan-out, planned-write shape (our default) ---------
    out1 = os.path.join(OUT_ROOT, "fanout_sorted")
    with FdPoller() as p:
        t0 = time.time()
        write_fanout(df, out1, partition_cols=("store_id",), fmt="csv")
        sec = round(time.time() - t0, 1)
    report["write_fanout_sorted"] = {
        "sec": sec,
        "dirs": count_files(out1, "store_id=*"),
        "fd_baseline": p.baseline,
        "fd_peak": p.peak,
    }
    print("write_fanout (sorted):", report["write_fanout_sorted"], flush=True)

    # --- same write WITHOUT the in-plan sort: concurrent-writer exposure ---
    # (what spark.sql.maxConcurrentOutputFileWriters then has to cap)
    out2 = os.path.join(OUT_ROOT, "fanout_unsorted")
    from pyspark.sql import functions as F

    keyed = df.filter(F.col("store_id").isNotNull())
    with FdPoller() as p:
        t0 = time.time()
        (
            keyed.write.mode("overwrite")
            .option("header", True)
            .partitionBy("store_id")
            .format("csv")
            .save(out2)
        )
        sec = round(time.time() - t0, 1)
    report["write_fanout_unsorted"] = {
        "sec": sec,
        "dirs": count_files(out2, "store_id=*"),
        "fd_baseline": p.baseline,
        "fd_peak": p.peak,
    }
    print("write_fanout (unsorted):", report["write_fanout_unsorted"], flush=True)

    # --- S5 one-file-per-group sink at 100k groups -------------------------
    out3 = os.path.join(OUT_ROOT, "per_group")
    with FdPoller() as p:
        t0 = time.time()
        receipts = write_per_group_csv(
            df,
            out3,
            group_col="store_id",
            file_name="data.csv",
            columns=["store_id", "row_id", "amt"],
            sort_by=["row_id"],
        )
        agg = receipts.groupBy().sum("rows_written").first()[0]
        sec = round(time.time() - t0, 1)
    report["write_per_group_csv"] = {
        "sec": sec,
        "rows_receipted": int(agg),
        "files": count_files(out3, "*/data.csv"),
        "fd_baseline": p.baseline,
        "fd_peak": p.peak,
    }
    print("write_per_group_csv:", report["write_per_group_csv"], flush=True)

    ok = (
        report["write_per_group_csv"]["rows_receipted"] == args.rows
        and report["write_per_group_csv"]["files"]
        == report["n_keys_actual"]
    )
    report["receipts_consistent"] = ok

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "FANOUT_STRESS_r07.json",
    )
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {path} (consistent={ok})", flush=True)


if __name__ == "__main__":
    main()
