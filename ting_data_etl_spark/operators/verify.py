"""Fan-out output verification (SURVEY §2.10 V1-V4, O4).

The reference's entire correctness strategy is a standalone checker over the
fan-out tree (``verify_fanout.py``): per-store file-set completeness
(``:32-48``), the partition-value invariant — every data row's key cell must
equal its directory name (``:87-97``) — with ≤5 sampled violations per file
(``:96-97``, O4) and a nonzero exit code on any defect (``:187-188``, V3).

Spark-first re-expression: the fan-out sink writes a Hive-partitioned tree,
reading it back re-derives the partition key from directory names, and the
checks become three small DataFrame jobs:

* **V1 completeness** — expected (key, src) pairs from the SOURCE data
  anti-joined both ways against the distinct pairs found on disk;
* **V2 invariant** — the key value carried INSIDE the row must equal the
  partition value derived from the row's directory;
* **O4 sampling** — ``row_number() <= k`` per key over any violations;
* **V3 contract** — the report's violation counts must all be zero, asserted
  by the oracle comparison (zeros are literals in the oracle SQL) and by
  ``tests/test_verify.py`` (which also corrupts a tree and proves the checks
  catch it).

At 100 TB the read-back scans are pure metadata + columnar reads of two thin
columns (partition pruning applies; payload columns are never read), and
every check is an aggregate/anti-join on the partition key — the natural
shuffle key of the tree being checked.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ting_data_etl_spark.operators.relational import set_difference
from ting_data_etl_spark.registry import register
from ting_data_etl_spark.sinks.fanout import write_fanout
from ting_data_etl_spark.sources.tables import load_table

VIOLATION_SAMPLE_K = 5  # reference verify_fanout.py:96-97


def fanout_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset the verification round-trips: customers fanned out by
    nation, split into two synthetic source files (even/odd custkey) to give
    the file-set check a second dimension, with the partition key DUPLICATED
    into a payload column (``store_key_copy``) so the invariant is checkable
    after the read-back re-derives ``store_id`` from directory names.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("row_id"),
        F.col("c_nationkey").cast("string").alias("store_id"),
        F.col("c_nationkey").cast("string").alias("store_key_copy"),
        F.when(F.col("c_custkey") % 2 == 0, F.lit("customer_even.csv"))
        .otherwise(F.lit("customer_odd.csv"))
        .alias("src"),
    )


def read_fanout_back(spark: SparkSession, output_dir: str) -> DataFrame:
    """Read a fan-out tree with partition discovery; keys become strings."""
    df = (
        spark.read.option("header", True)
        .option("basePath", output_dir)
        .option("inferSchema", False)
        .csv(output_dir)
    )
    # partition-column type inference may type dir values as int; the
    # reference compares keys as trimmed STRINGS (verify_fanout.py:94)
    return df.withColumn("store_id", F.col("store_id").cast("string")).withColumn(
        "src", F.col("src").cast("string")
    )


def completeness_violations(
    expected_pairs: DataFrame, found_pairs: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """V1: (missing, extra) (store, src) pairs via both-ways anti-joins."""
    missing = set_difference(expected_pairs, found_pairs, ["store_id", "src"])
    extra = set_difference(found_pairs, expected_pairs, ["store_id", "src"])
    return missing, extra


def _invariant_predicate() -> F.Column:
    """V2 predicate: embedded key != directory-derived partition key.

    ONE definition shared by the count path and the sampling path — the
    report branches on the count before sampling, so a drift between two
    copies would make n_bad and the sampled rows silently disagree.
    """
    return F.coalesce(F.trim(F.col("store_key_copy")), F.lit("")) != F.coalesce(
        F.col("store_id"), F.lit("")
    )


def invariant_violations(back: DataFrame) -> DataFrame:
    """V2: rows whose embedded key != their directory-derived partition key."""
    return back.filter(_invariant_predicate())


def sample_violations(violations: DataFrame, k: int = VIOLATION_SAMPLE_K) -> DataFrame:
    """O4: at most *k* sampled violation rows per store (deterministic order)."""
    from pyspark.sql import Window

    w = Window.partitionBy("store_id").orderBy("row_id")
    return (
        violations.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def fanout_verification_report(
    spark: SparkSession, source: DataFrame, output_dir: str
) -> DataFrame:
    """Write the tree, read it back, run V1+V2+O4; return the check report.

    Report rows: (check_name, n). The V3 contract is that every ``*_violations``
    and ``missing/extra`` count is 0 — asserted by the oracle twin (zero
    literals) and by the pytest that corrupts a tree to prove detection.

    Scale shape: the read-back tree is scanned ONCE — a single grouped
    aggregation on (store, src) yields per-pair row counts and violation
    counts, and every check (completeness anti-joins, totals, distinct
    stores) derives from that small aggregate, which at 100 TB is
    #partition-pairs rows, not data rows. The O4 violation-sampling scan
    only runs when violations exist.
    """
    write_fanout(source, output_dir, partition_cols=("store_id", "src"))
    back = read_fanout_back(spark, output_dir)

    viol = _invariant_predicate().cast("long")
    per_pair = (
        back.groupBy("store_id", "src")
        .agg(F.count("*").alias("n_rows"), F.sum(viol).alias("n_bad"))
        .persist()
    )
    try:
        expected = source.select("store_id", "src").distinct()
        found = per_pair.select("store_id", "src")
        missing, extra = completeness_violations(expected, found)
        totals = per_pair.agg(
            F.sum("n_rows").alias("rows"),
            F.sum("n_bad").alias("bad"),
            F.countDistinct("store_id").alias("stores"),
        ).first()
        n_bad = int(totals.bad or 0)
        sampled = (
            sample_violations(invariant_violations(back)).count() if n_bad else 0
        )
        rows = [
            ("missing_store_files", missing.count()),
            ("extra_store_files", extra.count()),
            ("key_value_violations", n_bad),
            ("sampled_violations", sampled),
            ("rows_checked", int(totals.rows or 0)),
            ("stores_checked", int(totals.stores or 0)),
        ]
        return spark.createDataFrame(rows, "check_name string, n long")
    finally:
        per_pair.unpersist()


_SQL_FANOUT_VERIFY = """
SELECT 'missing_store_files' AS check_name, CAST(0 AS BIGINT) AS n
UNION ALL SELECT 'extra_store_files', CAST(0 AS BIGINT)
UNION ALL SELECT 'key_value_violations', CAST(0 AS BIGINT)
UNION ALL SELECT 'sampled_violations', CAST(0 AS BIGINT)
UNION ALL SELECT 'rows_checked', (SELECT COUNT(*) FROM customer)
UNION ALL SELECT 'stores_checked',
  (SELECT CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) FROM customer)
"""


@register("prim_fanout_verify", oracle=_SQL_FANOUT_VERIFY)
def prim_fanout_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end S4 sink → V1/V2/O4 verification round-trip.

    The oracle pins the defect counts to ZERO (V3's exit-code contract) and
    the row/store tallies to the source table's — so a fan-out write that
    drops, duplicates, or misroutes any row fails the hash comparison.
    """
    # per-process suffix: two drivers verifying the same sf_dir (bench run
    # next to a pytest session) must not overwrite each other's tree
    # mid-read-back; within one process reruns still reuse/overwrite
    out = os.path.join(
        tempfile.gettempdir(),
        "ting_fanout_verify",
        f"{sf_dir.strip('/').replace('/', '_')}_{os.getpid()}",
    )
    return fanout_verification_report(spark, fanout_source(spark, sf_dir), out)
