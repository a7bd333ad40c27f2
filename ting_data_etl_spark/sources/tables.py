"""Parquet table loaders for the driver's TPC-H-ish testdata.

``load_table(spark, sf_dir, name)`` is a thin wrapper over
``spark.read.parquet`` — kept thin ON PURPOSE so Catalyst sees the raw scan
and can push filters / prune columns into the parquet reader (check for
``PushedFilters`` / narrowed ``ReadSchema`` in ``.explain``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (lazy parquet scan).

    ``events.ts`` is physically TIMESTAMP(NANOS) parquet, which Spark's
    vectorized reader rejects; it is read as long nanos
    (``nanosAsLong``) and converted to a microsecond TimestampType —
    truncation matches DuckDB's own ns→µs read behavior, so oracle
    comparisons stay exact.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        e = spark.read.parquet(path)
        return e.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table keyed by name."""
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
