"""Partitioned fan-out sink (SURVEY.md §2.1 S4).

The reference routes each row to ``output/{storeId}/{src_file}.csv`` with one
open/append/close per row — a deliberate O(1)-file-handle tradeoff for
unbounded store cardinality (reference ``fan_out_by_storeid.py:32-48``,
``README.md:61``). Spark's dynamic-partition write solves the same problem
properly: per-task partition writers with spill. At very high key cardinality
the sort-before-write (planned write) keeps at most ONE open writer per task,
which is the exact same safety property, minus the per-row reopen cost.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_fanout(
    df: DataFrame,
    output_dir: str,
    partition_cols: Sequence[str] = ("store_id",),
    fmt: str = "csv",
    mode: str = "overwrite",
    cluster_by_key: bool = True,
) -> None:
    """Hive-style partitioned write: ``output/{key}=.../part-*.{fmt}``.

    Rows with blank/NULL keys are dropped first (reference
    ``fan_out_by_storeid.py:33-37``). Two physical guarantees:

    * ``cluster_by_key=True`` (default) hash-repartitions on the partition
      key before writing, so each key's rows land in exactly ONE task and
      the output is O(keys) files. Without it, randomly-distributed input
      makes EVERY task emit a file for every key it sees — measured at
      100k keys x 32 tasks: a 3.2M-file write that spent 15+ minutes just
      creating task-attempt dirs (FANOUT_STRESS_r07). One shuffle is the
      price of a bounded file count; at reference scale (hundreds of
      stores) either shape is fine, at 100 TB the clustered one is the
      only one that finishes.
    * ``sortWithinPartitions`` on the key bounds concurrent open writers
      per task to one (the planned-write shape) — the Spark-native
      analogue of the reference's open-append-close-per-row file-handle
      bound.
    """
    keyed = df
    for c in partition_cols:
        keyed = keyed.filter(
            F.col(c).isNotNull() & (F.length(F.trim(F.col(c).cast("string"))) > 0)
        )
    if cluster_by_key:
        keyed = keyed.repartition(*[F.col(c) for c in partition_cols])
    writer = (
        keyed.sortWithinPartitions(*partition_cols)
        .write.mode(mode)
        .partitionBy(*partition_cols)
    )
    if fmt == "csv":
        writer = writer.option("header", True)
    writer.format(fmt).save(output_dir)


def write_fanout_per_store_csv(
    df: DataFrame,
    output_dir: str,
    key_col: str,
    file_name: str,
    columns: Sequence[str],
    meta_rows: Sequence[Sequence[str]],
    raw_header: Sequence[str],
    encoding: str = "utf-8",
) -> DataFrame:
    """Reference-exact fan-out: ``output/{store}/{file_name}`` per key.

    Each store file opens with the SOURCE FILE's meta prefix and header,
    re-serialized through ``csv.writer`` — byte-for-byte the prefix the
    reference writes into every fanned-out file (``fan_out_by_storeid.py:
    44-47``: ``prefix_rows`` then ``header`` through the same writer the
    data rows use). ``raw_header`` is the header row as parsed (unstripped),
    ``columns`` the normalized DataFrame column names aligned to it.

    Same distributed shape as :func:`ting_data_etl_spark.sinks.single_file.
    write_per_group_csv`: one group = one Arrow task = one file, no driver
    collect; the prefix is a tiny closure constant shipped to every task.
    Data rows are written in a deterministic (all-columns) sort order.
    Returns the lazy receipts DataFrame ``(group_key, rows_written)``.
    """
    import csv
    import os

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    out_schema = StructType(
        [
            StructField("group_key", StringType(), True),
            StructField("rows_written", LongType(), True),
        ]
    )
    cols = list(columns)
    prefix_rows = [list(r) for r in meta_rows] + [list(raw_header)]

    def _write_group(pdf):
        import pandas as pd

        from ting_data_etl_spark.sinks.single_file import safe_path_component

        # the path key IS the Spark group value (_k = F.trim(key)), not a
        # re-derived Python strip() of the raw column: F.trim removes only
        # ASCII spaces, so 'S001\t' and 'S001 ' are DIFFERENT groups —
        # str.strip() would collapse both onto one path and let the two
        # tasks clobber each other's file
        key = safe_path_component(str(pdf["_k"].iloc[0]))
        pdf = pdf.drop(columns=["_k"]).sort_values(cols, kind="mergesort")
        target_dir = os.path.join(output_dir, key)
        os.makedirs(target_dir, exist_ok=True)
        # atomic publish (tmp + os.replace), same contract as
        # single_file.write_per_group_csv: a speculative/retried task or a
        # concurrent run must never expose a torn file
        final = os.path.join(target_dir, file_name)
        tmp = f"{final}.tmp.{os.getpid()}"
        with open(tmp, "w", newline="", encoding=encoding) as f:
            w = csv.writer(f)
            for r in prefix_rows:
                w.writerow(r)
            for row in pdf[cols].itertuples(index=False):
                w.writerow(["" if v is None or v != v else v for v in row])
        os.replace(tmp, final)
        return pd.DataFrame({"group_key": [key], "rows_written": [len(pdf)]})

    keyed = df.filter(
        F.col(key_col).isNotNull()
        & (F.length(F.trim(F.col(key_col).cast("string"))) > 0)
    )
    grouped = keyed.withColumn("_k", F.trim(F.col(key_col)))
    return grouped.groupBy("_k").applyInPandas(_write_group, schema=out_schema)
