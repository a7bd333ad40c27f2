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
) -> None:
    """Hive-style partitioned write: ``output/{key}=.../part-*.{fmt}``.

    Rows with blank/NULL keys are dropped first (reference
    ``fan_out_by_storeid.py:33-37``). Sorting within partitions by the
    partition key before writing (planned write) bounds concurrent open
    writers per task to one — the Spark-native analogue of the reference's
    open-append-close-per-row file-handle bound.
    """
    keyed = df
    for c in partition_cols:
        keyed = keyed.filter(
            F.col(c).isNotNull() & (F.length(F.trim(F.col(c).cast("string"))) > 0)
        )
    writer = (
        keyed.sortWithinPartitions(*partition_cols)
        .write.mode(mode)
        .partitionBy(*partition_cols)
    )
    if fmt == "csv":
        writer = writer.option("header", True)
    writer.format(fmt).save(output_dir)
