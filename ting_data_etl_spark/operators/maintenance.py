"""Table-maintenance operators: small-file compaction (SURVEY.md §7.4).

No reference-side counterpart. At 100 TB the silent killer of scan
performance is accumulation of small files (streaming sinks, per-partition
appends, over-parallel writers): a scan pays an open/footer/seek per file,
and 10⁶ × 1 MB files can be slower to read than 10³ × 1 GB files. The
compaction operator rewrites a directory to a bounded file count while
provably preserving content.

The registered query runs the full cycle — fragment a table into many tiny
parquet files, compact, and emit a report whose row counts and
order-independent content checksum the oracle recomputes from the original
table. ``files_after`` is part of the contract: compaction must actually
reduce the file count, and the checksum must not notice.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ting_data_etl_spark.registry import register
from ting_data_etl_spark.sources.tables import load_table

FRAGMENT_FILES = 64  # the "pathological" small-file state
COMPACT_TARGET_FILES = 4  # post-compaction bound

_STAGED: dict[str, tuple[str, str]] = {}


def compact_parquet_dir(
    spark: SparkSession,
    src: str,
    dst: str,
    target_files: int = COMPACT_TARGET_FILES,
) -> None:
    """Rewrite a parquet dir to ≤ *target_files* files.

    ``coalesce`` (not ``repartition``): compaction must not pay a shuffle —
    it only narrows partitions, each output file a concatenation of input
    splits. On a cluster the same operator sizes ``target_files`` from
    ``sum(file sizes) / target_file_size`` and runs per partition-directory
    so each Hive partition compacts independently.
    """
    df = spark.read.parquet(src)
    df.coalesce(target_files).write.mode("overwrite").parquet(dst)


def _parquet_files(path: str) -> list[str]:
    return [f for f in os.listdir(path) if f.endswith(".parquet")]


from ting_data_etl_spark.functions.text import content_hash as _content_hash
from ting_data_etl_spark.plans.oracles import sql_content_hash as _sql_ch


_SQL_COMPACT = f"""
SELECT COUNT(*) AS n_rows,
       CAST(SUM({_sql_ch('text')}) AS BIGINT)
         AS content_checksum,
       CAST({COMPACT_TARGET_FILES} AS INTEGER) AS files_after
FROM documents
"""


@register("compact_small_files", oracle=_SQL_COMPACT)
def compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fragment → compact → verify: row count and checksum must survive.

    Stages ``documents`` as {FRAGMENT_FILES} small files, compacts to
    {COMPACT_TARGET_FILES}, and reports (rows, checksum, real file count)
    from the COMPACTED data. The oracle recomputes rows+checksum from the
    original table and pins ``files_after`` to the target — so the entry
    fails if compaction loses rows, corrupts content, or misses the file
    bound.
    """
    if sf_dir not in _STAGED:
        base = os.path.join(
            tempfile.gettempdir(),
            "ting_compact_stage",
            sf_dir.strip("/").replace("/", "_"),
        )
        frag, compacted = os.path.join(base, "frag"), os.path.join(base, "out")
        d = load_table(spark, sf_dir, "documents")
        d.repartition(FRAGMENT_FILES).write.mode("overwrite").parquet(frag)
        compact_parquet_dir(spark, frag, compacted)
        _STAGED[sf_dir] = (frag, compacted)
    _, compacted = _STAGED[sf_dir]
    n_files = len(_parquet_files(compacted))
    back = spark.read.parquet(compacted)
    return back.agg(
        F.count("*").alias("n_rows"),
        F.sum(_content_hash(F.col("text"))).cast("long").alias("content_checksum"),
        F.lit(n_files).cast("int").alias("files_after"),
    )
