"""Physical-layout operators: ordered top-N and partition-pruned reads.

No reference-side counterpart beyond the fan-out idea (S4) these generalize:

* **ordered top-N** — ``ORDER BY … LIMIT n`` must NOT global-sort: Spark
  plans it as ``TakeOrderedAndProject`` (per-partition heap of n, merged on
  the driver), so the cost is O(rows · log n) with no shuffle of the data.
  The plan shape is pytest-pinned — a regression to a full sort would be a
  100 TB incident.
* **partition-pruned read** — the parquet twin of the reference's
  fan-out-then-read-one-store layout (`fan_out_by_storeid.py:38-41`):
  write once partitioned by the query key, and a keyed read touches ONLY
  that partition's directory (PartitionFilters in the scan, pruned file
  listing), never the rest of the dataset.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ting_data_etl_spark.registry import register
from ting_data_etl_spark.sources.tables import load_table

TOP_N_DOCS = 100

_SQL_TOP_QUALITY = f"""
WITH q AS (
  SELECT doc_id, n_chars FROM documents
)
SELECT doc_id, n_chars
FROM q ORDER BY n_chars DESC, doc_id ASC LIMIT {TOP_N_DOCS}
"""


@register("top_docs_by_length", oracle=_SQL_TOP_QUALITY)
def top_docs_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-{TOP_N_DOCS} by length — planned as TakeOrderedAndProject.

    The deterministic tiebreak (doc_id) makes the result oracle-stable; the
    plan contract (pytest-pinned) is that NO global sort happens — each
    partition keeps an n-element heap and the driver merges heaps.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", "n_chars")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .limit(TOP_N_DOCS)
    )


_STAGED_PARTITIONED: dict[str, str] = {}

PRUNE_KEY = "purchase"

_SQL_PRUNED = f"""
SELECT user_id,
       COUNT(*) AS n_events
FROM events WHERE event_type = '{PRUNE_KEY}'
GROUP BY user_id
"""


def stage_partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """Write events partitioned by event_type (once per process+sf)."""
    if sf_dir not in _STAGED_PARTITIONED:
        out = os.path.join(
            tempfile.gettempdir(),
            "ting_partitioned_events",
            sf_dir.strip("/").replace("/", "_"),
        )
        if not os.path.exists(os.path.join(out, "_SUCCESS")):
            load_table(spark, sf_dir, "events").write.mode(
                "overwrite"
            ).partitionBy("event_type").parquet(out)
        _STAGED_PARTITIONED[sf_dir] = out
    return _STAGED_PARTITIONED[sf_dir]


@register("partition_pruned_read", oracle=_SQL_PRUNED)
def partition_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed read over a partitionBy layout: touches ONE partition directory.

    The filter on the partition column never reaches row evaluation — it
    prunes at file-listing time (``PartitionFilters`` in the scan,
    pytest-pinned), which at 100 TB is the difference between listing one
    directory and scanning the corpus. Values must still match the batch
    truth over the unpartitioned table (the oracle).
    """
    staged = stage_partitioned_events(spark, sf_dir)
    ev = spark.read.parquet(staged)
    return (
        ev.filter(F.col("event_type") == PRUNE_KEY)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
