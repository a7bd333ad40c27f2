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
    """Write events partitioned by event_type (once per process+sf).

    Fingerprinted by the source's (mtime, size) — a regenerated events
    table must invalidate the stage instead of being served the OLD layout
    forever (the round-4 staleness class; the zorder stage below always
    had this, this stage was the gap) — and published atomically via
    :func:`~ting_data_etl_spark.operators.dedup._publish_stage`.
    """
    from ting_data_etl_spark.operators.dedup import _publish_stage

    if sf_dir not in _STAGED_PARTITIONED:
        src = os.path.join(sf_dir, "events.parquet")
        fp = f"{int(os.path.getmtime(src))}_{os.path.getsize(src)}"
        out = os.path.join(
            tempfile.gettempdir(),
            "ting_partitioned_events",
            f"{sf_dir.strip('/').replace('/', '_')}_{fp}",
        )
        if not os.path.exists(os.path.join(out, "_SUCCESS")):
            _publish_stage(
                load_table(spark, sf_dir, "events"),
                out,
                partition_by=("event_type",),
            )
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


# --- Z-order layout: multi-dimensional data skipping -----------------------
#: bits interleaved per key dimension. Must cover max(key) or distant keys
#: alias onto the same z-range and min/max skipping erodes (results stay
#: correct — predicates re-apply — but the layout property degrades).
#: 24 bits/dim covers keys to 16.7M and the interleave still fits a long.
ZORDER_BITS = 24
ZORDER_FILES = 8

_STAGED_ZORDER: dict[str, str] = {}


def zvalue(a, b, bits: int | None = None):
    """Morton (Z-curve) interleave of two non-negative int columns.

    Bit i of *a* lands at position 2i, bit i of *b* at 2i+1 — a pure
    shift/mask expression tree that stays inside whole-stage codegen. Rows
    close on the Z-curve are close in BOTH dimensions, so sorting the
    layout by this value co-locates multi-dimensional neighborhoods into
    the same parquet row groups.

    ``bits`` defaults to the module's ``ZORDER_BITS`` read at CALL time —
    a def-time default would let a runtime retune move the coverage guard
    and the stage fingerprint while the interleave silently kept the old
    width (the trap fixed for KMEANS_LISTS/BAND_FREQUENCY_CAP in r6/r7).
    """
    if bits is None:
        bits = ZORDER_BITS
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + (
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def stage_lineitem_zorder(spark: SparkSession, sf_dir: str) -> str:
    """Write lineitem Z-ordered by (l_orderkey, l_partkey), once per corpus.

    `repartitionByRange` on the z-value splits the curve into contiguous
    chunks (one file each), `sortWithinPartitions` orders rows inside —
    so every parquet row group covers a small z-range, i.e. a small
    rectangle in (orderkey, partkey) space. A reader filtering on EITHER
    key then skips most row groups on min/max statistics — the data-
    skipping layout (Delta/Iceberg OPTIMIZE ZORDER) built from two stock
    Spark primitives. Fingerprinted like every staged artifact.
    """
    if sf_dir not in _STAGED_ZORDER:
        src = os.path.join(sf_dir, "lineitem.parquet")
        # layout knobs are part of the fingerprint: a retune rebuilds the stage
        fp = (
            f"{int(os.path.getmtime(src))}_{os.path.getsize(src)}"
            f"_b{ZORDER_BITS}_f{ZORDER_FILES}"
        )
        out = os.path.join(
            tempfile.gettempdir(),
            "ting_zorder_stage",
            f"{sf_dir.strip('/').replace('/', '_')}_{fp}",
        )
        if not os.path.exists(os.path.join(out, "_SUCCESS")):
            from ting_data_etl_spark.operators.dedup import _publish_stage

            li = load_table(spark, sf_dir, "lineitem").select(
                "l_orderkey",
                "l_partkey",
                "l_quantity",
                "l_extendedprice",
            )
            mx = li.agg(
                F.max("l_orderkey").alias("a"), F.max("l_partkey").alias("b")
            ).first()
            # empty table: max() is NULL — nothing to cover, skip the guard
            # (max(None, None) would raise a bare TypeError)
            if mx["a"] is not None and mx["b"] is not None:
                if max(mx["a"], mx["b"]) >= (1 << ZORDER_BITS):
                    raise ValueError(
                        f"ZORDER_BITS={ZORDER_BITS} cannot cover max key "
                        f"{max(mx['a'], mx['b'])}; raise ZORDER_BITS"
                    )
            z = zvalue(F.col("l_orderkey"), F.col("l_partkey"))
            _publish_stage(
                li.withColumn("__z", z)
                .repartitionByRange(ZORDER_FILES, "__z")
                .sortWithinPartitions("__z")
                .drop("__z"),
                out,
            )
        _STAGED_ZORDER[sf_dir] = out
    return _STAGED_ZORDER[sf_dir]


#: the windowed predicate both engines evaluate — a rectangle in
#: (orderkey, partkey) space, the query shape Z-ordering exists for
ZQ_OK_LO, ZQ_OK_HI = 1_000, 3_000
ZQ_PK_LO, ZQ_PK_HI = 100, 600

_SQL_ZORDER = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_units,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
FROM lineitem
WHERE l_orderkey BETWEEN {ZQ_OK_LO} AND {ZQ_OK_HI}
  AND l_partkey BETWEEN {ZQ_PK_LO} AND {ZQ_PK_HI}
"""


@register("layout_zorder_rectangle_scan", oracle=_SQL_ZORDER)
def layout_zorder_rectangle_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rectangle predicate over the Z-ordered layout, checked vs the raw table.

    The read leg of the Z-order pattern: both range predicates reach the
    parquet scan as PushedFilters, and because the staged layout clusters
    both key dimensions, row-group min/max stats skip most of the file
    bytes — for a single-dimension sort layout, the second predicate's
    stats are useless. The oracle runs the identical rectangle on the RAW
    table, proving the re-layout is lossless; the skipping benefit is a
    physical property (visible in the scan's rowgroup metrics at scale).
    """
    staged = stage_lineitem_zorder(spark, sf_dir)
    t = spark.read.parquet(staged).filter(
        F.col("l_orderkey").between(ZQ_OK_LO, ZQ_OK_HI)
        & F.col("l_partkey").between(ZQ_PK_LO, ZQ_PK_HI)
    )
    return t.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "price_units"
        ),
        F.countDistinct("l_orderkey").cast("long").alias("n_orders"),
    )
