"""ORC source/sink round-trip — the second columnar interchange format.

No reference-side counterpart (the reference is CSV-only; SURVEY.md §2.1
S-series extended): warehouse estates frequently hand off ORC (Hive-native),
and Spark reads/writes it with a built-in vectorized reader the same way as
parquet — predicate pushdown, column pruning, and per-stripe statistics all
apply. The registered query proves the round-trip end-to-end exactly like
the JSONL twin (``sources/jsonl.py``): stage ``documents`` as ORC shards,
read them back, aggregate an order-independent content checksum per
language. The oracle computes the same aggregate straight from parquet, so
any loss or mangling in the ORC writer/reader breaks the hash match.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ting_data_etl_spark.registry import register
from ting_data_etl_spark.sources.jsonl import _content_hash
from ting_data_etl_spark.sources.tables import load_table
from ting_data_etl_spark.plans.oracles import sql_content_hash as _sql_ch

_STAGED_ORC: dict[str, str] = {}

ORC_SHARDS = 8


def write_orc(df: DataFrame, path: str, shards: int = ORC_SHARDS) -> None:
    """Write a DataFrame as *shards* ORC files (one per partition)."""
    df.repartition(shards).write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC read — schema travels in the file footer (self-describing)."""
    return spark.read.orc(path)


def stage_documents_orc(spark: SparkSession, sf_dir: str) -> str:
    """Stage ``documents`` as ORC once per (process, sf_dir)."""
    if sf_dir not in _STAGED_ORC:
        out = os.path.join(
            tempfile.gettempdir(),
            "ting_orc_stage",
            sf_dir.strip("/").replace("/", "_"),
        )
        write_orc(load_table(spark, sf_dir, "documents"), out)
        _STAGED_ORC[sf_dir] = out
    return _STAGED_ORC[sf_dir]


_SQL_ORC_PROFILE = f"""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(SUM({_sql_ch('text')}) AS BIGINT)
         AS content_checksum
FROM documents
GROUP BY lang
"""


@register("orc_roundtrip_profile", oracle=_SQL_ORC_PROFILE)
def orc_roundtrip_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write documents → ORC shards → read back → checksum per language.

    The checksum is an order-independent BIGINT sum of per-doc content
    hashes (same fold as the JSONL round-trip), so the comparison is
    insensitive to shard assignment but breaks on any dropped, duplicated,
    or mangled document — the ORC writer+reader sit alone inside the
    comparison.
    """
    staged = stage_documents_orc(spark, sf_dir)
    back = read_orc(spark, staged)
    return back.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.sum(_content_hash(F.col("text"))).cast("long").alias("content_checksum"),
    )
