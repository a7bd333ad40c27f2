"""Multimodal columns: opaque binary payloads + typed metadata (SURVEY §7.4).

Image/audio/video are carried as ``binary`` columns with a metadata struct —
the layout every large multimodal pipeline uses (the bytes stay opaque to the
planner; metadata predicates prune partitions without touching payloads).

The container has no image/audio libs, so the decode step is STUBBED exactly
as the build brief requires: ``decode_image_batch`` raises
``NotImplementedError`` unless handed the deterministic fake decoder. What IS
real and tested: the Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signature, partition behavior, and the metadata queries.

The oracle-checked query exercises the binary plumbing DuckDB can also see:
UTF-8 payload bytes, octet length, md5 digest.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ting_data_etl_spark.registry import register
from ting_data_etl_spark.sources.tables import load_table

#: Canonical multimodal record schema: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("feature_dim", IntegerType(), True),
        StructField("feature_norm", LongType(), True),
    ]
)


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap ``documents`` rows as multimodal records (UTF-8 payload bytes).

    Stands in for an image/audio table: same schema, same plumbing, but a
    payload DuckDB can reproduce for the oracle.
    """
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.lit("text").alias("media_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def real_decoder(payload: bytes, media_type: str):
    """The production decode hook — image/audio libs are not installed."""
    raise NotImplementedError(
        "media decode requires imaging/audio libraries not present in this "
        "container; inject fake_decoder for tests"
    )


def fake_decoder(payload: bytes, media_type: str) -> list[int]:
    """Deterministic stand-in decoder: 8 pseudo-features from payload bytes."""
    if payload is None:
        return [0] * 8
    return [sum(payload[i::8]) % 997 for i in range(8)]


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], list[int]] = real_decoder,
    batch_hint: int | None = None,
) -> DataFrame:
    """Decode + featurize payloads via ``mapInPandas`` (Arrow batches).

    The Spark-side contract this validates: binary columns arrive as
    ``bytes`` objects in pandas batches; output schema is enforced; work is
    per-partition with zero driver involvement. ``decoder`` defaults to the
    stubbed production hook (NotImplementedError) — tests inject
    :func:`fake_decoder`.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decoder(p, t)
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "feature_dim": [len(f) for f in feats],
                    "feature_norm": [sum(x * x for x in f) for f in feats],
                }
            )

    return media.mapInPandas(_batches, schema=FEATURE_SCHEMA)


_SQL_MEDIA = """
SELECT doc_id AS media_id,
       'text' AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5
FROM documents
"""


@register("multimodal_binary_metadata", oracle=_SQL_MEDIA)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing check: byte length + digest of the payload."""
    m = documents_as_media(spark, sf_dir)
    return m.select(
        "media_id",
        "media_type",
        "n_bytes",
        F.md5(F.col("payload")).alias("payload_md5"),
    )
