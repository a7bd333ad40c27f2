"""Raw text source/sink round-trip — one document per line, gzip shards.

The third interchange format after JSONL and ORC (SURVEY §2.1 S-series
extended): plain ``.txt.gz`` shards are still the lingua franca of crawl
dumps and tokenizer pipelines. Spark's ``text`` source reads them with
transparent decompression; records are ``doc_id<TAB>text`` lines, split
back with one codegen ``substring_index`` pair.

Scale note: gzip is NOT splittable — a 100 TB estate sizes shard files to
the intended partition granularity (one task per file, the standard crawl
layout) or uses a splittable codec; the shard count here plays that role.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ting_data_etl_spark.registry import register
from ting_data_etl_spark.sources.jsonl import _content_hash
from ting_data_etl_spark.sources.tables import load_table
from ting_data_etl_spark.plans.oracles import sql_content_hash as _sql_ch

TXT_SHARDS = 8


#: NULL-text sentinel. Unambiguous: in ESCAPED text every backslash is
#: followed by one of ``\tnr``, so a whole-field ``\N`` can never be
#: produced by a real document.
_NULL_FIELD = "\\N"


def _escape_text(col) -> F.Column:
    """Make arbitrary text line-safe: ``\\`` ``\\t`` ``\\n`` ``\\r`` escapes.

    Real crawl text contains newlines and tabs; unescaped they corrupt the
    one-doc-per-line framing (line splits yield rows with NULL doc_id) and
    the TAB delimiter. Backslash is escaped FIRST so decoding is
    unambiguous. NULL text becomes the explicit ``\\N`` field so the
    reader's split stays well-defined. All codegen ``replace`` calls.
    """
    e = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    e = F.replace(e, F.lit("\t"), F.lit("\\t"))
    e = F.replace(e, F.lit("\n"), F.lit("\\n"))
    e = F.replace(e, F.lit("\r"), F.lit("\\r"))
    return F.coalesce(e, F.lit(_NULL_FIELD))


def _unescape_text(col) -> F.Column:
    """Exact inverse of :func:`_escape_text`, single logical pass.

    Sequential ``replace`` would mis-decode ``\\\\n`` (escaped backslash
    before a literal ``n``); instead: split on escaped backslashes, decode
    ``\\t``/``\\n``/``\\r`` inside each segment (where every remaining
    backslash IS an escape prefix), re-join with a single backslash.
    split/transform/array_join all stay inside whole-stage codegen.
    """
    decoded = F.array_join(
        F.transform(
            F.split(col, r"\\\\", -1),
            lambda s: F.replace(
                F.replace(
                    F.replace(s, F.lit("\\t"), F.lit("\t")),
                    F.lit("\\n"),
                    F.lit("\n"),
                ),
                F.lit("\\r"),
                F.lit("\r"),
            ),
        ),
        "\\",
    )
    return F.when(col == _NULL_FIELD, F.lit(None).cast("string")).otherwise(
        decoded
    )


def write_text_shards(df: DataFrame, path: str, shards: int = TXT_SHARDS) -> None:
    """Write (doc_id, text) as gzip text shards, one TAB-joined doc/line.

    Text is backslash-escaped (see :func:`_escape_text`) so embedded
    newlines/tabs and NULLs round-trip losslessly through the line format.
    A NULL ``doc_id`` is rejected loudly: ``concat_ws`` would silently skip
    it and emit a line with NO tab, which the reader mis-frames (the text
    round-trips as the id) — and the corruption is undetectable after the
    fact.
    """
    doc_id = F.when(
        F.col("doc_id").isNull(),
        F.raise_error(F.lit("write_text_shards: NULL doc_id cannot be framed")),
    ).otherwise(F.col("doc_id").cast("string"))
    (
        df.select(
            F.concat_ws("\t", doc_id, _escape_text(F.col("text"))).alias("value")
        )
        .repartition(shards)
        .write.mode("overwrite")
        .option("compression", "gzip")
        .text(path)
    )


def read_text_shards(spark: SparkSession, path: str) -> DataFrame:
    """Read the shards back into (doc_id, text) — one split per line."""
    raw = spark.read.text(path)
    field = F.expr("substring(value, instr(value, '\t') + 1)")
    return raw.select(
        F.substring_index("value", "\t", 1).try_cast("long").alias("doc_id"),
        _unescape_text(field).alias("text"),
    )


def stage_documents_text(spark: SparkSession, sf_dir: str) -> str:
    """Stage ``documents`` as gzip text shards, write-once per corpus.

    Uses the repo's ONE staging ritual — :func:`dedup._stage_dir`'s
    collision-free fingerprinted path (recomputed per call, so a testdata
    regeneration lands on a fresh stage; also inside ``purge_stages``'s
    sweep) plus :func:`streaming.windows.publish_staged_dir`'s
    tmp-dir-then-rename publish — instead of a private lossy-munged /tmp
    path with a racy ``mode('overwrite')`` write (two drivers sharing /tmp
    could interleave part files or delete each other's dir mid-read).
    """
    from ting_data_etl_spark.operators.dedup import _source_fp, _stage_dir
    from ting_data_etl_spark.streaming.windows import publish_staged_dir

    out = _stage_dir(sf_dir, ["txt_shards", _source_fp(sf_dir, "documents")])
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        publish_staged_dir(
            out,
            lambda tmp: write_text_shards(
                load_table(spark, sf_dir, "documents").select("doc_id", "text"),
                tmp,
            ),
        )
    return out


_SQL_TXT_PROFILE = f"""
SELECT doc_id % 10 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(SUM({_sql_ch('text')}) AS BIGINT)
         AS content_checksum
FROM documents
GROUP BY 1
"""


@register("text_source_roundtrip", oracle=_SQL_TXT_PROFILE)
def text_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → gzip text shards → read back → bucketed checksums.

    Same order-independent content-checksum contract as the JSONL/ORC
    twins: the oracle computes the profile straight from parquet, so a
    dropped line, a mangled split, or an id/text mismatch anywhere in the
    text writer+reader breaks the value hash. Ten id-buckets keep the
    comparison multi-row without depending on shard assignment.
    """
    back = read_text_shards(spark, stage_documents_text(spark, sf_dir))
    return back.groupBy(F.pmod("doc_id", F.lit(10)).alias("bucket")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("id_sum"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.sum(_content_hash(F.col("text"))).cast("long").alias("content_checksum"),
    )
