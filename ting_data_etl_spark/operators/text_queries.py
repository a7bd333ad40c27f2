"""Text-analysis queries over ``documents`` (SURVEY.md §7.4 extension).

Language-ID (stopword votes), quality scoring (length/punct/stopword
bands), token counting, and fingerprinting — the cheap pre-filters of a
pretraining data pipeline. All JVM-side expressions from
:mod:`ting_data_etl_spark.functions.text`; oracle twins reproduce the exact
arithmetic in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ting_data_etl_spark.functions.text import (
    STOPWORDS,
    lang_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)
from ting_data_etl_spark.registry import register
from ting_data_etl_spark.sources.tables import load_table

_SQL_TOKS = """
tok AS (
  SELECT doc_id, lang, source, n_chars, text,
         list_filter(
           regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                                 '[^\\p{L}\\p{N}]+'),
           t -> t <> '') AS toks
  FROM documents
)
"""


def _sql_list(words: list[str]) -> str:
    inner = ", ".join(f"'{w}'" for w in words)
    return f"[{inner}]"


def _sql_hits(lang: str) -> str:
    return (
        f"len(list_filter(toks, t -> list_contains({_sql_list(STOPWORDS[lang])}, t)))"
    )


# --- token counts ----------------------------------------------------------
_SQL_TOKEN_COUNT = f"""
WITH {_SQL_TOKS}
SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens, n_chars
FROM tok
"""


@register("text_token_count", oracle=_SQL_TOKEN_COUNT)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", token_count("text").alias("n_tokens"), "n_chars")


# --- quality score ---------------------------------------------------------
_SQL_QUALITY = f"""
WITH {_SQL_TOKS},
m AS (
  SELECT doc_id,
         length(text) AS n,
         length(text) - length(regexp_replace(text, '[^\\p{{L}}\\p{{N}}\\s]', '', 'g'))
           AS n_punct,
         len(toks) AS n_toks,
         {_sql_hits("en")} AS en_hits
  FROM tok
)
SELECT doc_id,
       (
         (CASE WHEN n BETWEEN 50 AND 2000 THEN 1.0 ELSE 0.0 END) +
         (CASE WHEN (CASE WHEN n > 0 THEN CAST(n_punct AS DOUBLE) / n ELSE 0.0 END) <= 0.2
               THEN 1.0 ELSE 0.0 END) +
         (CASE WHEN (CASE WHEN n_toks > 0 THEN CAST(en_hits AS DOUBLE) / n_toks ELSE 0.0 END) >= 0.05
               THEN 1.0 ELSE 0.0 END)
       ) / 3.0 AS quality
FROM m
"""


@register("text_quality_score", oracle=_SQL_QUALITY)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score("text").alias("quality"))


# --- language ID -----------------------------------------------------------
def _sql_langid() -> str:
    langs = sorted(STOPWORDS)
    hits = {lang: _sql_hits(lang) for lang in langs}
    greatest = "greatest(" + ", ".join(f"h_{lang}" for lang in langs) + ")"
    # smallest lang code among those achieving max hits
    first_match = "CASE " + " ".join(
        f"WHEN h_{lang} = mx THEN '{lang}'" for lang in langs
    ) + " END"
    hit_cols = ", ".join(f"{hits[lang]} AS h_{lang}" for lang in langs)
    return f"""
WITH {_SQL_TOKS},
h AS (SELECT doc_id, lang, {hit_cols} FROM tok),
m AS (SELECT *, {greatest} AS mx FROM h)
SELECT doc_id, lang AS lang_actual,
       CASE WHEN mx > 0 THEN {first_match} ELSE 'und' END AS lang_pred
FROM m
"""


@register("text_lang_id", oracle=_sql_langid())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        lang_id("text").alias("lang_pred"),
    )


# --- per-source corpus profile (composite rollup) --------------------------
_SQL_PROFILE = f"""
WITH {_SQL_TOKS},
m AS (
  SELECT source,
         len(toks) AS n_toks,
         length(text) AS n,
         length(text) - length(regexp_replace(text, '[^\\p{{L}}\\p{{N}}\\s]', '', 'g'))
           AS n_punct
  FROM tok
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       CAST(SUM(n) AS BIGINT) AS total_chars,
       CAST(CAST(SUM(n_punct) AS BIGINT) AS DOUBLE) / CAST(SUM(n) AS BIGINT)
         AS punct_ratio
FROM m GROUP BY source
"""


@register("text_corpus_profile", oracle=_SQL_PROFILE)
def text_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus statistics — the rollup a curation dashboard reads."""
    d = load_table(spark, sf_dir, "documents")
    n = F.length("text")
    n_punct = n - F.length(F.regexp_replace(F.col("text"), r"[^\p{L}\p{N}\s]", ""))
    m = d.select(
        "source",
        token_count("text").alias("n_toks"),
        n.alias("n"),
        n_punct.alias("n_punct"),
    )
    return m.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").alias("total_tokens"),
        F.sum("n").alias("total_chars"),
        (F.sum("n_punct").cast("double") / F.sum("n")).alias("punct_ratio"),
    )
