"""PII scan / redaction over the documents table.

A training-data pipeline has to find and strip emails, IP addresses, and
phone-number-like digit runs before a corpus ships. Both queries are pure
JVM regex expressions (one codegen scan, no shuffle until the final
aggregate/projection) — the 100 TB shape is "one pass over text, emit
narrow rows".

Pattern parity: the patterns below use only the regex subset with identical
semantics in Java regex (Spark) and RE2 (DuckDB) — character classes,
non-capturing groups, bounded repetition, ASCII word boundaries. No
backrefs, no lookaround.

The synthetic ``documents`` corpus is PII-free word salad, so each query
first AUGMENTS the text with deterministic planted PII (derived from
``doc_id``, identically in both engines) — the same injected-fixture
pattern the multimodal suite uses for absent decoders: the operator surface
(scan, count, redact, fingerprint) is fully real and value-checked; only
the PII instances are planted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ting_data_etl_spark.registry import register
from ting_data_etl_spark.sources.tables import load_table

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\b\d{10,15}\b"

#: planted-PII density knobs (doc_id moduli)
_EMAIL_MOD = 7
_IPV4_MOD = 11
_PHONE_MOD = 13


def _augmented_spark(d: DataFrame) -> F.Column:
    """Planted-PII augmented text, BOUND to *d*'s columns (the expression
    resolves against the passed frame, not whatever frame it is later
    selected on — an aliased or renamed documents frame stays correct)."""
    doc = d["doc_id"]
    email = F.when(
        doc % _EMAIL_MOD == 0,
        F.concat(
            F.lit(" contact user"), doc.cast("string"), F.lit("@example.com now")
        ),
    ).otherwise(F.lit(""))
    ipv4 = F.when(
        doc % _IPV4_MOD == 0,
        F.concat(
            F.lit(" from 10."),
            (doc % 200).cast("string"),
            F.lit(".0."),
            (doc % 250).cast("string"),
            F.lit(" logged"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        doc % _PHONE_MOD == 0,
        F.concat(
            F.lit(" tel "), (F.lit(5_550_000_000) + doc % 999_999).cast("string")
        ),
    ).otherwise(F.lit(""))
    return F.concat(d["text"], email, ipv4, phone)


_SQL_AUG = f"""
aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % {_EMAIL_MOD} = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
                 ELSE '' END
         || CASE WHEN doc_id % {_IPV4_MOD} = 0
                 THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.'
                      || CAST(doc_id % 250 AS VARCHAR) || ' logged'
                 ELSE '' END
         || CASE WHEN doc_id % {_PHONE_MOD} = 0
                 THEN ' tel ' || CAST(5550000000 + doc_id % 999999 AS VARCHAR)
                 ELSE '' END AS t
  FROM documents
)
"""

_SQL_PII_SCAN = f"""
WITH {_SQL_AUG},
counts AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS BIGINT) AS n_email,
         CAST(len(regexp_extract_all(t, '{IPV4_RE}')) AS BIGINT) AS n_ipv4,
         CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS BIGINT) AS n_phone
  FROM aug
)
SELECT doc_id, n_email, n_ipv4, n_phone
FROM counts
WHERE n_email + n_ipv4 + n_phone > 0
"""


@register("text_pii_scan", oracle=_SQL_PII_SCAN)
def text_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII hit counts (emails / IPv4s / phone digit runs).

    One codegen scan: three ``regexp_count`` expressions per row, narrow
    (doc_id, 3 counts) output filtered to documents with any hit — at
    corpus scale the output is the incident list, not the corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    t = _augmented_spark(d)
    counts = d.select(
        "doc_id",
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_email"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("long").alias("n_ipv4"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("long").alias("n_phone"),
    )
    return counts.filter(
        (F.col("n_email") + F.col("n_ipv4") + F.col("n_phone")) > 0
    )


_SQL_PII_REDACT = f"""
WITH {_SQL_AUG},
red AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
             '{IPV4_RE}', '<IP>', 'g'),
           '{PHONE_RE}', '<PHONE>', 'g') AS r,
         t
  FROM aug
)
SELECT doc_id,
       md5(r) AS redacted_md5,
       CAST(len(t) - len(r) AS BIGINT) AS chars_removed
FROM red
WHERE r <> t
"""


@register("text_pii_redact", oracle=_SQL_PII_REDACT)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact PII with typed placeholders; emit fingerprint + delta rows.

    Email → IP → phone replacement order is fixed (and mirrored in the
    oracle) because the patterns can overlap on digit runs. Output carries
    the md5 of the redacted text rather than the text itself — the
    value-level oracle checks every byte of the redaction without hauling
    document bodies through the comparison.
    """
    d = load_table(spark, sf_dir, "documents")
    t = _augmented_spark(d)
    r = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ),
        PHONE_RE,
        "<PHONE>",
    )
    out = d.select(
        "doc_id",
        F.md5(r).alias("redacted_md5"),
        (F.length(t) - F.length(r)).cast("long").alias("chars_removed"),
        (r != t).alias("__changed"),
    )
    return out.filter(F.col("__changed")).drop("__changed")
