"""DuckDB-SQL fragment builders mirroring the engine's Column expressions.

Each function here is the SQL twin of a function in
:mod:`ting_data_etl_spark.functions.cleaning` — kept side by side so the
Spark expression and its oracle stay aligned token for token. Cross-engine
determinism rules (see ``cleaning.sum_exact``): float SUMs go through
integer fixed-point accumulation; scalar double arithmetic on identical
inputs is IEEE-deterministic in both engines.
"""

from __future__ import annotations

from ting_data_etl_spark.functions.cleaning import NULL_SENTINELS
from ting_data_etl_spark.functions.text import MERSENNE_31, WS_CHARS

#: DERIVED from the engine's sentinel list — a new sentinel added to
#: cleaning.NULL_SENTINELS moves every oracle with it, no hand sync.
NULL_SENTINELS_SQL = "(" + ", ".join(f"'{s}'" for s in NULL_SENTINELS) + ")"


def sql_clean_nulls(expr: str) -> str:
    """Twin of ``cleaning.clean_nulls``."""
    return (
        f"CASE WHEN trim({expr}) IN {NULL_SENTINELS_SQL} THEN NULL "
        f"ELSE trim({expr}) END"
    )


def sql_to_number(expr: str) -> str:
    """Twin of ``cleaning.to_number``."""
    return (
        f"TRY_CAST(regexp_replace({sql_clean_nulls(expr)}, '[,%]', '', 'g') "
        f"AS DOUBLE)"
    )


def sql_parse_month(expr: str) -> str:
    """Twin of ``cleaning.parse_month``."""
    digits = f"regexp_replace(trim({expr}), '[^0-9]', '', 'g')"
    mm = (
        f"TRY_CAST(CASE WHEN length({digits}) >= 6 THEN right({digits}, 2) "
        f"ELSE {digits} END AS INTEGER)"
    )
    return f"CASE WHEN {mm} BETWEEN 1 AND 12 THEN {mm} END"


def sql_sum_exact(expr: str, scale: int = 2) -> str:
    """Twin of ``cleaning.sum_exact`` (fixed-point exact sum → double)."""
    factor = 10**scale
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {factor}) AS BIGINT)) AS BIGINT) "
        f"/ {float(factor)}"
    )


def sql_guarded_ratio(num: str, den: str) -> str:
    """Twin of ``cleaning.guarded_ratio``."""
    return (
        f"CASE WHEN ({den}) IS NOT NULL AND ({den}) <> 0 "
        f"THEN ({num}) / ({den}) END"
    )


def sql_yoy(cur: str, prev: str) -> str:
    """Twin of ``cleaning.yoy_ratio``."""
    return sql_guarded_ratio(f"({cur}) - ({prev})", prev)

def sql_normalize_text(col: str = "text") -> str:
    """Twin of ``functions.text.normalize_text``.

    The whitespace class is the shared explicit ``WS_CHARS`` — RE2's
    ``\\s`` omits vertical tab where Java's includes it, so ``\\s`` in
    either engine's pattern would silently diverge fingerprints on
    VT-bearing documents.
    """
    return f"trim(regexp_replace(lower({col}), '[{WS_CHARS}]+', ' ', 'g'))"


def sql_shingle_hash(expr: str) -> str:
    """Twin of ``functions.text.portable_hash31`` (the shingle hash)."""
    return f"(CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT) % {MERSENNE_31})"


def sql_content_hash(expr: str) -> str:
    """Twin of ``functions.text.content_hash`` (folded checksum hash)."""
    return f"(CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT) % 1000000000)"


#: DuckDB twin of ``functions.text.tokens`` — THE tokenizer SQL. Every
#: oracle that counts or lists tokens interpolates this one expression;
#: before round 7 it existed as 8 verbatim copies across four modules,
#: where a tokenizer change could silently miss one.
SQL_TOKEN_LIST = f"""list_filter(
           regexp_split_to_array({sql_normalize_text()},
                                 '[^\\p{{L}}\\p{{N}}]+'),
           t -> t <> '')"""
