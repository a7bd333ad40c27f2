"""Canonical cleaning/coercion expressions.

The reference re-defines ``_to_number`` / ``_fmt_pct`` locally in each of its
six analytics branches with slight drift (reference ``aggregate_by_store.py``
112-119 vs 242-246 — the 23-2 copy does not strip ``%``). Per SURVEY.md §2.11
this module centralizes ONE canonical version of each; the drift is documented
here rather than reproduced.

All functions are Column-in / Column-out built on ``pyspark.sql.functions``
only — they stay inside whole-stage codegen, never a Python UDF (the reference
applied ``_fmt_pct`` via ``Series.apply``; D3 in SURVEY.md §2.5 replaces that
with builtins).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Textual null sentinels the reference maps to NA
#: (reference ``aggregate_by_store.py:118, 245, 653-661``).
NULL_SENTINELS = ["", "nan", "NaN", "NULL", "None"]


def clean_nulls(col: Column | str) -> Column:
    """Map textual null sentinels (after trim) to real NULLs.

    Mirrors reference ``aggregate_by_store.py:653-661`` (``["", "nan", "NaN",
    "NULL", "None"] -> NA``).
    """
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    return F.when(c.isin(*NULL_SENTINELS), F.lit(None).cast("string")).otherwise(c)


def to_number(col: Column | str) -> Column:
    """String → nullable double, forgiving like ``pd.to_numeric(errors="coerce")``.

    Trim whitespace, strip thousands separators ``,`` and ``%``, map null
    sentinels to NULL, then cast — Spark's cast of a non-numeric string yields
    NULL, exactly matching coerce semantics. Mirrors reference
    ``aggregate_by_store.py:112-119``.
    """
    c = clean_nulls(col)
    c = F.regexp_replace(c, "[,%]", "")
    return c.try_cast("double")  # try_cast: malformed → NULL under ANSI mode


def parse_month(col: Column | str) -> Column:
    """Messy month string → nullable int clamped to 1-12.

    Accepts ``"1"``, ``"01"``, ``"202501"``, ``"2025-01"``, ``"2025/01"``:
    strip non-digits, take the last 2 digits when ≥6 digits remain (YYYYMM),
    cast to int, NULL outside 1-12. Mirrors reference
    ``aggregate_by_store.py:126-133, 436-446``.
    """
    c = F.col(col) if isinstance(col, str) else col
    digits = F.regexp_replace(F.trim(c), "[^0-9]", "")
    mm = F.when(F.length(digits) >= 6, F.substring(digits, -2, 2)).otherwise(digits)
    m = mm.try_cast("int")  # '' / overlong → NULL, not an ANSI error
    return F.when(m.between(1, 12), m)


def guarded_ratio(numerator: Column, denominator: Column) -> Column:
    """``num / denom`` with NULL (not error, not inf) when denom is 0 or NULL.

    The reference's ``.where(prev != 0)`` guard on YoY and rate divisions
    (``aggregate_by_store.py:168-172, 204-206``). NULL propagates into the
    formatted output as ``""`` via :func:`fmt_pct`.
    """
    return F.when(denominator.isNotNull() & (denominator != 0), numerator / denominator)


def yoy_ratio(current: Column, previous: Column) -> Column:
    """Year-over-year growth ``(cur - prev) / prev``, NULL when prev is 0/NULL.

    Mirrors reference ``aggregate_by_store.py:168-172``.
    """
    return guarded_ratio(current - previous, previous)


def fmt_pct(col: Column, decimals: int = 2) -> Column:
    """Ratio → ``"12.34%"`` string; NULL → ``""``.

    Replaces the reference's row-wise ``_fmt_pct`` ``Series.apply`` UDF
    (``aggregate_by_store.py:209-215``, ``f"{x*100:.2f}%"``) with pure
    builtins — stays in whole-stage codegen.

    The rounding is made EXPLICIT half-up (away from zero) on a scaled
    integer — ``sign · floor(|ratio·100|·10^d + 0.5)`` — before formatting,
    and the DuckDB oracle applies the identical arithmetic: ``floor``/
    ``abs`` are exact IEEE ops in both engines, and formatting ``k/10^d``
    with ``%.df`` is tie-free (the nearest double to a d-decimal value is
    never a formatting tie), so engine printf tie-mode differences (Java
    HALF_UP vs C half-even) can never surface. The only divergence from the
    reference's f-string is dyadic exact ties, where Python rounds half-even
    and this rounds half-up.
    """
    scale = float(10**decimals)
    snapped = (
        F.signum(col) * F.floor(F.abs(col * 100) * scale + F.lit(0.5)) / scale
    )
    pct = F.format_string(f"%.{decimals}f", snapped)
    return F.when(col.isNotNull(), F.concat(pct, F.lit("%"))).otherwise(F.lit(""))


def ensure_col(columns: list[str], candidates: list[str]) -> str:
    """Resolve a column by candidate list, then case-insensitive fallback.

    Driver-side alias resolution over ``df.columns`` (pure Python — runs before
    the plan is built, zero runtime cost). Mirrors reference
    ``aggregate_by_store.py:452-464`` (``_ensure_month_col``) and ``530-550``
    (``_ensure_store_name_col``): exact match on stripped names first, then
    case-insensitive, else KeyError. FIRST match wins on colliding headers
    (e.g. ``' month'`` and ``'month '`` both strip to ``'month'``) — the
    reference scans its column list left to right, and a dict comprehension
    would silently keep the LAST collider instead.
    """
    stripped: dict[str, str] = {}
    lowered: dict[str, str] = {}
    for c in columns:
        stripped.setdefault(c.strip(), c)
        lowered.setdefault(c.strip().lower(), c)
    for cand in candidates:
        if cand in stripped:
            return stripped[cand]
    for cand in candidates:
        if cand.lower() in lowered:
            return lowered[cand.lower()]
    raise KeyError(f"none of {candidates!r} found in columns {columns!r}")


def sum_exact(col: Column | str, scale: int = 2) -> Column:
    """Order-independent SUM over float data via fixed-point accumulation.

    Float summation is not associative, so a plain ``SUM(double)`` can differ
    between runs (and engines) in the last ULP depending on partition/merge
    order. Rounding each value to ``scale`` decimals, scaling to an integer,
    summing exactly as BIGINT, and dividing once at the end makes the result
    deterministic under any shuffle order — essential both for the DuckDB
    oracle comparison and for reproducible results on a real cluster.

    Overflow headroom: at scale=2 the BIGINT accumulator holds ~9.2e16 units
    of currency — for datasets where that is tight, switch the accumulator to
    ``decimal(38, scale)`` (Spark sums decimals exactly too; only the final
    decimal→double conversion is engine-specific, which is why BIGINT is the
    oracle-checked default).

    Oracle-SQL twin: ``CAST(SUM(CAST(ROUND(v * 100) AS BIGINT)) AS BIGINT) / 100.0``.
    """
    c = F.col(col) if isinstance(col, str) else col
    factor = 10**scale
    return F.sum(F.round(c * factor).cast("long")) / F.lit(float(factor))
