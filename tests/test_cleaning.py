"""Unit tests for the canonical cleaning expressions.

Inputs mirror the reference's exact sentinel/format lists:
``aggregate_by_store.py:112-119`` (``_to_number``), ``436-446``
(``_parse_month``), ``209-215`` (``_fmt_pct``), ``452-464`` / ``530-550``
(column alias resolution).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ting_data_etl_spark.functions.cleaning import (
    clean_nulls,
    ensure_col,
    fmt_pct,
    guarded_ratio,
    parse_month,
    sum_exact,
    to_number,
    yoy_ratio,
)


def _eval(spark, col, rows: list[tuple]):
    """Evaluate a Column over single-column string rows; return python list."""
    df = spark.createDataFrame(rows, "v string")
    return [r.out for r in df.select(col.alias("out")).collect()]


class TestToNumber:
    # (input, expected) — the reference's documented formats:
    # "12,345", " 123 ", "1,234.0", "45%" (aggregate_by_store.py:107)
    CASES = [
        ("12,345", 12345.0),
        (" 123 ", 123.0),
        ("1,234.0", 1234.0),
        ("45%", 45.0),
        ("", None),
        ("nan", None),
        ("NaN", None),
        ("NULL", None),
        ("None", None),
        ("abc", None),  # errors="coerce"
        ("-1.5", -1.5),
        ("1,2,3", 123.0),  # every comma stripped, like str.replace
        (None, None),
    ]

    def test_reference_formats(self, spark):
        got = _eval(spark, to_number(F.col("v")), [(c[0],) for c in self.CASES])
        assert got == [c[1] for c in self.CASES]


class TestParseMonth:
    # Reference-documented formats: "01", "1", "202501", "2025-01",
    # "2025/01", "2025-1" (aggregate_by_store.py:437)
    CASES = [
        ("01", 1),
        ("1", 1),
        ("202501", 1),
        ("2025-01", 1),
        ("2025/01", 1),
        ("2025-1", None),  # digits "20251" (len 5 < 6) -> 20251 -> out of 1..12
        ("12", 12),
        ("13", None),
        ("0", None),
        ("202512", 12),
        ("202500", None),
        ("", None),
        ("abc", None),
        (None, None),
    ]

    def test_reference_formats(self, spark):
        got = _eval(spark, parse_month(F.col("v")), [(c[0],) for c in self.CASES])
        assert got == [c[1] for c in self.CASES]

    def test_matches_pandas_reference_semantics(self, spark):
        """Cross-check against the reference's own pandas implementation."""
        import pandas as pd

        def ref_parse(vals):  # aggregate_by_store.py:436-446, re-expressed
            s = pd.Series(vals, dtype=str).str.strip()
            digits = s.str.replace(r"[^0-9]", "", regex=True)
            m = digits.where(digits.str.len() < 6, digits.str[-2:])
            m_num = pd.to_numeric(m, errors="coerce")
            return m_num.where(m_num.between(1, 12)).astype("Int64")

        vals = [c[0] for c in self.CASES if c[0] is not None]
        expected = [None if pd.isna(x) else int(x) for x in ref_parse(vals)]
        got = _eval(spark, parse_month(F.col("v")), [(v,) for v in vals])
        assert got == expected


class TestCleanNulls:
    def test_sentinels(self, spark):
        cases = ["", "nan", "NaN", "NULL", "None", "  nan  ", "x", " x "]
        got = _eval(spark, clean_nulls(F.col("v")), [(v,) for v in cases])
        assert got == [None, None, None, None, None, None, "x", "x"]


class TestFmtPct:
    def test_matches_reference_fstring(self, spark):
        # reference: f"{x * 100:.2f}%", NA -> "" (aggregate_by_store.py:209-215)
        vals = [0.123456, 0.5, 1.0, -0.03337, 0.0, 12.3456, None]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        got = [r.out for r in df.select(fmt_pct(F.col("v")).alias("out")).collect()]
        expected = ["" if v is None else f"{v * 100:.2f}%" for v in vals]
        assert got == expected


class TestGuardedRatios:
    def test_zero_and_null_denominators(self, spark):
        df = spark.createDataFrame(
            [(10.0, 2.0), (10.0, 0.0), (10.0, None), (None, 2.0)], "num double, den double"
        )
        got = [
            (r.r, r.y)
            for r in df.select(
                guarded_ratio(F.col("num"), F.col("den")).alias("r"),
                yoy_ratio(F.col("num"), F.col("den")).alias("y"),
            ).collect()
        ]
        assert got[0] == (5.0, 4.0)
        assert got[1] == (None, None)  # zero denom -> NULL, not inf/error
        assert got[2] == (None, None)
        assert got[3][0] is None  # NULL numerator propagates


class TestEnsureCol:
    def test_exact_match_wins(self):
        assert ensure_col(["月份", "x"], ["月份", "月"]) == "月份"

    def test_candidate_order(self):
        # first candidate present in the frame wins (reference scans the
        # candidate list in order, aggregate_by_store.py:452-460)
        assert ensure_col(["月", "month"], ["月份", "月", "month"]) == "月"

    def test_stripped_header_names(self):
        # reference strips header whitespace wholesale (":468, 477")
        assert ensure_col(["門市名稱 ", "x"], ["門市名稱"]) == "門市名稱 "

    def test_case_insensitive_fallback(self):
        assert ensure_col(["MONTH", "x"], ["month"]) == "MONTH"

    def test_keyerror_when_absent(self):
        with pytest.raises(KeyError):
            ensure_col(["a", "b"], ["月份", "month"])

    def test_first_match_wins_on_colliding_headers(self):
        # ' month' and 'month ' both strip to 'month'; the reference scans
        # left to right, so the FIRST collider must win (a dict
        # comprehension silently kept the last)
        assert ensure_col([" month", "month "], ["month"]) == " month"
        assert ensure_col(["Month", "MONTH"], ["month"]) == "Month"


class TestSumExact:
    def test_exact_and_order_independent(self, spark):
        # 0.1+0.2 style float traps: fixed-point accumulation is exact
        vals = [0.1, 0.2, 0.3, 1000000.01, -0.61]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        (got,) = df.select(sum_exact("v").alias("s")).collect()[0]
        assert got == 1000000.0  # exactly, no 1e-12 residue
        # shuffled partitioning must give the identical bits
        df8 = spark.createDataFrame([(v,) for v in vals], "v double").repartition(8)
        (got8,) = df8.select(sum_exact("v").alias("s")).collect()[0]
        assert math.isclose(got, got8, rel_tol=0) and got == got8
