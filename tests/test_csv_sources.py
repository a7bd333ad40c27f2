"""Fuzz the header-scanning CSV reader against a pure-Python reference parse.

The generator half of the reference's property-testing strategy (SURVEY §5.3):
seeded messy corpora (meta rows, alias headers, sentinels, ragged rows,
quoted commas, keyless files) are read by the distributed S3 reader and
compared cell-for-cell with ``csv.reader``'s view of the same file.
"""

from __future__ import annotations

import csv
import os
import shutil
import tempfile

import pytest

from ting_data_etl_spark.functions.cleaning import ensure_col
from ting_data_etl_spark.sources.csv import filter_valid_keys, read_messy_csv
from ting_data_etl_spark.sources.csv_gen import (
    MONTH_ALIASES,
    NAME_ALIASES,
    generate_messy_csvs,
)

KEY = "store_id"


@pytest.fixture(scope="module")
def corpus():
    out = os.path.join(tempfile.gettempdir(), "ting_csv_fuzz")
    shutil.rmtree(out, ignore_errors=True)
    return generate_messy_csvs(out, n_files=8, seed=7, keyless_every=4)


def _python_reference_parse(path: str, key_col: str):
    """The reference algorithm (fan_out_by_storeid.py:16-30): scan to the
    header row containing the key column; everything after = data rows."""
    with open(path, newline="", encoding="utf-8") as f:
        rows = list(csv.reader(f))
    for i, row in enumerate(rows):
        if any(c.strip() == key_col for c in row):
            return row, rows[i + 1 :]
    return None, []


class TestMessyReaderFuzz:
    def test_matches_python_reference_on_every_file(self, spark, corpus):
        for path in corpus:
            header, data = _python_reference_parse(path, KEY)
            res = read_messy_csv(spark, path, key_col=KEY)
            if header is None:
                assert res.skipped and res.df.count() == 0
                continue
            assert res.skipped is False
            # header = stripped cells, deduplicated with _N suffixes
            seen: dict[str, int] = {}
            expect_header = []
            for c in (c.strip() for c in header):
                n = seen.get(c, 0)
                seen[c] = n + 1
                expect_header.append(c if n == 0 else f"{c}_{n + 1}")
            assert res.header == expect_header
            got = res.df.collect()
            assert len(got) == len(data)
            # cell-level compare on the key column and first data column
            key_idx = [c.strip() for c in header].index(KEY)
            expect_keys = sorted(
                (r[key_idx] if key_idx < len(r) else None) or "" for r in data
            )
            got_keys = sorted(r[res.header[key_idx]] or "" for r in got)
            assert got_keys == expect_keys

    def test_meta_rows_preserved_as_sidecar(self, spark, corpus):
        for path in corpus:
            header, _ = _python_reference_parse(path, KEY)
            if header is None:
                continue
            res = read_messy_csv(spark, path, key_col=KEY)
            with open(path, newline="", encoding="utf-8") as f:
                raw_rows = list(csv.reader(f))
            n_meta = raw_rows.index(header)
            assert res.meta_rows == raw_rows[:n_meta]

    def test_blank_key_guard(self, spark, corpus):
        for path in corpus:
            res = read_messy_csv(spark, path, key_col=KEY)
            if res.skipped:
                continue
            kept = filter_valid_keys(res.df, KEY)
            assert kept.filter(
                (res.df[KEY].isNull()) | (res.df[KEY] == "")
            ).count() == 0

    def test_ensure_col_resolves_generated_aliases(self, spark, corpus):
        for path in corpus:
            res = read_messy_csv(spark, path, key_col=KEY)
            if res.skipped:
                continue
            if any(c.strip() in MONTH_ALIASES for c in res.header):
                assert ensure_col(res.header, ["月份", *MONTH_ALIASES])
            if any(c.strip() in [a.strip() for a in NAME_ALIASES] for c in res.header):
                assert ensure_col(res.header, ["門市名稱", *NAME_ALIASES])


class TestLoudFailures:
    def test_rejects_multi_file_path(self, spark):
        with pytest.raises(ValueError, match="single file"):
            read_messy_csv(spark, tempfile.gettempdir(), key_col=KEY)

    def test_rejects_quoted_newline_in_prefix(self, spark):
        path = os.path.join(tempfile.gettempdir(), "ting_bad_prefix.csv")
        with open(path, "w", newline="", encoding="utf-8") as f:
            w = csv.writer(f)
            w.writerow(["meta", "line one\nline two"])  # quoted newline
            w.writerow([KEY, "v"])
            w.writerow(["s1", "1"])
        with pytest.raises(ValueError, match="meta/header prefix"):
            read_messy_csv(spark, path, key_col=KEY)

    def test_rejects_quoted_newline_in_data(self, spark):
        path = os.path.join(tempfile.gettempdir(), "ting_bad_data.csv")
        with open(path, "w", newline="", encoding="utf-8") as f:
            w = csv.writer(f)
            w.writerow([KEY, "v"])
            w.writerow(["s1", "multi\nline cell"])
        with pytest.raises(ValueError, match="multiLine"):
            read_messy_csv(spark, path, key_col=KEY)

    def test_duplicate_headers_deduplicated(self, spark):
        path = os.path.join(tempfile.gettempdir(), "ting_dup_hdr.csv")
        with open(path, "w", newline="", encoding="utf-8") as f:
            f.write(f"{KEY},a,a\ns1,1,2\n")
        res = read_messy_csv(spark, path, key_col=KEY)
        assert res.header == [KEY, "a", "a_2"]
        row = res.df.collect()[0]
        assert (row["a"], row["a_2"]) == ("1", "2")
