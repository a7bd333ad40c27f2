"""Sink tests: per-group single-file CSV (S5) content, order (O1), BOM."""

from __future__ import annotations

import os
import shutil
import tempfile

from ting_data_etl_spark.sinks.single_file import write_per_group_csv


class TestPerGroupSingleFileSink:
    def test_one_sorted_bom_file_per_group(self, spark):
        rows = [
            ("s1", 3, 30.0),
            ("s1", 1, 10.0),
            ("s1", 2, 20.0),
            ("s2", 12, 1.0),
        ]
        df = spark.createDataFrame(rows, "store string, month int, v double")
        out = os.path.join(tempfile.gettempdir(), "ting_sink_tests")
        shutil.rmtree(out, ignore_errors=True)
        receipts = write_per_group_csv(
            df, out, group_col="store", file_name="23-2.csv",
            columns=["month", "v"], sort_by=["month"],
        )
        got = {r.group_key: r.rows_written for r in receipts.collect()}
        assert got == {"s1": 3, "s2": 1}

        # exactly one file, exact name, per group dir (reference contract
        # output/{store}/{analysis_id}.csv, aggregate_by_store.py:225-233)
        assert sorted(os.listdir(out)) == ["s1", "s2"]
        assert os.listdir(os.path.join(out, "s1")) == ["23-2.csv"]

        path = os.path.join(out, "s1", "23-2.csv")
        raw = open(path, "rb").read()
        assert raw.startswith(b"\xef\xbb\xbf")  # utf-8-sig BOM for Excel

        lines = raw.decode("utf-8-sig").strip().splitlines()
        assert lines[0] == "month,v"  # fixed column order (P1)
        months = [int(line.split(",")[0]) for line in lines[1:]]
        assert months == sorted(months)  # O1 pre-output sort


class TestPathSafety:
    def test_traversal_group_key_rejected(self, spark):
        rows = [("../evil", 1, 1.0), ("ok", 2, 2.0)]
        df = spark.createDataFrame(rows, "store string, month int, v double")
        out = os.path.join(tempfile.gettempdir(), "ting_sink_traversal")
        shutil.rmtree(out, ignore_errors=True)
        receipts = write_per_group_csv(
            df, out, group_col="store", file_name="x.csv", columns=["month", "v"]
        )
        try:
            receipts.collect()
            raise AssertionError("expected the traversal key to be rejected")
        except Exception as e:  # PySpark wraps the UDF's ValueError
            assert "safe path component" in str(e)
        # nothing escaped the sink root
        assert not os.path.exists(
            os.path.join(tempfile.gettempdir(), "evil", "x.csv")
        )

    def test_null_doc_id_rejected_by_text_shards(self, spark, tmp_path):
        from ting_data_etl_spark.sources.textfile import write_text_shards

        df = spark.createDataFrame(
            [(None, "orphan text")], "doc_id long, text string"
        )
        try:
            write_text_shards(df, str(tmp_path / "s"), shards=1)
            raise AssertionError("expected NULL doc_id to be rejected")
        except Exception as e:  # Spark wraps raise_error's RuntimeException
            assert "NULL doc_id" in str(e)
