"""Tests for the JSONL round-trip source and small-file compaction."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


class TestJsonl:
    def test_shard_count_and_schema(self, spark, sf_dir):
        from ting_data_etl_spark.sources.jsonl import (
            JSONL_SHARDS,
            read_jsonl,
            stage_documents_jsonl,
        )
        from ting_data_etl_spark.sources.tables import load_table

        staged = stage_documents_jsonl(spark, sf_dir)
        shards = [f for f in os.listdir(staged) if f.startswith("part-")]
        assert len(shards) == JSONL_SHARDS
        schema = load_table(spark, sf_dir, "documents").schema
        back = read_jsonl(spark, staged, schema)
        assert back.schema == schema

    def test_roundtrip_detects_loss(self, spark, sf_dir):
        """Dropping one shard must change the checksum profile."""
        from ting_data_etl_spark.sources.jsonl import (
            _content_hash,
            read_jsonl,
            stage_documents_jsonl,
        )
        from ting_data_etl_spark.sources.tables import load_table

        staged = stage_documents_jsonl(spark, sf_dir)
        schema = load_table(spark, sf_dir, "documents").schema

        def profile(df):
            return {
                r.source: r.cs
                for r in df.groupBy("source")
                .agg(F.sum(_content_hash(F.col("text"))).alias("cs"))
                .collect()
            }

        full = profile(read_jsonl(spark, staged, schema))
        shards = sorted(
            os.path.join(staged, f)
            for f in os.listdir(staged)
            if f.startswith("part-")
        )
        partial = profile(spark.read.schema(schema).json(shards[:-1]))
        assert full != partial


class TestTextShards:
    def test_adversarial_text_roundtrips_losslessly(self, spark, tmp_path):
        """Newlines, tabs, backslashes, NULL and empty text must all
        survive the line-framed gzip shard format byte-for-byte
        (ADVICE r06: unescaped \\n split records, NULL dropped the tab)."""
        from ting_data_etl_spark.sources.textfile import (
            read_text_shards,
            write_text_shards,
        )

        rows = [
            (1, "plain text"),
            (2, "embedded\nnewline and\r\ncrlf"),
            (3, "tab\there and trailing tab\t"),
            (4, "back\\slash and \\n literal and \\\\ double"),
            (5, None),
            (6, ""),
            (7, "\\N"),  # literal two-char string, must NOT decode to NULL
            (8, "\n\t\\\r mixed \\t\\n edge"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = str(tmp_path / "shards")
        write_text_shards(df, out, shards=2)
        back = {
            r.doc_id: r.text for r in read_text_shards(spark, out).collect()
        }
        assert back == dict(rows)


class TestCompaction:
    def test_file_count_reduced_content_preserved(self, spark, sf_dir):
        from ting_data_etl_spark.operators.maintenance import (
            _STAGED,
            COMPACT_TARGET_FILES,
            FRAGMENT_FILES,
            _parquet_files,
            compact_small_files,
        )

        report = compact_small_files(spark, sf_dir).first()
        frag, compacted = _STAGED[sf_dir]
        assert len(_parquet_files(frag)) == FRAGMENT_FILES
        assert len(_parquet_files(compacted)) <= COMPACT_TARGET_FILES
        assert report.files_after <= COMPACT_TARGET_FILES
        # content preserved vs the original table
        from ting_data_etl_spark.operators.maintenance import _content_hash
        from ting_data_etl_spark.sources.tables import load_table

        want = (
            load_table(spark, sf_dir, "documents")
            .agg(
                F.count("*").alias("n"),
                F.sum(_content_hash(F.col("text"))).alias("cs"),
            )
            .first()
        )
        assert (report.n_rows, report.content_checksum) == (want.n, want.cs)
