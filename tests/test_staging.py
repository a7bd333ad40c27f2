"""Tests for the staged-artifact layer: fingerprints and invalidation.

The materialized views (component labels, pair relation, IVF model, daily
rollup) are durable /tmp artifacts; serving a stale one is the round-4
failure class. These tests pin the two invalidation triggers: source
(mtime, size) changes and candidate-generation constant changes.
"""

from __future__ import annotations

import os
import shutil

import ting_data_etl_spark.operators.dedup as dd


class TestStageVersionToken:
    def test_constant_change_rotates_token(self, monkeypatch):
        before = dd._stage_version_token()
        monkeypatch.setattr(dd, "BAND_FREQUENCY_CAP", 7)
        assert dd._stage_version_token() != before

    def test_simhash_width_in_token(self, monkeypatch):
        before = dd._stage_version_token()
        monkeypatch.setattr(dd, "SIMHASH_BITS", 60)
        assert dd._stage_version_token() != before

    def test_srp_constants_in_token(self, monkeypatch):
        from ting_data_etl_spark.operators import similarity as S

        before = dd._stage_version_token()
        monkeypatch.setattr(S, "SRP_BITS", 9)
        assert dd._stage_version_token() != before


class TestStagedPairsInvalidation:
    def _mini_corpus(self, tmp_path, sf_dir):
        dst = tmp_path / "corpus"
        dst.mkdir()
        shutil.copy(
            os.path.join(sf_dir, "documents.parquet"),
            dst / "documents.parquet",
        )
        return str(dst)

    def test_reuse_then_rebuild_on_source_change(
        self, spark, sf_dir, tmp_path, monkeypatch
    ):
        corpus = self._mini_corpus(tmp_path, sf_dir)
        monkeypatch.setattr(dd, "_STAGED_PAIRS", {})
        dd.staged_minhash_pairs(spark, corpus)
        first = dd._STAGED_PAIRS[corpus]
        # same source -> same stage path (write-once reuse)
        monkeypatch.setattr(dd, "_STAGED_PAIRS", {})
        dd.staged_minhash_pairs(spark, corpus)
        assert dd._STAGED_PAIRS[corpus] == first
        # regenerated source (different mtime) -> fresh stage path
        src = os.path.join(corpus, "documents.parquet")
        os.utime(src, (os.path.getmtime(src) + 7, os.path.getmtime(src) + 7))
        monkeypatch.setattr(dd, "_STAGED_PAIRS", {})
        dd.staged_minhash_pairs(spark, corpus)
        assert dd._STAGED_PAIRS[corpus] != first

    def test_constant_change_rebuilds(self, spark, sf_dir, tmp_path, monkeypatch):
        corpus = self._mini_corpus(tmp_path, sf_dir)
        monkeypatch.setattr(dd, "_STAGED_PAIRS", {})
        dd.staged_minhash_pairs(spark, corpus)
        first = dd._STAGED_PAIRS[corpus]
        monkeypatch.setattr(dd, "BAND_FREQUENCY_CAP", 7)
        monkeypatch.setattr(dd, "_STAGED_PAIRS", {})
        dd.staged_minhash_pairs(spark, corpus)
        assert dd._STAGED_PAIRS[corpus] != first
