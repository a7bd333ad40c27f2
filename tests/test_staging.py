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


class TestAtomicPublish:
    def test_loser_keeps_winners_artifact(self, spark, tmp_path):
        """Two processes racing to publish the same stage: the second
        os.rename fails (target exists), the loser discards its tmp dir and
        serves the winner's complete artifact — never a mixed part set."""
        import os

        from ting_data_etl_spark.operators.dedup import _publish_stage

        out = str(tmp_path / "stage")
        a = spark.range(5).withColumnRenamed("id", "v")
        _publish_stage(a, out)  # winner publishes first
        assert os.path.exists(os.path.join(out, "_SUCCESS"))
        before = sorted(os.listdir(out))

        b = spark.range(9).withColumnRenamed("id", "v")
        _publish_stage(b, out)  # loser: rename fails, tmp discarded
        assert sorted(os.listdir(out)) == before  # winner's files untouched
        assert spark.read.parquet(out).count() == 5
        # no stray tmp dirs left behind
        stray = [d for d in os.listdir(tmp_path) if ".tmp." in d]
        assert stray == []

    def test_partitioned_publish(self, spark, tmp_path):
        import os

        from pyspark.sql import functions as F

        from ting_data_etl_spark.operators.dedup import _publish_stage

        out = str(tmp_path / "part_stage")
        df = spark.range(10).select(
            F.col("id"), (F.col("id") % 2).alias("p")
        )
        _publish_stage(df, out, partition_by=("p",))
        assert os.path.exists(os.path.join(out, "_SUCCESS"))
        assert spark.read.parquet(out).count() == 10
        assert sorted(
            d for d in os.listdir(out) if d.startswith("p=")
        ) == ["p=0", "p=1"]

    def test_stale_partial_self_heals(self, spark, tmp_path):
        """A partial dir without _SUCCESS occupying `out` (a crashed
        pre-rename-era writer) must be swept and replaced, not wedge every
        subsequent publish with ENOTEMPTY forever."""
        import os

        from ting_data_etl_spark.operators.dedup import _publish_stage

        out = str(tmp_path / "wedged_stage")
        os.makedirs(out)
        with open(os.path.join(out, "part-00000.parquet"), "w") as f:
            f.write("torn")  # no _SUCCESS: a crashed mid-write leftover

        df = spark.range(7).withColumnRenamed("id", "v")
        _publish_stage(df, out)
        assert os.path.exists(os.path.join(out, "_SUCCESS"))
        assert spark.read.parquet(out).count() == 7


class TestPurgeStages:
    def test_purge_evicts_warm_centroids(self, tmp_path):
        """purge_stages claims disk AND process dicts; the in-memory IVF
        model cache is a process dict — a post-purge cold-build must not
        silently serve the warm model."""
        from ting_data_etl_spark.operators import similarity as S

        sf = str(tmp_path / "corpus")
        os.makedirs(sf)
        key = (sf, "fp", 1, 2, 3)
        other = (str(tmp_path / "other"), "fp", 1, 2, 3)
        S._CENTROIDS[key] = [[1]]
        S._CENTROIDS[other] = [[2]]
        try:
            dd.purge_stages(sf)
            assert key not in S._CENTROIDS
            assert other in S._CENTROIDS  # other datasets untouched
        finally:
            S._CENTROIDS.pop(key, None)
            S._CENTROIDS.pop(other, None)
