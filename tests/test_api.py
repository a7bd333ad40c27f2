"""Public façade contract: builders compose, capstone stays hash-identical."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_facade_final_selection_is_the_registered_capstone(spark, sf_dir):
    """The registered query delegates to the façade — row-identical by
    construction today; this pins it against a future re-implementation of
    either side drifting from the other."""
    from ting_data_etl_spark.api import Corpus
    from ting_data_etl_spark.operators.curation import corpus_final_selection

    via_api = sorted(
        map(tuple, Corpus(spark, sf_dir).final_selection().collect())
    )
    registered = sorted(
        map(tuple, corpus_final_selection(spark, sf_dir).collect())
    )
    assert via_api == registered
    assert via_api, "empty capstone relation"
    decisions = {d for _, d in via_api}
    assert decisions <= {
        "benchmark",
        "low_quality",
        "contaminated",
        "duplicate",
        "semantic_duplicate",
        "over_budget",
        "selected",
    }
    assert "selected" in decisions


def test_facade_builders_expose_stage_relations(spark, sf_dir):
    from ting_data_etl_spark.api import Corpus

    c = Corpus(spark, sf_dir)
    assert {"doc_id", "source", "text"} <= set(c.documents().columns)
    assert {"vec_id", "embedding"} <= set(c.embeddings().columns)
    assert {"doc_id", "status"} <= set(c.verdicts().columns)
    assert "doc_id" in c.semantic_duplicates().columns
    head = c.budget_head()
    assert {"doc_id", "n_checks", "n_toks", "cum_before"} == set(head.columns)
    assert set(c.selection_with_deletes().columns) == {"doc_id", "decision"}
    assert set(c.incremental_selection().columns) == {"doc_id", "decision"}


def test_pipeline_facade_is_the_registered_jobs(spark):
    """Every Pipeline method returns bit-for-bit the registered job's
    relation (delegation-only contract, VERDICT r11 #7) — so the driver's
    job_* oracles validate the public reporting surface each round."""
    from ting_data_etl_spark.api import Pipeline
    from ting_data_etl_spark.plans import jobs

    sf = SF_DIR
    p = Pipeline(spark, sf)
    pairs = [
        (p.annual_referral_kpi, jobs.job_23_1),
        (p.monthly_yoy_trend, jobs.job_23_2),
        (p.performance_kpi, jobs.job_24_1),
        (p.branch_month_conversion, jobs.job_24_2),
        (p.top_branches, jobs.job_25_1),
        (p.bottom_branches, jobs.job_25_2),
        (p.aggregate, jobs.job_generic),
    ]
    for method, registered in pairs:
        via_api = sorted(map(tuple, method().collect()))
        direct = sorted(map(tuple, registered(spark, sf).collect()))
        assert via_api == direct, method.__name__
        assert via_api, method.__name__


def test_pipeline_fanout_roundtrip_is_clean(spark, tmp_path):
    """The façade's sink + verification round-trip reports zero
    violations on a clean tree (the V3 exit-code contract)."""
    from ting_data_etl_spark.api import Pipeline
    from ting_data_etl_spark.operators.verify import fanout_source

    sf = SF_DIR
    p = Pipeline(spark, sf)
    src = fanout_source(spark, sf)
    report = {
        r["check_name"]: r["n"]
        for r in p.verify_fan_out(src, str(tmp_path / "fanout")).collect()
    }
    assert report["missing_store_files"] == 0
    assert report["extra_store_files"] == 0
    assert report["key_value_violations"] == 0
    assert report["rows_checked"] == src.count()


def test_facade_manifests_are_the_registered_queries(spark, sf_dir):
    """Manifest verbs delegate: rank-sharded manifest and both incremental
    digest flavors are bit-identical to their registered twins."""
    from ting_data_etl_spark.api import Corpus
    from ting_data_etl_spark.operators.incremental import (
        incremental_manifest_update,
        incremental_manifest_with_deletes,
    )
    from ting_data_etl_spark.operators.sampling import (
        corpus_selection_manifest,
    )

    c = Corpus(spark, sf_dir)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    assert rows(c.manifest()) == rows(corpus_selection_manifest(spark, sf_dir))
    assert rows(c.incremental_manifest()) == rows(
        incremental_manifest_update(spark, sf_dir)
    )
    assert rows(c.incremental_manifest(with_deletes=True)) == rows(
        incremental_manifest_with_deletes(spark, sf_dir)
    )
    assert set(c.incremental_manifest().columns) == {
        "shard",
        "n_docs",
        "total_tokens",
        "ids_xor",
    }


def test_facade_lifecycle_verbs_are_the_registered_queries(spark, sf_dir):
    """The r13 lifecycle verbs on the public surface (VERDICT r13 #4):
    reindex / ANN rebuild / snapshot time-travel / retire all delegate to
    the registered, oracle-verified implementations bit-for-bit."""
    import pytest as _pytest

    from ting_data_etl_spark.api import Corpus
    from ting_data_etl_spark.operators.incremental import (
        corpus_reindex,
        incremental_snapshot_retire,
        incremental_snapshot_timetravel,
    )
    from ting_data_etl_spark.operators.similarity import (
        similarity_index_rebuild,
    )

    c = Corpus(spark, sf_dir)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    # snapshot(0) reads the retire verb's STORE but its digest values are
    # bit-equal to the registered snapcat-backed time-travel query (same
    # standing rows, different physical layout) — so retire_snapshot can
    # honor its "retired days fail loudly" contract through the SAME
    # catalog this method reads (review r14)
    import shutil

    from ting_data_etl_spark.operators.incremental import _snapshot_store

    shutil.rmtree(_snapshot_store(spark, sf_dir), ignore_errors=True)
    assert rows(c.snapshot(0)) == rows(
        incremental_snapshot_timetravel(spark, sf_dir)
    )
    assert rows(c.rebuild_similarity_index()) == rows(
        similarity_index_rebuild(spark, sf_dir)
    )
    assert rows(c.reindex()) == rows(corpus_reindex(spark, sf_dir))
    # facade retires ONE day per call (oldest first) and returns the
    # LATEST survivor's digest; the registered query chains the full
    # retire, so the digests agree
    retired = rows(c.retire_snapshot())  # retires day 0
    with _pytest.raises(FileNotFoundError, match="retired"):
        c.snapshot(0)
    assert rows(c.snapshot(1)), "day 1 must survive the first retire"
    assert retired == rows(incremental_snapshot_retire(spark, sf_dir))
    # the registered chain retired day 1 too; day 2 is the lone survivor
    with _pytest.raises(FileNotFoundError, match="retired"):
        c.snapshot(1)
    assert rows(c.snapshot(2)) == retired
    with _pytest.raises(ValueError, match="nothing left"):
        c.retire_snapshot()
    # compact the lone survivor (r15): identical digests from the
    # consolidated layout, and the fragmented source day becomes the one
    # remaining retirable day — retire-after-compact reclaims it
    compacted = rows(c.compact())
    assert compacted == retired, "compaction is layout, never content"
    post = rows(c.retire_snapshot())  # catalog-driven default: day 2
    assert post == compacted
    with _pytest.raises(FileNotFoundError, match="retired"):
        c.snapshot(2)
    assert rows(c.snapshot(3)) == compacted
    with _pytest.raises(ValueError, match="nothing left"):
        c.retire_snapshot()
    # the REGISTERED retire reads the latest SURVIVOR (r15 review): on a
    # store where compact+retire already reclaimed day 2, a hardcoded
    # day-2 read would raise forever; the survivor digest is identical by
    # the compaction contract, so the oracle is unchanged
    assert rows(incremental_snapshot_retire(spark, sf_dir)) == compacted
    # a day the catalog does not hold fails loudly, not empty
    with _pytest.raises(ValueError, match="not in catalog"):
        c.snapshot(7)
