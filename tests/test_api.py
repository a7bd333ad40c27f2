"""Public façade contract: builders compose, capstone stays hash-identical."""

from __future__ import annotations


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
