"""Public façade: the curation engine as documented dataset-level builders.

Everything the registry exposes is a *driver contract* (name → callable);
this module is the surface a USER programs against — a :class:`Corpus`
wrapping one (documents, embeddings) dataset, with one method per pipeline
stage. The methods return plain DataFrames, so façade stages compose with
arbitrary user Spark code.

The capstone compositions are IMPLEMENTED here: the registered queries
``corpus_final_selection`` and ``corpus_incremental_selection`` delegate to
:meth:`Corpus.final_selection` / :meth:`Corpus.incremental_selection`, so
the driver's full-value DuckDB oracles validate the façade path itself —
"hash-identical through the public API" is checked every round, not claimed.

Quick start::

    from ting_data_etl_spark.api import Corpus

    c = Corpus(spark, "/data/corpus_sf")
    verdicts = c.verdicts()              # per-doc curation fate
    pruned   = c.semantic_duplicates()   # SemDeDup ε-pruned doc ids
    final    = c.final_selection()       # (doc_id, decision) for training
    daily    = c.incremental_selection() # same, via staged standing state
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ting_data_etl_spark.sources.tables import load_table


class Corpus:
    """One (documents, embeddings) dataset under curation.

    *sf_dir* holds the parquet tables (``documents.parquet`` with
    ``doc_id, source, text``; ``embeddings.parquet`` with ``vec_id,
    label, embedding`` sharing the documents' id space). Every method is
    lazy — it returns a DataFrame plan; staged artifacts (dedup labels,
    IVF model, standing state) build on first execution and are reused.
    """

    def __init__(self, spark: SparkSession, sf_dir: str) -> None:
        self.spark = spark
        self.sf_dir = sf_dir

    # --- raw tables ----------------------------------------------------------
    def documents(self) -> DataFrame:
        """The raw document table (doc_id, source, text)."""
        return load_table(self.spark, self.sf_dir, "documents")

    def embeddings(self) -> DataFrame:
        """The raw embedding table (vec_id, label, embedding)."""
        return load_table(self.spark, self.sf_dir, "embeddings")

    # --- pipeline stages (each independently oracle-verified) ----------------
    def verdicts(self) -> DataFrame:
        """Per-document curation fate with span-trim accounting.

        (doc_id, status, span_tokens_removed, token_fraction_removed) —
        status ∈ benchmark / low_quality / contaminated / duplicate /
        kept / kept_trimmed, with fixed document-verdicts-first precedence
        (registered as ``curation_span_status``).
        """
        from ting_data_etl_spark.operators.curation import curation_span_status

        return curation_span_status(self.spark, self.sf_dir)

    def semantic_duplicates(self) -> DataFrame:
        """SemDeDup ε-pruned documents: (doc_id, list_id, keeper_id).

        A doc is pruned when a lower-id member of its embedding cluster is
        ε-close (registered as ``dedup_semdedup_prune``; cluster = the
        pinned IVF coarse model's cell).
        """
        from ting_data_etl_spark.operators.similarity import (
            dedup_semdedup_prune,
        )

        return dedup_semdedup_prune(self.spark, self.sf_dir).withColumnRenamed(
            "vec_id", "doc_id"
        )

    def budget_head(self, keep: DataFrame | None = None) -> DataFrame:
        """Best-first greedy selection under the global token budget.

        Ranks by quality-gate count (ties → doc_id) and keeps documents
        while the tokens BEFORE them fit ``BUDGET_PCT`` of the total —
        computed over *keep*'s ids when given (the post-dedup survivor
        budget), else the whole corpus. Registered as
        ``corpus_budget_head``; the rank/cumsum is a banded two-phase
        prefix scan, never a global sort.
        """
        from ting_data_etl_spark.operators.sampling import corpus_budget_head

        return corpus_budget_head(self.spark, self.sf_dir, keep=keep)

    # --- capstone compositions ------------------------------------------------
    def final_selection(self) -> DataFrame:
        """The complete pipeline, one decision per document.

        The artifact a production curation run hands to training: every
        document's final fate with fixed stage precedence —

        1. document verdicts (benchmark / low_quality / contaminated /
           duplicate, from the lexical pipeline + span accounting);
        2. ``semantic_duplicate``: a curation-kept doc pruned by SemDeDup;
        3. ``over_budget``: survivors ranked quality-first, the token
           budget (BUDGET_PCT of the SURVIVORS' tokens — post-dedup, as in
           any data-constrained run) cuts the tail;
        4. ``selected``: in the final corpus.

        Every stage is an already-verified registered operator; this
        relation is their composition, and the registered twin
        (``corpus_final_selection``) delegates HERE, so its oracle — the
        same three stage statements composed in one DuckDB query —
        hash-checks this exact method every round.

        Plan: the stage relations join on ``doc_id``; the status⋈semantic
        relation is eagerly materialized once (it feeds the budget chain's
        quantile pass, offsets pass, and final join — re-deriving the span
        + semantic chains three times would triple the dominant cost).
        """
        status = self.verdicts().select("doc_id", "status")
        sem = (
            self.semantic_duplicates()
            .select("doc_id")
            .withColumn("sem_pruned", F.lit(True))
        )
        kept_pred = F.col("status").isin("kept", "kept_trimmed")
        st = status.join(sem, "doc_id", "left").localCheckpoint(eager=True)
        surv = st.filter(kept_pred & F.col("sem_pruned").isNull()).select(
            "doc_id"
        )
        bud = (
            self.budget_head(keep=surv)
            .select("doc_id")
            .withColumn("in_budget", F.lit(True))
        )
        return st.join(bud, "doc_id", "left").select(
            "doc_id",
            F.when(~kept_pred, F.col("status"))
            .when(
                F.col("sem_pruned").isNotNull(), F.lit("semantic_duplicate")
            )
            .when(F.col("in_budget").isNull(), F.lit("over_budget"))
            .otherwise(F.lit("selected"))
            .alias("decision"),
        )

    def incremental_selection(self) -> DataFrame:
        """The daily-batch form of :meth:`final_selection`.

        Merges the arriving batch (the ``INCR_BATCH_MOD`` split) into the
        staged standing state and emits the post-merge decision for every
        document — bit-equal to :meth:`final_selection` on the merged
        corpus, but the only document text the plan reads is the batch's
        (see ``operators.incremental`` for the per-stage cost contract).
        """
        from ting_data_etl_spark.operators.incremental import (
            corpus_incremental_selection,
        )

        return corpus_incremental_selection(self.spark, self.sf_dir)

    def selection_with_deletes(self) -> DataFrame:
        """The maintenance form of :meth:`final_selection` after deletions.

        Applies the tombstone/re-edit conventions to the standing corpus
        and emits the post-edit decision for every surviving document —
        equal to a from-scratch run on the edited corpus, but the only
        document text the plan reads is the re-edits' (deleted keepers can
        un-prune; the budget re-cuts; see ``operators.incremental``).
        """
        from ting_data_etl_spark.operators.incremental import (
            corpus_selection_with_deletes,
        )

        return corpus_selection_with_deletes(self.spark, self.sf_dir)
