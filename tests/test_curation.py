"""Tests for the curation suite: Gopher rules, repetition, contamination,
canonical-keeper dedup, ORC round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ting_data_etl_spark.operators import curation as C


def _rows(spark, docs, query_fn, tmp_path):
    """Run a curation query against a synthetic documents table."""
    import os

    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(str(sf), "documents.parquet"))
    return {r.doc_id: r for r in query_fn(spark, str(sf)).collect()}


class TestGopherRules:
    def test_metrics_and_gate(self, spark, tmp_path):
        good = "the quick brown fox jumps over the lazy dog " * 5  # 45 words
        symbolic = "spam # " * 30  # '#' every other word
        empty = "!!! ..."
        docs = [
            (1, good, "en", "s", len(good)),
            (2, symbolic, "en", "s", len(symbolic)),
            (3, empty, "en", "s", len(empty)),
        ]
        out = _rows(spark, docs, C.text_gopher_quality_rules, tmp_path)
        assert out[1].n_words == 45
        assert out[1].passes_gopher == 1
        assert abs(out[1].mean_word_len - (35 / 9)) < 1e-12
        assert out[1].alpha_word_frac == 1.0
        # '#' is not a token, so 30 hashes over 30 words -> ratio 1.0
        assert out[2].symbol_word_ratio == pytest.approx(1.0)
        assert out[2].passes_gopher == 0
        # no tokens at all -> NULL metrics, gate coalesces to fail
        assert out[3].n_words == 0
        assert out[3].mean_word_len is None
        assert out[3].passes_gopher == 0

    def test_ellipsis_counted_in_threes(self, spark, tmp_path):
        docs = [(1, "w ...... x " * 10, "en", "s", 1)]
        out = _rows(spark, docs, C.text_gopher_quality_rules, tmp_path)
        # '......' = two '...' occurrences per repeat, 20 words total
        assert out[1].symbol_word_ratio == pytest.approx(20 / 20)


class TestRepetition:
    def test_dup_lines_and_top_bigram(self, spark, tmp_path):
        text = "a b\na b\nc d\n\n  \n"
        docs = [(1, text, "en", "s", len(text)), (2, "solo", "en", "s", 4)]
        out = _rows(spark, docs, C.text_repetition_metrics, tmp_path)
        r = out[1]
        # 3 non-blank lines, one duplicated -> 1/3
        assert r.n_lines == 3
        assert r.dup_line_frac == pytest.approx(1 / 3)
        # tokens: a b a b c d -> bigrams: ab ba ab bc cd; top 'a b' x2 of 5
        assert r.n_bigrams == 5
        assert r.top_bigram_frac == pytest.approx(2 / 5)
        # single-token doc: zero bigrams, NULL fraction
        assert out[2].n_bigrams == 0
        assert out[2].top_bigram_frac is None


class TestContamination:
    def test_benchmark_overlap_flags(self, spark, tmp_path):
        bench_text = "w1 w2 w3 w4 w5 w6 w7 w8 w9"
        clean_text = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"
        docs = [
            (C.BENCHMARK_MOD, bench_text, "en", "s", 1),  # benchmark member
            (1, bench_text, "en", "s", 1),  # fully contaminated copy
            (2, clean_text, "en", "s", 1),  # disjoint
        ]
        out = _rows(spark, docs, C.dedup_contamination_check, tmp_path)
        assert C.BENCHMARK_MOD not in out  # benchmark side not scored
        assert out[1].n_contaminated == out[1].n_grams == 2
        assert out[1].contamination_frac == 1.0 and out[1].flagged == 1
        assert out[2].n_contaminated == 0 and out[2].flagged == 0

    def test_short_doc_whole_text_shingle(self, spark, tmp_path):
        docs = [
            (C.BENCHMARK_MOD, "tiny doc", "en", "s", 1),
            (1, "tiny doc", "en", "s", 1),
        ]
        out = _rows(spark, docs, C.dedup_contamination_check, tmp_path)
        assert out[1].n_grams == 1 and out[1].contamination_frac == 1.0


class TestKeepCanonical:
    def test_keeper_is_component_min_with_sizes(self, spark, sf_dir):
        from ting_data_etl_spark.operators.dedup import (
            dedup_connected_components,
        )

        keep = {
            r.keeper_doc_id: r
            for r in C.dedup_keep_canonical(spark, sf_dir).collect()
        }
        comps = dedup_connected_components(spark, sf_dir).collect()
        sizes: dict[int, int] = {}
        for r in comps:
            sizes[r.component] = sizes.get(r.component, 0) + 1
        assert {k: r.cluster_size for k, r in keep.items()} == sizes
        assert all(r.n_dropped == r.cluster_size - 1 for r in keep.values())


class TestOrcRoundtrip:
    def test_profile_matches_parquet_truth(self, spark, sf_dir):
        from ting_data_etl_spark.sources.orc import orc_roundtrip_profile
        from ting_data_etl_spark.sources.tables import load_table

        got = {
            r.lang: (r.n_docs, r.total_chars)
            for r in orc_roundtrip_profile(spark, sf_dir).collect()
        }
        truth = {
            r.lang: (r.n, r.chars)
            for r in load_table(spark, sf_dir, "documents")
            .groupBy("lang")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.length("text")).cast("long").alias("chars"),
            )
            .collect()
        }
        assert got == truth


class TestE2EStatus:
    def test_statuses_consistent_with_stages(self, spark, sf_dir):
        from ting_data_etl_spark.operators.dedup import (
            dedup_connected_components,
        )

        st = {
            r.doc_id: r.status
            for r in C.curation_e2e_status(spark, sf_dir).collect()
        }
        gop = {
            r.doc_id: r.passes_gopher
            for r in C.text_gopher_quality_rules(spark, sf_dir).collect()
        }
        comp = {
            r.doc_id: r.component
            for r in dedup_connected_components(spark, sf_dir).collect()
        }
        assert set(st.values()) <= {
            "benchmark", "low_quality", "contaminated", "duplicate", "kept"
        }
        for doc, s in st.items():
            if doc % C.BENCHMARK_MOD == 0:
                assert s == "benchmark"
            elif gop[doc] == 0:
                assert s == "low_quality"
            if s == "duplicate":
                assert comp[doc] != doc
            if s == "kept":
                assert comp[doc] == doc and gop[doc] == 1


class TestSpanStatus:
    def test_precedence_and_trim_accounting(self, spark, sf_dir):
        """Span accounting only on kept docs; kept_trimmed iff spans removed;
        fractions consistent with the span finder's own rollup."""
        from ting_data_etl_spark.operators.curation import (
            curation_e2e_status,
            curation_span_status,
        )
        from ting_data_etl_spark.operators.text_queries import (
            dedup_repeated_substrings,
        )

        out = curation_span_status(spark, sf_dir).cache()
        # non-kept statuses carry zero span accounting
        bad = out.filter(
            (~F.col("status").isin("kept", "kept_trimmed"))
            & (
                (F.col("span_tokens_removed") != 0)
                | (F.col("token_fraction_removed") != 0.0)
            )
        ).count()
        assert bad == 0
        # kept_trimmed <=> kept-with-removal
        assert (
            out.filter(
                (F.col("status") == "kept_trimmed")
                & (F.col("span_tokens_removed") <= 0)
            ).count()
            == 0
        )
        assert (
            out.filter(
                (F.col("status") == "kept")
                & (F.col("span_tokens_removed") != 0)
            ).count()
            == 0
        )
        # document-level verdicts unchanged by the composition
        base = curation_e2e_status(spark, sf_dir).withColumnRenamed(
            "status", "base_status"
        )
        drift = (
            out.join(base, "doc_id")
            .filter(
                (
                    F.when(
                        F.col("status") == "kept_trimmed", F.lit("kept")
                    ).otherwise(F.col("status"))
                )
                != F.col("base_status")
            )
            .count()
        )
        assert drift == 0
        # removed counts match the span finder's rollup on kept docs
        spans = (
            dedup_repeated_substrings(spark, sf_dir)
            .groupBy("doc_id")
            .agg(F.sum("span_tokens").alias("removed"))
        )
        mism = (
            out.filter(F.col("status") == "kept_trimmed")
            .join(spans, "doc_id")
            .filter(F.col("span_tokens_removed") != F.col("removed"))
            .count()
        )
        assert mism == 0
        assert out.filter(F.col("status") == "kept_trimmed").count() > 0
        out.unpersist()


class TestTrimmedText:
    def test_trim_applies_exactly_the_accounted_spans(self, spark, sf_dir):
        """Row set = kept docs; kept docs are byte-identical to their
        normalized text; trimmed docs lose exactly span_tokens_removed."""
        from ting_data_etl_spark.functions.text import tokens
        from ting_data_etl_spark.operators.curation import (
            curation_span_status,
            curation_trimmed_text,
        )
        from ting_data_etl_spark.sources.tables import load_table

        out = curation_trimmed_text(spark, sf_dir).cache()
        st = curation_span_status(spark, sf_dir).cache()
        kept_ids = st.filter(
            F.col("status").isin("kept", "kept_trimmed")
        ).select("doc_id")
        assert out.count() == kept_ids.count()
        assert out.join(kept_ids, "doc_id", "left_anti").count() == 0
        # untrimmed kept docs: md5 equals the md5 of the full token join
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.md5(F.array_join(tokens(F.col("text")), " ")).alias("full_md5"),
            F.size(tokens(F.col("text"))).cast("long").alias("n_toks"),
        )
        plain = out.filter(F.col("status") == "kept").join(d, "doc_id")
        assert (
            plain.filter(F.col("trimmed_md5") != F.col("full_md5")).count()
            == 0
        )
        assert (
            plain.filter(F.col("n_tokens_kept") != F.col("n_toks")).count()
            == 0
        )
        # trimmed docs: kept + removed = total, and content changed
        tr = (
            out.filter(F.col("status") == "kept_trimmed")
            .join(st.select("doc_id", "span_tokens_removed"), "doc_id")
            .join(d, "doc_id")
        )
        assert tr.count() > 0
        assert (
            tr.filter(
                F.col("n_tokens_kept") + F.col("span_tokens_removed")
                != F.col("n_toks")
            ).count()
            == 0
        )
        assert (
            tr.filter(F.col("trimmed_md5") == F.col("full_md5")).count() == 0
        )
        out.unpersist()
        st.unpersist()


class TestFunnelReport:
    def test_funnel_sums_to_corpus_and_matches_statuses(self, spark, sf_dir):
        from ting_data_etl_spark.operators.curation import (
            curation_funnel_report,
            curation_span_status,
        )
        from ting_data_etl_spark.sources.tables import load_table

        funnel = {
            r.status: (r.n_docs, r.tokens_trimmed)
            for r in curation_funnel_report(spark, sf_dir).collect()
        }
        n_docs = load_table(spark, sf_dir, "documents").count()
        assert sum(n for n, _ in funnel.values()) == n_docs
        # the funnel must agree with the relation it summarizes
        per_doc = curation_span_status(spark, sf_dir).collect()
        want: dict[str, list[int]] = {}
        for r in per_doc:
            want.setdefault(r.status, [0, 0])
            want[r.status][0] += 1
            want[r.status][1] += r.span_tokens_removed
        assert funnel == {k: tuple(v) for k, v in want.items()}
        # only trim-capable fates may carry trimmed tokens
        for status, (_, trimmed) in funnel.items():
            if status not in ("kept_trimmed",):
                assert trimmed == 0, (status, trimmed)


class TestFinalSelection:
    def test_composition_agrees_with_stage_outputs(self, spark, sf_dir):
        """The capstone relation must be exactly the composition of its
        three already-verified stages, recomposed independently here."""
        from ting_data_etl_spark.operators.curation import (
            corpus_final_selection,
            curation_span_status,
        )
        from ting_data_etl_spark.operators.sampling import corpus_budget_head
        from ting_data_etl_spark.operators.similarity import (
            dedup_semdedup_prune,
        )

        got = {
            r.doc_id: r.decision
            for r in corpus_final_selection(spark, sf_dir).collect()
        }
        status = {
            r.doc_id: r.status
            for r in curation_span_status(spark, sf_dir).collect()
        }
        pruned = {
            r.vec_id for r in dedup_semdedup_prune(spark, sf_dir).collect()
        }
        surv = [
            d
            for d, s in status.items()
            if s in ("kept", "kept_trimmed") and d not in pruned
        ]
        surv_df = spark.createDataFrame(
            [(d,) for d in surv], "doc_id long"
        )
        in_budget = {
            r.doc_id
            for r in corpus_budget_head(
                spark, sf_dir, keep=surv_df
            ).collect()
        }
        want = {}
        for d, s in status.items():
            if s not in ("kept", "kept_trimmed"):
                want[d] = s
            elif d in pruned:
                want[d] = "semantic_duplicate"
            elif d not in in_budget:
                want[d] = "over_budget"
            else:
                want[d] = "selected"
        assert got == want
        # the pipeline must actually exercise every stage on the fixture
        assert "selected" in set(got.values())
        assert "semantic_duplicate" in set(got.values())
        assert "over_budget" in set(got.values())
