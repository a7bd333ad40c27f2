"""Tests for deterministic sampling / mixture / split / sharding."""

from __future__ import annotations

import __spark_entry__ as entrymod
from pyspark.sql import functions as F


class TestHashSample:
    def test_map_only_plan_no_shuffle(self, spark, sf_dir):
        from ting_data_etl_spark.operators.sampling import sample_hash_mod

        df = sample_hash_mod(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # sample is a pure map-side filter

    def test_stable_across_repartitioning(self, spark, sf_dir):
        from ting_data_etl_spark.operators.sampling import sample_hash_mod

        base = {r.doc_id for r in sample_hash_mod(spark, sf_dir).collect()}
        re32 = {
            r.doc_id
            for r in sample_hash_mod(spark, sf_dir).repartition(32).collect()
        }
        assert base == re32
        assert base  # non-empty


class TestSplit:
    def test_partition_of_corpus(self, spark, sf_dir):
        from ting_data_etl_spark.operators.sampling import stratified_split
        from ting_data_etl_spark.sources.tables import load_table

        rows = stratified_split(spark, sf_dir).collect()
        n_docs = load_table(spark, sf_dir, "documents").count()
        assert len(rows) == n_docs  # every doc assigned exactly once
        splits = {r.split for r in rows}
        assert splits == {"train", "val", "test"}
        frac_train = sum(r.split == "train" for r in rows) / len(rows)
        assert 0.7 < frac_train < 0.9

    def test_exact_stratification_per_source(self, spark, sf_dir):
        """EVERY source contributes to all three sets in 80/10/10
        proportion (the property the query is named for — a global hash
        split can leave a small source entirely inside train)."""
        from ting_data_etl_spark.operators.sampling import stratified_split
        from ting_data_etl_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
        joined = stratified_split(spark, sf_dir).join(docs, "doc_id")
        per = {
            (r.source, r.split): r.n
            for r in joined.groupBy("source", "split")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        sizes = {
            r.source: r.n
            for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        for src, n in sizes.items():
            tr = per.get((src, "train"), 0)
            # rank-range cut: train count is exactly ceil-or-floor of 80%
            assert abs(tr - 0.8 * n) <= 1, (src, n, tr)
            if n >= 10:
                assert per.get((src, "val"), 0) >= 1
                assert per.get((src, "test"), 0) >= 1

    def test_split_deterministic_across_runs(self, spark, sf_dir):
        from ting_data_etl_spark.operators.sampling import stratified_split

        a = {r.doc_id: r.split for r in stratified_split(spark, sf_dir).collect()}
        b = {r.doc_id: r.split for r in stratified_split(spark, sf_dir).collect()}
        assert a == b

    def test_sample_and_split_decisions_are_decorrelated(self, spark, sf_dir):
        """The per-purpose salts must break the round-6 correlation where
        the 20% sample was a strict subset of the train split (an empty
        val/test set for any sampled corpus)."""
        from ting_data_etl_spark.operators.sampling import (
            sample_hash_mod,
            stratified_split,
        )

        sampled = {r.doc_id for r in sample_hash_mod(spark, sf_dir).collect()}
        split = {r.doc_id: r.split for r in stratified_split(spark, sf_dir).collect()}
        in_sample = {split[d] for d in sampled}
        assert in_sample == {"train", "val", "test"}


class TestShards:
    def test_token_balance(self, spark, sf_dir):
        from ting_data_etl_spark.operators.sampling import shard_assignment
        from ting_data_etl_spark.functions.text import token_count
        from ting_data_etl_spark.sources.tables import load_table

        shards = shard_assignment(spark, sf_dir).collect()
        totals = [r.total_tokens for r in shards]
        max_doc = (
            load_table(spark, sf_dir, "documents")
            .select(F.max(token_count("text")).alias("m"))
            .first()
            .m
        )
        # longest-first round-robin: spread bounded by one max document
        assert max(totals) - min(totals) <= max_doc
        assert len(shards) == 16


class TestMixture:
    def test_rates_monotone(self, spark, sf_dir):
        from ting_data_etl_spark.operators.sampling import (
            corpus_weighted_mixture,
        )

        counts = {
            r.source: r.n_docs
            for r in corpus_weighted_mixture(spark, sf_dir).collect()
        }
        # src0 keeps everything; every other configured rate keeps fewer
        assert counts["src0"] >= counts["src1"] >= counts["src3"]


class TestPacking:
    def test_budget_bound(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from ting_data_etl_spark.functions.text import token_count
        from ting_data_etl_spark.operators.sampling import (
            PACK_BUDGET,
            pack_sequences,
        )
        from ting_data_etl_spark.sources.tables import load_table

        seqs = pack_sequences(spark, sf_dir).collect()
        max_doc = (
            load_table(spark, sf_dir, "documents")
            .select(F.max(token_count("text")).alias("m"))
            .first()
            .m
        )
        # first-fit-in-order guarantee: budget-max_doc < tokens (except the
        # final partial sequence) and tokens < budget + max_doc
        totals = sorted(
            (r.seq_id, r.total_tokens) for r in seqs
        )
        for seq_id, total in totals[:-1]:
            assert total > PACK_BUDGET - max_doc
        for seq_id, total in totals:
            assert total < PACK_BUDGET + max_doc
        # all docs packed exactly once
        n_docs = load_table(spark, sf_dir, "documents").count()
        assert sum(r.n_docs for r in seqs) == n_docs


class TestBandedVariants:
    """The documented 100TB formulations must equal the reference forms."""

    def test_shard_assignment_banded_identical(self, spark, sf_dir):
        from ting_data_etl_spark.operators.sampling import (
            shard_assignment,
            shard_assignment_banded,
        )

        ref = {
            r.shard: (r.n_docs, r.total_tokens)
            for r in shard_assignment(spark, sf_dir).collect()
        }
        banded = {
            r.shard: (r.n_docs, r.total_tokens)
            for r in shard_assignment_banded(spark, sf_dir).collect()
        }
        assert ref == banded

    def test_pack_sequences_banded_identical(self, spark, sf_dir):
        from ting_data_etl_spark.operators.sampling import (
            pack_sequences,
            pack_sequences_banded,
        )

        ref = {
            r.seq_id: (r.n_docs, r.total_tokens)
            for r in pack_sequences(spark, sf_dir).collect()
        }
        banded = {
            r.seq_id: (r.n_docs, r.total_tokens)
            for r in pack_sequences_banded(spark, sf_dir).collect()
        }
        assert ref == banded


class TestQualityWeightedSample:
    def test_zero_check_docs_never_kept_and_rate_tracks_checks(self, spark):
        from pyspark.sql import functions as F

        import ting_data_etl_spark.operators.sampling as sm
        from ting_data_etl_spark.functions.text import quality_checks

        # synthetic docs spanning the check bands: too-short garbage
        # (0 gates), and long English prose (3 gates)
        rows = []
        for i in range(400):
            if i % 2 == 0:
                # too long, all punctuation, no stopwords -> 0 gates
                rows.append((i, "#@!$% " * 1000, "junk"))
            else:
                rows.append(
                    (i, "the quick fox and the dog run to the field " * 4, "prose")
                )
        d = spark.createDataFrame(rows, "doc_id long, text string, source string")

        checks = {
            r.doc_id: r.c
            for r in d.select(
                "doc_id", quality_checks(F.col("text")).alias("c")
            ).collect()
        }
        accept = (
            quality_checks(F.col("text")) * sm.QUALITY_ACCEPT_PCT_PER_CHECK
        ).cast("int")
        kept = {
            r.doc_id
            for r in d.select(
                "doc_id", "source", accept.alias("accept_pct")
            )
            .filter(sm._bucket(F.col("doc_id"), "qsample") < F.col("accept_pct"))
            .collect()
        }
        zero_docs = {k for k, c in checks.items() if c == 0}
        full_docs = {k for k, c in checks.items() if c == 3}
        assert zero_docs and full_docs  # the fixture spans both bands
        assert not (kept & zero_docs)  # 0 gates -> never sampled
        rate_full = len(kept & full_docs) / len(full_docs)
        assert 0.80 <= rate_full <= 0.99  # ~90% acceptance for 3 gates


class TestTemperatureMixture:
    def test_kept_volume_tracks_sqrt_of_source_size(self, spark):
        from pyspark.sql import functions as F

        import ting_data_etl_spark.operators.sampling as sm

        # skewed sources: big is 100x small; sqrt-temperature must pull
        # the kept RATIO toward 10x (sqrt(100)), far below the raw 100x
        rows = [(i, "big" if i < 20_000 else "small") for i in range(20_200)]
        d = spark.createDataFrame(rows, "doc_id long, source string")
        counts = d.groupBy("source").agg(F.count("*").alias("n_total"))
        rates = counts.select(
            "source",
            F.least(
                F.lit(sm.TEMP_MAX_PCT),
                F.floor(
                    F.lit(sm.TEMP_BUDGET)
                    / F.sqrt(F.col("n_total").cast("double"))
                ),
            )
            .cast("int")
            .alias("accept_pct"),
        )
        kept = (
            d.join(F.broadcast(rates), "source")
            .filter(sm._bucket(F.col("doc_id"), "tempmix") < F.col("accept_pct"))
            .groupBy("source")
            .count()
        )
        got = {r.source: r["count"] for r in kept.collect()}
        # accept pcts: big floor(200/sqrt(20000)) = 1%, small floor(200/sqrt(200)) = 14%
        ratio = got["big"] / got["small"]
        assert 3 < ratio < 25  # ~7x expected; raw size ratio is 100x


class TestBandNullKeys:
    """NULL keys must band to a placed sentinel, never a NULL band that the
    offsets equi-join silently drops (or that crashes _band_offsets)."""

    def test_desc_null_keys_band_last_and_survive(self, spark):
        from ting_data_etl_spark.operators.sampling import (
            _band_offsets,
            _quantile_bands,
        )

        df = spark.createDataFrame(
            [(i, i) for i in range(20)]
            + [(100, None), (101, None)],
            "doc_id long, n_toks long",
        )
        band = _quantile_bands(df, "n_toks", 4, desc=True)
        banded = df.withColumn("__band", band.cast("int"))
        nulls = banded.filter(F.col("n_toks").isNull())
        null_bands = {r["__band"] for r in nulls.collect()}
        max_real = max(
            r["__band"]
            for r in banded.filter(F.col("n_toks").isNotNull()).collect()
        )
        # DESC window order puts nulls last -> sentinel band after all real
        assert len(null_bands) == 1
        assert next(iter(null_bands)) > max_real
        # _band_offsets must not crash on the all-NULL band_total ...
        offsets = _band_offsets(banded, "n_toks")
        # ... and the equi-join must retain the NULL-key rows
        assert banded.join(offsets, "__band").count() == 22

    def test_asc_null_keys_band_first(self, spark):
        from ting_data_etl_spark.operators.sampling import (
            _band_offsets,
            _quantile_bands,
        )

        df = spark.createDataFrame(
            [(i, i) for i in range(20)] + [(100, None)],
            "doc_id long, v long",
        )
        band = _quantile_bands(df, "v", 4, desc=False)
        banded = df.withColumn("__band", band.cast("int"))
        null_bands = {
            r["__band"]
            for r in banded.filter(F.col("v").isNull()).collect()
        }
        # ASC window order puts nulls first -> sentinel band before 0
        assert null_bands == {-1}
        offsets = _band_offsets(banded, "v")
        assert banded.join(offsets, "__band").count() == 21


class TestSurprisalGate:
    """The r9 surprisal-band quality gate (VERDICT r8 #6): acceptance
    bands pinned across surprisal bands."""

    def test_acceptance_pinned_per_band(self, spark, sf_dir):
        """Every kept row's accept_pct equals n_checks * band rate, and the
        tail band NEVER survives (its rate is 0)."""
        from ting_data_etl_spark.functions.text import quality_checks
        from ting_data_etl_spark.operators.sampling import (
            SURPRISAL_BAND_PCT,
            sample_surprisal_gated,
        )
        from ting_data_etl_spark.sources.tables import load_table

        out = sample_surprisal_gated(spark, sf_dir).cache()
        assert out.filter(F.col("band") == "tail").count() == 0
        checks = load_table(spark, sf_dir, "documents").select(
            "doc_id", quality_checks(F.col("text")).alias("n_checks")
        )
        joined = out.join(checks, "doc_id")
        for band, pct in SURPRISAL_BAND_PCT.items():
            bad = joined.filter(
                (F.col("band") == band)
                & (F.col("accept_pct") != F.col("n_checks") * pct)
            ).count()
            assert bad == 0, f"accept_pct drifted from pin in band {band}"
        # acceptance implies the salted coin passed: accept_pct > bucket
        from ting_data_etl_spark.operators.sampling import _bucket

        leak = out.filter(
            _bucket(F.col("doc_id"), "qsurp") >= F.col("accept_pct")
        ).count()
        assert leak == 0
        out.unpersist()

    def test_band_test_is_exact_integer_arithmetic(self, spark, sf_dir):
        """The band assignment from the fixed-point accumulator must agree
        with banding the float mean — on this corpus no doc sits close
        enough to a bound for float error, so disagreement = logic bug."""
        from ting_data_etl_spark.operators.sampling import (
            SURPRISAL_HEAD_MAX,
            SURPRISAL_TAIL_MIN,
            sample_surprisal_gated,
        )
        from ting_data_etl_spark.operators.text_queries import (
            text_unigram_surprisal,
        )

        means = text_unigram_surprisal(spark, sf_dir).select(
            "doc_id", "mean_surprisal"
        )
        got = sample_surprisal_gated(spark, sf_dir).join(means, "doc_id")
        mism = got.filter(
            (
                (F.col("mean_surprisal") < SURPRISAL_HEAD_MAX)
                & (F.col("band") != "head")
            )
            | (
                (F.col("mean_surprisal") >= SURPRISAL_TAIL_MIN)
                & (F.col("band") != "tail")
            )
            | (
                (F.col("mean_surprisal") >= SURPRISAL_HEAD_MAX)
                & (F.col("mean_surprisal") < SURPRISAL_TAIL_MIN)
                & (F.col("band") != "middle")
            )
        ).count()
        assert mism == 0

    def test_all_bands_populated_prefilter(self, spark, sf_dir):
        """The fixture corpus must exercise all three bands BEFORE the
        coin flip (tail is dropped by rate, so check the banded relation
        via the surprisal means)."""
        from ting_data_etl_spark.operators.sampling import (
            SURPRISAL_HEAD_MAX,
            SURPRISAL_TAIL_MIN,
        )
        from ting_data_etl_spark.operators.text_queries import (
            text_unigram_surprisal,
        )

        m = text_unigram_surprisal(spark, sf_dir).cache()
        assert m.filter(F.col("mean_surprisal") < SURPRISAL_HEAD_MAX).count() > 0
        assert m.filter(F.col("mean_surprisal") >= SURPRISAL_TAIL_MIN).count() > 0
        assert (
            m.filter(
                (F.col("mean_surprisal") >= SURPRISAL_HEAD_MAX)
                & (F.col("mean_surprisal") < SURPRISAL_TAIL_MIN)
            ).count()
            > 0
        )
        m.unpersist()


class TestDsirImportance:
    def test_accept_rule_matches_mean_ratio(self, spark, sf_dir):
        from ting_data_etl_spark.operators.sampling import (
            sample_dsir_importance,
        )

        rows = sample_dsir_importance(spark, sf_dir).collect()
        assert rows, "dsir produced no rows"
        for r in rows:
            # accepted <=> integer cross-multiply; the float mean_ratio is
            # derived FROM the same integers, so they must agree away from
            # the exact boundary (tolerance covers the boundary ULP)
            if r.accepted:
                assert r.mean_ratio >= 1.0 - 1e-9, r
            else:
                assert r.mean_ratio < 1.0 + 1e-9, r
            assert r.n_tokens > 0

    def test_target_docs_score_higher_on_average(self, spark, sf_dir):
        """The importance signal must actually separate target from source:
        all-gates documents (the exemplar set itself) average a higher
        mean_ratio than zero-gate documents."""
        from ting_data_etl_spark.functions.text import quality_checks
        from ting_data_etl_spark.operators.sampling import (
            sample_dsir_importance,
        )
        from ting_data_etl_spark.sources.tables import load_table

        w = sample_dsir_importance(spark, sf_dir)
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", quality_checks(F.col("text")).alias("n_checks")
        )
        stats = {
            r.n_checks: r.m
            for r in w.join(d, "doc_id")
            .groupBy("n_checks")
            .agg(F.avg("mean_ratio").alias("m"))
            .collect()
        }
        if 3 in stats and 0 in stats:
            assert stats[3] > stats[0], stats

    def test_weight_table_is_bucket_bounded(self, spark, sf_dir):
        """The whole point of hashing: distinct feature buckets ≤ B."""
        from ting_data_etl_spark.functions.text import portable_hash31, tokens
        from ting_data_etl_spark.operators.sampling import DSIR_BUCKETS
        from ting_data_etl_spark.sources.tables import load_table

        d = load_table(spark, sf_dir, "documents")
        n = (
            d.select(F.explode(tokens(F.col("text"))).alias("t"))
            .select((portable_hash31(F.col("t")) % DSIR_BUCKETS).alias("b"))
            .agg(F.countDistinct("b"))
            .collect()[0][0]
        )
        assert 0 < n <= DSIR_BUCKETS


class TestEpochOrder:
    def test_positions_are_contiguous_per_shard(self, spark, sf_dir):
        from ting_data_etl_spark.operators.sampling import corpus_epoch_order

        rows = corpus_epoch_order(spark, sf_dir).collect()
        by_shard: dict[int, list[int]] = {}
        for r in rows:
            by_shard.setdefault(r.shard, []).append(r.pos)
        assert by_shard
        for shard, ps in by_shard.items():
            assert sorted(ps) == list(range(1, len(ps) + 1)), shard

    def test_banded_rank_matches_single_window(self, spark, sf_dir):
        """The two-phase banded rank must reproduce the global window
        EXACTLY (same algebra as shard_assignment's pinned parity)."""
        from pyspark.sql import Window

        from ting_data_etl_spark.operators.sampling import (
            EPOCH_SALT,
            N_SHARDS,
            _order_key,
            corpus_epoch_order,
        )
        from ting_data_etl_spark.sources.tables import load_table

        got = {
            (r.doc_id): (r.shard, r.pos)
            for r in corpus_epoch_order(spark, sf_dir).collect()
        }
        d = load_table(spark, sf_dir, "documents")
        k = d.select(
            "doc_id", _order_key(F.col("doc_id"), EPOCH_SALT).alias("okey")
        ).withColumn("shard", F.pmod(F.col("okey"), N_SHARDS).cast("int"))
        w = Window.partitionBy("shard").orderBy("okey", "doc_id")
        want = {
            r.doc_id: (r.shard, r.pos)
            for r in k.withColumn(
                "pos", F.row_number().over(w).cast("long")
            ).collect()
        }
        assert got == want

    def test_new_epoch_salt_reshuffles(self, spark, sf_dir):
        from ting_data_etl_spark.operators.sampling import _order_key
        from ting_data_etl_spark.sources.tables import load_table

        d = load_table(spark, sf_dir, "documents")
        both = d.select(
            "doc_id",
            _order_key(F.col("doc_id"), "epoch1").alias("k1"),
            _order_key(F.col("doc_id"), "epoch2").alias("k2"),
        ).collect()
        # the two epochs order documents differently (not a shift/identity)
        order1 = [r.doc_id for r in sorted(both, key=lambda r: (r.k1, r.doc_id))]
        order2 = [r.doc_id for r in sorted(both, key=lambda r: (r.k2, r.doc_id))]
        assert order1 != order2


class TestBudgetHead:
    def test_budget_is_respected_and_tight(self, spark, sf_dir):
        from ting_data_etl_spark.functions.text import token_count
        from ting_data_etl_spark.operators.sampling import (
            BUDGET_PCT,
            corpus_budget_head,
        )
        from ting_data_etl_spark.sources.tables import load_table

        rows = corpus_budget_head(spark, sf_dir).collect()
        assert rows
        total = (
            load_table(spark, sf_dir, "documents")
            .agg(F.sum(token_count(F.col("text"))))
            .collect()[0][0]
        )
        budget = total * BUDGET_PCT // 100
        # greedy prefix rule: every selected doc STARTED within budget ...
        assert all(r.cum_before < budget for r in rows)
        # ... and the selection is tight: the kept tokens reach the budget
        # (they may overshoot by at most the last doc)
        kept = sum(r.n_toks for r in rows)
        assert kept >= budget, (kept, budget)

    def test_head_prefers_high_quality(self, spark, sf_dir):
        """Selection must be quality-monotone: if any gate-k doc is
        excluded, no gate-(k-1) doc may be included."""
        from ting_data_etl_spark.functions.text import quality_checks
        from ting_data_etl_spark.operators.sampling import corpus_budget_head
        from ting_data_etl_spark.sources.tables import load_table

        sel = {r.doc_id for r in corpus_budget_head(spark, sf_dir).collect()}
        all_rows = (
            load_table(spark, sf_dir, "documents")
            .select(
                "doc_id", quality_checks(F.col("text")).alias("n_checks")
            )
            .collect()
        )
        excluded_best = max(
            (r.n_checks for r in all_rows if r.doc_id not in sel), default=-1
        )
        included_worst = min(
            (r.n_checks for r in all_rows if r.doc_id in sel), default=4
        )
        # the boundary quality class may straddle the cut (split by doc_id),
        # but nothing strictly below an excluded class may be included
        assert included_worst >= excluded_best, (
            included_worst,
            excluded_best,
        )


class TestMixtureEpochs:
    def test_copy_counts_follow_the_rate(self, spark, sf_dir):
        from ting_data_etl_spark.operators.sampling import (
            DEFAULT_EPOCH_MIX_PCT,
            EPOCH_MIX_PCT,
            corpus_mixture_epochs,
            _bucket,
        )
        from ting_data_etl_spark.sources.tables import load_table

        rows = corpus_mixture_epochs(spark, sf_dir).collect()
        per_doc: dict[int, list[int]] = {}
        src: dict[int, str] = {}
        for r in rows:
            per_doc.setdefault(r.doc_id, []).append(r.copy)
            src[r.doc_id] = r.source
        d = load_table(spark, sf_dir, "documents")
        coins = {
            r.doc_id: r.b
            for r in d.select(
                "doc_id", _bucket(F.col("doc_id"), "epochmix").alias("b")
            ).collect()
        }
        n_docs = d.count()
        emitted = set(per_doc)
        for doc, copies in per_doc.items():
            rate = EPOCH_MIX_PCT.get(src[doc], DEFAULT_EPOCH_MIX_PCT)
            want = rate // 100 + (1 if coins[doc] < rate % 100 else 0)
            assert sorted(copies) == list(range(want)), (doc, copies, want)
        # docs absent from the output must be exactly the zero-copy docs
        all_docs = {r.doc_id for r in d.select("doc_id").collect()}
        for doc in all_docs - emitted:
            rate_rows = [r for r in d.select("doc_id", "source").collect()
                         if r.doc_id == doc]
            rate = EPOCH_MIX_PCT.get(
                rate_rows[0].source, DEFAULT_EPOCH_MIX_PCT
            )
            assert rate // 100 == 0 and coins[doc] >= rate % 100
        assert len(all_docs) == n_docs


class TestManifestShardSink:
    def test_manifest_shard_sink_file_count_and_readback(self, spark, sf_dir):
        """The physical sink writes O(shards) data files (clustered write:
        one task per shard) and the read-back rollup equals the manifest —
        the auditor loop VERDICT r11 #6 asked to close."""
        import glob
        import os
        import tempfile

        from ting_data_etl_spark.operators.sampling import (
            N_SHARDS,
            corpus_manifest_shard_sink,
            corpus_selection_manifest,
        )

        sink = sorted(
            map(tuple, corpus_manifest_shard_sink(spark, sf_dir).collect())
        )
        manifest = sorted(
            map(tuple, corpus_selection_manifest(spark, sf_dir).collect())
        )
        assert sink == manifest
        assert len(sink) == N_SHARDS

        # newest run dir: every shard exactly one parquet part-file
        root = os.path.join(tempfile.gettempdir(), "ting_manifest_sink")
        run = max(glob.glob(os.path.join(root, "*")), key=os.path.getmtime)
        shard_dirs = glob.glob(os.path.join(run, "shard=*"))
        assert len(shard_dirs) == N_SHARDS
        for d in shard_dirs:
            parts = glob.glob(os.path.join(d, "part-*.parquet"))
            assert len(parts) == 1, d

    def test_manifest_readback_detects_corruption(self, spark, sf_dir):
        """The read-back rollup must FLIP when the written tree is torn —
        drop one shard's part-file and the missing shard plus its digest
        divergence must show (the auditor property; the positive test
        alone can't prove the checksum does anything). Exercises BOTH
        checksums: the default XOR digest and the optional ordered md5."""
        import glob
        import os
        import shutil
        import tempfile

        from ting_data_etl_spark.operators.sampling import (
            _manifest_rollup,
            corpus_manifest_shard_sink,
            corpus_selection_manifest,
        )

        corpus_manifest_shard_sink(spark, sf_dir)  # writes a fresh run dir
        root = os.path.join(tempfile.gettempdir(), "ting_manifest_sink")
        run = max(glob.glob(os.path.join(root, "*")), key=os.path.getmtime)
        torn = run + ".torn"
        shutil.copytree(run, torn)
        try:
            victim = os.path.join(torn, "shard=3")
            os.remove(glob.glob(os.path.join(victim, "part-*.parquet"))[0])
            back = _manifest_rollup(
                spark.read.option("basePath", torn)
                .parquet(os.path.join(torn, "shard=*"))
                .select("doc_id", "n_toks", "shard"),
                ordered_md5=True,
            ).collect()
            manifest = {
                r["shard"]: r["ids_xor"]
                for r in corpus_selection_manifest(spark, sf_dir).collect()
            }
            got = {r["shard"]: r["ids_xor"] for r in back}
            assert set(got) == set(manifest) - {3}
            for s, xd in got.items():
                assert xd == manifest[s], s
            # the optional ordered checksum rides the same rollup and must
            # agree with an independently computed id-order md5
            import hashlib

            rows = (
                spark.read.option("basePath", run)
                .parquet(os.path.join(run, "shard=*"))
                .select("doc_id", "shard")
                .collect()
            )
            by_shard: dict[int, list[int]] = {}
            for r in rows:
                by_shard.setdefault(r["shard"], []).append(r["doc_id"])
            full = {
                r["shard"]: r["doc_ids_md5"]
                for r in _manifest_rollup(
                    spark.read.option("basePath", run)
                    .parquet(os.path.join(run, "shard=*"))
                    .select("doc_id", "n_toks", "shard"),
                    ordered_md5=True,
                ).collect()
            }
            for s, ids in by_shard.items():
                want = hashlib.md5(
                    ",".join(str(i) for i in sorted(ids)).encode()
                ).hexdigest()
                assert full[s] == want, s
        finally:
            shutil.rmtree(torn, ignore_errors=True)


def test_source_budget_head_per_source_prefix_rule(spark, sf_dir):
    """Every source independently obeys the greedy prefix rule: kept
    tokens fit its own integer budget, and the cut is tight (adding the
    next-ranked doc would exceed it) — plus every source is represented."""
    import pyspark.sql.functions as F

    from ting_data_etl_spark.operators.sampling import (
        BUDGET_PCT,
        budget_ledger_df,
        corpus_source_budget_head,
    )
    from ting_data_etl_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    totals = {
        r["source"]: r["t"]
        for r in budget_ledger_df(d)
        .join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.sum("n_toks").alias("t"))
        .collect()
    }
    kept = (
        corpus_source_budget_head(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.sum("n_toks").alias("kept"),
            F.max(F.col("cum_before") + F.col("n_toks")).alias("head_end"),
        )
        .collect()
    )
    assert {r["source"] for r in kept} == set(totals)
    for r in kept:
        budget = totals[r["source"]] * BUDGET_PCT // 100
        # prefix rule: last kept doc STARTED under budget; the head can
        # overshoot by at most that one doc, and must reach the budget
        assert r["head_end"] >= budget > 0
        assert r["kept"] - r["head_end"] <= 0  # cum accounting consistent


class TestSelectionRelationMemo:
    """VERDICT r13 #7: one eager-materialized selection relation serves the
    capstone, the manifest, and the shard sink within a session."""

    def test_memo_identity_and_invalidation(self, spark, sf_dir, monkeypatch):
        import ting_data_etl_spark.operators.sampling as S
        from ting_data_etl_spark.operators.curation import final_selection_df
        from ting_data_etl_spark import relcache

        a = final_selection_df(spark, sf_dir)
        assert final_selection_df(spark, sf_dir) is a  # same session: reuse
        r1 = S._selection_shard_rows(spark, sf_dir)
        assert S._selection_shard_rows(spark, sf_dir) is r1
        # a constants retune must key a FRESH relation (stale-memo hazard)
        monkeypatch.setattr(S, "BUDGET_PCT", max(1, S.BUDGET_PCT - 7))
        assert final_selection_df(spark, sf_dir) is not a
        monkeypatch.undo()
        assert final_selection_df(spark, sf_dir) is a
        # purge clears the memo alongside the staged artifacts
        relcache.clear()
        assert final_selection_df(spark, sf_dir) is not a

    def test_manifest_family_shares_the_ranked_relation(self, spark, sf_dir):
        """The manifest rollup and the sink's written rows must read the
        SAME ranked relation object — the drift-prevention the sharing
        bought, now pinned at the memo level."""
        import ting_data_etl_spark.operators.sampling as S

        ranked = S._selection_shard_rows(spark, sf_dir)
        man = {
            tuple(r)
            for r in S.corpus_selection_manifest(spark, sf_dir).collect()
        }
        sink = {
            tuple(r)
            for r in S.corpus_manifest_shard_sink(spark, sf_dir).collect()
        }
        assert man == sink
        assert S._selection_shard_rows(spark, sf_dir) is ranked

    def test_memo_is_thread_safe(self):
        """ADVICE r14: concurrent first consumers (streaming foreachBatch
        callbacks run on Spark's thread pool) must not corrupt the memo.
        All callers of one key converge on a single canonical object, and
        racing inserts across many keys never lose the FIFO bound."""
        import threading

        from ting_data_etl_spark import relcache

        class _Ctx:
            applicationId = "app-threadtest"

        class _Spark:
            sparkContext = _Ctx()

        spark = _Spark()
        relcache.clear()
        barrier = threading.Barrier(8)
        got: list[object] = [None] * 8
        errs: list[BaseException] = []

        def worker(i: int) -> None:
            try:
                barrier.wait()
                for k in range(12):  # churn past MAX_ENTRIES: forces evictions
                    relcache.session_relation(
                        spark, ("churn", i, k), lambda: object()
                    )
                barrier.wait()  # churn done everywhere before the shared key
                got[i] = relcache.session_relation(
                    spark, ("shared",), lambda: object()
                )
            except BaseException as e:  # noqa: BLE001 - surfaced below
                errs.append(e)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs
        assert all(g is not None for g in got)
        # the published object is canonical: a later consumer gets exactly
        # one of the racers' results, and every thread that arrived after
        # the first publish saw that same object
        published = relcache.session_relation(
            spark, ("shared",), lambda: object()
        )
        assert any(g is published for g in got)
        assert relcache.MAX_ENTRIES >= len(
            [k for k in relcache._MEMO]
        ), "eviction bound violated under concurrent insert"
        relcache.clear()
