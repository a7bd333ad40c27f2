"""Tests for PII scan/redact and incremental minhash dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

import ting_data_etl_spark.operators.dedup as dd
import ting_data_etl_spark.operators.pii as pii


class TestPiiScan:
    def test_planted_density_matches_moduli(self, spark, sf_dir):
        rows = pii.text_pii_scan(spark, sf_dir).collect()
        by_id = {r.doc_id: r for r in rows}
        for doc_id, r in by_id.items():
            assert r.n_email == (1 if doc_id % pii._EMAIL_MOD == 0 else 0)
            assert r.n_ipv4 == (1 if doc_id % pii._IPV4_MOD == 0 else 0)
            assert r.n_phone == (1 if doc_id % pii._PHONE_MOD == 0 else 0)
        # every doc hit by a modulus appears; no PII-free doc appears
        n_docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        )
        want = {
            i
            for i in range(n_docs)
            if i % pii._EMAIL_MOD == 0
            or i % pii._IPV4_MOD == 0
            or i % pii._PHONE_MOD == 0
        }
        assert set(by_id) == want

    def test_redaction_leaves_no_pii_behind(self, spark):
        """Re-scanning redacted text finds zero hits (the e2e contract)."""
        rows = [
            (0, "mail me at a.b+c@dom-ain.co and 1.2.3.4 or 12345678901"),
            (7, "w1 w2 w3 plain words only"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        t = pii._augmented_spark(docs)
        r = F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(t, pii.EMAIL_RE, "<EMAIL>"),
                pii.IPV4_RE,
                "<IP>",
            ),
            pii.PHONE_RE,
            "<PHONE>",
        )
        left = docs.select(
            (
                F.regexp_count(r, F.lit(pii.EMAIL_RE))
                + F.regexp_count(r, F.lit(pii.IPV4_RE))
                + F.regexp_count(r, F.lit(pii.PHONE_RE))
            ).alias("n")
        ).agg(F.sum("n").alias("total")).first()
        assert left.total == 0


class TestIncrementalMinhash:
    def test_exact_dup_in_batch_is_flagged(self, spark, monkeypatch):
        """A batch doc identical to a corpus doc maps to that keeper."""
        text = "the quick brown fox jumps over the lazy dog again and again"
        other = "completely different words about ships and harbors at dawn"
        rows = [
            (0, text),  # corpus (0 % 5 != 1)
            (2, other),  # corpus
            (6, text),  # batch (6 % 5 == 1), exact dup of 0
            (11, "unique snowflake phrase with no twin anywhere at all"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        monkeypatch.setattr(dd, "load_table", lambda s, d, n: docs)
        got = {
            r.doc_id: (r.dup_of, r.is_dup)
            for r in dd.dedup_incremental_minhash(spark, "unused").collect()
        }
        assert set(got) == {6, 11}  # exactly the batch docs
        assert got[6] == (0, True)
        assert got[11] == (None, False)

    def test_corpus_side_cap_applies(self, spark, monkeypatch):
        """A boilerplate corpus bucket larger than the cap stops matching."""
        text = "shared boilerplate sentence repeated in every corpus document"
        rows = [(i * 5, text) for i in range(4)] + [(6, text)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        monkeypatch.setattr(dd, "load_table", lambda s, d, n: docs)
        # cap default binds at def time; swap the function to force cap=3
        orig = dd.band_frequency_cap
        monkeypatch.setattr(
            dd, "band_frequency_cap", lambda bands, cap=3: orig(bands, cap=3)
        )
        got = {r.doc_id: r.is_dup for r in
               dd.dedup_incremental_minhash(spark, "unused").collect()}
        assert got == {6: False}  # 4 corpus copies > cap -> bucket dropped
