"""Tests for text expressions: tokenization, shingles, simhash, minhash."""

from __future__ import annotations

from pyspark.sql import functions as F

from ting_data_etl_spark.functions.text import (
    lang_id,
    normalize_text,
    quality_score,
    token_count,
    tokens,
    word_ngrams,
)
from ting_data_etl_spark.operators.dedup import (
    minhash_signature,
    minhash_signatures_df,
    simhash32,
    simhash_signatures_df,
)


def _one(spark, col, value: str):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(col.alias("out")).collect()[0].out


class TestTokenization:
    def test_normalize(self, spark):
        assert _one(spark, normalize_text(F.col("v")), "  Héllo\t\nWORLD  ") == "héllo world"

    def test_tokens_drop_empties_and_punct(self, spark):
        assert _one(spark, tokens(F.col("v")), "a, b!! c?") == ["a", "b", "c"]
        assert _one(spark, tokens(F.col("v")), "...") == []

    def test_token_count(self, spark):
        assert _one(spark, token_count(F.col("v")), "one two  three") == 3

    def test_ngrams_short_doc_single_shingle(self, spark):
        # docs shorter than n yield the whole doc as one shingle
        assert _one(spark, word_ngrams(F.col("v"), 3), "a b") == ["a b"]
        assert _one(spark, word_ngrams(F.col("v"), 3), "a b c d") == [
            "a b c",
            "b c d",
        ]


class TestLangId:
    def test_stopword_votes(self, spark):
        assert _one(spark, lang_id(F.col("v")), "the cat and the dog") == "en"
        assert _one(spark, lang_id(F.col("v")), "el perro y la casa que") == "es"
        assert _one(spark, lang_id(F.col("v")), "zzz qqq") == "und"

    def test_tie_breaks_by_lang_code(self, spark):
        # "la" is both es and fr stopword -> tie -> lexicographically first code
        assert _one(spark, lang_id(F.col("v")), "la la") == "es"


class TestQuality:
    def test_bounds(self, spark):
        good = "the quick brown fox jumps over the lazy dog " * 3
        assert _one(spark, quality_score(F.col("v")), good) == 1.0
        assert _one(spark, quality_score(F.col("v")), "!!!") == 0.0


class TestSimhash:
    def test_deterministic_and_permutation_invariant_shape(self, spark):
        a = _one(spark, simhash32(F.col("v")), "the quick brown fox")
        b = _one(spark, simhash32(F.col("v")), "the quick brown fox")
        assert a == b  # deterministic across evaluations
        assert 0 <= a < 2**32

    def test_empty_doc_is_zero(self, spark):
        assert _one(spark, simhash32(F.col("v")), "") == 0
        assert _one(spark, simhash32(F.col("v")), "...") == 0

    def test_expression_and_dataframe_forms_agree(self, spark):
        rows = [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, ""),  # empty doc -> 0 in both forms
            (4, "the quick brown fox jumps over the lazy dog"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        expr = {
            r.doc_id: r.s
            for r in docs.select(
                "doc_id", simhash32(F.col("text")).alias("s")
            ).collect()
        }
        dfform = {r.doc_id: r.simhash for r in simhash_signatures_df(docs).collect()}
        assert expr == dfform
        assert dfform[3] == 0

    def test_near_duplicates_have_close_signatures(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again"
        near = base + " extra"
        far = "completamente diferente en otro idioma con palabras distintas"
        ha = _one(spark, simhash32(F.col("v")), base)
        hb = _one(spark, simhash32(F.col("v")), near)
        hc = _one(spark, simhash32(F.col("v")), far)

        def hamming(x, y):
            return bin(x ^ y).count("1")

        assert hamming(ha, hb) < hamming(ha, hc)


class TestMinhash:
    def test_expression_and_dataframe_forms_agree(self, spark):
        """minhash_signature (nested HOF) == minhash_signatures_df (explode+agg)."""
        rows = [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "the quick brown fox jumps over the lazy dog"),  # dup of 1
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        expr = {
            r.doc_id: r.sig
            for r in docs.select(
                "doc_id", minhash_signature(F.col("text")).alias("sig")
            ).collect()
        }
        dfform = {
            r.doc_id: r.sig for r in minhash_signatures_df(docs).collect()
        }
        assert expr == dfform
        assert expr[1] == expr[3]  # identical docs -> identical signatures
        assert expr[1] != expr[2]


class TestWinnowing:
    def test_expression_and_dataframe_forms_agree(self, spark):
        from ting_data_etl_spark.functions.text import winnow_fingerprints
        from ting_data_etl_spark.operators.text_queries import (
            winnow_fingerprints_df,
        )

        rows = [
            (1, "the quick brown fox jumps over the lazy dog " * 5),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "tiny"),  # shorter than k -> one gram, one window
            (4, ""),  # empty -> single empty gram, still one fingerprint
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        expr = {
            (r.doc_id, r.fp)
            for r in docs.select(
                "doc_id", F.explode(winnow_fingerprints("text")).alias("fp")
            ).collect()
        }
        dfform = {(r.doc_id, r.fp) for r in winnow_fingerprints_df(docs).collect()}
        assert expr == dfform

    def test_shared_substring_shares_fingerprint(self, spark):
        from ting_data_etl_spark.operators.text_queries import (
            winnow_fingerprints_df,
        )

        shared = "this exact sentence is long enough to fingerprint"
        rows = [
            (1, "prefix words here. " + shared),
            (2, shared + " and then a different tail entirely"),
            (3, "no overlap with anything else whatsoever in here"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        fps = winnow_fingerprints_df(docs).collect()
        by_doc = {}
        for r in fps:
            by_doc.setdefault(r.doc_id, set()).add(r.fp)
        # winnowing guarantee: substring >= k+w-1 chars shared -> shared fp
        assert by_doc[1] & by_doc[2]
        assert not (by_doc[1] & by_doc[3] & by_doc[2])


class TestBpeTokenCount:
    def test_counts(self, spark):
        from ting_data_etl_spark.functions.text import bpe_token_count

        # 'hello' + 'world' = 2; '123' = 3 digit tokens; ',' and '!' = 2
        assert _one(spark, bpe_token_count(F.col("v")), "hello, world 123!") == 7
        assert _one(spark, bpe_token_count(F.col("v")), "") == 0
        # whitespace never tokenizes
        assert _one(spark, bpe_token_count(F.col("v")), "   \t\n ") == 0


class TestTfidfTopTerms:
    def test_topk_shape_and_order(self, spark, sf_dir):
        from ting_data_etl_spark.operators.text_queries import (
            TFIDF_TOP,
            text_tfidf_top_terms,
        )

        rows = text_tfidf_top_terms(spark, sf_dir).collect()
        assert rows
        by_doc: dict[int, list] = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        for doc, rs in by_doc.items():
            assert len(rs) <= TFIDF_TOP
            assert len({r.token for r in rs}) == len(rs)
            scores = sorted((r.score for r in rs), reverse=True)
            assert scores == [r.score for r in sorted(
                rs, key=lambda r: (-r.score, r.token)
            )]
            for r in rs:
                assert r.tf >= 1 and r.df >= 1


class TestWhitespaceClassParity:
    def test_vertical_tab_normalizes_identically_in_both_engines(self, spark):
        """Java \\s includes U+000B, RE2's does not — the explicit shared
        WS_CHARS class must make Spark and DuckDB normalize (and therefore
        md5-fingerprint) a VT-bearing document identically."""
        import duckdb

        from ting_data_etl_spark.functions.text import normalize_text
        from ting_data_etl_spark.plans.oracles import sql_normalize_text

        docs = ["a\x0bb", "a \x0b b", "tab\there", "v\x0b\x0bw", "plain"]
        got_spark = [
            r.n
            for r in spark.createDataFrame([(d,) for d in docs], "text string")
            .select(normalize_text("text").alias("n"))
            .collect()
        ]
        con = duckdb.connect()
        got_duck = [
            con.execute(
                f"SELECT {sql_normalize_text('?::VARCHAR')}"
                .replace("?::VARCHAR", "$1")
            , [d]).fetchone()[0]
            for d in docs
        ]
        assert got_spark == got_duck


class TestChunkWindows:
    def _chunks(self, spark, texts):
        import ting_data_etl_spark.operators.text_queries as tq
        from ting_data_etl_spark.functions.text import portable_hash31, tokens
        from pyspark.sql import functions as F

        d = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        tok = d.select("doc_id", tokens(F.col("text")).alias("toks"))
        n = F.size("toks")
        n_chunks = F.when(n <= tq.CHUNK_TOKENS, F.lit(1)).otherwise(
            F.ceil((n - tq.CHUNK_TOKENS) / F.lit(tq.CHUNK_STRIDE)).cast("int") + 1
        )
        out = (
            tok.filter(n > 0)
            .select(
                "doc_id",
                F.posexplode(
                    F.transform(
                        F.sequence(F.lit(0), n_chunks - 1),
                        lambda i: F.slice(
                            F.col("toks"), i * tq.CHUNK_STRIDE + 1, tq.CHUNK_TOKENS
                        ),
                    )
                ).alias("chunk_idx", "chunk"),
            )
        )
        rows = out.collect()
        return {(r.doc_id, r.chunk_idx): list(r.chunk) for r in rows}

    def test_edge_shapes(self, spark):
        import ting_data_etl_spark.operators.text_queries as tq

        C, S = tq.CHUNK_TOKENS, tq.CHUNK_STRIDE
        texts = [
            "",                                  # 0 tokens -> 0 chunks
            "one",                               # 1 token -> 1 chunk
            " ".join(f"w{i}" for i in range(C)),       # exactly C -> 1 chunk
            " ".join(f"w{i}" for i in range(C + 1)),   # C+1 -> 2 chunks
            " ".join(f"w{i}" for i in range(3 * S + C)),  # 4 chunks
        ]
        got = self._chunks(spark, texts)
        per_doc = {}
        for (d, i), chunk in got.items():
            per_doc.setdefault(d, []).append((i, chunk))
        assert 0 not in per_doc                      # empty doc: no chunks
        assert len(per_doc[1]) == 1 and per_doc[1][0][1] == ["one"]
        assert len(per_doc[2]) == 1 and len(per_doc[2][0][1]) == C
        assert len(per_doc[3]) == 2
        # second chunk of doc 3 starts at token S and holds the C+1-S tail
        tail = sorted(per_doc[3])[1][1]
        assert tail == [f"w{i}" for i in range(S, C + 1)]
        assert len(per_doc[4]) == 4

    def test_consecutive_chunks_overlap(self, spark):
        import ting_data_etl_spark.operators.text_queries as tq

        C, S = tq.CHUNK_TOKENS, tq.CHUNK_STRIDE
        text = " ".join(f"w{i}" for i in range(2 * S + C))
        got = self._chunks(spark, [text])
        chunks = [c for (_, i), c in sorted(got.items(), key=lambda kv: kv[0])]
        for a, b in zip(chunks, chunks[1:]):
            assert a[S:] == b[: C - S]  # the overlap region is shared

    def test_every_token_covered(self, spark):
        import ting_data_etl_spark.operators.text_queries as tq

        n = 3 * tq.CHUNK_STRIDE + 7
        text = " ".join(f"w{i}" for i in range(n))
        got = self._chunks(spark, [text])
        covered = set()
        for chunk in got.values():
            covered.update(chunk)
        assert covered == {f"w{i}" for i in range(n)}


class TestChunkBoilerplate:
    def test_shared_paragraph_detected_across_distinct_docs(self, spark, tmp_path):
        import ting_data_etl_spark.operators.text_queries as tq

        C = tq.CHUNK_TOKENS
        shared = " ".join(f"b{i}" for i in range(C))  # one full shared window
        docs = [
            (1, shared + " " + " ".join(f"x{i}" for i in range(C))),
            (2, shared + " " + " ".join(f"y{i}" for i in range(C))),
            (3, " ".join(f"z{i}" for i in range(C))),  # unique content
        ]
        import pyspark.sql.functions as F

        from ting_data_etl_spark.functions.text import portable_hash31, tokens

        d = spark.createDataFrame(docs, "doc_id long, text string")
        toks = d.select("doc_id", tokens(F.col("text")).alias("toks"))
        # doc 1 and 2's FIRST chunk is exactly the shared window
        first = toks.select(
            "doc_id",
            portable_hash31(
                F.concat_ws(" ", F.slice("toks", 1, C))
            ).alias("h"),
        ).collect()
        h = {r.doc_id: r.h for r in first}
        assert h[1] == h[2] != h[3]


class TestRepeatedSubstrings:
    """Planted-span fixture for the substring-granular dedup pass."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_unaligned_shared_span_found_maximal(self, spark):
        """A 20-token span shared at DIFFERENT offsets (the case
        fixed-stride chunking misses) comes back as one maximal span per
        doc with exact boundaries."""
        from ting_data_etl_spark.operators.text_queries import (
            REPEAT_L,
            repeated_substring_spans,
        )

        span = " ".join(f"shared{i}" for i in range(20))
        a_prefix = " ".join(f"apre{i}" for i in range(5))
        b_suffix = " ".join(f"bsuf{i}" for i in range(9))
        docs = self._docs(
            spark,
            [
                (1, f"{a_prefix} {span}"),          # span at offset 5
                (2, f"{span} {b_suffix}"),          # span at offset 0
                (3, "totally unrelated words only here"),
            ],
        )
        got = {
            r.doc_id: (r.span_start, r.span_end, r.span_tokens)
            for r in repeated_substring_spans(docs).collect()
        }
        assert got == {1: (5, 25, 20), 2: (0, 20, 20)}
        assert REPEAT_L <= 20  # fixture assumes span >= window

    def test_within_doc_repeat_not_reported(self, spark):
        """Cross-document contract: a span repeated twice inside ONE doc
        has n_distinct_docs = 1 and is excluded."""
        from ting_data_etl_spark.operators.text_queries import (
            repeated_substring_spans,
        )

        span = " ".join(f"dup{i}" for i in range(10))
        docs = self._docs(
            spark,
            [
                (1, f"{span} middle filler words {span}"),
                (2, "entirely different content with no overlap at all"),
            ],
        )
        assert repeated_substring_spans(docs).count() == 0

    def test_short_docs_yield_no_windows(self, spark):
        from ting_data_etl_spark.operators.text_queries import (
            REPEAT_L,
            repeated_substring_spans,
        )

        short = " ".join(f"w{i}" for i in range(REPEAT_L - 1))
        docs = self._docs(spark, [(1, short), (2, short), (3, None)])
        # identical docs, but both shorter than the anchor window: no
        # anchors exist, so no spans (substring dedup's floor — exact
        # dedup catches these)
        assert repeated_substring_spans(docs).count() == 0

    def test_two_separated_spans_stay_separate(self, spark):
        """Two shared spans with a non-shared gap must NOT merge."""
        from ting_data_etl_spark.operators.text_queries import (
            repeated_substring_spans,
        )

        s1 = " ".join(f"one{i}" for i in range(10))
        s2 = " ".join(f"two{i}" for i in range(10))
        docs = self._docs(
            spark,
            [
                (1, f"{s1} gapa gapb gapc {s2}"),
                (2, f"{s2} xfill yfill zfill {s1}"),
            ],
        )
        rows = repeated_substring_spans(docs).collect()
        by_doc: dict[int, list] = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(
                (r.span_start, r.span_end, r.span_tokens)
            )
        assert sorted(by_doc[1]) == [(0, 10, 10), (13, 23, 10)]
        assert sorted(by_doc[2]) == [(0, 10, 10), (13, 23, 10)]


class TestNgramNovelty:
    def test_copy_has_zero_novelty(self, spark, tmp_path):
        from tests.test_dedup import _write_mini_docs
        from ting_data_etl_spark.operators.text_queries import (
            text_ngram_novelty,
        )

        fresh = " ".join(f"new{i}" for i in range(12))
        mixed_new = " ".join(f"half{i}" for i in range(12))
        sf = _write_mini_docs(
            spark,
            tmp_path,
            [
                (1, fresh, "s1"),
                (2, fresh, "s1"),          # verbatim copy -> novelty 0
                (3, f"{fresh} {mixed_new}", "s1"),  # part old, part new
                (4, None, "s1"),           # zero-token -> absent
            ],
        )
        got = {r.doc_id: r for r in text_ngram_novelty(spark, sf).collect()}
        assert set(got) == {1, 2, 3}
        assert got[1].novelty == 1.0
        assert got[2].novelty == 0.0
        assert 0.0 < got[3].novelty < 1.0
        # every shingle of doc 3 is either doc-1 content or new
        assert got[3].n_novel < got[3].n_shingles
