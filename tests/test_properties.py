"""Hypothesis property tests for the cleaning expressions (SURVEY §5.3).

The reference's correctness strategy is generator + invariant; these
properties pin the Spark expressions against an independent Python model of
the reference semantics over adversarial generated inputs. Each example
batch evaluates in ONE Spark job (a generated list becomes one DataFrame).
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ting_data_etl_spark.functions.cleaning import (
    NULL_SENTINELS,
    parse_month,
    to_number,
)

# messy-number-ish strings: digits, separators, %, sentinels, junk
_numberish = st.one_of(
    st.sampled_from(NULL_SENTINELS + ["  NULL ", " nan", "None "]),
    st.from_regex(r" ?-?[0-9]{1,3}(,[0-9]{3}){0,2}(\.[0-9]{1,4})? ?%?", fullmatch=True),
    st.text(alphabet="0123456789,.%- abc", max_size=12),
)

_monthish = st.one_of(
    st.from_regex(r"[0-9]{1,2}", fullmatch=True),
    st.from_regex(r"20[0-9]{2}[-/]?(0[1-9]|1[0-2])", fullmatch=True),
    st.text(alphabet="0123456789-/ 月", max_size=10),
)


def _model_to_number(s: str):
    t = s.strip()
    if t in NULL_SENTINELS:
        return None
    t = re.sub(r"[,%]", "", t)
    # model Spark's try_cast(double): strict float literal parse
    try:
        v = float(t)
    except ValueError:
        return None
    return v


def _model_parse_month(s: str):
    digits = re.sub(r"[^0-9]", "", s.strip())
    mm = digits[-2:] if len(digits) >= 6 else digits
    if not mm or len(mm) > 10:
        return None
    try:
        m = int(mm)
    except ValueError:
        return None
    return m if 1 <= m <= 12 else None


class TestCleaningProperties:
    @settings(
        max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
    )
    @given(st.lists(_numberish, min_size=1, max_size=60))
    def test_to_number_matches_model(self, spark, values):
        df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i long, v string")
        got = {r.i: r.out for r in df.select("i", to_number("v").alias("out")).collect()}
        for i, v in enumerate(values):
            want = _model_to_number(v)
            if want is None:
                assert got[i] is None, (v, got[i])
            else:
                assert got[i] is not None and abs(got[i] - want) < 1e-9, (v, got[i], want)

    @settings(
        max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
    )
    @given(st.lists(_monthish, min_size=1, max_size=60))
    def test_parse_month_matches_model(self, spark, values):
        df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i long, v string")
        got = {r.i: r.out for r in df.select("i", parse_month("v").alias("out")).collect()}
        for i, v in enumerate(values):
            assert got[i] == _model_parse_month(v), (v, got[i])


class TestWinnowingProperty:
    @settings(
        max_examples=4, deadline=None, suppress_health_check=list(HealthCheck)
    )
    @given(
        st.text(alphabet="abcdefg ", min_size=0, max_size=40),
        st.text(alphabet="hijklmn ", min_size=0, max_size=40),
        st.text(alphabet="opqrstu ", min_size=15, max_size=60),
    )
    def test_shared_substring_guarantee(self, spark, prefix, suffix, shared):
        """Winnowing guarantee: docs sharing a normalized substring of
        length >= k+w-1 always share at least one fingerprint."""
        from ting_data_etl_spark.functions.text import (
            WINNOW_K,
            WINNOW_W,
            normalize_text,
        )
        from ting_data_etl_spark.operators.text_queries import (
            winnow_fingerprints_df,
        )

        # normalize the shared chunk so insertion into different contexts
        # can't change it (collapse/strip whitespace)
        shared_n = re.sub(r"\s+", " ", shared).strip()
        if len(shared_n) < WINNOW_K + WINNOW_W - 1:
            return  # guarantee doesn't apply
        docs = spark.createDataFrame(
            [(1, f"{prefix} {shared_n} "), (2, f" {shared_n} {suffix}")],
            "doc_id long, text string",
        )
        fps = winnow_fingerprints_df(docs).collect()
        by_doc: dict[int, set] = {1: set(), 2: set()}
        for r in fps:
            by_doc[r.doc_id].add(r.fp)
        assert by_doc[1] & by_doc[2], (prefix, shared_n, suffix)


# --- curation metric properties --------------------------------------------
_textish = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "S", "Z", "Cc")
    ),
    max_size=200,
)


class TestCurationMetricProperties:
    """Adversarial-text invariants: metrics never throw (ANSI mode) and stay
    in their documented ranges for arbitrary unicode input."""

    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.lists(_textish, min_size=1, max_size=25))
    def test_gopher_and_repetition_bounds(self, spark, texts):
        from ting_data_etl_spark.operators.curation import (
            text_gopher_quality_rules,
            text_repetition_metrics,
        )

        import os
        import tempfile

        with tempfile.TemporaryDirectory() as tmp:
            rows = [
                (i, t, "en", "s", len(t)) for i, t in enumerate(texts)
            ]
            spark.createDataFrame(
                rows,
                "doc_id long, text string, lang string, source string, n_chars long",
            ).write.mode("overwrite").parquet(
                os.path.join(tmp, "documents.parquet")
            )
            gop = text_gopher_quality_rules(spark, tmp).collect()
            rep = text_repetition_metrics(spark, tmp).collect()
        assert len(gop) == len(texts) and len(rep) == len(texts)
        for r in gop:
            assert r.n_words >= 0
            assert r.passes_gopher in (0, 1)
            if r.n_words == 0:
                assert r.mean_word_len is None and r.passes_gopher == 0
            else:
                assert r.mean_word_len > 0
                assert 0.0 <= r.alpha_word_frac <= 1.0
                assert r.symbol_word_ratio >= 0.0
        for r in rep:
            if r.n_lines > 0:
                assert 0.0 <= r.dup_line_frac < 1.0
            if r.n_bigrams > 0:
                assert 0.0 < r.top_bigram_frac <= 1.0
            else:
                assert r.top_bigram_frac is None


class TestPiiRegexParity:
    """The PII patterns claim Java-regex (Spark) and RE2 (DuckDB) semantic
    identity. Fuzz the claim: over adversarial generated text, per-pattern
    match COUNTS and the fully REDACTED STRING must agree between engines.
    """

    _piiish = st.lists(
        st.one_of(
            st.text(
                alphabet="abzAZ09._%+-@ \t", max_size=24
            ),  # near-miss soup around the email alphabet
            st.from_regex(
                r"[a-z]{1,8}[._%+-]?[a-z0-9]{0,4}@[a-z0-9]{1,6}(\.[a-z]{1,4}){1,2}",
                fullmatch=True,
            ),
            st.from_regex(
                r"[0-9]{1,4}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,4}", fullmatch=True
            ),
            st.from_regex(r"[0-9]{8,17}", fullmatch=True),
            st.text(alphabet="0123456789. wx@", max_size=20),
        ),
        min_size=1,
        max_size=40,
    )

    @settings(
        max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
    )
    @given(_piiish)
    def test_counts_and_redaction_match_duckdb(self, spark, values):
        import duckdb

        import ting_data_etl_spark.operators.pii as pii

        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(values)], "i long, t string"
        )
        got = {
            r.i: (r.ne, r.ni, r.np, r.red)
            for r in df.select(
                "i",
                F.regexp_count("t", F.lit(pii.EMAIL_RE)).alias("ne"),
                F.regexp_count("t", F.lit(pii.IPV4_RE)).alias("ni"),
                F.regexp_count("t", F.lit(pii.PHONE_RE)).alias("np"),
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace("t", pii.EMAIL_RE, "<EMAIL>"),
                        pii.IPV4_RE,
                        "<IP>",
                    ),
                    pii.PHONE_RE,
                    "<PHONE>",
                ).alias("red"),
            ).collect()
        }
        con = duckdb.connect()
        for i, v in enumerate(values):
            ne, ni, np_, red = con.execute(
                f"""SELECT len(regexp_extract_all(?, '{pii.EMAIL_RE}')),
                           len(regexp_extract_all(?, '{pii.IPV4_RE}')),
                           len(regexp_extract_all(?, '{pii.PHONE_RE}')),
                           regexp_replace(regexp_replace(regexp_replace(
                             ?, '{pii.EMAIL_RE}', '<EMAIL>', 'g'),
                             '{pii.IPV4_RE}', '<IP>', 'g'),
                             '{pii.PHONE_RE}', '<PHONE>', 'g')""",
                [v, v, v, v],
            ).fetchone()
            assert got[i] == (ne, ni, np_, red), (v, got[i], (ne, ni, np_, red))


class TestBandedRunningSumProperty:
    """banded_running_sum ≡ the naive per-key window on ADVERSARIAL inputs:
    duplicate timestamps, NULL timestamps, negative times, single-row keys,
    constant times — under both linear and quantile banding."""

    @given(
        rows=st.lists(
            st.tuples(
                st.integers(0, 3),  # key
                st.one_of(st.none(), st.integers(-50, 50)),  # time (dup-heavy)
                st.integers(-5, 5),  # value
            ),
            min_size=0,
            max_size=60,
        ),
        use_quantile=st.booleans(),
    )
    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_matches_python_model(self, spark, rows, use_quantile):
        from ting_data_etl_spark.operators.skew import (
            banded_running_sum,
            quantile_band_cuts,
        )

        data = [(i, k, t, v) for i, (k, t, v) in enumerate(rows)]
        df = spark.createDataFrame(data, "i long, k long, t long, v long")
        cuts = quantile_band_cuts(df, "t", bands=4) if use_quantile else None
        got = {
            r.i: (r["__run"], r["__seq"])
            for r in banded_running_sum(
                df, key="k", order_time="t", order_tiebreak="i", value="v",
                bands=4, cuts=cuts,
            ).collect()
        }
        # python model: per key, NULLS FIRST asc by (t, i), running sum
        want = {}
        byk: dict = {}
        for i, k, t, v in data:
            byk.setdefault(k, []).append((i, t, v))
        for k, items in byk.items():
            items.sort(key=lambda x: (x[1] is not None, x[1] if x[1] is not None else 0, x[0]))
            run = 0
            for seq, (i, t, v) in enumerate(items, start=1):
                run += v
                want[i] = (run, seq)
        assert got == want


class TestChunkWindowProperty:
    @settings(
        max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
    )
    @given(st.lists(st.integers(min_value=0, max_value=210), min_size=1, max_size=30))
    def test_chunks_match_python_model(self, spark, token_counts):
        """For arbitrary per-doc token counts, the Spark chunking must
        equal the obvious Python sliding-window model: same chunk count,
        same window contents, full coverage, no phantom chunks."""
        from pyspark.sql import functions as F

        import ting_data_etl_spark.operators.text_queries as tq
        from ting_data_etl_spark.functions.text import tokens

        C, S = tq.CHUNK_TOKENS, tq.CHUNK_STRIDE
        docs = [
            (i, " ".join(f"t{i}x{j}" for j in range(n)))
            for i, n in enumerate(token_counts)
        ]
        d = spark.createDataFrame(docs, "doc_id long, text string")
        tok = d.select("doc_id", tokens(F.col("text")).alias("toks"))
        n = F.size("toks")
        n_chunks = F.when(n <= C, F.lit(1)).otherwise(
            F.ceil((n - C) / F.lit(S)).cast("int") + 1
        )
        got = {}
        rows = (
            tok.filter(n > 0)
            .select(
                "doc_id",
                F.posexplode(
                    F.transform(
                        F.sequence(F.lit(0), n_chunks - 1),
                        lambda i: F.slice(F.col("toks"), i * S + 1, C),
                    )
                ).alias("idx", "chunk"),
            )
            .collect()
        )
        for r in rows:
            got[(r.doc_id, r.idx)] = list(r.chunk)

        # python model
        want = {}
        for i, cnt in enumerate(token_counts):
            toks_py = [f"t{i}x{j}" for j in range(cnt)]
            if not toks_py:
                continue
            k = 1 if cnt <= C else -(-(cnt - C) // S) + 1
            for idx in range(k):
                want[(i, idx)] = toks_py[idx * S : idx * S + C]
        assert got == want
