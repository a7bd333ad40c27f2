"""Text-analysis expressions for training-data pipelines.

No reference-side counterpart (the reference has no text analytics); these are
the SURVEY.md §7.4 extension operators. Everything is built from JVM-side
builtins (``split``, ``regexp_*``, higher-order array functions) so the hot
path never leaves whole-stage codegen. Hash-based fingerprints use ``md5``
(portable: DuckDB computes the identical digest, enabling oracle checks) with
``xxhash64`` offered as the faster JVM-native alternative at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic. Deliberately small and hard-coded so the same lists can be
#: embedded in oracle SQL.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"],
    "de": ["der", "die", "und", "das", "ist", "von", "ein", "mit", "den", "zu"],
}


#: Explicit whitespace class, spelled out because the two regex engines
#: disagree on ``\s``: Java (Spark) includes vertical tab U+000B, RE2
#: (DuckDB oracles) does not. One byte-identical class on BOTH sides keeps
#: fingerprints/tokenization engine-portable for VT-bearing documents.
#: (``plans.oracles`` interpolates this same constant into the SQL twins.)
WS_CHARS = "\\t\\n\\x0B\\f\\r "


def normalize_text(col: Column | str) -> Column:
    """Lowercase, collapse whitespace, trim — canonical form for dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), f"[{WS_CHARS}]+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace/punctuation tokenizer → array<string> (empty tokens dropped)."""
    c = normalize_text(col)
    return F.filter(F.split(c, r"[^\p{L}\p{N}]+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    """Whitespace-ish token count (BPE-approximate budget proxy)."""
    return F.size(tokens(col))


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles (space-joined) → array<string>.

    Built with ``transform`` over token indices — stays JVM-side. Documents
    shorter than *n* tokens yield the whole document as a single shingle.
    """
    toks = tokens(col)
    k = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )


def char_ngrams(col: Column | str, n: int = 5) -> Column:
    """Character n-gram shingles over the normalized text → array<string>."""
    c = normalize_text(col)
    k = F.greatest(F.length(c) - (n - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), k), lambda i: F.substring(c, i, n))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not letters/digits/whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.length(c)
    punct = total - F.length(
        F.regexp_replace(c, f"[^\\p{{L}}\\p{{N}}{WS_CHARS}]", "")
    )
    return F.when(total > 0, punct.cast("double") / total).otherwise(F.lit(0.0))


def _contains_any(sw: Column):
    """Single-arg lambda factory (Spark HOFs reject extra closure params)."""
    return lambda t: F.array_contains(sw, t)


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of *lang*."""
    toks = tokens(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, _contains_any(sw)))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks)).otherwise(
        F.lit(0.0)
    )


def quality_score(col: Column | str) -> Column:
    """Composite document-quality heuristic in [0, 1].

    Blend of length band (50-2000 chars), low punctuation ratio, and
    stopword presence — the standard cheap pre-filters a pretraining
    pipeline applies before expensive model-based scoring.
    """
    return quality_checks(col).cast("double") / 3.0


def quality_checks(col: Column | str) -> Column:
    """INTEGER count (0..3) of passed quality gates.

    The exact-arithmetic core shared by :func:`quality_score` (÷3 to the
    usual [0,1] score) and the quality-weighted sampler (×30 to an accept
    percentage) — integer so downstream thresholds never ride on a
    float→int cast whose truncation/rounding semantics differ between
    engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    length_ok = ((n >= 50) & (n <= 2000)).cast("int")
    punct_ok = (punct_ratio(c) <= 0.2).cast("int")
    sw_ok = (stopword_ratio(c) >= 0.05).cast("int")
    return length_ok + punct_ok + sw_ok


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts (the language-ID signal)."""
    toks = tokens(col)
    out: dict[str, Column] = {}
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, _contains_any(sw)))
    return out


def lang_id(col: Column | str) -> Column:
    """Stopword-vote language ID → 'en'/'es'/'fr'/'de', 'und' when no votes.

    Ties break deterministically by language-code order (asc) to keep the
    oracle comparison stable.
    """
    scores = lang_scores(col)
    pairs = F.array(
        *[
            F.struct(scores[lang].alias("hits"), F.lit(lang).alias("lang"))
            for lang in sorted(STOPWORDS)
        ]
    )
    max_hits = F.array_max(F.transform(pairs, lambda p: p["hits"]))
    winner = F.array_min(
        F.transform(
            F.filter(pairs, lambda p: p["hits"] == max_hits), lambda p: p["lang"]
        )
    )
    return F.when(max_hits > 0, winner).otherwise(F.lit("und"))


#: "BPE-ish" pre-tokenizer pattern: letter runs are one token, each digit is
#: its own token (GPT-style digit splitting), every other non-space symbol is
#: its own token. ASCII classes only so Java regex (Spark) and RE2 (DuckDB)
#: agree byte for byte — the whitespace is the shared explicit ``WS_CHARS``
#: class because ``\s`` itself is NOT engine-portable (Java includes
#: U+000B, RE2 does not; this pattern is interpolated verbatim into the
#: DuckDB twin, so a VT char would count as a token in one engine only).
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9" + WS_CHARS + "]"


def bpe_token_count(col: Column | str) -> Column:
    """Token count under the BPE-ish pre-tokenizer (LLM token-budget proxy).

    A closer proxy to real BPE token counts than whitespace words: numbers
    cost one token per digit and punctuation is never free. One JVM
    ``regexp_extract_all`` — stays in codegen, no UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_PATTERN), F.lit(0)))


#: 2³¹−1 — the modulus of every 31-bit portable hash in the repo. ONE
#: constant: the dedup shingle hash, the winnow/curation fingerprints and
#: their SQL twins all key off it, so a retune (or an xxhash64 swap) moves
#: every family together instead of silently splitting them.
MERSENNE_31 = 2_147_483_647


def portable_hash31(col: Column) -> Column:
    """31-bit integer hash both engines compute identically.

    First 8 hex chars of md5 → int, mod 2³¹−1. THE shingle/fingerprint
    hash — dedup's ``_shingle_hash_spark`` delegates here; at 100 TB swap
    ``xxhash64`` (JVM-native, no hex round-trip) for the same plan shape.
    """
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).try_cast("long")
        % MERSENNE_31
    )


WINNOW_K = 8  # char k-gram size
WINNOW_W = 4  # winnowing window (hashes per window)


def winnow_fingerprints(
    col: Column | str, k: int = WINNOW_K, w: int = WINNOW_W
) -> Column:
    """Winnowed rolling-hash fingerprints → array<long> (distinct).

    The Schleimer/Wilkerson/Aiken winnowing scheme (MOSS): hash every char
    *k*-gram of the normalized text, slide a window of *w* hashes, keep each
    window's minimum. Guarantees any shared substring of length ≥ k+w−1
    yields a shared fingerprint, while storing only ~2/(w+1) of the hashes —
    the standard local document fingerprint for near-dup/plagiarism search.
    Pure higher-order functions; per-doc arrays are bounded by document
    length (pipelines chunk documents upstream).
    """
    hashes = F.transform(char_ngrams(col, k), portable_hash31)
    nwin = F.greatest(F.size(hashes) - (w - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), nwin - 1),
            lambda i: F.array_min(F.slice(hashes, i + 1, w)),
        )
    )


def doc_fingerprint_md5(col: Column | str) -> Column:
    """Content fingerprint: md5 hex of the normalized text.

    md5 is computed identically by DuckDB, making this oracle-checkable; at
    100 TB scale swap in :func:`doc_fingerprint_fast` (xxhash64, ~5× faster,
    JVM-native) — same dedup semantics, engine-specific digest.
    """
    return F.md5(normalize_text(col))


def doc_fingerprint_fast(col: Column | str) -> Column:
    """xxhash64 fingerprint — the at-scale default (not oracle-portable)."""
    return F.xxhash64(normalize_text(col))


def content_hash(col: Column | str) -> Column:
    """Portable per-row content hash: md5-derived, folded to < 10⁹ so a
    BIGINT SUM holds ~9×10⁹ rows before overflow (ANSI mode errors on
    overflow rather than wrapping — the fold keeps the headroom explicit).

    SQL twin: ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT) % 1000000000``.
    ONE definition shared by the jsonl source and the compaction checksum —
    a change to the fold width/modulus must move both with their oracles.
    """
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).try_cast("long")
        % 1_000_000_000
    )
