"""Text-analysis queries over ``documents`` (SURVEY.md §7.4 extension).

Language-ID (stopword votes), quality scoring (length/punct/stopword
bands), token counting, and fingerprinting — the cheap pre-filters of a
pretraining data pipeline. All JVM-side expressions from
:mod:`ting_data_etl_spark.functions.text`; oracle twins reproduce the exact
arithmetic in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ting_data_etl_spark.functions.text import (
    BPE_TOKEN_PATTERN,
    STOPWORDS,
    WINNOW_K,
    WINNOW_W,
    bpe_token_count,
    normalize_text,
    quality_score,
    token_count,
)
from ting_data_etl_spark.functions.text import WS_CHARS
from ting_data_etl_spark.plans.oracles import SQL_TOKEN_LIST, sql_normalize_text
from ting_data_etl_spark.registry import register
from ting_data_etl_spark.sources.tables import load_table

_SQL_TOKS = f"""
tok AS (
  SELECT doc_id, lang, source, n_chars, text,
         {SQL_TOKEN_LIST} AS toks
  FROM documents
)
"""


def _sql_list(words: list[str]) -> str:
    inner = ", ".join(f"'{w}'" for w in words)
    return f"[{inner}]"


def _sql_hits(lang: str) -> str:
    return (
        f"len(list_filter(toks, t -> list_contains({_sql_list(STOPWORDS[lang])}, t)))"
    )


# --- token counts ----------------------------------------------------------
_SQL_TOKEN_COUNT = f"""
WITH {_SQL_TOKS}
SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens, n_chars
FROM tok
"""


@register("text_token_count", oracle=_SQL_TOKEN_COUNT)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", token_count("text").alias("n_tokens"), "n_chars")


# --- BPE-ish token budget --------------------------------------------------
_SQL_BPE_COUNT = f"""
WITH {_SQL_TOKS},
b AS (
  SELECT doc_id, toks,
         length(text) AS n,
         len(regexp_extract_all(text, '{BPE_TOKEN_PATTERN}')) AS n_bpe
  FROM tok
)
SELECT doc_id,
       CAST(n_bpe AS INTEGER) AS n_bpe_tokens,
       CAST(len(toks) AS INTEGER) AS n_ws_tokens,
       CASE WHEN n_bpe > 0 THEN CAST(n AS DOUBLE) / n_bpe END AS chars_per_token
FROM b
"""


@register("text_bpe_token_count", oracle=_SQL_BPE_COUNT)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budget under the BPE-ish pre-tokenizer vs whitespace words.

    ``chars_per_token`` is the compression-rate proxy curation pipelines use
    to spot pathological documents (symbol soup tokenizes near 1 char/token,
    prose near 4-5). One scan, two regexes, zero UDFs/shuffles — the plan is
    a pure map at any scale.
    """
    d = load_table(spark, sf_dir, "documents")
    n_bpe = bpe_token_count("text")
    return d.select(
        "doc_id",
        n_bpe.alias("n_bpe_tokens"),
        token_count("text").alias("n_ws_tokens"),
        F.when(n_bpe > 0, F.length("text").cast("double") / n_bpe).alias(
            "chars_per_token"
        ),
    )


# --- winnowed rolling-hash fingerprints ------------------------------------
# DuckDB twin of functions.text.portable_hash31 — the shared builder
from ting_data_etl_spark.plans.oracles import sql_shingle_hash as _sql_sh

_sql_shingle_hash_g = _sql_sh("g")

_SQL_WINNOW = f"""
WITH nrm AS (
  SELECT doc_id, {sql_normalize_text()} AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
         list_transform(range(1, greatest(length(t) - {WINNOW_K - 1}, 1) + 1),
                        i -> substr(t, i, {WINNOW_K})) AS gs
  FROM nrm
),
hx AS (
  SELECT doc_id,
         list_transform(gs, g -> {_sql_shingle_hash_g}) AS hs
  FROM grams
),
win AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(0, greatest(len(hs) - {WINNOW_W - 1}, 1)),
           i -> list_min(list_slice(hs, i + 1, i + {WINNOW_W})))) AS fps
  FROM hx
)
SELECT doc_id, unnest(fps) AS fp FROM win
"""


def winnow_fingerprints_df(
    docs: DataFrame,
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """(doc_id, fp) winnowed fingerprints — the dataset formulation.

    The expression form (:func:`winnow_fingerprints`) materializes a hash
    array per document and a *sliced copy per window* — O(len·w) interpreted
    work that dominates on multi-KB documents. This form explodes the char
    k-grams with their position, hashes them inside codegen, and takes each
    window's minimum with ONE running ``min`` over a
    ``rowsBetween(0, w-1)`` window — a single shuffle on doc_id and zero
    array copies. Output is identical (parity pytest-pinned); positions
    past ``nwin-1`` are trailing partial windows the winnowing definition
    excludes.
    """
    from pyspark.sql import Window

    from ting_data_etl_spark.functions.text import portable_hash31

    nrm = docs.select("doc_id", normalize_text(F.col(text_col)).alias("t"))
    # OPTIMIZATION r15 (guide §2.3/§2.5): the running-min window below
    # needs a doc_id hash exchange ANYWAY — but placed after the explode
    # it shuffles one (pos, hash) row PER CHARACTER, and everything
    # upstream (explode + substr + md5 per gram) runs inside the scan
    # stage, which a single-row-group input pins to ONE task. Exchanging
    # the compact (doc_id, text) rows FIRST moves strictly fewer bytes
    # through the same single shuffle and spreads the per-gram hashing
    # across the cluster at any input layout (see fan_out_by).
    from ting_data_etl_spark.sources.tables import fan_out_by

    nrm = fan_out_by(nrm, "doc_id")
    n_grams = F.greatest(F.length("t") - (k - 1), F.lit(1))
    nwin = F.greatest(n_grams - (w - 1), F.lit(1))
    # explode positions, not a pre-built gram array: sequence/explode/
    # substring/md5 all stay inside whole-stage codegen, and the document
    # text is pipelined row-at-a-time (dropped before the shuffle) instead
    # of allocating a len(text)-element string array per document
    ex = nrm.select(
        "doc_id",
        nwin.alias("nwin"),
        "t",
        F.explode(F.sequence(F.lit(0), n_grams - 1)).alias("pos"),
    )
    hx = ex.select(
        "doc_id",
        "nwin",
        "pos",
        portable_hash31(F.col("t").substr(F.col("pos") + 1, F.lit(k))).alias("h"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    mins = hx.select(
        "doc_id", "pos", "nwin", F.min("h").over(win).alias("fp")
    )
    return (
        mins.filter(F.col("pos") <= F.col("nwin") - 1)
        .select("doc_id", "fp")
        .distinct()
    )


@register("text_winnow_fingerprints", oracle=_SQL_WINNOW)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed (MOSS-style) rolling-hash fingerprints per document.

    The local-fingerprint complement to whole-doc hashing: any shared
    substring of ≥ k+w−1 chars produces a shared fingerprint, so a
    group-by on ``fp`` finds partial-overlap/quote-level duplication that
    document-level fingerprints miss. Downstream plan is the same
    shared-key self-join as the shingle pipelines (with the same
    hot-bucket cap); this query materializes the fingerprint relation
    itself, whose shuffle key is an 8-byte int.
    """
    d = load_table(spark, sf_dir, "documents")
    return winnow_fingerprints_df(d)


# --- quality score ---------------------------------------------------------
_SQL_QUALITY = f"""
WITH {_SQL_TOKS},
m AS (
  SELECT doc_id,
         length(text) AS n,
         length(text) - length(regexp_replace(text, '[^\\p{{L}}\\p{{N}}{WS_CHARS}]', '', 'g'))
           AS n_punct,
         len(toks) AS n_toks,
         {_sql_hits("en")} AS en_hits
  FROM tok
)
SELECT doc_id,
       (
         (CASE WHEN n BETWEEN 50 AND 2000 THEN 1.0 ELSE 0.0 END) +
         (CASE WHEN (CASE WHEN n > 0 THEN CAST(n_punct AS DOUBLE) / n ELSE 0.0 END) <= 0.2
               THEN 1.0 ELSE 0.0 END) +
         (CASE WHEN (CASE WHEN n_toks > 0 THEN CAST(en_hits AS DOUBLE) / n_toks ELSE 0.0 END) >= 0.05
               THEN 1.0 ELSE 0.0 END)
       ) / 3.0 AS quality
FROM m
"""


@register("text_quality_score", oracle=_SQL_QUALITY)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score("text").alias("quality"))


# --- language ID -----------------------------------------------------------
def _sql_langid() -> str:
    langs = sorted(STOPWORDS)
    hits = {lang: _sql_hits(lang) for lang in langs}
    greatest = "greatest(" + ", ".join(f"h_{lang}" for lang in langs) + ")"
    # smallest lang code among those achieving max hits
    first_match = "CASE " + " ".join(
        f"WHEN h_{lang} = mx THEN '{lang}'" for lang in langs
    ) + " END"
    hit_cols = ", ".join(f"{hits[lang]} AS h_{lang}" for lang in langs)
    return f"""
WITH {_SQL_TOKS},
h AS (SELECT doc_id, lang, {hit_cols} FROM tok),
m AS (SELECT *, {greatest} AS mx FROM h)
SELECT doc_id, lang AS lang_actual,
       CASE WHEN mx > 0 THEN {first_match} ELSE 'und' END AS lang_pred
FROM m
"""


@register("text_lang_id", oracle=_sql_langid())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID, dataset form.

    The expression form (:func:`ting_data_etl_spark.functions.text.lang_id`)
    re-tokenizes per language and filters with interpreted HOF lambdas; this
    form explodes tokens ONCE and scores all languages with codegen ``isin``
    case-sums in a single hash aggregate — one shuffle on doc_id. Same
    votes, same deterministic tie-break (smallest language code), identical
    output (both sides check against the same oracle).
    """
    from ting_data_etl_spark.functions.text import tokens

    langs = sorted(STOPWORDS)
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        F.explode_outer(tokens(F.col("text"))).alias("t"),
    )
    aggs = [
        F.sum(
            F.when(F.col("t").isin(STOPWORDS[lang]), 1).otherwise(0)
        ).alias(f"h_{lang}")
        for lang in langs
    ]
    h = tok.groupBy("doc_id", "lang_actual").agg(*aggs)
    mx = F.greatest(*[F.col(f"h_{lang}") for lang in langs])
    pred = None
    for lang in langs:
        cond = F.col(f"h_{lang}") == mx
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return h.select(
        "doc_id",
        "lang_actual",
        F.when(mx > 0, pred).otherwise(F.lit("und")).alias("lang_pred"),
    )


# --- per-source corpus profile (composite rollup) --------------------------
_SQL_PROFILE = f"""
WITH {_SQL_TOKS},
m AS (
  SELECT source,
         len(toks) AS n_toks,
         length(text) AS n,
         length(text) - length(regexp_replace(text, '[^\\p{{L}}\\p{{N}}{WS_CHARS}]', '', 'g'))
           AS n_punct
  FROM tok
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       CAST(SUM(n) AS BIGINT) AS total_chars,
       CAST(CAST(SUM(n_punct) AS BIGINT) AS DOUBLE) / CAST(SUM(n) AS BIGINT)
         AS punct_ratio
FROM m GROUP BY source
"""


@register("text_corpus_profile", oracle=_SQL_PROFILE)
def text_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus statistics — the rollup a curation dashboard reads."""
    d = load_table(spark, sf_dir, "documents")
    n = F.length("text")
    n_punct = n - F.length(F.regexp_replace(F.col("text"), r"[^\p{L}\p{N}\s]", ""))
    m = d.select(
        "source",
        token_count("text").alias("n_toks"),
        n.alias("n"),
        n_punct.alias("n_punct"),
    )
    return m.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").alias("total_tokens"),
        F.sum("n").alias("total_chars"),
        # when() guard: a zero-char source (all-empty docs) must yield NULL
        # like the oracle's BIGINT division, not an ANSI DIVIDE_BY_ZERO
        F.when(
            F.sum("n") > 0, F.sum("n_punct").cast("double") / F.sum("n")
        ).alias("punct_ratio"),
    )


# --- corpus vocabulary: top tokens -----------------------------------------
TOP_TOKENS = 20

_SQL_TOP_TOKENS = f"""
WITH {_SQL_TOKS},
t AS (SELECT unnest(toks) AS tok FROM tok),
c AS (SELECT tok, COUNT(*) AS n FROM t GROUP BY tok)
SELECT tok, n FROM c
ORDER BY n DESC, tok ASC LIMIT {TOP_TOKENS}
"""


@register("text_top_tokens", oracle=_SQL_TOP_TOKENS)
def text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-{TOP_TOKENS} tokens — the corpus vocabulary head.

    explode → count → ``TakeOrderedAndProject`` (per-partition heaps, no
    global sort); deterministic tiebreak on the token itself. The shape a
    tokenizer-training or stopword-mining pass runs first. At 100 TB the
    count's map-side partial aggregation is what keeps the shuffle at
    |vocab| rows, not |corpus| tokens.
    """
    from ting_data_etl_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    t = d.select(F.explode(tokens(F.col("text"))).alias("tok"))
    return (
        t.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(TOP_TOKENS)
    )


# --- TF-IDF top terms ------------------------------------------------------
TFIDF_TOP = 3

_SQL_TFIDF = f"""
WITH {_SQL_TOKS},
tf AS (
  SELECT doc_id, t AS token, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS t FROM tok)
  GROUP BY 1, 2
),
dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token,
         CAST(tf.tf AS BIGINT) AS tf,
         CAST(dfreq.df AS BIGINT) AS df,
         CAST(tf.tf AS DOUBLE) * (n.n_docs + 1) / (dfreq.df + 1) AS score
  FROM tf JOIN dfreq USING (token) CROSS JOIN n
)
SELECT doc_id, token, tf, df, score
FROM (
  SELECT *, row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rn
  FROM scored
) WHERE rn <= {TFIDF_TOP}
"""


@register("text_tfidf_top_terms", oracle=_SQL_TFIDF)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TFIDF_TOP} TF-IDF terms per document — the keyword-extraction pass.

    The corpus-statistics join-back shape: term frequency per (doc, token),
    document frequency derived FROM the tf relation (one extra aggregation
    over rows already shuffled by token — no second corpus scan), then a
    rational idf weight ``tf·(N+1)/(df+1)``. The weight stays a single IEEE
    divide over exact integers so both engines score bit-identically —
    ``ln``-based idf would differ in the last ULP between libm and DuckDB.
    Map-side combine keeps both aggregations at |vocab|-scale shuffles; the
    final per-doc top-k is one row_number window with a total tie-break.
    """
    from pyspark.sql import Window

    from ting_data_etl_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    n_docs = d.select(F.count("*").alias("n_docs"))
    tf = (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            (
                F.col("tf").cast("double")
                * (F.col("n_docs") + 1)
                / (F.col("df") + 1)
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TFIDF_TOP)
        .drop("rn")
    )


# --- sliding-window chunking (context-window precursor) --------------------
#: Token-window chunking constants. Pretraining pipelines split long
#: documents into overlapping windows BEFORE packing them into fixed-length
#: sequences (the overlap preserves cross-boundary context); chunk-level
#: hashes also drive chunk-granular dedup. Small values so the sf0.01
#: corpus (avg ~10² tokens/doc) produces multi-chunk docs worth testing.
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive windows

def _sql_chunks_cte() -> str:
    """Chunk rows as a CTE chain ending in ``ch`` — built at CALL time so
    a CHUNK_TOKENS/CHUNK_STRIDE retune keeps both engines in lockstep
    (the minhash-family convention)."""
    return f"""
WITH {_SQL_TOKS},
nz AS (
  SELECT doc_id, toks, len(toks) AS n FROM tok WHERE len(toks) > 0
),
c AS (
  SELECT doc_id, toks,
         CASE WHEN n <= {CHUNK_TOKENS} THEN 1
              ELSE CAST(ceil(CAST(n - {CHUNK_TOKENS} AS DOUBLE)
                             / {CHUNK_STRIDE}) AS BIGINT) + 1 END AS n_chunks
  FROM nz
),
e AS (
  SELECT doc_id, CAST(t.i AS INTEGER) AS chunk_idx,
         list_slice(toks, t.i * {CHUNK_STRIDE} + 1,
                    t.i * {CHUNK_STRIDE} + {CHUNK_TOKENS}) AS chunk
  FROM c, UNNEST(range(0, c.n_chunks)) AS t(i)
),
ch AS (
  SELECT doc_id, chunk_idx,
         CAST(len(chunk) AS INTEGER) AS n_tokens,
         {_sql_sh("array_to_string(chunk, ' ')")} AS chunk_hash
  FROM e
)"""


def _sql_chunks() -> str:
    return f"""
{_sql_chunks_cte()}
SELECT doc_id, chunk_idx, n_tokens, chunk_hash FROM ch
"""


@register("text_chunk_windows", oracle=_sql_chunks)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping CHUNK_TOKENS-token windows.

    Window *i* covers tokens ``[i·stride, i·stride + chunk)``; the final
    window may be partial; zero-token documents yield zero chunks. Output
    one row per chunk with its token count and a portable 31-bit content
    hash (chunk-granular dedup key, same shared hash as the shingle
    family).

    Plan shape: tokenize → per-row window count → ``posexplode`` of sliced
    windows — a pure one-pass map with NO shuffle and no UDF (array ops
    stay JVM-side), so at 100 TB it scales with scan bandwidth exactly
    like the token-count queries. ``n <= 0`` rows are filtered BEFORE the
    ``sequence()`` call: ``sequence(0, -1)`` would generate a descending
    range, not an empty one.
    """
    from ting_data_etl_spark.functions.text import portable_hash31, tokens

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    n = F.size("toks")
    n_chunks = F.when(n <= CHUNK_TOKENS, F.lit(1)).otherwise(
        F.ceil((n - CHUNK_TOKENS) / F.lit(CHUNK_STRIDE)).cast("int") + 1
    )
    exploded = (
        tok.filter(n > 0)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: F.slice(
                        F.col("toks"), i * CHUNK_STRIDE + 1, CHUNK_TOKENS
                    ),
                )
            ).alias("chunk_idx", "chunk"),
        )
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size("chunk").alias("n_tokens"),
        portable_hash31(F.concat_ws(" ", F.col("chunk"))).alias("chunk_hash"),
    )


#: A chunk is "boilerplate" when it appears verbatim in at least this many
#: DISTINCT documents (template headers, license blocks, cookie banners).
BOILERPLATE_MIN_DOCS = 2


def _sql_chunk_boilerplate() -> str:
    return f"""
{_sql_chunks_cte()}
SELECT chunk_hash,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       MIN(doc_id) AS min_doc_id
FROM ch
GROUP BY chunk_hash
HAVING COUNT(DISTINCT doc_id) >= {BOILERPLATE_MIN_DOCS}
"""


@register("dedup_chunk_boilerplate", oracle=_sql_chunk_boilerplate)
def dedup_chunk_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated windows: chunk-granular boilerplate detection.

    Where document-level dedup finds whole near-dup documents, this finds
    PARAGRAPH-level repetition — template headers, license blocks, cookie
    banners — that survives document dedup because the surrounding text
    differs. The output (hash, doc count, occurrence count, canonical doc)
    is the removal list a curation pipeline joins back against chunks.

    Plan shape: the zero-shuffle chunk map feeds ONE shuffle keyed by the
    8-byte chunk hash (never the chunk text) — at 100 TB the shuffle
    carries ~16 B/chunk. 31-bit hash identity stands in for chunk equality
    (identical in both engines, so the oracle matches exactly); at corpus
    scale flip to ``xxhash64`` for a 64-bit keyspace, same plan.
    """
    ch = text_chunk_windows(spark, sf_dir)
    return (
        ch.groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .filter(F.col("n_docs") >= BOILERPLATE_MIN_DOCS)
    )


# --- substring-granular repeated-span dedup --------------------------------
#: Anchor window length (tokens) for the repeated-substring finder. The
#: suffix-array dedup of "Deduplicating Training Data Makes Language Models
#: Better" (Lee et al. 2022) removes repeated spans >= ~50 tokens; the
#: distributed approximation anchors a rolling window at EVERY token
#: position, so a repeated span of length >= REPEAT_L is caught at ANY
#: offset — the case fixed-stride chunking (text_chunk_windows) misses when
#: the repeat straddles window boundaries at differing offsets.
REPEAT_L = 8


def sql_span_ctes(tok_rel: str = "tok") -> str:
    """Gaps-and-islands CTE chain for repeated spans, ending in ``spans``
    (doc_id, span_start, span_end, span_tokens). Composable: *tok_rel*
    names any in-scope (doc_id, toks) relation, and every CTE is
    ``span``-prefixed so the chain can sit next to the curation / minhash
    chains without collision (the r9 span-status oracle does exactly
    that). Call-time builder — a REPEAT_L retune moves both engines
    together."""
    return f"""
spanc AS (
  SELECT doc_id, toks, len(toks) AS n
  FROM {tok_rel} WHERE len(toks) >= {REPEAT_L}
),
spanw AS (
  SELECT doc_id, CAST(t.i AS INTEGER) AS pos,
         {_sql_sh(f"array_to_string(list_slice(toks, t.i + 1, t.i + {REPEAT_L}), ' ')")} AS h
  FROM spanc, UNNEST(range(0, spanc.n - {REPEAT_L} + 1)) AS t(i)
),
spanrep AS (
  SELECT h FROM spanw GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
),
spanisl AS (
  SELECT spanw.doc_id, spanw.pos,
         spanw.pos - ROW_NUMBER() OVER (PARTITION BY spanw.doc_id ORDER BY spanw.pos) AS grp
  FROM spanw JOIN spanrep USING (h)
),
spans AS (
  SELECT doc_id,
         CAST(MIN(pos) AS INTEGER) AS span_start,
         CAST(MAX(pos) + {REPEAT_L} AS INTEGER) AS span_end,
         CAST(MAX(pos) + {REPEAT_L} - MIN(pos) AS INTEGER) AS span_tokens
  FROM spanisl
  GROUP BY doc_id, grp
)"""


def _sql_repeated_substrings() -> str:
    return f"""
WITH {_SQL_TOKS},
{sql_span_ctes("tok")}
SELECT doc_id, span_start, span_end, span_tokens FROM spans
"""


def repeated_substring_spans(docs: DataFrame, length: int | None = None) -> DataFrame:
    """Maximal cross-document repeated token spans at ANY offset.

    The substring-granular dedup pass: anchor a *length*-token rolling
    window at every token position (stride 1), keep window hashes seen in
    >= 2 distinct documents, then merge runs of consecutive repeated
    positions per document into maximal spans (gaps-and-islands). A span
    of R consecutive repeated anchors covers ``R + length - 1`` tokens —
    so a 40-token boilerplate block shared by two docs at different
    offsets comes back as ONE (doc, span) row per doc, where the
    fixed-stride chunk family only catches it when both offsets align.

    Plan shape (100 TB): tokenize → posexplode → windowed ``lead`` shingle
    assembly, all inside whole-stage codegen (one row per token); ONE
    shuffle on the 8-byte window hash for the repeated-hash relation; a
    semi-join back (output <= input rows — each window matches at most one
    hash, so there is NO fan-out and no cap is needed, unlike the
    all-pairs shingle joins); one shuffle on doc_id for the island merge.
    Every shuffle carries fixed-width keys, never text.

    OPTIMIZATION r15 (guide §2.4): the window relation feeds BOTH the
    repeated-hash aggregate and the position join — left as two lazy
    branches the tokenize+explode+hash pass executed twice (two
    single-task scans at fixture scale; two full text passes at 100 TB).
    An explicit hash repartition on ``h`` gives the two branches one
    shared Exchange (the second branch is a ReusedExchange, pinned by
    the plan test): the text pass runs once, the aggregate and the join
    both read the shuffle output, and the post-shuffle work is spread
    across the cluster instead of riding the scan's split count.

    Reference scope note: the reference engine (ting-data-etl) has no text
    dedup at all — this extends the LLM-pipeline family
    (cf. ``dedup_chunk_boilerplate``), per the round-7 verdict's top-3
    item.
    """
    from pyspark.sql import Window

    from ting_data_etl_spark.functions.text import portable_hash31, tokens

    if length is None:
        length = REPEAT_L
    tok = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    n = F.size("toks")
    wins = (
        tok.filter(n >= length)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n - length),
                    lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i + 1, length)),
                )
            ).alias("pos", "win"),
        )
        .select("doc_id", "pos", portable_hash31(F.col("win")).alias("h"))
        .repartition(F.col("h"))  # ONE exchange shared by agg + join
    )
    rep = (
        wins.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    hits = wins.join(rep, "h").select("doc_id", "pos")
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    isl = hits.withColumn("grp", F.col("pos") - F.row_number().over(wdoc))
    return isl.groupBy("doc_id", "grp").agg(
        F.min("pos").cast("int").alias("span_start"),
        (F.max("pos") + length).cast("int").alias("span_end"),
        (F.max("pos") + length - F.min("pos")).cast("int").alias("span_tokens"),
    ).drop("grp")


@register("dedup_repeated_substrings", oracle=_sql_repeated_substrings)
def dedup_repeated_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of :func:`repeated_substring_spans` over ``documents``."""
    d = load_table(spark, sf_dir, "documents")
    return repeated_substring_spans(d)


# --- n-gram novelty (train-set freshness metric) ----------------------------
def _sql_ngram_novelty() -> str:
    """Call-time builder; shares the tokenizer CTE and the shingle-hash
    fragment with the dedup family."""
    from ting_data_etl_spark.operators.dedup import SHINGLE_N

    return f"""
WITH {_SQL_TOKS},
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(0, greatest(len(toks) - {SHINGLE_N - 1}, 1)),
           i -> {_sql_sh(f"array_to_string(list_slice(toks, i + 1, i + {SHINGLE_N}), ' ')")}
         ))) AS shingle
  FROM tok
),
nn AS (SELECT doc_id, shingle FROM sh WHERE shingle IS NOT NULL),
firsts AS (SELECT shingle, MIN(doc_id) AS first_doc FROM nn GROUP BY shingle)
SELECT n.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN f.first_doc = n.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       CAST(SUM(CASE WHEN f.first_doc = n.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS novelty
FROM nn n JOIN firsts f ON n.shingle = f.shingle
GROUP BY n.doc_id
"""


@register("text_ngram_novelty", oracle=_sql_ngram_novelty)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novel-shingle fraction against the corpus-order prefix.

    A document's novelty = the fraction of its distinct n-gram shingles
    whose FIRST corpus occurrence (min doc_id — ingestion order) is the
    document itself. The data-curriculum freshness signal: near-1 docs
    introduce new content, near-0 docs restate what earlier documents
    already said (the streaming-dedup intuition as a batch metric).

    Plan shape: the distinct (doc, shingle) relation feeds ONE aggregation
    keyed by the 31-bit shingle hash for the per-shingle ``min(doc_id)``,
    joined back on the same hash (fixed-width keys, text never shuffles),
    then one doc-keyed aggregation. Zero-token documents have no non-NULL
    shingles and drop out of the result on both engines.

    OPTIMIZATION r15 (guide §2.4): same two-consumer shape as
    :func:`repeated_substring_spans` — the distinct shingle relation fed
    both the ``firsts`` aggregate and the join back, so the shingle
    pass (tokenize + explode + hash + distinct) executed twice. The
    explicit repartition on the shingle hash shares one Exchange between
    the branches (ReusedExchange), halving the text work.
    """
    from ting_data_etl_spark.functions.text import portable_hash31
    from ting_data_etl_spark.operators.dedup import word_shingles_df

    d = load_table(spark, sf_dir, "documents")
    sh = (
        word_shingles_df(d)
        .select("doc_id", portable_hash31(F.col("s")).alias("shingle"))
        .filter(F.col("shingle").isNotNull())
        .distinct()
        .repartition(F.col("shingle"))  # shared by firsts agg + join
    )
    firsts = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    joined = sh.join(firsts, "shingle")
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        F.sum((F.col("first_doc") == F.col("doc_id")).cast("long")).alias(
            "n_novel"
        ),
        (
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long")).cast(
                "double"
            )
            / F.count("*")
        ).alias("novelty"),
    )


# --- unigram surprisal: perplexity-proxy quality scoring --------------------
#: Fixed-point units for the per-token surprisal weight (3 decimals). The
#: weight itself is ONE IEEE divide over exact integers; scaling to BIGINT
#: before the per-document sum makes the document mean order-independent
#: (same discipline as cleaning.sum_exact). Headroom (r9, ADVICE fix): the
#: per-doc accumulator is SUM(tf·q) with q ≈ (T+V)·1000/(c+1) ≤ (T+V)·500
#: (c ≥ 1). The Spark side accumulates in decimal(38,0) — exact to 10³⁸,
#: i.e. corpora far past 10²⁰ tokens — so it can no longer wrap silently
#: where the DuckDB twin's HUGEINT promotion stays exact; the tf·q PRODUCT
#: is also computed in decimal so the multiply itself can't wrap either.
SURPRISAL_SCALE = 1000

def sql_surprisal_ctes(tok_rel: str = "tok") -> str:
    """Surprisal CTE chain ending in ``surp`` (doc_id, n_tokens, n_hapax,
    s_fixed) — the fixed-point per-document accumulator relation, exact
    integers end to end (DuckDB promotes the SUM to HUGEINT). Composable:
    the r9 surprisal-band sampling gate joins ``surp`` next to the quality
    CTEs; CTE names are ``s``-prefixed to avoid collisions."""
    return f"""
stf AS (
  SELECT doc_id, t AS token, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS t FROM {tok_rel})
  GROUP BY 1, 2
),
scnt AS (SELECT token, CAST(SUM(tf) AS BIGINT) AS c FROM stf GROUP BY 1),
stot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS t_total, CAST(COUNT(*) AS BIGINT) AS v
  FROM scnt
),
sq AS (
  SELECT token, c,
         CAST(ROUND((stot.t_total + stot.v) / (c + 1) * {SURPRISAL_SCALE})
              AS BIGINT) AS q
  FROM scnt CROSS JOIN stot
),
surp AS (
  SELECT stf.doc_id,
         CAST(SUM(stf.tf) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN sq.c = 1 THEN stf.tf ELSE 0 END) AS BIGINT)
           AS n_hapax,
         SUM(stf.tf * sq.q) AS s_fixed
  FROM stf JOIN sq USING (token)
  GROUP BY stf.doc_id
)"""


_SQL_SURPRISAL = f"""
WITH {_SQL_TOKS},
{sql_surprisal_ctes("tok")}
SELECT doc_id, n_tokens, n_hapax,
       CAST(s_fixed AS DOUBLE) / n_tokens / {SURPRISAL_SCALE}.0
         AS mean_surprisal
FROM surp
"""


@register("text_unigram_surprisal", oracle=_SQL_SURPRISAL)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram surprisal — the perplexity-proxy filter.

    CCNet/RedPajama rank documents by language-model perplexity and drop
    the weird tail; the distributed cheap form is a corpus-trained UNIGRAM
    model: a document's score is the token-frequency-weighted mean of
    ``(T + V) / (c(token) + 1)`` — the add-one-smoothed inverse probability
    (linear-space surprisal; monotone in -log p, and rational on purpose:
    an ``ln``-based score would differ between libm and DuckDB in the last
    ULP, the same reason text_tfidf_top_terms uses a rational idf). High
    mean = rare-token-heavy (gibberish, boilerplate codes, OCR noise);
    ``n_hapax`` (corpus-hapax token occurrences) is the companion signal.

    Determinism: the weight is one IEEE divide over exact integers, then
    fixed-point-scaled to BIGINT so the per-document sum is exact under any
    partition/merge order; the mean is two IEEE divides in a pinned order.

    Plan shape: one (doc, token) aggregation, one |vocab|-sized count
    aggregation over rows ALREADY shuffled by token, a broadcast 1-row
    totals join, and the weight join back on the token key — at 100 TB the
    second shuffle carries |vocab| rows (Zipf: millions, not trillions) and
    AQE broadcasts the weight table when it fits. Zero-token documents have
    no tf rows and drop out on both engines.
    """
    s = surprisal_stats(spark, sf_dir)
    return s.select(
        "doc_id",
        "n_tokens",
        "n_hapax",
        (
            F.col("s_fixed").cast("double")
            / F.col("n_tokens")
            / F.lit(float(SURPRISAL_SCALE))
        ).alias("mean_surprisal"),
    )


def surprisal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fixed-point surprisal accumulators — the shared core.

    Returns (doc_id, n_tokens, n_hapax, s_fixed) where ``s_fixed`` is the
    EXACT integer Σ tf·q in decimal(38,0) (ADVICE r8 fix: int64 would wrap
    silently past ~1e11 corpus tokens while the DuckDB twin's HUGEINT
    stayed exact; decimal(38,0) matches the twin to 10³⁸ — the tf·q
    product is computed in decimal too, so the multiply can't wrap
    either). Both the registered surprisal query and the r9 surprisal-band
    sampling gate derive from this relation; band thresholds compare
    ``s_fixed`` against integer bounds, never a float mean.
    """
    from ting_data_etl_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    cnt = tf.groupBy("token").agg(F.sum("tf").alias("c"))
    tot = F.broadcast(
        cnt.agg(F.sum("c").alias("t_total"), F.count("*").alias("v"))
    )
    q = cnt.crossJoin(tot).select(
        "token",
        "c",
        F.round(
            (F.col("t_total") + F.col("v"))
            / (F.col("c") + 1)
            * SURPRISAL_SCALE
        )
        .cast("long")
        .alias("q"),
    )
    return (
        tf.join(q, "token")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.when(F.col("c") == 1, F.col("tf")).otherwise(0)).alias(
                "n_hapax"
            ),
            F.sum(F.col("tf").cast("decimal(38,0)") * F.col("q")).alias(
                "s_fixed"
            ),
        )
    )
