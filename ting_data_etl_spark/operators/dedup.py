"""Deduplication operators for training-data pipelines (SURVEY.md §7.4).

No reference-side counterpart — these are the LLM-data-pipeline extensions
the north star mandates, designed for 100 TB corpora:

* **exact** — group on normalized text (or its fingerprint): one shuffle on
  the hash key; with the fingerprint variant the shuffle key is a fixed-width
  digest, not the document body, so shuffle IO is O(#docs × 16 B).
* **MinHash + LSH** — per-row signature computation is pure JVM higher-order
  functions (no shuffle, no UDF); only the *band keys* (b × 16 B per doc)
  shuffle for the candidate-pair self-join. This is the standard
  shingle→minhash→band→bucket-join construction; candidate recall follows
  the (b, r) S-curve.
* **SimHash** — 32-bit per-doc signature from token digests, again pure
  JVM expressions; near-dup candidates via identical-signature grouping.
* **n-gram Jaccard** — exact pairwise similarity via a shared-shingle
  self-join, bounded to same-``source`` blocks (blocking is what keeps the
  pair count tractable at scale).

Digest portability: oracle-checked variants use ``md5`` (identical hex in
DuckDB). At 100 TB you'd flip ``HASH = F.xxhash64`` — ~5× faster, JVM-native,
same semantics (the ``*_fast`` functions) — which the driver then checks
rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ting_data_etl_spark.functions.text import (
    doc_fingerprint_md5,
    normalize_text,
    word_ngrams,
)
from ting_data_etl_spark.registry import register
from ting_data_etl_spark.sources.tables import load_table

MINHASH_HASHES = 16  # signature length
MINHASH_BANDS = 8  # → r = 2 rows per band
SHINGLE_N = 3  # word 3-gram shingles


# --- exact dedup -----------------------------------------------------------
_SQL_DEDUP_EXACT = """
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
  FROM documents
),
k AS (
  SELECT doc_id, norm, MIN(doc_id) OVER (PARTITION BY norm) AS keeper
  FROM n
)
SELECT doc_id, keeper, (doc_id <> keeper) AS is_dup
FROM k
"""


@register("dedup_exact", oracle=_SQL_DEDUP_EXACT)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text: keeper = min doc_id per group.

    One shuffle on the normalized text. At scale prefer
    :func:`dedup_fingerprint` (shuffles 16-byte digests, not bodies).
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", normalize_text("text").alias("norm")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("norm")
    return d.select(
        "doc_id",
        F.min("doc_id").over(w).alias("keeper"),
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_dup"),
    )


# --- fingerprint dedup (md5 digest as the shuffle key) ---------------------
_SQL_DEDUP_FP = """
WITH n AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
  FROM documents
)
SELECT fp, COUNT(*) AS n_docs, MIN(doc_id) AS keeper
FROM n GROUP BY fp
"""


@register("dedup_fingerprint_md5", oracle=_SQL_DEDUP_FP)
def dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-fingerprint dedup: md5(normalized) → group → keeper.

    The digest (16 B) is the shuffle key — at 100 TB this is the difference
    between shuffling documents and shuffling hashes. Fast path:
    ``F.xxhash64`` instead of md5 (same plan shape).
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", doc_fingerprint_md5("text").alias("fp")
    )
    return d.groupBy("fp").agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper")
    )


# --- MinHash signatures + LSH banding --------------------------------------
def minhash_signature(text_col, n_hashes: int = MINHASH_HASHES) -> F.Column:
    """MinHash signature as array<string> of per-seed minimum digests.

    hash_i(shingle) = md5(i || '|' || shingle); signature_i = min over
    shingles. Lexicographic min over fixed-width lowercase hex == numeric min
    over the 128-bit digests, so DuckDB computes the identical signature.
    Entirely per-row JVM expressions — zero shuffle, zero Python.
    """
    shingles = word_ngrams(text_col, SHINGLE_N)
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                shingles,
                lambda s: F.md5(F.concat(i.cast("string"), F.lit("|"), s)),
            )
        ),
    )


def lsh_bands(sig_col, n_bands: int = MINHASH_BANDS) -> F.Column:
    """Fold a signature into band keys: band_j = md5(sig[jr] || sig[jr+1] …)."""
    r = MINHASH_HASHES // n_bands
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda j: F.md5(
            F.concat_ws(
                ",", F.slice(sig_col, j * r + 1, r)
            )
        ),
    )


_MINHASH_SIG_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(
           regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                                 '[^\\p{{L}}\\p{{N}}]+'),
           t -> t <> '') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_transform(
           range(0, greatest(len(toks) - {SHINGLE_N - 1}, 1)),
           i -> array_to_string(list_slice(toks, i + 1, i + {SHINGLE_N}), ' ')
         ) AS shingles
  FROM tok
),
sig AS (
  SELECT doc_id,
         list_transform(
           range(0, {MINHASH_HASHES}),
           i -> list_min(list_transform(shingles, s -> md5(CAST(i AS VARCHAR) || '|' || s)))
         ) AS sig
  FROM sh
)
"""

_SQL_MINHASH_PAIRS = f"""
{_MINHASH_SIG_SQL},
bands AS (
  SELECT doc_id, unnest(list_transform(
    range(0, {MINHASH_BANDS}),
    j -> md5(array_to_string(list_slice(sig, j * 2 + 1, j * 2 + 2), ','))
  )) AS band
  FROM sig
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
"""


@register("dedup_minhash_lsh_pairs", oracle=_SQL_MINHASH_PAIRS)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs via MinHash-LSH banding.

    Plan shape: per-row signature (codegen) → explode bands (b rows/doc,
    16 B keys) → self-join on band → distinct pairs. The only shuffle
    carries band keys; at 100 TB add a frequency cap on pathological bands
    (boilerplate text) before the join — see ``band_frequency_cap``.
    """
    d = load_table(spark, sf_dir, "documents")
    sig = d.select("doc_id", minhash_signature(F.col("text")).alias("sig"))
    bands = sig.select(
        "doc_id", F.explode(lsh_bands(F.col("sig"))).alias("band")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = a.join(
        b, (F.col("a.band") == F.col("b.band")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    return pairs.distinct()


_SQL_MINHASH_SIGS = f"""
{_MINHASH_SIG_SQL}
SELECT doc_id, array_to_string(sig, ',') AS sig_str FROM sig
"""


@register("dedup_minhash_signatures", oracle=_SQL_MINHASH_SIGS)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw MinHash signatures (joined to one string for oracle comparison)."""
    d = load_table(spark, sf_dir, "documents")
    sig = d.select("doc_id", minhash_signature(F.col("text")).alias("sig"))
    return sig.select("doc_id", F.concat_ws(",", "sig").alias("sig_str"))


# --- n-gram Jaccard (exact pairwise, blocked by source) --------------------
_SQL_JACCARD = f"""
WITH tok AS (
  SELECT doc_id, source,
         list_filter(
           regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                                 '[^\\p{{L}}\\p{{N}}]+'),
           t -> t <> '') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id, source, unnest(list_distinct(list_transform(
           range(0, greatest(len(toks) - {SHINGLE_N - 1}, 1)),
           i -> array_to_string(list_slice(toks, i + 1, i + {SHINGLE_N}), ' ')
         ))) AS shingle
  FROM tok
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM sh a JOIN sh b
    ON a.shingle = b.shingle AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT s.doc_a, s.doc_b,
       CAST(s.common AS DOUBLE) / (sa.n + sb.n - s.common) AS jaccard
FROM shared s
JOIN sizes sa ON s.doc_a = sa.doc_id
JOIN sizes sb ON s.doc_b = sb.doc_id
WHERE CAST(s.common AS DOUBLE) / (sa.n + sb.n - s.common) >= 0.1
"""


@register("dedup_ngram_jaccard_pairs", oracle=_SQL_JACCARD)
def dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs ≥ 0.1, blocked by ``source``.

    The shared-shingle self-join is the scalable formulation (vs. a cross
    join): pair candidates materialize only where an actual shingle is
    shared, and the ``source`` block bounds worst-case fan-out. Jaccard is
    exact integer arithmetic — deterministic across engines.
    """
    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(word_ngrams(F.col("text"), SHINGLE_N))).alias(
            "shingle"
        ),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    out = (
        shared.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("common").cast("double")
                / (F.col("sa.n") + F.col("sb.n") - F.col("common"))
            ).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= 0.1)


# --- SimHash (32-bit, nibble-arithmetic portable) --------------------------
def simhash32(text_col) -> F.Column:
    """32-bit SimHash from token md5 digests, as a BIGINT.

    Per token: first 8 hex chars of md5 → 8 nibbles → 32 bits. Per bit:
    +1 if set else -1, summed over tokens; sign forms the signature bit.
    Pure string/integer arithmetic so DuckDB reproduces it exactly.
    """
    from ting_data_etl_spark.functions.text import tokens

    toks = tokens(text_col)
    digests = F.transform(toks, lambda t: F.substring(F.md5(t), 1, 8))
    def nibble(d, pos):  # value of hex digit at 1-based pos
        return F.conv(F.substring(d, pos, 1), 16, 10).try_cast("int")

    def vote_fn(pos, shift):
        # two-arg closure factory — Spark HOF lambdas must take exactly
        # the declared arity, no extra default params
        def fn(acc, d):
            return acc + F.when(
                F.floor(nibble(d, pos) / (2**shift)) % 2 == 1, F.lit(1)
            ).otherwise(F.lit(-1))

        return fn

    bit_votes = []
    for i in range(32):
        pos = i // 4 + 1  # hex char index
        shift = 3 - (i % 4)  # bit within nibble, MSB first
        votes = F.aggregate(digests, F.lit(0), vote_fn(pos, shift))
        bit_votes.append(F.when(votes > 0, F.lit(2 ** (31 - i))).otherwise(F.lit(0)))
    total = bit_votes[0]
    for b in bit_votes[1:]:
        total = total + b
    return total.cast("long")


@register("dedup_simhash_signatures")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 32-bit SimHash (rows-only check; pytest covers determinism).

    Candidate near-dups then group on the signature (or band it 4×8 bits for
    hamming-distance-≤k search) — both single-shuffle plans.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", simhash32(F.col("text")).alias("simhash"))
