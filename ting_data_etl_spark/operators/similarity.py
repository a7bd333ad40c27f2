"""Similarity search over embedding columns (SURVEY.md §7.4 extension).

Two plans over ``embeddings`` (``vec_id``, ``embedding: array<float>``,
``label``):

* **brute-force top-k** — query-set × corpus join with per-pair cosine via
  JVM higher-order functions, then a per-query top-k window. O(Q·N·d) but
  embarrassingly parallel; the baseline every ANN variant is measured
  against.
* **IVF-style bucketed top-k** — restrict the pair join to matching coarse
  partitions (here the ``label`` column stands in for the IVF list
  assignment; in production that column comes from a k-means fit). The join
  becomes an equi-join on the bucket id, so Spark shuffles each side once by
  bucket instead of broadcasting the full corpus — the standard
  partition-pruned ANN layout at 100 TB.

Determinism: cosine over int-quantized vectors (``quantize_vec``) — integer
dot products are exact in any engine, so scores are bit-identical in DuckDB
(products ≤ (10·10⁴)²·64 < 2⁵³ stay exact in its double accumulator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ting_data_etl_spark.functions.vectors import dot_product, quantize_vec
from ting_data_etl_spark.registry import register
from ting_data_etl_spark.sources.tables import load_table

TOP_K = 5
QUERY_MOD = 10  # every 10th vector is a query → |Q| = N/10


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized vectors with the norm precomputed ONCE per vector.

    The pair stage then does a single 64-element fold per pair instead of
    three — at Q·N pairs this is the dominant cost.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.select("vec_id", "label", quantize_vec("embedding").alias("q"))
    return q.withColumn("norm", F.sqrt(dot_product(F.col("q"), F.col("q"))))


def _cosine_pre(a, b, na, nb) -> F.Column:
    """Cosine from quantized vectors + precomputed norms."""
    denom = na * nb
    return F.when(denom != 0, dot_product(a, b) / denom)


_SQL_QUANT = """
q AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
  FROM embeddings
)
"""

_SQL_BRUTE = f"""
WITH {_SQL_QUANT},
pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         CASE WHEN sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q)) <> 0
              THEN list_dot_product(a.q, b.q) /
                   (sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q)))
         END AS cosine
  FROM q a JOIN q b ON b.vec_id <> a.vec_id
  WHERE a.vec_id % {QUERY_MOD} = 0
)
SELECT query_id, neighbor_id, cosine
FROM (
  SELECT *, row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC NULLS LAST, neighbor_id ASC
         ) AS rn
  FROM pairs
) WHERE rn <= {TOP_K}
"""


@register("similarity_bruteforce_topk", oracle=_SQL_BRUTE)
def similarity_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _quantized(spark, sf_dir)
    queries = q.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qv"),
        F.col("norm").alias("qn"),
    )
    corpus = q.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("q").alias("cv"),
        F.col("norm").alias("cn"),
    )
    pairs = queries.join(
        F.broadcast(corpus), F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        _cosine_pre(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias(
            "cosine"
        ),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc_nulls_last(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )


_SQL_IVF = f"""
WITH {_SQL_QUANT},
pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         CASE WHEN sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q)) <> 0
              THEN list_dot_product(a.q, b.q) /
                   (sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q)))
         END AS cosine
  FROM q a JOIN q b ON a.label = b.label AND b.vec_id <> a.vec_id
  WHERE a.vec_id % {QUERY_MOD} = 0
)
SELECT query_id, neighbor_id, cosine
FROM (
  SELECT *, row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC NULLS LAST, neighbor_id ASC
         ) AS rn
  FROM pairs
) WHERE rn <= {TOP_K}
"""


@register("similarity_ivf_topk", oracle=_SQL_IVF)
def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: probe only the query's coarse partition (label).

    The bucket equi-join key turns the all-pairs cross join into a
    per-bucket join — at 100 TB each bucket co-locates via one shuffle and
    never sees the rest of the corpus. Recall < 1 by construction (single
    probe); add multi-probe by exploding candidate buckets per query.
    """
    q = _quantized(spark, sf_dir)
    queries = q.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("q").alias("qv"),
        F.col("norm").alias("qn"),
    )
    corpus = q.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("clabel"),
        F.col("q").alias("cv"),
        F.col("norm").alias("cn"),
    )
    pairs = queries.join(
        corpus,
        (F.col("qlabel") == F.col("clabel"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select(
        "query_id",
        "neighbor_id",
        _cosine_pre(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias(
            "cosine"
        ),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc_nulls_last(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )


_SQL_NEAR_PAIRS = f"""
WITH {_SQL_QUANT}
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       list_dot_product(a.q, b.q) /
         (sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q))) AS cosine
FROM q a JOIN q b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q)) <> 0
  AND list_dot_product(a.q, b.q) /
      (sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q))) >= 0.3
"""


@register("dedup_embedding_cosine_pairs", oracle=_SQL_NEAR_PAIRS)
def dedup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (≥ 0.3) within coarse buckets.

    The embedding leg of the dedup suite: semantic near-dups that n-gram
    methods miss. Same bucketed-join scale shape as :func:`similarity_ivf`.
    """
    q = _quantized(spark, sf_dir)
    a = q.select(
        F.col("vec_id").alias("vec_a"),
        F.col("label").alias("la"),
        F.col("q").alias("qa"),
        F.col("norm").alias("na"),
    )
    b = q.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("lb"),
        F.col("q").alias("qb"),
        F.col("norm").alias("nb"),
    )
    pairs = a.join(
        b, (F.col("la") == F.col("lb")) & (F.col("vec_a") < F.col("vec_b"))
    ).select(
        "vec_a",
        "vec_b",
        _cosine_pre(F.col("qa"), F.col("qb"), F.col("na"), F.col("nb")).alias(
            "cosine"
        ),
    )
    return pairs.filter(F.col("cosine") >= 0.3)
