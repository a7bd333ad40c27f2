"""Deterministic Spark-side synthetic corpus generator for scale stress.

Mirrors the statistical shape of the driver's ``documents`` / ``embeddings``
testdata (word-salad text over a small-ish vocab, 64-dim label-clustered
vectors) at ARBITRARY row counts. Everything is generated with codegen
expressions — no driver-side data, no RNG object: every value derives from
``xxhash64`` of (ids, salt), so a corpus of any size is reproducible and
generation itself scales like any other Spark job (the generator is the
pattern a 1000-executor cluster would use to build a 100 TB test corpus).

Planted structure (fractions constant across scale, so TRUE-positive counts
grow linearly — the property the stress run verifies):

documents (``doc_id, text, lang, source, n_chars``):
  * the first 20% of doc_ids sit in near-dup clusters of 4 — same template
    words, ~1/20 of words mutated per member; clusters whose hash lands in
    1/10 have mutation disabled → whole-cluster exact dups;
  * ~30% of clusters carry one of 5 shared 8-word boilerplate prefixes —
    at scale each boilerplate shingle lands in ~N·0.06 documents, exactly
    the hot-bucket class ``SHINGLE_FREQUENCY_CAP``/``BAND_FREQUENCY_CAP``
    exist to drop;
  * body words are zipf-ish (common words common, long tail) over a fixed
    vocab, so random cross-doc shingle collisions exist but are rare;
  * ``source`` is keyed by cluster (near-dup members share a source — the
    blocked-join recall path) and source count grows as sqrt(scale), so
    per-source block size grows too (the block-join stress).

embeddings (``vec_id, embedding: array<float>, label: int``):
  * 10 label clusters: centroid + heavy noise (sibling cosine ≈ 0.2, BELOW
    ``NEAR_DUP_THRESHOLD`` = 0.3 — at corpus scale "everything in my label
    is a near-dup" would be quadratic nonsense);
  * every ``vec_id ≡ 1 (mod 50)`` copies ``vec_id - 1`` with ~2e-3 jitter
    → planted near-duplicates at cosine ≈ 0.9999, count = N/50.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 2026
VOCAB = 2000
DIM = 64
N_LABELS = 10
CLUSTER_SIZE = 4
CLUSTER_FRACTION = 0.2  # of docs
NEAR_DUP_VEC_MOD = 50  # vec_id % 50 == 1 copies vec_id - 1

# sf0.1 row counts — "scale 1" reproduces the driver corpus SHAPE 1:1
BASE_DOCS = 5_000
BASE_VECS = 2_000
BASE_SOURCES = 20


def _h(*cols) -> F.Column:
    return F.xxhash64(*cols, F.lit(SEED))


def _unit(h: F.Column) -> F.Column:
    """Deterministic uniform in [-1, 1) with 1e-3 resolution."""
    return (F.pmod(h, F.lit(2000)) - F.lit(1000)) / F.lit(1000.0)


def gen_documents(
    spark: SparkSession, n_docs: int, n_sources: int
) -> DataFrame:
    d = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    doc = F.col("doc_id")
    n_cluster_docs = int(n_docs * CLUSTER_FRACTION)
    in_cluster = doc < F.lit(n_cluster_docs)
    # singletons get a unique "cluster" id far above the real cluster range
    cl = F.when(in_cluster, F.floor(doc / CLUSTER_SIZE)).otherwise(
        doc + F.lit(1_000_000_000)
    )
    # 1 cluster in 10: mutation off -> exact-dup cluster
    mutable = in_cluster & (F.pmod(_h(cl, F.lit("xd")), F.lit(10)) != 0)
    n_words = (F.pmod(_h(cl, F.lit("len")), F.lit(71)) + F.lit(30)).cast("int")

    def word(i):
        # zipf-ish index: uniform draw below a uniformly-drawn cap biases
        # small indices ~H(V)/V over uniform — common words are ~8x common
        zcap = F.pmod(_h(cl, i, F.lit("z")), F.lit(VOCAB)) + F.lit(1)
        base = F.pmod(_h(cl, i, F.lit("w")), zcap)
        mut = mutable & (F.pmod(_h(doc, i, F.lit("m")), F.lit(20)) == 0)
        idx = F.when(mut, F.pmod(_h(doc, i, F.lit("mw")), F.lit(VOCAB))).otherwise(
            base
        )
        return F.concat(F.lit("w"), idx.cast("string"))

    body = F.concat_ws(
        " ", F.transform(F.sequence(F.lit(1), n_words), word)
    )
    # cluster-keyed boilerplate: ~30% of clusters share one of 5 prefixes
    has_bp = F.pmod(_h(cl, F.lit("bp")), F.lit(10)) < 3
    tpl = F.pmod(_h(cl, F.lit("bpt")), F.lit(5))
    bp = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"bp{j}t"), tpl.cast("string"))
            for j in range(8)
        ],
    )
    text = F.when(has_bp, F.concat_ws(" ", bp, body)).otherwise(body)
    lang = F.element_at(
        F.array(*[F.lit(x) for x in ("en", "zh", "fr", "de", "es")]),
        (F.pmod(_h(doc, F.lit("lang")), F.lit(5)) + F.lit(1)).cast("int"),
    )
    source = F.concat(
        F.lit("src"), F.pmod(_h(cl, F.lit("src")), F.lit(n_sources)).cast("string")
    )
    return d.select(
        "doc_id",
        text.alias("text"),
        lang.alias("lang"),
        source.alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )


def gen_embeddings(spark: SparkSession, n_vecs: int) -> DataFrame:
    v = spark.range(n_vecs).withColumnRenamed("id", "vec_id")
    vid = F.col("vec_id")
    is_copy = F.pmod(vid, F.lit(NEAR_DUP_VEC_MOD)) == 1
    base = F.when(is_copy, vid - 1).otherwise(vid)
    label = F.pmod(_h(base, F.lit("lab")), F.lit(N_LABELS))

    def elem(j):
        centroid = _unit(_h(label, j, F.lit("c")))
        noise = _unit(_h(base, j, F.lit("n"))) * F.lit(2.0)
        jitter = F.when(
            is_copy, _unit(_h(vid, j, F.lit("t"))) * F.lit(0.002)
        ).otherwise(F.lit(0.0))
        return (centroid + noise + jitter).cast("float")

    emb = F.transform(F.sequence(F.lit(0), F.lit(DIM - 1)), elem)
    return v.select(
        "vec_id", emb.alias("embedding"), label.cast("int").alias("label")
    )


def generate(spark: SparkSession, out_dir: str, scale: float) -> dict:
    """Materialize a scale-X corpus under *out_dir* (skips if present).

    Partition count scales with rows (~50k docs per output file) so the
    written layout matches what a distributed writer would produce and the
    downstream scans parallelize.
    """
    n_docs = int(BASE_DOCS * scale)
    n_vecs = int(BASE_VECS * scale)
    n_sources = max(BASE_SOURCES, int(BASE_SOURCES * math.sqrt(scale)))
    meta = {
        "scale": scale,
        "n_docs": n_docs,
        "n_vecs": n_vecs,
        "n_sources": n_sources,
    }
    doc_path = os.path.join(out_dir, "documents.parquet")
    vec_path = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(doc_path) and os.path.exists(vec_path):
        return meta
    docs = gen_documents(spark, n_docs, n_sources).repartition(
        max(4, n_docs // 50_000)
    )
    docs.write.mode("overwrite").parquet(doc_path)
    vecs = gen_embeddings(spark, n_vecs).repartition(max(2, n_vecs // 100_000))
    vecs.write.mode("overwrite").parquet(vec_path)
    return meta


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ting_data_etl_spark.session import get_spark

    out = sys.argv[1]
    scale = float(sys.argv[2])
    spark = get_spark(app_name="scale-corpus-gen")
    spark.sparkContext.setLogLevel("ERROR")
    print(generate(spark, out, scale))
