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

import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ting_data_etl_spark.functions.vectors import dot_product, quantize_vec
from ting_data_etl_spark.registry import register
from ting_data_etl_spark.sources.tables import fan_out, load_table

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
    """Cosine from quantized vectors + precomputed norms (expression form).

    Exact but interpreted (one 64-element HOF fold per pair) — kept as the
    semantic reference; pair stages use :func:`cosine_udf`, whose parity
    with this form is pytest-pinned.
    """
    denom = na * nb
    return F.when(denom != 0, dot_product(a, b) / denom)


def cosine_udf():
    """Arrow-batched pair cosine: one einsum per batch — the hot path.

    Bit-identical to :func:`_cosine_pre`: the dot product of quantized
    int vectors is a sum of exact integers (|Σ| ≤ 64·(10·10⁴)² < 2⁵³), so
    float64 accumulation order cannot change it; numerator, denominator,
    and the final division see the same operands as the JVM fold and the
    DuckDB oracle. Zero-norm pairs yield NaN → Spark NULL, matching the
    ``when`` guard.
    """
    from pyspark.sql.functions import pandas_udf

    def cos(
        qv: pd.Series, cv: pd.Series, qn: pd.Series, cn: pd.Series
    ) -> pd.Series:
        Q = np.vstack(qv.to_numpy()).astype(np.float64)
        C = np.vstack(cv.to_numpy()).astype(np.float64)
        dots = np.einsum("ij,ij->i", Q, C)
        denom = qn.to_numpy() * cn.to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(denom != 0, dots / denom, np.nan)
        return pd.Series(out)

    return pandas_udf(cos, "double")


# Measured split (sf0.1, local[32]): the UDF wins on the bucketed pair
# stages (SRP 7.9→3.9 s, embedding pairs 3.7→1.8 s, IVF-kmeans 3.7→2.6 s),
# where the join has already shrunk the pair count. The dense
# query×corpus stages (brute force, label-IVF, the sampled exact truth)
# use neither form: Arrow-shipping two 64-dim vectors for EVERY pair
# loses to the interpreted fold, and the fold itself measured 210 s at a
# ×30 corpus — both pay O(Q·N) per-pair overhead. They run the matmul
# kernel below (OPTIMIZATION r16, guide §4.2/§8): the corpus crosses the
# Python boundary ONCE, queries ride a driver broadcast, each Arrow batch
# is one BLAS matmul, and only a tie-exact per-batch top-k superset comes
# back.


def _np_from_list_array(arr, n: int) -> "np.ndarray | None":
    """(n, d) float64 view of an Arrow list<int64> column, offset-safe.

    ``flatten()`` respects slicing offsets; returns None when rows are
    null or ragged (caller falls back to the per-row path)."""
    if arr.null_count:
        return None
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    if n == 0 or flat.size % n:
        return None
    return flat.reshape(n, -1)


def _dense_topk_candidates(
    corpus: DataFrame,
    queries_rows: list,
    k: int,
    by_label: bool = False,
) -> DataFrame:
    """Per-batch tie-exact top-k candidates of the dense query×corpus scan.

    *corpus* carries (neighbor_id, cv, cn[, clabel]); *queries_rows* are
    collected Rows (query_id, qv, qn[, qlabel]) — bounded by the
    brute-force gate / the recall sample, the same bounded-model-collect
    class as the IVF centroids. Emits, per Arrow batch and per query,
    every candidate that can reach the global top-k under
    (cosine DESC NULLS LAST, neighbor_id ASC):

    * all rows with cosine ≥ the batch's k-th largest finite cosine
      (boundary ties INCLUDED, so the global tie-break by neighbor_id
      never loses a candidate);
    * self-pairs excluded (the oracle's ``b.vec_id <> a.vec_id``);
    * when a batch holds fewer than k finite candidates for a query, its
      null-cosine pairs (zero norms) with the k smallest neighbor ids —
      NULLS LAST means a null can only reach the global top-k when
      non-null candidates run out.

    Arithmetic is bit-identical to ``_cosine_pre`` and the SQL oracle:
    integer dot products are exact in float64 under any summation order
    (|partial sums| ≤ 64·(10⁵)² < 2⁵³ even mixed-sign), and the norms are
    the SAME JVM-computed float64 values the pair forms divide by.
    The final exact ranking stays in :func:`topk_per_query`.
    """
    import pyarrow as pa

    if by_label:
        by_lab: dict = {}
        for r in queries_rows:
            by_lab.setdefault(r["qlabel"], [[], [], []])
            g = by_lab[r["qlabel"]]
            g[0].append(r["query_id"])
            g[1].append([float(x) for x in r["qv"]])
            g[2].append(float(r["qn"]))
        groups = {
            lab: (
                np.asarray(g[0], dtype=np.int64),
                np.asarray(g[1], dtype=np.float64),
                np.asarray(g[2], dtype=np.float64),
            )
            for lab, g in by_lab.items()
        }
    else:
        groups = {
            None: (
                np.asarray([r["query_id"] for r in queries_rows], np.int64),
                np.asarray(
                    [[float(x) for x in r["qv"]] for r in queries_rows],
                    np.float64,
                ),
                np.asarray([float(r["qn"]) for r in queries_rows], np.float64),
            )
        }
    bc = corpus.sparkSession.sparkContext.broadcast(groups)

    out_schema = "query_id long, neighbor_id long, cosine double"
    pa_schema = pa.schema(
        [
            ("query_id", pa.int64()),
            ("neighbor_id", pa.int64()),
            ("cosine", pa.float64()),
        ]
    )

    def score(batches):
        grp = bc.value
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            nids = np.asarray(batch.column("neighbor_id"), dtype=np.int64)
            C = _np_from_list_array(batch.column("cv"), n)
            if C is None:  # ragged/null rows: exact per-row fallback
                C = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in
                     batch.column("cv").to_pylist()]
                )
            cns = np.asarray(batch.column("cn"), dtype=np.float64)
            labs = (
                np.asarray(batch.column("clabel"), dtype=np.int64)
                if by_label
                else None
            )
            nid_pos = {int(v): i for i, v in enumerate(nids)}
            oq, on, oc, onull = [], [], [], []
            for lab, (qids, Qm, qns) in grp.items():
                if by_label:
                    rows = np.flatnonzero(labs == lab)
                    if rows.size == 0:
                        continue
                    Cs, cn_s, nid_s = C[rows], cns[rows], nids[rows]
                else:
                    Cs, cn_s, nid_s = C, cns, nids
                m = Cs.shape[0]
                # local row index per neighbor id (self-pair exclusion)
                sub_pos = (
                    {int(v): i for i, v in enumerate(nid_s)}
                    if by_label
                    else nid_pos
                )
                qchunk = max(64, min(1024, 8_000_000 // max(1, m)))
                for s in range(0, len(qids), qchunk):
                    qid_c = qids[s : s + qchunk]
                    dots = Cs @ Qm[s : s + qchunk].T
                    denom = np.outer(cn_s, qns[s : s + qchunk])
                    ok = denom != 0
                    filled = np.full_like(dots, -np.inf)
                    np.divide(dots, denom, out=filled, where=ok)
                    # self-pairs: excluded outright (≠ null)
                    excl = np.zeros_like(ok)
                    for j, qid in enumerate(qid_c):
                        i = sub_pos.get(int(qid))
                        if i is not None:
                            filled[i, j] = -np.inf
                            excl[i, j] = True
                    if m > k:
                        kth = np.partition(filled, m - k, axis=0)[m - k]
                        emit = (filled >= kth) & (filled > -np.inf)
                    else:
                        emit = filled > -np.inf
                    rr, cc = np.nonzero(emit)
                    oq.append(qid_c[cc])
                    on.append(nid_s[rr])
                    oc.append(filled[rr, cc])
                    # null completion: only where finite candidates < k
                    n_fin = emit.sum(axis=0)
                    for j in np.flatnonzero(n_fin < k):
                        nulls = np.flatnonzero(~ok[:, j] & ~excl[:, j])
                        if nulls.size == 0:
                            continue
                        keep = nulls[np.argsort(nid_s[nulls])][:k]
                        onull.append(
                            (
                                np.full(keep.size, qid_c[j], np.int64),
                                nid_s[keep],
                            )
                        )
            if not oq and not onull:
                continue
            q_arr = np.concatenate(oq) if oq else np.empty(0, np.int64)
            n_arr = np.concatenate(on) if on else np.empty(0, np.int64)
            c_arr = np.concatenate(oc) if oc else np.empty(0, np.float64)
            if onull:
                q_arr = np.concatenate([q_arr] + [x[0] for x in onull])
                n_arr = np.concatenate([n_arr] + [x[1] for x in onull])
            mask = np.zeros(len(q_arr), dtype=bool)
            mask[len(c_arr) :] = True  # appended null-cosine rows
            c_full = np.concatenate(
                [c_arr, np.zeros(len(q_arr) - len(c_arr))]
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(q_arr),
                    pa.array(n_arr),
                    pa.array(c_full, type=pa.float64(), mask=mask),
                ],
                schema=pa_schema,
            )

    return corpus.mapInArrow(score, out_schema)


_SQL_QUANT = """
q AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
  FROM embeddings
)
"""

def sql_cosine_case(a: str, b: str) -> str:
    """ONE definition of the oracle-side guarded cosine.

    Twin of the Spark ``_cosine_pre`` arithmetic; previously copy-pasted
    into five oracle strings, where a guard or association change could
    silently miss one. Operands are the two vector expressions.
    """
    na = f"sqrt(list_dot_product({a}, {a}))"
    nb = f"sqrt(list_dot_product({b}, {b}))"
    return (
        f"CASE WHEN {na} * {nb} <> 0\n"
        f"              THEN list_dot_product({a}, {b}) /\n"
        f"                   ({na} * {nb})\n"
        f"         END"
    )


_SQL_BRUTE = f"""
WITH {_SQL_QUANT},
pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {sql_cosine_case('a.q', 'b.q')} AS cosine
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


# The dense baseline broadcasts the corpus — fine for the measured-baseline
# role, catastrophic if it ever became the production path. Gate it: above
# this many corpus vectors the caller must use an ANN variant instead. The
# bound is checked from parquet FOOTER metadata (no Spark job, no scan).
BRUTEFORCE_MAX_CORPUS_ROWS = 1_000_000


def _corpus_rows(sf_dir: str) -> int:
    """Row count of the embeddings table from parquet footer metadata."""
    import glob
    import os

    import pyarrow.parquet as pa_pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(path):
        parts = glob.glob(os.path.join(path, "*.parquet"))
        if not parts:
            # nested layouts (partitioned writes) would otherwise count 0
            # rows and silently DISARM the broadcast gate below
            raise ValueError(
                f"_corpus_rows: no part files directly under {path!r}; "
                "nested/partitioned layouts are not supported by the "
                "footer-metadata count — flatten the table or gate by "
                "an explicit row count"
            )
        return sum(pa_pq.ParquetFile(p).metadata.num_rows for p in parts)
    return pa_pq.ParquetFile(path).metadata.num_rows


def assert_broadcastable_corpus(n_rows: int, limit: int | None = None) -> None:
    """Raise if a corpus is too large for the brute-force broadcast plan.

    *limit* defaults to the module-level ``BRUTEFORCE_MAX_CORPUS_ROWS`` read
    at CALL time, so deployments (and tests) can tune the gate by setting
    the module constant.
    """
    if limit is None:
        limit = BRUTEFORCE_MAX_CORPUS_ROWS
    if n_rows > limit:
        raise ValueError(
            f"similarity_bruteforce_topk: corpus has {n_rows} vectors, above "
            f"the broadcast gate of {limit}. The O(Q*N) dense baseline must "
            "not run at corpus scale - use similarity_srp_lsh_topk or "
            "similarity_ivf_kmeans_topk."
        )


def topk_per_query(
    pairs: "DataFrame",
    k: int | None = None,
    extra_partition: tuple[str, ...] = (),
) -> "DataFrame":
    """ONE definition of the ANN result ranking.

    Rank candidate ``(query_id, neighbor_id, cosine)`` pairs per query by
    ``cosine DESC NULLS LAST, neighbor_id ASC`` and keep the top *k*
    (``TOP_K`` read at CALL time). Every search variant — brute force,
    IVF, kmeans-IVF, SRP — and both phases of the salted exact truth rank
    through this helper, so a tie-break or k change cannot silently drift
    between operators; the SQL twins embed the same ORDER BY.
    """
    from pyspark.sql import Window

    if k is None:
        k = TOP_K
    w = Window.partitionBy("query_id", *extra_partition).orderBy(
        F.col("cosine").desc_nulls_last(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


@register("similarity_bruteforce_topk", defer=True, oracle=_SQL_BRUTE)
def similarity_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense exact top-k baseline via the matmul kernel.

    OPTIMIZATION r16 (guide §4.2/§8): the old shape materialized Q·N pair
    ROWS (broadcast corpus × queries) and evaluated one interpreted
    64-element HOF fold per pair — 210 s at a ×30 corpus, all per-pair
    overhead. Now the corpus streams through ONE ``mapInArrow`` stage
    (fan_out spreads the local single-row-group scan; no-op on real
    multi-file tables), the bounded query set rides a driver broadcast
    (Q = N/10 ≤ gate/10 rows — the same bounded-model-collect class as
    the IVF centroids), each Arrow batch is one BLAS matmul, and only the
    tie-exact per-batch top-k superset (≤ Q·k rows per batch) reaches the
    final exact ranking. Values are bit-identical (see
    :func:`_dense_topk_candidates`) — the oracle hash is the proof.
    """
    assert_broadcastable_corpus(_corpus_rows(sf_dir))
    q = _quantized(spark, sf_dir)
    queries_rows = (
        q.filter(F.col("vec_id") % QUERY_MOD == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("q").alias("qv"),
            F.col("norm").alias("qn"),
        )
        .collect()
    )
    corpus = fan_out(
        q.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("q").alias("cv"),
            F.col("norm").alias("cn"),
        )
    )
    pairs = _dense_topk_candidates(corpus, queries_rows, TOP_K)
    return topk_per_query(pairs)


_SQL_IVF = f"""
WITH {_SQL_QUANT},
pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {sql_cosine_case('a.q', 'b.q')} AS cosine
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


@register("similarity_ivf_topk", defer=True, oracle=_SQL_IVF)
def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: probe only the query's coarse partition (label).

    The bucket equi-join key turns the all-pairs cross join into a
    per-bucket join — at 100 TB each bucket co-locates via one shuffle and
    never sees the rest of the corpus. Recall < 1 by construction (single
    probe); add multi-probe by exploding candidate buckets per query.
    """
    # NOT the matmul kernel: unlike the gated brute-force baseline, this
    # query set is unbounded (N/10 of the corpus) — collecting it to the
    # driver would be exactly the unbounded-collect class the engine
    # bans. The per-label equi-join IS the scalable shape; the fold is
    # the per-pair cost it pays (r15 A/B: per-pair Arrow shipping loses).
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
    return topk_per_query(pairs)


# --- real IVF: deterministic k-means fit + multi-probe search --------------
KMEANS_LISTS = 8  # IVF coarse lists (k)
KMEANS_ITERS = 3  # coarse quantizers converge fast; more buys little recall
NPROBE = 3  # lists probed per query (recall/cost knob)
KMEANS_SAMPLE_MOD = 3  # fit on a deterministic ~1/3 hash-sample
EMB_DIM = 64  # embedding dimensionality of the corpus (also SRP_DIM below)

_CENTROIDS: dict[tuple[str, str, int, int, int], list[list[int]]] = {}


def _vec_sample_hash(col: str = "vec_id") -> F.Column:
    """60-bit md5 hash of the vector id — exact cross-engine twin.

    DuckDB form: ``CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
    AS BIGINT)``. Replaces ``xxhash64`` (which DuckDB lacks) everywhere the
    k-means fit needs seeded determinism, so the FIT ITSELF — sample
    membership and initialization order — is re-derivable in the oracle.
    """
    return F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10
    ).cast("long")


_SQL_VEC_HASH = "CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT)"


def _dist_expr(q, centroid: list[float]) -> F.Column:
    """−2·q·c + c·c — the argmin-equivalent part of ‖q−c‖² (q·q constant)."""
    c_arr = F.array(*[F.lit(float(x)) for x in centroid])
    qc = dot_product(q, c_arr)
    cc = float(sum(x * x for x in centroid))
    return -2.0 * qc + F.lit(cc)


def _nearest_lists(q, centroids: list[list[float]], n: int) -> F.Column:
    """Array of the *n* nearest centroid ids (by ‖q−c‖², ties → lower id).

    Pure-expression form — exact but interpreted (higher-order-function
    lambdas don't reach codegen), so it builds a k×d-literal expression
    tree. Used as the semantic reference; the hot path is
    :func:`nearest_lists_udf`, whose parity with this form is pytest-pinned.
    """
    scored = F.array(
        *[
            F.struct(_dist_expr(q, c).alias("d"), F.lit(i).alias("list_id"))
            for i, c in enumerate(centroids)
        ]
    )
    return F.transform(
        F.slice(F.array_sort(scored), 1, n), lambda s: s["list_id"]
    )


def nearest_lists_udf(centroids: list[list[float]], n: int):
    """Vectorized argmin-over-centroids as an Arrow-batched pandas UDF.

    The IVF assignment kernel is a dense (batch × d) @ (d × k) matmul plus a
    row-wise partial sort — a shape Spark's built-in array functions can
    only express as interpreted per-element folds. One BLAS matmul per
    Arrow batch is the sanctioned Pandas-UDF escape hatch (brief: built-ins
    first, vectorized UDF where built-ins genuinely can't express it
    efficiently). Ties break toward the lower list id (stable argsort),
    matching :func:`_nearest_lists`; parity is asserted in
    ``tests/test_similarity.py``.
    """
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)  # (k, d)
    cc = (C * C).sum(axis=1)  # (k,)

    def nearest(qs: pd.Series) -> pd.Series:
        Q = np.vstack(qs.to_numpy()).astype(np.float64)  # (batch, d)
        d2 = Q @ (-2.0 * C.T) + cc  # argmin-equivalent of ||q-c||^2
        idx = np.argsort(d2, axis=1, kind="stable")[:, :n].astype("int32")
        return pd.Series(list(idx))

    return pandas_udf(nearest, "array<int>")


def kmeans_fit(
    vectors: DataFrame,
    k: int = KMEANS_LISTS,
    iters: int = KMEANS_ITERS,
    sample_mod: int = KMEANS_SAMPLE_MOD,
    expected_dim: int = EMB_DIM,
) -> list[list[int]]:
    """Deterministic INTEGER Lloyd's k-means over (id, q: array<long>).

    Spark-first shape: each iteration is one codegen pass computing the
    argmin assignment against the broadcast (literal) centroids, then ONE
    shuffle keyed by the k cluster ids for the per-dimension means. The
    model (k × d ints) is the only thing that ever reaches the driver —
    collecting a model is not a driver-side data loop.

    Every quantity in the fit is EXACT cross-engine arithmetic, so the
    whole fit has a closed-form SQL twin (the oracle re-derives the model,
    not just the search):

    * sample membership and init order use the md5 hash
      (:func:`_vec_sample_hash`), not ``xxhash64`` (DuckDB lacks it);
    * centroids are INTEGER vectors: init = the k sample vectors with the
      smallest hash; each update rounds the per-dimension mean to
      ``floor(float(sum)/n)`` — the same IEEE double division + floor
      DuckDB computes as ``FLOOR(CAST(SUM(..) AS DOUBLE) / COUNT(*))``
      (sums of quantized components stay < 2⁵³ up to ~10¹⁰-row fit
      samples, so the double is the exact integer sum);
    * distances ``-2·q·c + c·c`` are integer dot products (< 2⁵³),
      identical under any summation order — the numpy matmul in
      :func:`nearest_lists_udf`, the Spark HOF fold, and DuckDB's
      ``list_dot_product`` all produce the same exact value, so argmin
      (tie → lower list id) matches bit-for-bit.

    Rounding centroids to the int grid perturbs the coarse quantizer by
    ≤ 0.5 in quantized units (1e-4 of vector scale) — irrelevant for a
    partitioner, and what buys full-value oracle checkability.

    The fit runs on a deterministic ~1/``sample_mod`` hash-sample of the
    corpus, persisted across the Lloyd iterations (a coarse quantizer needs
    the density shape, not every vector — the standard IVF practice at
    scale, where the fit sample is orders of magnitude smaller than the
    corpus being indexed).
    """
    import math

    sample = vectors.select("vec_id", "q").withColumn(
        "h", _vec_sample_hash("vec_id")
    )
    if sample_mod > 1:
        sample = sample.filter(F.pmod(F.col("h"), F.lit(sample_mod)) == 0)
    # the fit sample is 1/sample_mod of the corpus — NOT constant-sized —
    # so size the partition count to the cluster, not a constant: a fixed
    # coalesce(8) serialized a third of the corpus through 8 workers per
    # Lloyd iteration at scale. defaultParallelism = total cores (local
    # and cluster alike), the natural Arrow-worker count per pass.
    fit_parts = vectors.sparkSession.sparkContext.defaultParallelism
    sample = sample.coalesce(fit_parts).persist()
    try:
        row = sample.select(F.size("q").alias("d")).first()
        if row is None and sample_mod > 1:
            # degenerate tiny corpus where no vec_id hashes to 0 mod
            # sample_mod: fit on the full corpus rather than crash. (The
            # SQL oracle would produce an empty centroid set here — a
            # non-answer for a non-empty corpus; registered corpora are
            # orders of magnitude past this regime.)
            sample.unpersist()
            sample = (
                vectors.select("vec_id", "q")
                .withColumn("h", _vec_sample_hash("vec_id"))
                .coalesce(fit_parts)
                .persist()
            )
            row = sample.select(F.size("q").alias("d")).first()
        if row is None:
            raise ValueError("kmeans_fit: no vectors to fit (empty input)")
        d = row.d
        if d != expected_dim:
            # the SQL oracle's unrolled Lloyd CTEs hardcode the dim count
            # (range(1, dim+1)); a corpus of another width would fit a
            # DIFFERENT model oracle-side and surface as a baffling value
            # mismatch — fail here with the actual constraint instead.
            # expected_dim defaults to EMB_DIM; the PQ sub-fits pass the
            # subvector width so their slices check against the right dim.
            raise ValueError(
                f"kmeans_fit: input dimensionality {d} != expected "
                f"{expected_dim}; retune similarity.EMB_DIM / the PQ "
                "slice (the SQL oracle twin derives its per-dimension "
                "terms from it)"
            )
        init = sample.orderBy("h", "vec_id").limit(k).collect()
        centroids = [[int(x) for x in r.q] for r in init]
        # a sample smaller than k yields fewer lists — same shrink the SQL
        # oracle's LIMIT k init exhibits, and still a valid coarse quantizer
        k_eff = len(centroids)
        for _ in range(iters):
            assign = nearest_lists_udf(centroids, 1)
            assigned = sample.select(
                "q", F.element_at(assign(F.col("q")), 1).alias("list_id")
            )
            sums = assigned.groupBy("list_id").agg(
                F.count("*").alias("n"),
                *[F.sum(F.col("q")[i]).alias(f"s{i}") for i in range(d)],
            )
            got = {
                r.list_id: [
                    math.floor(float(r[f"s{i}"]) / r.n) for i in range(d)
                ]
                for r in sums.collect()
            }
            # empty clusters keep their previous centroid (standard Lloyd's)
            centroids = [got.get(i, centroids[i]) for i in range(k_eff)]
        return centroids
    finally:
        sample.unpersist()


def ivf_centroids(
    spark: SparkSession,
    sf_dir: str,
    fit_pred: "F.Column | None" = None,
    subset_tag: str = "",
) -> list[list[float]]:
    """Fit (or reuse) the IVF coarse quantizer for one dataset.

    Index-build vs search separation, as in any production ANN system: the
    fit is a one-time indexing job whose model artifact (k × d centroids,
    deterministic for a given dataset/config) is persisted and reloaded;
    queries pay only the search. The artifact is keyed by dataset + fit
    config so a config change refits. *fit_pred*/*subset_tag* restrict the
    fit input (the incremental index fits on the standing corpus only) —
    the tag distinguishes the subset model's cache key and artifact from
    the full-corpus model's.
    """
    from ting_data_etl_spark.operators.dedup import _source_fp

    # cache key + artifact name carry the FULL fit config (k, iters,
    # sample_mod) AND the source (mtime, size) fingerprint: a retune of
    # any fit param must miss the cache and refit, and a testdata
    # regeneration must invalidate the IN-MEMORY model too — a long-lived
    # process previously served stale centroids from _CENTROIDS after the
    # parquet changed underneath it (the on-disk name was fingerprinted,
    # the dict key was not).
    src_fp = _source_fp(sf_dir, "embeddings")
    key = (
        sf_dir,
        f"{src_fp}{subset_tag and f'_{subset_tag}'}",
        KMEANS_LISTS,
        KMEANS_ITERS,
        KMEANS_SAMPLE_MOD,
    )

    def fit() -> list[list[int]]:
        # every fit param passed EXPLICITLY: kmeans_fit's defaults bind
        # the import-time values, so a capacity retune of a module
        # constant would otherwise fit with stale params while the
        # cache key and artifact name claim the retuned ones (caught by
        # the SCALE_r06 run: a "447-list" 200k-vector index was an
        # 8-list fit and searches scanned 25k-vector lists).
        fit_input = _quantized(spark, sf_dir)
        if fit_pred is not None:
            return kmeans_fit(
                fit_input.filter(fit_pred),
                k=KMEANS_LISTS,
                iters=KMEANS_ITERS,
                sample_mod=KMEANS_SAMPLE_MOD,
            )
        return kmeans_fit(
            fit_input,
            k=KMEANS_LISTS,
            iters=KMEANS_ITERS,
            sample_mod=KMEANS_SAMPLE_MOD,
        )

    # v2 = integer-exact md5-seeded fit; the version tag invalidates
    # durable v1 float-model artifacts left by earlier revisions.
    return _staged_json_fit(
        _CENTROIDS,
        key,
        sf_dir,
        [
            f"ivf_model_v2{subset_tag and f'_{subset_tag}'}",
            src_fp,
            f"k{KMEANS_LISTS}_i{KMEANS_ITERS}_m{KMEANS_SAMPLE_MOD}",
        ],
        fit,
    )


def _staged_json_fit(cache: dict, key: tuple, sf_dir: str, path_parts, fit_fn):
    """ONE definition of the fit-once / stage-JSON / cache ritual.

    Shared by the coarse quantizer (:func:`ivf_centroids`, ``_CENTROIDS``)
    and the PQ sub-codebooks (:func:`pq_codebooks`, ``_PQ_BOOKS``) —
    previously two near-verbatim ~40-line copies whose next staging fix
    (a lock, a fingerprint change) could silently miss one. Path built by
    dedup's shared ``_stage_dir`` (collision-free md5 dataset tag); the
    publish is atomic (tmp + rename) so a crash mid-dump can never leave a
    truncated json that every later process crashes on. ``purge_stages``
    evicts both caches.
    """
    import json
    import os

    from ting_data_etl_spark.operators.dedup import _stage_dir

    if key not in cache:
        path = _stage_dir(sf_dir, list(path_parts)) + ".json"
        if os.path.exists(path):
            with open(path) as f:
                cache[key] = json.load(f)
        else:
            from ting_data_etl_spark import runstats

            runstats.record("stage_build", path)
            cache[key] = fit_fn()
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(cache[key], f)
            os.replace(tmp, path)
    return cache[key]


def _sql_lloyd_iter_g(i: int, prefix: str = "", dim: int = EMB_DIM) -> str:
    """One unrolled Lloyd iteration as SQL CTEs, name-prefixed.

    ``{prefix}c{i-1}`` → ``{prefix}a{i}``, ``{prefix}m{i}``,
    ``{prefix}c{i}``, reading the fit sample from ``{prefix}samp``.
    Assignment = argmin over the k centroids of the integer-exact
    ``-2·q·c + c·c`` (ties → lower list id); update = per-dimension
    ``FLOOR(SUM/COUNT)`` int means, empty clusters keeping their previous
    centroid — step-for-step the arithmetic of :func:`kmeans_fit`.
    *prefix*/*dim* parameterize the chain so the PQ sub-quantizer fits
    (M chains over ``dim = EMB_DIM // PQ_M`` residual slices) reuse ONE
    definition; the coarse chain is the ``prefix=''`` instance.
    """
    p = prefix
    prev = f"{p}c{i - 1}"
    return f"""
{p}a{i} AS (
  SELECT s.vec_id, s.q, c.list_id,
         row_number() OVER (PARTITION BY s.vec_id ORDER BY
           -2 * list_dot_product(s.q, c.c) + list_dot_product(c.c, c.c),
           c.list_id) AS rn
  FROM {p}samp s CROSS JOIN {prev} c
),
{p}m{i} AS (
  SELECT list_id, dim,
         CAST(FLOOR(CAST(SUM(q[dim]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
  FROM {p}a{i} CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS dim)
  WHERE rn = 1
  GROUP BY list_id, dim
),
{p}c{i} AS (
  SELECT c.list_id, COALESCE(mm.c, c.c) AS c
  FROM {prev} c LEFT JOIN (
    SELECT list_id, list(m ORDER BY dim) AS c FROM {p}m{i} GROUP BY list_id
  ) mm ON mm.list_id = c.list_id
)"""


def _sql_lloyd_iter(i: int) -> str:
    """The coarse-quantizer instance of :func:`_sql_lloyd_iter_g`."""
    return _sql_lloyd_iter_g(i, "", EMB_DIM)


def sql_kmeans_search_ctes(
    query_pred: str,
    fit_pred: str = "TRUE",
    corpus_pred: str = "TRUE",
    vec_relation: str = "q",
) -> str:
    """CTE chain re-deriving the ENTIRE IVF pipeline in SQL: fit + search.

    Expects a ``q`` CTE (quantized vectors) in scope; ends in ``ivf_topk``
    (query_id, neighbor_id, cosine). The k-means model is NOT imported
    from the Spark side — the oracle refits it from scratch (md5-seeded
    sample, k smallest-hash init, {KMEANS_ITERS} unrolled integer Lloyd
    iterations), so a drift anywhere in the fit shows up as a value
    mismatch, not just a search mismatch. *fit_pred* restricts the fit
    sample (the incremental variant fits on the standing corpus only).
    *corpus_pred* filters the SEARCHED corpus after assignment (the
    delete variant tombstones ids out without touching the fit — the fit
    predates the deletion, exactly like the staged Spark index).
    *vec_relation* names the (vec_id, q) relation assignment and search
    read vectors from — the delete/re-add variant points it at a ``q2``
    that carries re-embedded vectors, while the fit sample always reads
    the original ``q`` (the model was fitted before the updates).
    """
    iters = "\n,".join(_sql_lloyd_iter(i + 1) for i in range(KMEANS_ITERS))
    return f"""
samp AS (
  SELECT vec_id, q, {_SQL_VEC_HASH} AS h
  FROM q WHERE ({fit_pred}) AND {_SQL_VEC_HASH} % {KMEANS_SAMPLE_MOD} = 0
),
c0 AS (
  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS list_id, q AS c
  FROM (SELECT h, vec_id, q FROM samp ORDER BY h, vec_id LIMIT {KMEANS_LISTS})
),
{iters},
assign AS (
  SELECT v.vec_id, v.q, c.list_id,
         row_number() OVER (PARTITION BY v.vec_id ORDER BY
           -2 * list_dot_product(v.q, c.c) + list_dot_product(c.c, c.c),
           c.list_id) AS rn
  FROM {vec_relation} v CROSS JOIN c{KMEANS_ITERS} c
),
ivf_corpus AS (
  SELECT vec_id AS neighbor_id, q AS cv, list_id FROM assign
  WHERE rn = 1 AND ({corpus_pred})
),
ivf_probes AS (
  SELECT vec_id AS query_id, q AS qv, list_id
  FROM assign WHERE rn <= {NPROBE} AND ({query_pred})
),
ivf_pairs AS (
  SELECT p.query_id, c.neighbor_id,
         {sql_cosine_case('p.qv', 'c.cv')} AS cosine
  FROM ivf_probes p JOIN ivf_corpus c
    ON p.list_id = c.list_id AND c.neighbor_id <> p.query_id
),
ivf_topk AS (
  SELECT query_id, neighbor_id, cosine FROM (
    SELECT *, row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC NULLS LAST, neighbor_id ASC
           ) AS rn
    FROM ivf_pairs
  ) WHERE rn <= {TOP_K}
)"""


_SQL_IVF_KMEANS = f"""
WITH {_SQL_QUANT},
{sql_kmeans_search_ctes(f"vec_id % {QUERY_MOD} = 0")}
SELECT query_id, neighbor_id, cosine FROM ivf_topk
"""


@register("similarity_ivf_kmeans_topk", oracle=_SQL_IVF_KMEANS)
def similarity_ivf_kmeans(
    spark: SparkSession, sf_dir: str, query_ids: list[int] | None = None
) -> DataFrame:
    """IVF top-k with a REAL k-means coarse quantizer and multi-probe.

    Corpus vectors live in their nearest centroid's list; each query probes
    its NPROBE nearest lists. The search join is an equi-join on
    ``list_id`` — each list co-locates via one shuffle and a query never
    scans the rest of the corpus: the standard IVF layout at 100 TB, where
    the fit runs on a sample and the assignment is one codegen pass.

    FULL oracle check (r6): the fit is integer-exact and md5-seeded (see
    :func:`kmeans_fit`), so the oracle refits the identical model in SQL
    (:func:`sql_kmeans_search_ctes`) and value-hashes the search output —
    no rows-only weakening.
    """
    centroids = ivf_centroids(spark, sf_dir)
    q = _quantized(spark, sf_dir)
    assign1 = nearest_lists_udf(centroids, 1)
    assign_probe = nearest_lists_udf(centroids, NPROBE)
    corpus = q.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("q").alias("cv"),
        F.col("norm").alias("cn"),
        F.element_at(assign1(F.col("q")), 1).alias("list_id"),
    )
    qpred = (
        F.col("vec_id").isin(query_ids)
        if query_ids is not None
        else F.col("vec_id") % QUERY_MOD == 0
    )
    queries = q.filter(qpred).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qv"),
        F.col("norm").alias("qn"),
        F.explode(assign_probe(F.col("q"))).alias("probe_list"),
    )
    pairs = queries.join(
        corpus,
        (F.col("probe_list") == F.col("list_id"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select(
        "query_id",
        "neighbor_id",
        cosine_udf()(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias(
            "cosine"
        ),
    )
    return topk_per_query(pairs)


# --- SRP-LSH: signed-random-projection bucketed cosine search --------------
SRP_TABLES = 4  # independent hash tables (the recall knob)
# Hyperplanes per table — THE capacity knob, sized to the corpus: candidate
# cost per query is ~ N / 2^SRP_BITS per probed bucket, so deployments pick
# bits ≈ log2(N / target_bucket_size) (target ~32-128 vectors/bucket; e.g.
# N=1e9 → 23-25 bits), regenerating SRP_SIGNS to that width. 6 bits fits the
# test corpora (2k vectors → ~31/bucket); it is a CONSTANT, not a formula,
# because the DuckDB oracle embeds the same planes as literals at import
# time — retuning is a config change that refits both sides together.
SRP_BITS = 6
SRP_DIM = EMB_DIM  # embedding dimensionality of the corpus


def _srp_signs() -> list[list[list[int]]]:
    """Deterministic ±1 hyperplane components (Rademacher via md5 parity).

    ``signs[t][b][i]`` = component i of hyperplane b in table t. Computed
    driver-side once and embedded as LITERALS in both the Spark plan and the
    oracle SQL — the two engines never have to agree on an RNG, only on
    integer dot products, which are exact.
    """
    import hashlib

    return [
        [
            [
                1
                if int(hashlib.md5(f"srp:{t}:{b}:{i}".encode()).hexdigest()[0], 16) % 2
                == 0
                else -1
                for i in range(SRP_DIM)
            ]
            for b in range(SRP_BITS)
        ]
        for t in range(SRP_TABLES)
    ]


SRP_SIGNS = _srp_signs()


def srp_bucket(q, table: int) -> F.Column:
    """SRP bucket id in one table: bit b = [q·h_b ≥ 0], packed into an int.

    Charikar's sign-random-projection LSH for cosine: vectors within angle θ
    collide on a bit with probability 1−θ/π. The dot products are integer
    (quantized vectors × ±1 literals) so the bucket id is bit-identical in
    DuckDB.
    """
    total = F.lit(0)
    for b, signs in enumerate(SRP_SIGNS[table]):
        s_arr = F.array(*[F.lit(s) for s in signs])
        proj = dot_product(q, s_arr)
        total = total + F.when(proj >= 0, F.lit(1 << b)).otherwise(F.lit(0))
    return total.cast("int")


def srp_buckets_udf():
    """All SRP table buckets in one Arrow-batched matmul — the hot path.

    (batch × d) @ (d × T·B) signs matrix → sign bits → per-table packed
    bucket ids, returned as ``array<int>`` of length SRP_TABLES. Integer
    dot products with ±1 literals are exact in float64 (|Σ| ≤ 64·10⁵ ≪
    2⁵³), so the buckets are bit-identical to the expression form
    (:func:`srp_bucket`) and the DuckDB oracle — parity is pytest-pinned.
    """
    from pyspark.sql.functions import pandas_udf

    S = np.asarray(
        [SRP_SIGNS[t][b] for t in range(SRP_TABLES) for b in range(SRP_BITS)],
        dtype=np.float64,
    ).T  # (d, T*B)
    weights = np.tile(
        np.array([1 << b for b in range(SRP_BITS)], dtype=np.int64),
        SRP_TABLES,
    ).reshape(SRP_TABLES, SRP_BITS)

    def buckets(qs: pd.Series) -> pd.Series:
        Q = np.vstack(qs.to_numpy()).astype(np.float64)  # (batch, d)
        bits = (Q @ S >= 0).reshape(len(Q), SRP_TABLES, SRP_BITS)
        packed = (bits * weights).sum(axis=2).astype("int32")
        return pd.Series(list(packed))

    return pandas_udf(buckets, "array<int>")


def _sql_srp_bucket(t: int) -> str:
    terms = []
    for b, signs in enumerate(SRP_SIGNS[t]):
        arr = "list_value(" + ", ".join(str(s) for s in signs) + ")"
        terms.append(
            f"CASE WHEN list_dot_product(q, {arr}) >= 0 THEN {1 << b} ELSE 0 END"
        )
    return "CAST(" + " + ".join(terms) + " AS INTEGER)"


def _sql_srp_probes() -> str:
    flips = ", ".join(f"xor(bucket, {1 << b})" for b in range(SRP_BITS))
    return f"list_value(bucket, {flips})"


def sql_srp_search_ctes(query_pred: str) -> str:
    """CTE chain for the SRP-LSH multi-probe search in SQL.

    Expects a ``q`` CTE in scope; ends in ``srp_topk`` (query_id,
    neighbor_id, cosine). Parameterized on the query predicate so the
    recall-report oracle can restrict the search to its fixed sample.
    """
    return f"""
srp_bq AS (
  SELECT vec_id, q, t, CASE t
           {" ".join(f"WHEN {t} THEN {_sql_srp_bucket(t)}" for t in range(SRP_TABLES))}
         END AS bucket
  FROM q CROSS JOIN (SELECT unnest(range(0, {SRP_TABLES})) AS t)
),
srp_probes AS (
  SELECT vec_id, q, t, unnest({_sql_srp_probes()}) AS probe
  FROM srp_bq WHERE {query_pred}
),
srp_pairs AS (
  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {sql_cosine_case('a.q', 'b.q')} AS cosine
  FROM srp_probes a JOIN srp_bq b
    ON a.t = b.t AND a.probe = b.bucket AND b.vec_id <> a.vec_id
),
srp_topk AS (
  SELECT query_id, neighbor_id, cosine
  FROM (
    SELECT *, row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC NULLS LAST, neighbor_id ASC
           ) AS rn
    FROM srp_pairs
  ) WHERE rn <= {TOP_K}
)"""


_SQL_SRP = f"""
WITH {_SQL_QUANT},
{sql_srp_search_ctes(f"vec_id % {QUERY_MOD} = 0")}
SELECT query_id, neighbor_id, cosine FROM srp_topk
"""


@register("similarity_srp_lsh_topk", oracle=_SQL_SRP)
def similarity_srp_lsh(
    spark: SparkSession, sf_dir: str, query_ids: list[int] | None = None
) -> DataFrame:
    """LSH-bucketed cosine top-k: multi-table signed random projections.

    The LSH leg of the ANN suite (IVF being the learned-partition leg): the
    corpus is hashed into SRP_TABLES independent tables of 2^SRP_BITS
    buckets; each query probes, per table, its own bucket plus the SRP_BITS
    hamming-1 flips (multi-probe). Independent tables are the classic LSH
    recall amplifier — a true neighbor is missed only if it misses in EVERY
    table. The search is an equi-join on (table, bucket) — one shuffle keyed
    by 8 bytes of ints, never a corpus broadcast — and, unlike the k-means
    IVF, the hash family is data-independent: no training job, stable under
    corpus drift, and fully oracle-checkable (probe expansion and bucket
    assignment are deterministic integer arithmetic).

    A neighbor reachable through several tables would be scored repeatedly,
    so candidate (query, neighbor, cosine) rows are deduplicated before the
    top-k window — a shuffle of 24-byte rows, after the vectors have
    already been dropped.
    """
    q = _quantized(spark, sf_dir)
    assign = srp_buckets_udf()
    bq = q.select(
        "vec_id",
        "q",
        "norm",
        F.posexplode(assign(F.col("q"))).alias("t", "bucket"),
    )
    qpred = (
        F.col("vec_id").isin(query_ids)
        if query_ids is not None
        else F.col("vec_id") % QUERY_MOD == 0
    )
    probes = bq.filter(qpred).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qv"),
        F.col("norm").alias("qn"),
        F.col("t").alias("qt"),
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << b))
                    for b in range(SRP_BITS)
                ],
            )
        ).alias("probe"),
    )
    corpus = bq.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("q").alias("cv"),
        F.col("norm").alias("cn"),
        F.col("t").alias("ct"),
        F.col("bucket").alias("cbucket"),
    )
    pairs = (
        probes.join(
            corpus,
            (F.col("qt") == F.col("ct"))
            & (F.col("probe") == F.col("cbucket"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            cosine_udf()(
                F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
            ).alias("cosine"),
        )
        .distinct()
    )
    return topk_per_query(pairs)


NEAR_DUP_THRESHOLD = 0.3

# Exact-within-label reference form (round-2 registered semantics): all
# pairs inside a coarse bucket. Kept UNREGISTERED as the recall reference —
# the per-block all-pairs join is O(N²/|blocks|) at corpus scale, which is
# exactly what the registered candidate-driven form exists to avoid.
_SQL_NEAR_PAIRS_LABELBLOCK = f"""
WITH {_SQL_QUANT}
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       list_dot_product(a.q, b.q) /
         (sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q))) AS cosine
FROM q a JOIN q b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q)) <> 0
  AND list_dot_product(a.q, b.q) /
      (sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q))) >= {NEAR_DUP_THRESHOLD}
"""


def dedup_embedding_pairs_labelblock(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """All-pairs-within-label near-dup pairs — the small-N recall reference.

    Used by the tests to measure the candidate-driven form's recall; not
    registered (fixed-cardinality blocks make each block all-pairs).
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
    return pairs.filter(F.col("cosine") >= NEAR_DUP_THRESHOLD)


def srp_candidate_pairs(
    spark: SparkSession, sf_dir: str, use_arrow: bool = True
) -> DataFrame:
    """Near-dup candidate pairs from the SRP-LSH tables, cosine-verified.

    The sublinear shape of embedding dedup at 100 TB: a pair is a candidate
    iff its SRP buckets collide within hamming distance 1 in ANY of the
    SRP_TABLES tables (the same multi-probe family as
    :func:`similarity_srp_lsh_topk`), and only candidates pay a cosine
    evaluation. Every join is an equi-join on (table, bucket) ints — one
    bounded shuffle, no per-block all-pairs blowup, candidate volume scales
    with bucket occupancy, not N².

    ``use_arrow=False`` builds the identical relation from pure JVM
    expressions (``srp_bucket`` + the HOF cosine fold) — required when the
    relation feeds iterative persist/checkpoint loops, where Arrow-UDF
    stages have wedged python workers (see ``connected_components``); bucket
    and cosine parity between the two forms is pytest-pinned.
    """
    q = _quantized(spark, sf_dir)
    if use_arrow:
        return _srp_grouped_pairs(q)
    bq = q.select(
        "vec_id",
        "q",
        "norm",
        F.posexplode(
            F.array(*[srp_bucket(F.col("q"), t) for t in range(SRP_TABLES)])
        ).alias("t", "bucket"),
    )
    probes = bq.select(
        F.col("vec_id").alias("vec_a"),
        F.col("q").alias("qa"),
        F.col("norm").alias("na"),
        F.col("t").alias("ta"),
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << b))
                    for b in range(SRP_BITS)
                ],
            )
        ).alias("probe"),
    )
    corpus = bq.select(
        F.col("vec_id").alias("vec_b"),
        F.col("q").alias("qb"),
        F.col("norm").alias("nb"),
        F.col("t").alias("tb"),
        F.col("bucket").alias("cbucket"),
    )
    cos = _cosine_pre(F.col("qa"), F.col("qb"), F.col("na"), F.col("nb"))
    pairs = (
        probes.join(
            corpus,
            (F.col("ta") == F.col("tb"))
            & (F.col("probe") == F.col("cbucket"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= NEAR_DUP_THRESHOLD)
        # a pair can collide in several tables/probes; dedupe the narrow
        # (id, id, cosine) rows after the vectors have been dropped
        .distinct()
    )
    return pairs


def _srp_grouped_pairs(q: DataFrame) -> DataFrame:
    """SRP near-dup pairs via PER-BUCKET grouped matmuls (the Arrow path).

    The r5 plan shipped two 64-dim vectors per CANDIDATE PAIR into the
    cosine UDF — at sf0.1 that is ~900k pair rows ≈ 930 MB of Arrow
    traffic for a 2000-vector corpus (measured; the pair join is dense by
    design at test scale, where 4 tables × 7 probes ÷ 2⁶ buckets covers
    ~44% of the pair space). This form ships each vector to Python once
    per (table, bucket) — 1 home row + SRP_BITS probe rows per table,
    ~30× less Arrow volume — and computes all within-group cosines with
    one BLAS matmul, emitting only pairs ≥ NEAR_DUP_THRESHOLD.

    Pair-set equivalence with the join form (pytest-pinned): a hamming-0
    collision appears once as a home/home pair in the shared bucket; a
    hamming-1 collision appears in exactly two groups (each side's home
    bucket), and the ``home.vec_id < probe.vec_id`` emission rule keeps
    exactly the copy where the HOME member has the smaller id. Cosines are
    the identical exact integer dot products (< 2⁵³, order-independent),
    so values are bit-equal to the expression form and the SQL oracle.
    One shuffle (the groupBy), then a distinct over the tiny above-threshold
    output to merge cross-table duplicates.
    """

    threshold = NEAR_DUP_THRESHOLD

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        home = pdf[pdf["is_home"] == 1]
        if home.empty:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
            )
        H = np.vstack(home["q"].to_numpy()).astype(np.float64)
        hid = home["vec_id"].to_numpy()
        hn = home["norm"].to_numpy().astype(np.float64)
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        if len(home) >= 2:
            with np.errstate(divide="ignore", invalid="ignore"):
                C = (H @ H.T) / np.outer(hn, hn)
            ii, jj = np.triu_indices(len(hid), k=1)
            keep = C[ii, jj] >= threshold
            a, b = hid[ii[keep]], hid[jj[keep]]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
            out_c.append(C[ii[keep], jj[keep]])
        probe = pdf[pdf["is_home"] == 0]
        if not probe.empty:
            P = np.vstack(probe["q"].to_numpy()).astype(np.float64)
            pid = probe["vec_id"].to_numpy()
            pn = probe["norm"].to_numpy().astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                C = (H @ P.T) / np.outer(hn, pn)
            mask = (hid[:, None] < pid[None, :]) & (C >= threshold)
            ii, jj = np.nonzero(mask)
            out_a.append(hid[ii])
            out_b.append(pid[jj])
            out_c.append(C[ii, jj])
        if not out_a:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
            )
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a),
                "vec_b": np.concatenate(out_b),
                "cosine": np.concatenate(out_c),
            }
        )

    assign = srp_buckets_udf()
    bq = q.select(
        "vec_id",
        "q",
        "norm",
        F.posexplode(assign(F.col("q"))).alias("t", "bucket"),
    )
    members = bq.select(
        "t", "bucket", "vec_id", "q", "norm", F.lit(1).alias("is_home")
    ).unionByName(
        bq.select(
            "t",
            F.explode(
                F.array(
                    *[
                        F.col("bucket").bitwiseXOR(F.lit(1 << b))
                        for b in range(SRP_BITS)
                    ]
                )
            ).alias("bucket"),
            "vec_id",
            "q",
            "norm",
            F.lit(0).alias("is_home"),
        )
    )
    return (
        members.groupBy("t", "bucket")
        .applyInPandas(bucket_pairs, "vec_a long, vec_b long, cosine double")
        .distinct()
    )


def sql_srp_pair_ctes() -> str:
    """CTE fragment computing ``cos_pairs`` — the DuckDB twin of
    :func:`srp_candidate_pairs` (shared SRP constants). Composable: the
    ensemble-dedup oracle reuses it inside its recursive closure."""
    return f"""{_SQL_QUANT},
bq AS (
  SELECT vec_id, q, t, CASE t
           {" ".join(f"WHEN {t} THEN {_sql_srp_bucket(t)}" for t in range(SRP_TABLES))}
         END AS bucket
  FROM q CROSS JOIN (SELECT unnest(range(0, {SRP_TABLES})) AS t)
),
srp_probes AS (
  SELECT vec_id, q, t, unnest({_sql_srp_probes()}) AS probe
  FROM bq
),
cos_pairs AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_dot_product(a.q, b.q) /
           (sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q))) AS cosine
  FROM srp_probes a JOIN bq b
    ON a.t = b.t AND a.probe = b.bucket AND a.vec_id < b.vec_id
  WHERE sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q)) <> 0
    AND list_dot_product(a.q, b.q) /
        (sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q))) >= {NEAR_DUP_THRESHOLD}
)"""


_SQL_NEAR_PAIRS = f"""
WITH {sql_srp_pair_ctes()}
SELECT vec_a, vec_b, cosine FROM cos_pairs
"""


@register("dedup_embedding_cosine_pairs", oracle=_SQL_NEAR_PAIRS)
def dedup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (≥ 0.3), SRP-candidate-driven.

    The embedding leg of the dedup suite: semantic near-dups that n-gram
    methods miss. Candidates come from the SRP-LSH tables (hamming-≤1
    multi-probe) and only candidates pay a cosine — the registered plan has
    no all-pairs join anywhere; the exact within-label form
    (:func:`dedup_embedding_pairs_labelblock`) remains as the tested recall
    reference. The oracle mirrors the candidate generation exactly, so the
    hash comparison checks the whole candidate+verify pipeline.
    """
    return srp_candidate_pairs(spark, sf_dir, use_arrow=True)


#: The strict ("remove these") threshold, vs NEAR_DUP_THRESHOLD's loose
#: ("mine these") floor. SCALE_r06 measured why they are different
#: operators: at 0.3 a label-clustered corpus emits its own cluster
#: structure (36.6M pairs at the 200k-vector corpus — similarity mining),
#: while a strict cut emits only the true duplicate set (planted copies:
#: 4,000 of 4,000 found at >=0.9, zero false positives) and grows linearly
#: with N. The value is deployment config, set to the corpus's noise floor:
#: real embedding models cluster duplicates above ~0.9; this synthetic
#: corpus's distribution tops out lower (max pair cosine 0.48/0.51/0.60 at
#: sf0.001/0.01/0.1), so 0.45 plays that role here — strictly above the
#: random-pair mass, keeping the driver evidence non-trivial at every sf.
STRICT_DUP_THRESHOLD = 0.45

_SQL_NEAR_PAIRS_STRICT = f"""
WITH {sql_srp_pair_ctes()}
SELECT vec_a, vec_b, cosine FROM cos_pairs WHERE cosine >= {STRICT_DUP_THRESHOLD}
"""


@register("dedup_embedding_strict_pairs", oracle=_SQL_NEAR_PAIRS_STRICT)
def dedup_embedding_strict_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding duplicate pairs at the strict removal threshold.

    Same SRP-candidate plan as :func:`dedup_embedding_pairs`; the stricter
    verify is a post-filter, so the two queries share every expensive stage
    and differ only in emission volume — linear here (the actual duplicate
    set) vs corpus-structure-dependent at the mining floor (SCALE_r06.md).
    """
    return srp_candidate_pairs(spark, sf_dir, use_arrow=True).filter(
        F.col("cosine") >= STRICT_DUP_THRESHOLD
    )


# --- per-label embedding statistics (grouped-map applyInPandas) ------------
_SQL_LABEL_STATS = f"""
WITH {_SQL_QUANT},
e AS (
  SELECT label, generate_subscripts(q, 1) AS dim, unnest(q) AS x FROM q
),
d AS (
  SELECT label, dim, COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sx2
  FROM e GROUP BY label, dim
),
t AS (
  SELECT label, MAX(n) AS n,
         SUM(n * sx2 - sx * sx) AS scaled_var,
         SUM(sx2) AS ssx2
  FROM d GROUP BY label
)
SELECT label,
       CAST(n AS BIGINT) AS n_vectors,
       CAST(scaled_var AS DOUBLE) / (n * n) AS var_trace,
       CAST(ssx2 AS DOUBLE) / n AS mean_sq_norm
FROM t
"""


@register("embedding_label_stats", oracle=_SQL_LABEL_STATS)
def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label dispersion stats via grouped-map ``applyInPandas``.

    The cluster-quality numbers an embedding-curation pipeline watches:
    covariance trace (within-label dispersion) and mean squared norm per
    label. Grouped-map pandas is the right tool here — a per-group dense
    matrix reduction — and the arithmetic is kept EXACT so the pandas path
    hash-matches the SQL oracle: the variance numerator is computed as the
    integer ``Σ_dims (n·Σx² − (Σx)²)`` in arbitrary-precision Python ints
    (DuckDB: HUGEINT), and floats appear only in the single final division —
    int→double rounding and one divide are IEEE-identical in both engines.
    One shuffle on label; group size bounds driver-free memory.
    """

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        M = np.vstack(pdf["q"].to_numpy()).astype(np.int64)  # (n, d)
        n = M.shape[0]
        sx = [int(v) for v in M.sum(axis=0)]
        sx2 = [int(v) for v in (M.astype(object) ** 2).sum(axis=0)]
        scaled_var = sum(n * b - a * a for a, b in zip(sx, sx2))
        ssx2 = sum(sx2)
        return pd.DataFrame(
            {
                "label": [int(pdf["label"].iloc[0])],
                "n_vectors": [n],
                "var_trace": [float(scaled_var) / (n * n)],
                "mean_sq_norm": [float(ssx2) / n],
            }
        )

    q = _quantized(spark, sf_dir).select("label", "q")
    return q.groupBy("label").applyInPandas(
        stats, "label int, n_vectors long, var_trace double, mean_sq_norm double"
    )


# Recall is estimated over a FIXED query sample, independent of corpus size.
# The truth leg is then O(|sample| * N) with |sample| constant — the sample
# vectors broadcast (32 x d ints, a few KB) and the corpus STREAMS past them
# in one codegen pass; the full-corpus broadcast of the gated brute-force
# baseline never appears in this plan, so the report keeps working at any N.
RECALL_SAMPLE_Q = 32
# Salt width for the two-phase top-k: phase 1 takes a per-(query, salt)
# top-k so no single reducer ever sorts a whole corpus worth of pairs;
# phase 2 re-ranks the Q * SALT * k survivors.
_RECALL_TOPK_SALT = 64


def _recall_sample_ids(spark: SparkSession, sf_dir: str) -> list[int]:
    """Deterministic bounded query sample: lowest RECALL_SAMPLE_Q query ids.

    ``orderBy().limit()`` compiles to TakeOrdered — a per-partition heap +
    driver merge of RECALL_SAMPLE_Q ids, never a global sort. The collect is
    a bounded scalar (≤ 32 longs), same class as the k-means model collect.
    """
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id")
        .filter(F.col("vec_id") % QUERY_MOD == 0)
        .orderBy("vec_id")
        .limit(RECALL_SAMPLE_Q)
        .collect()
    )
    return [r.vec_id for r in rows]


def _bruteforce_truth_sampled(
    spark: SparkSession, sf_dir: str, query_ids: list[int]
) -> DataFrame:
    """Exact top-k truth for a fixed query sample, corpus-broadcast-free.

    The sampled query vectors ride a driver broadcast; the corpus streams
    once through the matmul kernel, which emits at most k (+boundary
    ties) candidates per query per Arrow batch — so the final exact
    ranking never sees an N-per-query pair stream (the bounding the old
    salted phase-1 provided, now without materializing Q·N pairs at all).
    """
    q = _quantized(spark, sf_dir)
    queries_rows = (
        q.filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("q").alias("qv"),
            F.col("norm").alias("qn"),
        )
        .collect()
    )
    corpus = fan_out(
        q.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("q").alias("cv"),
            F.col("norm").alias("cn"),
        )
    )
    # matmul kernel (OPTIMIZATION r16, guide §4.2/§8 — same kernel and
    # exactness argument as similarity_bruteforce; the query sample is
    # RECALL_SAMPLE_Q-bounded). The per-batch top-k already bounds each
    # query's candidate stream to k per batch, which is the job the salt
    # phase used to do — one exact ranking finishes it.
    pairs = _dense_topk_candidates(corpus, queries_rows, TOP_K)
    return topk_per_query(pairs)


def ann_truth_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION-memoized eager checkpoint of the sampled exact truth
    (query_id, neighbor_id, hit=1).

    OPTIMIZATION r15: both recall reports (`similarity_recall_report`,
    `similarity_pq_recall_report`) rebuilt the corpus-streaming
    brute-force truth per query — and the plain report consumed its LAZY
    truth twice inside one plan (hit join + denominator), executing the
    exact pass twice per invocation. One checkpointed truth per session
    serves every consumer of the same sampled query set.
    """
    from ting_data_etl_spark.relcache import session_relation

    return session_relation(
        spark,
        _ann_memo_key(sf_dir, "ann_truth"),
        lambda: _bruteforce_truth_sampled(
            spark, sf_dir, _recall_sample_ids(spark, sf_dir)
        )
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
        .localCheckpoint(eager=True),
    )


def _sql_recall_report() -> str:
    """Full-value oracle for the recall report: truth + BOTH ANN legs.

    The sampled exact-truth top-k, the refitted-in-SQL IVF leg
    (:func:`sql_kmeans_search_ctes`) and the SRP leg
    (:func:`sql_srp_search_ctes`) are all deterministic integer-exact
    pipelines, so the report's recall@5 VALUES are hash-checked — the round
    5 rows-only weakening is gone. Built as a callable only because the
    string is assembled from the other builders at resolve time.
    """
    sample_pred = "vec_id IN (SELECT vec_id FROM sample_ids)"
    return f"""
WITH {_SQL_QUANT},
sample_ids AS (
  SELECT vec_id FROM q WHERE vec_id % {QUERY_MOD} = 0
  ORDER BY vec_id LIMIT {RECALL_SAMPLE_Q}
),
{sql_kmeans_search_ctes(sample_pred)},
{sql_srp_search_ctes(sample_pred)},
truth_pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {sql_cosine_case('a.q', 'b.q')} AS cosine
  FROM q a JOIN q b ON b.vec_id <> a.vec_id
  WHERE a.vec_id IN (SELECT vec_id FROM sample_ids)
),
truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC NULLS LAST, neighbor_id ASC
           ) AS rn
    FROM truth_pairs
  ) WHERE rn <= {TOP_K}
),
methods AS (
  SELECT 'ivf_kmeans' AS method, query_id, neighbor_id FROM ivf_topk
  UNION ALL
  SELECT 'srp_lsh' AS method, query_id, neighbor_id FROM srp_topk
)
SELECT m.method,
       CAST(SUM(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
       SUM(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END)
         / (SELECT COUNT(*) FROM truth) AS recall_at_5
FROM methods m LEFT JOIN truth t
  ON m.query_id = t.query_id AND m.neighbor_id = t.neighbor_id
GROUP BY m.method
"""


@register("similarity_recall_report", oracle=_sql_recall_report)
def similarity_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of each ANN variant against sampled brute-force truth.

    The accuracy side of the ANN cost/recall trade, computed distributed
    and registered so the driver sees it every round: each method's top-k
    is left-joined to the exact top-k on (query, neighbor) and the hit
    fraction aggregated per method.

    Scale shape (r5 redesign): recall is ESTIMATED over a fixed
    RECALL_SAMPLE_Q-query sample, so the exact-truth leg broadcasts the
    sample and streams the corpus — O(sample * N) work, no full-corpus
    broadcast anywhere in the plan, no dependence on the brute-force
    baseline's size gate. The ANN legs search only the sampled queries
    (their corpus-side hashing is unchanged — that cost is the index, not
    the query set). FULL oracle check (r6): with the integer-exact k-means
    fit, every leg — truth, IVF, SRP — has a SQL twin, so the recall@5
    values themselves are hash-checked (:func:`_sql_recall_report`).
    """
    sample_ids = _recall_sample_ids(spark, sf_dir)
    # memoized checkpointed truth (OPTIMIZATION r15): previously this lazy
    # relation fed BOTH the hit join and the denominator, so the exact
    # brute-force pass executed twice per invocation — and again in the
    # PQ report
    truth = ann_truth_df(spark, sf_dir)
    tagged = (
        similarity_ivf_kmeans(spark, sf_dir, query_ids=sample_ids)
        .select("query_id", "neighbor_id")
        .withColumn("method", F.lit("ivf_kmeans"))
        .unionByName(
            similarity_srp_lsh(spark, sf_dir, query_ids=sample_ids)
            .select("query_id", "neighbor_id")
            .withColumn("method", F.lit("srp_lsh"))
        )
    )
    denom = truth.agg(F.count("*").alias("n_truth"))
    return (
        tagged.join(truth, ["query_id", "neighbor_id"], "left")
        .groupBy("method")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"))
        .crossJoin(F.broadcast(denom))
        .select(
            "method",
            "n_hits",
            "n_truth",
            (F.col("n_hits") / F.col("n_truth")).alias("recall_at_5"),
        )
    )


# --- incremental IVF: staged standing index + batch append ------------------
#: Which vectors form the "new batch" in the incremental scenario: the
#: standing corpus (90%) was indexed before the batch (10%) arrived. REM 7
#: is disjoint from the QUERY_MOD==0 sample other ANN variants use.
INCR_BATCH_MOD = 10
INCR_BATCH_REM = 7
#: Refit trigger: total-variation distance between the batch's and the
#: standing corpus's list-occupancy distributions. 0 = identically
#: distributed; 1 = disjoint. Past this the coarse quantizer no longer
#: describes the incoming data and the index build should re-run.
INCR_REFIT_TV = 0.5


def _incr_batch_pred() -> F.Column:
    return F.col("vec_id") % INCR_BATCH_MOD == INCR_BATCH_REM


def _staged_incr_index(
    spark: SparkSession, sf_dir: str, centroids: list[list[float]]
) -> DataFrame:
    """The standing-corpus IVF index as a durable staged artifact.

    One-time index build (assignment pass over the standing 90%), published
    write-once via the shared atomic ritual and fingerprinted by source +
    fit config — the incremental query then reads the parquet back, so its
    per-call cost is O(batch) assignment + the list-join search, NOT a
    corpus re-assignment. The same separation ``dedup_incremental_minhash``
    stages for the band index.
    """
    import os

    from ting_data_etl_spark.operators.dedup import (
        _publish_stage,
        _source_fp,
        _stage_dir,
    )

    src_fp = _source_fp(sf_dir, "embeddings")
    out = _stage_dir(
        sf_dir,
        [
            "ivf_incr_index_v1",
            src_fp,
            f"k{KMEANS_LISTS}_i{KMEANS_ITERS}_m{KMEANS_SAMPLE_MOD}",
            f"b{INCR_BATCH_MOD}r{INCR_BATCH_REM}",
        ],
    )
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        q = _quantized(spark, sf_dir).filter(~_incr_batch_pred())
        assign1 = nearest_lists_udf(centroids, 1)
        standing = q.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("q").alias("cv"),
            F.col("norm").alias("cn"),
            F.element_at(assign1(F.col("q")), 1).alias("list_id"),
        )
        os.makedirs(os.path.dirname(out), exist_ok=True)
        _publish_stage(standing, out)
    return spark.read.parquet(out)


def occupancy_shares(df: DataFrame) -> dict[int, float]:
    """Per-list occupancy shares of a (.., list_id) relation — aggregates
    to at most k rows (k = number of lists): a bounded-scalar model read,
    never a data collect."""
    rows = df.groupBy("list_id").count().collect()
    total = sum(r["count"] for r in rows) or 1
    return {r["list_id"]: r["count"] / total for r in rows}


def tv_distance(p: dict[int, float], q: dict[int, float]) -> float:
    """Total-variation distance ½·Σ|p_i − q_i| between share dicts."""
    return 0.5 * sum(
        abs(p.get(i, 0.0) - q.get(i, 0.0)) for i in set(p) | set(q)
    )


def incremental_drift_tv(standing_idx: DataFrame, batch_idx: DataFrame) -> float:
    """Total-variation distance between list-occupancy distributions.

    The drift guard (split into :func:`occupancy_shares` +
    :func:`tv_distance` so a caller with a FIXED standing side can cache
    its shares per staged fingerprint instead of re-scanning the standing
    relation on every plan build)."""
    return tv_distance(occupancy_shares(standing_idx), occupancy_shares(batch_idx))


def _sql_incremental_ivf() -> str:
    batch = f"vec_id % {INCR_BATCH_MOD} = {INCR_BATCH_REM}"
    standing = f"vec_id % {INCR_BATCH_MOD} <> {INCR_BATCH_REM}"
    return f"""
WITH {_SQL_QUANT},
{sql_kmeans_search_ctes(batch, fit_pred=standing)}
SELECT query_id, neighbor_id, cosine FROM ivf_topk
"""


@register("similarity_incremental_ivf", oracle=_sql_incremental_ivf)
def similarity_incremental_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN maintenance: assign a new batch into a standing IVF.

    The round-7 verdict's gap: ``dedup_incremental_minhash`` proved the
    incremental pattern for the lexical family while the ANN indexes
    refit from scratch on any corpus change. Here the coarse quantizer is
    fitted on the STANDING corpus only (the index predates the batch), the
    standing assignment is a staged write-once artifact, and a batch
    arrival costs one O(batch) Arrow assignment pass — appended to the
    index by union, no refit, no corpus re-scan. Every batch vector then
    queries the MERGED corpus through the normal multi-probe list join.

    Drift guard: before searching, the batch's list-occupancy distribution
    is compared to the standing index's (total-variation distance, bounded
    k-row collects); past ``INCR_REFIT_TV`` a loud warning tells the
    operator the quantizer no longer fits the incoming data and a refit
    (the full index build) is due — the standard IVF maintenance contract.

    FULL oracle: the SQL twin refits the standing-only model from scratch
    (md5-seeded integer Lloyd's via :func:`sql_kmeans_search_ctes` with
    ``fit_pred``), assigns everything, and searches the batch — so fit
    drift, assignment drift, and search drift all surface as value
    mismatches.
    """
    import warnings

    centroids = ivf_centroids(
        spark, sf_dir, fit_pred=~_incr_batch_pred(), subset_tag="standing"
    )
    standing = _staged_incr_index(spark, sf_dir, centroids)
    batch = _quantized(spark, sf_dir).filter(_incr_batch_pred())
    assign1 = nearest_lists_udf(centroids, 1)
    assign_probe = nearest_lists_udf(centroids, NPROBE)
    batch_idx = batch.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("q").alias("cv"),
        F.col("norm").alias("cn"),
        F.element_at(assign1(F.col("q")), 1).alias("list_id"),
    )
    tv = incremental_drift_tv(standing, batch_idx)
    if tv > INCR_REFIT_TV:
        warnings.warn(
            f"similarity_incremental_ivf: batch/list occupancy drifted "
            f"TV={tv:.3f} > {INCR_REFIT_TV} from the standing index — the "
            "coarse quantizer no longer describes the incoming data; "
            "rebuild the index (purge_stages + refit)",
            stacklevel=2,
        )
    corpus = standing.unionByName(batch_idx)
    queries = batch.select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qv"),
        F.col("norm").alias("qn"),
        F.explode(assign_probe(F.col("q"))).alias("probe_list"),
    )
    pairs = queries.join(
        corpus,
        (F.col("probe_list") == F.col("list_id"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select(
        "query_id",
        "neighbor_id",
        cosine_udf()(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias(
            "cosine"
        ),
    )
    return topk_per_query(pairs)


def _full_index_path(sf_dir: str) -> str:
    """Fingerprinted stage path of the rebuilt full-corpus IVF index."""
    from ting_data_etl_spark.operators.dedup import _source_fp, _stage_dir

    return _stage_dir(
        sf_dir,
        [
            "ivf_full_index_v1",
            _source_fp(sf_dir, "embeddings"),
            f"k{KMEANS_LISTS}_i{KMEANS_ITERS}_m{KMEANS_SAMPLE_MOD}",
        ],
    )


def _staged_full_index(
    spark: SparkSession, sf_dir: str, centroids: list[list[float]]
) -> DataFrame:
    """The REBUILT full-corpus IVF index as a durable staged artifact: every
    vector assigned under the freshly-refit coarse model — the artifact a
    production system serves after an index rebuild. Same write-once
    publish + fingerprint ritual as :func:`_staged_incr_index`."""
    import os

    from ting_data_etl_spark.operators.dedup import _publish_stage

    out = _full_index_path(sf_dir)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        assign1 = nearest_lists_udf(centroids, 1)
        full = _quantized(spark, sf_dir).select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("q").alias("cv"),
            F.col("norm").alias("cn"),
            F.element_at(assign1(F.col("q")), 1).alias("list_id"),
        )
        os.makedirs(os.path.dirname(out), exist_ok=True)
        _publish_stage(full, out)
    return spark.read.parquet(out)


def _sweep_stale_ivf_stages(sf_dir: str) -> list[str]:
    """Reclaim DEAD-generation IVF artifacts — the GC half of the rebuild.

    An IVF artifact's name carries its source fingerprint and fit config;
    when either rotates (testdata regenerated, constants retuned, a new
    model generation), the old artifact becomes unreachable (paths are
    recomputed per call) and previously leaked forever. The rebuild verb
    sweeps every ``ivf_incr_index_v1`` / ``ivf_full_index_v1`` dir and
    ``ivf_model_v2*`` json whose name does NOT match the CURRENT
    fingerprint+config — live generations (the current standing-fit model
    and its staged index included: they are the retained PREVIOUS
    generation the incremental queries still serve) are never touched.
    Returns the swept names so the pytest can assert exactly what died.
    """
    import os
    import shutil

    from ting_data_etl_spark.operators.dedup import _source_fp, _stage_dir

    root = os.path.dirname(_stage_dir(sf_dir, ["x"]))
    if not os.path.isdir(root):
        return []
    src_fp = _source_fp(sf_dir, "embeddings")
    cfg = f"k{KMEANS_LISTS}_i{KMEANS_ITERS}_m{KMEANS_SAMPLE_MOD}"
    swept: list[str] = []
    for d in sorted(os.listdir(root)):
        if not (d.startswith("ivf_incr_index_v1_")
                or d.startswith("ivf_full_index_v1_")
                or d.startswith("ivf_model_v2")):
            continue
        if src_fp in d and cfg in d:
            continue  # current generation (full or standing-fit): retained
        p = os.path.join(root, d)
        try:
            # best-effort like incremental._sweep_generations: a racing
            # writer's tmp dir or an EACCES must not fail the rebuild
            # that already succeeded
            (os.remove if os.path.isfile(p) else shutil.rmtree)(p)
        except OSError:
            continue
        swept.append(d)
    return swept


def _sql_index_rebuild() -> str:
    batch = f"vec_id % {INCR_BATCH_MOD} = {INCR_BATCH_REM}"
    return f"""
WITH {_SQL_QUANT},
{sql_kmeans_search_ctes(batch)}
SELECT query_id, neighbor_id, cosine FROM ivf_topk
"""


@register("similarity_index_rebuild", oracle=_sql_index_rebuild)
def similarity_index_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REBUILD the ANN index on the CURRENT corpus — the remediation verb
    :func:`similarity_incremental_ivf`'s drift guard names ("rebuild the
    index: purge_stages + refit") made first-class (VERDICT r12 #1, the
    ANN half; ``corpus_reindex`` is the selection-family half).

    Three steps, each verifiable: (1) REFIT — the coarse quantizer is
    fit on the full current corpus (standing ∪ absorbed arrivals), a
    genuinely different model artifact from the standing-only fit the
    incremental path pins; (2) REBUILD — every vector is re-assigned
    under the new model into a staged write-once full index (the artifact
    a deployment serves post-rebuild; warm calls read it back, they never
    re-assign); (3) SWEEP — dead-generation artifacts (stale fingerprints
    or configs, unreachable since their name rotated) are reclaimed,
    retaining the current full AND standing-fit generations (the
    incremental queries still serve yesterday's model until the next
    rebuild retires it).

    The returned relation searches the day's batch through the REBUILT
    staged index (multi-probe list join, self excluded) and the oracle
    refits the same model from scratch in SQL — fit drift, assignment
    drift, a torn staged artifact, or a search regression all
    hash-mismatch. O(corpus) by design: a rebuild IS the indexing job.
    """
    import os

    centroids = ivf_centroids(spark, sf_dir)  # full-corpus refit
    # Sweep ONLY on the cold-build path (ADVICE r13): the sweep runs once,
    # right after the staged full index is first published — a warm
    # read-back must not re-sweep, or a concurrent in-process session
    # running under retuned fit constants (exactly what the
    # tools/selection_scale.py probes do) would have its live ivf_*
    # artifacts deleted mid-run by every read of this query.
    cold = not os.path.exists(
        os.path.join(_full_index_path(sf_dir), "_SUCCESS")
    )
    idx = _staged_full_index(spark, sf_dir, centroids)
    if cold:
        _sweep_stale_ivf_stages(sf_dir)
    batch = _quantized(spark, sf_dir).filter(_incr_batch_pred())
    assign_probe = nearest_lists_udf(centroids, NPROBE)
    queries = batch.select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qv"),
        F.col("norm").alias("qn"),
        F.explode(assign_probe(F.col("q"))).alias("probe_list"),
    )
    pairs = queries.join(
        idx,
        (F.col("probe_list") == F.col("list_id"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select(
        "query_id",
        "neighbor_id",
        cosine_udf()(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias(
            "cosine"
        ),
    )
    return topk_per_query(pairs)


# --- incremental IVF with deletes / re-embeds (tombstone maintenance) --------
#: Deterministic maintenance scenario on top of the incremental split:
#: of the STANDING corpus (vec_id % 10 != 7), every vec_id % 20 == 4 row is
#: DELETED; half of those (vec_id % 40 == 4) are RE-EMBEDDED (modeled as the
#: sign-flipped quantized vector — exact in both engines, norm-preserving)
#: and re-inserted through the same O(batch) append path new vectors use.
INCR_DELETE_MOD, INCR_DELETE_REM = 20, 4
INCR_READD_MOD, INCR_READD_REM = 40, 4


def _incr_delete_pred() -> F.Column:
    return F.col("vec_id") % INCR_DELETE_MOD == INCR_DELETE_REM


def _incr_readd_pred() -> F.Column:
    return F.col("vec_id") % INCR_READD_MOD == INCR_READD_REM


def _sql_incremental_ivf_delete() -> str:
    batch = f"vec_id % {INCR_BATCH_MOD} = {INCR_BATCH_REM}"
    standing = f"vec_id % {INCR_BATCH_MOD} <> {INCR_BATCH_REM}"
    deleted = f"vec_id % {INCR_DELETE_MOD} = {INCR_DELETE_REM}"
    readded = f"vec_id % {INCR_READD_MOD} = {INCR_READD_REM}"
    # searched corpus = everything except tombstoned-and-not-re-added;
    # fit sample = original standing vectors (the model predates the edits)
    alive = f"NOT (({deleted}) AND NOT ({readded}))"
    return f"""
WITH {_SQL_QUANT},
q2 AS (
  SELECT vec_id,
         CASE WHEN {readded} THEN list_transform(q, x -> -x) ELSE q END AS q
  FROM q
),
{sql_kmeans_search_ctes(batch, fit_pred=standing, corpus_pred=alive, vec_relation="q2")}
SELECT query_id, neighbor_id, cosine FROM ivf_topk
"""


@register("similarity_incremental_ivf_delete", oracle=_sql_incremental_ivf_delete)
def similarity_incremental_ivf_delete(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental IVF maintenance with tombstones and re-embeds.

    Round-8 verdict gap: :func:`similarity_incremental_ivf` handles
    appends, but a deleted or re-embedded standing vector stayed in the
    staged index until a full purge+refit. This variant completes the
    maintenance contract with the three index mutations a real vector
    store sees, all WITHOUT refitting or re-scanning the standing corpus:

    - **delete**: a tombstone id-set is LEFT-ANTI-JOINED against the
      staged standing index — O(|index| + |tombstones|) with the small
      tombstone side broadcast, no assignment work, no fit work;
    - **update (re-embed)**: an updated vector is delete + re-insert —
      its new embedding goes through the same O(batch) Arrow assignment
      pass that new arrivals use, then unions into the searched corpus;
    - **append**: the regular new batch, exactly as the base query.

    The coarse quantizer is untouched by all three (it was fitted on the
    pre-edit standing corpus); drift accumulating from many edit cycles
    is what the TV-distance refit guard on the base query watches.

    FULL oracle: the SQL twin refits the standing-only model from scratch,
    assigns over a ``q2`` relation carrying the re-embedded vectors, and
    filters the searched corpus by the alive-predicate — so tombstone
    leaks (a deleted id surfacing as a neighbor), missed re-adds, and
    stale-vector matches all surface as value mismatches. The re-embed
    transform is the sign-flipped quantized vector: exact integers in
    both engines, norm-preserving, and guaranteed to change every cosine
    involving the vector (so a stale index is CAUGHT, not coincidentally
    equal).

    100 TB shape: one broadcast anti-join over the staged index + one
    O(edit-batch) assignment + the standard multi-probe list join. No
    step scans or shuffles the standing corpus itself; the staged index
    parquet is read once, already list-partitioned.
    """
    centroids = ivf_centroids(
        spark, sf_dir, fit_pred=~_incr_batch_pred(), subset_tag="standing"
    )
    standing = _staged_incr_index(spark, sf_dir, centroids)
    quant = _quantized(spark, sf_dir)

    # tombstones: an id relation, anti-joined (broadcast) — the pattern
    # works for an arbitrary external deletions feed, not just a predicate
    tombstones = quant.filter(_incr_delete_pred()).select(
        F.col("vec_id").alias("neighbor_id")
    )
    alive = standing.join(F.broadcast(tombstones), "neighbor_id", "left_anti")

    assign1 = nearest_lists_udf(centroids, 1)
    assign_probe = nearest_lists_udf(centroids, NPROBE)

    # re-embedded vectors re-enter through the append path with NEW vectors
    readd_idx = (
        quant.filter(_incr_readd_pred())
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.transform(F.col("q"), lambda x: -x).alias("cv"),
            F.col("norm").alias("cn"),
        )
        .withColumn("list_id", F.element_at(assign1(F.col("cv")), 1))
    )
    batch = quant.filter(_incr_batch_pred())
    batch_idx = batch.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("q").alias("cv"),
        F.col("norm").alias("cn"),
        F.element_at(assign1(F.col("q")), 1).alias("list_id"),
    )
    corpus = alive.unionByName(readd_idx).unionByName(batch_idx)
    queries = batch.select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qv"),
        F.col("norm").alias("qn"),
        F.explode(assign_probe(F.col("q"))).alias("probe_list"),
    )
    pairs = queries.join(
        corpus,
        (F.col("probe_list") == F.col("list_id"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select(
        "query_id",
        "neighbor_id",
        cosine_udf()(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias(
            "cosine"
        ),
    )
    return topk_per_query(pairs)


# --- IVF-PQ: product-quantized residual search (the 100 TB ANN layout) -------
#: Product-quantization geometry: EMB_DIM is split into PQ_M contiguous
#: subspaces of PQ_SUB dims; each subspace gets its own PQ_K-centroid
#: codebook fitted on the COARSE-QUANTIZER RESIDUALS (the FAISS IVF-PQ
#: construction). A corpus vector is then stored as (list_id, PQ_M codes) —
#: ~PQ_M+4 bytes instead of EMB_DIM*8 — and search reconstructs candidates
#: from the codebooks inside the probed lists only. Everything stays on the
#: integer grid (residuals are int differences, codebook fits reuse the
#: md5-seeded integer Lloyd), so the ENTIRE index — coarse fit, residuals,
#: M sub-fits, codes, reconstruction, scores — has an exact DuckDB twin.
PQ_M = 4
PQ_SUB = EMB_DIM // PQ_M
PQ_K = 8

_PQ_BOOKS: dict[tuple, list[list[list[int]]]] = {}


def pq_codebooks(spark: SparkSession, sf_dir: str) -> list[list[list[int]]]:
    """Fit (or reuse) the PQ_M residual sub-codebooks for one dataset.

    Same index-build-vs-search separation as :func:`ivf_centroids`: one
    deterministic fit per (dataset, config), staged as a JSON artifact and
    cached in-process (``purge_stages`` evicts both). Each sub-fit is the
    SAME integer Lloyd as the coarse fit, run over a PQ_SUB-dim slice of
    the residual relation — so the oracle can re-derive all M books with
    the shared :func:`_sql_lloyd_iter_g` chains.
    """
    from ting_data_etl_spark.operators.dedup import _source_fp

    src_fp = _source_fp(sf_dir, "embeddings")
    key = (
        sf_dir,
        src_fp,
        PQ_M,
        PQ_K,
        KMEANS_LISTS,
        KMEANS_ITERS,
        KMEANS_SAMPLE_MOD,
    )

    def fit() -> list[list[list[int]]]:
        resid = _pq_residuals(spark, sf_dir)
        books = []
        for m in range(PQ_M):
            sub = resid.select(
                "vec_id",
                F.slice("r", m * PQ_SUB + 1, PQ_SUB).alias("q"),
            )
            books.append(
                kmeans_fit(
                    sub,
                    k=PQ_K,
                    iters=KMEANS_ITERS,
                    sample_mod=KMEANS_SAMPLE_MOD,
                    expected_dim=PQ_SUB,
                )
            )
        return books

    return _staged_json_fit(
        _PQ_BOOKS,
        key,
        sf_dir,
        [
            "pq_books_v1",
            src_fp,
            f"m{PQ_M}_pk{PQ_K}_k{KMEANS_LISTS}"
            f"_i{KMEANS_ITERS}_s{KMEANS_SAMPLE_MOD}",
        ],
        fit,
    )


def _coarse_lit(coarse: list[list[int]]):
    return F.array(
        *[F.array(*[F.lit(int(x)) for x in c]) for c in coarse]
    )


def _pq_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, list_id, r) — coarse assignment + integer residuals."""
    coarse = ivf_centroids(spark, sf_dir)
    q = _quantized(spark, sf_dir)
    assign1 = nearest_lists_udf(coarse, 1)
    lit = _coarse_lit(coarse)
    return q.select(
        "vec_id",
        "q",
        F.element_at(assign1(F.col("q")), 1).alias("list_id"),
    ).select(
        "vec_id",
        "list_id",
        F.zip_with(
            "q",
            F.element_at(lit, F.col("list_id") + 1),
            lambda a, b: a - b,
        ).alias("r"),
    )


def _sql_ivfpq_ctes(query_pred: str | None = None) -> str:
    """From-scratch DuckDB twin of the WHOLE IVF-PQ pipeline (CTE chain).

    Re-derives the coarse model (shared Lloyd chain), the residuals, all
    PQ_M sub-codebooks (prefixed Lloyd chains over residual slices), the
    per-vector codes, the codebook reconstruction, and the probed-list
    ADC search — so a drift anywhere (fit, slicing, code assignment,
    reconstruction arithmetic) surfaces as a value mismatch. Ends in
    ``pqpairs``; ONE chain shared by the top-k and rerank finals and (with
    *query_pred*) the sampled PQ recall report.
    """
    if query_pred is None:
        query_pred = f"vec_id % {QUERY_MOD} = 0"
    coarse_iters = "\n,".join(_sql_lloyd_iter(i + 1) for i in range(KMEANS_ITERS))
    pq_chains = []
    code_joins = []
    recon_cases = []
    for m in range(PQ_M):
        p = f"pq{m}_"
        lo, hi = m * PQ_SUB + 1, m * PQ_SUB + PQ_SUB
        sub_iters = "\n,".join(
            _sql_lloyd_iter_g(i + 1, p, PQ_SUB) for i in range(KMEANS_ITERS)
        )
        pq_chains.append(f"""
{p}samp AS (
  SELECT vec_id, list_slice(r, {lo}, {hi}) AS q, {_SQL_VEC_HASH} AS h
  FROM resid WHERE {_SQL_VEC_HASH} % {KMEANS_SAMPLE_MOD} = 0
),
{p}c0 AS (
  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS list_id, q AS c
  FROM (SELECT h, vec_id, q FROM {p}samp ORDER BY h, vec_id LIMIT {PQ_K})
),
{sub_iters},
{p}cfin AS MATERIALIZED (SELECT list_id, c FROM {p}c{KMEANS_ITERS}),
{p}code AS MATERIALIZED (
  SELECT vec_id, list_id AS code FROM (
    SELECT s.vec_id, c.list_id,
           row_number() OVER (PARTITION BY s.vec_id ORDER BY
             -2 * list_dot_product(s.q, c.c) + list_dot_product(c.c, c.c),
             c.list_id) AS rn
    FROM (SELECT vec_id, list_slice(r, {lo}, {hi}) AS q FROM resid) s
    CROSS JOIN {p}cfin c
  ) WHERE rn = 1
)""")
        code_joins.append(
            f"JOIN {p}code j{m} ON j{m}.vec_id = cs.vec_id "
            f"JOIN {p}cfin b{m} ON b{m}.list_id = j{m}.code"
        )
        lower = m * PQ_SUB
        recon_cases.append(
            f"WHEN d <= {hi} THEN cc.c[d] + b{m}.c[d - {lower}]"
        )
    return f"""
samp AS (
  SELECT vec_id, q, {_SQL_VEC_HASH} AS h
  FROM q WHERE {_SQL_VEC_HASH} % {KMEANS_SAMPLE_MOD} = 0
),
c0 AS (
  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS list_id, q AS c
  FROM (SELECT h, vec_id, q FROM samp ORDER BY h, vec_id LIMIT {KMEANS_LISTS})
),
{coarse_iters},
cfinal AS MATERIALIZED (SELECT list_id, c FROM c{KMEANS_ITERS}),
cassign AS MATERIALIZED (
  SELECT v.vec_id, v.q, c.list_id,
         row_number() OVER (PARTITION BY v.vec_id ORDER BY
           -2 * list_dot_product(v.q, c.c) + list_dot_product(c.c, c.c),
           c.list_id) AS rn
  FROM q v CROSS JOIN cfinal c
),
coarse AS (SELECT vec_id, q, list_id FROM cassign WHERE rn = 1),
resid AS MATERIALIZED (
  SELECT cs.vec_id, cs.list_id,
         list_transform(range(1, {EMB_DIM + 1}), d -> cs.q[d] - cc.c[d]) AS r
  FROM coarse cs JOIN cfinal cc ON cc.list_id = cs.list_id
),
{",".join(pq_chains)},
recon AS (
  SELECT cs.vec_id, cs.list_id,
         list_transform(range(1, {EMB_DIM + 1}),
           d -> CASE {' '.join(recon_cases)} END) AS rv
  FROM coarse cs
  JOIN cfinal cc ON cc.list_id = cs.list_id
  {' '.join(code_joins)}
),
probes AS (
  SELECT vec_id AS query_id, q AS qv, list_id
  FROM cassign WHERE rn <= {NPROBE} AND ({query_pred})
),
pqpairs AS (
  SELECT p.query_id, r.vec_id AS neighbor_id,
         {sql_cosine_case('p.qv', 'r.rv')} AS cosine
  FROM probes p JOIN recon r
    ON p.list_id = r.list_id AND r.vec_id <> p.query_id
)"""


def _sql_ivfpq() -> str:
    return f"""
WITH {_SQL_QUANT},
{_sql_ivfpq_ctes()}
SELECT query_id, neighbor_id, cosine FROM (
  SELECT *, row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC NULLS LAST, neighbor_id ASC
         ) AS rn
  FROM pqpairs
) WHERE rn <= {TOP_K}
"""


@register("similarity_ivfpq_topk", oracle=_sql_ivfpq)
def similarity_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN search: probed lists + product-quantized candidates.

    The production 100 TB vector-index layout (the FAISS ``IVFx,PQy``
    construction, distributed): the coarse quantizer routes every vector
    to a list; the vector itself is stored as PQ_M one-byte codes into
    residual codebooks — ~8 bytes/vector of index state instead of 512 —
    and search scores each probed candidate against its CODEBOOK
    RECONSTRUCTION (asymmetric distance: original query vs reconstructed
    corpus), never touching the original corpus vectors. Plan: the codes
    relation joins the probe lists exactly like the plain IVF search (one
    fixed-width-key shuffle), reconstruction is a per-row JVM
    ``zip_with``/``concat`` over broadcast codebook literals, and the
    cosine is the shared Arrow kernel. No new shuffle class, no UDF
    beyond the sanctioned assignment/cosine kernels.

    Exactness: residuals are integer differences, sub-fits reuse the
    md5-seeded integer Lloyd (:func:`kmeans_fit` with ``expected_dim =
    PQ_SUB``), reconstructions are integer sums — so the full-value
    DuckDB twin (:func:`_sql_ivfpq`) re-derives the ENTIRE index from
    scratch and the driver hash-checks the search results.
    """
    return topk_per_query(ivfpq_pairs_df(spark, sf_dir))


def _ann_memo_key(sf_dir: str, tag: str, *extra) -> tuple:
    """Relcache key for the ANN-family memoized relations: constants the
    relation reads + the embeddings source fingerprint (a testdata
    regeneration or a retune must rebuild — same discipline as the staged
    artifacts and the curation/incremental memos)."""
    from ting_data_etl_spark.operators.dedup import _source_fp

    return (
        tag,
        os.path.abspath(sf_dir),
        QUERY_MOD,
        TOP_K,
        NPROBE,
        PQ_M,
        PQ_SUB,
        RECALL_SAMPLE_Q,
        _RECALL_TOPK_SALT,
        RERANK_R,
        KMEANS_LISTS,
        KMEANS_ITERS,
        KMEANS_SAMPLE_MOD,
        _source_fp(sf_dir, "embeddings"),
        *extra,
    )


def ivfpq_pairs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION-memoized eager checkpoint of the default-query-set ADC
    pairs.

    OPTIMIZATION r15 (guide §2.4): ``similarity_ivfpq_topk`` and
    ``similarity_ivfpq_rerank`` both execute the full ADC scoring pass —
    and, worse, re-PLAN it per query (the codebook reconstructions ride
    the plan as PQ_M×256-entry array literals, a planning cost the driver
    pays every invocation). One checkpointed relation per session serves
    both; plan guarding moves to the PRE_CHECKPOINT composite digest in
    tests/test_plan_pins.py (the r14 phash convention).
    """
    from ting_data_etl_spark.relcache import session_relation

    return session_relation(
        spark,
        _ann_memo_key(sf_dir, "ivfpq_pairs"),
        lambda: _ivfpq_pairs(spark, sf_dir).localCheckpoint(eager=True),
    )


def _ivfpq_pairs(
    spark: SparkSession, sf_dir: str, query_ids: "list[int] | None" = None
) -> DataFrame:
    """Scored (query_id, neighbor_id, cosine) ADC pairs — the shared core
    of the plain IVF-PQ top-k, the r9 rerank variant, and the sampled PQ
    recall report (*query_ids* restricts the query set)."""
    coarse = ivf_centroids(spark, sf_dir)
    books = pq_codebooks(spark, sf_dir)
    q = _quantized(spark, sf_dir)
    codes = _pq_residuals(spark, sf_dir)
    for m, book in enumerate(books):
        sub_assign = nearest_lists_udf(book, 1)
        codes = codes.withColumn(
            f"code{m}",
            F.element_at(
                sub_assign(F.slice("r", m * PQ_SUB + 1, PQ_SUB)), 1
            ),
        )
    book_lits = [
        F.array(*[F.array(*[F.lit(int(x)) for x in c]) for c in book])
        for book in books
    ]
    rsub = F.concat(
        *[
            F.element_at(book_lits[m], F.col(f"code{m}") + 1)
            for m in range(PQ_M)
        ]
    )
    rv = F.zip_with(
        F.element_at(_coarse_lit(coarse), F.col("list_id") + 1),
        rsub,
        lambda a, b: a + b,
    )
    corpus = codes.select(
        F.col("vec_id").alias("neighbor_id"),
        "list_id",
        rv.alias("cv"),
    ).withColumn("cn", F.sqrt(dot_product(F.col("cv"), F.col("cv"))))
    assignp = nearest_lists_udf(coarse, NPROBE)
    qpred = (
        F.col("vec_id").isin(query_ids)
        if query_ids is not None
        else F.col("vec_id") % QUERY_MOD == 0
    )
    queries = q.filter(qpred).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qv"),
        F.col("norm").alias("qn"),
        F.explode(assignp(F.col("q"))).alias("probe_list"),
    )
    return queries.join(
        corpus,
        (F.col("probe_list") == F.col("list_id"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select(
        "query_id",
        "neighbor_id",
        cosine_udf()(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias(
            "cosine"
        ),
    )


# --- IVF-PQ + exact rerank: the production two-stage search -------------------
#: Candidates the ADC stage hands to the exact refinement stage, per query.
#: The FAISS convention is a small multiple of k (here 5×TOP_K = 25).
RERANK_R = 25


def _sql_exact_rescore(cand_rel: str, out_rel: str) -> str:
    """ONE definition of the oracle-side exact-rerank rescore: candidate
    (query_id, neighbor_id) pairs joined back to the original vectors for
    the exact cosine. Shared by the registered rerank and the PQ recall
    report — a cosine/tie-break change cannot desynchronize the report
    from the operator it measures."""
    return f"""{out_rel} AS (
  SELECT c.query_id, c.neighbor_id,
         {sql_cosine_case('qq.q', 'nq.q')} AS cosine
  FROM {cand_rel} c
  JOIN q qq ON qq.vec_id = c.query_id
  JOIN q nq ON nq.vec_id = c.neighbor_id
)"""


def _sql_ivfpq_rerank() -> str:
    return f"""
WITH {_SQL_QUANT},
{_sql_ivfpq_ctes()},
pqcand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC NULLS LAST, neighbor_id ASC
           ) AS rn
    FROM pqpairs
  ) WHERE rn <= {RERANK_R}
),
{_sql_exact_rescore('pqcand', 'exactp')}
SELECT query_id, neighbor_id, cosine FROM (
  SELECT *, row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC NULLS LAST, neighbor_id ASC
         ) AS rn
  FROM exactp
) WHERE rn <= {TOP_K}
"""


def exact_rescore(
    spark: SparkSession, sf_dir: str, cand: DataFrame
) -> DataFrame:
    """ONE definition of the Spark-side exact-rerank rescore (twin of
    ``_sql_exact_rescore``): candidates joined back to the original
    quantized vectors, exact Arrow cosine."""
    q = _quantized(spark, sf_dir)
    return (
        cand.join(
            q.select(
                F.col("vec_id").alias("query_id"),
                F.col("q").alias("qv"),
                F.col("norm").alias("qn"),
            ),
            "query_id",
        )
        .join(
            q.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("q").alias("cv"),
                F.col("norm").alias("cn"),
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            cosine_udf()(
                F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
            ).alias("cosine"),
        )
    )


@register("similarity_ivfpq_rerank", oracle=_sql_ivfpq_rerank)
def similarity_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search with an exact refinement stage — the production
    two-stage ANN layout (FAISS ``IVFx,PQy`` + refine).

    Stage 1 is the ADC search over codebook reconstructions (8 B/vector
    index state — cheap but lossy); stage 2 fetches the exact QUANTIZED
    corpus vectors — the index's input representation, exact relative to
    what was indexed — for only the top RERANK_R ADC candidates per query
    and re-scores them with true cosine, returning the rescored top-k.
    This is how a 100 TB vector store actually answers queries: the PQ
    index prunes the corpus to R ≈ 5k candidates, and the expensive
    per-vector reads touch only |Q|·R rows — never the corpus.

    Plan shape: the ADC stage is the pinned IVF-PQ plan verbatim (shared
    `_ivfpq_pairs`); refinement adds two vec_id-keyed joins of the
    candidate relation against the quantized corpus and one more window —
    the reported cosines are exact over the index's input vectors, so
    downstream thresholds calibrated on brute-force scores over that same
    corpus transfer unchanged. The oracle re-derives the
    whole index (shared `_sql_ivfpq_ctes`), reranks in SQL, and
    hash-checks the final ranking.
    """
    cand = topk_per_query(ivfpq_pairs_df(spark, sf_dir), k=RERANK_R).select(
        "query_id", "neighbor_id"
    )
    return topk_per_query(exact_rescore(spark, sf_dir, cand))


# --- SemDeDup: cluster-blocked semantic dedup (Abbas et al. 2023) -----------
#: Within-cluster cosine at/above which two documents are semantic
#: near-duplicates. SemDeDup's published sweet spot is high (0.95+ on real
#: text embeddings); the synthetic test corpus has a flatter similarity
#: distribution, so the registered fixture threshold sits lower to exercise
#: the keep/drop logic. Retuning moves the Spark filter and the SQL twin
#: together (both interpolate this constant at call time).
SEMDEDUP_EPS = 0.3
#: Loud-warn bound on the largest k-means cluster: the within-cluster
#: pairwise stage is O(c²) per cluster, so the SCALE CONTRACT is k ∝ N
#: (constant expected cluster size ~N/k, the SemDeDup paper's own regime —
#: they size k so clusters stay ~10k docs). A cluster past this bound means
#: the quantizer under-split the space and the job should refit with larger
#: KMEANS_LISTS, not silently burn a quadratic straggler.
SEMDEDUP_MAX_CLUSTER = 100_000


def _sql_semdedup(member_pred: str = "TRUE") -> str:
    # keeper rule "drop j iff some i<j in the same cluster is eps-close"
    # needs no transitive closure: the oracle is ONE self-join + MIN.
    # *member_pred* restricts cluster MEMBERSHIP (the delete-maintenance
    # selection tombstones vectors out) while the coarse fit always reads
    # the full corpus — the pinned-model contract of the staged index.
    return f"""
WITH {_SQL_QUANT},
{sql_kmeans_search_ctes("FALSE")},
sem AS MATERIALIZED (SELECT vec_id, q, list_id FROM assign
                     WHERE rn = 1 AND ({member_pred})),
sem_pairs AS (
  SELECT b.vec_id, CAST(b.list_id AS INTEGER) AS list_id,
         a.vec_id AS keep_id
  FROM sem a JOIN sem b
    ON a.list_id = b.list_id AND a.vec_id < b.vec_id
  WHERE {sql_cosine_case('a.q', 'b.q')} >= {SEMDEDUP_EPS}
)
SELECT vec_id, list_id, MIN(keep_id) AS keeper_id
FROM sem_pairs GROUP BY vec_id, list_id
"""


@register("dedup_semdedup_prune", oracle=_sql_semdedup)
def dedup_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: k-means clusters as dedup blocks, cosine pruning within.

    The embedding-space dedup that made LAION/LLM-corpus pruning cheap
    (Abbas et al. 2023, "SemDeDup"): instead of an all-pairs or
    LSH-candidate search, route every vector through the coarse k-means
    quantizer the IVF index already maintains, then compare ONLY within
    each cluster — semantically-close documents land in the same cell, so
    the quadratic work shrinks from O(N²) to Σ O(c_i²) with c_i ≈ N/k.
    A document is pruned when an earlier (lower-id) member of its cluster
    is ε-close; the output names each pruned doc's cluster and its
    canonical keeper (lowest qualifying id — deterministic, no RNG, same
    keeper rule as the lexical `dedup_keep_canonical`).

    Plan shape: the cluster assignment is the sanctioned Arrow matmul
    kernel over broadcast centroid literals (no shuffle), the self-join
    shuffles BOTH sides once on the fixed-width ``list_id`` key, and the
    pair cosine is the shared Arrow kernel. Nothing new reaches the
    driver: the model load reuses :func:`ivf_centroids`' staged artifact.
    At 100 TB the contract is k ∝ N (constant cluster size): the
    per-cluster occupancy is checked from the assignment rollup (k rows)
    and a cluster past SEMDEDUP_MAX_CLUSTER warns loudly instead of
    silently running a quadratic straggler.

    FULL oracle: the twin refits the coarse model from scratch (shared
    md5-seeded integer Lloyd chain), re-derives every assignment, and
    recomputes each within-cluster cosine — a drift in fit, assignment,
    threshold, or keeper rule all surface as value mismatches.

    SESSION-memoized (OPTIMIZATION r16, guide §2.4): the registered
    query, the capstone `corpus_final_selection` composition, and the
    public API all consume this relation; each used to re-run the corpus
    assignment pass + occupancy collect + within-cluster pair join per
    call (~2 s warm at sf0.1). One row per pruned doc, fixed width —
    cheap to checkpoint. The key folds the fit constants, ε, the cluster
    cap, and the embeddings fingerprint (retune/regeneration rebuilds);
    plan guarding moves to the PRE_CHECKPOINT composite digest
    (tests/test_plan_pins.py, the r14 phash convention).
    """
    from ting_data_etl_spark.relcache import session_relation

    return session_relation(
        spark,
        _ann_memo_key(
            sf_dir, "semdedup_prune", SEMDEDUP_EPS, SEMDEDUP_MAX_CLUSTER
        ),
        lambda: _semdedup_prune_build(spark, sf_dir).localCheckpoint(
            eager=True
        ),
    )


def _semdedup_prune_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SemDeDup composition itself (see :func:`dedup_semdedup_prune`)."""
    import warnings

    centroids = ivf_centroids(spark, sf_dir)
    assign1 = nearest_lists_udf(centroids, 1)
    # localCheckpoint (not persist): the occupancy guard below would
    # otherwise re-run the corpus scan + Arrow assignment a second time
    # when the returned pair DataFrame executes, and the returned plan
    # must not depend on a cache the caller can't see. One-shot eager
    # materialization of a single Arrow stage — NOT the iterative
    # persist/checkpoint-loop shape connected_components documents as the
    # python-worker wedge hazard (that rule still routes the CC family
    # through staged parquet).
    q = _quantized(spark, sf_dir).select(
        "vec_id",
        "q",
        "norm",
        F.element_at(assign1(F.col("q")), 1).alias("list_id"),
    ).localCheckpoint(eager=True)
    occupancy = q.groupBy("list_id").count().collect()  # k rows, bounded
    worst = max((r["count"] for r in occupancy), default=0)
    if worst > SEMDEDUP_MAX_CLUSTER:
        warnings.warn(
            f"semdedup: largest cluster holds {worst} vectors "
            f"(> {SEMDEDUP_MAX_CLUSTER}); the within-cluster pair stage is "
            "O(c^2) — refit with a larger KMEANS_LISTS (contract: k ∝ N)",
            stacklevel=2,
        )
    a = q.select(
        F.col("vec_id").alias("keep_id"),
        F.col("q").alias("qa"),
        F.col("norm").alias("na"),
        "list_id",
    )
    b = q.select(
        "vec_id",
        F.col("q").alias("qb"),
        F.col("norm").alias("nb"),
        F.col("list_id").alias("list_id_b"),
    )
    pairs = a.join(
        b,
        (F.col("list_id") == F.col("list_id_b"))
        & (F.col("keep_id") < F.col("vec_id")),
    ).select(
        "vec_id",
        "list_id",
        "keep_id",
        cosine_udf()(
            F.col("qa"), F.col("qb"), F.col("na"), F.col("nb")
        ).alias("cosine"),
    )
    return (
        pairs.filter(F.col("cosine") >= SEMDEDUP_EPS)
        .groupBy("vec_id", "list_id")
        .agg(F.min("keep_id").alias("keeper_id"))
    )


# --- PQ recall report: lossy-index accuracy, measured and hash-checked --------
def _sql_pq_recall() -> str:
    """Truth + the ADC leg + the reranked leg, one statement. A separate
    report from `similarity_recall_report` because the PQ chain and the
    plain-IVF chain share coarse-fit CTE names (identical fits) and cannot
    compose in one statement without prefixing every name."""
    sample_pred = "vec_id IN (SELECT vec_id FROM sample_ids)"
    return f"""
WITH {_SQL_QUANT},
sample_ids AS (
  SELECT vec_id FROM q WHERE vec_id % {QUERY_MOD} = 0
  ORDER BY vec_id LIMIT {RECALL_SAMPLE_Q}
),
{_sql_ivfpq_ctes(sample_pred)},
pq_topk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC NULLS LAST, neighbor_id ASC
           ) AS rn
    FROM pqpairs
  ) WHERE rn <= {TOP_K}
),
rcand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC NULLS LAST, neighbor_id ASC
           ) AS rn
    FROM pqpairs
  ) WHERE rn <= {RERANK_R}
),
{_sql_exact_rescore('rcand', 'rexact')},
rr_topk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC NULLS LAST, neighbor_id ASC
           ) AS rn
    FROM rexact
  ) WHERE rn <= {TOP_K}
),
truth_pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {sql_cosine_case('a.q', 'b.q')} AS cosine
  FROM q a JOIN q b ON b.vec_id <> a.vec_id
  WHERE a.vec_id IN (SELECT vec_id FROM sample_ids)
),
truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC NULLS LAST, neighbor_id ASC
           ) AS rn
    FROM truth_pairs
  ) WHERE rn <= {TOP_K}
),
methods AS (
  SELECT 'ivfpq' AS method, query_id, neighbor_id FROM pq_topk
  UNION ALL
  SELECT 'ivfpq_rerank' AS method, query_id, neighbor_id FROM rr_topk
)
SELECT m.method,
       CAST(SUM(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
       SUM(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END)
         / (SELECT COUNT(*) FROM truth) AS recall_at_5
FROM methods m LEFT JOIN truth t
  ON m.query_id = t.query_id AND m.neighbor_id = t.neighbor_id
GROUP BY m.method
"""


@register("similarity_pq_recall_report", oracle=_sql_pq_recall)
def similarity_pq_recall_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Recall@5 of the lossy PQ index with and without exact refinement.

    The number that justifies the rerank stage's existence: how much
    recall the 8-byte codes give up (ADC scoring against reconstructions)
    and how much the RERANK_R-candidate exact rescoring buys back — the
    accuracy half of the FAISS-style memory/recall trade, measured over
    the same sampled exact truth as `similarity_recall_report` and
    hash-checked end to end (the oracle re-derives the full PQ index, the
    ADC search, the rerank, AND the truth).
    """
    sample_ids = _recall_sample_ids(spark, sf_dir)
    # BOTH reused relations ride session-memoized checkpoints
    # (OPTIMIZATION r15): truth feeds the hit join AND the denominator
    # (the corpus-wide exact pass must not run twice — and is shared with
    # similarity_recall_report), and the ADC pairs feed both the top-k
    # cut and the rerank cut
    truth = ann_truth_df(spark, sf_dir)
    from ting_data_etl_spark.relcache import session_relation

    pairs = session_relation(
        spark,
        _ann_memo_key(sf_dir, "ivfpq_pairs_sampled"),
        lambda: _ivfpq_pairs(
            spark, sf_dir, query_ids=sample_ids
        ).localCheckpoint(eager=True),
    )
    pq_leg = topk_per_query(pairs).select("query_id", "neighbor_id")
    cand = topk_per_query(pairs, k=RERANK_R).select("query_id", "neighbor_id")
    rr_leg = topk_per_query(exact_rescore(spark, sf_dir, cand)).select(
        "query_id", "neighbor_id"
    )
    tagged = pq_leg.withColumn("method", F.lit("ivfpq")).unionByName(
        rr_leg.withColumn("method", F.lit("ivfpq_rerank"))
    )
    denom = truth.agg(F.count("*").alias("n_truth"))
    return (
        tagged.join(truth, ["query_id", "neighbor_id"], "left")
        .groupBy("method")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"))
        .crossJoin(F.broadcast(denom))
        .select(
            "method",
            "n_hits",
            "n_truth",
            (F.col("n_hits") / F.col("n_truth")).alias("recall_at_5"),
        )
    )
