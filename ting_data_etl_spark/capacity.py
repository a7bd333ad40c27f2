"""Capacity rules: size the sketch/index knobs to the corpus.

Every bucketed operator in the engine has one knob that must track corpus
size or its buckets saturate and the hot-bucket caps (correctly) destroy
recall. The rules live here as code — the same function the scale-stress
harness (``tools/scale_stress.py``, SCALE_r06) applies and measures —
rather than as docstring folklore:

* ``similarity.SRP_BITS``: candidate cost per ANN query is ~N/2^bits per
  probed bucket → bits ≈ log2(N / target_bucket) (target 32).
* ``dedup.SIMHASH_BITS``: the 4-band hamming-≤3 search has 2^(bits/4)
  bucket values per band → bits ≈ 4·log2(N / target_bucket) (target 20),
  clamped to [32, 60] (md5-derived, int64-sign-safe maximum).
* ``similarity.KMEANS_LISTS``: the standard IVF √N list rule, so per-list
  scan cost and list count balance.

The constants themselves stay MODULE CONSTANTS (not formulas) because the
DuckDB oracles embed them at registration time — a deployment applies a
recommendation by setting the constants and letting the register()
callables refit both engines together (pytest-pinned for simhash 60-bit
and SRP 8-bit retunes).
"""

from __future__ import annotations

import math

SRP_TARGET_BUCKET = 32
SIMHASH_TARGET_BUCKET = 20
SIMHASH_MIN_BITS = 32
SIMHASH_MAX_BITS = 60


def srp_bits(n_vecs: int) -> int:
    """Hyperplanes per SRP table for ~SRP_TARGET_BUCKET vectors/bucket."""
    return max(6, math.ceil(math.log2(max(64, n_vecs) / SRP_TARGET_BUCKET)))


def simhash_bits(n_docs: int) -> int:
    """Signature width for ~SIMHASH_TARGET_BUCKET docs per band bucket."""
    raw = 4 * math.ceil(math.log2(max(320, n_docs) / SIMHASH_TARGET_BUCKET))
    return min(SIMHASH_MAX_BITS, max(SIMHASH_MIN_BITS, raw))


def kmeans_lists(n_vecs: int) -> int:
    """IVF coarse-list count: the √N rule (registered 8 at test scale)."""
    return 8 if n_vecs <= 2_000 else int(math.sqrt(n_vecs))


#: Above this many CHUNKS, the portable 31-bit chunk hash's birthday
#: collision expectation (~k²/2³²) passes ~1 colliding pair — flip
#: dedup_chunk_boilerplate / text_chunk_windows to ``xxhash64`` (same
#: plan, 64-bit keyspace, engine-specific digest → driver checks
#: rows-only). Measured context: x100 (770k chunks) ≈ 0.14 expected
#: collisions (SCALE_r07_chunk.md).
CHUNK_HASH31_MAX_CHUNKS = 2_000_000


def chunk_hash_bits(n_chunks: int) -> int:
    """Chunk-hash width rule: 31-bit portable md5 below the collision
    budget, 64-bit xxhash64 above it."""
    return 31 if n_chunks <= CHUNK_HASH31_MAX_CHUNKS else 64


#: Target bytes per bucket FILE of the standing band index
#: (``incremental._standing_capped_index``): one bucket should stream
#: through an executor comfortably (scan + hash-build for the probe join),
#: so size buckets to ~512 MB — small enough to be memory-resident,
#: large enough that file/bucket count stays manageable at 100 TB.
INDEX_TARGET_BUCKET_BYTES = 512 * 1024 * 1024
#: ~bytes per (doc_id, j, band) index row in encoded parquet.
INDEX_ROW_BYTES = 16


def index_buckets(n_docs: int, bands_per_doc: int = 8) -> int:
    """Bucket count for the standing band index (power of two ≥ 32).

    rows × row-bytes / target-bucket-bytes, rounded UP to a power of two
    (bucket joins repartition the probe side to the bucket count — a
    power of two keeps that exchange friendly to AQE coalescing). At the
    test corpora this floors to the registered 32; at 10B docs × 8 bands
    it recommends ~4096 buckets of ~300 MB.
    """
    raw = n_docs * bands_per_doc * INDEX_ROW_BYTES / INDEX_TARGET_BUCKET_BYTES
    return max(32, 2 ** math.ceil(math.log2(max(1.0, raw))))


#: Target bytes per physical TRAINING SHARD file (manifest / shard sink):
#: a few GB streams well from object storage and keeps reader parallelism;
#: far larger files serialize trainer startup, far smaller ones explode
#: listing and open costs.
SHARD_TARGET_BYTES = 4 * 1024 * 1024 * 1024
#: ~bytes of stored text per selected document at the synthetic corpus
#: shape (the scale harness' generator) — a deployment re-measures this.
SHARD_DOC_BYTES = 2048


def manifest_shards(n_docs: int, doc_bytes: int = SHARD_DOC_BYTES) -> int:
    """Shard count for the selection manifest / physical shard sink.

    selected-bytes / target-shard-bytes, rounded UP to a power of two
    (hash-mod sharding stays balanced at any count; a power of two keeps
    downstream repartitions AQE-friendly), floor 16 = the registered
    ``sampling.N_SHARDS`` every test corpus floors to. At 10B docs × 2 KB
    it recommends 8192 shards of ~2.5 GB. The incremental manifest's
    update cost is per-DELTA-row, not per-shard, so raising the count
    only shrinks the blast radius of a copy-on-write shard rewrite.
    """
    raw = n_docs * doc_bytes / SHARD_TARGET_BYTES
    return max(16, 2 ** math.ceil(math.log2(max(1.0, raw))))


def recommend(n_docs: int, n_vecs: int) -> dict[str, int]:
    """Knob settings for a corpus of this size (see module docstring)."""
    return {
        "srp_bits": srp_bits(n_vecs),
        "simhash_bits": simhash_bits(n_docs),
        "kmeans_lists": kmeans_lists(n_vecs),
        # ~1.5 chunks per avg document at the synthetic corpus shape
        "chunk_hash_bits": chunk_hash_bits(int(n_docs * 1.5)),
        "index_buckets": index_buckets(n_docs),
        "manifest_shards": manifest_shards(n_docs),
    }
