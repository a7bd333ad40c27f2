"""Per-session relation memo: one materialization serving many queries.

VERDICT r13 #7: the three heaviest bench rows (`corpus_manifest_shard_sink`,
`corpus_selection_manifest`, `corpus_final_selection`) each re-derived the
selection⋈ledger relation warm — three executions of the same nested stage
chain inside one session. The staged-artifact layer (``dedup._publish_stage``)
already dedups ACROSS sessions via on-disk fingerprints; this memo dedups
WITHIN a session: the first consumer builds (and, where the builder says so,
eagerly checkpoints) the relation, later consumers get the same DataFrame
object, so its ``localCheckpoint`` blocks and its already-executed
quantile/offset collects are reused instead of re-derived.

Keying discipline — the same invalidation contract as the staged artifacts:
the key must fold the Spark application id (a checkpointed DataFrame dies
with its session), the dataset identity + source fingerprints (a testdata
regeneration must rebuild), and the constants tokens of every knob the
relation reads (a retune test must never see a stale memo). Entries from
previous applications are pruned on insert, so long test processes that
restart sessions cannot accumulate dead references.
"""

from __future__ import annotations

import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MEMO: dict[tuple, DataFrame] = {}
# Guards the memo dict itself (ADVICE r14): concurrent consumers — the
# streaming tests run foreachBatch callbacks on Spark's thread pool, and
# any multithreaded driver is legal — must not interleave FIFO eviction
# with insertion. build() runs OUTSIDE the lock (it triggers Spark jobs
# that can take minutes; holding the lock would serialize unrelated
# relations), so two first-consumers of the SAME key may both build; the
# second-check insert keeps the first-published object canonical, which
# preserves the memo's only guarantee (object identity for all LATER
# consumers) at the cost of one duplicate build in that narrow race.
_LOCK = threading.Lock()

#: Max live entries per application (review r14): a retune-probing session
#: (tools/selection_scale.py mutates constants, minting a fresh key per
#: regime) would otherwise pin one checkpointed relation per retune for
#: the session lifetime — blocks the ContextCleaner can never release
#: while the memo holds the reference. Insertion-ordered dict = FIFO
#: eviction; dropping the reference lets Spark reclaim the blocks.
#: 16, not 8 (OPTIMIZATION r15): the incremental family added four
#: memoized relations (two decision relations + two selected-id
#: projections) on top of the four curation/sampling ones — at 8 a full
#: bench pass would evict and rebuild the earliest entries mid-pass,
#: re-paying exactly the derivations the memo exists to remove. Every
#: entry is a checkpointed fixed-width relation (ids/status rows, no
#: text), so the bound stays far below executor storage at any tested
#: scale. 24, not 16 (OPTIMIZATION r15): the ANN family added three
#: entries (truth + two ADC-pairs relations) and the dedup family five
#: (corpus minhash sigs, LSH pairs, shared shingle scores, simhash
#: sigs, ppm phash) — the same mid-pass-eviction arithmetic as the
#: 8 → 16 raise.
MAX_ENTRIES = 24


def session_relation(
    spark: SparkSession, key_parts: tuple, build: Callable[[], DataFrame]
) -> DataFrame:
    """The memoized relation under (application id, *key_parts*), building
    it once per session via *build*. The builder decides materialization
    (checkpoint or lazy); the memo only guarantees object identity."""
    from ting_data_etl_spark import runstats

    app = spark.sparkContext.applicationId
    key = (app, *key_parts)
    with _LOCK:
        df = _MEMO.get(key)
    if df is not None:
        runstats.record("memo_hit", str(key_parts[0]))
        return df
    built = build()  # outside the lock: may run long Spark jobs
    runstats.record("memo_build", str(key_parts[0]))
    with _LOCK:
        df = _MEMO.get(key)  # second check: a racing builder won
        if df is not None:
            return df
        for k in [k for k in _MEMO if k[0] != app]:  # dead sessions
            del _MEMO[k]
        while len(_MEMO) >= MAX_ENTRIES:  # bounded: evict oldest first
            del _MEMO[next(iter(_MEMO))]
        _MEMO[key] = built
    return built


def clear() -> None:
    """Drop every memoized relation (tests that rebuild testdata in place
    within one session call this alongside ``purge_stages``)."""
    with _LOCK:
        _MEMO.clear()
