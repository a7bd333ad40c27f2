"""Process-wide reuse counters: session-memo hits/builds and stage builds.

VERDICT r15 #3: ~20 bench queries consume session-memoized checkpoints
(`relcache`) and several families serve write-once on-disk stages
(`dedup._publish_stage`, the streaming event stages, the IVF model json).
A bench number for those queries measures a cache hit, not operator
compute — but nothing in the bench output said which. This module is the
disclosure hook: the memo and every stage publisher record events here,
and ``bench.py`` snapshots the counters around each query to tag its side
file (additions only — the stdout contract is untouched).

Deliberately dumb: append-only event list + monotonically increasing
counters, guarded by the relcache lock discipline (events can arrive from
foreachBatch worker threads). Not a cache itself — recording is O(1) and
the list is bounded by the number of memo/stage builds in a process,
which is small by construction (stages are write-once, the memo is
bounded by relcache.MAX_ENTRIES keys per generation).
"""

from __future__ import annotations

import threading

_LOCK = threading.Lock()

#: counters: {"memo_build": n, "memo_hit": n, "stage_build": n}
_COUNTS: dict[str, int] = {"memo_build": 0, "memo_hit": 0, "stage_build": 0}
#: last few event names per kind, for debugging (bounded)
_EVENTS: list[tuple[str, str]] = []
_MAX_EVENTS = 4096


def record(kind: str, name: str) -> None:
    """Record one reuse event. *kind* is ``memo_build`` / ``memo_hit`` /
    ``stage_build``; *name* identifies the relation or stage path."""
    with _LOCK:
        _COUNTS[kind] = _COUNTS.get(kind, 0) + 1
        if len(_EVENTS) < _MAX_EVENTS:
            _EVENTS.append((kind, name))


def snapshot() -> dict[str, int]:
    """Current counter values (copy)."""
    with _LOCK:
        return dict(_COUNTS)


def events() -> list[tuple[str, str]]:
    """Recorded (kind, name) events (copy, bounded)."""
    with _LOCK:
        return list(_EVENTS)
