"""Process-wide cache of reusable unresolved Column objects.

OPTIMIZATION r16 (guide §2.1, VERDICT r15 #1 — streaming driver gap):
building a large Column tree costs hundreds of py4j round-trips (~0.6 s
per arrival-gate trigger for the gopher + minhash trees, measured with
cProfile: ~2,450 gateway round-trips per construction), and several hot
paths rebuild the same tree per invocation — the arrival gate once per
micro-batch trigger, the bench once per query call. Unresolved Columns
are immutable, DataFrame-independent expression wrappers: the same
objects can be planted into any number of plans, so caching them removes
construction cost with zero plan change.

Keying discipline (same contract as relcache): the key must fold every
module constant the expression reads, so a retune (tests monkeypatch
SHINGLE_N, PERMS, the gopher gates) mints a fresh entry instead of
serving a stale tree. Entries live for the PROCESS — the py4j gateway
JVM outlives SparkSession restarts in-process, and an unresolved
expression holds no session state. The cache is bounded FIFO like the
relation memo.
"""

from __future__ import annotations

import threading
from collections.abc import Callable

_CACHE: dict[tuple, object] = {}
_LOCK = threading.Lock()
MAX_ENTRIES = 64


def cached_exprs(key: tuple, build: Callable[[], object]) -> object:
    """Return the cached expression bundle under *key*, building once.

    *build* may return a Column, a list of Columns, or any immutable
    bundle of them; the caller must treat the result as read-only (the
    same objects are shared by every later caller).
    """
    with _LOCK:
        got = _CACHE.get(key)
    if got is not None:
        return got
    built = build()
    with _LOCK:
        got = _CACHE.get(key)
        if got is not None:
            return got
        while len(_CACHE) >= MAX_ENTRIES:
            del _CACHE[next(iter(_CACHE))]
        _CACHE[key] = built
    return built


def clear() -> None:
    """Drop every cached expression (paired with relcache.clear in tests
    that need a pristine process state)."""
    with _LOCK:
        _CACHE.clear()
