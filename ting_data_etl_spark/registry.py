"""Query registry: every operator registers a (Spark callable, oracle SQL) twin.

``__spark_entry__.py`` exposes these to the driver. Each Spark callable takes
``(spark, sf_dir)`` and returns a DataFrame; the oracle is ANSI SQL DuckDB
runs over the same parquet tables. Registration happens at import time of the
implementing modules (see ``ting_data_etl_spark.plans`` /
``ting_data_etl_spark.operators``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]
OracleSpec = "str | Callable[[], str]"

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str | Callable[[], str]] = {}

# Rotation queue: queries marked ``defer=True`` at decoration time land here
# and only enter QUERIES when ``flush_deferred()`` runs at the END of
# ``load_all()``. This lets a module keep its queries defined (and tested) in
# one place while rotating stable, repeatedly-green entries OUT of the
# driver's finite first-N correctness budget to make room for recently
# changed families — without moving code between modules.
_DEFERRED: list[tuple[str, "str | Callable[[], str] | None", QueryFn]] = []


def register(
    name: str,
    oracle: str | Callable[[], str] | None = None,
    defer: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under *name* with an optional SQL oracle.

    *oracle* is either the SQL string or a zero-arg callable returning it —
    the callable form defers side effects (fixture staging, imports of
    later-registering modules) from import time to ``resolve_oracles()``
    time, keeping module import pure and registration order intact.

    *defer* pushes the query to the back of the registration order (after
    every non-deferred family) regardless of module import position — used
    to rotate multi-round-green queries out of the driver's budget window.

    Queries without an oracle get the driver's weaker rows-only check — used
    only for genuinely non-SQL-expressible ops (hash families DuckDB lacks,
    stateful streaming).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if defer:
            _DEFERRED.append((name, oracle, fn))
        else:
            QUERIES[name] = fn
            if oracle is not None:
                ORACLES[name] = oracle
        return fn

    return deco


def flush_deferred() -> None:
    """Append every ``defer=True`` registration, in decoration order."""
    for name, oracle, fn in _DEFERRED:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
    _DEFERRED.clear()


def resolve_oracles() -> dict[str, str]:
    """Materialize every oracle to its SQL string (callables invoked here)."""
    out: dict[str, str] = {}
    for name, spec in ORACLES.items():
        out[name] = spec() if callable(spec) else spec
    return out


def load_all() -> None:
    """Import every module that registers queries.

    ORDER IS THE CONTRACT: the correctness driver checks registered queries
    in registration order under a finite (~50) budget, so the SURVEY §2 spec
    surface — flagship, the seven reference jobs, the primitives, the
    fan-out/verify composite, streaming, and the CSV/JSONL I/O paths —
    registers FIRST, followed by this round's changed families. Round 5
    changed the shared events loader (``sources/tables.py`` ts
    normalization), so every events-touching family — streaming (already
    §2-first), temporal, olap, quality — sits inside the budget this round,
    and the round's NEW queries (curation suite, ORC, cumulative window,
    rollup, salted join, SCD2) register next so each gets a first driver
    row. To make room, fourteen queries with two consecutive green driver
    rows (eight §2 primitives, three sampling forms, similarity's
    bucketed-IVF and gated brute force, JSONL, cdc upsert, dq/table-stats,
    global quantiles) are marked ``defer=True`` and flushed to the back —
    their green status at this revision is evidenced by the committed
    ``SWEEP_LOCAL_r05.txt`` full-registry sweep. Families unchanged since
    their last green driver row register last. Module import order is
    transitive (an import that pulls in another registering module registers
    that module's queries at that point), so modules below avoid top-level
    imports of later families.
    """
    # --- SURVEY §2 spec surface -------------------------------------------
    import ting_data_etl_spark.plans.flagship  # noqa: F401
    import ting_data_etl_spark.plans.jobs  # noqa: F401
    import ting_data_etl_spark.plans.primitives  # noqa: F401
    import ting_data_etl_spark.operators.verify  # noqa: F401
    import ting_data_etl_spark.streaming.windows  # noqa: F401
    import ting_data_etl_spark.streaming.stateful  # noqa: F401
    import ting_data_etl_spark.streaming.joins  # noqa: F401
    import ting_data_etl_spark.streaming.batch_windows  # noqa: F401
    # --- changed this round: events-loader dependents ----------------------
    import ting_data_etl_spark.operators.temporal  # noqa: F401
    import ting_data_etl_spark.operators.olap  # noqa: F401
    import ting_data_etl_spark.operators.quality  # noqa: F401
    # --- §2 I/O paths ------------------------------------------------------
    import ting_data_etl_spark.plans.csv_e2e  # noqa: F401
    import ting_data_etl_spark.sources.jsonl  # noqa: F401
    # --- recently changed extension families --------------------------------
    import ting_data_etl_spark.operators.sampling  # noqa: F401
    import ting_data_etl_spark.operators.similarity  # noqa: F401
    import ting_data_etl_spark.operators.ensemble  # noqa: F401
    # --- NEW this round: curation suite + ORC round-trip --------------------
    import ting_data_etl_spark.operators.curation  # noqa: F401
    import ting_data_etl_spark.sources.orc  # noqa: F401
    # --- NEW this round: window/rollup/skew/SCD2 additions land via their
    # family modules; cdc and skew move up because they gained new queries
    # (temporal/olap are already registered above) -------------------------
    import ting_data_etl_spark.operators.cdc  # noqa: F401
    import ting_data_etl_spark.operators.skew  # noqa: F401
    # --- unchanged extension families (green latest-checked rows) ----------
    import ting_data_etl_spark.operators.dedup  # noqa: F401
    import ting_data_etl_spark.operators.text_queries  # noqa: F401
    import ting_data_etl_spark.operators.multimodal  # noqa: F401
    import ting_data_etl_spark.operators.bucketed  # noqa: F401
    import ting_data_etl_spark.operators.layout  # noqa: F401
    import ting_data_etl_spark.operators.maintenance  # noqa: F401
    # --- rotated-out stable queries (defer=True) ----------------------------
    flush_deferred()
