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


def register(
    name: str, oracle: str | Callable[[], str] | None = None
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under *name* with an optional SQL oracle.

    *oracle* is either the SQL string or a zero-arg callable returning it —
    the callable form defers side effects (fixture staging, imports of
    later-registering modules) from import time to ``resolve_oracles()``
    time, keeping module import pure and registration order intact.

    Queries without an oracle get the driver's weaker rows-only check — used
    only for genuinely non-SQL-expressible ops (hash families DuckDB lacks,
    stateful streaming).
    """

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


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
    surface — flagship, the seven reference jobs, the twelve primitives, the
    fan-out/verify composite, streaming, and the CSV/JSONL I/O paths —
    registers FIRST, followed by this round's changed/new extension queries
    (sampling's banded forms, the candidate-driven similarity family, the
    ensemble dedup). Families unchanged since their last green driver row
    register last. Module import order is transitive (an import that pulls
    in another registering module registers that module's queries at that
    point), so modules below avoid top-level imports of later families.
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
    import ting_data_etl_spark.plans.csv_e2e  # noqa: F401
    import ting_data_etl_spark.sources.jsonl  # noqa: F401
    # --- changed/new this round -------------------------------------------
    import ting_data_etl_spark.operators.sampling  # noqa: F401
    import ting_data_etl_spark.operators.similarity  # noqa: F401
    import ting_data_etl_spark.operators.ensemble  # noqa: F401
    # --- unchanged extension families (green latest-checked rows) ----------
    import ting_data_etl_spark.operators.dedup  # noqa: F401
    import ting_data_etl_spark.operators.text_queries  # noqa: F401
    import ting_data_etl_spark.operators.temporal  # noqa: F401
    import ting_data_etl_spark.operators.multimodal  # noqa: F401
    import ting_data_etl_spark.operators.olap  # noqa: F401
    import ting_data_etl_spark.operators.quality  # noqa: F401
    import ting_data_etl_spark.operators.bucketed  # noqa: F401
    import ting_data_etl_spark.operators.cdc  # noqa: F401
    import ting_data_etl_spark.operators.layout  # noqa: F401
    import ting_data_etl_spark.operators.maintenance  # noqa: F401
