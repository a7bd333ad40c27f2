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

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under *name* with an optional SQL oracle.

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


def load_all() -> None:
    """Import every module that registers queries."""
    import ting_data_etl_spark.operators.bucketed  # noqa: F401
    import ting_data_etl_spark.operators.cdc  # noqa: F401
    import ting_data_etl_spark.operators.dedup  # noqa: F401
    import ting_data_etl_spark.operators.layout  # noqa: F401
    import ting_data_etl_spark.operators.maintenance  # noqa: F401
    import ting_data_etl_spark.operators.multimodal  # noqa: F401
    import ting_data_etl_spark.operators.olap  # noqa: F401
    import ting_data_etl_spark.operators.quality  # noqa: F401
    import ting_data_etl_spark.operators.sampling  # noqa: F401
    import ting_data_etl_spark.operators.temporal  # noqa: F401
    import ting_data_etl_spark.operators.similarity  # noqa: F401
    import ting_data_etl_spark.operators.text_queries  # noqa: F401
    import ting_data_etl_spark.operators.verify  # noqa: F401
    import ting_data_etl_spark.plans.csv_e2e  # noqa: F401
    import ting_data_etl_spark.sources.jsonl  # noqa: F401
    import ting_data_etl_spark.plans.jobs  # noqa: F401
    import ting_data_etl_spark.plans.primitives  # noqa: F401
    import ting_data_etl_spark.streaming.batch_windows  # noqa: F401
    import ting_data_etl_spark.streaming.joins  # noqa: F401
    import ting_data_etl_spark.streaming.stateful  # noqa: F401
    import ting_data_etl_spark.streaming.windows  # noqa: F401
