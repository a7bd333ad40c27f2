"""Config-as-query: the reference's ``CONFIGS`` dict made a real operator.

The reference declares a generic config-driven filter+aggregate design
(``aggregate_by_store.py:15-99``: source file, key cols, value col, month
whitelist) but its generic execution path (``725-762``) is dead code — every
config key is intercepted by a dedicated branch first (SURVEY.md §2.11).
This module implements the declared design for real: a config dataclass
compiled to a DataFrame plan (select → clean → filter → groupBy → sum).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ting_data_etl_spark.functions.cleaning import sum_exact
from ting_data_etl_spark.sources.tables import load_table


@dataclass
class AggregationConfig:
    """Declarative filter+sum job, the analogue of one ``CONFIGS`` entry."""

    source: str  # testdata table name (or a path for CSV sources)
    key_cols: list[str]
    value_col: str
    year: str | None = None
    months: list[int] = field(default_factory=list)


def _binds_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stringified orders view every generic job reads (fixture A1).

    Delegates to ``jobs._cleaned_binds`` — one definition of the cleaning
    projection, so a sentinel/rename change there cannot silently leave
    the generic-config path on old semantics.
    """
    from ting_data_etl_spark.plans.jobs import _cleaned_binds

    return _cleaned_binds(spark, sf_dir)


def run_generic(spark: SparkSession, sf_dir: str, cfg: AggregationConfig) -> DataFrame:
    """Compile one config to a DataFrame plan — filter → groupBy → exact sum.

    Mirrors the reference's declared generic path
    (``aggregate_by_store.py:725-762``): optional year equality filter,
    optional month whitelist (P4), key group-by, guarded numeric sum.
    """
    if cfg.source != "orders":
        df = load_table(spark, sf_dir, cfg.source)
    else:
        df = _binds_view(spark, sf_dir)
    if cfg.year is not None:
        df = df.filter(F.col("year") == cfg.year)
    if cfg.months:
        df = df.filter(F.col("month").isin(cfg.months))
    return df.groupBy(*cfg.key_cols).agg(sum_exact(cfg.value_col).alias("total"))
