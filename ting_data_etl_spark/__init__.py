"""ting_data_etl_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the query and data-processing
capabilities of the reference CSV ETL toolchain (MakiDevelop/ting-data-etl,
surveyed in SURVEY.md), extended with large-scale training-data pipeline
operators (dedup, similarity search, multimodal columns, text analysis,
structured streaming).

Design principles
-----------------
* DataFrame/SQL first: every operator is declared with the DataFrame API so
  Catalyst handles pushdown, pruning, join planning, and AQE re-planning.
* JVM-side expressions: the hot path uses ``pyspark.sql.functions`` only;
  Python appears solely in Arrow-batched Pandas UDFs for genuinely
  non-relational work (multimodal decode stubs).
* Scale-aware: broadcast hints for dimension joins, decimal-accumulated
  float aggregation for deterministic results, partitioned writes, salting
  helpers, and AQE-friendly defaults in :mod:`ting_data_etl_spark.session`.
"""

__version__ = "0.1.0"

from ting_data_etl_spark.session import get_spark  # noqa: F401
