"""Data-quality expectation checks (SURVEY §2.10's V-family, generalized).

The reference verifies its fan-out output with hand-rolled invariant loops
(``verify_fanout.py:87-97``, ``verify_store_presence.py:35-63``); this is
the generalized engine form — a declarative expectation list evaluated in
ONE scan. Each expectation is a boolean column; the report aggregates
violation counts per check, so N expectations cost one pass over the table
regardless of N (vs. one query per check). The V3 contract applies: a
healthy pipeline asserts every ``n_violations`` is 0 for the *invariant*
checks and alerts on drift for the *statistical* ones.

Uniqueness is the one check a boolean column can't express; it contributes
a count-distinct on the key — the only shuffle in the report.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ting_data_etl_spark.registry import register
from ting_data_etl_spark.sources.tables import load_table


def expectations_report(
    df: DataFrame, checks: dict[str, Column], unique_key: str | None = None
) -> DataFrame:
    """Evaluate named boolean expectations in one aggregation pass.

    ``checks`` maps check name → predicate that must hold per row. Returns
    (check_name, n_rows, n_violations). With ``unique_key``, appends a
    ``unique:<key>`` check whose violation count is #rows − #distinct keys.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, pred in checks.items():
        aggs.append(
            F.sum(F.when(pred, 0).otherwise(1)).alias(f"__v_{name}")
        )
    if unique_key is not None:
        aggs.append(F.count_distinct(F.col(unique_key)).alias("__uniq"))
    row = df.agg(*aggs).first()
    spark = df.sparkSession
    out = [(name, row["__n"], row[f"__v_{name}"]) for name in checks]
    if unique_key is not None:
        out.append((f"unique:{unique_key}", row["__n"], row["__n"] - row["__uniq"]))
    return spark.createDataFrame(
        out, "check_name string, n_rows long, n_violations long"
    )


_SQL_DQ = """
WITH base AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN l_quantity > 0 THEN 0 ELSE 1 END) AS v_qty_positive,
         SUM(CASE WHEN l_discount BETWEEN 0 AND 1 THEN 0 ELSE 1 END) AS v_discount_range,
         SUM(CASE WHEN l_extendedprice IS NOT NULL THEN 0 ELSE 1 END) AS v_price_not_null,
         SUM(CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 0 ELSE 1 END) AS v_returnflag_domain,
         SUM(CASE WHEN l_shipdate >= TIMESTAMP '1992-01-01' THEN 0 ELSE 1 END) AS v_shipdate_floor,
         COUNT(DISTINCT (l_orderkey, l_linenumber)) AS uniq
  FROM lineitem
)
SELECT check_name, n AS n_rows, n_violations FROM base,
LATERAL (VALUES
  ('qty_positive', CAST(v_qty_positive AS BIGINT)),
  ('discount_range', CAST(v_discount_range AS BIGINT)),
  ('price_not_null', CAST(v_price_not_null AS BIGINT)),
  ('returnflag_domain', CAST(v_returnflag_domain AS BIGINT)),
  ('shipdate_floor', CAST(v_shipdate_floor AS BIGINT)),
  ('unique:l_orderkey:l_linenumber', CAST(n - uniq AS BIGINT))
) AS t(check_name, n_violations)
"""


@register("dq_lineitem_expectations", oracle=_SQL_DQ)
def dq_lineitem_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation suite over lineitem: 5 invariants + composite-key
    uniqueness, one scan."""
    li = load_table(spark, sf_dir, "lineitem")
    li = li.withColumn(
        "__ck", F.concat_ws("|", "l_orderkey", "l_linenumber")
    )
    checks = {
        "qty_positive": F.col("l_quantity") > 0,
        "discount_range": F.col("l_discount").between(0, 1),
        "price_not_null": F.col("l_extendedprice").isNotNull(),
        "returnflag_domain": F.col("l_returnflag").isin("A", "N", "R"),
        "shipdate_floor": F.col("l_shipdate") >= F.lit("1992-01-01").cast("timestamp"),
    }
    rep = expectations_report(li, checks, unique_key="__ck")
    return rep.withColumn(
        "check_name",
        F.when(
            F.col("check_name") == "unique:__ck",
            F.lit("unique:l_orderkey:l_linenumber"),
        ).otherwise(F.col("check_name")),
    )
